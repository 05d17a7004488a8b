"""Divided space-time attention video ViT (the TVTSv2 video tower family).

Behavioral contracts:
- B/32, B/16 ("openai" pool style): reference v2/model/video_encoder_ViT_B_16.py
  (== video_encoder_ViT_B_32.py). ln_post is applied to ALL tokens, then the
  projection; the pooled embedding is projected token 0 (:230-234).
- H/14 ("openclip" pool style): reference v2/model/video_encoder_ViT_H_14.py:413-484.
  pooled = ln_post(CLS) @ proj; order tokens = raw patch tokens @ proj (no ln_post,
  no CLS). Optional LayerScale (ls_1/ls_2/ls_3) when `ls_init` is set.
- Block residual topology (both files): time and space residuals BOTH taken from the
  block input x (video_encoder_ViT_B_16.py:113-124) — not chained. Replicated exactly
  for checkpoint parity.
- Positional scheme: spatial pos-embed tiled over frames + temporal embedding
  repeat-interleaved over patches (:189-198); identical tube-mask gather across
  frames (:200-216).

TPU-first notes: patchify is one NHWC conv over B·T frames (MXU-friendly); tube
masking is a static-shape batched gather; blocks can be rematerialized
(`remat=True` ≙ the grad-checkpointing flag the reference plumbs but never enables,
video_encoder_ViT_H_14.py:289-294).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tvts_tpu.models.configs import VisionConfig
from tvts_tpu.models.layers import LayerNormF32, Mlp, VarAttention
from tvts_tpu.ops.masking import gather_tube_tokens


class LayerScale(nn.Module):
    dim: int
    init_value: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", lambda k, s: jnp.full(s, self.init_value, jnp.float32), (self.dim,)
        )
        return x * gamma.astype(self.dtype)


class SpaceTimeBlock(nn.Module):
    cfg: VisionConfig
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_frames: int, patches_per_frame: int):
        cfg = self.cfg

        def scale(name):
            if cfg.ls_init is None:
                return lambda y: y
            return LayerScale(cfg.width, cfg.ls_init, dtype=self.dtype, name=name)

        t_out = VarAttention(cfg.width, cfg.heads, zero_init=True, dtype=self.dtype,
                             use_pallas=self.use_pallas, name="timeattn")(
            LayerNormF32(name="ln_3")(x), num_frames, patches_per_frame, mode="time")
        time_residual = x + scale("ls_3")(t_out)

        s_out = VarAttention(cfg.width, cfg.heads, dtype=self.dtype,
                             use_pallas=self.use_pallas, name="attn")(
            LayerNormF32(name="ln_1")(time_residual), num_frames, patches_per_frame,
            mode="space")
        # NOTE: both residuals branch from the block input x (reference :118-121).
        space_residual = x + scale("ls_1")(s_out)

        m_out = Mlp(int(cfg.width * cfg.mlp_ratio), cfg.width, act=cfg.act,
                    dtype=self.dtype, name="mlp")(
            LayerNormF32(name="ln_2")(space_residual))
        return space_residual + scale("ls_2")(m_out)


class SpaceTimeViT(nn.Module):
    cfg: VisionConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    use_pallas: bool = False  # fused attention kernels (forward-only)
    # sequence-parallel extension: PartitionSpec-style tuple for the [B, S, D]
    # token activations, e.g. (("dp", "fsdp"), "sp", None). GSPMD reshards
    # around the divided-attention einsums automatically.
    token_partition: tuple | None = None

    def _constrain(self, x):
        if self.token_partition is None:
            return x
        import jax
        from jax.sharding import PartitionSpec

        return jax.lax.with_sharding_constraint(
            x, PartitionSpec(*self.token_partition))

    @nn.compact
    def __call__(self, video: jnp.ndarray, keep_ind: jnp.ndarray | None = None):
        """video: [B, T, C, H, W] (or [B, C, H, W] for single images), values already
        normalized. keep_ind: [B, n_keep] int32 spatial keep set, or None for no
        masking. Returns (pooled [B, out], order_tokens [B, S', out])."""
        cfg = self.cfg
        if video.ndim == 4:
            video = video[:, None]
        B, T, C, H, W = video.shape

        # patchify: one conv over all frames, NHWC for TPU conv layout
        frames = video.reshape(B * T, C, H, W).transpose(0, 2, 3, 1)
        x = nn.Conv(cfg.width, kernel_size=(cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
                    dtype=self.dtype, name="conv1")(frames.astype(self.dtype))
        n = x.shape[1] * x.shape[2]
        x = x.reshape(B, T, n, cfg.width)

        scale = cfg.width ** -0.5
        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(scale), (cfg.width,))
        positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(scale),
            (cfg.patches_per_frame + 1, cfg.width))
        temporal_embedding = self.param(
            "temporal_embedding", nn.initializers.normal(scale),
            (cfg.num_frames, cfg.width))

        # spatial pos tiled over T, temporal pos broadcast over patches (:189-198)
        x = x + (positional_embedding[None, None, 1:]
                 + temporal_embedding[None, :T, None]).astype(self.dtype)

        if keep_ind is not None:
            x = gather_tube_tokens(x, keep_ind)

        cls = (class_embedding + positional_embedding[0]).astype(self.dtype)
        cls = jnp.broadcast_to(cls, (B, 1, cfg.width))
        x = jnp.concatenate([cls, x.reshape(B, -1, cfg.width)], axis=1)

        x = LayerNormF32(name="ln_pre")(x)
        x = self._constrain(x)

        n_keep = (x.shape[1] - 1) // T
        block_cls = SpaceTimeBlock
        if self.remat:
            block_cls = nn.remat(SpaceTimeBlock, static_argnums=(2, 3))
        for i in range(cfg.layers):
            x = block_cls(cfg, dtype=self.dtype, use_pallas=self.use_pallas,
                          name=f"blocks_{i}")(x, T, n_keep)
            x = self._constrain(x)

        proj = self.param("proj", nn.initializers.normal(scale),
                          (cfg.width, cfg.output_dim))
        proj = proj.astype(self.dtype)
        if cfg.pool_style == "openai":
            full = LayerNormF32(name="ln_post")(x) @ proj
            return full[:, 0], full
        if cfg.pool_style == "openclip":
            pooled = LayerNormF32(name="ln_post")(x[:, 0]) @ proj
            tokens = x[:, 1:] @ proj
            return pooled, tokens
        raise ValueError(f"unknown pool_style {cfg.pool_style!r}")
