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
import jax
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


class PatchDropout(nn.Module):
    """Training-time random token dropout (https://arxiv.org/abs/2212.00794).

    Reference video_encoder_ViT_H_14.py:144-181 — constructed there but
    commented out of the video forward (:461-462); implemented here as a
    config-gated feature for surface parity. Keeps the CLS token, then a
    per-sample random `1 - prob` fraction of the rest (torch's randn+topk
    index selection reproduced with jax.random)."""

    prob: float
    exclude_first_token: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        if deterministic or self.prob == 0.0:
            return x
        # exclude_first_token=False still splits off the first token in the
        # reference (it is just re-dropped rather than kept); the shipped
        # config always excludes CLS, which is what this implements.
        cls_tokens, patches = x[:, :1], x[:, 1:]
        B, L, D = patches.shape
        num_keep = max(1, int(L * (1.0 - self.prob)))
        rand = jax.random.normal(self.make_rng("patch_dropout"), (B, L))
        keep = jax.lax.top_k(rand, num_keep)[1]            # [B, num_keep]
        kept = jnp.take_along_axis(patches, keep[..., None], axis=1)
        if self.exclude_first_token:
            return jnp.concatenate([cls_tokens, kept], axis=1)
        return kept


class AttentionalPooler(nn.Module):
    """Query-token cross-attention pooler (reference
    video_encoder_ViT_H_14.py:184-207; OpenCLIP AttentionalPooler). Parameter
    layout mirrors torch MultiheadAttention with kdim=context_dim: separate
    q/k/v projection weights + one fused in_proj bias."""

    d_model: int
    context_dim: int
    n_head: int = 8
    n_queries: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        E = self.d_model
        B = x.shape[0]
        query = self.param("query", nn.initializers.normal(1.0),
                           (self.n_queries, E))
        q = LayerNormF32(name="ln_q")(query[None].astype(self.dtype))  # [1,Q,E]
        kx = LayerNormF32(name="ln_k")(x)                              # [B,L,W]

        qkv_bias = self.param("qkv_bias",
                              nn.initializers.zeros, (3 * E,)).astype(self.dtype)
        d = E // self.n_head
        qh = (nn.Dense(E, use_bias=False, dtype=self.dtype, name="q_proj")(q)
              + qkv_bias[:E]) * (d ** -0.5)
        kh = nn.Dense(E, use_bias=False, dtype=self.dtype, name="k_proj")(kx) \
            + qkv_bias[E:2 * E]
        vh = nn.Dense(E, use_bias=False, dtype=self.dtype, name="v_proj")(kx) \
            + qkv_bias[2 * E:]

        def heads(t, n):  # [B?, L, E] -> [B, H, L, d]
            return t.reshape(n, -1, self.n_head, d).transpose(0, 2, 1, 3)

        qh = jnp.broadcast_to(heads(qh, 1), (B, self.n_head, self.n_queries, d))
        kh, vh = heads(kh, B), heads(vh, B)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh)
        p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, self.n_queries, E)
        out = nn.Dense(E, dtype=self.dtype, name="proj")(out)
        return out


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
    def __call__(self, video: jnp.ndarray, keep_ind: jnp.ndarray | None = None,
                 train: bool = False):
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

        if cfg.patch_dropout > 0:
            # surface parity: the reference constructs PatchDropout but
            # comments it out of the video forward (H_14.py:461-462); here it
            # actually runs when configured (training only)
            x = PatchDropout(cfg.patch_dropout, name="patch_dropout")(
                x, deterministic=not train)
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

        if cfg.attentional_pool:
            # reference H_14.py:366-372,478-480: pool with learned queries,
            # ln_post over the pooled tokens, proj is output_dim -> output_dim
            x = AttentionalPooler(cfg.output_dim, cfg.width,
                                  n_head=cfg.attn_pooler_heads,
                                  n_queries=cfg.n_queries, dtype=self.dtype,
                                  name="attn_pool")(x)
            x = LayerNormF32(name="ln_post")(x)
            proj = self.param("proj", nn.initializers.normal(scale),
                              (cfg.output_dim, cfg.output_dim)).astype(self.dtype)
            return x[:, 0] @ proj, x[:, 1:] @ proj

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
