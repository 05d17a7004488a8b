"""Frozen-in-Time-style SpaceTimeTransformer (v1 downstream encoder variant).

Behavioral contract: reference v1/downstream/video_transformer.py (340 LoC,
timm lineage) — the alternative divided space-time encoder importable by
modeling_finetune (:8). Differences from the CLIP-style tower in
models/space_time_vit.py:

- input is [B, C, T, H, W] (permuted internally, :302-304)
- per-frame 2D conv patchify WITH bias (VideoPatchEmbed, :54-76)
- timm params: zero-init `cls_token` added before the pos embed, `pos_embed`
  includes the CLS slot, `temporal_embed` [1, T, D] (:236-242)
- pos embed truncated to the current token count so shorter clips work (:321)
- LayerNorm eps 1e-6 (:229), timm Mlp (fc1/fc2), block residual wiring
  identical to the v2 towers (both residuals from block input x, :162-177)
- head: final norm -> CLS -> optional pre_logits (fc+tanh) -> Linear (:329-341)

The divided attention itself is models/layers.VarAttention (same CLS-broadcast
semantics, parity-tested against both reference towers).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tvts_tpu.models.layers import LayerNormF32, VarAttention


class FrozenMlp(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class FrozenBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, num_frames: int, patches_per_frame: int):
        t_out = VarAttention(self.dim, self.num_heads, zero_init=True,
                             dtype=self.dtype, name="timeattn")(
            LayerNormF32(eps=1e-6, name="norm3")(x), num_frames,
            patches_per_frame, mode="time")
        time_residual = x + t_out
        s_out = VarAttention(self.dim, self.num_heads, dtype=self.dtype,
                             name="attn")(
            LayerNormF32(eps=1e-6, name="norm1")(time_residual), num_frames,
            patches_per_frame, mode="space")
        space_residual = x + s_out
        m_out = FrozenMlp(int(self.dim * self.mlp_ratio), self.dim,
                          dtype=self.dtype, name="mlp")(
            LayerNormF32(eps=1e-6, name="norm2")(space_residual))
        return space_residual + m_out


class SpaceTimeTransformer(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    num_classes: int = 174
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_frames: int = 16
    representation_size: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jnp.ndarray, return_features: bool = False):
        """video: [B, C, T, H, W] (reference input layout). Returns logits
        [B, num_classes] (or CLS features with return_features)."""
        B, C, T, H, W = video.shape
        frames = video.transpose(0, 2, 1, 3, 4).reshape(B * T, C, H, W)
        frames = frames.transpose(0, 2, 3, 1).astype(self.dtype)
        x = nn.Conv(self.embed_dim, kernel_size=(self.patch_size,) * 2,
                    strides=(self.patch_size,) * 2, use_bias=True,
                    dtype=self.dtype, name="patch_embed")(frames)
        n = x.shape[1] * x.shape[2]
        x = x.reshape(B, T * n, self.embed_dim)

        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, self.embed_dim))
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, n + 1, self.embed_dim))
        temporal_embed = self.param(
            "temporal_embed", nn.initializers.zeros,
            (1, self.num_frames, self.embed_dim))

        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(self.dtype),
                              (B, 1, self.embed_dim)), x], axis=1)
        tile_pos = jnp.tile(pos_embed[:, 1:], (1, self.num_frames, 1))
        tile_temp = jnp.repeat(temporal_embed, n, axis=1)
        total = jnp.concatenate([pos_embed[:, :1], tile_pos + tile_temp], axis=1)
        # truncate for clips shorter than num_frames (reference :321)
        x = x + total[:, : x.shape[1]].astype(self.dtype)

        for i in range(self.depth):
            x = FrozenBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                            dtype=self.dtype, name=f"blocks_{i}")(x, T, n)

        feats = LayerNormF32(eps=1e-6, name="norm")(x)[:, 0]
        if self.representation_size:
            feats = jnp.tanh(nn.Dense(self.representation_size,
                                      dtype=self.dtype,
                                      name="pre_logits")(feats))
        if return_features or self.num_classes <= 0:
            return feats
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(feats)
