"""TVTS v1 video tower: joint space-time attention ViT with Conv3d tubelet
patchify and per-tube masking.

Behavioral contract: reference v1/model/video_encoder.py:
- PatchEmbed: Conv3d kernel/stride (tubelet=2, p, p) (:78-99)
- positional scheme: spatial pos-embed (197 incl CLS) tiled over tubes + temporal
  embedding per tube repeat-interleaved (:186-196)
- per-tube masking: keep_ind [B, n_tubes, n_keep], a DIFFERENT spatial keep set
  per tube (:199-207; generated in v1/data_loader/YTTemporal_dataset.py:207-215)
- joint full attention over [CLS ; all kept tokens], pre-norm blocks, LayerNorm
  eps 1e-6, final norm; optional classifier head (downstream fine-tune:
  v1/downstream/video_encoder.py keeps the CLS -> head)
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tvts_tpu.models.layers import LayerNormF32, Mlp, SelfAttention


class JointBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x + SelfAttention(self.dim, self.heads, dtype=self.dtype, name="attn")(
            LayerNormF32(eps=1e-6, name="norm1")(x))
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, act="gelu",
                    dtype=self.dtype, name="mlp")(
            LayerNormF32(eps=1e-6, name="norm2")(x))
        return x


class JointViT(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    heads: int = 12
    num_frames: int = 16
    tubelet_size: int = 2
    num_classes: int = 0
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @property
    def patches_per_frame(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @nn.compact
    def __call__(self, video: jnp.ndarray, keep_ind: jnp.ndarray | None = None):
        """video: [B, T, C, H, W]; keep_ind: [B, n_tubes, n_keep] per-tube spatial
        keep sets (or None). Returns [B, 1 + n_tubes*n_keep, D] tokens after the
        final norm (plus the head when num_classes > 0, applied to all tokens —
        matching video_encoder.py:218-222)."""
        B, T, C, H, W = video.shape
        n_tubes = T // self.tubelet_size
        N = self.patches_per_frame

        # tubelet patchify: Conv over (t, h, w); NDHWC layout for TPU
        x = video.transpose(0, 1, 3, 4, 2).astype(self.dtype)  # [B, T, H, W, C]
        x = nn.Conv(self.embed_dim,
                    kernel_size=(self.tubelet_size, self.patch_size, self.patch_size),
                    strides=(self.tubelet_size, self.patch_size, self.patch_size),
                    use_bias=True, dtype=self.dtype, name="patch_embed")(x)
        x = x.reshape(B, n_tubes, N, self.embed_dim)

        cls_token = self.param("cls_token", nn.initializers.normal(0.02),
                               (1, 1, self.embed_dim))
        pos_embed = self.param("pos_embed", nn.initializers.normal(0.02),
                               (1, N + 1, self.embed_dim))
        temporal_embed = self.param("temporal_embed", nn.initializers.normal(0.02),
                                    (1, self.num_frames // self.tubelet_size,
                                     self.embed_dim))

        x = x + (pos_embed[:, None, 1:] + temporal_embed[0, None, :n_tubes, None]
                 ).astype(self.dtype)

        if keep_ind is not None:
            keep = keep_ind[:, :n_tubes, :]  # [B, n_tubes, n_keep]
            x = jnp.take_along_axis(x, keep[..., None], axis=2)

        cls = (cls_token[0, 0] + pos_embed[0, 0]).astype(self.dtype)
        cls = jnp.broadcast_to(cls, (B, 1, self.embed_dim))
        x = jnp.concatenate([cls, x.reshape(B, -1, self.embed_dim)], axis=1)

        block_cls = nn.remat(JointBlock) if self.remat else JointBlock
        for i in range(self.depth):
            x = block_cls(self.embed_dim, self.heads, dtype=self.dtype,
                          name=f"blocks_{i}")(x)

        x = LayerNormF32(eps=1e-6, name="norm")(x)
        if self.num_classes > 0:
            x = nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
        return x
