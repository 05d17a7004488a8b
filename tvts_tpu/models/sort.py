"""Transcript-sorting head.

Behavioral contract: reference v2/model/sort_transformer.py (== v1 copy):
2-layer pre-norm transformer (LayerNorm eps 1e-6) over the concatenation
[video_tokens + type0 ; text_tokens + type1], then LayerNorm + linear head applied
to the text-position slice only (:124-142). Output: [B, n_text, num_classes] logits
scoring which temporal clip each transcript belongs to.
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax.numpy as jnp

from tvts_tpu.models.configs import SortConfig
from tvts_tpu.models.layers import LayerNormF32, Mlp, SelfAttention


class SortBlock(nn.Module):
    cfg: SortConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, tail: int | None = None) -> jnp.ndarray:
        """`tail=k`: return only the last k rows of the block output (exact —
        attention still keys/values over every row). The video-position rows
        of the FINAL block are dead work (only the text slice feeds the
        output head), the sort-head analog of the extraction CLS-only tail."""
        cfg = self.cfg
        attn = SelfAttention(cfg.embed_dim, cfg.num_heads, dtype=self.dtype,
                             name="attn")
        mlp = Mlp(int(cfg.embed_dim * cfg.mlp_ratio), cfg.embed_dim, act="gelu",
                  dtype=self.dtype, name="mlp")
        a = attn(LayerNormF32(eps=1e-6, name="norm1")(x), q_tail=tail)
        x = (x if tail is None else x[:, -tail:]) + a
        x = x + mlp(LayerNormF32(eps=1e-6, name="norm2")(x))
        return x


class SortTransformer(nn.Module):
    cfg: SortConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text_tokens: jnp.ndarray, video_tokens: jnp.ndarray) -> jnp.ndarray:
        """text_tokens: [B, n_trans, D] per-clip text embeddings (detached upstream);
        video_tokens: [B, S, D] video order tokens. Returns [B, n_trans, num_classes]."""
        cfg = self.cfg
        type_embed = self.param("type_embed", nn.initializers.zeros,
                                (1, 2, cfg.embed_dim))
        type_embed = type_embed.astype(self.dtype)
        v = video_tokens + type_embed[:, 0:1]
        t = text_tokens + type_embed[:, 1:2]
        x = jnp.concatenate([v, t], axis=1)

        n_text = t.shape[1]
        # TVTS_SORT_TAIL=0 restores the full last block (A/B measurement knob)
        trim = os.environ.get("TVTS_SORT_TAIL", "1") != "0"
        for i in range(cfg.depth):
            # last block: compute only the text-position rows (dead-work trim,
            # exact — see SortBlock.tail)
            tail = n_text if (trim and i == cfg.depth - 1) else None
            x = SortBlock(cfg, dtype=self.dtype, name=f"blocks_{i}")(x, tail=tail)

        if not trim:
            x = x[:, -n_text:]
        x = LayerNormF32(eps=1e-6, name="norm")(x)
        return nn.Dense(cfg.num_classes, dtype=self.dtype, name="head")(x)
