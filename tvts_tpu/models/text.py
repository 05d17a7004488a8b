"""CLIP-compatible text tower.

Behavioral contract: reference v2/CLIP/clip/model.py:171-204 (ResidualAttentionBlock
with causal mask, QuickGELU) composed exactly as the TVTSv2 wrappers do
(model_dist_TVTSv2_ViT_B_16.py:97-111 / ..._H_14.py:134-149): token embedding +
positional embedding -> causal pre-norm transformer -> ln_final -> pool the feature
at the EOT position (argmax of token ids) -> @ text_projection. The OpenCLIP H/14
variant differs only in activation (plain GELU) and parameter provenance.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tvts_tpu.models.configs import TextConfig
from tvts_tpu.models.layers import LayerNormF32, Mlp, SelfAttention


class TextBlock(nn.Module):
    cfg: TextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = x + SelfAttention(cfg.width, cfg.heads, dtype=self.dtype, name="attn")(
            LayerNormF32(name="ln_1")(x), causal=True)
        x = x + Mlp(cfg.width * 4, cfg.width, act=cfg.act, dtype=self.dtype,
                    name="mlp")(LayerNormF32(name="ln_2")(x))
        return x


class TextTransformer(nn.Module):
    cfg: TextConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        """token_ids: [B, context_length] int32. Returns [B, output_dim] (the
        pre-normalization text embedding — callers L2-normalize in sim_matrix)."""
        cfg = self.cfg
        emb = nn.Embed(cfg.vocab_size, cfg.width, dtype=self.dtype,
                       name="token_embedding")(token_ids)
        positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width))
        x = emb + positional_embedding[None].astype(self.dtype)

        block_cls = nn.remat(TextBlock) if self.remat else TextBlock
        for i in range(cfg.layers):
            x = block_cls(cfg, dtype=self.dtype, name=f"blocks_{i}")(x)

        x = LayerNormF32(name="ln_final")(x)

        # pool at EOT = argmax of token ids (EOT is the largest id in the vocab)
        eot_pos = jnp.argmax(token_ids, axis=-1)
        pooled = jnp.take_along_axis(x, eot_pos[:, None, None], axis=1)[:, 0]

        text_projection = self.param(
            "text_projection", nn.initializers.normal(cfg.width ** -0.5),
            (cfg.width, cfg.output_dim))
        return pooled @ text_projection.astype(self.dtype)
