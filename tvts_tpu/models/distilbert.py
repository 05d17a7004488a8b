"""DistilBERT text encoder (the TVTS v1 text tower).

Behavioral contract: HuggingFace `distilbert-base-uncased` as consumed by the
reference (v1/model/model_dist_TVTS.py:33,126-130): `last_hidden_state[:, 0]`
(CLS pooling) with an attention mask from padded tokenization. Architecture per
the HF implementation: word + learned-position embeddings -> LayerNorm (eps 1e-12)
-> 6 blocks of {self-attention (q/k/v/out linears), sa_layer_norm (post-attn,
residual), FFN lin1-gelu-lin2, output_layer_norm (post-FFN, residual)}.
Post-norm ordering (BERT style), unlike the CLIP towers.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from tvts_tpu.models.layers import LayerNormF32, split_heads, merge_heads


@dataclasses.dataclass(frozen=True)
class DistilBertConfig:
    vocab_size: int = 30522
    max_position_embeddings: int = 512
    dim: int = 768
    hidden_dim: int = 3072
    n_layers: int = 6
    n_heads: int = 12


class DistilBertBlock(nn.Module):
    cfg: DistilBertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias):
        cfg = self.cfg
        head_dim = cfg.dim // cfg.n_heads
        q = nn.Dense(cfg.dim, dtype=self.dtype, name="q_lin")(x)
        k = nn.Dense(cfg.dim, dtype=self.dtype, name="k_lin")(x)
        v = nn.Dense(cfg.dim, dtype=self.dtype, name="v_lin")(x)
        q = split_heads(q, cfg.n_heads) / jnp.asarray(head_dim ** 0.5, self.dtype)
        k = split_heads(k, cfg.n_heads)
        v = split_heads(v, cfg.n_heads)
        logits = jnp.einsum("bhid,bhjd->bhij", q, k) + attn_bias
        p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = merge_heads(jnp.einsum("bhij,bhjd->bhid", p, v))
        out = nn.Dense(cfg.dim, dtype=self.dtype, name="out_lin")(out)
        x = LayerNormF32(eps=1e-12, name="sa_layer_norm")(x + out)

        h = nn.Dense(cfg.hidden_dim, dtype=self.dtype, name="lin1")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.dim, dtype=self.dtype, name="lin2")(h)
        return LayerNormF32(eps=1e-12, name="output_layer_norm")(x + h)


class DistilBertEncoder(nn.Module):
    cfg: DistilBertConfig = DistilBertConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray):
        """input_ids/attention_mask: [B, L] int32. Returns last_hidden_state
        [B, L, D] (callers pool CLS at position 0)."""
        cfg = self.cfg
        word = nn.Embed(cfg.vocab_size, cfg.dim, dtype=self.dtype,
                        name="word_embeddings")(input_ids)
        pos_ids = jnp.arange(input_ids.shape[1])[None]
        pos = nn.Embed(cfg.max_position_embeddings, cfg.dim, dtype=self.dtype,
                       name="position_embeddings")(pos_ids)
        x = LayerNormF32(eps=1e-12, name="emb_layer_norm")(word + pos)

        bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0,
                         jnp.finfo(jnp.float32).min).astype(self.dtype)
        for i in range(cfg.n_layers):
            x = DistilBertBlock(cfg, dtype=self.dtype, name=f"blocks_{i}")(x, bias)
        return x


def convert_distilbert_state_dict(sd) -> dict:
    """HF DistilBertModel state_dict (numpy values) -> flax params for
    DistilBertEncoder. Accepts keys with or without a 'distilbert.' prefix."""
    import numpy as np
    import re

    tree: dict = {}

    def put(path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = val

    for key, val in sd.items():
        val = np.asarray(val)
        k = re.sub(r"^distilbert\.", "", key)
        if k.startswith("embeddings.word_embeddings"):
            put(("word_embeddings", "embedding"), val)
        elif k.startswith("embeddings.position_embeddings"):
            put(("position_embeddings", "embedding"), val)
        elif k.startswith("embeddings.LayerNorm"):
            leaf = "scale" if k.endswith("weight") else "bias"
            put(("emb_layer_norm", leaf), val)
        elif ".layer." in k:
            m = re.match(
                r"transformer\.layer\.(\d+)\.(attention|sa_layer_norm|ffn|output_layer_norm)\.?(.*)", k)
            if not m:
                continue
            i, section, rest = m.group(1), m.group(2), m.group(3)
            blk = f"blocks_{i}"
            if section == "attention":
                name, leaf = rest.split(".")
                if leaf == "weight":
                    put((blk, name, "kernel"), val.T)
                else:
                    put((blk, name, "bias"), val)
            elif section == "ffn":
                name, leaf = rest.split(".")
                if leaf == "weight":
                    put((blk, name, "kernel"), val.T)
                else:
                    put((blk, name, "bias"), val)
            else:  # layer norms
                leaf = "scale" if rest == "weight" else "bias"
                put((blk, section, leaf), val)
    return tree
