"""Shared Flax building blocks.

Numerics contracts:
- `LayerNormF32` — compute LayerNorm in float32 and cast back to the input dtype
  (reference CLIP/clip/model.py:157-163 and video_encoder_ViT_H_14.py:110-125; on
  TPU this keeps bf16 activations stable with no GradScaler).
- `quick_gelu` — x * sigmoid(1.702 x) (CLIP/clip/model.py:166-168).
- `VarAttention` — qkv/proj projection pair around divided space-time attention
  (video_encoder_ViT_B_16.py:18-76); `zero_init=True` reproduces the time-attention
  init (qkv zeros, proj weight ones / bias zeros, :28-34).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from tvts_tpu.ops.attention import (
    divided_space_time_attention,
    full_attention,
    merge_heads,
    split_heads,
)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def get_activation(name: str) -> Callable:
    if name == "quick_gelu":
        return quick_gelu
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(f"unknown activation {name!r}")


class LayerNormF32(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y.astype(x.dtype)


class Mlp(nn.Module):
    """c_fc -> act -> c_proj (CLIP block MLP, hidden = width * mlp_ratio)."""

    hidden_dim: int
    out_dim: int
    act: str = "quick_gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="c_fc")(x)
        x = get_activation(self.act)(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="c_proj")(x)
        return x


def _zeros_init(key, shape, dtype):
    return jnp.zeros(shape, dtype)


def _ones_init(key, shape, dtype):
    return jnp.ones(shape, dtype)


class VarAttention(nn.Module):
    """Divided space/time attention with CLS broadcast (see ops/attention.py).

    use_pallas=True switches the attention core to the fused Pallas kernels
    (ops/pallas_attention.py; forward-only — keep False for training)."""

    dim: int
    num_heads: int
    zero_init: bool = False  # time-attention init: qkv zeros, proj weight ones
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_frames: int, patches_per_frame: int,
                 mode: str) -> jnp.ndarray:
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5
        qkv_kernel_init = _zeros_init if self.zero_init else nn.initializers.lecun_normal()
        proj_kernel_init = _ones_init if self.zero_init else nn.initializers.lecun_normal()

        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, kernel_init=qkv_kernel_init,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = split_heads(q * scale, self.num_heads)
        k = split_heads(k, self.num_heads)
        v = split_heads(v, self.num_heads)

        # on-chip measurement (PERF.md): the fused kernel wins for space
        # (2.3x — kills the softmax HBM passes); the XLA path wins for time
        # (T=12 groups are too small for the kernel's unrolled loop)
        if self.use_pallas and mode == "space":
            from tvts_tpu.ops.pallas_attention import divided_space_time_attention_fused

            out = divided_space_time_attention_fused(q, k, v, num_frames,
                                                     patches_per_frame, mode)
        else:
            out = divided_space_time_attention(q, k, v, num_frames,
                                               patches_per_frame, mode)
        out = merge_heads(out)
        return nn.Dense(self.dim, dtype=self.dtype, kernel_init=proj_kernel_init,
                        name="proj")(out)


class SelfAttention(nn.Module):
    """Plain multi-head self-attention (text tower / sort head), optional causal mask.

    `q_tail=k` computes attention OUTPUTS for only the last k query rows
    (k/v still span every row) — exact for those rows, used by the sort
    head's dead-work-free final block (only the text-position slice is
    consumed downstream). Mutually exclusive with `causal`.
    """

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal: bool = False,
                 q_tail: int | None = None) -> jnp.ndarray:
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if q_tail is not None:
            assert not causal, "q_tail is for the sort head's full attention"
            q = q[:, -q_tail:]
        q = split_heads(q * scale, self.num_heads)
        k = split_heads(k, self.num_heads)
        v = split_heads(v, self.num_heads)

        if causal:
            S = x.shape[1]
            logits = jnp.einsum("bhid,bhjd->bhij", q, k)
            mask = jnp.tril(jnp.ones((S, S), dtype=bool))
            logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
            p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
            out = jnp.einsum("bhij,bhjd->bhid", p, v)
        else:
            out = full_attention(q, k, v)
        out = merge_heads(out)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
