"""Divided space-time attention, XLA-native.

Behavioral contract: reference v2/model/video_encoder_ViT_B_16.py:18-76
(`VarAttention`): over a token stream ``[CLS, f0p0..f0pN, f1p0.., ...]`` (frame-major),
- the CLS query attends to every token (global attention);
- patch queries attend within their group — all patches of the same frame
  ("space", groups of size N) or the same spatial location across frames
  ("time", groups of size T) — **plus** the CLS key/value broadcast into every group.

TPU-first notes: instead of materializing the reference's einops regroup + concat of
broadcast CLS k/v, we keep `[B, H, T, N, d]` layouts and splice the CLS logit/value
into the softmax algebraically. All shapes are static; the two einsums per group map
straight onto the MXU, and the CLS column costs one broadcast multiply-add instead of
a (B·H·G, 1, d) concat. Softmax runs in fp32 regardless of compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _softmax_f32(logits: jnp.ndarray, dtype) -> jnp.ndarray:
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)


def full_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Plain softmax attention. q,k,v: [..., S, d] (q assumed pre-scaled)."""
    logits = jnp.einsum("...id,...jd->...ij", q, k)
    p = _softmax_f32(logits, q.dtype)
    return jnp.einsum("...ij,...jd->...id", p, v)


def divided_space_time_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_frames: int,
    patches_per_frame: int,
    mode: str,
) -> jnp.ndarray:
    """One divided-attention pass (either 'time' or 'space').

    q, k, v: [B, H, S, d] with S = 1 + num_frames * patches_per_frame, frame-major
    patch layout, q pre-scaled by 1/sqrt(d). Returns [B, H, S, d].
    """
    B, H, S, d = q.shape
    T, N = num_frames, patches_per_frame
    assert S == 1 + T * N, f"token count {S} != 1 + {T}*{N}"

    cls_out = full_attention(q[:, :, :1], k, v)  # [B, H, 1, d]

    def group(x):
        x = x.reshape(B, H, T, N, d)
        if mode == "time":
            # groups indexed by spatial location, sequence axis = frames
            return x.transpose(0, 1, 3, 2, 4)  # [B, H, N, T, d]
        if mode == "space":
            return x  # [B, H, T, N, d]
        raise ValueError(f"unknown mode {mode!r}")

    qg, kg, vg = group(q[:, :, 1:]), group(k[:, :, 1:]), group(v[:, :, 1:])
    cls_k, cls_v = k[:, :, 0], v[:, :, 0]  # [B, H, d]

    # [B, H, G, L, L] intra-group logits + [B, H, G, L] CLS-column logits
    logits = jnp.einsum("bhgid,bhgjd->bhgij", qg, kg)
    cls_logit = jnp.einsum("bhgid,bhd->bhgi", qg, cls_k)
    p = _softmax_f32(jnp.concatenate([cls_logit[..., None], logits], axis=-1), q.dtype)

    out = jnp.einsum("bhgij,bhgjd->bhgid", p[..., 1:], vg)
    out = out + p[..., :1] * cls_v[:, :, None, None, :]

    if mode == "time":
        out = out.transpose(0, 1, 3, 2, 4)  # [B, H, T, N, d]
    out = out.reshape(B, H, T * N, d)
    return jnp.concatenate([cls_out, out], axis=2)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B, S, D] -> [B, H, S, d]."""
    B, S, D = x.shape
    return x.reshape(B, S, num_heads, D // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, S, d] -> [B, S, D]."""
    B, H, S, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, S, H * d)
