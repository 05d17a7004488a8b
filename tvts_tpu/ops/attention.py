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

    Layouts were chosen by on-chip measurement (tools/attn_variants.py): for
    'space', direct no-transpose einsums over [B, H, T, N, d] (~17x faster than a
    group-major transpose formulation); for 'time', groups folded into one batch
    dim so XLA emits a single batched matmul over [B*H*N, T, d].
    """
    B, H, S, d = q.shape
    T, N = num_frames, patches_per_frame
    assert S == 1 + T * N, f"token count {S} != 1 + {T}*{N}"

    cls_out = full_attention(q[:, :, :1], k, v)  # [B, H, 1, d]
    cls_k, cls_v = k[:, :, 0], v[:, :, 0]  # [B, H, d]

    q5 = q[:, :, 1:].reshape(B, H, T, N, d)
    k5 = k[:, :, 1:].reshape(B, H, T, N, d)
    v5 = v[:, :, 1:].reshape(B, H, T, N, d)

    if mode == "space":
        # per-frame attention over the N patches; CLS spliced in algebraically
        logits = jnp.einsum("bhtnd,bhtmd->bhtnm", q5, k5)
        cls_l = jnp.einsum("bhtnd,bhd->bhtn", q5, cls_k)
        p = _softmax_f32(jnp.concatenate([cls_l[..., None], logits], -1), q.dtype)
        out = jnp.einsum("bhtnm,bhtmd->bhtnd", p[..., 1:], v5)
        out = out + p[..., 0][..., None] * cls_v[:, :, None, None, :]
    elif mode == "time":
        # per-location attention over the T frames; fold (B,H,N) into batch
        def fold(x):  # [B,H,T,N,d] -> [B*H*N, T, d]
            return x.transpose(0, 1, 3, 2, 4).reshape(B * H * N, T, d)

        qg, kg, vg = fold(q5), fold(k5), fold(v5)
        ck = jnp.repeat(cls_k.reshape(B * H, 1, d), N, axis=0)
        cv = jnp.repeat(cls_v.reshape(B * H, 1, d), N, axis=0)
        p = _softmax_f32(jnp.einsum(
            "gid,gjd->gij", qg, jnp.concatenate([ck, kg], axis=1)), q.dtype)
        out = jnp.einsum("gij,gjd->gid", p, jnp.concatenate([cv, vg], axis=1))
        out = out.reshape(B, H, N, T, d).transpose(0, 1, 3, 2, 4)
    else:
        raise ValueError(f"unknown mode {mode!r}")

    out = out.reshape(B, H, T * N, d)
    return jnp.concatenate([cls_out, out], axis=2)


def divided_attention_max_logit(
    q: jnp.ndarray,
    k: jnp.ndarray,
    num_frames: int,
    patches_per_frame: int,
    mode: str,
) -> jnp.ndarray:
    """Exact max attention logit over the same groups as
    divided_space_time_attention (CLS global row + per-group logits including
    the spliced CLS column). q pre-scaled like the attention itself.

    Audit hook for the smv="cp" clamp softmax (pallas_block_attention.
    SMV_CLAMP=70, ops/kernel_config.py): the clamp is exact only while every
    logit <= 70; this reports the actual per-call max on a given checkpoint
    so the rule "max logit > 64 -> use smv='pvones'" can be checked instead
    of assumed. Scalar f32 out.
    """
    B, H, S, d = q.shape
    T, N = num_frames, patches_per_frame
    assert S == 1 + T * N, f"token count {S} != 1 + {T}*{N}"
    q = q.astype(jnp.float32)
    k = k.astype(jnp.float32)

    cls_row = jnp.einsum("bhd,bhjd->bhj", q[:, :, 0], k)  # CLS attends to all
    cls_k = k[:, :, 0]
    q5 = q[:, :, 1:].reshape(B, H, T, N, d)
    k5 = k[:, :, 1:].reshape(B, H, T, N, d)
    cls_col = jnp.einsum("bhtnd,bhd->bhtn", q5, cls_k)
    if mode == "space":
        logits = jnp.einsum("bhtnd,bhtmd->bhtnm", q5, k5)
    elif mode == "time":
        logits = jnp.einsum("bhtnd,bhsnd->bhtns", q5, k5)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return jnp.maximum(jnp.maximum(cls_row.max(), cls_col.max()), logits.max())


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B, S, D] -> [B, H, S, d]."""
    B, S, D = x.shape
    return x.reshape(B, S, num_heads, D // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, S, d] -> [B, S, D]."""
    B, H, S, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, S, H * d)
