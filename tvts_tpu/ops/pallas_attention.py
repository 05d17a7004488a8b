"""Fused Pallas kernels for divided space-time attention.

Replaces the XLA path's HBM-materialized probability tensors (the dominant cost
at B/16 scale: [B,H,T,N,N+1] fp32 softmax intermediates) with in-VMEM fp32
softmax. Semantics identical to ops/attention.divided_space_time_attention
(reference VarAttention, video_encoder_ViT_B_16.py:18-76): per-group softmax
attention with the CLS key/value spliced into every group; the CLS query row is
computed outside the kernel (one tiny full attention).

Space mode: grid (B*H*T,); each program handles one frame's [N, d] tile.
Time mode:  grid (B*H,); each program holds the whole [T, N, d] group set in
VMEM and loops over the T query frames (T is small: 12, so the loop unrolls).

The kernels are inference/forward kernels; training uses the XLA path (AD).
Select via `divided_space_time_attention_fused` or the `use_pallas` flag on
`VarAttention`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tvts_tpu.ops.attention import full_attention


def _space_attention_fused(qp, kp, vp, cls_k, cls_v):
    """qp/kp/vp: [B, T, H, N, d]; cls_k/cls_v: [B, H, 1, d] -> [B, T, H, N, d].

    One program per (batch, frame); the head loop unrolls in-kernel so the DMA
    of the frame's [H, N, d] tiles is amortized over all H head matmuls.
    """
    B, T, H, N, d = qp.shape
    group_spec = pl.BlockSpec((1, 1, H, N, d), lambda b, t: (b, t, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, H, 1, d), lambda b, t: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, o_ref):
        for h in range(H):
            q = q_ref[0, 0, h]
            k = k_ref[0, 0, h]
            v = v_ref[0, 0, h]
            ck = ck_ref[0, h]
            cv = cv_ref[0, h]
            logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [N, N]
            cls_logit = jnp.dot(q, ck.T, preferred_element_type=jnp.float32)
            m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), cls_logit)
            p = jnp.exp(logits - m)
            p_cls = jnp.exp(cls_logit - m)
            denom = jnp.sum(p, axis=-1, keepdims=True) + p_cls
            out = jnp.dot(p.astype(q.dtype), v, preferred_element_type=jnp.float32)
            out = out + p_cls * cv.astype(jnp.float32)
            o_ref[0, 0, h] = (out / denom).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=[group_spec, group_spec, group_spec, cls_spec, cls_spec],
        out_specs=group_spec,
        out_shape=jax.ShapeDtypeStruct(qp.shape, qp.dtype),
    )(qp, kp, vp, cls_k, cls_v)


def _time_attention_fused(qp, kp, vp, cls_k, cls_v):
    """qp/kp/vp: [BH, T, N, d]; cls_k/cls_v: [BH, 1, d] -> [BH, T, N, d].

    Per spatial location, attention over the T frames + the CLS column; the
    frame loop is a static unroll (T == 12).
    """
    BH, T, N, d = qp.shape
    group_spec = pl.BlockSpec((1, T, N, d), lambda b: (b, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, d), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def kernel(q_ref, k_ref, v_ref, ck_ref, cv_ref, o_ref):
        ck = ck_ref[0].astype(jnp.float32)   # [1, d]
        cv = cv_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)     # [T, N, d]
        v = v_ref[0].astype(jnp.float32)
        for t in range(T):
            q_t = q_ref[0, t].astype(jnp.float32)  # [N, d]
            cls_l = jnp.sum(q_t * ck, axis=-1)[None]            # [1, N]
            frame_l = jnp.sum(q_t[None] * k, axis=-1)            # [T, N]
            logits = jnp.concatenate([cls_l, frame_l], axis=0)   # [T+1, N]
            m = jnp.max(logits, axis=0, keepdims=True)
            p = jnp.exp(logits - m)
            denom = jnp.sum(p, axis=0, keepdims=True)
            out = p[0][:, None] * cv                             # CLS column
            out = out + jnp.sum(p[1:][:, :, None] * v, axis=0)   # [N, d]
            o_ref[0, t] = (out / denom[0][:, None]).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(BH,),
        in_specs=[group_spec, group_spec, group_spec, cls_spec, cls_spec],
        out_specs=group_spec,
        out_shape=jax.ShapeDtypeStruct(qp.shape, qp.dtype),
    )(qp, kp, vp, cls_k, cls_v)


def divided_space_time_attention_fused(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    num_frames: int, patches_per_frame: int, mode: str,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in fused replacement for ops.attention.divided_space_time_attention.
    q, k, v: [B, H, S, d], q pre-scaled. Forward-only (no custom VJP yet)."""
    B, H, S, d = q.shape
    T, N = num_frames, patches_per_frame
    assert S == 1 + T * N

    cls_out = full_attention(q[:, :, :1], k, v)  # [B, H, 1, d] — XLA, tiny
    cls_k = k[:, :, 0].reshape(B * H, 1, d)
    cls_v = v[:, :, 0].reshape(B * H, 1, d)

    if mode == "space":
        def fold(x):  # [B,H,S,d] -> [B,T,H,N,d]
            return x[:, :, 1:].reshape(B, H, T, N, d).transpose(0, 2, 1, 3, 4)
        fn = _space_attention_fused
        cls_k = cls_k.reshape(B, H, 1, d)
        cls_v = cls_v.reshape(B, H, 1, d)
    else:
        def fold(x):
            return x[:, :, 1:].reshape(B * H, T, N, d)
        fn = _time_attention_fused

    if interpret:
        fn = functools.partial(_interpret_call, fn)
    out = fn(fold(q), fold(k), fold(v), cls_k, cls_v)
    if mode == "space":
        out = out.transpose(0, 2, 1, 3, 4)  # back to [B,H,T,N,d]
    out = out.reshape(B, H, T * N, d)
    return jnp.concatenate([cls_out, out], axis=2)


def _interpret_call(fn, *args):
    with pltpu.force_tpu_interpret_mode():
        return fn(*args)
