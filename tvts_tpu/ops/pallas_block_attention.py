"""Fused attention sub-path megakernel: LayerNorm + qkv + divided attention +
output projection in ONE Pallas call.

Motivation (PERF.md): isolated-op Pallas kernels lose to XLA because the call
boundary breaks producer/consumer fusion. This kernel moves the WHOLE attention
sub-path of a SpaceTimeBlock inside one kernel, eliminating the HBM round-trips
for the LN output, the [B,S,3D] qkv tensor, the per-head layout copies and the
softmax probability tensors. Weight blocks use constant index maps, so Mosaic's
pipeline fetches them once and keeps them VMEM-resident across grid steps.

Scope: forward-only (training uses the XLA path). The CLS query's global
attention needs k/v of every token, so the kernel also emits per-frame k/v;
the (1-row) CLS attention and the residual add run in XLA outside.

Space mode grid: (B, T) — one frame's [N, D] tokens per program.
"""

from __future__ import annotations


import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Scoped-VMEM ceiling handed to the Mosaic pipeliner. 100 MB is a soft
# compiler budget, not the v5e's 128 MB physical VMEM (measured round 4: the
# H/14 time backward compiles and runs at 120). Kernels with a measured need
# pass an explicit override; TVTS_VMEM_MB sweeps the default for experiments.
VMEM_LIMIT_MB = int(os.environ.get("TVTS_VMEM_MB", "100"))


def _compiler_params(mb: int | None = None) -> pltpu.CompilerParams:
    return pltpu.CompilerParams(
        vmem_limit_bytes=(mb or VMEM_LIMIT_MB) * 1024 * 1024)


# Max-free softmax clamp (smv "clamp"/"cd"/"cp"/"cpr"): logits are
# elementwise-min'd here instead of max-shifted. Exact by shift invariance
# while every logit <= this value; rows saturate gracefully above. 70 (not
# the f32 exp-overflow margin 88.7, and not the round-4 80): the p@v
# NUMERATOR must also fit f32 — (N+1) * e^c * max|v| <= 3.4e38 needs
# c < 78.8 at extraction N=197, |v|~100, which round 4's 80 violated
# (measured NaN under heavy saturation, round 5). c=70 bounds the numerator
# at ~5e34 with |v| headroom to 1e4. Audit rule: tools/logit_audit.py,
# threshold SMV_CLAMP - 6.
SMV_CLAMP = 70.0
# Denominator guard for the clamp variants only: rounds away in f32 for any
# healthy denominator (>= ~1e-23) and turns the pathological all-logits-
# underflow row (exp flushed to 0 -> 0/0 NaN) into an exact 0 output.
SMV_DENOM_GUARD = 1e-30


def lane_pad_gain(n: int, g: int) -> bool:
    """True when lane-concatenating g tiles of n lanes pays a smaller MXU
    lane pad than per-tile matmuls (the round-4 mm_group gate): e.g. n=196
    g=3 -> 8.8%% vs 30.6%%; n=256 any g -> no gain (already tile-aligned)."""
    import math

    pad1 = math.ceil(n / 128) * 128 / n
    padg = math.ceil(g * n / 128) * 128 / (g * n)
    return padg < pad1 - 0.02


def _make_space_block_kernel(H: int, FPP: int = 1):
    def kernel(x_ref, cls_ref, ln_s_ref, ln_b_ref,
               wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
               o_ref, k_out_ref, v_out_ref):
        """FPP frames per program: x block [1, FPP, N, D]; cls [1, 1, D];
        weights resident across grid steps.

        Writes: o (attention output incl. projection, pre-residual);
        k_out/v_out (for the XLA-side CLS global attention)."""
        D = x_ref.shape[-1]
        d = D // H

        ln_s = ln_s_ref[0].astype(jnp.float32)   # [D]
        ln_b = ln_b_ref[0].astype(jnp.float32)

        def layernorm(t):  # t [n, D] -> fp32 normalized
            tf = t.astype(jnp.float32)
            mu = jnp.mean(tf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(tf - mu), axis=-1, keepdims=True)
            return (tf - mu) * jax.lax.rsqrt(var + 1e-5) * ln_s[None] + ln_b[None]

        dtype = o_ref.dtype
        wqkv = wqkv_ref[:]
        bqkv = bqkv_ref[:].astype(jnp.float32)             # [1, 3D]
        cls_ln = layernorm(cls_ref[0]).astype(dtype)       # [1, D]
        qkv_c = jnp.dot(cls_ln, wqkv, preferred_element_type=jnp.float32) + bqkv
        ck = qkv_c[:, D:2 * D].astype(dtype)               # [1, D]
        cv = qkv_c[:, 2 * D:].astype(dtype)
        scale = jnp.asarray(d, jnp.float32) ** -0.5

        for f in range(FPP):
            x_ln = layernorm(x_ref[0, f]).astype(dtype)    # [N, D]
            qkv = jnp.dot(x_ln, wqkv, preferred_element_type=jnp.float32) + bqkv
            q = (qkv[:, :D] * scale).astype(dtype)         # [N, D]
            k = qkv[:, D:2 * D].astype(dtype)
            v = qkv[:, 2 * D:].astype(dtype)
            k_out_ref[0, f] = k
            v_out_ref[0, f] = v

            outs = []
            for h in range(H):
                sl = slice(h * d, (h + 1) * d)
                qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
                logits = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32)
                cls_logit = jnp.dot(qh, ck[:, sl].T,
                                    preferred_element_type=jnp.float32)  # [N, 1]
                m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), cls_logit)
                p = jnp.exp(logits - m)
                p_cls = jnp.exp(cls_logit - m)
                denom = jnp.sum(p, axis=-1, keepdims=True) + p_cls
                oh = jnp.dot(p.astype(dtype), vh,
                             preferred_element_type=jnp.float32)
                oh = (oh + p_cls * cv[:, sl].astype(jnp.float32)) / denom
                outs.append(oh.astype(dtype))
            attn_out = jnp.concatenate(outs, axis=-1)       # [N, D]

            proj = jnp.dot(attn_out, wproj_ref[:],
                           preferred_element_type=jnp.float32) \
                + bproj_ref[:].astype(jnp.float32)
            o_ref[0, f] = proj.astype(dtype)

    return kernel


def fused_space_attention_block(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                                num_frames: int, patches_per_frame: int,
                                num_heads: int, frames_per_program: int = 1,
                                interpret: bool = False):
    """Full VarAttention('space') sub-path: returns attention output [B, S, D]
    (pre-residual). x: [B, S, D] bf16/f32 with S = 1 + T*N."""
    B, S, D = x.shape
    T, N = num_frames, patches_per_frame
    assert S == 1 + T * N

    x_cls = x[:, :1]                                  # [B, 1, D]
    x_p = x[:, 1:].reshape(B, T, N, D)

    fpp = frames_per_program if T % frames_per_program == 0 else 1
    frame_spec = pl.BlockSpec((1, fpp, N, D), lambda b, t: (b, t, 0, 0),
                              memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, D), lambda b, t: (0, 0), memory_space=pltpu.VMEM)
    qkv_vec_spec = pl.BlockSpec((1, 3 * D), lambda b, t: (0, 0),
                                memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((D, 3 * D), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    wproj_spec = pl.BlockSpec((D, D), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        _make_space_block_kernel(num_heads, fpp),
        grid=(B, T // fpp),
        in_specs=[frame_spec, cls_spec, vec_spec, vec_spec, wqkv_spec,
                  qkv_vec_spec, wproj_spec, vec_spec],
        out_specs=(frame_spec, frame_spec, frame_spec),
        out_shape=(jax.ShapeDtypeStruct((B, T, N, D), x.dtype),
                   jax.ShapeDtypeStruct((B, T, N, D), x.dtype),
                   jax.ShapeDtypeStruct((B, T, N, D), x.dtype)),
        interpret=interpret,
    )

    out_p, k_p, v_p = call(
        x_p, x_cls,
        ln_scale.reshape(1, D), ln_bias.reshape(1, D),
        wqkv, bqkv.reshape(1, 3 * D), wproj, bproj.reshape(1, D))

    # --- XLA side: CLS row (global attention over all tokens) + assembly ----
    d = D // num_heads
    scale = d ** -0.5

    def layernorm(t):
        tf = t.astype(jnp.float32)
        mu = jnp.mean(tf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(tf - mu), axis=-1, keepdims=True)
        return (tf - mu) * jax.lax.rsqrt(var + 1e-5) * ln_scale + ln_bias

    cls_ln = layernorm(x_cls[:, 0]).astype(x.dtype)   # [B, D]
    qkv_c = cls_ln @ wqkv + bqkv                       # [B, 3D]
    cls_q = (qkv_c[:, :D] * scale).reshape(B, num_heads, 1, d)
    cls_k = qkv_c[:, D:2 * D].reshape(B, num_heads, 1, d)
    cls_v = qkv_c[:, 2 * D:].reshape(B, num_heads, 1, d)

    def heads(t):  # [B, T, N, D] -> [B, H, T*N, d]
        return t.reshape(B, T * N, num_heads, d).transpose(0, 2, 1, 3)

    k_all = jnp.concatenate([cls_k, heads(k_p.reshape(B, T, N, D))], axis=2)
    v_all = jnp.concatenate([cls_v, heads(v_p.reshape(B, T, N, D))], axis=2)
    logits = jnp.einsum("bhid,bhjd->bhij", cls_q, k_all)
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    cls_att = jnp.einsum("bhij,bhjd->bhid", p, v_all)   # [B, H, 1, d]
    cls_att = cls_att.transpose(0, 2, 1, 3).reshape(B, 1, D)
    cls_out = cls_att @ wproj + bproj                   # [B, 1, D]

    out = jnp.concatenate([cls_out.astype(x.dtype),
                           out_p.reshape(B, T * N, D)], axis=1)
    return out


def _make_time_block_kernel(H: int, T: int):
    def kernel(x_ref, cls_ref, ln_s_ref, ln_b_ref,
               wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
               o_ref, k_out_ref, v_out_ref):
        """One location chunk: x block [1, T, Nc, D]; cls [1, 1, D].

        Per-location time attention (+ CLS column); the frame loop unrolls and
        each step is one vectorized op over [T, Nc, d] — N stays a wide dim.
        Also emits k/v (for the XLA-side CLS global attention)."""
        Nc = x_ref.shape[2]
        D = x_ref.shape[3]
        d = D // H

        ln_s = ln_s_ref[0].astype(jnp.float32)
        ln_b = ln_b_ref[0].astype(jnp.float32)

        def layernorm(t):
            tf = t.astype(jnp.float32)
            mu = jnp.mean(tf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(tf - mu), axis=-1, keepdims=True)
            return (tf - mu) * jax.lax.rsqrt(var + 1e-5) * ln_s[None] + ln_b[None]

        dtype = o_ref.dtype
        x_ln = layernorm(x_ref[0].reshape(T * Nc, D)).astype(dtype)
        cls_ln = layernorm(cls_ref[0]).astype(dtype)  # [1, D]

        wqkv = wqkv_ref[:]
        bqkv = bqkv_ref[:].astype(jnp.float32)
        qkv = jnp.dot(x_ln, wqkv, preferred_element_type=jnp.float32) + bqkv
        qkv_c = jnp.dot(cls_ln, wqkv, preferred_element_type=jnp.float32) + bqkv

        scale = jnp.asarray(d, jnp.float32) ** -0.5
        # keep q/k/v bf16 in VMEM; cast to fp32 only inside the small per-head
        # temporaries (the fp32 [T, Nc, D] triple blew the scoped-VMEM budget)
        q = (qkv[:, :D] * scale).astype(dtype).reshape(T, Nc, D)
        k = qkv[:, D:2 * D].astype(dtype).reshape(T, Nc, D)
        v = qkv[:, 2 * D:].astype(dtype).reshape(T, Nc, D)
        ck = qkv_c[0, D:2 * D].astype(dtype)        # [D]
        cv = qkv_c[0, 2 * D:].astype(dtype)
        k_out_ref[0] = k
        v_out_ref[0] = v

        # Layout choice (measured, PERF.md): d-MAJOR per-head tiles [T, d, Nc]
        # keep locations in the lane dim and reduce the d contraction over
        # SUBLANES — ~4.7x faster than the n-major/lane-reduce formulation.
        # (A whole-pair einsum 'tnd,snd->tsn' would be cleaner but Mosaic cannot
        # lower the n-batched contraction: "Only 2D gather is supported".)
        head_outs = []
        for h in range(H):
            sl = slice(h * d, (h + 1) * d)
            qh = jnp.swapaxes(q[..., sl], -1, -2).astype(jnp.float32)  # [T, d, Nc]
            kh = jnp.swapaxes(k[..., sl], -1, -2).astype(jnp.float32)
            vh = jnp.swapaxes(v[..., sl], -1, -2).astype(jnp.float32)
            ckh = ck[sl].astype(jnp.float32)                  # [d]
            cvh = cv[sl].astype(jnp.float32)
            outs_t = []
            for t in range(T):
                l = jnp.sum(qh[t][None] * kh, axis=1)         # [T, Nc]
                cls_l = jnp.sum(qh[t] * ckh[:, None], axis=0)[None]  # [1, Nc]
                full = jnp.concatenate([cls_l, l], axis=0)    # [T+1, Nc]
                m = jnp.max(full, axis=0, keepdims=True)
                p = jnp.exp(full - m)
                denom = jnp.sum(p, axis=0, keepdims=True)
                out_t = jnp.sum(p[1:][:, None, :] * vh, axis=0)  # [d, Nc]
                out_t = out_t + p[0][None, :] * cvh[:, None]
                outs_t.append((out_t / denom).astype(dtype))
            head_outs.append(jnp.stack(outs_t))               # [T, d, Nc]
        attn = jnp.concatenate(head_outs, axis=1)             # [T, D, Nc]
        attn = jnp.swapaxes(attn, -1, -2).reshape(T * Nc, D)

        proj = jnp.dot(attn, wproj_ref[:],
                       preferred_element_type=jnp.float32) \
            + bproj_ref[:].astype(jnp.float32)
        o_ref[0] = proj.reshape(T, Nc, D).astype(dtype)

    return kernel


def fused_time_attention_block(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
                               num_frames: int, patches_per_frame: int,
                               num_heads: int, chunk: int = 32,
                               interpret: bool = False):
    """Full VarAttention('time') sub-path: returns attention output [B, S, D]
    (pre-residual). The N axis is zero-padded to a multiple of `chunk` so block
    offsets stay tile-aligned; padded locations are sliced away (time groups
    never mix locations, so padding cannot contaminate real outputs)."""
    B, S, D = x.shape
    T, N = num_frames, patches_per_frame
    assert S == 1 + T * N

    x_cls = x[:, :1]
    x_p = x[:, 1:].reshape(B, T, N, D)
    n_pad = (-N) % chunk
    if n_pad:
        x_p = jnp.pad(x_p, ((0, 0), (0, 0), (0, n_pad), (0, 0)))
    Np = N + n_pad

    chunk_spec = pl.BlockSpec((1, T, chunk, D), lambda b, c: (b, 0, c, 0),
                              memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b, c: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, D), lambda b, c: (0, 0), memory_space=pltpu.VMEM)
    qkv_vec_spec = pl.BlockSpec((1, 3 * D), lambda b, c: (0, 0),
                                memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((D, 3 * D), lambda b, c: (0, 0),
                             memory_space=pltpu.VMEM)
    wproj_spec = pl.BlockSpec((D, D), lambda b, c: (0, 0),
                              memory_space=pltpu.VMEM)

    out_p, k_p, v_p = pl.pallas_call(
        _make_time_block_kernel(num_heads, T),
        grid=(B, Np // chunk),
        in_specs=[chunk_spec, cls_spec, vec_spec, vec_spec, wqkv_spec,
                  qkv_vec_spec, wproj_spec, vec_spec],
        out_specs=(chunk_spec, chunk_spec, chunk_spec),
        out_shape=(jax.ShapeDtypeStruct((B, T, Np, D), x.dtype),
                   jax.ShapeDtypeStruct((B, T, Np, D), x.dtype),
                   jax.ShapeDtypeStruct((B, T, Np, D), x.dtype)),
        interpret=interpret,
    )(x_p, x_cls, ln_scale.reshape(1, D), ln_bias.reshape(1, D),
      wqkv, bqkv.reshape(1, 3 * D), wproj, bproj.reshape(1, D))
    out_p = out_p[:, :, :N]

    # --- XLA side: CLS row attends globally (kernel-emitted k/v) -----------
    d = D // num_heads
    scale = d ** -0.5

    def layernorm(t):
        tf = t.astype(jnp.float32)
        mu = jnp.mean(tf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(tf - mu), axis=-1, keepdims=True)
        return (tf - mu) * jax.lax.rsqrt(var + 1e-5) * ln_scale + ln_bias

    cls_ln = layernorm(x_cls[:, 0]).astype(x.dtype)
    qkv_c = cls_ln @ wqkv + bqkv                            # [B, 3D]
    cls_q = (qkv_c[:, :D] * scale).reshape(B, num_heads, 1, d)
    cls_k = qkv_c[:, D:2 * D].reshape(B, num_heads, 1, d)
    cls_v = qkv_c[:, 2 * D:].reshape(B, num_heads, 1, d)

    def heads(t):  # [B, T, N, D] -> [B, H, T*N, d]
        return t.reshape(B, T * N, num_heads, d).transpose(0, 2, 1, 3)

    k_all = jnp.concatenate([cls_k, heads(k_p[:, :, :N])], axis=2)
    v_all = jnp.concatenate([cls_v, heads(v_p[:, :, :N])], axis=2)
    logits = jnp.einsum("bhid,bhjd->bhij", cls_q, k_all)
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    cls_att = jnp.einsum("bhij,bhjd->bhid", p, v_all)
    cls_att = cls_att.transpose(0, 2, 1, 3).reshape(B, 1, D)
    cls_out = cls_att @ wproj + bproj

    out = jnp.concatenate([cls_out.astype(x.dtype),
                           out_p.reshape(B, T * N, D)], axis=1)
    return out


def _erf(x):
    """fp32 erf via the Abramowitz-Stegun 7.1.26 polynomial (|err| < 1.5e-7).

    Mosaic's TPU lowering implements neither erfc nor erf (hit on real
    hardware with the H/14 exact-gelu config; interpret mode accepted
    lax.erf, which hid it), so exact-gelu kernels use this polynomial —
    well inside bf16 resolution."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _make_mlp_kernel(act: str):
    def kernel(x_ref, ln_s_ref, ln_b_ref, wfc_ref, bfc_ref, wproj_ref,
               bproj_ref, o_ref):
        """One token chunk: x [1, C, D]; computes x + c_proj(act(c_fc(ln(x))))
        (the whole MLP sub-path incl. the residual)."""
        ln_s = ln_s_ref[0].astype(jnp.float32)
        ln_b = ln_b_ref[0].astype(jnp.float32)
        x = x_ref[0]
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * ln_s[None]
             + ln_b[None]).astype(x.dtype)
        h = jnp.dot(y, wfc_ref[:], preferred_element_type=jnp.float32) \
            + bfc_ref[:].astype(jnp.float32)
        if act == "quick_gelu":
            h = h * jax.nn.sigmoid(1.702 * h)
        else:
            # exact gelu via the _erf polynomial (Mosaic implements neither
            # erfc nor erf)
            h = 0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))
        out = jnp.dot(h.astype(x.dtype), wproj_ref[:],
                      preferred_element_type=jnp.float32) \
            + bproj_ref[:].astype(jnp.float32)
        o_ref[0] = (xf + out).astype(o_ref.dtype)

    return kernel


def fused_mlp_block(x, ln_scale, ln_bias, wfc, bfc, wproj, bproj,
                    act: str = "quick_gelu", chunk: int = 256,
                    interpret: bool = False):
    """Full MLP sub-path incl. residual: returns x + MLP(LN(x)). x: [B, S, D].
    The token axis is zero-padded to the chunk size (LN/MLP are per-token, so
    padding is inert and sliced away)."""
    B, S, D = x.shape
    hidden = wfc.shape[1]
    s_pad = (-S) % chunk
    xp = jnp.pad(x, ((0, 0), (0, s_pad), (0, 0))) if s_pad else x
    Sp = S + s_pad

    tok_spec = pl.BlockSpec((1, chunk, D), lambda b, c: (b, c, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, D), lambda b, c: (0, 0), memory_space=pltpu.VMEM)
    hvec_spec = pl.BlockSpec((1, hidden), lambda b, c: (0, 0),
                             memory_space=pltpu.VMEM)
    wfc_spec = pl.BlockSpec((D, hidden), lambda b, c: (0, 0),
                            memory_space=pltpu.VMEM)
    wproj_spec = pl.BlockSpec((hidden, D), lambda b, c: (0, 0),
                              memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _make_mlp_kernel(act),
        grid=(B, Sp // chunk),
        in_specs=[tok_spec, vec_spec, vec_spec, wfc_spec, hvec_spec,
                  wproj_spec, vec_spec],
        out_specs=tok_spec,
        out_shape=jax.ShapeDtypeStruct((B, Sp, D), x.dtype),
        interpret=interpret,
    )(xp, ln_scale.reshape(1, D), ln_bias.reshape(1, D), wfc,
      bfc.reshape(1, hidden), wproj, bproj.reshape(1, D))
    return out[:, :S]


def _interpret_call(call, *args):
    with pltpu.force_tpu_interpret_mode():
        return call(*args)


# ---------------------------------------------------------------------------
# v2 kernels: self-contained attention sub-paths.
#
# The v1 kernels emit k/v tensors ([B,S,D] each) solely so XLA can compute the
# 1-row CLS global attention outside, and return pre-residual outputs that XLA
# adds back. The HLO dump (tools/hlo_cost.py) shows that boundary is the top
# remaining traffic: 12x 534 MB operand sets and 16+ [B,T*N,H,d] reshapes at
# 2.67x physical tile inflation ((12,64) -> (16,128)). v2 moves the CLS row
# INTO the kernel as an online-softmax accumulation over grid steps (scratch
# persists across the minor grid dim) and folds the residual add, so a block's
# attention sub-path is ONE kernel with one [B,S,D]-sized input and output.
# ---------------------------------------------------------------------------


def _ln_fn(ln_s, ln_b):
    def layernorm(t):
        tf = t.astype(jnp.float32)
        mu = jnp.mean(tf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(tf - mu), axis=-1, keepdims=True)
        return (tf - mu) * jax.lax.rsqrt(var + 1e-5) * ln_s[None] + ln_b[None]
    return layernorm


def _make_time_block_kernel_v2(H: int, T: int, N: int,
                               save_stats: bool = False,
                               save_acts: bool = False,
                               save_transposed: bool = False,
                               save_probs: bool = False,
                               smv: str = "base"):
    def kernel(x_ref, cls_ref, ln_s_ref, ln_b_ref,
               wqkv_ref, bq_ref, bk_ref, bv_ref, wproj_ref, bproj_ref,
               o_ref, ocls_ref, *rest):
        if save_stats and save_acts and save_probs:
            (lse_ref, acls_ref, q_ref, k_ref, v_ref, attn_ref, p_ref,
             m_scr, l_scr, acc_scr) = rest
        elif save_stats and save_acts:
            (lse_ref, acls_ref, q_ref, k_ref, v_ref, attn_ref,
             m_scr, l_scr, acc_scr) = rest
        elif save_stats:
            lse_ref, acls_ref, m_scr, l_scr, acc_scr = rest
        else:
            m_scr, l_scr, acc_scr = rest
        """Grid (B, C), c minor. x block [1, T, Nc, D]. Outputs: o = x + proj
        (time_residual, patch rows); ocls = cls + proj (written at c == C-1).
        m/l (SMEM [H]) + acc (VMEM [H, d]) hold the CLS online-softmax state."""
        Nc = x_ref.shape[2]
        D = x_ref.shape[3]
        d = D // H
        c = pl.program_id(1)
        n_chunks = pl.num_programs(1)

        layernorm = _ln_fn(ln_s_ref[0].astype(jnp.float32),
                           ln_b_ref[0].astype(jnp.float32))
        dtype = o_ref.dtype
        x_flat = x_ref[0].reshape(T * Nc, D)
        x_ln = layernorm(x_flat).astype(dtype)
        cls_ln = layernorm(cls_ref[0]).astype(dtype)      # [1, D]

        bq = bq_ref[:].astype(jnp.float32)                # [1, D] each: three
        bk = bk_ref[:].astype(jnp.float32)                # separate refs so the
        bv = bv_ref[:].astype(jnp.float32)                # broadcasts have
        scale = jnp.asarray(d, jnp.float32) ** -0.5       # zero-offset layouts
        # three dots (not one [.,3D] fp32 intermediate): VMEM headroom for
        # larger chunks
        q = (jnp.dot(x_ln, wqkv_ref[:, :D], preferred_element_type=jnp.float32)
             + bq) * scale
        k = jnp.dot(x_ln, wqkv_ref[:, D:2 * D],
                    preferred_element_type=jnp.float32) + bk
        v = jnp.dot(x_ln, wqkv_ref[:, 2 * D:],
                    preferred_element_type=jnp.float32) + bv
        q = q.astype(dtype).reshape(T, Nc, D)
        k = k.astype(dtype).reshape(T, Nc, D)
        v = v.astype(dtype).reshape(T, Nc, D)
        if save_acts and not save_transposed:
            q_ref[0] = q
            k_ref[0] = k
            v_ref[0] = v
        qc = (jnp.dot(cls_ln, wqkv_ref[:, :D],
                      preferred_element_type=jnp.float32) + bq)   # [1, D]
        kc = jnp.dot(cls_ln, wqkv_ref[:, D:2 * D],
                     preferred_element_type=jnp.float32) + bk
        vc = jnp.dot(cls_ln, wqkv_ref[:, 2 * D:],
                     preferred_element_type=jnp.float32) + bv
        q_cls = qc * scale                                 # [1, D] fp32

        # CLS self term initializes the online softmax (weight exp(m-m)=1)
        @pl.when(c == 0)
        def _init():
            for h in range(H):
                sl = slice(h * d, (h + 1) * d)
                m0 = jnp.sum(q_cls[0, sl] * kc[0, sl])
                m_scr[h] = m0
                l_scr[h] = 1.0
                acc_scr[h, :] = vc[0, sl]

        # valid-location mask for CLS accumulation (padded Nc tail)
        loc = jax.lax.broadcasted_iota(jnp.int32, (T, Nc), 1) + c * Nc
        valid = loc < N                                    # [T, Nc]

        # head-batched [H, T, d, Nc] layout: stacks of per-head swapaxes
        # outputs (fresh values — legal, unlike stacks of raw lane-offset
        # slices). The T-loop's elementwise softmax chain then runs once per
        # frame over ALL heads (12x fewer VPU op issues than the (h, t) loop).
        def to_heads4(a):
            return jnp.stack([jnp.swapaxes(a[..., h * d:(h + 1) * d], -1, -2)
                              for h in range(H)]).astype(jnp.float32)

        q4 = to_heads4(q)                                  # [H, T, d, Nc]
        k4 = to_heads4(k)
        v4 = to_heads4(v)
        if save_acts and save_transposed:
            # d-major saves for the v3 backward ([T, D, Nc]): the [H,T,d,Nc]
            # head tiles already exist, so this is a leading-dim transpose +
            # sublane merge (no lane<->sublane traffic)
            for a4, ref in ((q4, q_ref), (k4, k_ref), (v4, v_ref)):
                ref[0] = jnp.transpose(a4, (1, 0, 2, 3)) \
                    .reshape(T, D, Nc).astype(dtype)
        ck4 = kc.T.reshape(H, d, 1)                        # fp32
        cv4 = vc.T.reshape(H, d, 1)
        qc4 = q_cls.T.reshape(H, d, 1)

        # smv (extraction-only — gated on the train-capable saves staying
        # exact, INCLUDING save_acts: a save_acts-only caller still requests
        # train-grade activations): "clamp"/"cp" = max-free min-at-SMV_CLAMP
        # per-location softmax; "cp" adds reciprocal-multiply normalization
        # (see the v7 kernel)
        saving = save_stats or save_probs or save_acts
        clamp = smv in ("clamp", "cp") and not saving
        recip = smv == "cp" and not saving
        outs_t = []
        for t in range(T):
            qt = q4[:, t]                                  # [H, d, Nc]
            l = jnp.sum(qt[:, None] * k4, axis=2)          # [H, T, Nc]
            cls_l = jnp.sum(qt * ck4, axis=1)[:, None]     # [H, 1, Nc]
            full = jnp.concatenate([cls_l, l], axis=1)     # [H, T+1, Nc]
            if clamp:
                p = jnp.exp(jnp.minimum(full, SMV_CLAMP))
            else:
                m = jnp.max(full, axis=1, keepdims=True)
                p = jnp.exp(full - m)
            denom = jnp.sum(p, axis=1, keepdims=True)      # [H, 1, Nc]
            if clamp:
                denom = denom + SMV_DENOM_GUARD
            if save_probs:
                # NORMALIZED probs for the backward (it consumes pn only)
                p_ref[0, t] = (p / denom).astype(dtype)
            out_t = jnp.sum(p[:, 1:][:, :, None] * v4, axis=1)  # [H, d, Nc]
            out_t = out_t + p[:, 0][:, None, :] * cv4
            if recip:
                out_t = out_t * (1.0 / denom)
            else:
                out_t = out_t / denom
            outs_t.append(out_t.astype(dtype).reshape(D, Nc))

        # --- CLS row: online accumulation over this chunk's keys ----------
        lc_all = jnp.sum(k4 * qc4[:, None], axis=2)        # [H, T, Nc]
        lc_all = jnp.where(valid[None], lc_all, -1e30)
        for h in range(H):
            lc = lc_all[h]                                 # [T, Nc]
            c_max = jnp.max(lc)
            m_old = m_scr[h]
            m_new = jnp.maximum(m_old, c_max)
            corr = jnp.exp(m_old - m_new)
            p_c = jnp.exp(lc - m_new)                      # [T, Nc]
            m_scr[h] = m_new
            l_scr[h] = l_scr[h] * corr + jnp.sum(p_c)
            pv = jnp.sum(v4[h] * p_c[:, None, :], axis=(0, 2))  # [d]
            acc_scr[h, :] = acc_scr[h, :] * corr + pv

        attn = jnp.stack(outs_t)                           # [T, D, Nc]
        if save_acts and save_transposed:
            attn_ref[0] = attn                             # native d-major
        attn = jnp.swapaxes(attn, -1, -2).reshape(T * Nc, D)
        if save_acts and not save_transposed:
            attn_ref[0] = attn.reshape(T, Nc, D)
        proj = jnp.dot(attn, wproj_ref[:], preferred_element_type=jnp.float32) \
            + bproj_ref[:].astype(jnp.float32)
        o_ref[0] = (x_flat.astype(jnp.float32) + proj) \
            .reshape(T, Nc, D).astype(dtype)

        @pl.when(c == n_chunks - 1)
        def _finalize():
            rows = [acc_scr[h:h + 1, :] / l_scr[h] for h in range(H)]
            cls_att = jnp.concatenate(rows, axis=1)                # [1, D] fp32
            projc = jnp.dot(cls_att.astype(dtype), wproj_ref[:],
                            preferred_element_type=jnp.float32) \
                + bproj_ref[:].astype(jnp.float32)
            ocls_ref[0] = (cls_ref[0].astype(jnp.float32) + projc).astype(dtype)
            if save_stats:
                # per-head logsumexp + pre-proj CLS attention for the backward
                for h in range(H):
                    lse_ref[0, 0, h] = m_scr[h] + jnp.log(l_scr[h])
                acls_ref[0] = cls_att

    return kernel


def fused_time_attention_block_v2(x, ln_scale, ln_bias, wqkv, bqkv, wproj,
                                  bproj, num_frames: int,
                                  patches_per_frame: int, num_heads: int,
                                  chunk: int = 128, save_stats: bool = False,
                                  save_acts: bool = False,
                                  save_transposed: bool = False,
                                  save_probs: bool = False,
                                  vmem_limit_mb: int = 100,
                                  smv: str | None = None,
                                  interpret: bool = False):
    """Whole time sub-path INCLUDING residual: returns x + timeattn(ln(x)) as
    [B, S, D]. Self-contained (CLS row accumulated in-kernel; no k/v outputs).

    smv (TVTS_TIME_SMV env default): per-location softmax variant — "base",
    "clamp" (max-free min-at-SMV_CLAMP=70), "cp" (clamp + reciprocal-multiply). Applies
    only when save_stats/save_probs are off (the extraction path); the
    train-capable saves always run the exact base math.

    save_acts (with save_stats): also emits q/k/v and the pre-projection
    attention output ([B,T,Np,D] each, q pre-scaled) so the backward skips
    the re-projection matmuls and output recompute (see the space variant).
    save_transposed: the saved activations come back d-major ([B,T,D,Np])
    for the v3 backward, written from the head tiles the forward already
    holds (leading-dim transposes only)."""
    if smv is None:
        smv = os.environ.get("TVTS_TIME_SMV", "cp")
    B, S, D = x.shape
    T, N = num_frames, patches_per_frame
    assert S == 1 + T * N
    d = D // num_heads

    x_cls = x[:, :1]
    x_p = x[:, 1:].reshape(B, T, N, D)
    n_pad = (-N) % chunk
    if n_pad:
        x_p = jnp.pad(x_p, ((0, 0), (0, 0), (0, n_pad), (0, 0)))
    Np = N + n_pad

    chunk_spec = pl.BlockSpec((1, T, chunk, D), lambda b, c: (b, 0, c, 0),
                              memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b, c: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    ocls_spec = pl.BlockSpec((1, 1, D), lambda b, c: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, D), lambda b, c: (0, 0), memory_space=pltpu.VMEM)
    qkv_vec_spec = pl.BlockSpec((1, 3 * D), lambda b, c: (0, 0),
                                memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((D, 3 * D), lambda b, c: (0, 0),
                             memory_space=pltpu.VMEM)
    wproj_spec = pl.BlockSpec((D, D), lambda b, c: (0, 0),
                              memory_space=pltpu.VMEM)

    b3 = bqkv.reshape(3, D)
    out_specs = [chunk_spec, ocls_spec]
    out_shape = [jax.ShapeDtypeStruct((B, T, Np, D), x.dtype),
                 jax.ShapeDtypeStruct((B, 1, D), x.dtype)]
    if save_stats:
        out_specs += [pl.BlockSpec((1, 1, num_heads), lambda b, c: (b, 0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((1, 1, D), lambda b, c: (b, 0, 0),
                                   memory_space=pltpu.VMEM)]
        out_shape += [jax.ShapeDtypeStruct((B, 1, num_heads), jnp.float32),
                      jax.ShapeDtypeStruct((B, 1, D), jnp.float32)]
        if save_acts and save_transposed:
            chunkT_spec = pl.BlockSpec((1, T, D, chunk),
                                       lambda b, c: (b, 0, 0, c),
                                       memory_space=pltpu.VMEM)
            out_specs += [chunkT_spec] * 4
            out_shape += [jax.ShapeDtypeStruct((B, T, D, Np), x.dtype)] * 4
        elif save_acts:
            out_specs += [chunk_spec] * 4
            out_shape += [jax.ShapeDtypeStruct((B, T, Np, D), x.dtype)] * 4
        if save_acts and save_probs:
            out_specs += [pl.BlockSpec((1, T, num_heads, T + 1, chunk),
                                       lambda b, c: (b, 0, 0, 0, c),
                                       memory_space=pltpu.VMEM)]
            out_shape += [jax.ShapeDtypeStruct(
                (B, T, num_heads, T + 1, Np), x.dtype)]
    outs = pl.pallas_call(
        _make_time_block_kernel_v2(num_heads, T, N, save_stats, save_acts,
                                   save_transposed, save_probs, smv),
        grid=(B, Np // chunk),
        in_specs=[chunk_spec, cls_spec, vec_spec, vec_spec, wqkv_spec,
                  vec_spec, vec_spec, vec_spec, wproj_spec, vec_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.SMEM((num_heads,), jnp.float32),
                        pltpu.SMEM((num_heads,), jnp.float32),
                        pltpu.VMEM((num_heads, d), jnp.float32)],
        compiler_params=_compiler_params(vmem_limit_mb),
        interpret=interpret,
    )(x_p, x_cls, ln_scale.reshape(1, D), ln_bias.reshape(1, D),
      wqkv, b3[0:1], b3[1:2], b3[2:3], wproj, bproj.reshape(1, D))
    out_p, out_cls = outs[0], outs[1]
    out = jnp.concatenate([out_cls,
                           out_p[:, :, :N].reshape(B, T * N, D)], axis=1)
    if save_stats and save_acts:
        return (out,) + tuple(outs[2:])
    if save_stats:
        return out, outs[2], outs[3]
    return out


def _make_space_block_kernel_v2(H: int, T: int, save_stats: bool = False,
                                save_acts: bool = False):
    def kernel(x_ref, base_ref, cls_ref, basecls_ref, ln_s_ref, ln_b_ref,
               wqkv_ref, bq_ref, bk_ref, bv_ref, wproj_ref, bproj_ref,
               o_ref, ocls_ref, *rest):
        if save_stats and save_acts:
            (lse_ref, acls_ref, q_ref, k_ref, v_ref, attn_ref,
             m_scr, l_scr, acc_scr) = rest
        elif save_stats:
            lse_ref, acls_ref, m_scr, l_scr, acc_scr = rest
        else:
            m_scr, l_scr, acc_scr = rest
        """Grid (B, T), t minor. x block [1, 1, N, D] = attention input frame;
        base block = residual base. o = base + proj; ocls = base_cls + proj
        at t == T-1 (CLS online softmax across frames in scratch)."""
        N = x_ref.shape[2]
        D = x_ref.shape[3]
        d = D // H
        t = pl.program_id(1)

        layernorm = _ln_fn(ln_s_ref[0].astype(jnp.float32),
                           ln_b_ref[0].astype(jnp.float32))
        dtype = o_ref.dtype
        x_ln = layernorm(x_ref[0, 0]).astype(dtype)        # [N, D]
        cls_ln = layernorm(cls_ref[0]).astype(dtype)       # [1, D]

        bq = bq_ref[:].astype(jnp.float32)
        bk = bk_ref[:].astype(jnp.float32)
        bv = bv_ref[:].astype(jnp.float32)
        scale = jnp.asarray(d, jnp.float32) ** -0.5
        q = (jnp.dot(x_ln, wqkv_ref[:, :D], preferred_element_type=jnp.float32)
             + bq) * scale
        k = jnp.dot(x_ln, wqkv_ref[:, D:2 * D],
                    preferred_element_type=jnp.float32) + bk
        v = jnp.dot(x_ln, wqkv_ref[:, 2 * D:],
                    preferred_element_type=jnp.float32) + bv
        q = q.astype(dtype)
        k = k.astype(dtype)
        v = v.astype(dtype)
        if save_acts:
            q_ref[0, 0] = q
            k_ref[0, 0] = k
            v_ref[0, 0] = v
        qc = (jnp.dot(cls_ln, wqkv_ref[:, :D],
                      preferred_element_type=jnp.float32) + bq)
        kc = jnp.dot(cls_ln, wqkv_ref[:, D:2 * D],
                     preferred_element_type=jnp.float32) + bk
        vc = jnp.dot(cls_ln, wqkv_ref[:, 2 * D:],
                     preferred_element_type=jnp.float32) + bv
        q_cls = qc * scale
        ck = kc.astype(dtype)                              # [1, D]
        cv = vc.astype(dtype)

        @pl.when(t == 0)
        def _init():
            for h in range(H):
                sl = slice(h * d, (h + 1) * d)
                m0 = jnp.sum(q_cls[0, sl] * kc[0, sl])
                m_scr[h] = m0
                l_scr[h] = 1.0
                acc_scr[h, :] = vc[0, sl]

        outs = []
        for h in range(H):
            sl = slice(h * d, (h + 1) * d)
            qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
            logits = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32)
            cls_logit = jnp.dot(qh, ck[:, sl].T,
                                preferred_element_type=jnp.float32)   # [N, 1]
            m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), cls_logit)
            p = jnp.exp(logits - m)
            p_cls = jnp.exp(cls_logit - m)
            denom = jnp.sum(p, axis=-1, keepdims=True) + p_cls
            oh = jnp.dot(p.astype(dtype), vh, preferred_element_type=jnp.float32)
            oh = (oh + p_cls * cv[:, sl].astype(jnp.float32)) / denom
            outs.append(oh.astype(dtype))

            # CLS row contribution from this frame's keys
            lc = jnp.dot(k[:, sl].astype(jnp.float32),
                         q_cls[:, sl].T, preferred_element_type=jnp.float32)  # [N,1]
            c_max = jnp.max(lc)
            m_old = m_scr[h]
            m_new = jnp.maximum(m_old, c_max)
            corr = jnp.exp(m_old - m_new)
            p_c = jnp.exp(lc - m_new)                                  # [N, 1]
            m_scr[h] = m_new
            l_scr[h] = l_scr[h] * corr + jnp.sum(p_c)
            pv = jnp.sum(v[:, sl].astype(jnp.float32) * p_c, axis=0)   # [d]
            acc_scr[h, :] = acc_scr[h, :] * corr + pv

        attn_out = jnp.concatenate(outs, axis=-1)                      # [N, D]
        if save_acts:
            attn_ref[0, 0] = attn_out
        proj = jnp.dot(attn_out, wproj_ref[:],
                       preferred_element_type=jnp.float32) \
            + bproj_ref[:].astype(jnp.float32)
        o_ref[0, 0] = (base_ref[0, 0].astype(jnp.float32) + proj).astype(dtype)

        @pl.when(t == pl.num_programs(1) - 1)
        def _finalize():
            rows = [acc_scr[h:h + 1, :] / l_scr[h] for h in range(H)]
            cls_att = jnp.concatenate(rows, axis=1)
            projc = jnp.dot(cls_att.astype(dtype), wproj_ref[:],
                            preferred_element_type=jnp.float32) \
                + bproj_ref[:].astype(jnp.float32)
            ocls_ref[0] = (basecls_ref[0].astype(jnp.float32)
                           + projc).astype(dtype)
            if save_stats:
                for h in range(H):
                    lse_ref[0, 0, h] = m_scr[h] + jnp.log(l_scr[h])
                acls_ref[0] = cls_att

    return kernel


def fused_space_attention_block_v2(x, base, ln_scale, ln_bias, wqkv, bqkv,
                                   wproj, bproj, num_frames: int,
                                   patches_per_frame: int, num_heads: int,
                                   save_stats: bool = False,
                                   save_acts: bool = False,
                                   interpret: bool = False):
    """Whole space sub-path INCLUDING residual from `base`: returns
    base + spaceattn(ln(x)) as [B, S, D] (reference residual-from-block-input
    wiring, video_encoder_ViT_B_16.py:118-121). Self-contained like the time
    v2 kernel.

    save_acts (with save_stats): additionally emits the patch-row q/k/v
    ([B,T,N,D] each, q pre-scaled) and the pre-projection attention output,
    so the backward kernel skips the three re-projection matmuls and the
    attention-output recompute — for ~0.6 ms/block of extra HBM traffic at
    B/16 pretrain sizes."""
    B, S, D = x.shape
    T, N = num_frames, patches_per_frame
    assert S == 1 + T * N
    d = D // num_heads

    x_cls = x[:, :1]
    x_p = x[:, 1:].reshape(B, T, N, D)
    base_cls = base[:, :1]
    base_p = base[:, 1:].reshape(B, T, N, D)

    frame_spec = pl.BlockSpec((1, 1, N, D), lambda b, t: (b, t, 0, 0),
                              memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, D), lambda b, t: (0, 0), memory_space=pltpu.VMEM)
    qkv_vec_spec = pl.BlockSpec((1, 3 * D), lambda b, t: (0, 0),
                                memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((D, 3 * D), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    wproj_spec = pl.BlockSpec((D, D), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)

    b3 = bqkv.reshape(3, D)
    out_specs = [frame_spec, cls_spec]
    out_shape = [jax.ShapeDtypeStruct((B, T, N, D), x.dtype),
                 jax.ShapeDtypeStruct((B, 1, D), x.dtype)]
    if save_stats:
        out_specs += [pl.BlockSpec((1, 1, num_heads), lambda b, t: (b, 0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((1, 1, D), lambda b, t: (b, 0, 0),
                                   memory_space=pltpu.VMEM)]
        out_shape += [jax.ShapeDtypeStruct((B, 1, num_heads), jnp.float32),
                      jax.ShapeDtypeStruct((B, 1, D), jnp.float32)]
        if save_acts:
            out_specs += [frame_spec] * 4
            out_shape += [jax.ShapeDtypeStruct((B, T, N, D), x.dtype)] * 4
    outs = pl.pallas_call(
        _make_space_block_kernel_v2(num_heads, T, save_stats, save_acts),
        grid=(B, T),
        in_specs=[frame_spec, frame_spec, cls_spec, cls_spec, vec_spec,
                  vec_spec, wqkv_spec, vec_spec, vec_spec, vec_spec,
                  wproj_spec, vec_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.SMEM((num_heads,), jnp.float32),
                        pltpu.SMEM((num_heads,), jnp.float32),
                        pltpu.VMEM((num_heads, d), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x_p, base_p, x_cls, base_cls, ln_scale.reshape(1, D),
      ln_bias.reshape(1, D), wqkv, b3[0:1], b3[1:2], b3[2:3], wproj,
      bproj.reshape(1, D))
    out = jnp.concatenate([outs[1], outs[0].reshape(B, T * N, D)], axis=1)
    if save_stats and save_acts:
        return (out,) + tuple(outs[2:])
    if save_stats:
        return out, outs[2], outs[3]
    return out


# ---------------------------------------------------------------------------
# Backward kernels (training). Same fusion philosophy as the forwards: one
# Pallas call per sub-path per block, recomputing the forward intermediates
# in VMEM (flash-style) and accumulating weight gradients in fp32 directly in
# constant-index output refs across the whole grid.
# ---------------------------------------------------------------------------


def _act_and_grad(act: str, h):
    """activation value and derivative at fp32 h."""
    if act == "quick_gelu":
        s = jax.nn.sigmoid(1.702 * h)
        return h * s, s + 1.702 * h * s * (1.0 - s)
    # exact gelu (erf via the Mosaic-lowerable polynomial)
    phi = jnp.exp(-0.5 * h * h) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
    cdf = 0.5 * (1.0 + _erf(h / jnp.sqrt(2.0)))
    return h * cdf, cdf + h * phi


def _make_mlp_bwd_kernel(act: str):
    def kernel(x_ref, g_ref, ln_s_ref, ln_b_ref, wfc_ref, bfc_ref, wproj_ref,
               dx_ref, dwfc_ref, dbfc_ref, dwproj_ref, dbproj_ref,
               dls_ref, dlb_ref):
        """One token chunk of the MLP sub-path backward.

        fwd: y = x + Wproj·act(Wfc·LN(x) + bfc) + bproj.
        dx is written per chunk; weight/LN grads accumulate fp32 in the
        constant-index output refs (zeroed at the first grid step)."""
        first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

        @pl.when(first)
        def _zero():
            dwfc_ref[...] = jnp.zeros_like(dwfc_ref)
            dbfc_ref[...] = jnp.zeros_like(dbfc_ref)
            dwproj_ref[...] = jnp.zeros_like(dwproj_ref)
            dbproj_ref[...] = jnp.zeros_like(dbproj_ref)
            dls_ref[...] = jnp.zeros_like(dls_ref)
            dlb_ref[...] = jnp.zeros_like(dlb_ref)

        D = x_ref.shape[-1]
        eps = 1e-5
        ln_s = ln_s_ref[0].astype(jnp.float32)
        x = x_ref[0]
        g = g_ref[0].astype(jnp.float32)                    # [C, D]
        dtype = x.dtype

        # --- recompute forward intermediates -------------------------------
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = (xf - mu) * rstd                             # [C, D]
        y_ln = (xhat * ln_s[None] + ln_b_ref[0].astype(jnp.float32))
        y_ln_b = y_ln.astype(dtype)
        h_pre = jnp.dot(y_ln_b, wfc_ref[:],
                        preferred_element_type=jnp.float32) \
            + bfc_ref[:].astype(jnp.float32)                # [C, Hd]
        h_act, h_grad = _act_and_grad(act, h_pre)
        h_act_b = h_act.astype(dtype)

        # --- backward -------------------------------------------------------
        g_b = g.astype(dtype)
        dh = jnp.dot(g_b, wproj_ref[:].T,
                     preferred_element_type=jnp.float32) * h_grad   # [C, Hd]
        dh_b = dh.astype(dtype)
        dwproj_ref[...] += jnp.dot(h_act_b.T, g_b,
                                   preferred_element_type=jnp.float32)
        dbproj_ref[...] += jnp.sum(g, axis=0, keepdims=True)
        dwfc_ref[...] += jnp.dot(y_ln_b.T, dh_b,
                                 preferred_element_type=jnp.float32)
        dbfc_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
        dxln = jnp.dot(dh_b, wfc_ref[:].T,
                       preferred_element_type=jnp.float32)          # [C, D]
        dls_ref[...] += jnp.sum(dxln * xhat, axis=0, keepdims=True)
        dlb_ref[...] += jnp.sum(dxln, axis=0, keepdims=True)
        dxhat = dxln * ln_s[None]
        m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
        m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        dx_ln_in = (dxhat - m1 - xhat * m2) * rstd
        dx_ref[0] = (g + dx_ln_in).astype(dx_ref.dtype)

    return kernel


def fused_mlp_block_bwd(g, x, ln_scale, ln_bias, wfc, bfc, wproj,
                        act: str = "quick_gelu", chunk: int = 256,
                        interpret: bool = False):
    """Backward of fused_mlp_block. Returns (dx, dln_scale, dln_bias, dwfc,
    dbfc, dwproj, dbproj) with weight grads in fp32."""
    B, S, D = x.shape
    hidden = wfc.shape[1]
    s_pad = (-S) % chunk
    if s_pad:
        x = jnp.pad(x, ((0, 0), (0, s_pad), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, s_pad), (0, 0)))
    Sp = S + s_pad

    tok_spec = pl.BlockSpec((1, chunk, D), lambda b, c: (b, c, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, D), lambda b, c: (0, 0), memory_space=pltpu.VMEM)
    hvec_spec = pl.BlockSpec((1, hidden), lambda b, c: (0, 0),
                             memory_space=pltpu.VMEM)
    wfc_spec = pl.BlockSpec((D, hidden), lambda b, c: (0, 0),
                            memory_space=pltpu.VMEM)
    wproj_spec = pl.BlockSpec((hidden, D), lambda b, c: (0, 0),
                              memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        _make_mlp_bwd_kernel(act),
        grid=(B, Sp // chunk),
        in_specs=[tok_spec, tok_spec, vec_spec, vec_spec, wfc_spec, hvec_spec,
                  wproj_spec],
        out_specs=(tok_spec, wfc_spec, hvec_spec, wproj_spec, vec_spec,
                   vec_spec, vec_spec),
        out_shape=(jax.ShapeDtypeStruct((B, Sp, D), x.dtype),
                   jax.ShapeDtypeStruct((D, hidden), jnp.float32),
                   jax.ShapeDtypeStruct((1, hidden), jnp.float32),
                   jax.ShapeDtypeStruct((hidden, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32)),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x, g, ln_scale.reshape(1, D), ln_bias.reshape(1, D), wfc,
      bfc.reshape(1, hidden), wproj)
    dx, dwfc, dbfc, dwproj, dbproj, dls, dlb = outs
    return (dx[:, :S], dls[0], dlb[0], dwfc, dbfc[0], dwproj, dbproj[0])


def make_mlp_subpath(act: str = "quick_gelu", chunk: int = 256,
                     interpret: bool = False):
    """Differentiable fused MLP sub-path: Pallas forward AND backward.

    Signature: f(x, ln_scale, ln_bias, wfc, bfc, wproj, bproj) ->
    x + MLP(LN(x)). Weight-gradient cotangents are cast to the primal dtypes."""

    @jax.custom_vjp
    def f(x, ln_scale, ln_bias, wfc, bfc, wproj, bproj):
        return fused_mlp_block(x, ln_scale, ln_bias, wfc, bfc, wproj, bproj,
                               act=act, chunk=chunk, interpret=interpret)

    def fwd(x, ln_scale, ln_bias, wfc, bfc, wproj, bproj):
        out = f(x, ln_scale, ln_bias, wfc, bfc, wproj, bproj)
        return out, (x, ln_scale, ln_bias, wfc, bfc, wproj, bproj)

    def bwd(res, g):
        x, ln_scale, ln_bias, wfc, bfc, wproj, bproj = res
        dx, dls, dlb, dwfc, dbfc, dwproj, dbproj = fused_mlp_block_bwd(
            g, x, ln_scale, ln_bias, wfc, bfc, wproj, act=act, chunk=chunk,
            interpret=interpret)
        return (dx, dls.astype(ln_scale.dtype), dlb.astype(ln_bias.dtype),
                dwfc.astype(wfc.dtype), dbfc.astype(bfc.dtype),
                dwproj.astype(wproj.dtype), dbproj.astype(bproj.dtype))

    f.defvjp(fwd, bwd)
    return f


# ---------------------------------------------------------------------------
# v3 SPACE kernel: d-major, head-batched.
#
# The v2 kernel loops over heads with LANE-offset slices of [N, D] tensors.
# Mosaic cannot batch that form: lane-splitting reshapes ([N,D]->[N,H,d]) are
# "unsupported shape cast" and lane-offset slices cannot feed concat/stack.
# v3 works in the TRANSPOSED domain instead: activations are [D, N] (tokens in
# lanes), so heads split on SUBLANES ([D,N] -> [H,d,N] is a supported
# leading-dim reshape) and every per-head matmul becomes ONE batched
# dot_general in lhsT/rhsT-native form. Costs two [N,D]<->[D,N] transposes per
# program (in and out); weights arrive pre-transposed ([3D,D]/[D,D], an
# XLA-side transpose outside the kernel).
# ---------------------------------------------------------------------------


def _make_space_block_kernel_v3(H: int, save_stats: bool = False,
                                save_acts: bool = False,
                                save_probs: bool = False):
    def kernel(x_ref, base_ref, cls_ref, basecls_ref, ln_sT_ref, ln_bT_ref,
               wqkvT_ref, bqT_ref, bkT_ref, bvT_ref, wprojT_ref, bprojT_ref,
               o_ref, ocls_ref, *rest):
        """Grid (B, T), t minor. Same contract as the v2 kernel, but the
        saved activations are TRANSPOSED ([B,T,D,N] / [B,D,1]). With
        save_probs the per-frame softmax state (p [B,T,H,N,N] bf16 raw
        numerators + p_cls + denom) is saved so the backward skips the
        logits matmul + softmax recompute entirely."""
        if save_stats and save_acts and save_probs:
            (lse_ref, acls_ref, qT_ref, kT_ref, vT_ref, attnT_ref,
             p_ref, pcls_ref, den_ref, m_scr, l_scr, acc_scr) = rest
        elif save_stats and save_acts:
            (lse_ref, acls_ref, qT_ref, kT_ref, vT_ref, attnT_ref,
             m_scr, l_scr, acc_scr) = rest
        elif save_stats:
            lse_ref, acls_ref, m_scr, l_scr, acc_scr = rest
        else:
            m_scr, l_scr, acc_scr = rest
        N = x_ref.shape[2]
        D = x_ref.shape[3]
        d = D // H
        t = pl.program_id(1)
        dtype = o_ref.dtype
        f32 = jnp.float32

        ln_sT = ln_sT_ref[:].astype(f32)                   # [D, 1]
        ln_bT = ln_bT_ref[:].astype(f32)
        bqT = bqT_ref[:].astype(f32)                       # [D, 1]
        bkT = bkT_ref[:].astype(f32)
        bvT = bvT_ref[:].astype(f32)
        bprojT = bprojT_ref[:].astype(f32)
        scale = jnp.asarray(d, f32) ** -0.5

        def lnT(tT):                                       # LN over sublanes
            tf = tT.astype(f32)
            mu = jnp.mean(tf, axis=0, keepdims=True)       # [1, n]
            var = jnp.mean(jnp.square(tf - mu), axis=0, keepdims=True)
            return (tf - mu) * jax.lax.rsqrt(var + 1e-5) * ln_sT + ln_bT

        xT = x_ref[0, 0].T                                 # [D, N]
        clsT = cls_ref[0].T                                # [D, 1]
        x_lnT = lnT(xT).astype(dtype)
        cls_lnT = lnT(clsT).astype(dtype)

        qkvT = jnp.dot(wqkvT_ref[:], x_lnT,
                       preferred_element_type=f32)         # [3D, N]
        qT = ((qkvT[:D] + bqT) * scale).astype(dtype)
        kT = (qkvT[D:2 * D] + bkT).astype(dtype)
        vT = (qkvT[2 * D:] + bvT).astype(dtype)
        if save_acts:
            qT_ref[0, 0] = qT
            kT_ref[0, 0] = kT
            vT_ref[0, 0] = vT
        qkv_cT = jnp.dot(wqkvT_ref[:], cls_lnT,
                         preferred_element_type=f32)       # [3D, 1]
        qc3 = ((qkv_cT[:D] + bqT) * scale).reshape(H, d, 1)
        kc3 = (qkv_cT[D:2 * D] + bkT).reshape(H, d, 1)
        vc3 = (qkv_cT[2 * D:] + bvT).reshape(H, d, 1)

        q3 = qT.reshape(H, d, N)
        k3 = kT.reshape(H, d, N)
        v3 = vT.reshape(H, d, N)
        CONTRACT_D = (((1,), (1,)), ((0,), (0,)))          # over head dim d
        CONTRACT_NK = (((2,), (2,)), ((0,), (0,)))         # over key lanes

        @pl.when(t == 0)
        def _init():
            m_scr[...] = jnp.sum(qc3 * kc3, axis=1)        # [H, 1]
            l_scr[...] = jnp.ones((H, 1), f32)
            acc_scr[...] = vc3                             # [H, d, 1]

        logits = jax.lax.dot_general(q3, k3, CONTRACT_D,
                                     preferred_element_type=f32)  # [H,Nq,Nk]
        cls_l = jnp.sum(q3.astype(f32) * kc3, axis=1)      # [H, Nq]
        m = jnp.maximum(jnp.max(logits, axis=-1), cls_l)   # [H, Nq]
        p = jnp.exp(logits - m[..., None])
        p_cls = jnp.exp(cls_l - m)                         # [H, Nq]
        denom = jnp.sum(p, axis=-1) + p_cls
        if save_probs:
            p_ref[0, 0] = p.astype(dtype)
            pcls_ref[0, 0] = p_cls
            den_ref[0, 0] = denom
        oT3 = jax.lax.dot_general(v3, p.astype(dtype), CONTRACT_NK,
                                  preferred_element_type=f32)  # [H, d, Nq]
        oT3 = (oT3 + vc3 * p_cls[:, None, :]) / denom[:, None, :]
        attn_T = oT3.astype(dtype).reshape(D, N)
        if save_acts:
            attnT_ref[0, 0] = attn_T

        projT = jnp.dot(wprojT_ref[:], attn_T,
                        preferred_element_type=f32) + bprojT   # [D, N]
        o_ref[0, 0] = (base_ref[0, 0].astype(f32) + projT.T).astype(dtype)

        # CLS row: online accumulation (all-vector scratch ops)
        lc = jnp.sum(k3.astype(f32) * qc3, axis=1)         # [H, Nk]
        c_max = jnp.max(lc, axis=1, keepdims=True)         # [H, 1]
        m_old = m_scr[...]
        m_new = jnp.maximum(m_old, c_max)
        corr = jnp.exp(m_old - m_new)                      # [H, 1]
        p_c = jnp.exp(lc - m_new)                          # [H, Nk]
        m_scr[...] = m_new
        l_scr[...] = l_scr[...] * corr + jnp.sum(p_c, axis=1, keepdims=True)
        pv = jnp.sum(v3.astype(f32) * p_c[:, None, :], axis=2,
                     keepdims=True)                        # [H, d, 1]
        acc_scr[...] = acc_scr[...] * corr[..., None] + pv

        @pl.when(t == pl.num_programs(1) - 1)
        def _finalize():
            cls_attT = (acc_scr[...] / l_scr[...][..., None]) \
                .reshape(D, 1)                             # fp32
            projcT = jnp.dot(wprojT_ref[:], cls_attT.astype(dtype),
                             preferred_element_type=f32) + bprojT  # [D, 1]
            ocls_ref[0] = (basecls_ref[0].astype(f32) + projcT.T).astype(dtype)
            if save_stats:
                lse_ref[0] = (m_scr[...] + jnp.log(l_scr[...])).T  # [1, H]
                acls_ref[0] = cls_attT                     # [D, 1] fp32

    return kernel


def fused_space_attention_block_v3(x, base, ln_scale, ln_bias, wqkv, bqkv,
                                   wproj, bproj, num_frames: int,
                                   patches_per_frame: int, num_heads: int,
                                   save_stats: bool = False,
                                   save_acts: bool = False,
                                   save_probs: bool = False,
                                   interpret: bool = False):
    """d-major head-batched variant of fused_space_attention_block_v2 — same
    math and output contract; saved activations come back TRANSPOSED
    (qT/kT/vT/attnT: [B,T,D,N]; acls: [B,D,1]) for the v3 backward."""
    B, S, D = x.shape
    T, N = num_frames, patches_per_frame
    assert S == 1 + T * N
    d = D // num_heads

    x_cls = x[:, :1]
    x_p = x[:, 1:].reshape(B, T, N, D)
    base_cls = base[:, :1]
    base_p = base[:, 1:].reshape(B, T, N, D)

    frame_spec = pl.BlockSpec((1, 1, N, D), lambda b, t: (b, t, 0, 0),
                              memory_space=pltpu.VMEM)
    frameT_spec = pl.BlockSpec((1, 1, D, N), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    vecT_spec = pl.BlockSpec((D, 1), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    wqkvT_spec = pl.BlockSpec((3 * D, D), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    wprojT_spec = pl.BlockSpec((D, D), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM)

    b3 = bqkv.reshape(3, D)
    out_specs = [frame_spec, cls_spec]
    out_shape = [jax.ShapeDtypeStruct((B, T, N, D), x.dtype),
                 jax.ShapeDtypeStruct((B, 1, D), x.dtype)]
    if save_stats:
        out_specs += [pl.BlockSpec((1, 1, num_heads), lambda b, t: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, D, 1), lambda b, t: (b, 0, 0),
                                   memory_space=pltpu.VMEM)]
        out_shape += [jax.ShapeDtypeStruct((B, 1, num_heads), jnp.float32),
                      jax.ShapeDtypeStruct((B, D, 1), jnp.float32)]
        if save_acts:
            out_specs += [frameT_spec] * 4
            out_shape += [jax.ShapeDtypeStruct((B, T, D, N), x.dtype)] * 4
            if save_probs:
                out_specs += [
                    pl.BlockSpec((1, 1, num_heads, N, N),
                                 lambda b, t: (b, t, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, num_heads, N),
                                 lambda b, t: (b, t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, num_heads, N),
                                 lambda b, t: (b, t, 0, 0),
                                 memory_space=pltpu.VMEM)]
                out_shape += [
                    jax.ShapeDtypeStruct((B, T, num_heads, N, N), x.dtype),
                    jax.ShapeDtypeStruct((B, T, num_heads, N), jnp.float32),
                    jax.ShapeDtypeStruct((B, T, num_heads, N), jnp.float32)]
    outs = pl.pallas_call(
        _make_space_block_kernel_v3(num_heads, save_stats, save_acts,
                                    save_probs),
        grid=(B, T),
        in_specs=[frame_spec, frame_spec, cls_spec, cls_spec, vecT_spec,
                  vecT_spec, wqkvT_spec, vecT_spec, vecT_spec, vecT_spec,
                  wprojT_spec, vecT_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((num_heads, 1), jnp.float32),
                        pltpu.VMEM((num_heads, 1), jnp.float32),
                        pltpu.VMEM((num_heads, d, 1), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x_p, base_p, x_cls, base_cls, ln_scale.reshape(D, 1),
      ln_bias.reshape(D, 1), wqkv.T, b3[0].reshape(D, 1), b3[1].reshape(D, 1),
      b3[2].reshape(D, 1), wproj.T, bproj.reshape(D, 1))
    out = jnp.concatenate([outs[1], outs[0].reshape(B, T * N, D)], axis=1)
    if save_stats and save_acts:
        return (out,) + tuple(outs[2:])
    if save_stats:
        return out, outs[2], outs[3]
    return out


# ---------------------------------------------------------------------------
# v4 TIME forward: T-leading, d-major internals (extraction fast path).
#
# The v2 time kernel builds [H, T, d, Nc] head tiles with per-head
# swapaxes+stack for q/k/v (3 transpose sets) and transposes the attention
# output back to row-major (a 4th). v4 transposes the LN output once
# ([T, Nc, D] -> [T, D, Nc]), projects qkv per frame in lhsT-native form
# (wqkvT @ x_lnT, zero-pad at Nc=128 lanes), runs the attention chain
# T-leading, and pays one transpose back on the projected output — 2 sets
# instead of 4, with identical math. Same per-sub-path contract as v2.
# ---------------------------------------------------------------------------


def _make_time_block_kernel_v4(H: int, T: int, N: int):
    def kernel(x_ref, cls_ref, ln_s_ref, ln_b_ref,
               wqkvT_ref, bqT_ref, bkT_ref, bvT_ref, wprojT_ref, bprojT_ref,
               o_ref, ocls_ref, m_scr, l_scr, acc_scr):
        """Grid (B, C), c minor. o = x + proj (residual folded); ocls written
        at the last chunk from the online CLS softmax state."""
        Nc = x_ref.shape[2]
        D = x_ref.shape[3]
        d = D // H
        c = pl.program_id(1)
        f32 = jnp.float32
        dtype = o_ref.dtype

        ln_s = ln_s_ref[0].astype(f32)
        ln_b = ln_b_ref[0].astype(f32)
        bqT = bqT_ref[:].astype(f32)                       # [D, 1]
        bkT = bkT_ref[:].astype(f32)
        bvT = bvT_ref[:].astype(f32)
        scale = jnp.asarray(d, f32) ** -0.5

        layernorm = _ln_fn(ln_s, ln_b)
        x_flat = x_ref[0].reshape(T * Nc, D)
        x_ln = layernorm(x_flat).astype(dtype)             # row-major LN
        cls_ln = layernorm(cls_ref[0]).astype(dtype)       # [1, D]

        # one transpose set in: [T, Nc, D] -> [T, D, Nc]
        x_lnT = jnp.swapaxes(x_ln.reshape(T, Nc, D), -1, -2)

        qs, ks, vs = [], [], []
        for t in range(T):
            qkvT_t = jnp.dot(wqkvT_ref[:], x_lnT[t],
                             preferred_element_type=f32)   # [3D, Nc]
            qs.append(((qkvT_t[:D] + bqT) * scale).astype(dtype))
            ks.append((qkvT_t[D:2 * D] + bkT).astype(dtype))
            vs.append((qkvT_t[2 * D:] + bvT).astype(dtype))

        # [T, D, Nc] stacks -> [H, T, d, Nc] head tiles: sublane split +
        # leading transpose only. The softmax math stays H-leading (axis-1
        # reductions) — T-leading axis-0 3D reductions hit Mosaic
        # "Unsupported output implicit dimension" in context.
        def heads(ts):
            return jnp.transpose(jnp.stack(ts).reshape(T, H, d, Nc),
                                 (1, 0, 2, 3)).astype(f32)

        q4 = heads(qs)
        k4 = heads(ks)
        v4 = heads(vs)

        qkv_cT = jnp.dot(wqkvT_ref[:], cls_ln.T,
                         preferred_element_type=f32)       # [3D, 1]
        qc3 = (qkv_cT[:D] + bqT).reshape(H, d, 1) * scale
        kc3 = (qkv_cT[D:2 * D] + bkT).reshape(H, d, 1)
        vc3 = (qkv_cT[2 * D:] + bvT).reshape(H, d, 1)

        @pl.when(c == 0)
        def _init():
            m_scr[...] = jnp.sum(qc3 * kc3, axis=1)        # [H, 1]
            l_scr[...] = jnp.ones((H, 1), f32)
            acc_scr[...] = vc3                             # [H, d, 1]

        # ---- per-location time attention (H-leading, v2 math) --------------
        outs_t = []
        for t in range(T):
            qt = q4[:, t]                                  # [H, d, Nc]
            l = jnp.sum(qt[:, None] * k4, axis=2)          # [H, T, Nc]
            cls_l = jnp.sum(qt * kc3, axis=1)[:, None]     # [H, 1, Nc]
            full = jnp.concatenate([cls_l, l], axis=1)     # [H, T+1, Nc]
            m = jnp.max(full, axis=1, keepdims=True)
            p = jnp.exp(full - m)
            denom = jnp.sum(p, axis=1, keepdims=True)      # [H, 1, Nc]
            out_t = jnp.sum(p[:, 1:][:, :, None] * v4, axis=1)  # [H, d, Nc]
            out_t = out_t + p[:, 0][:, None, :] * vc3
            outs_t.append((out_t / denom).astype(dtype).reshape(D, Nc))

        # ---- CLS row: online accumulation over this chunk's valid keys -----
        loc = jax.lax.broadcasted_iota(jnp.int32, (T, Nc), 1) + c * Nc
        valid = loc < N
        lc_all = jnp.sum(k4 * qc3[:, None], axis=2)        # [H, T, Nc]
        lc_all = jnp.where(valid[None], lc_all, -1e30)
        c_max = jnp.max(jnp.max(lc_all, axis=2), axis=1, keepdims=True)
        m_old = m_scr[...]
        m_new = jnp.maximum(m_old, c_max)                  # [H, 1]
        corr = jnp.exp(m_old - m_new)
        p_c = jnp.exp(lc_all - m_new[..., None])           # [H, T, Nc]
        m_scr[...] = m_new
        l_scr[...] = l_scr[...] * corr \
            + jnp.sum(jnp.sum(p_c, axis=2), axis=1, keepdims=True)
        pv = jnp.sum(v4 * p_c[:, :, None, :], axis=(1, 3))     # [H, d]
        acc_scr[...] = acc_scr[...] * corr[..., None] + pv[..., None]

        # ---- projection + residual (one transpose set out) -----------------
        proj_rows = []
        for t in range(T):
            projT_t = jnp.dot(wprojT_ref[:], outs_t[t],
                              preferred_element_type=f32) \
                + bprojT_ref[:].astype(f32)                # [D, Nc]
            proj_rows.append(projT_t.T)                    # [Nc, D]
        proj = jnp.concatenate(proj_rows, axis=0)          # [T*Nc, D]
        o_ref[0] = (x_flat.astype(f32) + proj).reshape(T, Nc, D).astype(dtype)

        @pl.when(c == pl.num_programs(1) - 1)
        def _finalize():
            cls_attT = (acc_scr[...] / l_scr[...][..., None]).reshape(D, 1)
            projcT = jnp.dot(wprojT_ref[:], cls_attT.astype(dtype),
                             preferred_element_type=f32) \
                + bprojT_ref[:].astype(f32)                # [D, 1]
            ocls_ref[0] = (cls_ref[0].astype(f32) + projcT.T).astype(dtype)

    return kernel


def fused_time_attention_block_v4(x, ln_scale, ln_bias, wqkv, bqkv, wproj,
                                  bproj, num_frames: int,
                                  patches_per_frame: int, num_heads: int,
                                  chunk: int = 128,
                                  interpret: bool = False):
    """T-leading forward-only time sub-path (extraction): same contract as
    fused_time_attention_block_v2 without the stats/acts outputs."""
    B, S, D = x.shape
    T, N = num_frames, patches_per_frame
    H = num_heads
    d = D // H
    assert S == 1 + T * N

    x_cls = x[:, :1]
    x_p = x[:, 1:].reshape(B, T, N, D)
    n_pad = (-N) % chunk
    if n_pad:
        x_p = jnp.pad(x_p, ((0, 0), (0, 0), (0, n_pad), (0, 0)))
    Np = N + n_pad

    chunk_spec = pl.BlockSpec((1, T, chunk, D), lambda b, c: (b, 0, c, 0),
                              memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b, c: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, D), lambda b, c: (0, 0),
                            memory_space=pltpu.VMEM)
    vecT_spec = pl.BlockSpec((D, 1), lambda b, c: (0, 0),
                             memory_space=pltpu.VMEM)
    wqkvT_spec = pl.BlockSpec((3 * D, D), lambda b, c: (0, 0),
                              memory_space=pltpu.VMEM)
    wprojT_spec = pl.BlockSpec((D, D), lambda b, c: (0, 0),
                               memory_space=pltpu.VMEM)

    b3 = bqkv.reshape(3, D)
    out_p, out_cls = pl.pallas_call(
        _make_time_block_kernel_v4(H, T, N),
        grid=(B, Np // chunk),
        in_specs=[chunk_spec, cls_spec, vec_spec, vec_spec, wqkvT_spec,
                  vecT_spec, vecT_spec, vecT_spec, wprojT_spec, vecT_spec],
        out_specs=(chunk_spec, cls_spec),
        out_shape=(jax.ShapeDtypeStruct((B, T, Np, D), x.dtype),
                   jax.ShapeDtypeStruct((B, 1, D), x.dtype)),
        scratch_shapes=[pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, d, 1), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x_p, x_cls, ln_scale.reshape(1, D), ln_bias.reshape(1, D),
      wqkv.T, b3[0].reshape(D, 1), b3[1].reshape(D, 1), b3[2].reshape(D, 1),
      wproj.T, bproj.reshape(D, 1))
    return jnp.concatenate([out_cls,
                            out_p[:, :, :N].reshape(B, T * N, D)], axis=1)


# ---------------------------------------------------------------------------
# v5 SPACE forward: frame-batched per-head matmuls (extraction fast path).
#
# The v2 space kernel runs one frame per program: 384 programs each issuing
# 24 small [N,64]-matmuls with a serial softmax chain between them. v5 keeps
# the row-major layout (no lane-pad inflation at N=196, unlike v3) but
# processes FPP frames per program and batches each head's matmuls over the
# frame dim with batched dot_general ([FPP,N,d] x [FPP,N,d]) — 12 batched
# matmuls + one [FPP,N,N+1]-wide softmax chain per program, FPP-times fewer
# programs. Same contract as fused_space_attention_block_v2 (no stats).
# ---------------------------------------------------------------------------



def _outer_fn1(a_fn1, b_1d, f32=jnp.float32):
    """[F,N,1] x [1,d] -> [F,N,d] as a K=1 dot_general — broadcasting a
    LANE-OFFSET slice in 3D hits Mosaic "Lane broadcast: not implemented"
    in context (standalone probes pass, tools/mosaic_probe.py)."""
    return jax.lax.dot_general(a_fn1, b_1d, (((2,), (0,)), ((), ())),
                               preferred_element_type=f32)


def _rowdot_fnd(a_fnd, b_1d, f32=jnp.float32):
    """[F,N,d] x [1,d] -> [F,N,1] (contract d) without broadcasting the
    slice."""
    return jax.lax.dot_general(a_fnd, b_1d, (((2,), (1,)), ((), ())),
                               preferred_element_type=f32)


def _sum_fn1_times_fnd(a_fn1, b_fnd, f32=jnp.float32):
    """sum over (F, N) of a[F,N,1] * b[F,N,d] -> [d], via a batched
    dot_general + a 2D sublane reduce (slice-safe)."""
    t = jax.lax.dot_general(a_fn1, b_fnd, (((1,), (1,)), ((0,), (0,))),
                            preferred_element_type=f32)    # [F, 1, d]
    return jnp.sum(t[:, 0, :], axis=0)


def _make_space_block_kernel_v5(H: int, FPP: int,
                                save_stats: bool = False,
                                save_acts: bool = False):
    def kernel(x_ref, base_ref, cls_ref, basecls_ref, ln_s_ref, ln_b_ref,
               wqkv_ref, bq_ref, bk_ref, bv_ref, wproj_ref, bproj_ref,
               o_ref, ocls_ref, *rest):
        if save_stats and save_acts:
            (lse_ref, acls_ref, q_ref, k_ref, v_ref, attn_ref,
             m_scr, l_scr, acc_scr) = rest
        elif save_stats:
            lse_ref, acls_ref, m_scr, l_scr, acc_scr = rest
        else:
            m_scr, l_scr, acc_scr = rest
        """Grid (B, T // FPP), t minor. o = base + proj; CLS online softmax
        across programs in scratch (finalized at the last program)."""
        N = x_ref.shape[2]
        D = x_ref.shape[3]
        d = D // H
        t = pl.program_id(1)
        f32 = jnp.float32

        layernorm = _ln_fn(ln_s_ref[0].astype(f32), ln_b_ref[0].astype(f32))
        dtype = o_ref.dtype
        x_ln = layernorm(x_ref[0].reshape(FPP * N, D)).astype(dtype)
        cls_ln = layernorm(cls_ref[0]).astype(dtype)       # [1, D]

        bq = bq_ref[:].astype(f32)
        bk = bk_ref[:].astype(f32)
        bv = bv_ref[:].astype(f32)
        scale = jnp.asarray(d, f32) ** -0.5
        # q/k/v stay 2D [FPP*N, D]: all elementwise math below runs in the
        # battle-tested 2D layouts (the in-context "Lane broadcast" failures
        # were 3D); the frame-batched dot_generals take fresh
        # slice+reshape [FPP, N, d] views
        q = ((jnp.dot(x_ln, wqkv_ref[:, :D], preferred_element_type=f32)
              + bq) * scale).astype(dtype)
        k = (jnp.dot(x_ln, wqkv_ref[:, D:2 * D],
                     preferred_element_type=f32) + bk).astype(dtype)
        v = (jnp.dot(x_ln, wqkv_ref[:, 2 * D:],
                     preferred_element_type=f32) + bv).astype(dtype)
        if save_acts:
            q_ref[0] = q.reshape(FPP, N, D)
            k_ref[0] = k.reshape(FPP, N, D)
            v_ref[0] = v.reshape(FPP, N, D)
        qc = (jnp.dot(cls_ln, wqkv_ref[:, :D],
                      preferred_element_type=f32) + bq) * scale   # [1, D] f32
        kc = jnp.dot(cls_ln, wqkv_ref[:, D:2 * D],
                     preferred_element_type=f32) + bk
        vc = jnp.dot(cls_ln, wqkv_ref[:, 2 * D:],
                     preferred_element_type=f32) + bv

        @pl.when(t == 0)
        def _init():
            for h in range(H):
                sl = slice(h * d, (h + 1) * d)
                m_scr[h] = jnp.sum(qc[0, sl] * kc[0, sl])
                l_scr[h] = 1.0
                acc_scr[h, :] = vc[0, sl]

        BATCH_F = (((2,), (2,)), ((0,), (0,)))   # contract d, batch frames
        PV = (((2,), (1,)), ((0,), (0,)))        # probs x values, batch frames
        outs = []
        for h in range(H):
            sl = slice(h * d, (h + 1) * d)
            qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]         # [FPP*N, d]
            logits = jax.lax.dot_general(
                qh.reshape(FPP, N, d), kh.reshape(FPP, N, d), BATCH_F,
                preferred_element_type=f32)
            l2 = logits.reshape(FPP * N, N)
            kch = kc[:, sl].astype(dtype)                     # [1, d]
            cls_logit = jnp.dot(qh, kch.T,
                                preferred_element_type=f32)   # [FPP*N, 1]
            m = jnp.maximum(jnp.max(l2, axis=-1, keepdims=True), cls_logit)
            p2 = jnp.exp(l2 - m)                              # [FPP*N, N]
            p_cls = jnp.exp(cls_logit - m)
            den = jnp.sum(p2, axis=-1, keepdims=True) + p_cls
            oh = jax.lax.dot_general(
                p2.astype(dtype).reshape(FPP, N, N), vh.reshape(FPP, N, d),
                PV, preferred_element_type=f32).reshape(FPP * N, d)
            oh = (oh + p_cls * vc[:, sl]) / den
            outs.append(oh.astype(dtype))                     # [FPP*N, d]

            # CLS row over these frames' keys (online, v2 2D patterns)
            lc = jnp.dot(kh.astype(f32), qc[:, sl].T,
                         preferred_element_type=f32)          # [FPP*N, 1]
            c_max = jnp.max(lc)
            m_old = m_scr[h]
            m_new = jnp.maximum(m_old, c_max)
            corr = jnp.exp(m_old - m_new)
            p_c = jnp.exp(lc - m_new)                         # [FPP*N, 1]
            m_scr[h] = m_new
            l_scr[h] = l_scr[h] * corr + jnp.sum(p_c)
            pv = jnp.sum(vh.astype(f32) * p_c, axis=0)        # [d]
            acc_scr[h, :] = acc_scr[h, :] * corr + pv

        attn_out = jnp.concatenate(outs, axis=-1)         # [FPP*N, D]
        if save_acts:
            attn_ref[0] = attn_out.reshape(FPP, N, D)
        proj = jnp.dot(attn_out, wproj_ref[:], preferred_element_type=f32) \
            + bproj_ref[:].astype(f32)
        o_ref[0] = (base_ref[0].reshape(FPP * N, D).astype(f32) + proj) \
            .reshape(FPP, N, D).astype(dtype)

        @pl.when(t == pl.num_programs(1) - 1)
        def _finalize():
            rows = [acc_scr[h:h + 1, :] / l_scr[h] for h in range(H)]
            cls_att = jnp.concatenate(rows, axis=1)           # [1, D] f32
            projc = jnp.dot(cls_att.astype(dtype), wproj_ref[:],
                            preferred_element_type=f32) \
                + bproj_ref[:].astype(f32)
            ocls_ref[0] = (basecls_ref[0].astype(f32) + projc).astype(dtype)
            if save_stats:
                for h in range(H):
                    lse_ref[0, 0, h] = m_scr[h] + jnp.log(l_scr[h])
                acls_ref[0] = cls_att

    return kernel


def fused_space_attention_block_v5(x, base, ln_scale, ln_bias, wqkv, bqkv,
                                   wproj, bproj, num_frames: int,
                                   patches_per_frame: int, num_heads: int,
                                   fpp: int | None = None,
                                   save_stats: bool = False,
                                   save_acts: bool = False,
                                   interpret: bool = False):
    """Frame-batched space sub-path forward (see kernel docstring). Same
    contract as fused_space_attention_block_v2 (incl. save_stats/save_acts:
    per-head CLS logsumexp + pre-proj CLS output + row-major q/k/v/attn)."""
    B, S, D = x.shape
    T, N = num_frames, patches_per_frame
    H = num_heads
    d = D // H
    assert S == 1 + T * N
    if fpp is None:
        fpp = T
    if T % fpp != 0:
        fpp = T

    x_cls = x[:, :1]
    x_p = x[:, 1:].reshape(B, T, N, D)
    base_cls = base[:, :1]
    base_p = base[:, 1:].reshape(B, T, N, D)

    frame_spec = pl.BlockSpec((1, fpp, N, D), lambda b, t: (b, t, 0, 0),
                              memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, D), lambda b, t: (0, 0),
                            memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((D, 3 * D), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    wproj_spec = pl.BlockSpec((D, D), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)

    b3 = bqkv.reshape(3, D)
    out_specs = [frame_spec, cls_spec]
    out_shape = [jax.ShapeDtypeStruct((B, T, N, D), x.dtype),
                 jax.ShapeDtypeStruct((B, 1, D), x.dtype)]
    if save_stats:
        out_specs += [pl.BlockSpec((1, 1, H), lambda b, t: (b, 0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((1, 1, D), lambda b, t: (b, 0, 0),
                                   memory_space=pltpu.VMEM)]
        out_shape += [jax.ShapeDtypeStruct((B, 1, H), jnp.float32),
                      jax.ShapeDtypeStruct((B, 1, D), jnp.float32)]
        if save_acts:
            out_specs += [frame_spec] * 4
            out_shape += [jax.ShapeDtypeStruct((B, T, N, D), x.dtype)] * 4
    outs = pl.pallas_call(
        _make_space_block_kernel_v5(H, fpp, save_stats, save_acts),
        grid=(B, T // fpp),
        in_specs=[frame_spec, frame_spec, cls_spec, cls_spec, vec_spec,
                  vec_spec, wqkv_spec, vec_spec, vec_spec, vec_spec,
                  wproj_spec, vec_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.SMEM((H,), jnp.float32),
                        pltpu.SMEM((H,), jnp.float32),
                        pltpu.VMEM((H, d), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x_p, base_p, x_cls, base_cls, ln_scale.reshape(1, D),
      ln_bias.reshape(1, D), wqkv, b3[0:1], b3[1:2], b3[2:3], wproj,
      bproj.reshape(1, D))
    out = jnp.concatenate([outs[1], outs[0].reshape(B, T * N, D)], axis=1)
    if save_stats and save_acts:
        return (out,) + tuple(outs[2:])
    if save_stats:
        return out, outs[2], outs[3]
    return out


# ---------------------------------------------------------------------------
# v6 WHOLE-BLOCK kernel (extraction): time + space + MLP sub-paths of one
# SpaceTimeBlock in ONE Pallas call, one clip per program (grid (B,)).
#
# All sub-path weights (~19 MB bf16) and the whole clip ([T, N, D] bf16,
# ~3.6 MB at B/16 extraction) are VMEM-resident, so a block costs one HBM
# read of x and one write of o instead of six sub-path round-trips, and the
# CLS rows are computed EXACTLY (every key in VMEM — no online-softmax
# scratch carried across programs). Sub-path math reuses the measured
# winners: v4's T-leading time path (leading-dim transposes only), v5's
# frame-batched per-head space matmuls, and a token-chunked MLP.
# Reference contract: one block of video_encoder_ViT_B_16.py:109-124
# (x + time, then base + space from the block input, then MLP).
# ---------------------------------------------------------------------------


def _make_block_kernel_v6(H: int, T: int, N: int, act: str,
                          mlp_chunk: int = 512):
    def kernel(x_ref, cls_ref,
               ln3_s_ref, ln3_b_ref, twqkvT_ref, tbqT_ref, tbkT_ref,
               tbvT_ref, twprojT_ref, tbprojT_ref,
               ln1_s_ref, ln1_b_ref, swqkv_ref, sbq_ref, sbk_ref, sbv_ref,
               swproj_ref, sbproj_ref,
               ln2_s_ref, ln2_b_ref, wfc_ref, bfc_ref, wpr_ref, bpr_ref,
               o_ref, ocls_ref):
        D = x_ref.shape[-1]
        d = D // H
        f32 = jnp.float32
        dtype = o_ref.dtype
        scale = jnp.asarray(d, f32) ** -0.5

        x_flat = x_ref[0].reshape(T * N, D)                # [T*N, D] bf16
        cls = cls_ref[0]                                   # [1, D]

        # ================= TIME sub-path (residual folded) ==================
        ln3 = _ln_fn(ln3_s_ref[0].astype(f32), ln3_b_ref[0].astype(f32))
        x_ln = ln3(x_flat).astype(dtype)
        cls_ln = ln3(cls).astype(dtype)
        x_lnT = jnp.swapaxes(x_ln.reshape(T, N, D), -1, -2)    # [T, D, N]
        tbqT = tbqT_ref[:].astype(f32)
        tbkT = tbkT_ref[:].astype(f32)
        tbvT = tbvT_ref[:].astype(f32)
        qs, ks, vs = [], [], []
        for t in range(T):
            qkvT_t = jnp.dot(twqkvT_ref[:], x_lnT[t],
                             preferred_element_type=f32)       # [3D, N]
            qs.append(((qkvT_t[:D] + tbqT) * scale).astype(dtype))
            ks.append((qkvT_t[D:2 * D] + tbkT).astype(dtype))
            vs.append((qkvT_t[2 * D:] + tbvT).astype(dtype))

        def heads(ts):
            return jnp.transpose(jnp.stack(ts).reshape(T, H, d, N),
                                 (1, 0, 2, 3)).astype(f32)

        q4 = heads(qs)                                     # [H, T, d, N]
        k4 = heads(ks)
        v4 = heads(vs)
        qkv_cT = jnp.dot(twqkvT_ref[:], cls_ln.T,
                         preferred_element_type=f32)       # [3D, 1]
        qc3 = (qkv_cT[:D] + tbqT).reshape(H, d, 1) * scale
        kc3 = (qkv_cT[D:2 * D] + tbkT).reshape(H, d, 1)
        vc3 = (qkv_cT[2 * D:] + tbvT).reshape(H, d, 1)

        outs_t = []
        for t in range(T):
            qt = q4[:, t]                                  # [H, d, N]
            l = jnp.sum(qt[:, None] * k4, axis=2)          # [H, T, N]
            cls_l = jnp.sum(qt * kc3, axis=1)[:, None]     # [H, 1, N]
            full = jnp.concatenate([cls_l, l], axis=1)     # [H, T+1, N]
            m = jnp.max(full, axis=1, keepdims=True)
            p = jnp.exp(full - m)
            denom = jnp.sum(p, axis=1, keepdims=True)
            out_t = jnp.sum(p[:, 1:][:, :, None] * v4, axis=1)
            out_t = out_t + p[:, 0][:, None, :] * vc3
            outs_t.append((out_t / denom).astype(dtype).reshape(D, N))

        # exact CLS row (all T*N keys + self are resident)
        lc = jnp.sum(k4 * qc3[:, None], axis=2)            # [H, T, N]
        self_l = jnp.sum(qc3 * kc3, axis=1)                # [H, 1]
        mc = jnp.maximum(jnp.max(jnp.max(lc, axis=2), axis=1, keepdims=True),
                         self_l)                           # [H, 1]
        pc = jnp.exp(lc - mc[..., None])                   # [H, T, N]
        p_self = jnp.exp(self_l - mc)                      # [H, 1]
        denc = jnp.sum(jnp.sum(pc, axis=2), axis=1, keepdims=True) + p_self
        accc = jnp.sum(v4 * pc[:, :, None, :], axis=(1, 3)) \
            + vc3[..., 0] * p_self                         # [H, d]
        cls_attT = (accc / denc).reshape(D, 1)             # fp32

        proj_rows = []
        for t in range(T):
            projT_t = jnp.dot(twprojT_ref[:], outs_t[t],
                              preferred_element_type=f32) \
                + tbprojT_ref[:].astype(f32)               # [D, N]
            proj_rows.append(projT_t.T)
        tr = (x_flat.astype(f32)
              + jnp.concatenate(proj_rows, axis=0)).astype(dtype)  # [T*N, D]
        projc = jnp.dot(twprojT_ref[:], cls_attT.astype(dtype),
                        preferred_element_type=f32) \
            + tbprojT_ref[:].astype(f32)
        tr_cls = (cls.astype(f32) + projc.T).astype(dtype)         # [1, D]

        # ================ SPACE sub-path (base = block input x) =============
        ln1 = _ln_fn(ln1_s_ref[0].astype(f32), ln1_b_ref[0].astype(f32))
        s_ln = ln1(tr).astype(dtype)
        scls_ln = ln1(tr_cls).astype(dtype)
        sbq = sbq_ref[:].astype(f32)
        sbk = sbk_ref[:].astype(f32)
        sbv = sbv_ref[:].astype(f32)
        sq = ((jnp.dot(s_ln, swqkv_ref[:, :D], preferred_element_type=f32)
               + sbq) * scale).astype(dtype).reshape(T, N, D)
        sk = (jnp.dot(s_ln, swqkv_ref[:, D:2 * D],
                      preferred_element_type=f32) + sbk) \
            .astype(dtype).reshape(T, N, D)
        sv = (jnp.dot(s_ln, swqkv_ref[:, 2 * D:],
                      preferred_element_type=f32) + sbv) \
            .astype(dtype).reshape(T, N, D)
        sqc = (jnp.dot(scls_ln, swqkv_ref[:, :D],
                       preferred_element_type=f32) + sbq) * scale  # [1, D]
        skc = jnp.dot(scls_ln, swqkv_ref[:, D:2 * D],
                      preferred_element_type=f32) + sbk
        svc = jnp.dot(scls_ln, swqkv_ref[:, 2 * D:],
                      preferred_element_type=f32) + sbv

        BATCH_DD = (((2,), (2,)), ((0,), (0,)))
        PV = (((2,), (1,)), ((0,), (0,)))
        TN = T * N
        souts = []
        acc_rows = []
        # 2D-first (see v5): elementwise softmax math on [T*N, .] layouts,
        # 3D only as fresh slice+reshape dot_general operands
        sq2 = sq.reshape(TN, D)
        sk2 = sk.reshape(TN, D)
        sv2 = sv.reshape(TN, D)
        for h in range(H):
            sl = slice(h * d, (h + 1) * d)
            qh, kh, vh = sq2[:, sl], sk2[:, sl], sv2[:, sl]   # [T*N, d]
            logits = jax.lax.dot_general(
                qh.reshape(T, N, d), kh.reshape(T, N, d), BATCH_DD,
                preferred_element_type=f32)
            l2 = logits.reshape(TN, N)
            cls_logit = jnp.dot(qh, skc[:, sl].astype(dtype).T,
                                preferred_element_type=f32)   # [T*N, 1]
            m = jnp.maximum(jnp.max(l2, axis=-1, keepdims=True), cls_logit)
            p2 = jnp.exp(l2 - m)
            p_cls = jnp.exp(cls_logit - m)
            den = jnp.sum(p2, axis=-1, keepdims=True) + p_cls
            oh = jax.lax.dot_general(
                p2.astype(dtype).reshape(T, N, N), vh.reshape(T, N, d), PV,
                preferred_element_type=f32).reshape(TN, d)
            oh = (oh + p_cls * svc[:, sl]) / den
            souts.append(oh.astype(dtype))                 # [T*N, d]

            # exact CLS row for this head (2D)
            lch = jnp.dot(kh.astype(f32), sqc[:, sl].T,
                          preferred_element_type=f32)      # [T*N, 1]
            self_lh = jnp.sum(sqc[:, sl] * skc[:, sl])
            mh = jnp.maximum(jnp.max(lch), self_lh)
            pch = jnp.exp(lch - mh)
            psh = jnp.exp(self_lh - mh)
            denh = jnp.sum(pch) + psh
            acc_h = (jnp.sum(vh.astype(f32) * pch, axis=0)
                     + svc[0, sl] * psh) / denh            # [d]
            acc_rows.append(acc_h[None])
        s_attn = jnp.concatenate(souts, axis=-1)           # [T*N, D]
        s_cls_att = jnp.concatenate(acc_rows, axis=1)      # [1, D] fp32
        sr = (x_flat.astype(f32)
              + jnp.dot(s_attn, swproj_ref[:], preferred_element_type=f32)
              + sbproj_ref[:].astype(f32)).astype(dtype)
        sr_cls = (cls.astype(f32)
                  + jnp.dot(s_cls_att.astype(dtype), swproj_ref[:],
                            preferred_element_type=f32)
                  + sbproj_ref[:].astype(f32)).astype(dtype)

        # ========================= MLP sub-path =============================
        ln2_s = ln2_s_ref[0].astype(f32)
        ln2_b = ln2_b_ref[0].astype(f32)
        ln2 = _ln_fn(ln2_s, ln2_b)
        bfc = bfc_ref[:].astype(f32)
        bpr = bpr_ref[:].astype(f32)

        def mlp(tok):                                      # [n, D] -> [n, D]
            y = ln2(tok).astype(dtype)
            h = jnp.dot(y, wfc_ref[:], preferred_element_type=f32) + bfc
            if act == "quick_gelu":
                h = h * jax.nn.sigmoid(1.702 * h)
            else:
                h = 0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))
            out = jnp.dot(h.astype(dtype), wpr_ref[:],
                          preferred_element_type=f32) + bpr
            return (tok.astype(f32) + out).astype(dtype)

        n_tok = T * N
        chunks = []
        for s0 in range(0, n_tok, mlp_chunk):
            c = min(mlp_chunk, n_tok - s0)
            chunks.append(mlp(sr[s0:s0 + c]))
        o_ref[0] = jnp.concatenate(chunks, axis=0).reshape(T, N, D)
        ocls_ref[0] = mlp(sr_cls)

    return kernel


# ---------------------------------------------------------------------------
# v7 kernels: d-MAJOR TOWER (extraction fast path).
#
# The v3 space kernel's lhsT-batched attention math runs 1.31x the v2 per-head
# form at N=196 (tools/mxu_lane_probe.py), but loses end-to-end because each
# program pays a [N,D]<->[D,N] transpose round-trip (2.57 us/pair = ~11.8 ms
# per 12-block chain). v7 moves the WHOLE tower to d-major activations —
# patches live as [B, T, D, N] (locations in lanes) between sub-paths, so the
# transposes are paid ONCE at tower entry/exit instead of per kernel:
#   - space: the v3 body verbatim, minus the per-program transposes;
#   - time:  the v4 body minus its two transpose sets (in and out);
#   - mlp:   a d-major MLP kernel ([4D,D] @ [D,N] spellings).
# The CLS token stays row-major [B, 1, D] (single row; in-kernel [1,D]<->[D,1]
# vector transposes are free relayouts). The time kernel's lane chunk must
# DIVIDE N (no padded lanes may reach the space kernel, whose attention mixes
# locations within a frame). Reference contract unchanged:
# video_encoder_ViT_B_16.py:109-124 per block.
# ---------------------------------------------------------------------------


def _lnT_fn(ln_sT, ln_bT):
    """LayerNorm over SUBLANES for d-major [D, n] tiles (params [D, 1])."""
    def layernorm(tT):
        tf = tT.astype(jnp.float32)
        mu = jnp.mean(tf, axis=0, keepdims=True)           # [1, n]
        var = jnp.mean(jnp.square(tf - mu), axis=0, keepdims=True)
        return (tf - mu) * jax.lax.rsqrt(var + 1e-5) * ln_sT + ln_bT
    return layernorm


def _make_space_block_kernel_v7(H: int, save_stats: bool = False,
                                save_acts: bool = False,
                                save_attn: bool = True):
    def kernel(x_ref, base_ref, cls_ref, basecls_ref, ln_sT_ref, ln_bT_ref,
               wqkvT_ref, bqT_ref, bkT_ref, bvT_ref, wprojT_ref, bprojT_ref,
               o_ref, ocls_ref, *rest):
        """Grid (B, T), t minor. x/base/o blocks [1, 1, D, N] (d-major);
        cls/ocls [1, 1, D] row-major. o = base + projT; ocls at t == T-1.
        With save_stats/save_acts the d-major activations (qT/kT/vT[/attnT]
        [B,T,D,N]) + CLS softmax stats come back for the v7 backward
        (save_attn=False drops the attnT save — the backward recomputes it
        from the probs it already rebuilds, trading one matmul per program
        for [B,T,D,N] of HBM saves)."""
        if save_stats and save_acts and save_attn:
            (lse_ref, acls_ref, qT_ref, kT_ref, vT_ref, attnT_ref,
             m_scr, l_scr, acc_scr) = rest
        elif save_stats and save_acts:
            (lse_ref, acls_ref, qT_ref, kT_ref, vT_ref,
             m_scr, l_scr, acc_scr) = rest
        elif save_stats:
            lse_ref, acls_ref, m_scr, l_scr, acc_scr = rest
        else:
            m_scr, l_scr, acc_scr = rest
        D = x_ref.shape[2]
        d = D // H
        t = pl.program_id(1)
        dtype = o_ref.dtype
        f32 = jnp.float32

        bqT = bqT_ref[:].astype(f32)                       # [D, 1]
        bkT = bkT_ref[:].astype(f32)
        bvT = bvT_ref[:].astype(f32)
        bprojT = bprojT_ref[:].astype(f32)
        scale = jnp.asarray(d, f32) ** -0.5
        lnT = _lnT_fn(ln_sT_ref[:].astype(f32), ln_bT_ref[:].astype(f32))

        xT = x_ref[0, 0]                                   # [D, N] (no .T)
        clsT = cls_ref[0].T                                # [D, 1]
        x_lnT = lnT(xT).astype(dtype)
        cls_lnT = lnT(clsT).astype(dtype)

        qkvT = jnp.dot(wqkvT_ref[:], x_lnT,
                       preferred_element_type=f32)         # [3D, N]
        qT = ((qkvT[:D] + bqT) * scale).astype(dtype)
        kT = (qkvT[D:2 * D] + bkT).astype(dtype)
        vT = (qkvT[2 * D:] + bvT).astype(dtype)
        if save_acts:
            qT_ref[0, 0] = qT
            kT_ref[0, 0] = kT
            vT_ref[0, 0] = vT
        qkv_cT = jnp.dot(wqkvT_ref[:], cls_lnT,
                         preferred_element_type=f32)       # [3D, 1]
        qc3 = ((qkv_cT[:D] + bqT) * scale).reshape(H, d, 1)
        kc3 = (qkv_cT[D:2 * D] + bkT).reshape(H, d, 1)
        vc3 = (qkv_cT[2 * D:] + bvT).reshape(H, d, 1)

        q3 = qT.reshape(H, d, -1)
        k3 = kT.reshape(H, d, -1)
        v3 = vT.reshape(H, d, -1)
        CONTRACT_D = (((1,), (1,)), ((0,), (0,)))          # over head dim d
        CONTRACT_NK = (((2,), (2,)), ((0,), (0,)))         # over key lanes

        @pl.when(t == 0)
        def _init():
            m_scr[...] = jnp.sum(qc3 * kc3, axis=1)        # [H, 1]
            l_scr[...] = jnp.ones_like(l_scr)
            acc_scr[...] = vc3                             # [H, d, 1]

        logits = jax.lax.dot_general(q3, k3, CONTRACT_D,
                                     preferred_element_type=f32)  # [H,Nq,Nk]
        cls_l = jnp.sum(q3.astype(f32) * kc3, axis=1)      # [H, Nq]
        m = jnp.maximum(jnp.max(logits, axis=-1), cls_l)   # [H, Nq]
        p = jnp.exp(logits - m[..., None])
        p_cls = jnp.exp(cls_l - m)                         # [H, Nq]
        denom = jnp.sum(p, axis=-1) + p_cls
        oT3 = jax.lax.dot_general(v3, p.astype(dtype), CONTRACT_NK,
                                  preferred_element_type=f32)  # [H, d, Nq]
        oT3 = (oT3 + vc3 * p_cls[:, None, :]) / denom[:, None, :]
        attn_T = oT3.astype(dtype).reshape(D, -1)
        if save_acts and save_attn:
            attnT_ref[0, 0] = attn_T

        projT = jnp.dot(wprojT_ref[:], attn_T,
                        preferred_element_type=f32) + bprojT   # [D, N]
        o_ref[0, 0] = (base_ref[0, 0].astype(f32) + projT).astype(dtype)

        # CLS row: online accumulation (all-vector scratch ops)
        lc = jnp.sum(k3.astype(f32) * qc3, axis=1)         # [H, Nk]
        c_max = jnp.max(lc, axis=1, keepdims=True)         # [H, 1]
        m_old = m_scr[...]
        m_new = jnp.maximum(m_old, c_max)
        corr = jnp.exp(m_old - m_new)                      # [H, 1]
        p_c = jnp.exp(lc - m_new)                          # [H, Nk]
        m_scr[...] = m_new
        l_scr[...] = l_scr[...] * corr + jnp.sum(p_c, axis=1, keepdims=True)
        pv = jnp.sum(v3.astype(f32) * p_c[:, None, :], axis=2,
                     keepdims=True)                        # [H, d, 1]
        acc_scr[...] = acc_scr[...] * corr[..., None] + pv

        @pl.when(t == pl.num_programs(1) - 1)
        def _finalize():
            cls_attT = (acc_scr[...] / l_scr[...][..., None]).reshape(D, 1)
            projcT = jnp.dot(wprojT_ref[:], cls_attT.astype(dtype),
                             preferred_element_type=f32) + bprojT  # [D, 1]
            ocls_ref[0] = (basecls_ref[0].astype(f32) + projcT.T).astype(dtype)
            if save_stats:
                lse_ref[0] = (m_scr[...] + jnp.log(l_scr[...])).T  # [1, H]
                acls_ref[0] = cls_attT                     # [D, 1] fp32

    return kernel


def fused_space_attention_block_v7(xT, baseT, cls, basecls, ln_scale, ln_bias,
                                   wqkv, bqkv, wproj, bproj, num_heads: int,
                                   save_stats: bool = False,
                                   save_acts: bool = False,
                                   save_attn: bool = True,
                                   interpret: bool = False):
    """d-major space sub-path incl. residual from baseT. xT/baseT: [B,T,D,N];
    cls/basecls: [B,1,D]. Returns (oT [B,T,D,N], ocls [B,1,D]); with
    save_stats+save_acts also (lse, aclsT, qT, kT, vT, attnT) for the v7
    train backward."""
    B, T, D, N = xT.shape
    H = num_heads
    d = D // H

    frameT_spec = pl.BlockSpec((1, 1, D, N), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    vecT_spec = pl.BlockSpec((D, 1), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    wqkvT_spec = pl.BlockSpec((3 * D, D), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    wprojT_spec = pl.BlockSpec((D, D), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM)

    out_specs = [frameT_spec, cls_spec]
    out_shape = [jax.ShapeDtypeStruct((B, T, D, N), xT.dtype),
                 jax.ShapeDtypeStruct((B, 1, D), xT.dtype)]
    if save_stats:
        out_specs += [pl.BlockSpec((1, 1, H), lambda b, t: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, D, 1), lambda b, t: (b, 0, 0),
                                   memory_space=pltpu.VMEM)]
        out_shape += [jax.ShapeDtypeStruct((B, 1, H), jnp.float32),
                      jax.ShapeDtypeStruct((B, D, 1), jnp.float32)]
        if save_acts:
            n_acts = 4 if save_attn else 3
            out_specs += [frameT_spec] * n_acts
            out_shape += [jax.ShapeDtypeStruct((B, T, D, N),
                                               xT.dtype)] * n_acts

    b3 = bqkv.reshape(3, D)
    outs = pl.pallas_call(
        _make_space_block_kernel_v7(H, save_stats, save_acts, save_attn),
        grid=(B, T),
        in_specs=[frameT_spec, frameT_spec, cls_spec, cls_spec, vecT_spec,
                  vecT_spec, wqkvT_spec, vecT_spec, vecT_spec, vecT_spec,
                  wprojT_spec, vecT_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, d, 1), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(xT, baseT, cls, basecls, ln_scale.reshape(D, 1), ln_bias.reshape(D, 1),
      wqkv.T, b3[0].reshape(D, 1), b3[1].reshape(D, 1), b3[2].reshape(D, 1),
      wproj.T, bproj.reshape(D, 1))
    return outs


def _make_spacemlp_block_kernel_v7(H: int, act: str):
    def kernel(x_ref, base_ref, cls_ref, basecls_ref, ln_sT_ref, ln_bT_ref,
               wqkvT_ref, bqT_ref, bkT_ref, bvT_ref, wprojT_ref, bprojT_ref,
               ln2_sT_ref, ln2_bT_ref, wfcT_ref, bfcT_ref, wprT_ref, bprT_ref,
               o_ref, ocls_ref, m_scr, l_scr, acc_scr):
        """Space sub-path + MLP sub-path of one block in a single program:
        the [D, N] space residual never round-trips HBM between them. Grid
        (B, T), t minor; o = s + mlpT(s) where s = base + space_projT."""
        D = x_ref.shape[2]
        d = D // H
        t = pl.program_id(1)
        dtype = o_ref.dtype
        f32 = jnp.float32

        bqT = bqT_ref[:].astype(f32)                       # [D, 1]
        bkT = bkT_ref[:].astype(f32)
        bvT = bvT_ref[:].astype(f32)
        bprojT = bprojT_ref[:].astype(f32)
        scale = jnp.asarray(d, f32) ** -0.5
        lnT = _lnT_fn(ln_sT_ref[:].astype(f32), ln_bT_ref[:].astype(f32))
        ln2T = _lnT_fn(ln2_sT_ref[:].astype(f32), ln2_bT_ref[:].astype(f32))
        bfcT = bfcT_ref[:].astype(f32)                     # [4D, 1]
        bprT = bprT_ref[:].astype(f32)                     # [D, 1]

        def mlpT(sT):                                      # [D, n] f32 -> f32
            y = ln2T(sT).astype(dtype)
            h = jnp.dot(wfcT_ref[:], y, preferred_element_type=f32) + bfcT
            if act == "quick_gelu":
                h = h * jax.nn.sigmoid(1.702 * h)
            else:
                h = 0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))
            return sT + jnp.dot(wprT_ref[:], h.astype(dtype),
                                preferred_element_type=f32) + bprT

        xT = x_ref[0, 0]                                   # [D, N]
        clsT = cls_ref[0].T                                # [D, 1]
        x_lnT = lnT(xT).astype(dtype)
        cls_lnT = lnT(clsT).astype(dtype)

        qkvT = jnp.dot(wqkvT_ref[:], x_lnT,
                       preferred_element_type=f32)         # [3D, N]
        qT = ((qkvT[:D] + bqT) * scale).astype(dtype)
        kT = (qkvT[D:2 * D] + bkT).astype(dtype)
        vT = (qkvT[2 * D:] + bvT).astype(dtype)
        qkv_cT = jnp.dot(wqkvT_ref[:], cls_lnT,
                         preferred_element_type=f32)       # [3D, 1]
        qc3 = ((qkv_cT[:D] + bqT) * scale).reshape(H, d, 1)
        kc3 = (qkv_cT[D:2 * D] + bkT).reshape(H, d, 1)
        vc3 = (qkv_cT[2 * D:] + bvT).reshape(H, d, 1)

        q3 = qT.reshape(H, d, -1)
        k3 = kT.reshape(H, d, -1)
        v3 = vT.reshape(H, d, -1)
        CONTRACT_D = (((1,), (1,)), ((0,), (0,)))          # over head dim d
        CONTRACT_NK = (((2,), (2,)), ((0,), (0,)))         # over key lanes

        @pl.when(t == 0)
        def _init():
            m_scr[...] = jnp.sum(qc3 * kc3, axis=1)        # [H, 1]
            l_scr[...] = jnp.ones_like(l_scr)
            acc_scr[...] = vc3                             # [H, d, 1]

        logits = jax.lax.dot_general(q3, k3, CONTRACT_D,
                                     preferred_element_type=f32)  # [H,Nq,Nk]
        cls_l = jnp.sum(q3.astype(f32) * kc3, axis=1)      # [H, Nq]
        m = jnp.maximum(jnp.max(logits, axis=-1), cls_l)   # [H, Nq]
        p = jnp.exp(logits - m[..., None])
        p_cls = jnp.exp(cls_l - m)                         # [H, Nq]
        denom = jnp.sum(p, axis=-1) + p_cls
        oT3 = jax.lax.dot_general(v3, p.astype(dtype), CONTRACT_NK,
                                  preferred_element_type=f32)  # [H, d, Nq]
        oT3 = (oT3 + vc3 * p_cls[:, None, :]) / denom[:, None, :]
        attn_T = oT3.astype(dtype).reshape(D, -1)

        projT = jnp.dot(wprojT_ref[:], attn_T,
                        preferred_element_type=f32) + bprojT   # [D, N]
        sT = base_ref[0, 0].astype(f32) + projT
        o_ref[0, 0] = mlpT(sT).astype(dtype)

        # CLS row: online accumulation (all-vector scratch ops)
        lc = jnp.sum(k3.astype(f32) * qc3, axis=1)         # [H, Nk]
        c_max = jnp.max(lc, axis=1, keepdims=True)         # [H, 1]
        m_old = m_scr[...]
        m_new = jnp.maximum(m_old, c_max)
        corr = jnp.exp(m_old - m_new)                      # [H, 1]
        p_c = jnp.exp(lc - m_new)                          # [H, Nk]
        m_scr[...] = m_new
        l_scr[...] = l_scr[...] * corr + jnp.sum(p_c, axis=1, keepdims=True)
        pv = jnp.sum(v3.astype(f32) * p_c[:, None, :], axis=2,
                     keepdims=True)                        # [H, d, 1]
        acc_scr[...] = acc_scr[...] * corr[..., None] + pv

        @pl.when(t == pl.num_programs(1) - 1)
        def _finalize():
            cls_attT = (acc_scr[...] / l_scr[...][..., None]).reshape(D, 1)
            projcT = jnp.dot(wprojT_ref[:], cls_attT.astype(dtype),
                             preferred_element_type=f32) + bprojT  # [D, 1]
            scT = basecls_ref[0].astype(f32).T + projcT
            ocls_ref[0] = mlpT(scT).T.astype(dtype)

    return kernel


def fused_spacemlp_block_v7(xT, baseT, cls, basecls, ln_scale, ln_bias,
                            wqkv, bqkv, wproj, bproj, ln2_scale, ln2_bias,
                            wfc, bfc, wpr, bpr, num_heads: int,
                            act: str = "quick_gelu", interpret: bool = False):
    """d-major space+MLP fused sub-path (one HBM round-trip for both).
    xT/baseT: [B,T,D,N]; cls/basecls: [B,1,D]. Returns (oT, ocls)."""
    B, T, D, N = xT.shape
    H = num_heads
    d = D // H
    hidden = wfc.shape[1]

    frameT_spec = pl.BlockSpec((1, 1, D, N), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    vecT_spec = pl.BlockSpec((D, 1), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    hvecT_spec = pl.BlockSpec((hidden, 1), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    wqkvT_spec = pl.BlockSpec((3 * D, D), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    wprojT_spec = pl.BlockSpec((D, D), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM)
    wfcT_spec = pl.BlockSpec((hidden, D), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    wprT_spec = pl.BlockSpec((D, hidden), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)

    b3 = bqkv.reshape(3, D)
    oT, ocls = pl.pallas_call(
        _make_spacemlp_block_kernel_v7(H, act),
        grid=(B, T),
        in_specs=[frameT_spec, frameT_spec, cls_spec, cls_spec, vecT_spec,
                  vecT_spec, wqkvT_spec, vecT_spec, vecT_spec, vecT_spec,
                  wprojT_spec, vecT_spec, vecT_spec, vecT_spec, wfcT_spec,
                  hvecT_spec, wprT_spec, vecT_spec],
        out_specs=(frameT_spec, cls_spec),
        out_shape=(jax.ShapeDtypeStruct((B, T, D, N), xT.dtype),
                   jax.ShapeDtypeStruct((B, 1, D), xT.dtype)),
        scratch_shapes=[pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, d, 1), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(xT, baseT, cls, basecls, ln_scale.reshape(D, 1), ln_bias.reshape(D, 1),
      wqkv.T, b3[0].reshape(D, 1), b3[1].reshape(D, 1), b3[2].reshape(D, 1),
      wproj.T, bproj.reshape(D, 1), ln2_scale.reshape(D, 1),
      ln2_bias.reshape(D, 1), wfc.T, bfc.reshape(hidden, 1), wpr.T,
      bpr.reshape(D, 1))
    return oT, ocls


def _make_time_block_kernel_v7(H: int, T: int, save_stats: bool = False,
                               save_acts: bool = False,
                               save_attn: bool = True,
                               mm_group: int = 1,
                               smv: str = "base"):
    def kernel(x_ref, cls_ref, ln_sT_ref, ln_bT_ref,
               wqkvT_ref, bqT_ref, bkT_ref, bvT_ref, wprojT_ref, bprojT_ref,
               o_ref, ocls_ref, *rest):
        """Grid (B, C), c minor. x/o blocks [1, T, D, Nc] (d-major, Nc | N so
        no padded lanes exist); cls/ocls [1, 1, D]. o = x + projT. With
        save_stats/save_acts: d-major qT/kT/vT/attnT [B,T,D,N] + CLS stats."""
        if save_stats and save_acts and save_attn:
            (lse_ref, acls_ref, qT_ref, kT_ref, vT_ref, attnT_ref,
             m_scr, l_scr, acc_scr) = rest
        elif save_stats and save_acts:
            (lse_ref, acls_ref, qT_ref, kT_ref, vT_ref,
             m_scr, l_scr, acc_scr) = rest
        elif save_stats:
            lse_ref, acls_ref, m_scr, l_scr, acc_scr = rest
        else:
            m_scr, l_scr, acc_scr = rest
        D = x_ref.shape[2]
        d = D // H
        c = pl.program_id(1)
        f32 = jnp.float32
        dtype = o_ref.dtype

        bqT = bqT_ref[:].astype(f32)                       # [D, 1]
        bkT = bkT_ref[:].astype(f32)
        bvT = bvT_ref[:].astype(f32)
        scale = jnp.asarray(d, f32) ** -0.5
        lnT = _lnT_fn(ln_sT_ref[:].astype(f32), ln_bT_ref[:].astype(f32))

        xT = x_ref[0]                                      # [T, D, Nc]
        Nc = xT.shape[2]
        qs, ks, vs = [], [], []
        if mm_group > 1:
            # mm_group frames lane-concatenated into ONE [3D,D]@[D,g*Nc]
            # qkv matmul: g=3 turns the 196 -> 256 lane pad (30.6%) into
            # 588 -> 640 (8.8%) — measured 53.6 -> 49.5 ms per 12-block
            # chain at B=32 (tools/time_split_probe.py widemm, PERF r4)
            for t0 in range(0, T, mm_group):
                xcat = jnp.concatenate(
                    [lnT(xT[t0 + i]).astype(dtype) for i in range(mm_group)],
                    axis=1)                                # [D, g*Nc]
                qkvw = jnp.dot(wqkvT_ref[:], xcat,
                               preferred_element_type=f32)
                for i in range(mm_group):
                    qkvT_t = qkvw[:, i * Nc:(i + 1) * Nc]
                    qs.append(((qkvT_t[:D] + bqT) * scale).astype(dtype))
                    ks.append((qkvT_t[D:2 * D] + bkT).astype(dtype))
                    vs.append((qkvT_t[2 * D:] + bvT).astype(dtype))
        else:
            for t in range(T):
                x_lnT_t = lnT(xT[t]).astype(dtype)         # [D, Nc]
                qkvT_t = jnp.dot(wqkvT_ref[:], x_lnT_t,
                                 preferred_element_type=f32)   # [3D, Nc]
                qs.append(((qkvT_t[:D] + bqT) * scale).astype(dtype))
                ks.append((qkvT_t[D:2 * D] + bkT).astype(dtype))
                vs.append((qkvT_t[2 * D:] + bvT).astype(dtype))
        if save_acts:
            for t in range(T):
                qT_ref[0, t] = qs[t]
                kT_ref[0, t] = ks[t]
                vT_ref[0, t] = vs[t]

        # [T, D, Nc] stacks -> [H, T, d, Nc] head tiles (sublane split +
        # leading transpose; softmax stays H-leading, v4 pattern)
        def heads(ts):
            return jnp.transpose(jnp.stack(ts).reshape(T, H, d, -1),
                                 (1, 0, 2, 3)).astype(f32)

        q4 = heads(qs)
        k4 = heads(ks)
        v4 = heads(vs)

        cls_lnT = lnT(cls_ref[0].T).astype(dtype)          # [D, 1]
        qkv_cT = jnp.dot(wqkvT_ref[:], cls_lnT,
                         preferred_element_type=f32)       # [3D, 1]
        qc3 = (qkv_cT[:D] + bqT).reshape(H, d, 1) * scale
        kc3 = (qkv_cT[D:2 * D] + bkT).reshape(H, d, 1)
        vc3 = (qkv_cT[2 * D:] + bvT).reshape(H, d, 1)

        @pl.when(c == 0)
        def _init():
            m_scr[...] = jnp.sum(qc3 * kc3, axis=1)        # [H, 1]
            l_scr[...] = jnp.ones_like(l_scr)
            acc_scr[...] = vc3                             # [H, d, 1]

        # ---- per-location time attention (H-leading, v2/v4 math) -----------
        # smv (extraction-only: gated on not save_stats so the train-capable
        # variant stays exact): "clamp"/"cp" replace the per-location
        # (T+1)-sublane max-reduce + broadcast subtract with ONE elementwise
        # min at SMV_CLAMP (exact by shift invariance while every logit <= 70;
        # e^80 and the 13-term denominator both fit f32 — the same safe
        # max-free trick as the v9 space kernel). "cp" additionally rewrites
        # the [H,d,Nc] broadcast divide as reciprocal-multiply (d x fewer
        # VPU divides; two roundings instead of one — bf16-band change).
        clamp = smv in ("clamp", "cp") and not save_stats
        recip = smv == "cp" and not save_stats
        outs_t = []
        for t in range(T):
            qt = q4[:, t]                                  # [H, d, Nc]
            l = jnp.sum(qt[:, None] * k4, axis=2)          # [H, T, Nc]
            cls_l = jnp.sum(qt * kc3, axis=1)[:, None]     # [H, 1, Nc]
            full = jnp.concatenate([cls_l, l], axis=1)     # [H, T+1, Nc]
            if clamp:
                p = jnp.exp(jnp.minimum(full, SMV_CLAMP))
            else:
                m = jnp.max(full, axis=1, keepdims=True)
                p = jnp.exp(full - m)
            denom = jnp.sum(p, axis=1, keepdims=True)
            if clamp:
                denom = denom + SMV_DENOM_GUARD
            out_t = jnp.sum(p[:, 1:][:, :, None] * v4, axis=1)  # [H, d, Nc]
            out_t = out_t + p[:, 0][:, None, :] * vc3
            if recip:
                out_t = out_t * (1.0 / denom)
            else:
                out_t = out_t / denom
            outs_t.append(out_t.astype(dtype).reshape(D, -1))

        # ---- CLS row: online accumulation (all lanes valid: Nc | N) --------
        lc_all = jnp.sum(k4 * qc3[:, None], axis=2)        # [H, T, Nc]
        c_max = jnp.max(jnp.max(lc_all, axis=2), axis=1, keepdims=True)
        m_old = m_scr[...]
        m_new = jnp.maximum(m_old, c_max)                  # [H, 1]
        corr = jnp.exp(m_old - m_new)
        p_c = jnp.exp(lc_all - m_new[..., None])           # [H, T, Nc]
        m_scr[...] = m_new
        l_scr[...] = l_scr[...] * corr \
            + jnp.sum(jnp.sum(p_c, axis=2), axis=1, keepdims=True)
        pv = jnp.sum(v4 * p_c[:, :, None, :], axis=(1, 3))     # [H, d]
        acc_scr[...] = acc_scr[...] * corr[..., None] + pv[..., None]

        # ---- projection + residual (no transpose out) -----------------------
        bprojT = bprojT_ref[:].astype(f32)
        if save_acts and save_attn:
            for t in range(T):
                attnT_ref[0, t] = outs_t[t]
        if mm_group > 1:
            for t0 in range(0, T, mm_group):
                ocat = jnp.concatenate(outs_t[t0:t0 + mm_group], axis=1)
                pw = jnp.dot(wprojT_ref[:], ocat,
                             preferred_element_type=f32)   # [D, g*Nc]
                for i in range(mm_group):
                    o_ref[0, t0 + i] = (xT[t0 + i].astype(f32)
                                        + pw[:, i * Nc:(i + 1) * Nc]
                                        + bprojT).astype(dtype)
        else:
            for t in range(T):
                projT_t = jnp.dot(wprojT_ref[:], outs_t[t],
                                  preferred_element_type=f32) + bprojT
                o_ref[0, t] = (xT[t].astype(f32) + projT_t).astype(dtype)

        @pl.when(c == pl.num_programs(1) - 1)
        def _finalize():
            cls_attT = (acc_scr[...] / l_scr[...][..., None]).reshape(D, 1)
            projcT = jnp.dot(wprojT_ref[:], cls_attT.astype(dtype),
                             preferred_element_type=f32) + bprojT   # [D, 1]
            ocls_ref[0] = (cls_ref[0].astype(f32) + projcT.T).astype(dtype)
            if save_stats:
                lse_ref[0] = (m_scr[...] + jnp.log(l_scr[...])).T  # [1, H]
                acls_ref[0] = cls_attT                     # [D, 1] fp32

    return kernel


def fused_time_attention_block_v7(xT, cls, ln_scale, ln_bias, wqkv, bqkv,
                                  wproj, bproj, num_heads: int,
                                  chunk: int | None = None,
                                  save_stats: bool = False,
                                  save_acts: bool = False,
                                  save_attn: bool = True,
                                  mm_group: int = 1,
                                  smv: str | None = None,
                                  interpret: bool = False):
    """d-major time sub-path incl. residual. xT: [B,T,D,N]; cls: [B,1,D].
    chunk must divide N (defaults to N if it does not) — padded lanes must
    never reach the downstream space kernel. Returns (oT, ocls); with
    save_stats+save_acts also (lse, aclsT, qT, kT, vT, attnT).

    mm_group > 1 (requires mm_group | T): the per-frame qkv/proj matmuls
    run on mm_group frames lane-concatenated ([3D,D]@[D,g*Nc]) — larger
    lane tiles at a smaller pad (see kernel note; extraction fast path).

    smv: per-location softmax variant, TVTS_TIME_SMV env default —
    "base" (exact max-shift), "clamp" (max-free min-at-SMV_CLAMP=70, exact
    while every logit <= 70), "cp" (clamp + reciprocal-multiply normalize).
    Applies ONLY when save_stats=False (the extraction path); the
    train-capable save_stats variant always runs the exact base math."""
    if smv is None:
        smv = os.environ.get("TVTS_TIME_SMV", "cp")
    B, T, D, N = xT.shape
    H = num_heads
    d = D // H
    if chunk is None or N % chunk != 0:
        chunk = N
    if mm_group > 1 and T % mm_group:
        mm_group = 1

    chunkT_spec = pl.BlockSpec((1, T, D, chunk), lambda b, c: (b, 0, 0, c),
                               memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b, c: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    vecT_spec = pl.BlockSpec((D, 1), lambda b, c: (0, 0),
                             memory_space=pltpu.VMEM)
    wqkvT_spec = pl.BlockSpec((3 * D, D), lambda b, c: (0, 0),
                              memory_space=pltpu.VMEM)
    wprojT_spec = pl.BlockSpec((D, D), lambda b, c: (0, 0),
                               memory_space=pltpu.VMEM)

    out_specs = [chunkT_spec, cls_spec]
    out_shape = [jax.ShapeDtypeStruct((B, T, D, N), xT.dtype),
                 jax.ShapeDtypeStruct((B, 1, D), xT.dtype)]
    if save_stats:
        out_specs += [pl.BlockSpec((1, 1, H), lambda b, c: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, D, 1), lambda b, c: (b, 0, 0),
                                   memory_space=pltpu.VMEM)]
        out_shape += [jax.ShapeDtypeStruct((B, 1, H), jnp.float32),
                      jax.ShapeDtypeStruct((B, D, 1), jnp.float32)]
        if save_acts:
            n_acts = 4 if save_attn else 3
            out_specs += [chunkT_spec] * n_acts
            out_shape += [jax.ShapeDtypeStruct((B, T, D, N),
                                               xT.dtype)] * n_acts

    b3 = bqkv.reshape(3, D)
    outs = pl.pallas_call(
        _make_time_block_kernel_v7(H, T, save_stats, save_acts, save_attn,
                                   mm_group, smv),
        grid=(B, N // chunk),
        in_specs=[chunkT_spec, cls_spec, vecT_spec, vecT_spec, wqkvT_spec,
                  vecT_spec, vecT_spec, vecT_spec, wprojT_spec, vecT_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, d, 1), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(xT, cls, ln_scale.reshape(D, 1), ln_bias.reshape(D, 1),
      wqkv.T, b3[0].reshape(D, 1), b3[1].reshape(D, 1), b3[2].reshape(D, 1),
      wproj.T, bproj.reshape(D, 1))
    return outs


def _make_mlp_kernel_v7(act: str, save_h: bool = False, fpp: int = 1):
    def kernel(x_ref, cls_ref, ln_sT_ref, ln_bT_ref, wfcT_ref, bfcT_ref,
               wprT_ref, bprT_ref, o_ref, ocls_ref, *rest):
        """Grid (B, T // fpp). x/o blocks [1, fpp, D, N] (d-major); cls
        handled at t == 0. o = x + c_projT(act(c_fcT(lnT(x)))). With save_h
        (fpp == 1 only) the PRE-activation hidden ([B,T,4D,N] + [B,4D,1]
        CLS) comes back for the v7 backward (the XLA-MLP strategy: reuse
        saved hiddens instead of recomputing the fc matmul)."""
        if save_h:
            h_ref, hcls_ref = rest
        f32 = jnp.float32
        dtype = o_ref.dtype
        lnT = _lnT_fn(ln_sT_ref[:].astype(f32), ln_bT_ref[:].astype(f32))
        bfcT = bfcT_ref[:].astype(f32)                     # [4D, 1]
        bprT = bprT_ref[:].astype(f32)                     # [D, 1]

        def mlpT(tT):             # [D, n] -> (out [D, n] f32, h_pre bf16)
            y = lnT(tT).astype(dtype)
            h_pre = (jnp.dot(wfcT_ref[:], y, preferred_element_type=f32)
                     + bfcT).astype(dtype)
            h = h_pre.astype(f32)
            if act == "quick_gelu":
                h = h * jax.nn.sigmoid(1.702 * h)
            else:
                h = 0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))
            out = jnp.dot(wprT_ref[:], h.astype(dtype),
                          preferred_element_type=f32) + bprT
            return tT.astype(f32) + out, h_pre

        if fpp == 1:
            out, h_pre = mlpT(x_ref[0, 0])
            o_ref[0, 0] = out.astype(dtype)
            if save_h:
                h_ref[0, 0] = h_pre
        else:
            # fpp frames lane-concatenated into ONE [D, fpp*N] fc/proj pair:
            # fpp=3 turns the 196 -> 256 lane pad (30.6%) into 588 -> 640
            # (8.8%) — measured 66.9 -> 57.1 ms per 12-block chain at B=32
            # (tools/time_split_probe.py, PERF.md round 4). LN is per-column
            # so it commutes with the concat; math per column is identical.
            xg = x_ref[0]                                  # [fpp, D, N]
            N = xg.shape[2]
            ycat = jnp.concatenate([lnT(xg[i]).astype(dtype)
                                    for i in range(fpp)], axis=1)
            h_pre = (jnp.dot(wfcT_ref[:], ycat, preferred_element_type=f32)
                     + bfcT).astype(dtype)
            h = h_pre.astype(f32)
            if act == "quick_gelu":
                h = h * jax.nn.sigmoid(1.702 * h)
            else:
                h = 0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))
            out = jnp.dot(wprT_ref[:], h.astype(dtype),
                          preferred_element_type=f32)      # [D, fpp*N]
            for i in range(fpp):
                o_ref[0, i] = (xg[i].astype(f32)
                               + out[:, i * N:(i + 1) * N]
                               + bprT).astype(dtype)

        @pl.when(pl.program_id(1) == 0)
        def _cls():
            out_c, h_c = mlpT(cls_ref[0].T)
            ocls_ref[0] = out_c.T.astype(dtype)
            if save_h:
                hcls_ref[0] = h_c

    return kernel


def fused_mlp_block_v7(xT, cls, ln_scale, ln_bias, wfc, bfc, wproj, bproj,
                       act: str = "quick_gelu", save_h: bool = False,
                       fpp: int = 1,
                       interpret: bool = False):
    """d-major MLP sub-path incl. residual. xT: [B,T,D,N]; cls: [B,1,D].
    Returns (oT, ocls); with save_h also (h [B,T,4D,N], hcls [B,4D,1]) —
    the pre-activation hiddens for the v7 backward.

    fpp > 1 (extraction fast path; requires save_h=False and fpp | T):
    each program lane-concatenates fpp frames into one [D, fpp*N] fc/proj
    pair — larger matmul lane tiles at a smaller pad (see kernel note)."""
    B, T, D, N = xT.shape
    hidden = wfc.shape[1]
    if fpp > 1 and (save_h or T % fpp):
        fpp = 1

    frameT_spec = pl.BlockSpec((1, fpp, D, N),
                               lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    vecT_spec = pl.BlockSpec((D, 1), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    hvecT_spec = pl.BlockSpec((hidden, 1), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    wfcT_spec = pl.BlockSpec((hidden, D), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    wprT_spec = pl.BlockSpec((D, hidden), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)

    out_specs = [frameT_spec, cls_spec]
    out_shape = [jax.ShapeDtypeStruct((B, T, D, N), xT.dtype),
                 jax.ShapeDtypeStruct((B, 1, D), xT.dtype)]
    if save_h:
        out_specs += [pl.BlockSpec((1, 1, hidden, N), lambda b, t: (b, t, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, hidden, 1), lambda b, t: (b, 0, 0),
                                   memory_space=pltpu.VMEM)]
        out_shape += [jax.ShapeDtypeStruct((B, T, hidden, N), xT.dtype),
                      jax.ShapeDtypeStruct((B, hidden, 1), xT.dtype)]

    outs = pl.pallas_call(
        _make_mlp_kernel_v7(act, save_h, fpp),
        grid=(B, T // fpp),
        in_specs=[frameT_spec, cls_spec, vecT_spec, vecT_spec, wfcT_spec,
                  hvecT_spec, wprT_spec, vecT_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(xT, cls, ln_scale.reshape(D, 1), ln_bias.reshape(D, 1), wfc.T,
      bfc.reshape(hidden, 1), wproj.T, bproj.reshape(D, 1))
    return outs


def fused_block_v6(x, params_block, num_frames: int, patches_per_frame: int,
                   num_heads: int, act: str = "quick_gelu",
                   mlp_chunk: int = 512, dtype=jnp.bfloat16,
                   interpret: bool = False):
    """One whole SpaceTimeBlock (time + space + MLP, residuals folded) as one
    Pallas call. params_block is the standard `blocks_i` param subtree."""
    B, S, D = x.shape
    T, N = num_frames, patches_per_frame
    H = num_heads
    assert S == 1 + T * N
    bp = params_block

    x_cls = x[:, :1]
    x_p = x[:, 1:].reshape(B, T, N, D)

    clip_spec = pl.BlockSpec((1, T, N, D), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    vecT_spec = pl.BlockSpec((D, 1), lambda b: (0, 0),
                             memory_space=pltpu.VMEM)
    wqkvT_spec = pl.BlockSpec((3 * D, D), lambda b: (0, 0),
                              memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((D, 3 * D), lambda b: (0, 0),
                             memory_space=pltpu.VMEM)
    wDD_spec = pl.BlockSpec((D, D), lambda b: (0, 0),
                            memory_space=pltpu.VMEM)
    hidden = bp["mlp"]["c_fc"]["kernel"].shape[1]
    wfc_spec = pl.BlockSpec((D, hidden), lambda b: (0, 0),
                            memory_space=pltpu.VMEM)
    wpr_spec = pl.BlockSpec((hidden, D), lambda b: (0, 0),
                            memory_space=pltpu.VMEM)
    hvec_spec = pl.BlockSpec((1, hidden), lambda b: (0, 0),
                             memory_space=pltpu.VMEM)

    tb3 = bp["timeattn"]["qkv"]["bias"].astype(dtype).reshape(3, D)
    sb3 = bp["attn"]["qkv"]["bias"].astype(dtype).reshape(3, D)
    out_p, out_cls = pl.pallas_call(
        _make_block_kernel_v6(H, T, N, act, mlp_chunk),
        grid=(B,),
        in_specs=[clip_spec, cls_spec,
                  vec_spec, vec_spec, wqkvT_spec, vecT_spec, vecT_spec,
                  vecT_spec, wDD_spec, vecT_spec,
                  vec_spec, vec_spec, wqkv_spec, vec_spec, vec_spec, vec_spec,
                  wDD_spec, vec_spec,
                  vec_spec, vec_spec, wfc_spec, hvec_spec, wpr_spec, vec_spec],
        out_specs=(clip_spec, cls_spec),
        out_shape=(jax.ShapeDtypeStruct((B, T, N, D), x.dtype),
                   jax.ShapeDtypeStruct((B, 1, D), x.dtype)),
        compiler_params=_compiler_params(110),
        interpret=interpret,
    )(x_p, x_cls,
      bp["ln_3"]["scale"].reshape(1, D), bp["ln_3"]["bias"].reshape(1, D),
      bp["timeattn"]["qkv"]["kernel"].astype(dtype).T,
      tb3[0].reshape(D, 1), tb3[1].reshape(D, 1), tb3[2].reshape(D, 1),
      bp["timeattn"]["proj"]["kernel"].astype(dtype).T,
      bp["timeattn"]["proj"]["bias"].astype(dtype).reshape(D, 1),
      bp["ln_1"]["scale"].reshape(1, D), bp["ln_1"]["bias"].reshape(1, D),
      bp["attn"]["qkv"]["kernel"].astype(dtype),
      sb3[0:1], sb3[1:2], sb3[2:3],
      bp["attn"]["proj"]["kernel"].astype(dtype),
      bp["attn"]["proj"]["bias"].astype(dtype).reshape(1, D),
      bp["ln_2"]["scale"].reshape(1, D), bp["ln_2"]["bias"].reshape(1, D),
      bp["mlp"]["c_fc"]["kernel"].astype(dtype),
      bp["mlp"]["c_fc"]["bias"].astype(dtype).reshape(1, hidden),
      bp["mlp"]["c_proj"]["kernel"].astype(dtype),
      bp["mlp"]["c_proj"]["bias"].astype(dtype).reshape(1, D))
    return jnp.concatenate([out_cls, out_p.reshape(B, T * N, D)], axis=1)


def _make_space_block_kernel_v9(H: int, FPP: int, save_stats: bool = False,
                                save_acts: bool = False,
                                save_probs: bool = False,
                                row_io: bool = False,
                                wide_mm: bool = False,
                                smv: str = "base"):
    def kernel(x_ref, base_ref, cls_ref, basecls_ref, ln_sT_ref, ln_bT_ref,
               wqkvT_ref, bqT_ref, bkT_ref, bvT_ref, wprojT_ref, bprojT_ref,
               o_ref, ocls_ref, *rest):
        if save_stats and save_acts and save_probs:
            (lse_ref, acls_ref, qT_ref, kT_ref, vT_ref,
             p_ref, pcls_ref, den_ref, m_scr, l_scr, acc_scr) = rest
        elif save_stats and save_acts:
            (lse_ref, acls_ref, qT_ref, kT_ref, vT_ref,
             m_scr, l_scr, acc_scr) = rest
        elif save_stats:
            lse_ref, acls_ref, m_scr, l_scr, acc_scr = rest
        else:
            m_scr, l_scr, acc_scr = rest
        """v7 space kernel with FPP frames per program: the per-head
        attention dot_generals batch over [FPP*H] (frame, head) pairs —
        more batch elements per MXU instruction at the same lane width
        (the mxu_lane_probe showed d=64 batched rates rise with batch
        count). Grid (B, T // FPP), t minor; blocks [1, FPP, D, N]
        (row_io: [1, FPP, N, D] with per-frame in-kernel transposes)."""
        D = ln_sT_ref.shape[0]
        d = D // H
        t = pl.program_id(1)
        dtype = o_ref.dtype
        f32 = jnp.float32

        bqT = bqT_ref[:].astype(f32)                       # [D, 1]
        bkT = bkT_ref[:].astype(f32)
        bvT = bvT_ref[:].astype(f32)
        bprojT = bprojT_ref[:].astype(f32)
        scale = jnp.asarray(d, f32) ** -0.5
        lnT = _lnT_fn(ln_sT_ref[:].astype(f32), ln_bT_ref[:].astype(f32))

        clsT = cls_ref[0].T                                # [D, 1]
        cls_lnT = lnT(clsT).astype(dtype)
        qkv_cT = jnp.dot(wqkvT_ref[:], cls_lnT,
                         preferred_element_type=f32)       # [3D, 1]
        qc3 = ((qkv_cT[:D] + bqT) * scale).reshape(H, d, 1)
        kc3 = (qkv_cT[D:2 * D] + bkT).reshape(H, d, 1)
        vc3 = (qkv_cT[2 * D:] + bvT).reshape(H, d, 1)

        @pl.when(t == 0)
        def _init():
            m_scr[...] = jnp.sum(qc3 * kc3, axis=1)        # [H, 1]
            l_scr[...] = jnp.ones_like(l_scr)
            acc_scr[...] = vc3                             # [H, d, 1]

        # per-frame qkv projections; head tiles collected as [FPP, H, d, N]
        qs, ks, vs = [], [], []
        if wide_mm:
            # FPP frames lane-concatenated into ONE [3D,D]@[D,FPP*N] qkv
            # matmul (the round-4 mm_group trick: at FPP=3 the 196 -> 256
            # lane pad drops to 588 -> 640; see the time kernel note)
            xcat = jnp.concatenate(
                [lnT(x_ref[0, f].T if row_io else x_ref[0, f]).astype(dtype)
                 for f in range(FPP)], axis=1)             # [D, FPP*N]
            Nw = xcat.shape[1] // FPP
            qkvW = jnp.dot(wqkvT_ref[:], xcat,
                           preferred_element_type=f32)     # [3D, FPP*N]
            for f in range(FPP):
                qkvT = qkvW[:, f * Nw:(f + 1) * Nw]
                qs.append(((qkvT[:D] + bqT) * scale).astype(dtype))
                ks.append((qkvT[D:2 * D] + bkT).astype(dtype))
                vs.append((qkvT[2 * D:] + bvT).astype(dtype))
        else:
            for f in range(FPP):
                xT_f = x_ref[0, f].T if row_io else x_ref[0, f]
                x_lnT = lnT(xT_f).astype(dtype)            # [D, N]
                qkvT = jnp.dot(wqkvT_ref[:], x_lnT,
                               preferred_element_type=f32)  # [3D, N]
                qs.append(((qkvT[:D] + bqT) * scale).astype(dtype))
                ks.append((qkvT[D:2 * D] + bkT).astype(dtype))
                vs.append((qkvT[2 * D:] + bvT).astype(dtype))
        if save_acts:
            for f in range(FPP):
                qT_ref[0, f] = qs[f]
                kT_ref[0, f] = ks[f]
                vT_ref[0, f] = vs[f]

        def heads(ts):                                     # FPP x [D, N]
            return jnp.stack(ts).reshape(FPP * H, d, -1)

        q3 = heads(qs)                                     # [FPP*H, d, N]
        k3 = heads(ks)
        v3 = heads(vs)
        CONTRACT_D = (((1,), (1,)), ((0,), (0,)))          # over head dim d
        CONTRACT_NK = (((2,), (2,)), ((0,), (0,)))         # over key lanes

        kcB = jnp.concatenate([kc3] * FPP, axis=0)         # [FPP*H, d, 1]
        vcB = jnp.concatenate([vc3] * FPP, axis=0)

        logits = jax.lax.dot_general(q3, k3, CONTRACT_D,
                                     preferred_element_type=f32)
        cls_l = jnp.sum(q3.astype(f32) * kcB, axis=1)      # [FPP*H, Nq]
        if smv in ("shift", "sd") and not save_probs:
            # timing probe: constant shift instead of the per-row lane
            # max-reduce (softmax is shift-invariant; unsafe only if
            # logits can overflow exp — measurement, not a default)
            m = jnp.zeros_like(cls_l)
            p = jnp.exp(logits - m[..., None])
            p_cls = jnp.exp(cls_l - m)
        elif smv in ("clamp", "cd", "cp", "cpr") and not save_probs:
            # max-FREE safe softmax: shift-invariance means any constant
            # shift is exact as long as NOTHING downstream overflows f32;
            # clamping the f32 logits at SMV_CLAMP (70 — see the constant's
            # derivation: the p@v numerator, not exp itself, is the binding
            # bound) replaces the per-row lane max-reduce + broadcast
            # subtract with ONE elementwise min. Bit-exact vs the shifted
            # form whenever every logit <= SMV_CLAMP; above that, rows
            # saturate gracefully instead of going non-finite.
            p = jnp.exp(jnp.minimum(logits, SMV_CLAMP))
            p_cls = jnp.exp(jnp.minimum(cls_l, SMV_CLAMP))
        else:
            m = jnp.maximum(jnp.max(logits, axis=-1), cls_l)
            p = jnp.exp(logits - m[..., None])
            p_cls = jnp.exp(cls_l - m)
        if smv in ("pvones", "densdot", "sd", "cd", "cp", "cpr"):
            # MXU-offloaded denominator: the sum over the N^2 probs rides
            # the matrix unit instead of a VPU lane-reduce pass.  With
            # save_probs the MXU denominator is what gets SAVED, so the
            # backward's saved-p/saved-den normalization stays consistent.
            pb = p.astype(dtype)
            ones_row = jnp.ones((FPP * H, 1, pb.shape[-1]), dtype)
            if smv in ("pvones", "cp", "cpr"):
                # ones row appended to v: the p@v dot's extra output row IS
                # sum_k p (pays the d -> d+1 sublane pad on the dot)
                v3a = jnp.concatenate([v3, ones_row], axis=1)
                oT3a = jax.lax.dot_general(v3a, pb, CONTRACT_NK,
                                           preferred_element_type=f32)
                oT3 = oT3a[:, :d, :]
                den3 = oT3a[:, d:, :]                      # [FPP*H, 1, Nq]
            else:
                # separate ones@p batched dot (tiny FLOPs, streams p once)
                den3 = jax.lax.dot_general(ones_row, pb, CONTRACT_NK,
                                           preferred_element_type=f32)
                oT3 = jax.lax.dot_general(v3, pb, CONTRACT_NK,
                                          preferred_element_type=f32)
            denom3 = den3 + p_cls[:, None, :]
            if smv in ("cd", "cp", "cpr") and not save_probs:
                # clamped rows only (the save_probs training forward took the
                # exact max-shift branch above, where denom >= 1 always);
                # rounds away unless the whole row underflowed
                denom3 = denom3 + SMV_DENOM_GUARD
            if save_probs:
                N_ = p.shape[-1]
                p_ref[0] = pb.reshape(FPP, H, -1, N_)
                pcls_ref[0] = p_cls.reshape(FPP, H, -1)
                den_ref[0] = denom3[:, 0, :].reshape(FPP, H, -1)
            if smv == "cpr" and not save_probs:
                # "cpr" = cp + reciprocal-multiply normalize: one [.,1,Nq]
                # reciprocal broadcast-multiplied over d sublanes instead of
                # d VPU divides per lane (two roundings — bf16-band change)
                oT3 = (oT3 + vcB * p_cls[:, None, :]) * (1.0 / denom3)
            else:
                oT3 = (oT3 + vcB * p_cls[:, None, :]) / denom3
        else:
            denom = jnp.sum(p, axis=-1) + p_cls
            if smv == "clamp" and not save_probs:
                denom = denom + SMV_DENOM_GUARD
            if save_probs:
                N_ = p.shape[-1]
                p_ref[0] = p.astype(dtype).reshape(FPP, H, -1, N_)
                pcls_ref[0] = p_cls.reshape(FPP, H, -1)
                den_ref[0] = denom.reshape(FPP, H, -1)
            oT3 = jax.lax.dot_general(v3, p.astype(dtype), CONTRACT_NK,
                                      preferred_element_type=f32)
            oT3 = (oT3 + vcB * p_cls[:, None, :]) / denom[:, None, :]
        attn_all = oT3.astype(dtype).reshape(FPP, D, -1)   # leading split

        if wide_mm:
            ocat = jnp.concatenate([attn_all[f] for f in range(FPP)],
                                   axis=1)                 # [D, FPP*N]
            Nw = ocat.shape[1] // FPP
            projW = jnp.dot(wprojT_ref[:], ocat,
                            preferred_element_type=f32)
            for f in range(FPP):
                projT = projW[:, f * Nw:(f + 1) * Nw] + bprojT
                if row_io:
                    o_ref[0, f] = (base_ref[0, f].astype(f32)
                                   + projT.T).astype(dtype)
                else:
                    o_ref[0, f] = (base_ref[0, f].astype(f32)
                                   + projT).astype(dtype)
        else:
            for f in range(FPP):
                projT = jnp.dot(wprojT_ref[:], attn_all[f],
                                preferred_element_type=f32) + bprojT
                if row_io:
                    o_ref[0, f] = (base_ref[0, f].astype(f32)
                                   + projT.T).astype(dtype)
                else:
                    o_ref[0, f] = (base_ref[0, f].astype(f32)
                                   + projT).astype(dtype)

        # CLS row: online accumulation over this program's FPP frames
        qcB = jnp.concatenate([qc3] * FPP, axis=0)         # [FPP*H, d, 1]
        lcB = jnp.sum(k3.astype(f32) * qcB, axis=1)        # [FPP*H, Nk]
        c_max = jnp.max(lcB, axis=1, keepdims=True)        # [FPP*H, 1]
        m_old = m_scr[...]
        # fold FPP frames sequentially into the [H, 1] online state
        for f in range(FPP):
            lc = lcB[f * H:(f + 1) * H]                    # [H, Nk]
            cm = c_max[f * H:(f + 1) * H]
            m_new = jnp.maximum(m_old, cm)
            corr = jnp.exp(m_old - m_new)
            p_c = jnp.exp(lc - m_new)
            l_new = (l_scr[...] if f == 0 else l_acc) * corr \
                + jnp.sum(p_c, axis=1, keepdims=True)
            pv = jnp.sum(v3[f * H:(f + 1) * H].astype(f32)
                         * p_c[:, None, :], axis=2, keepdims=True)
            a_new = (acc_scr[...] if f == 0 else a_acc) * corr[..., None] + pv
            m_old, l_acc, a_acc = m_new, l_new, a_new
        m_scr[...] = m_old
        l_scr[...] = l_acc
        acc_scr[...] = a_acc

        @pl.when(t == pl.num_programs(1) - 1)
        def _finalize():
            cls_attT = (acc_scr[...] / l_scr[...][..., None]).reshape(D, 1)
            projcT = jnp.dot(wprojT_ref[:], cls_attT.astype(dtype),
                             preferred_element_type=f32) + bprojT  # [D, 1]
            ocls_ref[0] = (basecls_ref[0].astype(f32) + projcT.T).astype(dtype)
            if save_stats:
                lse_ref[0] = (m_scr[...] + jnp.log(l_scr[...])).T  # [1, H]
                acls_ref[0] = cls_attT                     # [D, 1] fp32

    return kernel


def fused_space_attention_block_v9(xT, baseT, cls, basecls, ln_scale, ln_bias,
                                   wqkv, bqkv, wproj, bproj, num_heads: int,
                                   fpp: int = 2, save_stats: bool = False,
                                   save_acts: bool = False,
                                   save_probs: bool = False,
                                   wide_mm: bool = False,
                                   smv: str | None = None,
                                   interpret: bool = False):
    """v7 space sub-path with fpp frames per program (batched [fpp*H]
    attention dot_generals). Same I/O contract as
    fused_space_attention_block_v7; fpp must divide T.

    wide_mm: the per-frame qkv/proj matmuls run on the program's fpp frames
    lane-concatenated (round-4 mm_group trick — pays off at fpp 3/6 where
    the lane pad drops to 8.8%).

    smv: softmax-variant knob (TVTS_V9_SMV env default) — "base",
    "densdot"/"pvones" (denominator summed on the MXU instead of a VPU
    lane-reduce), "clamp" (max-free softmax via the SMV_CLAMP=70 logit clamp —
    exact below the f32 exp-overflow margin), "cd"/"cp" (clamp +
    densdot/pvones), "cpr" (cp + reciprocal-multiply normalize — d x fewer
    VPU divides), "shift"/"sd" (timing probes: no max-reduce at all,
    unsafe for large logits)."""
    if smv is None:
        smv = os.environ.get("TVTS_V9_SMV", "cp")  # round-4 default: clamp+pvones (PERF.md)
    B, T, D, N = xT.shape
    H = num_heads
    d = D // H
    assert T % fpp == 0, (T, fpp)

    groupT_spec = pl.BlockSpec((1, fpp, D, N), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    vecT_spec = pl.BlockSpec((D, 1), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    wqkvT_spec = pl.BlockSpec((3 * D, D), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    wprojT_spec = pl.BlockSpec((D, D), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM)

    out_specs = [groupT_spec, cls_spec]
    out_shape = [jax.ShapeDtypeStruct((B, T, D, N), xT.dtype),
                 jax.ShapeDtypeStruct((B, 1, D), xT.dtype)]
    if save_stats:
        out_specs += [pl.BlockSpec((1, 1, H), lambda b, t: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, D, 1), lambda b, t: (b, 0, 0),
                                   memory_space=pltpu.VMEM)]
        out_shape += [jax.ShapeDtypeStruct((B, 1, H), jnp.float32),
                      jax.ShapeDtypeStruct((B, D, 1), jnp.float32)]
        if save_acts:
            out_specs += [groupT_spec] * 3
            out_shape += [jax.ShapeDtypeStruct((B, T, D, N), xT.dtype)] * 3
            if save_probs:
                out_specs += [
                    pl.BlockSpec((1, fpp, H, N, N),
                                 lambda b, t: (b, t, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, fpp, H, N),
                                 lambda b, t: (b, t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, fpp, H, N),
                                 lambda b, t: (b, t, 0, 0),
                                 memory_space=pltpu.VMEM)]
                out_shape += [
                    jax.ShapeDtypeStruct((B, T, H, N, N), xT.dtype),
                    jax.ShapeDtypeStruct((B, T, H, N), jnp.float32),
                    jax.ShapeDtypeStruct((B, T, H, N), jnp.float32)]

    b3 = bqkv.reshape(3, D)
    outs = pl.pallas_call(
        _make_space_block_kernel_v9(H, fpp, save_stats, save_acts,
                                    save_probs, wide_mm=wide_mm, smv=smv),
        grid=(B, T // fpp),
        in_specs=[groupT_spec, groupT_spec, cls_spec, cls_spec, vecT_spec,
                  vecT_spec, wqkvT_spec, vecT_spec, vecT_spec, vecT_spec,
                  wprojT_spec, vecT_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, d, 1), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(xT, baseT, cls, basecls, ln_scale.reshape(D, 1), ln_bias.reshape(D, 1),
      wqkv.T, b3[0].reshape(D, 1), b3[1].reshape(D, 1), b3[2].reshape(D, 1),
      wproj.T, bproj.reshape(D, 1))
    if save_stats:
        return outs
    oT, ocls = outs
    return oT, ocls


def fused_space_attention_block_v10(x, base, ln_scale, ln_bias, wqkv, bqkv,
                                    wproj, bproj, num_frames: int,
                                    patches_per_frame: int, num_heads: int,
                                    fpp: int = 2, save_stats: bool = False,
                                    save_acts: bool = False,
                                    save_probs: bool = False,
                                    wide_mm: bool = False,
                                    smv: str | None = None,
                                    interpret: bool = False):
    """v9 FPP-frame-batched space kernel with ROW-major tower I/O (the v3
    sub-path contract: x/base [B, 1+T*N, D]); the per-frame [N,D]<->[D,N]
    transposes happen in-kernel (v3 style). Saved activations stay d-major
    for the v10 backward. smv: softmax-variant knob (see the v9 wrapper)."""
    if smv is None:
        # TRAIN default is pvones, not cp: the clamp-at-SMV_CLAMP shift is
        # exact only while every logit <= 70 — true for inference-scale weights,
        # but training weights evolve, so the train path keeps the exact
        # max-shift + MXU denominator (PERF.md round 4).
        smv = os.environ.get("TVTS_V9_SMV", "pvones")
    B, S, D = x.shape
    T, N = num_frames, patches_per_frame
    H = num_heads
    d = D // H
    assert S == 1 + T * N and T % fpp == 0

    x_cls = x[:, :1]
    x_p = x[:, 1:].reshape(B, T, N, D)
    base_cls = base[:, :1]
    base_p = base[:, 1:].reshape(B, T, N, D)

    group_spec = pl.BlockSpec((1, fpp, N, D), lambda b, t: (b, t, 0, 0),
                              memory_space=pltpu.VMEM)
    groupT_spec = pl.BlockSpec((1, fpp, D, N), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    vecT_spec = pl.BlockSpec((D, 1), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    wqkvT_spec = pl.BlockSpec((3 * D, D), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    wprojT_spec = pl.BlockSpec((D, D), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM)

    out_specs = [group_spec, cls_spec]
    out_shape = [jax.ShapeDtypeStruct((B, T, N, D), x.dtype),
                 jax.ShapeDtypeStruct((B, 1, D), x.dtype)]
    if save_stats:
        out_specs += [pl.BlockSpec((1, 1, H), lambda b, t: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, D, 1), lambda b, t: (b, 0, 0),
                                   memory_space=pltpu.VMEM)]
        out_shape += [jax.ShapeDtypeStruct((B, 1, H), jnp.float32),
                      jax.ShapeDtypeStruct((B, D, 1), jnp.float32)]
        if save_acts:
            out_specs += [groupT_spec] * 3
            out_shape += [jax.ShapeDtypeStruct((B, T, D, N), x.dtype)] * 3
            if save_probs:
                out_specs += [
                    pl.BlockSpec((1, fpp, H, N, N),
                                 lambda b, t: (b, t, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, fpp, H, N),
                                 lambda b, t: (b, t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, fpp, H, N),
                                 lambda b, t: (b, t, 0, 0),
                                 memory_space=pltpu.VMEM)]
                out_shape += [
                    jax.ShapeDtypeStruct((B, T, H, N, N), x.dtype),
                    jax.ShapeDtypeStruct((B, T, H, N), jnp.float32),
                    jax.ShapeDtypeStruct((B, T, H, N), jnp.float32)]

    b3 = bqkv.reshape(3, D)
    outs = pl.pallas_call(
        _make_space_block_kernel_v9(H, fpp, save_stats, save_acts,
                                    save_probs, row_io=True,
                                    wide_mm=wide_mm, smv=smv),
        grid=(B, T // fpp),
        in_specs=[group_spec, group_spec, cls_spec, cls_spec, vecT_spec,
                  vecT_spec, wqkvT_spec, vecT_spec, vecT_spec, vecT_spec,
                  wprojT_spec, vecT_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, d, 1), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x_p, base_p, x_cls, base_cls, ln_scale.reshape(D, 1),
      ln_bias.reshape(D, 1), wqkv.T, b3[0].reshape(D, 1),
      b3[1].reshape(D, 1), b3[2].reshape(D, 1), wproj.T, bproj.reshape(D, 1))
    out = jnp.concatenate([outs[1], outs[0].reshape(B, T * N, D)], axis=1)
    if save_stats:
        return (out,) + tuple(outs[2:])
    return out


def _make_space_cls_kernel_v7(H: int):
    def kernel(x_ref, cls_ref, basecls_ref, ln_sT_ref, ln_bT_ref,
               wqkvT_ref, bqT_ref, bkT_ref, bvT_ref, wprojT_ref, bprojT_ref,
               ocls_ref, m_scr, l_scr, acc_scr):
        """CLS-ONLY space sub-path (extraction tail): when only the pooled
        CLS embedding is consumed, the LAST block's per-frame attention
        outputs are dead — this kernel computes just the CLS global row
        (k/v of every frame + online softmax), skipping the per-frame
        q/logits/softmax/probs@v/projection entirely. Grid (B, T)."""
        D = ln_sT_ref.shape[0]
        d = D // H
        t = pl.program_id(1)
        dtype = ocls_ref.dtype
        f32 = jnp.float32

        bqT = bqT_ref[:].astype(f32)
        bkT = bkT_ref[:].astype(f32)
        bvT = bvT_ref[:].astype(f32)
        scale = jnp.asarray(d, f32) ** -0.5
        lnT = _lnT_fn(ln_sT_ref[:].astype(f32), ln_bT_ref[:].astype(f32))

        clsT = cls_ref[0].T                                # [D, 1]
        cls_lnT = lnT(clsT).astype(dtype)
        qkv_cT = jnp.dot(wqkvT_ref[:], cls_lnT,
                         preferred_element_type=f32)       # [3D, 1]
        qc3 = ((qkv_cT[:D] + bqT) * scale).reshape(H, d, 1)
        kc3 = (qkv_cT[D:2 * D] + bkT).reshape(H, d, 1)
        vc3 = (qkv_cT[2 * D:] + bvT).reshape(H, d, 1)

        @pl.when(t == 0)
        def _init():
            m_scr[...] = jnp.sum(qc3 * kc3, axis=1)        # [H, 1]
            l_scr[...] = jnp.ones_like(l_scr)
            acc_scr[...] = vc3

        x_lnT = lnT(x_ref[0, 0]).astype(dtype)             # [D, N]
        # only k/v needed (no per-frame queries)
        kvT = jnp.dot(wqkvT_ref[D:], x_lnT,
                      preferred_element_type=f32)          # [2D, N]
        k3 = (kvT[:D] + bkT).astype(f32).reshape(H, d, -1)
        v3 = (kvT[D:] + bvT).astype(f32).reshape(H, d, -1)

        lc = jnp.sum(k3 * qc3, axis=1)                     # [H, Nk]
        c_max = jnp.max(lc, axis=1, keepdims=True)
        m_old = m_scr[...]
        m_new = jnp.maximum(m_old, c_max)
        corr = jnp.exp(m_old - m_new)
        p_c = jnp.exp(lc - m_new)
        m_scr[...] = m_new
        l_scr[...] = l_scr[...] * corr + jnp.sum(p_c, axis=1, keepdims=True)
        pv = jnp.sum(v3 * p_c[:, None, :], axis=2, keepdims=True)
        acc_scr[...] = acc_scr[...] * corr[..., None] + pv

        @pl.when(t == pl.num_programs(1) - 1)
        def _finalize():
            cls_attT = (acc_scr[...] / l_scr[...][..., None]).reshape(D, 1)
            projcT = jnp.dot(wprojT_ref[:], cls_attT.astype(dtype),
                             preferred_element_type=f32) \
                + bprojT_ref[:].astype(f32)                # [D, 1]
            ocls_ref[0] = (basecls_ref[0].astype(f32) + projcT.T).astype(dtype)

    return kernel


def _make_space_cls_kernel_v2(H: int):
    def kernel(x_ref, cls_ref, basecls_ref, ln_s_ref, ln_b_ref,
               wqkv_ref, bq_ref, bk_ref, bv_ref, wproj_ref, bproj_ref,
               ocls_ref, m_scr, l_scr, acc_scr):
        """ROW-MAJOR CLS-only space sub-path (extraction tail for the v2/v4
        tower, e.g. B/32's N=49 geometry where the d-major tower loses):
        computes only the CLS global attention row (k/v of every frame +
        per-head online softmax in scratch), skipping the per-frame
        q/logits/probs@v/projection entirely. Grid (B, T)."""
        D = x_ref.shape[3]
        d = D // H
        t = pl.program_id(1)
        dtype = ocls_ref.dtype

        layernorm = _ln_fn(ln_s_ref[0].astype(jnp.float32),
                           ln_b_ref[0].astype(jnp.float32))
        x_ln = layernorm(x_ref[0, 0]).astype(dtype)        # [N, D]
        cls_ln = layernorm(cls_ref[0]).astype(dtype)       # [1, D]

        bk = bk_ref[:].astype(jnp.float32)
        bv = bv_ref[:].astype(jnp.float32)
        scale = jnp.asarray(d, jnp.float32) ** -0.5
        # only k/v needed for the patch rows (no per-frame queries)
        k = jnp.dot(x_ln, wqkv_ref[:, D:2 * D],
                    preferred_element_type=jnp.float32) + bk
        v = jnp.dot(x_ln, wqkv_ref[:, 2 * D:],
                    preferred_element_type=jnp.float32) + bv
        qc = (jnp.dot(cls_ln, wqkv_ref[:, :D],
                      preferred_element_type=jnp.float32)
              + bq_ref[:].astype(jnp.float32))
        kc = jnp.dot(cls_ln, wqkv_ref[:, D:2 * D],
                     preferred_element_type=jnp.float32) + bk
        vc = jnp.dot(cls_ln, wqkv_ref[:, 2 * D:],
                     preferred_element_type=jnp.float32) + bv
        q_cls = qc * scale

        @pl.when(t == 0)
        def _init():
            for h in range(H):
                sl = slice(h * d, (h + 1) * d)
                m_scr[h] = jnp.sum(q_cls[0, sl] * kc[0, sl])
                l_scr[h] = 1.0
                acc_scr[h, :] = vc[0, sl]

        for h in range(H):
            sl = slice(h * d, (h + 1) * d)
            lc = jnp.dot(k[:, sl], q_cls[:, sl].T,
                         preferred_element_type=jnp.float32)       # [N, 1]
            c_max = jnp.max(lc)
            m_old = m_scr[h]
            m_new = jnp.maximum(m_old, c_max)
            corr = jnp.exp(m_old - m_new)
            p_c = jnp.exp(lc - m_new)                              # [N, 1]
            m_scr[h] = m_new
            l_scr[h] = l_scr[h] * corr + jnp.sum(p_c)
            pv = jnp.sum(v[:, sl] * p_c, axis=0)                   # [d]
            acc_scr[h, :] = acc_scr[h, :] * corr + pv

        @pl.when(t == pl.num_programs(1) - 1)
        def _finalize():
            rows = [acc_scr[h:h + 1, :] / l_scr[h] for h in range(H)]
            cls_att = jnp.concatenate(rows, axis=1)
            projc = jnp.dot(cls_att.astype(dtype), wproj_ref[:],
                            preferred_element_type=jnp.float32) \
                + bproj_ref[:].astype(jnp.float32)
            ocls_ref[0] = (basecls_ref[0].astype(jnp.float32)
                           + projc).astype(dtype)

    return kernel


def fused_space_cls_only_v2(x, base_cls, ln_scale, ln_bias, wqkv, bqkv,
                            wproj, bproj, num_frames: int,
                            patches_per_frame: int, num_heads: int,
                            interpret: bool = False):
    """CLS-only space sub-path, ROW-major tower: x [B,S,D] (the time sub-path
    output), base_cls [B,1,D] (the block input's CLS row — the space residual
    branches from the block input). Returns ocls [B,1,D] == row 0 of
    fused_space_attention_block_v2(x, base, ...), with the dead per-frame
    outputs never computed. Used as the LAST-block tail when only the pooled
    CLS embedding is consumed (reference extraction semantics,
    v2/downstream/feature_extraction_TVTSv2_B_16.py consumes v_feat only)."""
    B, S, D = x.shape
    T, N = num_frames, patches_per_frame
    assert S == 1 + T * N
    d = D // num_heads

    x_cls = x[:, :1]
    x_p = x[:, 1:].reshape(B, T, N, D)

    frame_spec = pl.BlockSpec((1, 1, N, D), lambda b, t: (b, t, 0, 0),
                              memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, D), lambda b, t: (0, 0),
                            memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((D, 3 * D), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    wproj_spec = pl.BlockSpec((D, D), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)

    b3 = bqkv.reshape(3, D)
    ocls = pl.pallas_call(
        _make_space_cls_kernel_v2(num_heads),
        grid=(B, T),
        in_specs=[frame_spec, cls_spec, cls_spec, vec_spec, vec_spec,
                  wqkv_spec, vec_spec, vec_spec, vec_spec, wproj_spec,
                  vec_spec],
        out_specs=cls_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, D), x.dtype),
        scratch_shapes=[pltpu.SMEM((num_heads,), jnp.float32),
                        pltpu.SMEM((num_heads,), jnp.float32),
                        pltpu.VMEM((num_heads, d), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x_p, x_cls, base_cls, ln_scale.reshape(1, D), ln_bias.reshape(1, D),
      wqkv, b3[0:1], b3[1:2], b3[2:3], wproj, bproj.reshape(1, D))
    return ocls


def fused_space_cls_only_v7(xT, cls, basecls, ln_scale, ln_bias, wqkv, bqkv,
                            wproj, bproj, num_heads: int,
                            interpret: bool = False):
    """CLS-only space sub-path: xT [B,T,D,N] (the time sub-path output),
    cls/basecls [B,1,D]. Returns ocls [B,1,D] == the v7 space kernel's CLS
    output, with the dead per-frame outputs never computed."""
    B, T, D, N = xT.shape
    H = num_heads
    d = D // H

    frameT_spec = pl.BlockSpec((1, 1, D, N), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    vecT_spec = pl.BlockSpec((D, 1), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    wqkvT_spec = pl.BlockSpec((3 * D, D), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    wprojT_spec = pl.BlockSpec((D, D), lambda b, t: (0, 0),
                               memory_space=pltpu.VMEM)

    b3 = bqkv.reshape(3, D)
    ocls = pl.pallas_call(
        _make_space_cls_kernel_v7(H),
        grid=(B, T),
        in_specs=[frameT_spec, cls_spec, cls_spec, vecT_spec, vecT_spec,
                  wqkvT_spec, vecT_spec, vecT_spec, vecT_spec, wprojT_spec,
                  vecT_spec],
        out_specs=cls_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, D), xT.dtype),
        scratch_shapes=[pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, 1), jnp.float32),
                        pltpu.VMEM((H, d, 1), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(xT, cls, basecls, ln_scale.reshape(D, 1), ln_bias.reshape(D, 1),
      wqkv.T, b3[0].reshape(D, 1), b3[1].reshape(D, 1), b3[2].reshape(D, 1),
      wproj.T, bproj.reshape(D, 1))
    return ocls
