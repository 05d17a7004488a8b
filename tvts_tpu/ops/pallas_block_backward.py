"""Backward megakernels for the v2 attention sub-paths (training).

Same fusion philosophy as the forwards (ops/pallas_block_attention.py): one
Pallas call per sub-path per block. The backward recomputes LN/qkv/probs in
VMEM (flash-attention style), consumes the CLS-row softmax stats saved by the
forward (per-head logsumexp + pre-proj CLS attention output), and accumulates
weight gradients in fp32 directly in constant-index output refs across the
whole grid.

Gradient contracts (verified vs jax.grad of the XLA sub-path in
tests/test_block_backward.py):

space: o = base + Proj(SpaceAttn(LN(x)));  d(base) = g (added XLA-side),
       kernel returns dx, d(ln), d(wqkv/bqkv), d(wproj/bproj).
time:  o = x + Proj(TimeAttn(LN(x)));      kernel returns the SUM dx = g + dLN
       path (residual folded like the forward).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tvts_tpu.ops.pallas_block_attention import (
    _compiler_params,
    _erf,
    _outer_fn1,
    _rowdot_fnd,
    _sum_fn1_times_fnd,
    fused_space_attention_block_v2,
    fused_time_attention_block_v2,
)


def _ln_fwd(x, ln_s, ln_b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd
    return xhat * ln_s[None] + ln_b[None], xhat, rstd


def _ln_bwd(dxln, xhat, rstd, ln_s):
    dxhat = dxln * ln_s[None]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    return (dxhat - m1 - xhat * m2) * rstd


def _make_space_bwd_kernel(H: int, use_saved: bool = False, FPP: int = 1):
    def kernel(g_ref, gcls_ref, x_ref, cls_ref, ln_s_ref, ln_b_ref,
               wqkv_ref, bq_ref, bk_ref, bv_ref, wproj_ref,
               lse_ref, acls_ref, *rest):
        """Grid (B, T // FPP), t minor. FPP frames' backward per program +
        CLS-row accumulation. Batching frames amortizes the per-program
        fixed work (CLS reprojection, grid/DMA overhead) and turns the
        weight-gradient contractions into [FPP*N, D]-row matmuls.

        use_saved: q/k/v and the pre-projection attention output come from
        the forward kernel's saved outputs instead of being recomputed
        (skips 3 [N,D]x[D,D] matmuls + the attention-output pass)."""
        if use_saved:
            q_ref, k_ref, v_ref, attn_ref = rest[:4]
            rest = rest[4:]
        (dx_ref, dxcls_ref, dwqkv_ref, dbq_ref, dbk_ref, dbv_ref,
         dwproj_ref, dbproj_ref, dls_ref, dlb_ref,
         dqc_scr, dck_scr, dcv_scr) = rest
        N = x_ref.shape[2]
        D = x_ref.shape[3]
        d = D // H
        t = pl.program_id(1)
        first = (pl.program_id(0) == 0) & (t == 0)

        @pl.when(first)
        def _zero():
            for ref in (dwqkv_ref, dbq_ref, dbk_ref, dbv_ref, dwproj_ref,
                        dbproj_ref, dls_ref, dlb_ref):
                ref[...] = jnp.zeros_like(ref)

        @pl.when(t == 0)
        def _reset_cls():
            dqc_scr[...] = jnp.zeros_like(dqc_scr)
            dck_scr[...] = jnp.zeros_like(dck_scr)
            dcv_scr[...] = jnp.zeros_like(dcv_scr)

        dtype = x_ref.dtype
        ln_s = ln_s_ref[0].astype(jnp.float32)
        ln_b = ln_b_ref[0].astype(jnp.float32)
        bq = bq_ref[:].astype(jnp.float32)
        bk = bk_ref[:].astype(jnp.float32)
        bv = bv_ref[:].astype(jnp.float32)
        scale = jnp.asarray(d, jnp.float32) ** -0.5

        # ---- recompute forward intermediates (all FPP frames at once) ------
        x_flat = x_ref[0].reshape(FPP * N, D)
        x_ln_f, xhat, rstd = _ln_fwd(x_flat, ln_s, ln_b)
        x_ln = x_ln_f.astype(dtype)
        cls_ln_f, xhat_c, rstd_c = _ln_fwd(cls_ref[0], ln_s, ln_b)
        cls_ln = cls_ln_f.astype(dtype)
        if use_saved:
            q4 = q_ref[0]                                      # [FPP, N, D]
            k4 = k_ref[0]
            v4 = v_ref[0]
        else:
            q4 = ((jnp.dot(x_ln, wqkv_ref[:, :D],
                           preferred_element_type=jnp.float32) + bq) * scale) \
                .astype(dtype).reshape(FPP, N, D)
            k4 = (jnp.dot(x_ln, wqkv_ref[:, D:2 * D],
                          preferred_element_type=jnp.float32) + bk) \
                .astype(dtype).reshape(FPP, N, D)
            v4 = (jnp.dot(x_ln, wqkv_ref[:, 2 * D:],
                          preferred_element_type=jnp.float32) + bv) \
                .astype(dtype).reshape(FPP, N, D)
        qc = (jnp.dot(cls_ln, wqkv_ref[:, :D],
                      preferred_element_type=jnp.float32) + bq) * scale
        kc = jnp.dot(cls_ln, wqkv_ref[:, D:2 * D],
                     preferred_element_type=jnp.float32) + bk
        vc = jnp.dot(cls_ln, wqkv_ref[:, 2 * D:],
                     preferred_element_type=jnp.float32) + bv

        g_flat = g_ref[0].reshape(FPP * N, D)                 # dtype
        dattn_all = jnp.dot(g_flat, wproj_ref[:].T,
                            preferred_element_type=jnp.float32)
        dattn4 = dattn_all.reshape(FPP, N, D)
        gcls = gcls_ref[0]                                    # [1, D]
        dattn_cls = jnp.dot(gcls, wproj_ref[:].T,
                            preferred_element_type=jnp.float32)  # [1, D]
        acls = acls_ref[0]                                    # [1, D] fp32

        frame_outs = []          # per frame: [N, D] attention output (recomp)
        frame_dq, frame_dk, frame_dv = [], [], []
        for f in range(FPP):
            q, k, v = q4[f], k4[f], v4[f]
            dattn = dattn4[f]
            head_outs = []
            dqs, dks, dvs = [], [], []
            for h in range(H):
                sl = slice(h * d, (h + 1) * d)
                qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
                kch = kc[:, sl]                               # [1, d] fp32
                vch = vc[:, sl]
                qch = qc[:, sl]
                lse_h = lse_ref[0, 0, h]

                logits = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32)
                cls_logit = jnp.dot(qh, kch.astype(dtype).T,
                                    preferred_element_type=jnp.float32)  # [N,1]
                m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True),
                                cls_logit)
                p = jnp.exp(logits - m)
                p_cls = jnp.exp(cls_logit - m)
                denom = jnp.sum(p, axis=-1, keepdims=True) + p_cls
                pn = p / denom                                # [N, N] fp32
                pn_cls = p_cls / denom                        # [N, 1]
                if not use_saved:
                    oh = jnp.dot(pn.astype(dtype), vh,
                                 preferred_element_type=jnp.float32) \
                        + pn_cls * vch
                    head_outs.append(oh.astype(dtype))

                dout = dattn[:, sl]                           # [N, d] fp32
                dout_b = dout.astype(dtype)
                pn_b = pn.astype(dtype)
                # value grads
                dv_h = jnp.dot(pn_b.T, dout_b,
                               preferred_element_type=jnp.float32)
                dcv_scr[h, :] += jnp.sum(pn_cls * dout, axis=0)
                # prob grads + softmax bwd
                dp = jnp.dot(dout_b, vh.T, preferred_element_type=jnp.float32)
                dp_cls = jnp.sum(dout * vch, axis=-1, keepdims=True)  # [N,1]
                rowsum = jnp.sum(pn * dp, axis=-1, keepdims=True) \
                    + pn_cls * dp_cls
                ds = pn * (dp - rowsum)                       # [N, N] fp32
                ds_cls = pn_cls * (dp_cls - rowsum)           # [N, 1]
                ds_b = ds.astype(dtype)
                dq_h = jnp.dot(ds_b, kh, preferred_element_type=jnp.float32) \
                    + ds_cls * kch
                dk_h = jnp.dot(ds_b.T, qh, preferred_element_type=jnp.float32)
                dck_scr[h, :] += jnp.sum(ds_cls * qh.astype(jnp.float32),
                                         axis=0)

                # ---- CLS row contribution from this frame's keys -----------
                dout_c = dattn_cls[:, sl]                     # [1, d] fp32
                delta_h = jnp.sum(acls[:, sl] * dout_c)
                lrow = jnp.dot(kh.astype(jnp.float32), qch.T,
                               preferred_element_type=jnp.float32)  # [N, 1]
                pn_row = jnp.exp(lrow - lse_h)                # [N, 1]
                dv_h = dv_h + pn_row * dout_c
                dp_row = jnp.sum(vh.astype(jnp.float32) * dout_c, axis=-1,
                                 keepdims=True)               # [N, 1]
                ds_row = pn_row * (dp_row - delta_h)          # [N, 1]
                dqc_scr[h, :] += jnp.sum(ds_row * kh.astype(jnp.float32),
                                         axis=0)
                dk_h = dk_h + ds_row * qch

                # CLS self term (exactly once per batch element)
                if f == 0:
                    @pl.when(t == 0)
                    def _self(h=h, sl=sl, qch=qch, kch=kch, vch=vch,
                              dout_c=dout_c, delta_h=delta_h, lse_h=lse_h):
                        p_self = jnp.exp(jnp.sum(qch * kch) - lse_h)
                        dcv_scr[h, :] += p_self * dout_c[0]
                        dp_self = jnp.sum(vch * dout_c)
                        ds_self = p_self * (dp_self - delta_h)
                        dqc_scr[h, :] += ds_self * kch[0]
                        dck_scr[h, :] += ds_self * qch[0]

                dqs.append(dq_h)
                dks.append(dk_h)
                dvs.append(dv_h)

            if not use_saved:
                frame_outs.append(jnp.concatenate(head_outs, axis=-1))
            frame_dq.append(jnp.concatenate(dqs, axis=-1))    # [N, D] fp32
            frame_dk.append(jnp.concatenate(dks, axis=-1))
            frame_dv.append(jnp.concatenate(dvs, axis=-1))

        attn_out = attn_ref[0].reshape(FPP * N, D) if use_saved \
            else jnp.concatenate(frame_outs, axis=0)          # [FPP*N, D]
        dwproj_ref[...] += jnp.dot(attn_out.T, g_flat,
                                   preferred_element_type=jnp.float32)
        dbproj_ref[...] += jnp.sum(g_flat.astype(jnp.float32), axis=0,
                                   keepdims=True)

        dq = jnp.concatenate(frame_dq, axis=0) * scale        # [FPP*N, D] f32
        dk = jnp.concatenate(frame_dk, axis=0)
        dv = jnp.concatenate(frame_dv, axis=0)
        dq_b, dk_b, dv_b = (dq.astype(dtype), dk.astype(dtype),
                            dv.astype(dtype))
        x_ln_t = x_ln.T
        dwqkv_ref[:, :D] += jnp.dot(x_ln_t, dq_b,
                                    preferred_element_type=jnp.float32)
        dwqkv_ref[:, D:2 * D] += jnp.dot(x_ln_t, dk_b,
                                         preferred_element_type=jnp.float32)
        dwqkv_ref[:, 2 * D:] += jnp.dot(x_ln_t, dv_b,
                                        preferred_element_type=jnp.float32)
        dbq_ref[...] += jnp.sum(dq, axis=0, keepdims=True)
        dbk_ref[...] += jnp.sum(dk, axis=0, keepdims=True)
        dbv_ref[...] += jnp.sum(dv, axis=0, keepdims=True)

        dxln = jnp.dot(dq_b, wqkv_ref[:, :D].T,
                       preferred_element_type=jnp.float32) \
            + jnp.dot(dk_b, wqkv_ref[:, D:2 * D].T,
                      preferred_element_type=jnp.float32) \
            + jnp.dot(dv_b, wqkv_ref[:, 2 * D:].T,
                      preferred_element_type=jnp.float32)
        dls_ref[...] += jnp.sum(dxln * xhat, axis=0, keepdims=True)
        dlb_ref[...] += jnp.sum(dxln, axis=0, keepdims=True)
        dx_ref[0] = _ln_bwd(dxln, xhat, rstd, ln_s) \
            .reshape(FPP, N, D).astype(dx_ref.dtype)

        # ---- CLS token assembly at the last program -------------------------
        @pl.when(t == pl.num_programs(1) - 1)
        def _finish_cls():
            dqc_rows = [dqc_scr[h:h + 1, :] for h in range(H)]
            dkc_rows = [dck_scr[h:h + 1, :] for h in range(H)]
            dvc_rows = [dcv_scr[h:h + 1, :] for h in range(H)]
            dqc = jnp.concatenate(dqc_rows, axis=1) * scale   # [1, D]
            dkc = jnp.concatenate(dkc_rows, axis=1)
            dvc = jnp.concatenate(dvc_rows, axis=1)
            cls_ln_t = cls_ln.astype(jnp.float32).T           # [D, 1]
            dwqkv_ref[:, :D] += cls_ln_t * dqc
            dwqkv_ref[:, D:2 * D] += cls_ln_t * dkc
            dwqkv_ref[:, 2 * D:] += cls_ln_t * dvc
            dbq_ref[...] += dqc
            dbk_ref[...] += dkc
            dbv_ref[...] += dvc
            # the CLS row's output projection grads
            dwproj_ref[...] += jnp.dot(acls.astype(dtype).T, gcls,
                                       preferred_element_type=jnp.float32)
            dbproj_ref[...] += gcls.astype(jnp.float32)
            dxln_c = jnp.dot(dqc.astype(dtype), wqkv_ref[:, :D].T,
                             preferred_element_type=jnp.float32) \
                + jnp.dot(dkc.astype(dtype), wqkv_ref[:, D:2 * D].T,
                          preferred_element_type=jnp.float32) \
                + jnp.dot(dvc.astype(dtype), wqkv_ref[:, 2 * D:].T,
                          preferred_element_type=jnp.float32)
            dls_ref[...] += jnp.sum(dxln_c * xhat_c, axis=0, keepdims=True)
            dlb_ref[...] += jnp.sum(dxln_c, axis=0, keepdims=True)
            dxcls_ref[0] = _ln_bwd(dxln_c, xhat_c, rstd_c,
                                   ln_s).astype(dxcls_ref.dtype)

    return kernel


def fused_space_attention_block_v2_bwd(g, x, ln_scale, ln_bias, wqkv, bqkv,
                                       wproj, lse, attn_cls, num_frames: int,
                                       patches_per_frame: int, num_heads: int,
                                       acts_saved=None, fpp: int | None = None,
                                       interpret: bool = False):
    """Backward of the space sub-path (w.r.t. the ATTENTION input x; the
    residual-base grad is just g and is added by the caller). Returns
    (dx [B,S,D], dln_scale, dln_bias, dwqkv, dbqkv, dwproj, dbproj).

    fpp: frames per program. Default 1 — measured BEST on v5e at B/16
    pretrain sizes: fpp=6 gave 75.3 clips/s vs 76.5 at fpp=1 (batching
    frames raises VMEM pressure and does not help; the backward is bound by
    the per-head math, not per-program overhead), and fpp=12 fails to
    compile (103.7 MB scoped VMEM vs the 100 MB limit). The knob stays for
    other geometries."""
    B, S, D = x.shape
    T, N = num_frames, patches_per_frame
    d = D // num_heads
    assert S == 1 + T * N
    if fpp is None or T % fpp != 0:
        fpp = 1

    g_cls, g_p = g[:, :1], g[:, 1:].reshape(B, T, N, D)
    x_cls, x_p = x[:, :1], x[:, 1:].reshape(B, T, N, D)
    b3 = bqkv.reshape(3, D)

    frame_spec = pl.BlockSpec((1, fpp, N, D), lambda b, t: (b, t, 0, 0),
                              memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, D), lambda b, t: (0, 0), memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((D, 3 * D), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    wproj_spec = pl.BlockSpec((D, D), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, 1, num_heads), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.SMEM)

    extra_in_specs = [frame_spec] * 4 if acts_saved is not None else []
    extra_ins = tuple(acts_saved) if acts_saved is not None else ()
    outs = pl.pallas_call(
        _make_space_bwd_kernel(num_heads, use_saved=acts_saved is not None,
                               FPP=fpp),
        grid=(B, T // fpp),
        in_specs=[frame_spec, cls_spec, frame_spec, cls_spec, vec_spec,
                  vec_spec, wqkv_spec, vec_spec, vec_spec, vec_spec,
                  wproj_spec, lse_spec, cls_spec] + extra_in_specs,
        out_specs=(frame_spec, cls_spec, wqkv_spec, vec_spec, vec_spec,
                   vec_spec, wproj_spec, vec_spec, vec_spec, vec_spec),
        out_shape=(jax.ShapeDtypeStruct((B, T, N, D), x.dtype),
                   jax.ShapeDtypeStruct((B, 1, D), x.dtype),
                   jax.ShapeDtypeStruct((D, 3 * D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((D, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((num_heads, d), jnp.float32)] * 3,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(g_p, g_cls, x_p, x_cls, ln_scale.reshape(1, D), ln_bias.reshape(1, D),
      wqkv, b3[0:1], b3[1:2], b3[2:3], wproj, lse,
      attn_cls.reshape(B, 1, D), *extra_ins)
    (dx_p, dx_cls, dwqkv, dbq, dbk, dbv, dwproj, dbproj, dls, dlb) = outs
    dx = jnp.concatenate([dx_cls, dx_p.reshape(B, T * N, D)], axis=1)
    dbqkv = jnp.concatenate([dbq[0], dbk[0], dbv[0]])
    return dx, dls[0], dlb[0], dwqkv, dbqkv, dwproj, dbproj[0]


def _ln_fwd_batched(x, ln_s, ln_b, eps=1e-5):
    """LN over [..., D]; returns (x_ln fp32, xhat, rstd)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd
    return xhat * ln_s + ln_b, xhat, rstd


def _attn_subpath_bwd_xla(g, x, ln_scale, ln_bias, wqkv, bqkv, wproj,
                          q, k, v, num_frames: int, patches_per_frame: int,
                          num_heads: int, mode: str):
    """Batched-XLA backward of an attention sub-path, fed by the forward
    kernel's saved q/k/v (pre-scaled q, patch rows only).

    The attention-core gradient comes from jax.vjp of the shared
    divided_space_time_attention (ops/attention.py) — big batched einsums the
    TPU compiler schedules well — while the linear-layer and LayerNorm grads
    are written out explicitly. Probabilities are recomputed transiently
    inside this backward (per block), so nothing quadratic is stored across
    the model the way the all-XLA train path does."""
    from tvts_tpu.ops.attention import divided_space_time_attention, merge_heads, split_heads

    B, S, D = x.shape
    T, N, H = num_frames, patches_per_frame, num_heads
    d = D // H
    scale = jnp.asarray(d, jnp.float32) ** -0.5
    dtype = q.dtype

    x_ln_f, xhat, rstd = _ln_fwd_batched(
        x, ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32))
    x_ln = x_ln_f.astype(dtype)
    # CLS q/k/v recomputed from the CLS row (one [B,1,3D] projection)
    qkv_c = x_ln[:, :1] @ wqkv.astype(dtype) + bqkv.astype(dtype)
    qc, kc, vc = jnp.split(qkv_c, 3, axis=-1)
    qc = qc * scale.astype(dtype)
    q_full = jnp.concatenate([qc, q.reshape(B, T * N, D)], axis=1)
    k_full = jnp.concatenate([kc, k.reshape(B, T * N, D)], axis=1)
    v_full = jnp.concatenate([vc, v.reshape(B, T * N, D)], axis=1)

    def attn_fn(q2, k2, v2):
        return merge_heads(divided_space_time_attention(
            split_heads(q2, H), split_heads(k2, H), split_heads(v2, H),
            T, N, mode))

    attn_out, attn_vjp = jax.vjp(attn_fn, q_full, k_full, v_full)

    g2 = g.reshape(B * S, D)
    dattn = (g @ wproj.astype(g.dtype).T).astype(dtype)
    dwproj = jnp.einsum("sd,se->de", attn_out.reshape(B * S, D).astype(g.dtype),
                        g2, preferred_element_type=jnp.float32)
    dbproj = jnp.sum(g2.astype(jnp.float32), axis=0)

    dq, dk, dv = attn_vjp(dattn)
    dqkv = jnp.concatenate([dq * scale.astype(dq.dtype), dk, dv], axis=-1)
    dwqkv = jnp.einsum("sd,se->de", x_ln.reshape(B * S, D),
                       dqkv.reshape(B * S, 3 * D),
                       preferred_element_type=jnp.float32)
    dbqkv = jnp.sum(dqkv.astype(jnp.float32).reshape(B * S, 3 * D), axis=0)
    dxln = (dqkv @ wqkv.astype(dqkv.dtype).T).astype(jnp.float32)
    dls = jnp.sum(dxln * xhat, axis=(0, 1))
    dlb = jnp.sum(dxln, axis=(0, 1))
    dxhat = dxln * ln_scale.astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = ((dxhat - m1 - xhat * m2) * rstd).astype(x.dtype)
    return dx, dls, dlb, dwqkv, dbqkv, dwproj, dbproj


def make_space_subpath(num_frames: int, patches_per_frame: int,
                       num_heads: int, save_acts: bool = True,
                       bwd_mode: str = "pallas",
                       interpret: bool = False):
    """Differentiable fused space sub-path: Pallas forward, choice of backward.

    f(x, base, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj) ->
    base + SpaceAttn(LN(x)) @ wproj + bproj.

    save_acts: the forward emits q/k/v + the pre-projection attention output
    and the backward consumes them instead of recomputing (default; costs
    4x[B,S,D] bf16 of residual memory per block). Set False to trade speed
    for activation memory (pure flash-style recompute).

    bwd_mode: "pallas" (default) keeps the backward in the kernel.
    "xla" composes the backward from batched einsums over the saved q/k/v —
    tried and MEASURED SLOWER in context on v5e (141 vs 110 ms per 12 blocks
    at B=32, tools/bwd_split_probe.py): the [B,H,S,d=64] head split inflates
    physical tiles 2.67x and the vjp replays the attention forward, which
    together cost more than the kernel's per-head math. Kept as an option
    because it stores no per-head state and exercises the shared
    divided_space_time_attention path."""

    T, N, H = num_frames, patches_per_frame, num_heads
    if bwd_mode == "xla" and not save_acts:
        raise ValueError("bwd_mode='xla' requires save_acts=True (the XLA "
                         "backward consumes the forward-saved q/k/v)")
    use_xla_bwd = bwd_mode == "xla" and save_acts

    @jax.custom_vjp
    def f(x, base, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj):
        return fused_space_attention_block_v2(
            x, base, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
            num_frames=T, patches_per_frame=N, num_heads=H,
            interpret=interpret)

    def fwd(x, base, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj):
        outs = fused_space_attention_block_v2(
            x, base, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
            num_frames=T, patches_per_frame=N, num_heads=H, save_stats=True,
            save_acts=save_acts, interpret=interpret)
        if save_acts:
            out, lse, acls, q, k, v, attn = outs
            acts_saved = (q, k, v, attn)
        else:
            out, lse, acls = outs
            acts_saved = None
        return out, (x, ln_scale, ln_bias, wqkv, bqkv, wproj, lse, acls,
                     acts_saved)

    def bwd(res, g):
        x, ln_scale, ln_bias, wqkv, bqkv, wproj, lse, acls, acts_saved = res
        if use_xla_bwd:
            q, k, v = acts_saved[:3]
            dx, dls, dlb, dwqkv, dbqkv, dwproj, dbproj = _attn_subpath_bwd_xla(
                g, x, ln_scale, ln_bias, wqkv, bqkv, wproj, q, k, v,
                num_frames=T, patches_per_frame=N, num_heads=H, mode="space")
        else:
            dx, dls, dlb, dwqkv, dbqkv, dwproj, dbproj = \
                fused_space_attention_block_v2_bwd(
                    g, x, ln_scale, ln_bias, wqkv, bqkv, wproj, lse, acls,
                    num_frames=T, patches_per_frame=N, num_heads=H,
                    acts_saved=acts_saved, interpret=interpret)
        return (dx, g, dls.astype(ln_scale.dtype), dlb.astype(ln_bias.dtype),
                dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
                dwproj.astype(wproj.dtype), dbproj.astype(bqkv.dtype))

    f.defvjp(fwd, bwd)
    return f


def _make_time_bwd_kernel(H: int, T: int, N: int, use_saved: bool = False,
                          use_probs: bool = False):
    def kernel(g_ref, gcls_ref, x_ref, cls_ref, ln_s_ref, ln_b_ref,
               wqkv_ref, bq_ref, bk_ref, bv_ref, wproj_ref,
               lse_ref, acls_ref, *rest):
        """Grid (B, C), c minor. Backward of the TIME sub-path chunk; the
        forward folds the residual (o = x + proj), so dx = g + LN-path.

        use_saved: q/k/v and the pre-projection attention output loaded from
        the forward's saved outputs instead of recomputed. use_probs: the
        per-frame softmax probs come from the forward too (the per-t
        l/exp/denom chain disappears)."""
        if use_saved:
            q_ref, k_ref, v_ref, attn_ref = rest[:4]
            rest = rest[4:]
        if use_probs:
            p_ref = rest[0]
            rest = rest[1:]
        (dx_ref, dxcls_ref, dwqkv_ref, dbq_ref, dbk_ref, dbv_ref,
         dwproj_ref, dbproj_ref, dls_ref, dlb_ref,
         dqc_scr, dck_scr, dcv_scr) = rest
        Nc = x_ref.shape[2]
        D = x_ref.shape[3]
        d = D // H
        c = pl.program_id(1)
        first = (pl.program_id(0) == 0) & (c == 0)

        @pl.when(first)
        def _zero():
            for ref in (dwqkv_ref, dbq_ref, dbk_ref, dbv_ref, dwproj_ref,
                        dbproj_ref, dls_ref, dlb_ref):
                ref[...] = jnp.zeros_like(ref)

        @pl.when(c == 0)
        def _reset_cls():
            dqc_scr[...] = jnp.zeros_like(dqc_scr)
            dck_scr[...] = jnp.zeros_like(dck_scr)
            dcv_scr[...] = jnp.zeros_like(dcv_scr)

        dtype = x_ref.dtype
        ln_s = ln_s_ref[0].astype(jnp.float32)
        ln_b = ln_b_ref[0].astype(jnp.float32)
        bq = bq_ref[:].astype(jnp.float32)
        bk = bk_ref[:].astype(jnp.float32)
        bv = bv_ref[:].astype(jnp.float32)
        scale = jnp.asarray(d, jnp.float32) ** -0.5

        x_flat = x_ref[0].reshape(T * Nc, D)
        x_ln_f, xhat, rstd = _ln_fwd(x_flat, ln_s, ln_b)
        x_ln = x_ln_f.astype(dtype)
        cls_ln_f, xhat_c, rstd_c = _ln_fwd(cls_ref[0], ln_s, ln_b)
        cls_ln = cls_ln_f.astype(dtype)
        if use_saved:
            q = q_ref[0]
            k = k_ref[0]
            v = v_ref[0]
        else:
            q = ((jnp.dot(x_ln, wqkv_ref[:, :D],
                          preferred_element_type=jnp.float32) + bq) * scale) \
                .astype(dtype).reshape(T, Nc, D)
            k = (jnp.dot(x_ln, wqkv_ref[:, D:2 * D],
                         preferred_element_type=jnp.float32) + bk) \
                .astype(dtype).reshape(T, Nc, D)
            v = (jnp.dot(x_ln, wqkv_ref[:, 2 * D:],
                         preferred_element_type=jnp.float32) + bv) \
                .astype(dtype).reshape(T, Nc, D)
        qc = (jnp.dot(cls_ln, wqkv_ref[:, :D],
                      preferred_element_type=jnp.float32) + bq) * scale
        kc = jnp.dot(cls_ln, wqkv_ref[:, D:2 * D],
                     preferred_element_type=jnp.float32) + bk
        vc = jnp.dot(cls_ln, wqkv_ref[:, 2 * D:],
                     preferred_element_type=jnp.float32) + bv

        g_flat = g_ref[0].reshape(T * Nc, D)
        dattn = jnp.dot(g_flat, wproj_ref[:].T,
                        preferred_element_type=jnp.float32)   # [T*Nc, D] fp32
        dattn3 = dattn.astype(dtype).reshape(T, Nc, D)
        gcls = gcls_ref[0]
        dattn_cls = jnp.dot(gcls, wproj_ref[:].T,
                            preferred_element_type=jnp.float32)  # [1, D]
        acls = acls_ref[0]                                    # [1, D] fp32

        loc = jax.lax.broadcasted_iota(jnp.int32, (T, Nc), 1) + c * Nc
        valid = loc < N                                       # [T, Nc]

        # head-batched [H, T, d, Nc] layout (stacks of per-head swapaxes
        # outputs — fresh values, so legal); the T-loop's softmax-backward
        # chain runs once per frame over ALL heads (12x fewer VPU op issues)
        def to_heads4(a):
            return jnp.stack([jnp.swapaxes(a[..., h * d:(h + 1) * d], -1, -2)
                              for h in range(H)]).astype(jnp.float32)

        q4 = to_heads4(q)                                     # [H, T, d, Nc]
        k4 = to_heads4(k)
        v4 = to_heads4(v)
        dout4 = to_heads4(dattn3)
        qc4 = qc.T.reshape(H, d, 1)                           # fp32
        kc4 = kc.T.reshape(H, d, 1)
        vc4 = vc.T.reshape(H, d, 1)
        acls4 = acls.T.reshape(H, d, 1)
        dout_c4 = dattn_cls.T.reshape(H, d, 1)
        lse2 = lse_ref[0].T                                   # [H, 1]
        lse4 = lse2[..., None]                                # [H, 1, 1]

        dk4 = jnp.zeros_like(k4)
        dv4 = jnp.zeros_like(v4)
        dq_ts = []
        outs_t = []
        for t in range(T):
            qt = q4[:, t]                                     # [H, d, Nc]
            if use_probs:
                pn = p_ref[0, t].astype(jnp.float32)          # [H, T+1, Nc]
            else:
                l = jnp.sum(qt[:, None] * k4, axis=2)         # [H, T, Nc]
                cls_l = jnp.sum(qt * kc4, axis=1)[:, None]    # [H, 1, Nc]
                full = jnp.concatenate([cls_l, l], axis=1)    # [H, T+1, Nc]
                m = jnp.max(full, axis=1, keepdims=True)
                p = jnp.exp(full - m)
                denom = jnp.sum(p, axis=1, keepdims=True)
                pn = p / denom                                # [H, T+1, Nc]
            if not use_saved:
                out_t = jnp.sum(pn[:, 1:][:, :, None] * v4, axis=1) \
                    + pn[:, 0][:, None, :] * vc4              # [H, d, Nc]
                outs_t.append(out_t.astype(dtype).reshape(D, Nc))

            dout_t = dout4[:, t]                              # [H, d, Nc]
            dv4 = dv4 + pn[:, 1:][:, :, None] * dout_t[:, None]
            dcv_scr[...] += jnp.sum(pn[:, 0][:, None, :] * dout_t, axis=2)
            dp = jnp.sum(v4 * dout_t[:, None], axis=2)        # [H, T, Nc]
            dp_cls = jnp.sum(vc4 * dout_t, axis=1)[:, None]   # [H, 1, Nc]
            full_dp = jnp.concatenate([dp_cls, dp], axis=1)
            rowsum = jnp.sum(pn * full_dp, axis=1, keepdims=True)
            ds = pn * (full_dp - rowsum)                      # [H, T+1, Nc]
            dq_ts.append(jnp.sum(ds[:, 1:][:, :, None] * k4, axis=1)
                         + ds[:, 0][:, None, :] * kc4)        # [H, d, Nc]
            dk4 = dk4 + ds[:, 1:][:, :, None] * qt[:, None]
            dck_scr[...] += jnp.sum(ds[:, 0][:, None, :] * qt, axis=2)

        dq4 = jnp.stack(dq_ts, axis=1)                        # [H, T, d, Nc]
        # ---- CLS row over this chunk's (valid) keys ------------------------
        delta4 = jnp.sum(acls4 * dout_c4, axis=1, keepdims=True)  # [H, 1, 1]
        lrow = jnp.sum(k4 * qc4[:, None], axis=2)             # [H, T, Nc]
        pn_row = jnp.where(valid[None], jnp.exp(lrow - lse4), 0.0)
        dv4 = dv4 + pn_row[:, :, None, :] * dout_c4[:, None]
        dp_row = jnp.sum(v4 * dout_c4[:, None], axis=2)       # [H, T, Nc]
        ds_row = pn_row * (dp_row - delta4)
        dqc_scr[...] += jnp.sum(ds_row[:, :, None, :] * k4, axis=(1, 3))
        dk4 = dk4 + ds_row[:, :, None, :] * qc4[:, None]

        @pl.when(c == 0)
        def _self():
            p_self = jnp.exp(jnp.sum(qc4[:, :, 0] * kc4[:, :, 0], axis=1,
                                     keepdims=True) - lse2)   # [H, 1]
            dcv_scr[...] += p_self * dout_c4[:, :, 0]
            dp_self = jnp.sum(vc4[:, :, 0] * dout_c4[:, :, 0], axis=1,
                              keepdims=True)                  # [H, 1]
            ds_self = p_self * (dp_self - delta4[:, :, 0])
            dqc_scr[...] += ds_self * kc4[:, :, 0]
            dck_scr[...] += ds_self * qc4[:, :, 0]

        if use_saved:
            attn_flat = attn_ref[0].reshape(T * Nc, D)
        else:
            attn = jnp.stack(outs_t)                          # [T, D, Nc]
            attn_flat = jnp.swapaxes(attn, -1, -2).reshape(T * Nc, D)
        dwproj_ref[...] += jnp.dot(attn_flat.T.astype(dtype),
                                   g_flat.astype(dtype),
                                   preferred_element_type=jnp.float32)
        dbproj_ref[...] += jnp.sum(g_flat.astype(jnp.float32), axis=0,
                                   keepdims=True)

        def to_flat(a4, mul=1.0):                             # [H,T,d,Nc]
            full = jnp.transpose(a4, (1, 0, 2, 3)).reshape(T, D, Nc)
            return (jnp.swapaxes(full, -1, -2).reshape(T * Nc, D) * mul)

        dq = to_flat(dq4, scale)
        dk = to_flat(dk4)
        dv = to_flat(dv4)
        dq_b, dk_b, dv_b = dq.astype(dtype), dk.astype(dtype), dv.astype(dtype)
        x_ln_t = x_ln.T
        dwqkv_ref[:, :D] += jnp.dot(x_ln_t, dq_b,
                                    preferred_element_type=jnp.float32)
        dwqkv_ref[:, D:2 * D] += jnp.dot(x_ln_t, dk_b,
                                         preferred_element_type=jnp.float32)
        dwqkv_ref[:, 2 * D:] += jnp.dot(x_ln_t, dv_b,
                                        preferred_element_type=jnp.float32)
        dbq_ref[...] += jnp.sum(dq, axis=0, keepdims=True)
        dbk_ref[...] += jnp.sum(dk, axis=0, keepdims=True)
        dbv_ref[...] += jnp.sum(dv, axis=0, keepdims=True)

        dxln = jnp.dot(dq_b, wqkv_ref[:, :D].T,
                       preferred_element_type=jnp.float32) \
            + jnp.dot(dk_b, wqkv_ref[:, D:2 * D].T,
                      preferred_element_type=jnp.float32) \
            + jnp.dot(dv_b, wqkv_ref[:, 2 * D:].T,
                      preferred_element_type=jnp.float32)
        dls_ref[...] += jnp.sum(dxln * xhat, axis=0, keepdims=True)
        dlb_ref[...] += jnp.sum(dxln, axis=0, keepdims=True)
        # residual folded in the forward: dx = g + LN path
        dx = g_flat.astype(jnp.float32) + _ln_bwd(dxln, xhat, rstd, ln_s)
        dx_ref[0] = dx.reshape(T, Nc, D).astype(dx_ref.dtype)

        @pl.when(c == pl.num_programs(1) - 1)
        def _finish_cls():
            dqc = jnp.concatenate([dqc_scr[h:h + 1, :] for h in range(H)],
                                  axis=1) * scale             # [1, D]
            dkc = jnp.concatenate([dck_scr[h:h + 1, :] for h in range(H)],
                                  axis=1)
            dvc = jnp.concatenate([dcv_scr[h:h + 1, :] for h in range(H)],
                                  axis=1)
            cls_ln_t = cls_ln.astype(jnp.float32).T
            dwqkv_ref[:, :D] += cls_ln_t * dqc
            dwqkv_ref[:, D:2 * D] += cls_ln_t * dkc
            dwqkv_ref[:, 2 * D:] += cls_ln_t * dvc
            dbq_ref[...] += dqc
            dbk_ref[...] += dkc
            dbv_ref[...] += dvc
            dwproj_ref[...] += jnp.dot(acls.astype(dtype).T, gcls,
                                       preferred_element_type=jnp.float32)
            dbproj_ref[...] += gcls.astype(jnp.float32)
            dxln_c = jnp.dot(dqc.astype(dtype), wqkv_ref[:, :D].T,
                             preferred_element_type=jnp.float32) \
                + jnp.dot(dkc.astype(dtype), wqkv_ref[:, D:2 * D].T,
                          preferred_element_type=jnp.float32) \
                + jnp.dot(dvc.astype(dtype), wqkv_ref[:, 2 * D:].T,
                          preferred_element_type=jnp.float32)
            dls_ref[...] += jnp.sum(dxln_c * xhat_c, axis=0, keepdims=True)
            dlb_ref[...] += jnp.sum(dxln_c, axis=0, keepdims=True)
            dxcls_ref[0] = (gcls.astype(jnp.float32)
                            + _ln_bwd(dxln_c, xhat_c, rstd_c, ln_s)) \
                .astype(dxcls_ref.dtype)

    return kernel


def fused_time_attention_block_v2_bwd(g, x, ln_scale, ln_bias, wqkv, bqkv,
                                      wproj, lse, attn_cls, num_frames: int,
                                      patches_per_frame: int, num_heads: int,
                                      chunk: int = 64, acts_saved=None,
                                      probs_saved=None,
                                      vmem_limit_mb: int = 100,
                                      interpret: bool = False):
    """Backward of the time sub-path (residual folded: returns the FULL dx)."""
    B, S, D = x.shape
    T, N = num_frames, patches_per_frame
    d = D // num_heads
    assert S == 1 + T * N

    g_cls, g_p = g[:, :1], g[:, 1:].reshape(B, T, N, D)
    x_cls, x_p = x[:, :1], x[:, 1:].reshape(B, T, N, D)
    n_pad = (-N) % chunk
    if n_pad:
        pad = ((0, 0), (0, 0), (0, n_pad), (0, 0))
        x_p = jnp.pad(x_p, pad)
        g_p = jnp.pad(g_p, pad)
    Np = N + n_pad
    b3 = bqkv.reshape(3, D)

    chunk_spec = pl.BlockSpec((1, T, chunk, D), lambda b, c: (b, 0, c, 0),
                              memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b, c: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, D), lambda b, c: (0, 0), memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((D, 3 * D), lambda b, c: (0, 0),
                             memory_space=pltpu.VMEM)
    wproj_spec = pl.BlockSpec((D, D), lambda b, c: (0, 0),
                              memory_space=pltpu.VMEM)
    # VMEM (not SMEM): the head-batched kernel reads lse as an [H] vector
    lse_spec = pl.BlockSpec((1, 1, num_heads), lambda b, c: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    extra_in_specs = [chunk_spec] * 4 if acts_saved is not None else []
    extra_ins = tuple(acts_saved) if acts_saved is not None else ()
    if probs_saved is not None:
        H = num_heads
        extra_in_specs += [pl.BlockSpec((1, T, H, T + 1, chunk),
                                        lambda b, c: (b, 0, 0, 0, c),
                                        memory_space=pltpu.VMEM)]
        extra_ins += (probs_saved,)
    outs = pl.pallas_call(
        _make_time_bwd_kernel(num_heads, T, N,
                              use_saved=acts_saved is not None,
                              use_probs=probs_saved is not None),
        grid=(B, Np // chunk),
        in_specs=[chunk_spec, cls_spec, chunk_spec, cls_spec, vec_spec,
                  vec_spec, wqkv_spec, vec_spec, vec_spec, vec_spec,
                  wproj_spec, lse_spec, cls_spec] + extra_in_specs,
        out_specs=(chunk_spec, cls_spec, wqkv_spec, vec_spec, vec_spec,
                   vec_spec, wproj_spec, vec_spec, vec_spec, vec_spec),
        out_shape=(jax.ShapeDtypeStruct((B, T, Np, D), x.dtype),
                   jax.ShapeDtypeStruct((B, 1, D), x.dtype),
                   jax.ShapeDtypeStruct((D, 3 * D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((D, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((num_heads, d), jnp.float32)] * 3,
        compiler_params=_compiler_params(vmem_limit_mb),
        interpret=interpret,
    )(g_p, g_cls, x_p, x_cls, ln_scale.reshape(1, D), ln_bias.reshape(1, D),
      wqkv, b3[0:1], b3[1:2], b3[2:3], wproj, lse, attn_cls.reshape(B, 1, D),
      *extra_ins)
    (dx_p, dx_cls, dwqkv, dbq, dbk, dbv, dwproj, dbproj, dls, dlb) = outs
    dx = jnp.concatenate([dx_cls, dx_p[:, :, :N].reshape(B, T * N, D)], axis=1)
    dbqkv = jnp.concatenate([dbq[0], dbk[0], dbv[0]])
    return dx, dls[0], dlb[0], dwqkv, dbqkv, dwproj, dbproj[0]


def make_time_subpath(num_frames: int, patches_per_frame: int, num_heads: int,
                      chunk: int = 64, save_acts: bool = True,
                      save_probs: bool = False,
                      vmem_limit_mb: int = 100,
                      interpret: bool = False):
    """Differentiable fused time sub-path (residual included):
    f(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj) -> x + TimeAttn path.

    save_acts: see make_space_subpath. save_probs (requires save_acts): the
    forward also saves the per-frame normalized softmax probs
    ([B,T,H,T+1,Np] bf16) so the backward skips the per-t l/exp/denom
    chain. vmem_limit_mb: scoped-VMEM ceiling for the Mosaic pipeliner —
    the 100 MB default is a soft compiler budget, not the v5e's 128 MB
    physical VMEM; the backward's f32 weight-grad accumulators are
    chunk-independent (~26 MB at D=768, ~66 MB at D=1280), so H/14
    (D=1280) needs chunk<=16 AND limit 120 to fit (measured round 4)."""
    T, N, H = num_frames, patches_per_frame, num_heads

    @jax.custom_vjp
    def f(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj):
        # smv pinned to "base": the undifferentiated primal must compute the
        # same function as fwd (whose saves force the exact base softmax) —
        # the extraction-only clamp default must not leak in here via env
        return fused_time_attention_block_v2(
            x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, num_frames=T,
            patches_per_frame=N, num_heads=H, chunk=chunk,
            vmem_limit_mb=vmem_limit_mb, smv="base", interpret=interpret)

    def fwd(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj):
        outs = fused_time_attention_block_v2(
            x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, num_frames=T,
            patches_per_frame=N, num_heads=H, chunk=chunk, save_stats=True,
            save_acts=save_acts, save_probs=save_probs and save_acts,
            vmem_limit_mb=vmem_limit_mb, interpret=interpret)
        probs_saved = None
        if save_acts and save_probs:
            out, lse, acls, q, k, v, attn, probs_saved = outs
            acts_saved = (q, k, v, attn)
        elif save_acts:
            out, lse, acls, q, k, v, attn = outs
            acts_saved = (q, k, v, attn)
        else:
            out, lse, acls = outs
            acts_saved = None
        return out, (x, ln_scale, ln_bias, wqkv, bqkv, wproj, lse, acls,
                     acts_saved, probs_saved)

    def bwd(res, g):
        (x, ln_scale, ln_bias, wqkv, bqkv, wproj, lse, acls, acts_saved,
         probs_saved) = res
        dx, dls, dlb, dwqkv, dbqkv, dwproj, dbproj = \
            fused_time_attention_block_v2_bwd(
                g, x, ln_scale, ln_bias, wqkv, bqkv, wproj, lse, acls,
                num_frames=T, patches_per_frame=N, num_heads=H, chunk=chunk,
                acts_saved=acts_saved, probs_saved=probs_saved,
                vmem_limit_mb=vmem_limit_mb, interpret=interpret)
        return (dx, dls.astype(ln_scale.dtype), dlb.astype(ln_bias.dtype),
                dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
                dwproj.astype(wproj.dtype), dbproj.astype(bqkv.dtype))

    f.defvjp(fwd, bwd)
    return f


# ---------------------------------------------------------------------------
# v3 SPACE backward: d-major, head-batched (see the v3 forward's rationale in
# ops/pallas_block_attention.py). Consumes the TRANSPOSED activations saved
# by fused_space_attention_block_v3 and accumulates the qkv weight/bias/LN
# gradients in transposed orientation (fixed up XLA-side by the wrapper).
# ---------------------------------------------------------------------------


def _make_space_bwd_kernel_v3(H: int, use_saved: bool = True,
                              use_probs: bool = False):
    def kernel(g_ref, gcls_ref, x_ref, cls_ref, ln_sT_ref, ln_bT_ref,
               wqkvT_ref, wqkv_ref, bqT_ref, bkT_ref, bvT_ref, wproj_ref,
               lse_ref, aclsT_ref, *rest):
        """Grid (B, T), t minor. use_probs: consume the forward-saved
        softmax state instead of recomputing logits + softmax."""
        if use_saved:
            qT_ref, kT_ref, vT_ref, attnT_ref = rest[:4]
            rest = rest[4:]
        if use_probs:
            p_ref, pcls_ref, den_ref = rest[:3]
            rest = rest[3:]
        (dx_ref, dxcls_ref, dwqkvT_ref, dbqT_ref, dbkT_ref, dbvT_ref,
         dwproj_ref, dbproj_ref, dlsT_ref, dlbT_ref,
         dqc_scr, dck_scr, dcv_scr) = rest
        N = x_ref.shape[2]
        D = x_ref.shape[3]
        d = D // H
        t = pl.program_id(1)
        f32 = jnp.float32
        dtype = x_ref.dtype
        first = (pl.program_id(0) == 0) & (t == 0)

        @pl.when(first)
        def _zero():
            for ref in (dwqkvT_ref, dbqT_ref, dbkT_ref, dbvT_ref, dwproj_ref,
                        dbproj_ref, dlsT_ref, dlbT_ref):
                ref[...] = jnp.zeros_like(ref)

        @pl.when(t == 0)
        def _reset_cls():
            dqc_scr[...] = jnp.zeros_like(dqc_scr)
            dck_scr[...] = jnp.zeros_like(dck_scr)
            dcv_scr[...] = jnp.zeros_like(dcv_scr)

        ln_sT = ln_sT_ref[:].astype(f32)
        ln_bT = ln_bT_ref[:].astype(f32)
        bqT = bqT_ref[:].astype(f32)
        bkT = bkT_ref[:].astype(f32)
        bvT = bvT_ref[:].astype(f32)
        scale = jnp.asarray(d, f32) ** -0.5

        def lnT_fwd(tT):
            tf = tT.astype(f32)
            mu = jnp.mean(tf, axis=0, keepdims=True)
            var = jnp.mean(jnp.square(tf - mu), axis=0, keepdims=True)
            rstd = jax.lax.rsqrt(var + 1e-5)
            xhat = (tf - mu) * rstd
            return xhat * ln_sT + ln_bT, xhat, rstd

        xT = x_ref[0, 0].T                                 # [D, N]
        clsT = cls_ref[0].T                                # [D, 1]
        x_lnT_f, xhatT, rstdT = lnT_fwd(xT)
        x_lnT = x_lnT_f.astype(dtype)
        cls_lnT_f, xhat_cT, rstd_cT = lnT_fwd(clsT)
        cls_lnT = cls_lnT_f.astype(dtype)

        if use_saved:
            qT = qT_ref[0, 0]
            kT = kT_ref[0, 0]
            vT = vT_ref[0, 0]
        else:
            qkvT = jnp.dot(wqkvT_ref[:], x_lnT, preferred_element_type=f32)
            qT = ((qkvT[:D] + bqT) * scale).astype(dtype)
            kT = (qkvT[D:2 * D] + bkT).astype(dtype)
            vT = (qkvT[2 * D:] + bvT).astype(dtype)
        qkv_cT = jnp.dot(wqkvT_ref[:], cls_lnT, preferred_element_type=f32)
        qc3 = ((qkv_cT[:D] + bqT) * scale).reshape(H, d, 1)
        kc3 = (qkv_cT[D:2 * D] + bkT).reshape(H, d, 1)
        vc3 = (qkv_cT[2 * D:] + bvT).reshape(H, d, 1)

        q3 = qT.reshape(H, d, N)
        k3 = kT.reshape(H, d, N)
        v3 = vT.reshape(H, d, N)
        k3f = k3.astype(f32)
        v3f = v3.astype(f32)
        CONTRACT_D = (((1,), (1,)), ((0,), (0,)))
        CONTRACT_NK = (((2,), (2,)), ((0,), (0,)))
        CONTRACT_Q_LHS2 = (((2,), (1,)), ((0,), (0,)))     # lhs lanes x rhs Nq

        g_p = g_ref[0, 0]                                  # [N, D] dtype
        gT = g_p.T                                         # [D, N]
        dattnT = jnp.dot(wproj_ref[:], gT,
                         preferred_element_type=f32)       # [D, N]
        dout3 = dattnT.reshape(H, d, N)
        dout_b = dout3.astype(dtype)
        gcls = gcls_ref[0]                                 # [1, D]
        dattn_cT = jnp.dot(wproj_ref[:], gcls.T,
                           preferred_element_type=f32)     # [D, 1]
        dout_c3 = dattn_cT.reshape(H, d, 1)
        acls3 = aclsT_ref[0].reshape(H, d, 1)              # fp32
        lse3 = lse_ref[0].T                                # [H, 1]

        # Normalization folded out of the N^2 passes (see the v9 backward):
        # dots consume RAW probs p and the per-query 1/denom rides the
        # [d, N]-sized operands/results instead.
        if use_probs:
            # forward-saved softmax state: no logits matmul, no exp chain
            recip = 1.0 / den_ref[0, 0]                    # [H, Nq]
            p_b = p_ref[0, 0]                              # bf16 saved
            p_f = p_b.astype(f32)
            pcls_raw = pcls_ref[0, 0]                      # [H, Nq]
        else:
            # recompute probs (head-batched)
            logits = jax.lax.dot_general(q3, k3, CONTRACT_D,
                                         preferred_element_type=f32)
            cls_l = jnp.sum(q3.astype(f32) * kc3, axis=1)  # [H, Nq]
            m = jnp.maximum(jnp.max(logits, axis=-1), cls_l)
            p_f = jnp.exp(logits - m[..., None])
            pcls_raw = jnp.exp(cls_l - m)
            denom = jnp.sum(p_f, axis=-1) + pcls_raw
            recip = 1.0 / denom
            p_b = p_f.astype(dtype)
        pn_cls = pcls_raw * recip                          # [H, Nq]

        if use_saved:
            attn_T = attnT_ref[0, 0]
            o3 = attn_T.astype(f32).reshape(H, d, N)
        else:
            o3 = (jax.lax.dot_general(v3, p_b, CONTRACT_NK,
                                      preferred_element_type=f32)
                  + vc3 * pcls_raw[:, None, :]) * recip[:, None, :]
            attn_T = o3.astype(dtype).reshape(D, N)
        dwproj_ref[...] += jnp.dot(attn_T, g_p,
                                   preferred_element_type=f32)
        dbproj_ref[...] += jnp.sum(g_p.astype(f32), axis=0, keepdims=True)

        # value grads (raw p with dout pre-scaled by the query-side 1/denom)
        dout_scaled = (dout3 * recip[:, None, :]).astype(dtype)
        dv3 = jax.lax.dot_general(dout_scaled, p_b, CONTRACT_Q_LHS2,
                                  preferred_element_type=f32)  # [H, d, Nk]
        dcv_scr[...] += jnp.sum(dout3 * pn_cls[:, None, :], axis=2,
                                keepdims=True)
        # prob grads + softmax bwd
        dp = jax.lax.dot_general(dout_b, v3, CONTRACT_D,
                                 preferred_element_type=f32)   # [H, Nq, Nk]
        dp_cls = jnp.sum(dout3 * vc3, axis=1)              # [H, Nq]
        # flash-delta identity: the pn-weighted rowsum == dout . o (a
        # d-sublane reduce instead of an N^2 multiply + lane reduce)
        rowsum = jnp.sum(dout3 * o3, axis=1)               # [H, Nq]
        e_b = (p_f * (dp - rowsum[..., None])).astype(dtype)
        ds_cls = pn_cls * (dp_cls - rowsum)                # [H, Nq]
        dq3 = jax.lax.dot_general(k3, e_b, CONTRACT_NK,
                                  preferred_element_type=f32) \
            * recip[:, None, :] + kc3 * ds_cls[:, None, :]  # [H, d, Nq]
        q_scaled = (q3.astype(f32) * recip[:, None, :]).astype(dtype)
        dk3 = jax.lax.dot_general(q_scaled, e_b, CONTRACT_Q_LHS2,
                                  preferred_element_type=f32)  # [H, d, Nk]
        dck_scr[...] += jnp.sum(q3.astype(f32) * ds_cls[:, None, :], axis=2,
                                keepdims=True)

        # CLS row contribution from this frame's keys
        delta3 = jnp.sum(acls3 * dout_c3, axis=1)          # [H, 1]
        lrow = jnp.sum(k3f * qc3, axis=1)                  # [H, Nk]
        pn_row = jnp.exp(lrow - lse3)                      # [H, Nk]
        dv3 = dv3 + pn_row[:, None, :] * dout_c3
        dp_row = jnp.sum(v3f * dout_c3, axis=1)            # [H, Nk]
        ds_row = pn_row * (dp_row - delta3)                # [H, Nk]
        dqc_scr[...] += jnp.sum(k3f * ds_row[:, None, :], axis=2,
                                keepdims=True)
        dk3 = dk3 + qc3 * ds_row[:, None, :]

        @pl.when(t == 0)
        def _self():
            p_self = jnp.exp(jnp.sum(qc3 * kc3, axis=1) - lse3)  # [H, 1]
            dcv_scr[...] += p_self[..., None] * dout_c3
            dp_self = jnp.sum(vc3 * dout_c3, axis=1)       # [H, 1]
            ds_self = p_self * (dp_self - delta3)          # [H, 1]
            dqc_scr[...] += ds_self[..., None] * kc3
            dck_scr[...] += ds_self[..., None] * qc3

        dqT = dq3.reshape(D, N) * scale                    # fp32
        dkT = dk3.reshape(D, N)
        dvT = dv3.reshape(D, N)
        dqkvT = jnp.concatenate([dqT, dkT, dvT], axis=0).astype(dtype)
        x_ln = x_lnT.T                                     # [N, D]
        dwqkvT_ref[...] += jnp.dot(dqkvT, x_ln,
                                   preferred_element_type=f32)
        dbqT_ref[...] += jnp.sum(dqT, axis=1, keepdims=True)
        dbkT_ref[...] += jnp.sum(dkT, axis=1, keepdims=True)
        dbvT_ref[...] += jnp.sum(dvT, axis=1, keepdims=True)

        dxlnT = jnp.dot(wqkv_ref[:], dqkvT,
                        preferred_element_type=f32)        # [D, N]
        dlsT_ref[...] += jnp.sum(dxlnT * xhatT, axis=1, keepdims=True)
        dlbT_ref[...] += jnp.sum(dxlnT, axis=1, keepdims=True)
        dxhatT = dxlnT * ln_sT
        m1 = jnp.mean(dxhatT, axis=0, keepdims=True)       # [1, N]
        m2 = jnp.mean(dxhatT * xhatT, axis=0, keepdims=True)
        dxT = (dxhatT - m1 - xhatT * m2) * rstdT
        dx_ref[0, 0] = dxT.T.astype(dx_ref.dtype)

        @pl.when(t == pl.num_programs(1) - 1)
        def _finish_cls():
            dqcT = dqc_scr[...].reshape(D, 1) * scale      # fp32
            dkcT = dck_scr[...].reshape(D, 1)
            dvcT = dcv_scr[...].reshape(D, 1)
            dqkv_cT = jnp.concatenate([dqcT, dkcT, dvcT], axis=0).astype(dtype)
            cls_ln_row = cls_lnT.T                         # [1, D]
            dwqkvT_ref[...] += jnp.dot(dqkv_cT, cls_ln_row,
                                       preferred_element_type=f32)
            dbqT_ref[...] += dqcT
            dbkT_ref[...] += dkcT
            dbvT_ref[...] += dvcT
            dwproj_ref[...] += jnp.dot(aclsT_ref[0].astype(dtype), gcls,
                                       preferred_element_type=f32)
            dbproj_ref[...] += gcls.astype(f32)
            dxln_cT = jnp.dot(wqkv_ref[:], dqkv_cT,
                              preferred_element_type=f32)  # [D, 1]
            dlsT_ref[...] += dxln_cT * xhat_cT
            dlbT_ref[...] += dxln_cT
            dxhat_c = dxln_cT * ln_sT
            m1c = jnp.mean(dxhat_c, axis=0, keepdims=True)
            m2c = jnp.mean(dxhat_c * xhat_cT, axis=0, keepdims=True)
            dxcT = (dxhat_c - m1c - xhat_cT * m2c) * rstd_cT
            dxcls_ref[0] = dxcT.T.astype(dxcls_ref.dtype)

    return kernel


def fused_space_attention_block_v3_bwd(g, x, ln_scale, ln_bias, wqkv, bqkv,
                                       wproj, lse, attn_clsT, num_frames: int,
                                       patches_per_frame: int, num_heads: int,
                                       acts_saved=None, probs_saved=None,
                                       interpret: bool = False):
    """Backward matching fused_space_attention_block_v3 (acts_saved holds the
    TRANSPOSED qT/kT/vT/attnT [B,T,D,N]; attn_clsT is [B,D,1]; probs_saved
    optionally holds the forward's (p, p_cls, denom))."""
    B, S, D = x.shape
    T, N = num_frames, patches_per_frame
    d = D // num_heads
    assert S == 1 + T * N

    g_cls, g_p = g[:, :1], g[:, 1:].reshape(B, T, N, D)
    x_cls, x_p = x[:, :1], x[:, 1:].reshape(B, T, N, D)
    b3 = bqkv.reshape(3, D)

    frame_spec = pl.BlockSpec((1, 1, N, D), lambda b, t: (b, t, 0, 0),
                              memory_space=pltpu.VMEM)
    frameT_spec = pl.BlockSpec((1, 1, D, N), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    clsT_spec = pl.BlockSpec((1, D, 1), lambda b, t: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    vecT_spec = pl.BlockSpec((D, 1), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, D), lambda b, t: (0, 0),
                            memory_space=pltpu.VMEM)
    wqkvT_spec = pl.BlockSpec((3 * D, D), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((D, 3 * D), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    wproj_spec = pl.BlockSpec((D, D), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, 1, num_heads), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    extra_in_specs = [frameT_spec] * 4 if acts_saved is not None else []
    extra_ins = tuple(acts_saved) if acts_saved is not None else ()
    if probs_saved is not None:
        H = num_heads
        extra_in_specs += [
            pl.BlockSpec((1, 1, H, N, N), lambda b, t: (b, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H, N), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H, N), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM)]
        extra_ins += tuple(probs_saved)
    outs = pl.pallas_call(
        _make_space_bwd_kernel_v3(num_heads,
                                  use_saved=acts_saved is not None,
                                  use_probs=probs_saved is not None),
        grid=(B, T),
        in_specs=[frame_spec, cls_spec, frame_spec, cls_spec, vecT_spec,
                  vecT_spec, wqkvT_spec, wqkv_spec, vecT_spec, vecT_spec,
                  vecT_spec, wproj_spec, lse_spec, clsT_spec]
        + extra_in_specs,
        out_specs=(frame_spec, cls_spec, wqkvT_spec, vecT_spec, vecT_spec,
                   vecT_spec, wproj_spec, vec_spec, vecT_spec, vecT_spec),
        out_shape=(jax.ShapeDtypeStruct((B, T, N, D), x.dtype),
                   jax.ShapeDtypeStruct((B, 1, D), x.dtype),
                   jax.ShapeDtypeStruct((3 * D, D), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((num_heads, d, 1), jnp.float32)] * 3,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(g_p, g_cls, x_p, x_cls, ln_scale.reshape(D, 1), ln_bias.reshape(D, 1),
      wqkv.T, wqkv, b3[0].reshape(D, 1), b3[1].reshape(D, 1),
      b3[2].reshape(D, 1), wproj, lse, attn_clsT, *extra_ins)
    (dx_p, dx_cls, dwqkvT, dbqT, dbkT, dbvT, dwproj, dbproj, dlsT,
     dlbT) = outs
    dx = jnp.concatenate([dx_cls, dx_p.reshape(B, T * N, D)], axis=1)
    dbqkv = jnp.concatenate([dbqT[:, 0], dbkT[:, 0], dbvT[:, 0]])
    return (dx, dlsT[:, 0], dlbT[:, 0], dwqkvT.T, dbqkv, dwproj, dbproj[0])


def make_space_subpath_v3(num_frames: int, patches_per_frame: int,
                          num_heads: int, save_probs: bool = False,
                          interpret: bool = False):
    """d-major head-batched differentiable space sub-path (v3 fwd + bwd).
    Same contract as make_space_subpath. save_probs additionally saves the
    forward softmax state ([B,T,H,N,N] bf16 + two [B,T,H,N]) so the backward
    skips the logits matmul + softmax recompute."""
    from tvts_tpu.ops.pallas_block_attention import fused_space_attention_block_v3

    T, N, H = num_frames, patches_per_frame, num_heads

    @jax.custom_vjp
    def f(x, base, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj):
        return fused_space_attention_block_v3(
            x, base, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
            num_frames=T, patches_per_frame=N, num_heads=H,
            interpret=interpret)

    def fwd(x, base, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj):
        outs = fused_space_attention_block_v3(
            x, base, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
            num_frames=T, patches_per_frame=N, num_heads=H, save_stats=True,
            save_acts=True, save_probs=save_probs, interpret=interpret)
        out, lse, aclsT = outs[0], outs[1], outs[2]
        return out, (x, ln_scale, ln_bias, wqkv, bqkv, wproj, lse, aclsT,
                     tuple(outs[3:7]),
                     tuple(outs[7:]) if save_probs else None)

    def bwd(res, g):
        (x, ln_scale, ln_bias, wqkv, bqkv, wproj, lse, aclsT, acts,
         probs) = res
        dx, dls, dlb, dwqkv, dbqkv, dwproj, dbproj = \
            fused_space_attention_block_v3_bwd(
                g, x, ln_scale, ln_bias, wqkv, bqkv, wproj, lse, aclsT,
                num_frames=T, patches_per_frame=N, num_heads=H,
                acts_saved=acts, probs_saved=probs, interpret=interpret)
        return (dx, g, dls.astype(ln_scale.dtype), dlb.astype(ln_bias.dtype),
                dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
                dwproj.astype(wproj.dtype), dbproj.astype(bqkv.dtype))

    f.defvjp(fwd, bwd)
    return f


# ---------------------------------------------------------------------------
# v3 TIME backward: d-major saves, head-batched, transpose-light.
#
# The v2 time backward rebuilds [H, T, d, Nc] head tiles with per-head
# swapaxes+stack for FOUR tensors (q/k/v/dattn) and transposes THREE gradient
# tensors back to row-major (to_flat) — ~7 full-tensor lane<->sublane
# transpose sets per program. Here the forward saves q/k/v/attn d-major
# ([B, T, D, Np], written from head tiles it already holds), the head tiles
# come back via sublane-split reshapes + leading-dim transposes (no
# lane<->sublane traffic), and the weight gradients contract per frame in
# d-major/lhsT-native orientation. Only two lane<->sublane transpose sets
# remain per program: dattn row-major -> d-major and dxln back. The softmax
# chain stays H-leading ([H, T+1, Nc], axis-1 reductions) — T-leading axis-0
# reductions of 3D vectors hit Mosaic "Unsupported output implicit dimension"
# in context (standalone probes pass; tools/mosaic_probe.py).
# Same recipe that took the space backward 110.8 -> 90.3 ms (v3 space).
# ---------------------------------------------------------------------------


def _make_time_bwd_kernel_v3(H: int, T: int, N: int):
    def kernel(g_ref, gcls_ref, x_ref, cls_ref, ln_s_ref, ln_b_ref,
               wqkv_ref, bq_ref, bk_ref, bv_ref, wprojT_ref,
               lse_ref, acls_ref, qT_ref, kT_ref, vT_ref, attnT_ref,
               dx_ref, dxcls_ref, dwqkvT_ref, dbq_hd_ref, dbk_hd_ref,
               dbv_hd_ref, dwproj_ref, dbproj_ref, dls_ref, dlb_ref,
               dqc_scr, dck_scr, dcv_scr):
        """Grid (B, C), c minor. Residual folded (dx = g + LN path)."""
        Nc = x_ref.shape[2]
        D = x_ref.shape[3]
        d = D // H
        c = pl.program_id(1)
        f32 = jnp.float32
        dtype = x_ref.dtype
        first = (pl.program_id(0) == 0) & (c == 0)

        @pl.when(first)
        def _zero():
            for ref in (dwqkvT_ref, dbq_hd_ref, dbk_hd_ref, dbv_hd_ref,
                        dwproj_ref, dbproj_ref, dls_ref, dlb_ref):
                ref[...] = jnp.zeros_like(ref)

        @pl.when(c == 0)
        def _reset_cls():
            dqc_scr[...] = jnp.zeros_like(dqc_scr)
            dck_scr[...] = jnp.zeros_like(dck_scr)
            dcv_scr[...] = jnp.zeros_like(dcv_scr)

        ln_s = ln_s_ref[0].astype(f32)
        ln_b = ln_b_ref[0].astype(f32)
        bq = bq_ref[:].astype(f32)
        bk = bk_ref[:].astype(f32)
        bv = bv_ref[:].astype(f32)
        scale = jnp.asarray(d, f32) ** -0.5

        # ---- recompute LN (row-major; x/g/dx stay row-major) --------------
        x_flat = x_ref[0].reshape(T * Nc, D)
        x_ln_f, xhat, rstd = _ln_fwd(x_flat, ln_s, ln_b)
        x_ln = x_ln_f.astype(dtype)
        cls_ln_f, xhat_c, rstd_c = _ln_fwd(cls_ref[0], ln_s, ln_b)
        cls_ln = cls_ln_f.astype(dtype)

        # saved d-major activations -> [H, T, d, Nc] head tiles (sublane
        # split + leading transpose; no lane<->sublane traffic)
        def heads(ref):
            return jnp.transpose(ref[0].reshape(T, H, d, Nc),
                                 (1, 0, 2, 3)).astype(f32)

        q4 = heads(qT_ref)
        k4 = heads(kT_ref)
        v4 = heads(vT_ref)

        # CLS q/k/v recomputed row-major, reshaped to [H, d, 1]
        qc = (jnp.dot(cls_ln, wqkv_ref[:, :D],
                      preferred_element_type=f32) + bq) * scale    # [1, D]
        kc = jnp.dot(cls_ln, wqkv_ref[:, D:2 * D],
                     preferred_element_type=f32) + bk
        vc = jnp.dot(cls_ln, wqkv_ref[:, 2 * D:],
                     preferred_element_type=f32) + bv
        qc4 = qc.T.reshape(H, d, 1)
        kc4 = kc.T.reshape(H, d, 1)
        vc4 = vc.T.reshape(H, d, 1)

        # upstream grads: one row-major reprojection matmul, one transpose set
        g_flat = g_ref[0].reshape(T * Nc, D)
        dattn = jnp.dot(g_flat, wprojT_ref[:],
                        preferred_element_type=f32)       # [T*Nc, D]
        dout4 = jnp.transpose(
            jnp.swapaxes(dattn.astype(dtype).reshape(T, Nc, D), -1, -2)
            .reshape(T, H, d, Nc), (1, 0, 2, 3)).astype(f32)  # [H, T, d, Nc]
        gcls = gcls_ref[0]                                # [1, D]
        dattn_c = jnp.dot(gcls, wprojT_ref[:],
                          preferred_element_type=f32)     # [1, D]
        dout_c4 = dattn_c.T.reshape(H, d, 1)
        acls4 = acls_ref[0].T.reshape(H, d, 1)            # fp32
        lse2 = lse_ref[0].T                               # [H, 1]
        lse4 = lse2[..., None]                            # [H, 1, 1]

        loc = jax.lax.broadcasted_iota(jnp.int32, (T, Nc), 1) + c * Nc
        valid = loc < N                                   # [T, Nc]

        # ---- attention backward (H-leading, v2 math on v3 layout) ----------
        dk4 = jnp.zeros_like(k4)
        dv4 = jnp.zeros_like(v4)
        dq_ts = []
        for t in range(T):
            qt = q4[:, t]                                 # [H, d, Nc]
            l = jnp.sum(qt[:, None] * k4, axis=2)         # [H, T, Nc]
            cls_l = jnp.sum(qt * kc4, axis=1)[:, None]    # [H, 1, Nc]
            full = jnp.concatenate([cls_l, l], axis=1)    # [H, T+1, Nc]
            m = jnp.max(full, axis=1, keepdims=True)
            p = jnp.exp(full - m)
            denom = jnp.sum(p, axis=1, keepdims=True)
            pn = p / denom                                # [H, T+1, Nc]

            dout_t = dout4[:, t]                          # [H, d, Nc]
            dv4 = dv4 + pn[:, 1:][:, :, None] * dout_t[:, None]
            dcv_scr[...] += jnp.sum(pn[:, 0][:, None, :] * dout_t, axis=2,
                                    keepdims=True)
            dp = jnp.sum(v4 * dout_t[:, None], axis=2)    # [H, T, Nc]
            dp_cls = jnp.sum(vc4 * dout_t, axis=1)[:, None]   # [H, 1, Nc]
            full_dp = jnp.concatenate([dp_cls, dp], axis=1)
            rowsum = jnp.sum(pn * full_dp, axis=1, keepdims=True)
            ds = pn * (full_dp - rowsum)                  # [H, T+1, Nc]
            dq_ts.append(jnp.sum(ds[:, 1:][:, :, None] * k4, axis=1)
                         + ds[:, 0][:, None, :] * kc4)    # [H, d, Nc]
            dk4 = dk4 + ds[:, 1:][:, :, None] * qt[:, None]
            dck_scr[...] += jnp.sum(ds[:, 0][:, None, :] * qt, axis=2,
                                    keepdims=True)

        # ---- CLS row over this chunk's (valid) keys ------------------------
        delta4 = jnp.sum(acls4 * dout_c4, axis=1, keepdims=True)  # [H, 1, 1]
        lrow = jnp.sum(k4 * qc4[:, None], axis=2)         # [H, T, Nc]
        pn_row = jnp.where(valid[None], jnp.exp(lrow - lse4), 0.0)
        dv4 = dv4 + pn_row[:, :, None, :] * dout_c4[:, None]
        dp_row = jnp.sum(v4 * dout_c4[:, None], axis=2)   # [H, T, Nc]
        ds_row = pn_row * (dp_row - delta4)
        dqc_scr[...] += jnp.sum(ds_row[:, :, None, :] * k4,
                                axis=(1, 3))[:, :, None]
        dk4 = dk4 + ds_row[:, :, None, :] * qc4[:, None]

        @pl.when(c == 0)
        def _self():
            p_self = jnp.exp(jnp.sum(qc4 * kc4, axis=1) - lse2)   # [H, 1]
            dcv_scr[...] += p_self[..., None] * dout_c4
            dp_self = jnp.sum(vc4 * dout_c4, axis=1)      # [H, 1]
            ds_self = p_self * (dp_self - delta4[:, :, 0])
            dqc_scr[...] += ds_self[..., None] * kc4
            dck_scr[...] += ds_self[..., None] * qc4

        # ---- projection grads (saved d-major attn; g row-major) ------------
        for t in range(T):
            dwproj_ref[...] += jnp.dot(attnT_ref[0, t], g_ref[0, t],
                                       preferred_element_type=f32)
        dbproj_ref[...] += jnp.sum(g_flat.astype(f32), axis=0, keepdims=True)

        # ---- qkv weight/bias/input grads, per frame d-major ----------------
        dq4 = jnp.stack(dq_ts, axis=1) * scale            # [H, T, d, Nc] f32
        dbq_hd_ref[...] += jnp.sum(dq4, axis=(1, 3))
        dbk_hd_ref[...] += jnp.sum(dk4, axis=(1, 3))
        dbv_hd_ref[...] += jnp.sum(dv4, axis=(1, 3))

        # [H,T,d,Nc] -> [T,D,Nc] (leading transpose + sublane merge)
        def to_tdn(a4):
            return jnp.transpose(a4, (1, 0, 2, 3)).reshape(T, D, Nc)

        dqT = to_tdn(dq4)
        dkT = to_tdn(dk4)
        dvT = to_tdn(dv4)

        dxln_rows = []
        for t in range(T):
            dqkvT_t = jnp.concatenate([dqT[t], dkT[t], dvT[t]],
                                      axis=0).astype(dtype)       # [3D, Nc]
            x_ln_t = x_ln[t * Nc:(t + 1) * Nc]                    # [Nc, D]
            dwqkvT_ref[...] += jnp.dot(dqkvT_t, x_ln_t,
                                       preferred_element_type=f32)
            dxlnT_t = jnp.dot(wqkv_ref[:], dqkvT_t,
                              preferred_element_type=f32)         # [D, Nc]
            dxln_rows.append(dxlnT_t.T)                           # [Nc, D]
        dxln = jnp.concatenate(dxln_rows, axis=0)                 # [T*Nc, D]

        dls_ref[...] += jnp.sum(dxln * xhat, axis=0, keepdims=True)
        dlb_ref[...] += jnp.sum(dxln, axis=0, keepdims=True)
        # residual folded in the forward: dx = g + LN path
        dx = g_flat.astype(f32) + _ln_bwd(dxln, xhat, rstd, ln_s)
        dx_ref[0] = dx.reshape(T, Nc, D).astype(dx_ref.dtype)

        @pl.when(c == pl.num_programs(1) - 1)
        def _finish_cls():
            dqcT = dqc_scr[...].reshape(D, 1) * scale     # fp32
            dkcT = dck_scr[...].reshape(D, 1)
            dvcT = dcv_scr[...].reshape(D, 1)
            dqkv_cT = jnp.concatenate([dqcT, dkcT, dvcT], axis=0).astype(dtype)
            dwqkvT_ref[...] += jnp.dot(dqkv_cT, cls_ln,
                                       preferred_element_type=f32)
            dbq_hd_ref[...] += dqc_scr[..., 0] * scale
            dbk_hd_ref[...] += dck_scr[..., 0]
            dbv_hd_ref[...] += dcv_scr[..., 0]
            dwproj_ref[...] += jnp.dot(acls_ref[0].astype(dtype).T, gcls,
                                       preferred_element_type=f32)
            dbproj_ref[...] += gcls.astype(f32)
            dxln_c = jnp.dot(wqkv_ref[:], dqkv_cT,
                             preferred_element_type=f32).T        # [1, D]
            dls_ref[...] += jnp.sum(dxln_c * xhat_c, axis=0, keepdims=True)
            dlb_ref[...] += jnp.sum(dxln_c, axis=0, keepdims=True)
            dxcls_ref[0] = (gcls.astype(f32)
                            + _ln_bwd(dxln_c, xhat_c, rstd_c, ln_s)) \
                .astype(dxcls_ref.dtype)

    return kernel


def fused_time_attention_block_v3_bwd(g, x, ln_scale, ln_bias, wqkv, bqkv,
                                      wproj, lse, attn_cls, acts_saved,
                                      num_frames: int, patches_per_frame: int,
                                      num_heads: int, chunk: int = 128,
                                      interpret: bool = False):
    """Backward matching the v2 time forward with save_transposed=True
    (acts_saved holds the d-major qT/kT/vT/attnT [B,T,D,Np])."""
    B, S, D = x.shape
    T, N = num_frames, patches_per_frame
    H = num_heads
    d = D // H
    assert S == 1 + T * N

    g_cls, g_p = g[:, :1], g[:, 1:].reshape(B, T, N, D)
    x_cls, x_p = x[:, :1], x[:, 1:].reshape(B, T, N, D)
    n_pad = (-N) % chunk
    if n_pad:
        pad = ((0, 0), (0, 0), (0, n_pad), (0, 0))
        x_p = jnp.pad(x_p, pad)
        g_p = jnp.pad(g_p, pad)
    Np = N + n_pad
    b3 = bqkv.reshape(3, D)

    chunk_spec = pl.BlockSpec((1, T, chunk, D), lambda b, c: (b, 0, c, 0),
                              memory_space=pltpu.VMEM)
    chunkT_spec = pl.BlockSpec((1, T, D, chunk), lambda b, c: (b, 0, 0, c),
                               memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b, c: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, D), lambda b, c: (0, 0),
                            memory_space=pltpu.VMEM)
    hd_spec = pl.BlockSpec((H, d), lambda b, c: (0, 0),
                           memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((D, 3 * D), lambda b, c: (0, 0),
                             memory_space=pltpu.VMEM)
    wqkvT_spec = pl.BlockSpec((3 * D, D), lambda b, c: (0, 0),
                              memory_space=pltpu.VMEM)
    wproj_spec = pl.BlockSpec((D, D), lambda b, c: (0, 0),
                              memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, 1, H), lambda b, c: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        _make_time_bwd_kernel_v3(H, T, N),
        grid=(B, Np // chunk),
        in_specs=[chunk_spec, cls_spec, chunk_spec, cls_spec, vec_spec,
                  vec_spec, wqkv_spec, vec_spec, vec_spec, vec_spec,
                  wproj_spec, lse_spec, cls_spec]
        + [chunkT_spec] * 4,
        out_specs=(chunk_spec, cls_spec, wqkvT_spec, hd_spec, hd_spec,
                   hd_spec, wproj_spec, vec_spec, vec_spec, vec_spec),
        out_shape=(jax.ShapeDtypeStruct((B, T, Np, D), x.dtype),
                   jax.ShapeDtypeStruct((B, 1, D), x.dtype),
                   jax.ShapeDtypeStruct((3 * D, D), jnp.float32),
                   jax.ShapeDtypeStruct((H, d), jnp.float32),
                   jax.ShapeDtypeStruct((H, d), jnp.float32),
                   jax.ShapeDtypeStruct((H, d), jnp.float32),
                   jax.ShapeDtypeStruct((D, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((H, d, 1), jnp.float32)] * 3,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(g_p, g_cls, x_p, x_cls, ln_scale.reshape(1, D), ln_bias.reshape(1, D),
      wqkv, b3[0:1], b3[1:2], b3[2:3], wproj.T, lse,
      attn_cls.reshape(B, 1, D), *acts_saved)
    (dx_p, dx_cls, dwqkvT, dbq_hd, dbk_hd, dbv_hd, dwproj, dbproj, dls,
     dlb) = outs
    dx = jnp.concatenate([dx_cls, dx_p[:, :, :N].reshape(B, T * N, D)], axis=1)
    dbqkv = jnp.concatenate([dbq_hd.reshape(D), dbk_hd.reshape(D),
                             dbv_hd.reshape(D)])
    return dx, dls[0], dlb[0], dwqkvT.T, dbqkv, dwproj, dbproj[0]


def make_time_subpath_v3(num_frames: int, patches_per_frame: int,
                         num_heads: int, chunk: int = 128,
                         interpret: bool = False):
    """d-major T-leading differentiable time sub-path (v2 forward with
    transposed saves + v3 backward). Same contract as make_time_subpath."""
    T, N, H = num_frames, patches_per_frame, num_heads

    @jax.custom_vjp
    def f(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj):
        # smv pinned to "base" — must match fwd's exact save-path math
        return fused_time_attention_block_v2(
            x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, num_frames=T,
            patches_per_frame=N, num_heads=H, chunk=chunk, smv="base",
            interpret=interpret)

    def fwd(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj):
        out, lse, acls, qT, kT, vT, attnT = fused_time_attention_block_v2(
            x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj, num_frames=T,
            patches_per_frame=N, num_heads=H, chunk=chunk, save_stats=True,
            save_acts=True, save_transposed=True, interpret=interpret)
        return out, (x, ln_scale, ln_bias, wqkv, bqkv, wproj, lse, acls,
                     (qT, kT, vT, attnT))

    def bwd(res, g):
        x, ln_scale, ln_bias, wqkv, bqkv, wproj, lse, acls, acts = res
        dx, dls, dlb, dwqkv, dbqkv, dwproj, dbproj = \
            fused_time_attention_block_v3_bwd(
                g, x, ln_scale, ln_bias, wqkv, bqkv, wproj, lse, acls, acts,
                num_frames=T, patches_per_frame=N, num_heads=H, chunk=chunk,
                interpret=interpret)
        return (dx, dls.astype(ln_scale.dtype), dlb.astype(ln_bias.dtype),
                dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
                dwproj.astype(wproj.dtype), dbproj.astype(bqkv.dtype))

    f.defvjp(fwd, bwd)
    return f


# ---------------------------------------------------------------------------
# v5 SPACE backward: frame-batched per-head matmuls, big-K weight grads,
# no in-kernel weight/activation transposes.
#
# The v2 space backward (one frame/program) issues per-head [98,64] matmuls
# and K=98 weight-grad contractions across 384 programs (111 ms/12 blocks);
# the v3 d-major variant fixed the per-head batching but pays lane-pad
# inflation and per-frame K=98 weight grads (90.3 ms). v5 keeps the
# row-major layout, processes FPP frames per program, batches each head's
# attention matmuls over frames (batched dot_general), and contracts the
# weight grads over all FPP*N rows at once in lhsT/A@B^T-native dot_general
# forms (no .T on weights or activations).
# ---------------------------------------------------------------------------


def _make_space_bwd_kernel_v5(H: int, FPP: int):
    def kernel(g_ref, gcls_ref, x_ref, cls_ref, ln_s_ref, ln_b_ref,
               wqkv_ref, bq_ref, bk_ref, bv_ref, wproj_ref,
               lse_ref, acls_ref, q_ref, k_ref, v_ref, attn_ref,
               dx_ref, dxcls_ref, dwqkv_ref, dbq_ref, dbk_ref, dbv_ref,
               dwproj_ref, dbproj_ref, dls_ref, dlb_ref,
               dqc_scr, dck_scr, dcv_scr):
        """Grid (B, T // FPP), t minor."""
        N = x_ref.shape[2]
        D = x_ref.shape[3]
        d = D // H
        t = pl.program_id(1)
        f32 = jnp.float32
        dtype = x_ref.dtype
        first = (pl.program_id(0) == 0) & (t == 0)

        @pl.when(first)
        def _zero():
            for ref in (dwqkv_ref, dbq_ref, dbk_ref, dbv_ref, dwproj_ref,
                        dbproj_ref, dls_ref, dlb_ref):
                ref[...] = jnp.zeros_like(ref)

        @pl.when(t == 0)
        def _reset_cls():
            dqc_scr[...] = jnp.zeros_like(dqc_scr)
            dck_scr[...] = jnp.zeros_like(dck_scr)
            dcv_scr[...] = jnp.zeros_like(dcv_scr)

        ln_s = ln_s_ref[0].astype(f32)
        ln_b = ln_b_ref[0].astype(f32)
        bq = bq_ref[:].astype(f32)
        bk = bk_ref[:].astype(f32)
        bv = bv_ref[:].astype(f32)
        scale = jnp.asarray(d, f32) ** -0.5

        x_flat = x_ref[0].reshape(FPP * N, D)
        x_ln_f, xhat, rstd = _ln_fwd(x_flat, ln_s, ln_b)
        x_ln = x_ln_f.astype(dtype)
        cls_ln_f, xhat_c, rstd_c = _ln_fwd(cls_ref[0], ln_s, ln_b)
        cls_ln = cls_ln_f.astype(dtype)

        # 2D [FPP*N, D] views: elementwise math stays in proven 2D layouts
        # (in-context 3D "Lane broadcast" failures); batched dot_generals get
        # fresh slice+reshape [FPP, N, d] operands
        q = q_ref[0].reshape(FPP * N, D)
        k = k_ref[0].reshape(FPP * N, D)
        v = v_ref[0].reshape(FPP * N, D)
        qc = (jnp.dot(cls_ln, wqkv_ref[:, :D],
                      preferred_element_type=f32) + bq) * scale
        kc = jnp.dot(cls_ln, wqkv_ref[:, D:2 * D],
                     preferred_element_type=f32) + bk
        vc = jnp.dot(cls_ln, wqkv_ref[:, 2 * D:],
                     preferred_element_type=f32) + bv

        g_flat = g_ref[0].reshape(FPP * N, D)
        # dattn = g @ wproj^T without transposing wproj: contract lanes
        dattn_all = jax.lax.dot_general(
            g_flat, wproj_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32)                    # [FPP*N, D]
        dattn2 = dattn_all.astype(dtype)
        gcls = gcls_ref[0]                                 # [1, D]
        dattn_cls = jax.lax.dot_general(
            gcls, wproj_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32)                    # [1, D]
        acls = acls_ref[0]                                 # [1, D] fp32

        BATCH_DD = (((2,), (2,)), ((0,), (0,)))   # contract d, batch frames
        BATCH_PT = (((1,), (1,)), ((0,), (0,)))   # contract queries (probs^T)
        BATCH_PV = (((2,), (1,)), ((0,), (0,)))   # probs x keys-dim operand

        def b3(a2, minor):                         # [FPP*N, m] -> [FPP, N, m]
            return a2.reshape(FPP, N, minor)

        dqs, dks, dvs = [], [], []
        for h in range(H):
            sl = slice(h * d, (h + 1) * d)
            qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]         # [FPP*N, d]
            kch = kc[:, sl]                                   # [1, d] fp32
            vch = vc[:, sl]
            qch = qc[:, sl]
            lse_h = lse_ref[0, 0, h]

            logits = jax.lax.dot_general(b3(qh, d), b3(kh, d), BATCH_DD,
                                         preferred_element_type=f32)
            l2 = logits.reshape(FPP * N, N)
            cls_logit = jnp.dot(qh, kch.astype(dtype).T,
                                preferred_element_type=f32)   # [FPP*N, 1]
            m = jnp.maximum(jnp.max(l2, axis=-1, keepdims=True), cls_logit)
            p = jnp.exp(l2 - m)
            p_cls = jnp.exp(cls_logit - m)
            denom = jnp.sum(p, axis=-1, keepdims=True) + p_cls
            pn = p / denom                                    # [FPP*N, N]
            pn_cls = p_cls / denom                            # [FPP*N, 1]
            pn_b = pn.astype(dtype)

            dout = dattn2[:, sl]                              # [FPP*N, d]
            dout_f = dout.astype(f32)
            dv_h = jax.lax.dot_general(b3(pn_b, N), b3(dout, d), BATCH_PT,
                                       preferred_element_type=f32) \
                .reshape(FPP * N, d)
            dcv_scr[h, :] += jnp.sum(pn_cls * dout_f, axis=0)
            dp = jax.lax.dot_general(b3(dout, d), b3(vh, d), BATCH_DD,
                                     preferred_element_type=f32) \
                .reshape(FPP * N, N)
            dp_cls = jnp.sum(dout_f * vch, axis=-1, keepdims=True)
            rowsum = jnp.sum(pn * dp, axis=-1, keepdims=True) \
                + pn_cls * dp_cls
            ds = pn * (dp - rowsum)
            ds_cls = pn_cls * (dp_cls - rowsum)               # [FPP*N, 1]
            ds_b = ds.astype(dtype)
            dq_h = jax.lax.dot_general(b3(ds_b, N), b3(kh, d), BATCH_PV,
                                       preferred_element_type=f32) \
                .reshape(FPP * N, d) + ds_cls * kch
            dk_h = jax.lax.dot_general(b3(ds_b, N), b3(qh, d), BATCH_PT,
                                       preferred_element_type=f32) \
                .reshape(FPP * N, d)
            dck_scr[h, :] += jnp.sum(ds_cls * qh.astype(f32), axis=0)

            # ---- CLS row contribution from these frames' keys --------------
            dout_c = dattn_cls[:, sl]                         # [1, d] fp32
            delta_h = jnp.sum(acls[:, sl] * dout_c)
            lrow = jnp.dot(kh.astype(f32), qch.T,
                           preferred_element_type=f32)        # [FPP*N, 1]
            pn_row = jnp.exp(lrow - lse_h)
            dv_h = dv_h + pn_row * dout_c
            dp_row = jnp.sum(vh.astype(f32) * dout_c, axis=-1, keepdims=True)
            ds_row = pn_row * (dp_row - delta_h)              # [FPP*N, 1]
            dqc_scr[h, :] += jnp.sum(ds_row * kh.astype(f32), axis=0)
            dk_h = dk_h + ds_row * qch

            @pl.when(t == 0)
            def _self(h=h, qch=qch, kch=kch, vch=vch, dout_c=dout_c,
                      delta_h=delta_h, lse_h=lse_h):
                p_self = jnp.exp(jnp.sum(qch * kch) - lse_h)
                dcv_scr[h, :] += p_self * dout_c[0]
                dp_self = jnp.sum(vch * dout_c)
                ds_self = p_self * (dp_self - delta_h)
                dqc_scr[h, :] += ds_self * kch[0]
                dck_scr[h, :] += ds_self * qch[0]

            dqs.append(dq_h)
            dks.append(dk_h)
            dvs.append(dv_h)

        attn_flat = attn_ref[0].reshape(FPP * N, D)
        # dwproj = attn^T @ g: contract rows (lhsT-native, no transpose)
        dwproj_ref[...] += jax.lax.dot_general(
            attn_flat, g_flat, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
        dbproj_ref[...] += jnp.sum(g_flat.astype(f32), axis=0, keepdims=True)

        dq = jnp.concatenate(dqs, axis=-1) * scale        # [FPP*N, D]
        dk = jnp.concatenate(dks, axis=-1)
        dv = jnp.concatenate(dvs, axis=-1)
        dq_b, dk_b, dv_b = (dq.astype(dtype), dk.astype(dtype),
                            dv.astype(dtype))
        ROWS = (((0,), (0,)), ((), ()))           # contract the token rows
        dwqkv_ref[:, :D] += jax.lax.dot_general(
            x_ln, dq_b, ROWS, preferred_element_type=f32)
        dwqkv_ref[:, D:2 * D] += jax.lax.dot_general(
            x_ln, dk_b, ROWS, preferred_element_type=f32)
        dwqkv_ref[:, 2 * D:] += jax.lax.dot_general(
            x_ln, dv_b, ROWS, preferred_element_type=f32)
        dbq_ref[...] += jnp.sum(dq, axis=0, keepdims=True)
        dbk_ref[...] += jnp.sum(dk, axis=0, keepdims=True)
        dbv_ref[...] += jnp.sum(dv, axis=0, keepdims=True)

        LANES = (((1,), (1,)), ((), ()))          # dqkv @ W^T without .T
        dxln = jax.lax.dot_general(dq_b, wqkv_ref[:, :D], LANES,
                                   preferred_element_type=f32) \
            + jax.lax.dot_general(dk_b, wqkv_ref[:, D:2 * D], LANES,
                                  preferred_element_type=f32) \
            + jax.lax.dot_general(dv_b, wqkv_ref[:, 2 * D:], LANES,
                                  preferred_element_type=f32)
        dls_ref[...] += jnp.sum(dxln * xhat, axis=0, keepdims=True)
        dlb_ref[...] += jnp.sum(dxln, axis=0, keepdims=True)
        dx_ref[0] = _ln_bwd(dxln, xhat, rstd, ln_s) \
            .reshape(FPP, N, D).astype(dx_ref.dtype)

        @pl.when(t == pl.num_programs(1) - 1)
        def _finish_cls():
            dqc_rows = [dqc_scr[h:h + 1, :] for h in range(H)]
            dkc_rows = [dck_scr[h:h + 1, :] for h in range(H)]
            dvc_rows = [dcv_scr[h:h + 1, :] for h in range(H)]
            dqc = jnp.concatenate(dqc_rows, axis=1) * scale   # [1, D]
            dkc = jnp.concatenate(dkc_rows, axis=1)
            dvc = jnp.concatenate(dvc_rows, axis=1)
            dqc_b = dqc.astype(dtype)
            dkc_b = dkc.astype(dtype)
            dvc_b = dvc.astype(dtype)
            dwqkv_ref[:, :D] += jax.lax.dot_general(
                cls_ln, dqc_b, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            dwqkv_ref[:, D:2 * D] += jax.lax.dot_general(
                cls_ln, dkc_b, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            dwqkv_ref[:, 2 * D:] += jax.lax.dot_general(
                cls_ln, dvc_b, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            dbq_ref[...] += dqc
            dbk_ref[...] += dkc
            dbv_ref[...] += dvc
            dwproj_ref[...] += jax.lax.dot_general(
                acls.astype(dtype), gcls, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            dbproj_ref[...] += gcls.astype(f32)
            dxln_c = jax.lax.dot_general(
                dqc_b, wqkv_ref[:, :D], (((1,), (1,)), ((), ())),
                preferred_element_type=f32) \
                + jax.lax.dot_general(
                    dkc_b, wqkv_ref[:, D:2 * D], (((1,), (1,)), ((), ())),
                    preferred_element_type=f32) \
                + jax.lax.dot_general(
                    dvc_b, wqkv_ref[:, 2 * D:], (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
            dls_ref[...] += jnp.sum(dxln_c * xhat_c, axis=0, keepdims=True)
            dlb_ref[...] += jnp.sum(dxln_c, axis=0, keepdims=True)
            dxcls_ref[0] = _ln_bwd(dxln_c, xhat_c, rstd_c,
                                   ln_s).astype(dxcls_ref.dtype)

    return kernel


def fused_space_attention_block_v5_bwd(g, x, ln_scale, ln_bias, wqkv, bqkv,
                                       wproj, lse, attn_cls, acts_saved,
                                       num_frames: int,
                                       patches_per_frame: int,
                                       num_heads: int, fpp: int | None = None,
                                       interpret: bool = False):
    """Backward matching fused_space_attention_block_v5 with save_acts
    (acts_saved: row-major q/k/v/attn [B,T,N,D], q pre-scaled)."""
    B, S, D = x.shape
    T, N = num_frames, patches_per_frame
    H = num_heads
    d = D // H
    assert S == 1 + T * N
    if fpp is None:
        fpp = T
    if T % fpp != 0:
        fpp = T

    g_cls, g_p = g[:, :1], g[:, 1:].reshape(B, T, N, D)
    x_cls, x_p = x[:, :1], x[:, 1:].reshape(B, T, N, D)
    b3 = bqkv.reshape(3, D)

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
    lse_spec = pl.BlockSpec((1, 1, H), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.SMEM)

    outs = pl.pallas_call(
        _make_space_bwd_kernel_v5(H, fpp),
        grid=(B, T // fpp),
        in_specs=[frame_spec, cls_spec, frame_spec, cls_spec, vec_spec,
                  vec_spec, wqkv_spec, vec_spec, vec_spec, vec_spec,
                  wproj_spec, lse_spec, cls_spec] + [frame_spec] * 4,
        out_specs=(frame_spec, cls_spec, wqkv_spec, vec_spec, vec_spec,
                   vec_spec, wproj_spec, vec_spec, vec_spec, vec_spec),
        out_shape=(jax.ShapeDtypeStruct((B, T, N, D), x.dtype),
                   jax.ShapeDtypeStruct((B, 1, D), x.dtype),
                   jax.ShapeDtypeStruct((D, 3 * D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((D, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32),
                   jax.ShapeDtypeStruct((1, D), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((H, d), jnp.float32)] * 3,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(g_p, g_cls, x_p, x_cls, ln_scale.reshape(1, D), ln_bias.reshape(1, D),
      wqkv, b3[0:1], b3[1:2], b3[2:3], wproj, lse,
      attn_cls.reshape(B, 1, D), *acts_saved)
    (dx_p, dx_cls, dwqkv, dbq, dbk, dbv, dwproj, dbproj, dls, dlb) = outs
    dx = jnp.concatenate([dx_cls, dx_p.reshape(B, T * N, D)], axis=1)
    dbqkv = jnp.concatenate([dbq[0], dbk[0], dbv[0]])
    return dx, dls[0], dlb[0], dwqkv, dbqkv, dwproj, dbproj[0]


def make_space_subpath_v5(num_frames: int, patches_per_frame: int,
                          num_heads: int, fpp: int | None = None,
                          interpret: bool = False):
    """Frame-batched differentiable space sub-path (v5 fwd + bwd). Same
    contract as make_space_subpath."""
    from tvts_tpu.ops.pallas_block_attention import fused_space_attention_block_v5

    T, N, H = num_frames, patches_per_frame, num_heads

    @jax.custom_vjp
    def f(x, base, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj):
        return fused_space_attention_block_v5(
            x, base, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
            num_frames=T, patches_per_frame=N, num_heads=H, fpp=fpp,
            interpret=interpret)

    def fwd(x, base, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj):
        out, lse, acls, q, k, v, attn = fused_space_attention_block_v5(
            x, base, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
            num_frames=T, patches_per_frame=N, num_heads=H, fpp=fpp,
            save_stats=True, save_acts=True, interpret=interpret)
        return out, (x, ln_scale, ln_bias, wqkv, bqkv, wproj, lse, acls,
                     (q, k, v, attn))

    def bwd(res, g):
        x, ln_scale, ln_bias, wqkv, bqkv, wproj, lse, acls, acts = res
        dx, dls, dlb, dwqkv, dbqkv, dwproj, dbproj = \
            fused_space_attention_block_v5_bwd(
                g, x, ln_scale, ln_bias, wqkv, bqkv, wproj, lse, acls, acts,
                num_frames=T, patches_per_frame=N, num_heads=H, fpp=fpp,
                interpret=interpret)
        return (dx, g, dls.astype(ln_scale.dtype), dlb.astype(ln_bias.dtype),
                dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
                dwproj.astype(wproj.dtype), dbproj.astype(bqkv.dtype))

    f.defvjp(fwd, bwd)
    return f


# ---------------------------------------------------------------------------
# v7 TRAIN sub-paths: the d-major TOWER, differentiable.
#
# The v3 train kernels still pay per-program [N,D]<->[D,N] transposes at their
# boundaries (x.T in, dx.T out in the space backward; a dattn transpose set in
# the time backward) because the tower activations were row-major. Here the
# whole training tower carries activations d-major ([B,T,D,N] + row-major
# [B,1,D] CLS) across ALL blocks — the same layout the v7 extraction tower
# uses (PERF.md round-3 d-major section) — so every boundary transpose
# disappears from both the forwards and the backwards. Weight-gradient
# contractions use A@B^T lane-contraction dot_generals (legal per the Mosaic
# rules in CLAUDE.md) instead of transposing activations.
#
# The MLP sub-path joins the kernel path here: its backward consumes the
# PRE-activation hiddens saved by the forward (h: [B,T,4D,N]) — the same
# save-the-hiddens strategy that made XLA's MLP backward 2.2x the recomputing
# Pallas pair in round 2 — so the fc matmul is never recomputed.
# Gradient contracts match jax.grad of the XLA sub-paths
# (tests/test_block_backward.py::test_*_v7_*).
# ---------------------------------------------------------------------------


def _make_space_bwd_kernel_v7(H: int, use_saved_attn: bool = True):
    def kernel(g_ref, gcls_ref, x_ref, cls_ref, ln_sT_ref, ln_bT_ref,
               wqkvT_ref, wqkv_ref, bqT_ref, bkT_ref, bvT_ref, wproj_ref,
               lse_ref, aclsT_ref, qT_ref, kT_ref, vT_ref, *rest):
        if use_saved_attn:
            attnT_ref = rest[0]
            rest = rest[1:]
        (dx_ref, dxcls_ref, dwqkvT_ref, dbqT_ref, dbkT_ref, dbvT_ref,
         dwproj_ref, dbprojT_ref, dlsT_ref, dlbT_ref,
         dqc_scr, dck_scr, dcv_scr) = rest
        """Grid (B, T), t minor. g/x/dx are d-major [1,1,D,N] frame blocks;
        cls rows stay row-major [1,1,D]. No per-program transposes."""
        D = x_ref.shape[2]
        N = x_ref.shape[3]
        d = D // H
        t = pl.program_id(1)
        f32 = jnp.float32
        dtype = x_ref.dtype
        first = (pl.program_id(0) == 0) & (t == 0)

        @pl.when(first)
        def _zero():
            for ref in (dwqkvT_ref, dbqT_ref, dbkT_ref, dbvT_ref, dwproj_ref,
                        dbprojT_ref, dlsT_ref, dlbT_ref):
                ref[...] = jnp.zeros_like(ref)

        @pl.when(t == 0)
        def _reset_cls():
            dqc_scr[...] = jnp.zeros_like(dqc_scr)
            dck_scr[...] = jnp.zeros_like(dck_scr)
            dcv_scr[...] = jnp.zeros_like(dcv_scr)

        ln_sT = ln_sT_ref[:].astype(f32)
        ln_bT = ln_bT_ref[:].astype(f32)
        bqT = bqT_ref[:].astype(f32)
        bkT = bkT_ref[:].astype(f32)
        bvT = bvT_ref[:].astype(f32)
        scale = jnp.asarray(d, f32) ** -0.5
        LANE_NN = (((1,), (1,)), ((), ()))                 # A @ B^T over lanes

        def lnT_fwd(tT):
            tf = tT.astype(f32)
            mu = jnp.mean(tf, axis=0, keepdims=True)
            var = jnp.mean(jnp.square(tf - mu), axis=0, keepdims=True)
            rstd = jax.lax.rsqrt(var + 1e-5)
            xhat = (tf - mu) * rstd
            return xhat * ln_sT + ln_bT, xhat, rstd

        xT = x_ref[0, 0]                                   # [D, N] (no .T)
        clsT = cls_ref[0].T                                # [D, 1]
        x_lnT_f, xhatT, rstdT = lnT_fwd(xT)
        x_lnT = x_lnT_f.astype(dtype)
        cls_lnT_f, xhat_cT, rstd_cT = lnT_fwd(clsT)
        cls_lnT = cls_lnT_f.astype(dtype)

        qT = qT_ref[0, 0]
        kT = kT_ref[0, 0]
        vT = vT_ref[0, 0]
        qkv_cT = jnp.dot(wqkvT_ref[:], cls_lnT, preferred_element_type=f32)
        qc3 = ((qkv_cT[:D] + bqT) * scale).reshape(H, d, 1)
        kc3 = (qkv_cT[D:2 * D] + bkT).reshape(H, d, 1)
        vc3 = (qkv_cT[2 * D:] + bvT).reshape(H, d, 1)

        q3 = qT.reshape(H, d, N)
        k3 = kT.reshape(H, d, N)
        v3 = vT.reshape(H, d, N)
        k3f = k3.astype(f32)
        v3f = v3.astype(f32)
        CONTRACT_D = (((1,), (1,)), ((0,), (0,)))
        CONTRACT_NK = (((2,), (2,)), ((0,), (0,)))
        CONTRACT_Q_LHS2 = (((2,), (1,)), ((0,), (0,)))     # lhs lanes x rhs Nq

        gT = g_ref[0, 0]                                   # [D, N] d-major
        dattnT = jnp.dot(wproj_ref[:], gT,
                         preferred_element_type=f32)       # [D, N]
        dout3 = dattnT.reshape(H, d, N)
        dout_b = dout3.astype(dtype)
        gcls = gcls_ref[0]                                 # [1, D]
        dattn_cT = jnp.dot(wproj_ref[:], gcls.T,
                           preferred_element_type=f32)     # [D, 1]
        dout_c3 = dattn_cT.reshape(H, d, 1)
        acls3 = aclsT_ref[0].reshape(H, d, 1)              # fp32
        lse3 = lse_ref[0].T                                # [H, 1]

        # recompute probs (head-batched)
        logits = jax.lax.dot_general(q3, k3, CONTRACT_D,
                                     preferred_element_type=f32)  # [H,Nq,Nk]
        cls_l = jnp.sum(q3.astype(f32) * kc3, axis=1)      # [H, Nq]
        m = jnp.maximum(jnp.max(logits, axis=-1), cls_l)
        p = jnp.exp(logits - m[..., None])
        p_cls = jnp.exp(cls_l - m)
        denom = jnp.sum(p, axis=-1) + p_cls
        pn = p / denom[..., None]                          # [H, Nq, Nk] f32
        pn_cls = p_cls / denom                             # [H, Nq]
        pn_b = pn.astype(dtype)

        if use_saved_attn:
            attn_T = attnT_ref[0, 0]
        else:
            # recompute from the probs already rebuilt (one extra matmul,
            # [B,T,D,N] fewer HBM saves)
            oT3 = jax.lax.dot_general(v3, pn_b, CONTRACT_NK,
                                      preferred_element_type=f32) \
                + vc3 * pn_cls[:, None, :]
            attn_T = oT3.astype(dtype).reshape(D, N)
        # dwproj (row-major [D, D]): attn^T @ g via lane-contraction
        dwproj_ref[...] += jax.lax.dot_general(
            attn_T, gT, LANE_NN, preferred_element_type=f32)
        dbprojT_ref[...] += jnp.sum(gT.astype(f32), axis=1, keepdims=True)

        # value grads
        dv3 = jax.lax.dot_general(dout_b, pn_b, CONTRACT_Q_LHS2,
                                  preferred_element_type=f32)  # [H, d, Nk]
        dcv_scr[...] += jnp.sum(dout3 * pn_cls[:, None, :], axis=2,
                                keepdims=True)
        # prob grads + softmax bwd
        dp = jax.lax.dot_general(dout_b, v3, CONTRACT_D,
                                 preferred_element_type=f32)   # [H, Nq, Nk]
        dp_cls = jnp.sum(dout3 * vc3, axis=1)              # [H, Nq]
        rowsum = jnp.sum(pn * dp, axis=-1) + pn_cls * dp_cls
        ds = pn * (dp - rowsum[..., None])
        ds_cls = pn_cls * (dp_cls - rowsum)                # [H, Nq]
        ds_b = ds.astype(dtype)
        dq3 = jax.lax.dot_general(k3, ds_b, CONTRACT_NK,
                                  preferred_element_type=f32) \
            + kc3 * ds_cls[:, None, :]                     # [H, d, Nq]
        dk3 = jax.lax.dot_general(q3, ds_b, CONTRACT_Q_LHS2,
                                  preferred_element_type=f32)  # [H, d, Nk]
        dck_scr[...] += jnp.sum(q3.astype(f32) * ds_cls[:, None, :], axis=2,
                                keepdims=True)

        # CLS row contribution from this frame's keys
        delta3 = jnp.sum(acls3 * dout_c3, axis=1)          # [H, 1]
        lrow = jnp.sum(k3f * qc3, axis=1)                  # [H, Nk]
        pn_row = jnp.exp(lrow - lse3)                      # [H, Nk]
        dv3 = dv3 + pn_row[:, None, :] * dout_c3
        dp_row = jnp.sum(v3f * dout_c3, axis=1)            # [H, Nk]
        ds_row = pn_row * (dp_row - delta3)                # [H, Nk]
        dqc_scr[...] += jnp.sum(k3f * ds_row[:, None, :], axis=2,
                                keepdims=True)
        dk3 = dk3 + qc3 * ds_row[:, None, :]

        @pl.when(t == 0)
        def _self():
            p_self = jnp.exp(jnp.sum(qc3 * kc3, axis=1) - lse3)  # [H, 1]
            dcv_scr[...] += p_self[..., None] * dout_c3
            dp_self = jnp.sum(vc3 * dout_c3, axis=1)       # [H, 1]
            ds_self = p_self * (dp_self - delta3)          # [H, 1]
            dqc_scr[...] += ds_self[..., None] * kc3
            dck_scr[...] += ds_self[..., None] * qc3

        dqT = dq3.reshape(D, N) * scale                    # fp32
        dkT = dk3.reshape(D, N)
        dvT = dv3.reshape(D, N)
        dqkvT = jnp.concatenate([dqT, dkT, dvT], axis=0).astype(dtype)
        # dwqkvT [3D, D]: dqkv^T @ x_ln via lane-contraction (no x_ln.T)
        dwqkvT_ref[...] += jax.lax.dot_general(
            dqkvT, x_lnT, LANE_NN, preferred_element_type=f32)
        dbqT_ref[...] += jnp.sum(dqT, axis=1, keepdims=True)
        dbkT_ref[...] += jnp.sum(dkT, axis=1, keepdims=True)
        dbvT_ref[...] += jnp.sum(dvT, axis=1, keepdims=True)

        dxlnT = jnp.dot(wqkv_ref[:], dqkvT,
                        preferred_element_type=f32)        # [D, N]
        dlsT_ref[...] += jnp.sum(dxlnT * xhatT, axis=1, keepdims=True)
        dlbT_ref[...] += jnp.sum(dxlnT, axis=1, keepdims=True)
        dxhatT = dxlnT * ln_sT
        m1 = jnp.mean(dxhatT, axis=0, keepdims=True)       # [1, N]
        m2 = jnp.mean(dxhatT * xhatT, axis=0, keepdims=True)
        dxT = (dxhatT - m1 - xhatT * m2) * rstdT
        dx_ref[0, 0] = dxT.astype(dx_ref.dtype)            # no .T

        @pl.when(t == pl.num_programs(1) - 1)
        def _finish_cls():
            dqcT = dqc_scr[...].reshape(D, 1) * scale      # fp32
            dkcT = dck_scr[...].reshape(D, 1)
            dvcT = dcv_scr[...].reshape(D, 1)
            dqkv_cT = jnp.concatenate([dqcT, dkcT, dvcT], axis=0).astype(dtype)
            cls_ln_row = cls_lnT.T                         # [1, D]
            dwqkvT_ref[...] += jnp.dot(dqkv_cT, cls_ln_row,
                                       preferred_element_type=f32)
            dbqT_ref[...] += dqcT
            dbkT_ref[...] += dkcT
            dbvT_ref[...] += dvcT
            dwproj_ref[...] += jnp.dot(aclsT_ref[0].astype(dtype), gcls,
                                       preferred_element_type=f32)
            dbprojT_ref[...] += gcls.astype(f32).T
            dxln_cT = jnp.dot(wqkv_ref[:], dqkv_cT,
                              preferred_element_type=f32)  # [D, 1]
            dlsT_ref[...] += dxln_cT * xhat_cT
            dlbT_ref[...] += dxln_cT
            dxhat_c = dxln_cT * ln_sT
            m1c = jnp.mean(dxhat_c, axis=0, keepdims=True)
            m2c = jnp.mean(dxhat_c * xhat_cT, axis=0, keepdims=True)
            dxcT = (dxhat_c - m1c - xhat_cT * m2c) * rstd_cT
            dxcls_ref[0] = dxcT.T.astype(dxcls_ref.dtype)

    return kernel


def fused_space_attention_block_v7_bwd(goT, gocls, xT, cls, ln_scale, ln_bias,
                                       wqkv, bqkv, wproj, lse, aclsT,
                                       acts_saved, num_heads: int,
                                       interpret: bool = False):
    use_saved_attn = len(acts_saved) == 4
    """Backward matching fused_space_attention_block_v7 (d-major tower I/O).
    acts_saved holds the d-major qT/kT/vT/attnT [B,T,D,N]."""
    B, T, D, N = xT.shape
    H = num_heads
    d = D // H
    b3 = bqkv.reshape(3, D)

    frameT_spec = pl.BlockSpec((1, 1, D, N), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    clsT_spec = pl.BlockSpec((1, D, 1), lambda b, t: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    vecT_spec = pl.BlockSpec((D, 1), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    wqkvT_spec = pl.BlockSpec((3 * D, D), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((D, 3 * D), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    wproj_spec = pl.BlockSpec((D, D), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, 1, H), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        _make_space_bwd_kernel_v7(H, use_saved_attn),
        grid=(B, T),
        in_specs=[frameT_spec, cls_spec, frameT_spec, cls_spec, vecT_spec,
                  vecT_spec, wqkvT_spec, wqkv_spec, vecT_spec, vecT_spec,
                  vecT_spec, wproj_spec, lse_spec, clsT_spec]
        + [frameT_spec] * len(acts_saved),
        out_specs=(frameT_spec, cls_spec, wqkvT_spec, vecT_spec, vecT_spec,
                   vecT_spec, wproj_spec, vecT_spec, vecT_spec, vecT_spec),
        out_shape=(jax.ShapeDtypeStruct((B, T, D, N), xT.dtype),
                   jax.ShapeDtypeStruct((B, 1, D), xT.dtype),
                   jax.ShapeDtypeStruct((3 * D, D), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, D), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((H, d, 1), jnp.float32)] * 3,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(goT, gocls, xT, cls, ln_scale.reshape(D, 1), ln_bias.reshape(D, 1),
      wqkv.T, wqkv, b3[0].reshape(D, 1), b3[1].reshape(D, 1),
      b3[2].reshape(D, 1), wproj, lse, aclsT, *acts_saved)
    (dxT, dxcls, dwqkvT, dbqT, dbkT, dbvT, dwproj, dbprojT, dlsT, dlbT) = outs
    dbqkv = jnp.concatenate([dbqT[:, 0], dbkT[:, 0], dbvT[:, 0]])
    return (dxT, dxcls, dlsT[:, 0], dlbT[:, 0], dwqkvT.T, dbqkv, dwproj,
            dbprojT[:, 0])


def make_space_subpath_v7(num_heads: int, save_attn: bool = False,
                          interpret: bool = False):
    """Differentiable d-major space sub-path for the v7 train tower.
    f(xT, baseT, cls, basecls, ln_s, ln_b, wqkv, bqkv, wproj, bproj)
    -> (oT [B,T,D,N], ocls [B,1,D])."""
    from tvts_tpu.ops.pallas_block_attention import fused_space_attention_block_v7

    H = num_heads

    @jax.custom_vjp
    def f(xT, baseT, cls, basecls, ln_scale, ln_bias, wqkv, bqkv, wproj,
          bproj):
        return fused_space_attention_block_v7(
            xT, baseT, cls, basecls, ln_scale, ln_bias, wqkv, bqkv, wproj,
            bproj, num_heads=H, interpret=interpret)

    def fwd(xT, baseT, cls, basecls, ln_scale, ln_bias, wqkv, bqkv, wproj,
            bproj):
        outs = fused_space_attention_block_v7(
            xT, baseT, cls, basecls, ln_scale, ln_bias, wqkv, bqkv,
            wproj, bproj, num_heads=H, save_stats=True, save_acts=True,
            save_attn=save_attn, interpret=interpret)
        oT, ocls, lse, aclsT = outs[:4]
        return (oT, ocls), (xT, cls, ln_scale, ln_bias, wqkv, bqkv, wproj,
                            lse, aclsT, tuple(outs[4:]))

    def bwd(res, g):
        goT, gocls = g
        (xT, cls, ln_scale, ln_bias, wqkv, bqkv, wproj, lse, aclsT,
         acts) = res
        dxT, dxcls, dls, dlb, dwqkv, dbqkv, dwproj, dbproj = \
            fused_space_attention_block_v7_bwd(
                goT, gocls, xT, cls, ln_scale, ln_bias, wqkv, bqkv, wproj,
                lse, aclsT, acts, num_heads=H, interpret=interpret)
        return (dxT, goT, dxcls, gocls, dls.astype(ln_scale.dtype),
                dlb.astype(ln_bias.dtype), dwqkv.astype(wqkv.dtype),
                dbqkv.astype(bqkv.dtype), dwproj.astype(wproj.dtype),
                dbproj.astype(bqkv.dtype))

    f.defvjp(fwd, bwd)
    return f


def _make_time_bwd_kernel_v7(H: int, T: int, N: int,
                             use_saved_attn: bool = True):
    def kernel(g_ref, gcls_ref, x_ref, cls_ref, ln_sT_ref, ln_bT_ref,
               wqkv_ref, wqkvT_ref, bqT_ref, bkT_ref, bvT_ref, wproj_ref,
               lse_ref, aclsT_ref, qT_ref, kT_ref, vT_ref, *rest):
        if use_saved_attn:
            attnT_ref = rest[0]
            rest = rest[1:]
        (dx_ref, dxcls_ref, dwqkvT_ref, dbq_hd_ref, dbk_hd_ref,
         dbv_hd_ref, dwproj_ref, dbprojT_ref, dlsT_ref, dlbT_ref,
         dqc_scr, dck_scr, dcv_scr) = rest
        """Grid (B, C), c minor. g/x/dx are d-major [1,T,D,Nc] chunk blocks
        (residual folded: dx = g + LN path); cls rows stay row-major. The v3
        time backward's two remaining lane<->sublane transpose sets (dattn
        in, dxln out) are gone — the tower is d-major end to end."""
        D = x_ref.shape[2]
        Nc = x_ref.shape[3]
        d = D // H
        c = pl.program_id(1)
        f32 = jnp.float32
        dtype = x_ref.dtype
        first = (pl.program_id(0) == 0) & (c == 0)
        LANE_NN = (((1,), (1,)), ((), ()))                 # A @ B^T over lanes

        @pl.when(first)
        def _zero():
            for ref in (dwqkvT_ref, dbq_hd_ref, dbk_hd_ref, dbv_hd_ref,
                        dwproj_ref, dbprojT_ref, dlsT_ref, dlbT_ref):
                ref[...] = jnp.zeros_like(ref)

        @pl.when(c == 0)
        def _reset_cls():
            dqc_scr[...] = jnp.zeros_like(dqc_scr)
            dck_scr[...] = jnp.zeros_like(dck_scr)
            dcv_scr[...] = jnp.zeros_like(dcv_scr)

        ln_sT = ln_sT_ref[:].astype(f32)                   # [D, 1]
        ln_bT = ln_bT_ref[:].astype(f32)
        scale = jnp.asarray(d, f32) ** -0.5

        def lnT_fwd(tT):
            tf = tT.astype(f32)
            mu = jnp.mean(tf, axis=0, keepdims=True)
            var = jnp.mean(jnp.square(tf - mu), axis=0, keepdims=True)
            rstd = jax.lax.rsqrt(var + 1e-5)
            xhat = (tf - mu) * rstd
            return xhat * ln_sT + ln_bT, xhat, rstd

        xT = x_ref[0]                                      # [T, D, Nc]
        x_lnTs, xhatTs, rstdTs = [], [], []
        for t in range(T):
            x_lnT_t, xhatT_t, rstdT_t = lnT_fwd(xT[t])
            x_lnTs.append(x_lnT_t.astype(dtype))
            xhatTs.append(xhatT_t)
            rstdTs.append(rstdT_t)
        clsT = cls_ref[0].T                                # [D, 1]
        cls_lnT_f, xhat_cT, rstd_cT = lnT_fwd(clsT)
        cls_lnT = cls_lnT_f.astype(dtype)

        # saved d-major activations -> [H, T, d, Nc] head tiles (sublane
        # split + leading transpose; no lane<->sublane traffic)
        def heads(ref):
            return jnp.transpose(ref[0].reshape(T, H, d, Nc),
                                 (1, 0, 2, 3)).astype(f32)

        q4 = heads(qT_ref)
        k4 = heads(kT_ref)
        v4 = heads(vT_ref)

        bqT = bqT_ref[:].astype(f32)                       # [D, 1]
        bkT = bkT_ref[:].astype(f32)
        bvT = bvT_ref[:].astype(f32)
        qkv_cT = jnp.dot(wqkvT_ref[:], cls_lnT, preferred_element_type=f32)
        qc4 = ((qkv_cT[:D] + bqT) * scale).reshape(H, d, 1)
        kc4 = (qkv_cT[D:2 * D] + bkT).reshape(H, d, 1)
        vc4 = (qkv_cT[2 * D:] + bvT).reshape(H, d, 1)

        # upstream grads: d-major reprojection, no transpose set
        gT = g_ref[0]                                      # [T, D, Nc]
        dattnT_ts = []
        for t in range(T):
            dattnT_ts.append(jnp.dot(wproj_ref[:], gT[t],
                                     preferred_element_type=f32)
                             .astype(dtype))               # [D, Nc]
        dout4 = jnp.transpose(jnp.stack(dattnT_ts).reshape(T, H, d, Nc),
                              (1, 0, 2, 3)).astype(f32)    # [H, T, d, Nc]
        gcls = gcls_ref[0]                                 # [1, D]
        dattn_cT = jnp.dot(wproj_ref[:], gcls.T,
                           preferred_element_type=f32)     # [D, 1]
        dout_c4 = dattn_cT.reshape(H, d, 1)
        acls4 = aclsT_ref[0].reshape(H, d, 1)              # fp32
        lse2 = lse_ref[0].T                                # [H, 1]
        lse4 = lse2[..., None]                             # [H, 1, 1]

        loc = jax.lax.broadcasted_iota(jnp.int32, (T, Nc), 1) + c * Nc
        valid = loc < N                                    # [T, Nc]

        # ---- attention backward (H-leading, v3 math on v7 layout) ----------
        dk4 = jnp.zeros_like(k4)
        dv4 = jnp.zeros_like(v4)
        dq_ts = []
        attn_ts = []
        for t in range(T):
            qt = q4[:, t]                                  # [H, d, Nc]
            l = jnp.sum(qt[:, None] * k4, axis=2)          # [H, T, Nc]
            cls_l = jnp.sum(qt * kc4, axis=1)[:, None]     # [H, 1, Nc]
            full = jnp.concatenate([cls_l, l], axis=1)     # [H, T+1, Nc]
            m = jnp.max(full, axis=1, keepdims=True)
            p = jnp.exp(full - m)
            denom = jnp.sum(p, axis=1, keepdims=True)
            pn = p / denom                                 # [H, T+1, Nc]
            if not use_saved_attn:
                # recompute the pre-proj attention output from pn (no
                # [B,T,D,N] attnT save round-trip)
                attn_t = (jnp.sum(pn[:, 1:][:, :, None] * v4, axis=1)
                          + pn[:, 0][:, None, :] * vc4.astype(f32))
                attn_ts.append(attn_t.reshape(D, Nc).astype(dtype))

            dout_t = dout4[:, t]                           # [H, d, Nc]
            dv4 = dv4 + pn[:, 1:][:, :, None] * dout_t[:, None]
            dcv_scr[...] += jnp.sum(pn[:, 0][:, None, :] * dout_t, axis=2,
                                    keepdims=True)
            dp = jnp.sum(v4 * dout_t[:, None], axis=2)     # [H, T, Nc]
            dp_cls = jnp.sum(vc4 * dout_t, axis=1)[:, None]    # [H, 1, Nc]
            full_dp = jnp.concatenate([dp_cls, dp], axis=1)
            rowsum = jnp.sum(pn * full_dp, axis=1, keepdims=True)
            ds = pn * (full_dp - rowsum)                   # [H, T+1, Nc]
            dq_ts.append(jnp.sum(ds[:, 1:][:, :, None] * k4, axis=1)
                         + ds[:, 0][:, None, :] * kc4)     # [H, d, Nc]
            dk4 = dk4 + ds[:, 1:][:, :, None] * qt[:, None]
            dck_scr[...] += jnp.sum(ds[:, 0][:, None, :] * qt, axis=2,
                                    keepdims=True)

        # ---- CLS row over this chunk's (valid) keys ------------------------
        delta4 = jnp.sum(acls4 * dout_c4, axis=1, keepdims=True)  # [H, 1, 1]
        lrow = jnp.sum(k4 * qc4[:, None], axis=2)          # [H, T, Nc]
        pn_row = jnp.where(valid[None], jnp.exp(lrow - lse4), 0.0)
        dv4 = dv4 + pn_row[:, :, None, :] * dout_c4[:, None]
        dp_row = jnp.sum(v4 * dout_c4[:, None], axis=2)    # [H, T, Nc]
        ds_row = pn_row * (dp_row - delta4)
        dqc_scr[...] += jnp.sum(ds_row[:, :, None, :] * k4,
                                axis=(1, 3))[:, :, None]
        dk4 = dk4 + ds_row[:, :, None, :] * qc4[:, None]

        @pl.when(c == 0)
        def _self():
            p_self = jnp.exp(jnp.sum(qc4 * kc4, axis=1) - lse2)   # [H, 1]
            dcv_scr[...] += p_self[..., None] * dout_c4
            dp_self = jnp.sum(vc4 * dout_c4, axis=1)       # [H, 1]
            ds_self = p_self * (dp_self - delta4[:, :, 0])
            dqc_scr[...] += ds_self[..., None] * kc4
            dck_scr[...] += ds_self[..., None] * qc4

        # ---- projection grads (all d-major, lane-contraction) ---------------
        for t in range(T):
            attn_t = attnT_ref[0, t] if use_saved_attn else attn_ts[t]
            dwproj_ref[...] += jax.lax.dot_general(
                attn_t, gT[t], LANE_NN, preferred_element_type=f32)
            dbprojT_ref[...] += jnp.sum(gT[t].astype(f32), axis=1,
                                        keepdims=True)

        # ---- qkv weight/bias/input grads, per frame d-major ----------------
        dq4 = jnp.stack(dq_ts, axis=1) * scale             # [H, T, d, Nc] f32
        dbq_hd_ref[...] += jnp.sum(dq4, axis=(1, 3))
        dbk_hd_ref[...] += jnp.sum(dk4, axis=(1, 3))
        dbv_hd_ref[...] += jnp.sum(dv4, axis=(1, 3))

        # [H,T,d,Nc] -> [T,D,Nc] (leading transpose + sublane merge)
        def to_tdn(a4):
            return jnp.transpose(a4, (1, 0, 2, 3)).reshape(T, D, Nc)

        dqT = to_tdn(dq4)
        dkT = to_tdn(dk4)
        dvT = to_tdn(dv4)

        for t in range(T):
            dqkvT_t = jnp.concatenate([dqT[t], dkT[t], dvT[t]],
                                      axis=0).astype(dtype)       # [3D, Nc]
            dwqkvT_ref[...] += jax.lax.dot_general(
                dqkvT_t, x_lnTs[t], LANE_NN, preferred_element_type=f32)
            dxlnT_t = jnp.dot(wqkv_ref[:], dqkvT_t,
                              preferred_element_type=f32)         # [D, Nc]
            dlsT_ref[...] += jnp.sum(dxlnT_t * xhatTs[t], axis=1,
                                     keepdims=True)
            dlbT_ref[...] += jnp.sum(dxlnT_t, axis=1, keepdims=True)
            dxhatT = dxlnT_t * ln_sT
            m1 = jnp.mean(dxhatT, axis=0, keepdims=True)
            m2 = jnp.mean(dxhatT * xhatTs[t], axis=0, keepdims=True)
            # residual folded in the forward: dx = g + LN path
            dx_ref[0, t] = (gT[t].astype(f32)
                            + (dxhatT - m1 - xhatTs[t] * m2) * rstdTs[t]) \
                .astype(dx_ref.dtype)

        @pl.when(c == pl.num_programs(1) - 1)
        def _finish_cls():
            dqcT = dqc_scr[...].reshape(D, 1) * scale      # fp32
            dkcT = dck_scr[...].reshape(D, 1)
            dvcT = dcv_scr[...].reshape(D, 1)
            dqkv_cT = jnp.concatenate([dqcT, dkcT, dvcT], axis=0).astype(dtype)
            dwqkvT_ref[...] += jnp.dot(dqkv_cT, cls_lnT.T,
                                       preferred_element_type=f32)
            dbq_hd_ref[...] += dqc_scr[..., 0] * scale
            dbk_hd_ref[...] += dck_scr[..., 0]
            dbv_hd_ref[...] += dcv_scr[..., 0]
            dwproj_ref[...] += jnp.dot(aclsT_ref[0].astype(dtype), gcls,
                                       preferred_element_type=f32)
            dbprojT_ref[...] += gcls.astype(f32).T
            dxln_cT = jnp.dot(wqkv_ref[:], dqkv_cT,
                              preferred_element_type=f32)         # [D, 1]
            dlsT_ref[...] += dxln_cT * xhat_cT
            dlbT_ref[...] += dxln_cT
            dxhat_c = dxln_cT * ln_sT
            m1c = jnp.mean(dxhat_c, axis=0, keepdims=True)
            m2c = jnp.mean(dxhat_c * xhat_cT, axis=0, keepdims=True)
            dxcT = (dxhat_c - m1c - xhat_cT * m2c) * rstd_cT
            dxcls_ref[0] = (gcls.astype(f32) + dxcT.T).astype(dxcls_ref.dtype)

    return kernel


def fused_time_attention_block_v7_bwd(goT, gocls, xT, cls, ln_scale, ln_bias,
                                      wqkv, bqkv, wproj, lse, aclsT,
                                      acts_saved, num_heads: int,
                                      chunk: int | None = None,
                                      interpret: bool = False):
    """Backward matching fused_time_attention_block_v7 (d-major tower I/O)."""
    B, T, D, N = xT.shape
    H = num_heads
    d = D // H
    if chunk is None or N % chunk != 0:
        chunk = N
    b3 = bqkv.reshape(3, D)

    chunkT_spec = pl.BlockSpec((1, T, D, chunk), lambda b, c: (b, 0, 0, c),
                               memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b, c: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    clsT_spec = pl.BlockSpec((1, D, 1), lambda b, c: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    vecT_spec = pl.BlockSpec((D, 1), lambda b, c: (0, 0),
                             memory_space=pltpu.VMEM)
    hd_spec = pl.BlockSpec((H, d), lambda b, c: (0, 0),
                           memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((D, 3 * D), lambda b, c: (0, 0),
                             memory_space=pltpu.VMEM)
    wqkvT_spec = pl.BlockSpec((3 * D, D), lambda b, c: (0, 0),
                              memory_space=pltpu.VMEM)
    wproj_spec = pl.BlockSpec((D, D), lambda b, c: (0, 0),
                              memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, 1, H), lambda b, c: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        _make_time_bwd_kernel_v7(H, T, N, len(acts_saved) == 4),
        grid=(B, N // chunk),
        in_specs=[chunkT_spec, cls_spec, chunkT_spec, cls_spec, vecT_spec,
                  vecT_spec, wqkv_spec, wqkvT_spec, vecT_spec, vecT_spec,
                  vecT_spec, wproj_spec, lse_spec, clsT_spec]
        + [chunkT_spec] * len(acts_saved),
        out_specs=(chunkT_spec, cls_spec, wqkvT_spec, hd_spec, hd_spec,
                   hd_spec, wproj_spec, vecT_spec, vecT_spec, vecT_spec),
        out_shape=(jax.ShapeDtypeStruct((B, T, D, N), xT.dtype),
                   jax.ShapeDtypeStruct((B, 1, D), xT.dtype),
                   jax.ShapeDtypeStruct((3 * D, D), jnp.float32),
                   jax.ShapeDtypeStruct((H, d), jnp.float32),
                   jax.ShapeDtypeStruct((H, d), jnp.float32),
                   jax.ShapeDtypeStruct((H, d), jnp.float32),
                   jax.ShapeDtypeStruct((D, D), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((H, d, 1), jnp.float32)] * 3,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(goT, gocls, xT, cls, ln_scale.reshape(D, 1), ln_bias.reshape(D, 1),
      wqkv, wqkv.T, b3[0].reshape(D, 1), b3[1].reshape(D, 1),
      b3[2].reshape(D, 1), wproj, lse, aclsT, *acts_saved)
    (dxT, dxcls, dwqkvT, dbq_hd, dbk_hd, dbv_hd, dwproj, dbprojT, dlsT,
     dlbT) = outs
    dbqkv = jnp.concatenate([dbq_hd.reshape(D), dbk_hd.reshape(D),
                             dbv_hd.reshape(D)])
    return (dxT, dxcls, dlsT[:, 0], dlbT[:, 0], dwqkvT.T, dbqkv, dwproj,
            dbprojT[:, 0])


def make_time_subpath_v7(num_heads: int, chunk: int | None = None,
                         save_attn: bool = False,
                         interpret: bool = False):
    """Differentiable d-major time sub-path for the v7 train tower.
    f(xT, cls, ln_s, ln_b, wqkv, bqkv, wproj, bproj) -> (oT, ocls);
    residual folded (o = x + proj)."""
    from tvts_tpu.ops.pallas_block_attention import fused_time_attention_block_v7

    H = num_heads

    @jax.custom_vjp
    def f(xT, cls, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj):
        # smv pinned to "base" — must match fwd's exact save-path math
        return fused_time_attention_block_v7(
            xT, cls, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
            num_heads=H, chunk=chunk, smv="base", interpret=interpret)

    def fwd(xT, cls, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj):
        outs = fused_time_attention_block_v7(
            xT, cls, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
            num_heads=H, chunk=chunk, save_stats=True, save_acts=True,
            save_attn=save_attn, interpret=interpret)
        oT, ocls, lse, aclsT = outs[:4]
        return (oT, ocls), (xT, cls, ln_scale, ln_bias, wqkv, bqkv, wproj,
                            lse, aclsT, tuple(outs[4:]))

    def bwd(res, g):
        goT, gocls = g
        (xT, cls, ln_scale, ln_bias, wqkv, bqkv, wproj, lse, aclsT,
         acts) = res
        dxT, dxcls, dls, dlb, dwqkv, dbqkv, dwproj, dbproj = \
            fused_time_attention_block_v7_bwd(
                goT, gocls, xT, cls, ln_scale, ln_bias, wqkv, bqkv, wproj,
                lse, aclsT, acts, num_heads=H, chunk=chunk,
                interpret=interpret)
        return (dxT, dxcls, dls.astype(ln_scale.dtype),
                dlb.astype(ln_bias.dtype), dwqkv.astype(wqkv.dtype),
                dbqkv.astype(bqkv.dtype), dwproj.astype(wproj.dtype),
                dbproj.astype(bqkv.dtype))

    f.defvjp(fwd, bwd)
    return f


def _make_mlp_bwd_kernel_v7(act: str):
    def kernel(g_ref, gcls_ref, x_ref, cls_ref, ln_sT_ref, ln_bT_ref,
               wfc_ref, wpr_ref, h_ref, hcls_ref,
               dx_ref, dxcls_ref, dwfcT_ref, dbfcT_ref, dwprT_ref,
               dbprT_ref, dlsT_ref, dlbT_ref):
        """Grid (B, T), t minor. g/x/dx are d-major [1,1,D,N]; cls rows stay
        row-major. Consumes the PRE-activation hiddens saved by the forward
        (h [1,1,4D,N], hcls [1,4D,1]) so the fc matmul is never recomputed —
        the strategy that made XLA's MLP backward 2.2x the recomputing Pallas
        pair (PERF.md round-2 MLP decision). Residual folded: dx = g + LN
        path. Weight grads accumulate in transposed orientation via
        lane-contraction dot_generals (no activation transposes)."""
        D = x_ref.shape[2]
        f32 = jnp.float32
        dtype = x_ref.dtype
        t = pl.program_id(1)
        first = (pl.program_id(0) == 0) & (t == 0)
        LANE_NN = (((1,), (1,)), ((), ()))                 # A @ B^T over lanes

        @pl.when(first)
        def _zero():
            for ref in (dwfcT_ref, dbfcT_ref, dwprT_ref, dbprT_ref,
                        dlsT_ref, dlbT_ref):
                ref[...] = jnp.zeros_like(ref)

        ln_sT = ln_sT_ref[:].astype(f32)
        ln_bT = ln_bT_ref[:].astype(f32)

        def lnT_fwd(tT):
            tf = tT.astype(f32)
            mu = jnp.mean(tf, axis=0, keepdims=True)
            var = jnp.mean(jnp.square(tf - mu), axis=0, keepdims=True)
            rstd = jax.lax.rsqrt(var + 1e-5)
            xhat = (tf - mu) * rstd
            return xhat * ln_sT + ln_bT, xhat, rstd

        def act_and_grad(h):                               # f32 [4D, n]
            if act == "quick_gelu":
                s = jax.nn.sigmoid(1.702 * h)
                return h * s, s * (1.0 + 1.702 * h * (1.0 - s))
            erf_v = _erf(h * (2.0 ** -0.5))
            a = 0.5 * h * (1.0 + erf_v)
            phi = jnp.exp(-0.5 * h * h) * (0.3989422804014327)
            return a, 0.5 * (1.0 + erf_v) + h * phi

        def bwd_one(gT, tT, h_b, dx_sink_is_cls):
            """gT/tT: [D, n]; h_b: [4D, n] saved pre-activation (dtype)."""
            x_lnT_f, xhatT, rstdT = lnT_fwd(tT)
            y_b = x_lnT_f.astype(dtype)
            h = h_b.astype(f32)
            a, dgelu = act_and_grad(h)
            gf = gT.astype(f32)
            # dwprT [D, 4D] += g @ act(h)^T (lane-contraction)
            dwprT_ref[...] += jax.lax.dot_general(
                gT, a.astype(dtype), LANE_NN, preferred_element_type=f32)
            dbprT_ref[...] += jnp.sum(gf, axis=1, keepdims=True)
            # dh = (wpr @ g) * act'(h)   (wpr row-major [4D, D])
            dh = jnp.dot(wpr_ref[:], gT, preferred_element_type=f32) * dgelu
            dh_b = dh.astype(dtype)
            dbfcT_ref[...] += jnp.sum(dh, axis=1, keepdims=True)
            # dwfcT [4D, D] += dh @ ln(x)^T (lane-contraction)
            dwfcT_ref[...] += jax.lax.dot_general(
                dh_b, y_b, LANE_NN, preferred_element_type=f32)
            # dxln = wfc @ dh   (wfc row-major [D, 4D])
            dxlnT = jnp.dot(wfc_ref[:], dh_b, preferred_element_type=f32)
            dlsT_ref[...] += jnp.sum(dxlnT * xhatT, axis=1, keepdims=True)
            dlbT_ref[...] += jnp.sum(dxlnT, axis=1, keepdims=True)
            dxhatT = dxlnT * ln_sT
            m1 = jnp.mean(dxhatT, axis=0, keepdims=True)
            m2 = jnp.mean(dxhatT * xhatT, axis=0, keepdims=True)
            return gf + (dxhatT - m1 - xhatT * m2) * rstdT

        dx_ref[0, 0] = bwd_one(g_ref[0, 0], x_ref[0, 0], h_ref[0, 0],
                               False).astype(dx_ref.dtype)

        @pl.when(t == 0)
        def _cls():
            dxcT = bwd_one(gcls_ref[0].T, cls_ref[0].T, hcls_ref[0], True)
            dxcls_ref[0] = dxcT.T.astype(dxcls_ref.dtype)

    return kernel


def fused_mlp_block_v7_bwd(goT, gocls, xT, cls, ln_scale, ln_bias, wfc, wpr,
                           h, hcls, act: str = "quick_gelu",
                           interpret: bool = False):
    """Backward matching fused_mlp_block_v7 (d-major tower I/O); h/hcls are
    the saved pre-activation hiddens."""
    B, T, D, N = xT.shape
    hidden = wfc.shape[1]

    frameT_spec = pl.BlockSpec((1, 1, D, N), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM)
    hT_spec = pl.BlockSpec((1, 1, hidden, N), lambda b, t: (b, t, 0, 0),
                           memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    hclsT_spec = pl.BlockSpec((1, hidden, 1), lambda b, t: (b, 0, 0),
                              memory_space=pltpu.VMEM)
    vecT_spec = pl.BlockSpec((D, 1), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    hvecT_spec = pl.BlockSpec((hidden, 1), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    wfc_spec = pl.BlockSpec((D, hidden), lambda b, t: (0, 0),
                            memory_space=pltpu.VMEM)
    wpr_spec = pl.BlockSpec((hidden, D), lambda b, t: (0, 0),
                            memory_space=pltpu.VMEM)
    dwfcT_spec = pl.BlockSpec((hidden, D), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    dwprT_spec = pl.BlockSpec((D, hidden), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        _make_mlp_bwd_kernel_v7(act),
        grid=(B, T),
        in_specs=[frameT_spec, cls_spec, frameT_spec, cls_spec, vecT_spec,
                  vecT_spec, wfc_spec, wpr_spec, hT_spec, hclsT_spec],
        out_specs=(frameT_spec, cls_spec, dwfcT_spec, hvecT_spec, dwprT_spec,
                   vecT_spec, vecT_spec, vecT_spec),
        out_shape=(jax.ShapeDtypeStruct((B, T, D, N), xT.dtype),
                   jax.ShapeDtypeStruct((B, 1, D), xT.dtype),
                   jax.ShapeDtypeStruct((hidden, D), jnp.float32),
                   jax.ShapeDtypeStruct((hidden, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, hidden), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32)),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(goT, gocls, xT, cls, ln_scale.reshape(D, 1), ln_bias.reshape(D, 1),
      wfc, wpr, h, hcls)
    (dxT, dxcls, dwfcT, dbfcT, dwprT, dbprT, dlsT, dlbT) = outs
    return (dxT, dxcls, dlsT[:, 0], dlbT[:, 0], dwfcT.T, dbfcT[:, 0],
            dwprT.T, dbprT[:, 0])


def make_mlp_subpath_v7(act: str = "quick_gelu", interpret: bool = False):
    """Differentiable d-major MLP sub-path for the v7 train tower.
    f(xT, cls, ln_s, ln_b, wfc, bfc, wpr, bpr) -> (oT, ocls); the forward
    saves the pre-activation hiddens, the backward reuses them."""
    from tvts_tpu.ops.pallas_block_attention import fused_mlp_block_v7

    @jax.custom_vjp
    def f(xT, cls, ln_scale, ln_bias, wfc, bfc, wpr, bpr):
        return fused_mlp_block_v7(xT, cls, ln_scale, ln_bias, wfc, bfc, wpr,
                                  bpr, act=act, interpret=interpret)

    def fwd(xT, cls, ln_scale, ln_bias, wfc, bfc, wpr, bpr):
        oT, ocls, h, hcls = fused_mlp_block_v7(
            xT, cls, ln_scale, ln_bias, wfc, bfc, wpr, bpr, act=act,
            save_h=True, interpret=interpret)
        return (oT, ocls), (xT, cls, ln_scale, ln_bias, wfc, wpr, h, hcls)

    def bwd(res, g):
        goT, gocls = g
        xT, cls, ln_scale, ln_bias, wfc, wpr, h, hcls = res
        dxT, dxcls, dls, dlb, dwfc, dbfc, dwpr, dbpr = fused_mlp_block_v7_bwd(
            goT, gocls, xT, cls, ln_scale, ln_bias, wfc, wpr, h, hcls,
            act=act, interpret=interpret)
        return (dxT, dxcls, dls.astype(ln_scale.dtype),
                dlb.astype(ln_bias.dtype), dwfc.astype(wfc.dtype),
                dbfc.astype(wfc.dtype), dwpr.astype(wpr.dtype),
                dbpr.astype(wpr.dtype))

    f.defvjp(fwd, bwd)
    return f


def _make_space_bwd_kernel_v9(H: int, FPP: int, use_probs: bool = True,
                              row_io: bool = False, wide_mm: bool = False):
    def kernel(g_ref, gcls_ref, x_ref, cls_ref, ln_sT_ref, ln_bT_ref,
               wqkvT_ref, wqkv_ref, bqT_ref, bkT_ref, bvT_ref, wproj_ref,
               lse_ref, aclsT_ref, qT_ref, kT_ref, vT_ref, *rest):
        """v7 space backward with FPP frames per program: attention
        dot_generals batched over [FPP*H]; optionally consumes the
        forward-saved softmax state (use_probs). Grid (B, T // FPP)."""
        if use_probs:
            p_ref, pcls_ref, den_ref = rest[:3]
            rest = rest[3:]
        (dx_ref, dxcls_ref, dwqkvT_ref, dbqT_ref, dbkT_ref, dbvT_ref,
         dwproj_ref, dbprojT_ref, dlsT_ref, dlbT_ref,
         dqc_scr, dck_scr, dcv_scr) = rest
        D = ln_sT_ref.shape[0]
        N = x_ref.shape[2] if row_io else x_ref.shape[3]
        d = D // H
        t = pl.program_id(1)
        f32 = jnp.float32
        dtype = x_ref.dtype
        first = (pl.program_id(0) == 0) & (t == 0)
        LANE_NN = (((1,), (1,)), ((), ()))

        @pl.when(first)
        def _zero():
            for ref in (dwqkvT_ref, dbqT_ref, dbkT_ref, dbvT_ref, dwproj_ref,
                        dbprojT_ref, dlsT_ref, dlbT_ref):
                ref[...] = jnp.zeros_like(ref)

        @pl.when(t == 0)
        def _reset_cls():
            dqc_scr[...] = jnp.zeros_like(dqc_scr)
            dck_scr[...] = jnp.zeros_like(dck_scr)
            dcv_scr[...] = jnp.zeros_like(dcv_scr)

        ln_sT = ln_sT_ref[:].astype(f32)
        ln_bT = ln_bT_ref[:].astype(f32)
        bqT = bqT_ref[:].astype(f32)
        bkT = bkT_ref[:].astype(f32)
        bvT = bvT_ref[:].astype(f32)
        scale = jnp.asarray(d, f32) ** -0.5

        def lnT_fwd(tT):
            tf = tT.astype(f32)
            mu = jnp.mean(tf, axis=0, keepdims=True)
            var = jnp.mean(jnp.square(tf - mu), axis=0, keepdims=True)
            rstd = jax.lax.rsqrt(var + 1e-5)
            xhat = (tf - mu) * rstd
            return xhat * ln_sT + ln_bT, xhat, rstd

        clsT = cls_ref[0].T
        cls_lnT_f, xhat_cT, rstd_cT = lnT_fwd(clsT)
        cls_lnT = cls_lnT_f.astype(dtype)
        qkv_cT = jnp.dot(wqkvT_ref[:], cls_lnT, preferred_element_type=f32)
        qc3 = ((qkv_cT[:D] + bqT) * scale).reshape(H, d, 1)
        kc3 = (qkv_cT[D:2 * D] + bkT).reshape(H, d, 1)
        vc3 = (qkv_cT[2 * D:] + bvT).reshape(H, d, 1)
        kcB = jnp.concatenate([kc3] * FPP, axis=0)         # [FPP*H, d, 1]
        vcB = jnp.concatenate([vc3] * FPP, axis=0)
        qcB = jnp.concatenate([qc3] * FPP, axis=0)

        q3 = qT_ref[0].reshape(FPP * H, d, N)
        k3 = kT_ref[0].reshape(FPP * H, d, N)
        v3 = vT_ref[0].reshape(FPP * H, d, N)
        k3f = k3.astype(f32)
        v3f = v3.astype(f32)
        CONTRACT_D = (((1,), (1,)), ((0,), (0,)))
        CONTRACT_NK = (((2,), (2,)), ((0,), (0,)))
        CONTRACT_Q_LHS2 = (((2,), (1,)), ((0,), (0,)))

        # upstream grads per frame, batched to [FPP*H, d, N]
        gTs = [g_ref[0, f].T if row_io else g_ref[0, f] for f in range(FPP)]
        if wide_mm:
            # round-4 mm_group trick: ONE [D,D]@[D,FPP*N] matmul (lane pad
            # 8.8% at FPP=3 vs 30.6% per frame; see the attention module)
            g_cat = jnp.concatenate(gTs, axis=1)           # [D, FPP*N]
            dattnW = jnp.dot(wproj_ref[:], g_cat, preferred_element_type=f32)
            dattnT_fs = [dattnW[:, f * N:(f + 1) * N] for f in range(FPP)]
        else:
            dattnT_fs = [jnp.dot(wproj_ref[:], gTs[f],
                                 preferred_element_type=f32)
                         for f in range(FPP)]
        dout3 = jnp.stack(dattnT_fs).reshape(FPP * H, d, N)
        dout_b = dout3.astype(dtype)
        gcls = gcls_ref[0]
        dattn_cT = jnp.dot(wproj_ref[:], gcls.T, preferred_element_type=f32)
        dout_c3 = dattn_cT.reshape(H, d, 1)
        dout_cB = jnp.concatenate([dout_c3] * FPP, axis=0)
        acls3 = aclsT_ref[0].reshape(H, d, 1)
        lse3 = lse_ref[0].T                                # [H, 1]
        lseB = jnp.concatenate([lse3] * FPP, axis=0)       # [FPP*H, 1]

        # Normalization is FOLDED out of the N^2 passes: every dot consumes
        # the RAW (unnormalized) probs p and the 1/denom scale rides the
        # [d, N]-sized operands/results instead (a per-QUERY factor commutes
        # with key-axis contractions) — saves ~3 N^2 VPU passes per program
        # vs materializing pn = p/denom (round 4).
        if use_probs:
            recip = 1.0 / den_ref[0].reshape(FPP * H, N)       # [FPPH, Nq]
            p_b = p_ref[0].reshape(FPP * H, N, N)              # bf16 saved
            p_f = p_b.astype(f32)
            pcls_raw = pcls_ref[0].reshape(FPP * H, N)
        else:
            logits = jax.lax.dot_general(q3, k3, CONTRACT_D,
                                         preferred_element_type=f32)
            cls_l = jnp.sum(q3.astype(f32) * kcB, axis=1)
            m = jnp.maximum(jnp.max(logits, axis=-1), cls_l)
            p_f = jnp.exp(logits - m[..., None])
            pcls_raw = jnp.exp(cls_l - m)
            denom = jnp.sum(p_f, axis=-1) + pcls_raw
            recip = 1.0 / denom
            p_b = p_f.astype(dtype)
        pn_cls = pcls_raw * recip

        # attn recompute (no attnT saves) + dwproj per frame
        oT3 = (jax.lax.dot_general(v3, p_b, CONTRACT_NK,
                                   preferred_element_type=f32)
               + vcB * pcls_raw[:, None, :]) * recip[:, None, :]
        attn_all = oT3.astype(dtype).reshape(FPP, D, N)
        if wide_mm:
            attn_cat = jnp.concatenate([attn_all[f] for f in range(FPP)],
                                       axis=1)             # [D, FPP*N]
            dwproj_ref[...] += jax.lax.dot_general(
                attn_cat, g_cat, LANE_NN, preferred_element_type=f32)
            dbprojT_ref[...] += jnp.sum(g_cat.astype(f32), axis=1,
                                        keepdims=True)
        else:
            for f in range(FPP):
                dwproj_ref[...] += jax.lax.dot_general(
                    attn_all[f], gTs[f], LANE_NN, preferred_element_type=f32)
                dbprojT_ref[...] += jnp.sum(gTs[f].astype(f32), axis=1,
                                            keepdims=True)

        # value / prob / softmax backward (batched).  dv consumes raw p with
        # dout pre-scaled by the query-side 1/denom.
        dout_scaled = (dout3 * recip[:, None, :]).astype(dtype)
        dv3 = jax.lax.dot_general(dout_scaled, p_b, CONTRACT_Q_LHS2,
                                  preferred_element_type=f32)
        dcv_B = jnp.sum(dout3 * pn_cls[:, None, :], axis=2, keepdims=True)
        dp = jax.lax.dot_general(dout_b, v3, CONTRACT_D,
                                 preferred_element_type=f32)
        dp_cls = jnp.sum(dout3 * vcB, axis=1)
        # flash-delta identity: sum_k pn*dp + pn_cls*dp_cls == dout . o
        # (o = the normalized attention rows incl. the CLS-key term) — a
        # d-sublane reduce of tensors already in registers instead of an
        # N^2 multiply + lane reduce.
        rowsum = jnp.sum(dout3 * oT3, axis=1)              # [FPP*H, Nq]
        e_b = (p_f * (dp - rowsum[..., None])).astype(dtype)
        ds_cls = pn_cls * (dp_cls - rowsum)
        dq3 = jax.lax.dot_general(k3, e_b, CONTRACT_NK,
                                  preferred_element_type=f32) \
            * recip[:, None, :] + kcB * ds_cls[:, None, :]
        q_scaled = (q3.astype(f32) * recip[:, None, :]).astype(dtype)
        dk3 = jax.lax.dot_general(q_scaled, e_b, CONTRACT_Q_LHS2,
                                  preferred_element_type=f32)
        dck_B = jnp.sum(q3.astype(f32) * ds_cls[:, None, :], axis=2,
                        keepdims=True)

        # CLS row contribution from this program's FPP frames' keys
        delta3 = jnp.sum(acls3 * dout_c3, axis=1)          # [H, 1]
        deltaB = jnp.concatenate([delta3] * FPP, axis=0)
        lrow = jnp.sum(k3f * qcB, axis=1)                  # [FPP*H, Nk]
        pn_row = jnp.exp(lrow - lseB)
        dv3 = dv3 + pn_row[:, None, :] * dout_cB
        dp_row = jnp.sum(v3f * dout_cB, axis=1)
        ds_row = pn_row * (dp_row - deltaB)
        dqc_B = jnp.sum(k3f * ds_row[:, None, :], axis=2, keepdims=True)
        dk3 = dk3 + qcB * ds_row[:, None, :]

        # fold the [FPP*H, d, 1] CLS grads into the [H, d, 1] scratches
        for f in range(FPP):
            dcv_scr[...] += dcv_B[f * H:(f + 1) * H]
            dck_scr[...] += dck_B[f * H:(f + 1) * H]
            dqc_scr[...] += dqc_B[f * H:(f + 1) * H]

        @pl.when(t == 0)
        def _self():
            p_self = jnp.exp(jnp.sum(qc3 * kc3, axis=1) - lse3)
            dcv_scr[...] += p_self[..., None] * dout_c3
            dp_self = jnp.sum(vc3 * dout_c3, axis=1)
            ds_self = p_self * (dp_self - delta3)
            dqc_scr[...] += ds_self[..., None] * kc3
            dck_scr[...] += ds_self[..., None] * qc3

        dq_all = (dq3 * scale).reshape(FPP, D, N)
        dk_all = dk3.reshape(FPP, D, N)
        dv_all = dv3.reshape(FPP, D, N)
        if wide_mm:
            # frame-concatenated weight-grad + dxln matmuls: the LANE_NN
            # contraction over FPP*N lanes sums the frames in ONE dot
            dqkvW = jnp.concatenate(
                [jnp.concatenate([dq_all[f], dk_all[f], dv_all[f]], axis=0)
                 for f in range(FPP)], axis=1).astype(dtype)  # [3D, FPP*N]
            lnfs = [lnT_fwd(x_ref[0, f].T if row_io else x_ref[0, f])
                    for f in range(FPP)]
            xln_cat = jnp.concatenate([lf[0] for lf in lnfs],
                                      axis=1).astype(dtype)   # [D, FPP*N]
            dwqkvT_ref[...] += jax.lax.dot_general(
                dqkvW, xln_cat, LANE_NN, preferred_element_type=f32)
            dbqT_ref[...] += jnp.sum(dq_all, axis=(0, 2))[:, None]
            dbkT_ref[...] += jnp.sum(dk_all, axis=(0, 2))[:, None]
            dbvT_ref[...] += jnp.sum(dv_all, axis=(0, 2))[:, None]
            dxlnW = jnp.dot(wqkv_ref[:], dqkvW, preferred_element_type=f32)
            for f in range(FPP):
                dxlnT = dxlnW[:, f * N:(f + 1) * N]
                _, xhatT, rstdT = lnfs[f]
                dlsT_ref[...] += jnp.sum(dxlnT * xhatT, axis=1, keepdims=True)
                dlbT_ref[...] += jnp.sum(dxlnT, axis=1, keepdims=True)
                dxhatT = dxlnT * ln_sT
                m1 = jnp.mean(dxhatT, axis=0, keepdims=True)
                m2 = jnp.mean(dxhatT * xhatT, axis=0, keepdims=True)
                dxT = (dxhatT - m1 - xhatT * m2) * rstdT
                dx_ref[0, f] = (dxT.T if row_io else dxT).astype(dx_ref.dtype)
        else:
            for f in range(FPP):
                dqT = dq_all[f]
                dkT = dk_all[f]
                dvT = dv_all[f]
                dqkvT = jnp.concatenate([dqT, dkT, dvT], axis=0).astype(dtype)
                x_lnT, xhatT, rstdT = lnT_fwd(
                    x_ref[0, f].T if row_io else x_ref[0, f])
                x_lnT_b = x_lnT.astype(dtype)
                dwqkvT_ref[...] += jax.lax.dot_general(
                    dqkvT, x_lnT_b, LANE_NN, preferred_element_type=f32)
                dbqT_ref[...] += jnp.sum(dqT, axis=1, keepdims=True)
                dbkT_ref[...] += jnp.sum(dkT, axis=1, keepdims=True)
                dbvT_ref[...] += jnp.sum(dvT, axis=1, keepdims=True)
                dxlnT = jnp.dot(wqkv_ref[:], dqkvT, preferred_element_type=f32)
                dlsT_ref[...] += jnp.sum(dxlnT * xhatT, axis=1, keepdims=True)
                dlbT_ref[...] += jnp.sum(dxlnT, axis=1, keepdims=True)
                dxhatT = dxlnT * ln_sT
                m1 = jnp.mean(dxhatT, axis=0, keepdims=True)
                m2 = jnp.mean(dxhatT * xhatT, axis=0, keepdims=True)
                dxT = (dxhatT - m1 - xhatT * m2) * rstdT
                dx_ref[0, f] = (dxT.T if row_io else dxT).astype(dx_ref.dtype)

        @pl.when(t == pl.num_programs(1) - 1)
        def _finish_cls():
            dqcT = dqc_scr[...].reshape(D, 1) * scale
            dkcT = dck_scr[...].reshape(D, 1)
            dvcT = dcv_scr[...].reshape(D, 1)
            dqkv_cT = jnp.concatenate([dqcT, dkcT, dvcT], axis=0).astype(dtype)
            dwqkvT_ref[...] += jnp.dot(dqkv_cT, cls_lnT.T,
                                       preferred_element_type=f32)
            dbqT_ref[...] += dqcT
            dbkT_ref[...] += dkcT
            dbvT_ref[...] += dvcT
            dwproj_ref[...] += jnp.dot(aclsT_ref[0].astype(dtype), gcls,
                                       preferred_element_type=f32)
            dbprojT_ref[...] += gcls.astype(f32).T
            dxln_cT = jnp.dot(wqkv_ref[:], dqkv_cT,
                              preferred_element_type=f32)
            dlsT_ref[...] += dxln_cT * xhat_cT
            dlbT_ref[...] += dxln_cT
            dxhat_c = dxln_cT * ln_sT
            m1c = jnp.mean(dxhat_c, axis=0, keepdims=True)
            m2c = jnp.mean(dxhat_c * xhat_cT, axis=0, keepdims=True)
            dxcT = (dxhat_c - m1c - xhat_cT * m2c) * rstd_cT
            dxcls_ref[0] = dxcT.T.astype(dxcls_ref.dtype)

    return kernel


def fused_space_attention_block_v9_bwd(goT, gocls, xT, cls, ln_scale, ln_bias,
                                       wqkv, bqkv, wproj, lse, aclsT,
                                       acts_saved, probs_saved,
                                       num_heads: int, fpp: int,
                                       wide_mm: bool = False,
                                       interpret: bool = False):
    """Backward matching fused_space_attention_block_v9 (d-major tower I/O,
    FPP frames per program). wide_mm: frame-concatenated proj/qkv-grad
    matmuls (round-4 mm_group trick)."""
    B, T, D, N = xT.shape
    H = num_heads
    d = D // H
    b3 = bqkv.reshape(3, D)

    groupT_spec = pl.BlockSpec((1, fpp, D, N), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    clsT_spec = pl.BlockSpec((1, D, 1), lambda b, t: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    vecT_spec = pl.BlockSpec((D, 1), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    wqkvT_spec = pl.BlockSpec((3 * D, D), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((D, 3 * D), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    wproj_spec = pl.BlockSpec((D, D), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, 1, H), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    extra_specs = [groupT_spec] * 3
    extra_ins = tuple(acts_saved)
    if probs_saved is not None:
        extra_specs += [
            pl.BlockSpec((1, fpp, H, N, N), lambda b, t: (b, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fpp, H, N), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fpp, H, N), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM)]
        extra_ins += tuple(probs_saved)

    outs = pl.pallas_call(
        _make_space_bwd_kernel_v9(H, fpp, use_probs=probs_saved is not None,
                                  wide_mm=wide_mm),
        grid=(B, T // fpp),
        in_specs=[groupT_spec, cls_spec, groupT_spec, cls_spec, vecT_spec,
                  vecT_spec, wqkvT_spec, wqkv_spec, vecT_spec, vecT_spec,
                  vecT_spec, wproj_spec, lse_spec, clsT_spec] + extra_specs,
        out_specs=(groupT_spec, cls_spec, wqkvT_spec, vecT_spec, vecT_spec,
                   vecT_spec, wproj_spec, vecT_spec, vecT_spec, vecT_spec),
        out_shape=(jax.ShapeDtypeStruct((B, T, D, N), xT.dtype),
                   jax.ShapeDtypeStruct((B, 1, D), xT.dtype),
                   jax.ShapeDtypeStruct((3 * D, D), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, D), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((H, d, 1), jnp.float32)] * 3,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(goT, gocls, xT, cls, ln_scale.reshape(D, 1), ln_bias.reshape(D, 1),
      wqkv.T, wqkv, b3[0].reshape(D, 1), b3[1].reshape(D, 1),
      b3[2].reshape(D, 1), wproj, lse, aclsT, *extra_ins)
    (dxT, dxcls, dwqkvT, dbqT, dbkT, dbvT, dwproj, dbprojT, dlsT, dlbT) = outs
    dbqkv = jnp.concatenate([dbqT[:, 0], dbkT[:, 0], dbvT[:, 0]])
    return (dxT, dxcls, dlsT[:, 0], dlbT[:, 0], dwqkvT.T, dbqkv, dwproj,
            dbprojT[:, 0])


def make_space_subpath_v9(num_heads: int, fpp: int = 3,
                          save_probs: bool = True,
                          interpret: bool = False):
    """Differentiable d-major FPP-frame-batched space sub-path (v9 train).
    Same contract as make_space_subpath_v7; save_probs additionally skips
    the softmax recompute in the backward."""
    from tvts_tpu.ops.pallas_block_attention import fused_space_attention_block_v9

    H = num_heads

    @jax.custom_vjp
    def f(xT, baseT, cls, basecls, ln_scale, ln_bias, wqkv, bqkv, wproj,
          bproj):
        return fused_space_attention_block_v9(
            xT, baseT, cls, basecls, ln_scale, ln_bias, wqkv, bqkv, wproj,
            bproj, num_heads=H, fpp=fpp, interpret=interpret)

    def fwd(xT, baseT, cls, basecls, ln_scale, ln_bias, wqkv, bqkv, wproj,
            bproj):
        outs = fused_space_attention_block_v9(
            xT, baseT, cls, basecls, ln_scale, ln_bias, wqkv, bqkv, wproj,
            bproj, num_heads=H, fpp=fpp, save_stats=True, save_acts=True,
            save_probs=save_probs, interpret=interpret)
        oT, ocls, lse, aclsT = outs[:4]
        acts = tuple(outs[4:7])
        probs = tuple(outs[7:]) if save_probs else None
        return (oT, ocls), (xT, cls, ln_scale, ln_bias, wqkv, bqkv, wproj,
                            lse, aclsT, acts, probs)

    def bwd(res, g):
        goT, gocls = g
        (xT, cls, ln_scale, ln_bias, wqkv, bqkv, wproj, lse, aclsT, acts,
         probs) = res
        dxT, dxcls, dls, dlb, dwqkv, dbqkv, dwproj, dbproj = \
            fused_space_attention_block_v9_bwd(
                goT, gocls, xT, cls, ln_scale, ln_bias, wqkv, bqkv, wproj,
                lse, aclsT, acts, probs, num_heads=H, fpp=fpp,
                interpret=interpret)
        return (dxT, goT, dxcls, gocls, dls.astype(ln_scale.dtype),
                dlb.astype(ln_bias.dtype), dwqkv.astype(wqkv.dtype),
                dbqkv.astype(bqkv.dtype), dwproj.astype(wproj.dtype),
                dbproj.astype(bqkv.dtype))

    f.defvjp(fwd, bwd)
    return f


def fused_space_attention_block_v10_bwd(g, x, ln_scale, ln_bias, wqkv, bqkv,
                                        wproj, lse, aclsT, acts_saved,
                                        probs_saved, num_frames: int,
                                        patches_per_frame: int,
                                        num_heads: int, fpp: int,
                                        wide_mm: bool = False,
                                        interpret: bool = False):
    """Backward matching fused_space_attention_block_v10 (row-major tower
    I/O, FPP frames per program, d-major saves)."""
    B, S, D = x.shape
    T, N = num_frames, patches_per_frame
    H = num_heads
    d = D // H
    assert S == 1 + T * N
    b3 = bqkv.reshape(3, D)

    g_cls, g_p = g[:, :1], g[:, 1:].reshape(B, T, N, D)
    x_cls, x_p = x[:, :1], x[:, 1:].reshape(B, T, N, D)

    group_spec = pl.BlockSpec((1, fpp, N, D), lambda b, t: (b, t, 0, 0),
                              memory_space=pltpu.VMEM)
    groupT_spec = pl.BlockSpec((1, fpp, D, N), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM)
    cls_spec = pl.BlockSpec((1, 1, D), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    clsT_spec = pl.BlockSpec((1, D, 1), lambda b, t: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    vecT_spec = pl.BlockSpec((D, 1), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    wqkvT_spec = pl.BlockSpec((3 * D, D), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((D, 3 * D), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
    wproj_spec = pl.BlockSpec((D, D), lambda b, t: (0, 0),
                              memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, 1, H), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    extra_specs = [groupT_spec] * 3
    extra_ins = tuple(acts_saved)
    if probs_saved is not None:
        extra_specs += [
            pl.BlockSpec((1, fpp, H, N, N), lambda b, t: (b, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fpp, H, N), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fpp, H, N), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM)]
        extra_ins += tuple(probs_saved)

    outs = pl.pallas_call(
        _make_space_bwd_kernel_v9(H, fpp, use_probs=probs_saved is not None,
                                  row_io=True, wide_mm=wide_mm),
        grid=(B, T // fpp),
        in_specs=[group_spec, cls_spec, group_spec, cls_spec, vecT_spec,
                  vecT_spec, wqkvT_spec, wqkv_spec, vecT_spec, vecT_spec,
                  vecT_spec, wproj_spec, lse_spec, clsT_spec] + extra_specs,
        out_specs=(group_spec, cls_spec, wqkvT_spec, vecT_spec, vecT_spec,
                   vecT_spec, wproj_spec, vecT_spec, vecT_spec, vecT_spec),
        out_shape=(jax.ShapeDtypeStruct((B, T, N, D), x.dtype),
                   jax.ShapeDtypeStruct((B, 1, D), x.dtype),
                   jax.ShapeDtypeStruct((3 * D, D), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, D), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((H, d, 1), jnp.float32)] * 3,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(g_p, g_cls, x_p, x_cls, ln_scale.reshape(D, 1), ln_bias.reshape(D, 1),
      wqkv.T, wqkv, b3[0].reshape(D, 1), b3[1].reshape(D, 1),
      b3[2].reshape(D, 1), wproj, lse, aclsT, *extra_ins)
    (dx_p, dx_cls, dwqkvT, dbqT, dbkT, dbvT, dwproj, dbprojT, dlsT,
     dlbT) = outs
    dx = jnp.concatenate([dx_cls, dx_p.reshape(B, T * N, D)], axis=1)
    dbqkv = jnp.concatenate([dbqT[:, 0], dbkT[:, 0], dbvT[:, 0]])
    return (dx, dlsT[:, 0], dlbT[:, 0], dwqkvT.T, dbqkv, dwproj,
            dbprojT[:, 0])


def make_space_subpath_v10(num_frames: int, patches_per_frame: int,
                           num_heads: int, fpp: int = 3,
                           save_probs: bool = True,
                           wide_mm: bool = False,
                           smv: str | None = None,
                           interpret: bool = False):
    """Differentiable FPP-frame-batched space sub-path with ROW tower I/O —
    drop-in for make_space_subpath_v3 (space_mode='pallas_v10'): the v9
    batched-attention kernels + in-kernel per-frame transposes + optional
    probs-saving backward. smv: softmax-variant knob for the forward
    (MXU-offloaded denominator; with save_probs the MXU denominator is
    what the backward consumes)."""
    from tvts_tpu.ops.pallas_block_attention import fused_space_attention_block_v10

    T, N, H = num_frames, patches_per_frame, num_heads

    @jax.custom_vjp
    def f(x, base, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj):
        return fused_space_attention_block_v10(
            x, base, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
            num_frames=T, patches_per_frame=N, num_heads=H, fpp=fpp,
            wide_mm=wide_mm, smv=smv, interpret=interpret)

    def fwd(x, base, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj):
        outs = fused_space_attention_block_v10(
            x, base, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
            num_frames=T, patches_per_frame=N, num_heads=H, fpp=fpp,
            save_stats=True, save_acts=True, save_probs=save_probs,
            wide_mm=wide_mm, smv=smv, interpret=interpret)
        out, lse, aclsT = outs[0], outs[1], outs[2]
        acts = tuple(outs[3:6])
        probs = tuple(outs[6:]) if save_probs else None
        return out, (x, ln_scale, ln_bias, wqkv, bqkv, wproj, lse, aclsT,
                     acts, probs)

    def bwd(res, g):
        (x, ln_scale, ln_bias, wqkv, bqkv, wproj, lse, aclsT, acts,
         probs) = res
        dx, dls, dlb, dwqkv, dbqkv, dwproj, dbproj = \
            fused_space_attention_block_v10_bwd(
                g, x, ln_scale, ln_bias, wqkv, bqkv, wproj, lse, aclsT,
                acts, probs, num_frames=T, patches_per_frame=N, num_heads=H,
                fpp=fpp, wide_mm=wide_mm, interpret=interpret)
        return (dx, g, dls.astype(ln_scale.dtype), dlb.astype(ln_bias.dtype),
                dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
                dwproj.astype(wproj.dtype), dbproj.astype(bqkv.dtype))

    f.defvjp(fwd, bwd)
    return f
