"""Fused causal self-attention sub-path for the text tower (and sort head).

One Pallas call per text block computes x + Proj(CausalAttn(LN(x))) without
ever materializing the [B, H, S, S] logits/probs tensors in HBM — the f32
softmax lives in VMEM per program. The matching backward recomputes the
probs flash-style (S = 77 fits whole in VMEM) and accumulates weight
gradients in fp32 constant-index output refs across the grid, exactly the
idiom of the video-tower megakernels (ops/pallas_block_backward.py).

Motivation (PERF.md round 5, tools/text_split_probe.py at B=20 / 80 rows):
the XLA text-attention chain costs 9.7 ms fwd+bwd while its matmul FLOPs
are negligible (~6 GFLOP) — all softmax/mask/layout overhead. Behavioral
contract: reference v2/CLIP/clip/model.py:171-204 (ResidualAttentionBlock
causal attention; the MLP half of the block stays XLA — it already runs at
MXU rate).

Mosaic rules respected (CLAUDE.md): all elementwise math in 2D [rows,
lanes] layouts, per-head lane-offset slices feed dots only, head outputs
assembled with lane-concat of computed arrays, sublane merges/slices for
the rows-per-program batching.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tvts_tpu.ops.pallas_block_attention import _compiler_params

NEG_BIG = -1e30  # additive causal bias; exp underflows to exactly 0.0 in f32


def _causal_bias(S: int) -> jnp.ndarray:
    row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    return jnp.where(col <= row, 0.0, NEG_BIG).astype(jnp.float32)


def _make_text_fwd_kernel(H: int, RPP: int, causal: bool,
                          eps: float = 1e-5):
    def kernel(x_ref, ln_s_ref, ln_b_ref, wqkv_ref, bq_ref, bk_ref, bv_ref,
               wproj_ref, bproj_ref, o_ref):
        S = x_ref.shape[1]
        D = x_ref.shape[2]
        d = D // H
        dtype = o_ref.dtype
        ln_s = ln_s_ref[0].astype(jnp.float32)
        ln_b = ln_b_ref[0].astype(jnp.float32)

        def layernorm(t):
            tf = t.astype(jnp.float32)
            mu = jnp.mean(tf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(tf - mu), axis=-1, keepdims=True)
            return (tf - mu) * jax.lax.rsqrt(var + eps) * ln_s[None] \
                + ln_b[None]

        scale = jnp.asarray(d, jnp.float32) ** -0.5

        x_flat = x_ref[...].reshape(RPP * S, D)
        x_ln = layernorm(x_flat).astype(dtype)
        bq = bq_ref[:].astype(jnp.float32)
        bk = bk_ref[:].astype(jnp.float32)
        bv = bv_ref[:].astype(jnp.float32)
        q = ((jnp.dot(x_ln, wqkv_ref[:, :D],
                      preferred_element_type=jnp.float32) + bq) * scale) \
            .astype(dtype)
        k = (jnp.dot(x_ln, wqkv_ref[:, D:2 * D],
                     preferred_element_type=jnp.float32) + bk).astype(dtype)
        v = (jnp.dot(x_ln, wqkv_ref[:, 2 * D:],
                     preferred_element_type=jnp.float32) + bv).astype(dtype)

        bias = _causal_bias(S) if causal else None
        for r in range(RPP):
            rows = slice(r * S, (r + 1) * S)
            outs = []
            for h in range(H):
                sl = slice(h * d, (h + 1) * d)
                qh, kh, vh = q[rows, sl], k[rows, sl], v[rows, sl]
                logits = jnp.dot(qh, kh.T,
                                 preferred_element_type=jnp.float32)
                if causal:
                    logits = logits + bias
                m = jnp.max(logits, axis=-1, keepdims=True)
                p = jnp.exp(logits - m)
                denom = jnp.sum(p, axis=-1, keepdims=True)
                oh = jnp.dot(p.astype(dtype), vh,
                             preferred_element_type=jnp.float32) / denom
                outs.append(oh.astype(dtype))
            attn = jnp.concatenate(outs, axis=-1)              # [S, D]
            proj = jnp.dot(attn, wproj_ref[:],
                           preferred_element_type=jnp.float32) \
                + bproj_ref[:].astype(jnp.float32)
            o_ref[r] = (x_ref[r].astype(jnp.float32) + proj).astype(dtype)

    return kernel


def fused_text_attention_block(x, ln_scale, ln_bias, wqkv, bqkv, wproj,
                               bproj, num_heads: int, causal: bool = True,
                               rpp: int | None = None, eps: float = 1e-5,
                               interpret: bool = False):
    """x: [B, S, D] -> x + Proj(CausalAttn(LN(x))), one kernel (no HBM
    probs). rpp: sequences per program (amortizes weight DMAs / fixed
    work); must divide B — auto-picked otherwise."""
    B, S, D = x.shape
    if rpp is None:
        rpp = next((r for r in (8, 4, 2, 1) if B % r == 0), 1)
    assert B % rpp == 0, (B, rpp)
    b3 = bqkv.reshape(3, D)
    x_spec = pl.BlockSpec((rpp, S, D), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((D, 3 * D), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    wproj_spec = pl.BlockSpec((D, D), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_text_fwd_kernel(num_heads, rpp, causal, eps=eps),
        grid=(B // rpp,),
        in_specs=[x_spec, vec_spec, vec_spec, wqkv_spec, vec_spec, vec_spec,
                  vec_spec, wproj_spec, vec_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((B, S, D), x.dtype),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x, ln_scale.reshape(1, D), ln_bias.reshape(1, D), wqkv,
      b3[0:1], b3[1:2], b3[2:3], wproj, bproj.reshape(1, D))


def _make_text_bwd_kernel(H: int, RPP: int, causal: bool,
                          frozen: bool = False, eps: float = 1e-5):
    """frozen=True: the block's weights are in the optimizer's frozen group
    (zero updates), so the kernel computes ONLY dx — the dW/db/dLN
    accumulations (the big-K weight-grad matmuls) are skipped entirely.
    stop_gradient at the param leaves cannot reach inside an opaque
    pallas_call, so the skip must be baked into the kernel itself."""

    def kernel(g_ref, x_ref, ln_s_ref, ln_b_ref, wqkv_ref, bq_ref, bk_ref,
               bv_ref, wproj_ref, dx_ref, *grad_refs):
        from tvts_tpu.ops.pallas_block_backward import _ln_bwd, _ln_fwd

        if not frozen:
            (dwqkv_ref, dbq_ref, dbk_ref, dbv_ref, dwproj_ref, dbproj_ref,
             dls_ref, dlb_ref) = grad_refs

            @pl.when(pl.program_id(0) == 0)
            def _zero():
                for ref in grad_refs:
                    ref[...] = jnp.zeros_like(ref)

        S = x_ref.shape[1]
        D = x_ref.shape[2]
        d = D // H
        dtype = x_ref.dtype

        ln_s = ln_s_ref[0].astype(jnp.float32)
        ln_b = ln_b_ref[0].astype(jnp.float32)
        bq = bq_ref[:].astype(jnp.float32)
        bk = bk_ref[:].astype(jnp.float32)
        bv = bv_ref[:].astype(jnp.float32)
        scale = jnp.asarray(d, jnp.float32) ** -0.5

        x_flat = x_ref[...].reshape(RPP * S, D)
        x_ln_f, xhat, rstd = _ln_fwd(x_flat, ln_s, ln_b, eps=eps)
        x_ln = x_ln_f.astype(dtype)
        q = ((jnp.dot(x_ln, wqkv_ref[:, :D],
                      preferred_element_type=jnp.float32) + bq) * scale) \
            .astype(dtype)
        k = (jnp.dot(x_ln, wqkv_ref[:, D:2 * D],
                     preferred_element_type=jnp.float32) + bk).astype(dtype)
        v = (jnp.dot(x_ln, wqkv_ref[:, 2 * D:],
                     preferred_element_type=jnp.float32) + bv).astype(dtype)

        g_flat = g_ref[...].reshape(RPP * S, D)
        dattn_all = jnp.dot(g_flat, wproj_ref[:].T,
                            preferred_element_type=jnp.float32)

        bias = _causal_bias(S) if causal else None
        row_outs, row_dq, row_dk, row_dv = [], [], [], []
        for r in range(RPP):
            rows = slice(r * S, (r + 1) * S)
            outs, dqs, dks, dvs = [], [], [], []
            for h in range(H):
                sl = slice(h * d, (h + 1) * d)
                qh, kh, vh = q[rows, sl], k[rows, sl], v[rows, sl]
                logits = jnp.dot(qh, kh.T,
                                 preferred_element_type=jnp.float32)
                if causal:
                    logits = logits + bias
                m = jnp.max(logits, axis=-1, keepdims=True)
                p = jnp.exp(logits - m)
                denom = jnp.sum(p, axis=-1, keepdims=True)
                pn = p / denom                                 # [S, S] f32
                pn_b = pn.astype(dtype)
                if not frozen:
                    # the pre-proj attention output is only needed for dwproj
                    oh = jnp.dot(pn_b, vh,
                                 preferred_element_type=jnp.float32)
                    outs.append(oh.astype(dtype))

                dout = dattn_all[rows, sl]                     # [S, d] f32
                dout_b = dout.astype(dtype)
                dv_h = jnp.dot(pn_b.T, dout_b,
                               preferred_element_type=jnp.float32)
                dp = jnp.dot(dout_b, vh.T,
                             preferred_element_type=jnp.float32)
                rowsum = jnp.sum(pn * dp, axis=-1, keepdims=True)
                ds = pn * (dp - rowsum)                        # masked -> 0
                ds_b = ds.astype(dtype)
                dq_h = jnp.dot(ds_b, kh, preferred_element_type=jnp.float32)
                dk_h = jnp.dot(ds_b.T, qh, preferred_element_type=jnp.float32)
                dqs.append(dq_h)
                dks.append(dk_h)
                dvs.append(dv_h)
            if not frozen:
                row_outs.append(jnp.concatenate(outs, axis=-1))
            row_dq.append(jnp.concatenate(dqs, axis=-1))
            row_dk.append(jnp.concatenate(dks, axis=-1))
            row_dv.append(jnp.concatenate(dvs, axis=-1))

        if not frozen:
            attn_out = jnp.concatenate(row_outs, axis=0)       # [RPP*S, D]
            dwproj_ref[...] += jnp.dot(attn_out.T, g_flat,
                                       preferred_element_type=jnp.float32)
            dbproj_ref[...] += jnp.sum(g_flat.astype(jnp.float32), axis=0,
                                       keepdims=True)

        dq = jnp.concatenate(row_dq, axis=0) * scale           # [RPP*S, D]
        dk = jnp.concatenate(row_dk, axis=0)
        dv = jnp.concatenate(row_dv, axis=0)
        dq_b, dk_b, dv_b = (dq.astype(dtype), dk.astype(dtype),
                            dv.astype(dtype))
        if not frozen:
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
        if not frozen:
            dls_ref[...] += jnp.sum(dxln * xhat, axis=0, keepdims=True)
            dlb_ref[...] += jnp.sum(dxln, axis=0, keepdims=True)
        dx = g_flat.astype(jnp.float32) + _ln_bwd(dxln, xhat, rstd, ln_s)
        dx_ref[...] = dx.reshape(RPP, S, D).astype(dx_ref.dtype)

    return kernel


def fused_text_attention_block_bwd(g, x, ln_scale, ln_bias, wqkv, bqkv,
                                   wproj, num_heads: int, causal: bool = True,
                                   rpp: int | None = None,
                                   frozen: bool = False, eps: float = 1e-5,
                                   interpret: bool = False):
    B, S, D = x.shape
    if rpp is None:
        rpp = next((r for r in (8, 4, 2, 1) if B % r == 0), 1)
    assert B % rpp == 0, (B, rpp)
    b3 = bqkv.reshape(3, D)
    x_spec = pl.BlockSpec((rpp, S, D), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((D, 3 * D), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    wproj_spec = pl.BlockSpec((D, D), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    acc = functools.partial(jax.ShapeDtypeStruct, dtype=jnp.float32)
    if frozen:
        out_specs = (x_spec,)
        out_shape = (jax.ShapeDtypeStruct((B, S, D), x.dtype),)
    else:
        out_specs = (x_spec, wqkv_spec, vec_spec, vec_spec, vec_spec,
                     wproj_spec, vec_spec, vec_spec, vec_spec)
        out_shape = (jax.ShapeDtypeStruct((B, S, D), x.dtype),
                     acc((D, 3 * D)), acc((1, D)), acc((1, D)), acc((1, D)),
                     acc((D, D)), acc((1, D)), acc((1, D)), acc((1, D)))
    outs = pl.pallas_call(
        _make_text_bwd_kernel(num_heads, rpp, causal, frozen=frozen,
                              eps=eps),
        grid=(B // rpp,),
        in_specs=[x_spec, x_spec, vec_spec, vec_spec, wqkv_spec, vec_spec,
                  vec_spec, vec_spec, wproj_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(g, x, ln_scale.reshape(1, D), ln_bias.reshape(1, D), wqkv,
      b3[0:1], b3[1:2], b3[2:3], wproj)
    if frozen:
        dx = outs if not isinstance(outs, (tuple, list)) else outs[0]
        zl = jnp.zeros_like
        return (dx, zl(ln_scale), zl(ln_bias), zl(wqkv), zl(bqkv),
                zl(wproj), jnp.zeros((D,), wproj.dtype))
    (dx, dwqkv, dbq, dbk, dbv, dwproj, dbproj, dls, dlb) = outs
    dbqkv = jnp.concatenate([dbq[0], dbk[0], dbv[0]], axis=0)
    return dx, dls[0], dlb[0], dwqkv, dbqkv, dwproj, dbproj[0]


def make_text_subpath(num_heads: int, causal: bool = True,
                      rpp: int | None = None, frozen: bool = False,
                      eps: float = 1e-5, interpret: bool = False):
    """Differentiable fused text-attention sub-path:
    f(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj) -> x + Attn path.
    frozen=True: the backward computes only dx (weight cotangents are
    symbolic zeros) — for blocks in the optimizer's frozen group, where
    the in-kernel dW accumulation would be dead work stop_gradient cannot
    reach. Grad parity vs jax.grad of the XLA formulation in
    tests/test_text_kernel.py."""

    @jax.custom_vjp
    def f(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj):
        return fused_text_attention_block(
            x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
            num_heads=num_heads, causal=causal, rpp=rpp, eps=eps,
            interpret=interpret)

    def fwd(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj):
        out = f(x, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj)
        return out, (x, ln_scale, ln_bias, wqkv, bqkv, wproj)

    def bwd(res, g):
        x, ln_scale, ln_bias, wqkv, bqkv, wproj = res
        dx, dls, dlb, dwqkv, dbqkv, dwproj, dbproj = \
            fused_text_attention_block_bwd(
                g, x, ln_scale, ln_bias, wqkv, bqkv, wproj,
                num_heads=num_heads, causal=causal, rpp=rpp, frozen=frozen,
                eps=eps, interpret=interpret)
        return dx, dls, dlb, dwqkv, dbqkv, dwproj, dbproj

    f.defvjp(fwd, bwd)
    return f


def _eot_only_block(x, bp, eot_pos, H, act, dtype):
    """The LAST text block narrowed to each sequence's EOT row — the only
    row ln_final -> pool consumes (dead-work trim, exact: LN is per-token
    and the EOT query attends causally over the full k/v set)."""
    from tvts_tpu.ops.fused_forward import _layernorm, _mlp

    B, S, D = x.shape
    d = D // H
    x_ln = _layernorm(x, bp["ln_1"])
    wqkv = bp["attn"]["qkv"]["kernel"].astype(dtype)
    bqkv = bp["attn"]["qkv"]["bias"].astype(dtype)
    k = x_ln @ wqkv[:, D:2 * D] + bqkv[D:2 * D]
    v = x_ln @ wqkv[:, 2 * D:] + bqkv[2 * D:]
    x_eot = jnp.take_along_axis(x, eot_pos[:, None, None], axis=1)  # [B,1,D]
    q_eot = jnp.take_along_axis(x_ln, eot_pos[:, None, None], axis=1) \
        @ wqkv[:, :D] + bqkv[:D]
    q = q_eot.reshape(B, 1, H, d).transpose(0, 2, 1, 3) * (d ** -0.5)
    kh = k.reshape(B, S, H, d).transpose(0, 2, 1, 3)
    vh = v.reshape(B, S, H, d).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhid,bhjd->bhij", q, kh)       # [B, H, 1, S]
    mask = (jnp.arange(S)[None, :] <= eot_pos[:, None])[:, None, None]
    logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhij,bhjd->bhid", p, vh) \
        .transpose(0, 2, 1, 3).reshape(B, 1, D)
    o = o @ bp["attn"]["proj"]["kernel"].astype(dtype) \
        + bp["attn"]["proj"]["bias"].astype(dtype)
    x_eot = x_eot + o
    return x_eot + _mlp(_layernorm(x_eot, bp["ln_2"]), bp["mlp"], act)


def text_transformer_fused_forward(params, cfg, token_ids, dtype=jnp.bfloat16,
                                   rpp: int | None = None,
                                   tune_from: int | None = None,
                                   interpret: bool = False):
    """TextTransformer.__call__ (models/text.py) with the attention sub-path
    of every block running the fused Pallas kernel; MLP + LNs + embed/pool
    stay XLA (measured at MXU rate). The LAST block computes only the EOT
    rows (_eot_only_block). Same params tree as the flax module.

    tune_from: blocks below this index are in the optimizer's frozen group,
    so their attention backward uses the dx-only kernel (weight cotangents
    are zeros the optimizer would discard anyway) and their MLP weights are
    stop_gradient'd here — inside the kernel the train steps' freeze_mask
    stop_gradient cannot reach. rpp (TVTS_TEXT_RPP): sequences per kernel
    program."""
    import os

    from tvts_tpu.ops.fused_forward import _layernorm, _mlp

    if rpp is None and os.environ.get("TVTS_TEXT_RPP"):
        rpp = int(os.environ["TVTS_TEXT_RPP"])
    emb = params["token_embedding"]["embedding"].astype(dtype)[token_ids]
    x = emb + params["positional_embedding"][None].astype(dtype)
    H = cfg.heads
    sub = make_text_subpath(H, causal=True, rpp=rpp, interpret=interpret)
    sub_frozen = make_text_subpath(H, causal=True, rpp=rpp, frozen=True,
                                   interpret=interpret)
    n_layers = cfg.layers
    eot_pos = jnp.argmax(token_ids, axis=-1)
    for i in range(n_layers - 1):
        bp = params[f"blocks_{i}"]
        if tune_from is not None and i < tune_from:
            bp = jax.lax.stop_gradient(bp)
            f = sub_frozen
        else:
            f = sub
        x = f(x, bp["ln_1"]["scale"], bp["ln_1"]["bias"],
              bp["attn"]["qkv"]["kernel"].astype(dtype),
              bp["attn"]["qkv"]["bias"].astype(dtype),
              bp["attn"]["proj"]["kernel"].astype(dtype),
              bp["attn"]["proj"]["bias"].astype(dtype))
        x = x + _mlp(_layernorm(x, bp["ln_2"]), bp["mlp"], cfg.act)
    x = _eot_only_block(x, params[f"blocks_{n_layers - 1}"], eot_pos, H,
                        cfg.act, dtype)
    pooled = _layernorm(x, params["ln_final"])[:, 0]
    return pooled @ params["text_projection"].astype(dtype)


def _sort_tail_block(x, bp, n_text, H, dtype):
    """The LAST sort block narrowed to the text-position rows (the exact
    dead-work trim of models/sort.py::SortBlock(tail=...), spelled on the
    raw param tree for the fused forward). LN eps 1e-6 per the sort
    contract."""
    from tvts_tpu.ops.fused_forward import _layernorm, _mlp

    B, S, D = x.shape
    d = D // H
    wqkv = bp["attn"]["qkv"]["kernel"].astype(dtype)
    bqkv = bp["attn"]["qkv"]["bias"].astype(dtype)
    x_ln = _layernorm(x, bp["norm1"], eps=1e-6)
    k = x_ln @ wqkv[:, D:2 * D] + bqkv[D:2 * D]
    v = x_ln @ wqkv[:, 2 * D:] + bqkv[2 * D:]
    q = (x_ln[:, -n_text:] @ wqkv[:, :D] + bqkv[:D]) * (d ** -0.5)
    qh = q.reshape(B, n_text, H, d).transpose(0, 2, 1, 3)
    kh = k.reshape(B, S, H, d).transpose(0, 2, 1, 3)
    vh = v.reshape(B, S, H, d).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhid,bhjd->bhij", qh, kh)
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhij,bhjd->bhid", p, vh) \
        .transpose(0, 2, 1, 3).reshape(B, n_text, D)
    o = o @ bp["attn"]["proj"]["kernel"].astype(dtype) \
        + bp["attn"]["proj"]["bias"].astype(dtype)
    xt = x[:, -n_text:] + o
    return xt + _mlp(_layernorm(xt, bp["norm2"], eps=1e-6), bp["mlp"], "gelu")


def sort_transformer_fused_forward(params, cfg, text_tokens, video_tokens,
                                   dtype=jnp.bfloat16,
                                   interpret: bool = False):
    """SortTransformer.__call__ (models/sort.py) with the full-attention
    sub-path of every non-final block running the fused kernel
    (causal=False — kills the [B, H, S, S] HBM probs at S ~ 1181) and the
    final block's exact text-rows-only trim. Same params tree as the flax
    module; LN eps 1e-6 throughout per the sort contract
    (reference v2/model/sort_transformer.py)."""
    from tvts_tpu.ops.fused_forward import _layernorm, _mlp

    type_embed = params["type_embed"].astype(dtype)
    v = video_tokens + type_embed[:, 0:1]
    t = text_tokens + type_embed[:, 1:2]
    x = jnp.concatenate([v, t], axis=1)
    n_text = t.shape[1]
    H = cfg.num_heads
    # rpp=1: at S ~ 1181 one row's backward working set already approaches
    # the VMEM budget (per-head [S, S] f32 logits/probs chains)
    sub = make_text_subpath(H, causal=False, rpp=1, eps=1e-6,
                            interpret=interpret)
    for i in range(cfg.depth - 1):
        bp = params[f"blocks_{i}"]
        x = sub(x, bp["norm1"]["scale"], bp["norm1"]["bias"],
                bp["attn"]["qkv"]["kernel"].astype(dtype),
                bp["attn"]["qkv"]["bias"].astype(dtype),
                bp["attn"]["proj"]["kernel"].astype(dtype),
                bp["attn"]["proj"]["bias"].astype(dtype))
        x = x + _mlp(_layernorm(x, bp["norm2"], eps=1e-6), bp["mlp"], "gelu")
    x = _sort_tail_block(x, params[f"blocks_{cfg.depth - 1}"], n_text, H,
                         dtype)
    x = _layernorm(x, params["norm"], eps=1e-6)
    return x @ params["head"]["kernel"].astype(dtype) \
        + params["head"]["bias"].astype(dtype)
