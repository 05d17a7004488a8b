#!/usr/bin/env python
"""Inside-the-time-kernel cost split at extraction shapes (VERDICT r3 #1a).

The v7 d-major time chain is 53.4 ms/12-block chain at B=32 — the #2
extraction cost after the MLP. This probe copies the v7 time kernel
(ops/pallas_block_attention.py::_make_time_block_kernel_v7) with components
ablated or reformulated, chains DEPTH calls in one jit graph each, and prints
the decision table:

  full        faithful v7 replica (sanity: ~53 ms at B=32)
  noattn      per-t attention loop + CLS accumulation skipped (isolates
              LN + qkv matmuls + heads() transposes + proj matmuls)
  noheads     noattn minus the heads() stack/transpose (isolates the
              [T,D,Nc] -> [H,T,d,Nc] reorganization cost)
  nomm        qkv/proj matmuls skipped, attention math fed from x slices
              (isolates the VPU attention math + heads)
  attn5d      attention per-t loop -> one-shot 5D broadcast forms (Mosaic
              may reject; errors are caught and reported)
  groupmm{g}  qkv + proj matmuls batched over g frames via dot_general with
              leading-concat (broadcast) weights — the v9 "batched rates
              rise" recipe applied to the projections
  widemm      qkv via lane-concat of 3 frames into one [D,588] matmul
              (588 -> 640 lanes = 8.8%% pad vs 196 -> 256 = 30.6%%)

MLP variants (same question for the 66.5 ms MLP chain):
  mlp_full    v7 MLP replica
  mlp_wide{g} grid (B, T/g), lane-concat g frames -> one [D, g*196] fc/proj
  mlp_batched3  batched dot_general over 3 frames, broadcast weights

Env: B (default 32), CASES (substring filter), TVTS_PROBE_INTERPRET=1 for a
CPU smoke run. Run on hardware: python tools/time_split_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tvts_tpu.ops.pallas_block_attention import (
    _lnT_fn,
    fused_mlp_block_v7,
    fused_time_attention_block_v7,
)

INTERPRET = bool(int(os.environ.get("TVTS_PROBE_INTERPRET", "0")))
B = int(os.environ.get("B", 32))
T, N, D, H = 12, 196, 768, 12
d = D // H
DEPTH = 3 if INTERPRET else 12


# ---------------------------------------------------------------------------
# experimental time kernels
# ---------------------------------------------------------------------------

def _make_time_kernel_variant(variant: str):
    groupmm = variant.startswith("groupmm")
    g = int(variant[len("groupmm"):]) if groupmm else 0

    def kernel(x_ref, cls_ref, ln_sT_ref, ln_bT_ref, wqkvT_ref, bqT_ref,
               bkT_ref, bvT_ref, wprojT_ref, bprojT_ref, o_ref, ocls_ref,
               m_scr, l_scr, acc_scr):
        c = pl.program_id(1)
        f32 = jnp.float32
        dtype = o_ref.dtype

        bqT = bqT_ref[:].astype(f32)
        bkT = bkT_ref[:].astype(f32)
        bvT = bvT_ref[:].astype(f32)
        scale = jnp.asarray(d, f32) ** -0.5
        lnT = _lnT_fn(ln_sT_ref[:].astype(f32), ln_bT_ref[:].astype(f32))

        xT = x_ref[0]                                      # [T, D, Nc]
        qs, ks, vs = [], [], []
        if variant == "nomm":
            # feed attention from raw x (no projections at all)
            for t in range(T):
                xt = xT[t].astype(dtype)
                qs.append(xt)
                ks.append(xt)
                vs.append(xt)
        elif groupmm:
            wg = jnp.concatenate([wqkvT_ref[:][None]] * g, axis=0)  # [g,3D,D]
            dn = (((2,), (1,)), ((0,), (0,)))
            for t0 in range(0, T, g):
                xg = jnp.stack([lnT(xT[t0 + i]).astype(dtype)
                                for i in range(g)])        # [g, D, Nc]
                qkvg = jax.lax.dot_general(wg, xg, dn,
                                           preferred_element_type=f32)
                for i in range(g):
                    qkvT_t = qkvg[i]
                    qs.append(((qkvT_t[:D] + bqT) * scale).astype(dtype))
                    ks.append((qkvT_t[D:2 * D] + bkT).astype(dtype))
                    vs.append((qkvT_t[2 * D:] + bvT).astype(dtype))
        elif variant == "widemm":
            gw = 3
            for t0 in range(0, T, gw):
                xcat = jnp.concatenate(
                    [lnT(xT[t0 + i]).astype(dtype) for i in range(gw)],
                    axis=1)                                 # [D, gw*Nc]
                qkvw = jnp.dot(wqkvT_ref[:], xcat,
                               preferred_element_type=f32)  # [3D, gw*Nc]
                for i in range(gw):
                    qkvT_t = qkvw[:, i * N:(i + 1) * N]
                    qs.append(((qkvT_t[:D] + bqT) * scale).astype(dtype))
                    ks.append((qkvT_t[D:2 * D] + bkT).astype(dtype))
                    vs.append((qkvT_t[2 * D:] + bvT).astype(dtype))
        else:
            for t in range(T):
                x_lnT_t = lnT(xT[t]).astype(dtype)
                qkvT_t = jnp.dot(wqkvT_ref[:], x_lnT_t,
                                 preferred_element_type=f32)
                qs.append(((qkvT_t[:D] + bqT) * scale).astype(dtype))
                ks.append((qkvT_t[D:2 * D] + bkT).astype(dtype))
                vs.append((qkvT_t[2 * D:] + bvT).astype(dtype))

        if variant == "noheads":
            # skip heads() reorg AND attention; project q directly
            bprojT = bprojT_ref[:].astype(f32)
            for t in range(T):
                projT_t = jnp.dot(wprojT_ref[:], qs[t],
                                  preferred_element_type=f32) + bprojT
                o_ref[0, t] = (xT[t].astype(f32) + projT_t).astype(dtype)
            ocls_ref[0] = cls_ref[0]
            return

        def heads(ts):
            return jnp.transpose(jnp.stack(ts).reshape(T, H, d, -1),
                                 (1, 0, 2, 3)).astype(f32)

        q4 = heads(qs)
        k4 = heads(ks)
        v4 = heads(vs)

        cls_lnT = lnT(cls_ref[0].T).astype(dtype)
        qkv_cT = jnp.dot(wqkvT_ref[:], cls_lnT, preferred_element_type=f32)
        qc3 = (qkv_cT[:D] + bqT).reshape(H, d, 1) * scale
        kc3 = (qkv_cT[D:2 * D] + bkT).reshape(H, d, 1)
        vc3 = (qkv_cT[2 * D:] + bvT).reshape(H, d, 1)

        @pl.when(c == 0)
        def _init():
            m_scr[...] = jnp.sum(qc3 * kc3, axis=1)
            l_scr[...] = jnp.ones_like(l_scr)
            acc_scr[...] = vc3

        if variant == "noattn":
            outs_t = [q4[:, t].astype(dtype).reshape(D, -1) for t in range(T)]
        elif variant == "attn5d":
            # one-shot all-pairs logits [H, T, T, Nc] via 5D broadcast
            l_all = jnp.sum(q4[:, :, None] * k4[:, None], axis=3)
            cls_l = jnp.sum(q4 * kc3[:, None], axis=2)     # [H, T, Nc]
            full = jnp.concatenate([cls_l[:, :, None], l_all], axis=2)
            m = jnp.max(full, axis=2, keepdims=True)       # [H, T, 1, Nc]
            p = jnp.exp(full - m)                          # [H, T, T+1, Nc]
            denom = jnp.sum(p, axis=2)                     # [H, T, Nc]
            out = jnp.sum(p[:, :, 1:, None, :] * v4[:, None], axis=2)
            out = out + p[:, :, 0][:, :, None, :] * vc3[:, None]
            out = out / denom[:, :, None, :]               # [H, T, d, Nc]
            outs_t = [out[:, t].astype(dtype).reshape(D, -1)
                      for t in range(T)]
        else:
            outs_t = []
            for t in range(T):
                qt = q4[:, t]
                l = jnp.sum(qt[:, None] * k4, axis=2)
                cls_l = jnp.sum(qt * kc3, axis=1)[:, None]
                full = jnp.concatenate([cls_l, l], axis=1)
                m = jnp.max(full, axis=1, keepdims=True)
                p = jnp.exp(full - m)
                denom = jnp.sum(p, axis=1, keepdims=True)
                out_t = jnp.sum(p[:, 1:][:, :, None] * v4, axis=1)
                out_t = out_t + p[:, 0][:, None, :] * vc3
                outs_t.append((out_t / denom).astype(dtype).reshape(D, -1))

        if variant not in ("noattn",):
            lc_all = jnp.sum(k4 * qc3[:, None], axis=2)
            c_max = jnp.max(jnp.max(lc_all, axis=2), axis=1, keepdims=True)
            m_old = m_scr[...]
            m_new = jnp.maximum(m_old, c_max)
            corr = jnp.exp(m_old - m_new)
            p_c = jnp.exp(lc_all - m_new[..., None])
            m_scr[...] = m_new
            l_scr[...] = l_scr[...] * corr \
                + jnp.sum(jnp.sum(p_c, axis=2), axis=1, keepdims=True)
            pv = jnp.sum(v4 * p_c[:, :, None, :], axis=(1, 3))
            acc_scr[...] = acc_scr[...] * corr[..., None] + pv[..., None]

        bprojT = bprojT_ref[:].astype(f32)
        if groupmm:
            wpg = jnp.concatenate([wprojT_ref[:][None]] * g, axis=0)
            dn = (((2,), (1,)), ((0,), (0,)))
            for t0 in range(0, T, g):
                og = jnp.stack(outs_t[t0:t0 + g])          # [g, D, Nc]
                pg = jax.lax.dot_general(wpg, og, dn,
                                         preferred_element_type=f32)
                for i in range(g):
                    o_ref[0, t0 + i] = (xT[t0 + i].astype(f32) + pg[i]
                                        + bprojT).astype(dtype)
        elif variant == "widemm":
            gw = 3
            for t0 in range(0, T, gw):
                ocat = jnp.concatenate(outs_t[t0:t0 + gw], axis=1)
                pw = jnp.dot(wprojT_ref[:], ocat,
                             preferred_element_type=f32)   # [D, gw*Nc]
                for i in range(gw):
                    o_ref[0, t0 + i] = (xT[t0 + i].astype(f32)
                                        + pw[:, i * N:(i + 1) * N]
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
                             preferred_element_type=f32) + bprojT
            ocls_ref[0] = (cls_ref[0].astype(f32) + projcT.T).astype(dtype)

    return kernel


def time_variant(variant: str):
    def run(xT, cls, ln_scale, ln_bias, wqkv, bqkv, wproj, bproj):
        chunkT_spec = pl.BlockSpec((1, T, D, N), lambda b, c: (b, 0, 0, c),
                                   memory_space=pltpu.VMEM)
        cls_spec = pl.BlockSpec((1, 1, D), lambda b, c: (b, 0, 0),
                                memory_space=pltpu.VMEM)
        vecT_spec = pl.BlockSpec((D, 1), lambda b, c: (0, 0),
                                 memory_space=pltpu.VMEM)
        wqkvT_spec = pl.BlockSpec((3 * D, D), lambda b, c: (0, 0),
                                  memory_space=pltpu.VMEM)
        wprojT_spec = pl.BlockSpec((D, D), lambda b, c: (0, 0),
                                   memory_space=pltpu.VMEM)
        b3 = bqkv.reshape(3, D)
        return pl.pallas_call(
            _make_time_kernel_variant(variant),
            grid=(xT.shape[0], 1),
            in_specs=[chunkT_spec, cls_spec, vecT_spec, vecT_spec,
                      wqkvT_spec, vecT_spec, vecT_spec, vecT_spec,
                      wprojT_spec, vecT_spec],
            out_specs=(chunkT_spec, cls_spec),
            out_shape=(jax.ShapeDtypeStruct(xT.shape, xT.dtype),
                       jax.ShapeDtypeStruct(cls.shape, cls.dtype)),
            scratch_shapes=[pltpu.VMEM((H, 1), jnp.float32),
                            pltpu.VMEM((H, 1), jnp.float32),
                            pltpu.VMEM((H, d, 1), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=INTERPRET,
        )(xT, cls, ln_scale.reshape(D, 1), ln_bias.reshape(D, 1),
          wqkv.T, b3[0].reshape(D, 1), b3[1].reshape(D, 1),
          b3[2].reshape(D, 1), wproj.T, bproj.reshape(D, 1))

    return run


# ---------------------------------------------------------------------------
# experimental MLP kernels
# ---------------------------------------------------------------------------

def _make_mlp_kernel_variant(variant: str, g: int):
    def kernel(x_ref, cls_ref, ln_sT_ref, ln_bT_ref, wfcT_ref, bfcT_ref,
               wprT_ref, bprT_ref, o_ref, ocls_ref):
        f32 = jnp.float32
        dtype = o_ref.dtype
        lnT = _lnT_fn(ln_sT_ref[:].astype(f32), ln_bT_ref[:].astype(f32))
        bfcT = bfcT_ref[:].astype(f32)
        bprT = bprT_ref[:].astype(f32)

        def gelu(h):
            return (h * jax.nn.sigmoid(1.702 * h))

        if variant == "mlp_wide":
            xg = x_ref[0]                                   # [g, D, N]
            ycat = jnp.concatenate([lnT(xg[i]).astype(dtype)
                                    for i in range(g)], axis=1)  # [D, g*N]
            h = (jnp.dot(wfcT_ref[:], ycat, preferred_element_type=f32)
                 + bfcT).astype(dtype)
            h = gelu(h.astype(f32)).astype(dtype)
            out = jnp.dot(wprT_ref[:], h, preferred_element_type=f32)
            for i in range(g):
                o_ref[0, i] = (xg[i].astype(f32)
                               + out[:, i * N:(i + 1) * N]
                               + bprT).astype(dtype)
        elif variant == "mlp_batched":
            xg = x_ref[0]
            dn = (((2,), (1,)), ((0,), (0,)))
            wfg = jnp.concatenate([wfcT_ref[:][None]] * g, axis=0)
            wpg = jnp.concatenate([wprT_ref[:][None]] * g, axis=0)
            y = jnp.stack([lnT(xg[i]).astype(dtype) for i in range(g)])
            h = jax.lax.dot_general(wfg, y, dn, preferred_element_type=f32) \
                + bfcT
            h = gelu(h).astype(dtype)
            out = jax.lax.dot_general(wpg, h, dn, preferred_element_type=f32)
            for i in range(g):
                o_ref[0, i] = (xg[i].astype(f32) + out[i]
                               + bprT).astype(dtype)

        @pl.when(pl.program_id(1) == 0)
        def _cls():
            y = lnT(cls_ref[0].T).astype(dtype)
            h = (jnp.dot(wfcT_ref[:], y, preferred_element_type=f32) + bfcT)
            h = gelu(h).astype(dtype)
            out = jnp.dot(wprT_ref[:], h, preferred_element_type=f32) + bprT
            ocls_ref[0] = (cls_ref[0].astype(f32) + out.T).astype(dtype)

    return kernel


def mlp_variant(variant: str, g: int):
    def run(xT, cls, ln_scale, ln_bias, wfc, bfc, wpr, bpr):
        hidden = wfc.shape[1]
        groupT_spec = pl.BlockSpec((1, g, D, N), lambda b, t: (b, t, 0, 0),
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
        return pl.pallas_call(
            _make_mlp_kernel_variant(variant, g),
            grid=(xT.shape[0], T // g),
            in_specs=[groupT_spec, cls_spec, vecT_spec, vecT_spec,
                      wfcT_spec, hvecT_spec, wprT_spec, vecT_spec],
            out_specs=(groupT_spec, cls_spec),
            out_shape=(jax.ShapeDtypeStruct(xT.shape, xT.dtype),
                       jax.ShapeDtypeStruct(cls.shape, cls.dtype)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=INTERPRET,
        )(xT, cls, ln_scale.reshape(D, 1), ln_bias.reshape(D, 1),
          wfc.T, bfc.reshape(hidden, 1), wpr.T, bpr.reshape(D, 1))

    return run


def timeit(fn, args, iters=8, rounds=3):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    best = np.inf
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        float(jnp.sum(jnp.stack([jnp.sum(jax.tree.leaves(o)[0])
                                 for o in outs])))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1000


def main():
    rng = np.random.default_rng(0)
    xT = jnp.asarray((rng.normal(size=(B, T, D, N)) * 0.02).astype(np.float32)
                     ).astype(jnp.bfloat16)
    cls = jnp.asarray((rng.normal(size=(B, 1, D)) * 0.02).astype(np.float32)
                      ).astype(jnp.bfloat16)
    wqkv = jnp.asarray((rng.normal(size=(D, 3 * D)) * 0.02).astype(np.float32)
                       ).astype(jnp.bfloat16)
    bqkv = jnp.zeros((3 * D,), jnp.bfloat16)
    wproj = jnp.asarray((rng.normal(size=(D, D)) * 0.02).astype(np.float32)
                        ).astype(jnp.bfloat16)
    bproj = jnp.zeros((D,), jnp.bfloat16)
    wfc = jnp.asarray((rng.normal(size=(D, 4 * D)) * 0.02).astype(np.float32)
                      ).astype(jnp.bfloat16)
    bfc = jnp.zeros((4 * D,), jnp.bfloat16)
    wpr = jnp.asarray((rng.normal(size=(4 * D, D)) * 0.02).astype(np.float32)
                      ).astype(jnp.bfloat16)
    bpr = jnp.zeros((D,), jnp.bfloat16)
    ln_s = jnp.ones((D,), jnp.float32)
    ln_b = jnp.zeros((D,), jnp.float32)
    aw = (ln_s, ln_b, wqkv, bqkv, wproj, bproj)
    mw = (ln_s, ln_b, wfc, bfc, wpr, bpr)

    def chainT(sub):
        def run(xT, cls, *w):
            for _ in range(DEPTH):
                xT, cls = sub(xT, cls, *w)
            return jnp.sum(xT.astype(jnp.float32))
        return run

    cases = {"time/v7-lib": (chainT(
        lambda xT, cls, *w: fused_time_attention_block_v7(
            xT, cls, *w, num_heads=H, interpret=INTERPRET)), (xT, cls) + aw)}
    for v in ("full", "noattn", "noheads", "nomm", "attn5d",
              "groupmm3", "groupmm4", "widemm"):
        cases[f"time/{v}"] = (chainT(
            lambda xT, cls, *w, v=v: time_variant(v)(xT, cls, *w)),
            (xT, cls) + aw)
    cases["mlp/v7-lib"] = (chainT(
        lambda xT, cls, *w: fused_mlp_block_v7(
            xT, cls, *w, interpret=INTERPRET)), (xT, cls) + mw)
    for v, g in (("mlp_wide", 2), ("mlp_wide", 3), ("mlp_wide", 4),
                 ("mlp_batched", 3)):
        cases[f"mlp/{v}{g}"] = (chainT(
            lambda xT, cls, *w, v=v, g=g: mlp_variant(v, g)(xT, cls, *w)),
            (xT, cls) + mw)

    only = os.environ.get("CASES")
    if only:
        keys = [k.strip() for k in only.split(",")]
        cases = {n: c for n, c in cases.items() if any(k in n for k in keys)}
    print(f"B={B}, extraction shapes (T={T}, N={N}): ms per {DEPTH}-block "
          f"chain, fwd only", flush=True)
    for name, (fn, args) in cases.items():
        try:
            t_f = timeit(jax.jit(fn), args)
            print(f"{name:>14}: {t_f:7.1f} ms", flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:160]
            print(f"{name:>14}: FAILED {msg}", flush=True)


if __name__ == "__main__":
    main()
