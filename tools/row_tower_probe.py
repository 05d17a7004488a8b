#!/usr/bin/env python
"""Decisive probe for the ROW-major-activation tower (round-4 north-star lead).

Hypothesis (PERF.md round-3): the v7 d-major tower pays a 23% lane pad
(N=196 -> 256) on EVERY matmul, but a dot_general can consume either layout
and emit either layout by choosing contraction dims — so a row-major
activation tower whose attention cores stay d-major internally would keep
all projections and the whole MLP pad-free with ZERO in-kernel transposes:

  qkv:  dot_general(wqkvT [3D,D], x_row [N,D], contract ((1,),(1,)))
        -> [3D, N] d-major (A@B^T lane contraction; same padded output
        as today — the attention math needs N in lanes either way)
  proj: dot_general(attnT [D,N], wproj [D,D], contract ((0,),(0,)))
        -> [N, D] row-major, pad-free (lhsT-native sublane contraction)
  mlp:  plain row-major [N,D]@[D,4D] / [N,4D]@[4D,D], pad-free.

Cases time chained in-kernel matmul PAIRS at extraction shapes (N=196,
D=768, bf16 in / f32 out) and report TF/s-equivalent:

  attn_pair/dmaj   current v7: qkv + proj both d-major (both outputs padded)
  attn_pair/row    row-major I/O: qkv A@B^T -> d-major, proj lhsT -> row
  mlp_pair/dmaj    current v7 MLP: [4D,D]@[D,N] + [D,4D]@[4D,N] (padded)
  mlp_pair/row     row MLP: [N,D]@[D,4D] + [N,4D]@[4D,D] (pad-free)
  mlp_pair/hybrid  d-major in -> row matmuls -> transpose back (VERDICT r3 1c)

Run on hardware: python tools/row_tower_probe.py
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

INTERPRET = bool(int(os.environ.get("TVTS_PROBE_INTERPRET", "0")))
N, D = 196, 768
F32 = jnp.float32
BF16 = jnp.bfloat16


def _call(kernel, out_shape, *args):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, F32),
        interpret=INTERPRET,
        compiler_params=None if INTERPRET else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)


def attn_pair_dmaj(rounds):
    """x [D,N] d-major; qkv [3D,D]@[D,N] -> [3D,N]; proj [D,D]@[D,N]."""

    def kernel(x_ref, wq_ref, wp_ref, o_ref):
        x = x_ref[...]

        def body(_, x):
            y = jnp.dot(wq_ref[...], x.astype(BF16),
                        preferred_element_type=F32)        # [3D, N] padded
            a = y[:D].astype(BF16)                         # sublane slice
            o = jnp.dot(wp_ref[...], a,
                        preferred_element_type=F32)        # [D, N] padded
            return o * 1e-3

        o_ref[...] = jax.lax.fori_loop(0, rounds, body, x)

    def run(x, wq, wp):
        return _call(kernel, (D, N), x, wq, wp)

    return run, (D, N)


def attn_pair_row(rounds):
    """x [N,D] row; qkv A@B^T -> [3D,N] d-major; proj lhsT -> [N,D] row."""

    def kernel(x_ref, wq_ref, wp_ref, o_ref):
        x = x_ref[...]

        def body(_, x):
            y = jax.lax.dot_general(wq_ref[...], x.astype(BF16),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=F32)  # [3D, N]
            a = y[:D].astype(BF16)                               # [D, N]
            o = jax.lax.dot_general(a, wp_ref[...],
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=F32)  # [N, D]
            return o * 1e-3

        o_ref[...] = jax.lax.fori_loop(0, rounds, body, x)

    def run(x, wq, wp):
        return _call(kernel, (N, D), x, wq, wp)

    return run, (N, D)


def mlp_pair_dmaj(rounds):
    """x [D,N]; h = wfcT [4D,D]@[D,N]; o = wprT [D,4D]@[4D,N] (v7 form)."""

    def kernel(x_ref, wf_ref, wp_ref, o_ref):
        x = x_ref[...]

        def body(_, x):
            h = jnp.dot(wf_ref[...], x.astype(BF16),
                        preferred_element_type=F32)        # [4D, N] padded
            o = jnp.dot(wp_ref[...], h.astype(BF16),
                        preferred_element_type=F32)        # [D, N] padded
            return o * 1e-3

        o_ref[...] = jax.lax.fori_loop(0, rounds, body, x)

    def run(x, wf, wp):
        return _call(kernel, (D, N), x, wf, wp)

    return run, (D, N)


def mlp_pair_row(rounds):
    """x [N,D]; h = [N,D]@[D,4D]; o = [N,4D]@[4D,D] (pad-free)."""

    def kernel(x_ref, wf_ref, wp_ref, o_ref):
        x = x_ref[...]

        def body(_, x):
            h = jnp.dot(x.astype(BF16), wf_ref[...],
                        preferred_element_type=F32)        # [N, 4D]
            o = jnp.dot(h.astype(BF16), wp_ref[...],
                        preferred_element_type=F32)        # [N, D]
            return o * 1e-3

        o_ref[...] = jax.lax.fori_loop(0, rounds, body, x)

    def run(x, wf, wp):
        return _call(kernel, (N, D), x, wf, wp)

    return run, (N, D)


def mlp_pair_hybrid(rounds):
    """d-major I/O but row matmuls: h = dot_general(x [D,N], wfc [D,4D],
    c0c0) -> [N,4D]; o = [N,4D]@[4D,D] -> [N,D]; transpose back to [D,N]."""

    def kernel(x_ref, wf_ref, wp_ref, o_ref):
        x = x_ref[...]

        def body(_, x):
            h = jax.lax.dot_general(x.astype(BF16), wf_ref[...],
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=F32)  # [N, 4D]
            o = jnp.dot(h.astype(BF16), wp_ref[...],
                        preferred_element_type=F32)              # [N, D]
            return o.T * 1e-3                                    # [D, N]

        o_ref[...] = jax.lax.fori_loop(0, rounds, body, x)

    def run(x, wf, wp):
        return _call(kernel, (D, N), x, wf, wp)

    return run, (D, N)


def main():
    rng = np.random.default_rng(0)

    def mk(shape, dtype=BF16):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32)
                           * 0.02).astype(dtype)

    attn_macs = (3 * D + D) * D * N          # qkv + proj per iter
    mlp_macs = 2 * 4 * D * D * N
    rounds_attn = int(os.environ.get("ROUNDS", "1200"))
    rounds_mlp = max(1, rounds_attn * attn_macs // mlp_macs)

    cases = {
        "attn_pair/dmaj": (attn_pair_dmaj(rounds_attn), rounds_attn,
                           attn_macs,
                           (mk((D, N), F32), mk((3 * D, D)), mk((D, D)))),
        "attn_pair/row": (attn_pair_row(rounds_attn), rounds_attn, attn_macs,
                          (mk((N, D), F32), mk((3 * D, D)), mk((D, D)))),
        "mlp_pair/dmaj": (mlp_pair_dmaj(rounds_mlp), rounds_mlp, mlp_macs,
                          (mk((D, N), F32), mk((4 * D, D)), mk((D, 4 * D)))),
        "mlp_pair/row": (mlp_pair_row(rounds_mlp), rounds_mlp, mlp_macs,
                         (mk((N, D), F32), mk((D, 4 * D)), mk((4 * D, D)))),
        "mlp_pair/hybrid": (mlp_pair_hybrid(rounds_mlp), rounds_mlp, mlp_macs,
                            (mk((D, N), F32), mk((D, 4 * D)),
                             mk((4 * D, D)))),
    }
    cases["sanity/512"] = (sanity_512(rounds_attn), rounds_attn,
                           512 * 512 * 512,
                           (mk((512, 512), F32), mk((512, 512))))
    cases["single_mm/row"] = (single_mm_row(rounds_mlp * 2), rounds_mlp * 2,
                              D * 4 * D * N,
                              (mk((N, D), F32), mk((D, 4 * D))))
    filt = os.environ.get("CASES")
    for name, ((run, _), rounds, macs, args) in cases.items():
        if filt and not any(f in name for f in filt.split(",")):
            continue
        try:
            run = jax.jit(run)
            out = run(*args)
            float(jnp.sum(out))
        except Exception as e:
            msg = str(e)
            line = next((ln for ln in msg.split("\n")
                         if "Not implemented" in ln or "Unsupported" in ln
                         or "INTERNAL" in ln), msg[:140])
            print(f"{name}: FAIL — {line.strip()[:160]}")
            continue
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [run(*args) for _ in range(4)]
            float(jnp.sum(jnp.stack([jnp.sum(o) for o in outs])))
            best = min(best, (time.perf_counter() - t0) / 4)
        tf = 2 * macs * rounds / best / 1e12
        print(f"{name}: {best * 1e3:8.2f} ms  {tf:6.1f} TF/s-equiv "
              f"(rounds={rounds})")




def sanity_512(rounds):
    """mxu_lane_probe-style sanity: x [512,512] @ w [512,512] chained."""

    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[...]

        def body(_, x):
            y = jnp.dot(x.astype(BF16), w_ref[...],
                        preferred_element_type=F32)
            return y * 1e-3

        o_ref[...] = jax.lax.fori_loop(0, rounds, body, x)

    def run(x, w):
        return _call(kernel, (512, 512), x, w)

    return run, (512, 512)


def single_mm_row(rounds):
    """one matmul per iter: h = x[N,D]@wfc[D,4D], feedback h@wpr -> x? no —
    slice h[:, :D] to keep one matmul dominant."""

    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[...]

        def body(_, x):
            h = jnp.dot(x.astype(BF16), w_ref[...],
                        preferred_element_type=F32)   # [N, 4D]
            return h[:, :D] * 1e-3

        o_ref[...] = jax.lax.fori_loop(0, rounds, body, x)

    def run(x, w):
        return _call(kernel, (N, D), x, w)

    return run, (N, D)


if __name__ == "__main__":
    main()
