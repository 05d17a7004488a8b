#!/usr/bin/env python
"""VPU transcendental-rate probe: exp vs exp2 vs logistic, softmax variants.

Question (round 4, north-star push): the extraction space chain spends
~25 ms/12-block-chain in the softmax VPU chain and the MLP chain evaluates
~7M QuickGELU sigmoids per clip-block. If Mosaic lowers jnp.exp as
mul-by-log2e + pow2, folding the log2e into the qk scale (log2-domain
softmax — mathematically identical) saves one VPU mul per element; same for
sigmoid(1.702x) -> exp2(-2.4554x). This probe measures the in-kernel rates
of the candidate formulations with dependent chains (no DCE), ~multi-ms per
dispatch so the tunnel RPC overhead stays <10%.

Each variant runs K dependent iterations over a [R, C] f32 block per grid
step, G grid steps. Report: ns per element-iteration.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

R, C = 256, 256
LOG2E = float(np.log2(np.e))


def _variant(name):
    """Returns f(y) -> y with values kept bounded across iterations."""
    if name == "exp":
        return lambda y: jnp.exp(-jnp.abs(y)) + 0.1
    if name == "exp2":
        return lambda y: jnp.exp2(-jnp.abs(y)) + 0.1
    if name == "mul_exp2":
        return lambda y: jnp.exp2(-jnp.abs(y) * LOG2E) + 0.1
    if name == "sigmoid":
        return lambda y: jax.nn.sigmoid(1.702 * y) + 0.1
    if name == "quickgelu":
        return lambda y: y * jax.nn.sigmoid(1.702 * y) + 0.1
    if name == "quickgelu_exp2":
        return lambda y: y / (1.0 + jnp.exp2(-2.4554 * y)) + 0.1

    def softmax_row(y, use_max=True, use_exp2=False):
        l = y * 3.0
        e = jnp.exp2 if use_exp2 else jnp.exp
        if use_max:
            m = jnp.max(l, axis=-1, keepdims=True)
            p = e(l - m)
        else:
            p = e(l - 3.0)
        return p / jnp.sum(p, axis=-1, keepdims=True)

    if name == "softmax":
        return functools.partial(softmax_row, use_max=True)
    if name == "softmax_nomax":
        return functools.partial(softmax_row, use_max=False)
    if name == "softmax_exp2":
        return functools.partial(softmax_row, use_max=True, use_exp2=True)
    if name == "softmax_nomax_exp2":
        return functools.partial(softmax_row, use_max=False, use_exp2=True)
    raise ValueError(name)


def make_bench(name, K, G):
    f = _variant(name)

    def kernel(x_ref, o_ref):
        y = x_ref[...]
        for _ in range(K):
            y = f(y)
        o_ref[...] = y

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec((R, C), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((R, C), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        )(x)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-K", type=int, default=64)
    ap.add_argument("-G", type=int, default=256)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--variants", nargs="*", default=[
        "exp", "exp2", "mul_exp2", "sigmoid", "quickgelu", "quickgelu_exp2",
        "softmax", "softmax_nomax", "softmax_exp2", "softmax_nomax_exp2"])
    args = ap.parse_args()

    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(R, C)).astype(np.float32))
    n_elem_iters = R * C * args.K * args.G
    print(f"block [{R},{C}] K={args.K} G={args.G} "
          f"-> {n_elem_iters/1e9:.2f} G elem-iters/dispatch")
    for name in args.variants:
        run = make_bench(name, args.K, args.G)
        float(jnp.sum(run(x)))  # compile + warm
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            s = float(jnp.sum(run(x)))  # fetch forces execution (axon)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:20s} {best*1e3:8.2f} ms  "
              f"{best/n_elem_iters*1e9:7.3f} ns/elem-iter  (sum {s:.3e})")


if __name__ == "__main__":
    main()
