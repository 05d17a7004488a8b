#!/usr/bin/env python
"""Decisive probe for the d=64 MXU lane-waste hypothesis (VERDICT r2 #1).

The space attention kernels contract over d=64 in every logits matmul
(`qh [N,64] @ kh.T [64,N]`, ops/pallas_block_attention.py:732). The MXU
contracts over 128 lanes; the round-1 lead claims d=64 wastes half of them.

This probe times chained in-kernel matmuls at contraction d in {64, 128} and
equal-MAC iteration counts. Interpretation:
  t(d=128, R) ~= t(d=64, 2R)  -> MXU runs d=64 at FULL rate; packing is dead.
  t(d=128, R) ~= t(d=64, R)   -> d=64 runs at half rate.
Also reports absolute TF/s-equivalent rates so the attention-math shapes can
be compared against a big-matmul in-kernel peak and against row-doubled
(two-frame) variants — if small-N matmuls are overhead-bound, larger fused
shapes win regardless of the lane question.

Run on hardware: python tools/mxu_lane_probe.py
Smoke on CPU:    TVTS_PROBE_INTERPRET=1 (tiny rounds) via tests.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = bool(int(os.environ.get("TVTS_PROBE_INTERPRET", "0")))


def chain_kernel(N: int, d: int, W: int, rounds: int):
    """x [N,W] (W >= d, W >= 128 advised) -> loop:
    y = dot(x[:, :d].bf16, b [d,W]) ; x = y*eps. Per-iter MACs = N*d*W."""

    def kernel(x_ref, b_ref, o_ref):
        x = x_ref[...]
        b = b_ref[...]

        def body(_, x):
            a = x[:, :d].astype(jnp.bfloat16)
            y = jnp.dot(a, b, preferred_element_type=jnp.float32)
            return y * 1e-3

        o_ref[...] = jax.lax.fori_loop(0, rounds, body, x)

    def run(x, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
            interpret=INTERPRET,
            compiler_params=None if INTERPRET else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, b)

    return run


def chain_kernel_pv(N: int, d: int, rounds: int):
    """probs@v form: contraction over N (full-ish lanes), OUTPUT dim d.
    x [N, W] with W = max(N, d): y = dot(x[:, :N].bf16, v [N,d]) [N,d];
    fold y back into the first d columns of x."""
    W = max(N, d)

    def kernel(x_ref, v_ref, o_ref):
        x = x_ref[...]
        v = v_ref[...]

        def body(_, x):
            a = x[:, :N].astype(jnp.bfloat16)
            y = jnp.dot(a, v, preferred_element_type=jnp.float32)  # [N, d]
            return x * 1e-3 + jnp.pad(y, ((0, 0), (0, W - d)))

        o_ref[...] = jax.lax.fori_loop(0, rounds, body, x)

    def run(x, v):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
            interpret=INTERPRET,
            compiler_params=None if INTERPRET else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, v)

    return run


def chain_kernel_batched(H: int, N: int, d: int, rounds: int):
    """v3-style batched dot_general: [H,N,d] x [H,d,N] -> [H,N,N], folded
    back into x's first d lanes. x is [H, N, W] with W = max(N, d, 128)."""
    W = max(N, d, 128)
    dn = (((2,), (1,)), ((0,), (0,)))

    def kernel(x_ref, b_ref, o_ref):
        x = x_ref[...]
        b = b_ref[...]

        def body(_, x):
            a = x[:, :, :d].astype(jnp.bfloat16)
            y = jax.lax.dot_general(a, b, dn,
                                    preferred_element_type=jnp.float32)
            return x * 1e-3 + jnp.pad(y, ((0, 0), (0, 0), (0, W - N)))

        o_ref[...] = jax.lax.fori_loop(0, rounds, body, x)

    def run(x, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((H, N, W), jnp.float32),
            interpret=INTERPRET,
            compiler_params=None if INTERPRET else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, b)

    return run


def chain_kernel_headloop(H: int, N: int, d: int, rounds: int):
    """Current v2 form: an unrolled python loop over H per-head 2D matmuls
    ([N,d] @ [d,N]) per chain step. x [H,N,W], b [H,d,N]."""
    W = max(N, d, 128)

    def kernel(x_ref, b_ref, o_ref):
        x = x_ref[...]
        b = b_ref[...]

        def body(_, x):
            outs = []
            for h in range(H):
                a = x[h, :, :d].astype(jnp.bfloat16)
                outs.append(jnp.dot(a, b[h], preferred_element_type=jnp.float32))
            y = jnp.stack(outs)                      # [H, N, N]
            return x * 1e-3 + jnp.pad(y, ((0, 0), (0, 0), (0, W - N)))

        o_ref[...] = jax.lax.fori_loop(0, rounds, body, x)

    def run(x, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((H, N, W), jnp.float32),
            interpret=INTERPRET,
            compiler_params=None if INTERPRET else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, b)

    return run


def chain_kernel_lhsT(H: int, N: int, d: int, rounds: int):
    """v3 d-major spelling: lhs [H,d,N] CONTRACTED on dim 1 (sublanes) with
    rhs [H,d,N] -> [H,N,N]; result folded back into lhs's lane dim."""
    W = max(N, 128)
    dn = (((1,), (1,)), ((0,), (0,)))

    def kernel(x_ref, b_ref, o_ref):
        x = x_ref[...]                               # [H, d, W]
        b = b_ref[...]                               # [H, d, N]

        def body(_, x):
            a = x[:, :, :N].astype(jnp.bfloat16)
            y = jax.lax.dot_general(a, b, dn,
                                    preferred_element_type=jnp.float32)
            # y [H, N, N] -> fold into x's [H, d, W] carry
            upd = jnp.pad(y[:, :d, :], ((0, 0), (0, 0), (0, W - N)))
            return x * 1e-3 + upd

        o_ref[...] = jax.lax.fori_loop(0, rounds, body, x)

    def run(x, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((H, d, W), jnp.float32),
            interpret=INTERPRET,
            compiler_params=None if INTERPRET else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, b)

    return run


def timeit(fn, args, iters=4):
    jfn = jax.jit(fn)
    float(jnp.sum(jfn(*args)))  # compile + warm
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(iters):
        s += float(jnp.sum(jfn(*args)))
    t1 = time.perf_counter()
    return (t1 - t0) / iters * 1e3


def report(tag, ms, macs):
    rate = macs * 2 / (ms * 1e-3) / 1e12
    print(f"{tag}: {ms:7.2f} ms ({rate:6.2f} TF/s equiv)", flush=True)
    return rate


def main():
    key = jax.random.PRNGKey(0)
    base_macs = 196 * 64 * 196 * 2048 * 1024  # ~10 TFLOP/call: RPC ~29ms <10%
    # RPC/dispatch baseline: a 1-round call is pure round-trip overhead
    x0 = jax.random.normal(key, (196, 196), jnp.float32)
    b0 = jax.random.normal(key, (64, 196), jnp.bfloat16)
    rpc = timeit(chain_kernel(196, 64, 196, 1), (x0, b0))
    print(f"dispatch baseline (1 round): {rpc:.2f} ms", flush=True)

    only = os.environ.get("TVTS_PROBE_ONLY", "")

    for N in () if only == "cand" else (196, 98):
        W = max(N, 128)
        # --- logits form: contraction over d ---
        times = {}
        for d in (64, 128):
            rounds = max(1, base_macs // (N * d * W))
            x = jax.random.normal(key, (N, W), jnp.float32)
            b = jax.random.normal(key, (d, W), jnp.bfloat16)
            ms = timeit(chain_kernel(N, d, W, rounds), (x, b))
            times[d] = ms
            report(f"N={N:4d} logits  d={d:3d} R={rounds:5d}", ms,
                   N * d * W * rounds)
        r = times[128] / times[64]
        print(f"  -> equal-MAC t(d128)/t(d64) = {r:.2f} "
              f"({'d=64 at FULL MXU rate' if r > 0.8 else 'd=64 at ~HALF rate'})")

        # --- probs@v form: d as output lane dim ---
        for d in (64, 128):
            rounds = max(1, base_macs // (N * N * d))
            Wx = max(N, d)
            x = jax.random.normal(key, (N, Wx), jnp.float32)
            v = jax.random.normal(key, (N, d), jnp.bfloat16)
            ms = timeit(chain_kernel_pv(N, d, rounds), (x, v))
            report(f"N={N:4d} probs@v d={d:3d} R={rounds:5d}", ms,
                   N * N * d * rounds)

    # --- peak calibration: big square matmul chain ---
    for M in () if only == "cand" else (512, 1024):
        rounds = max(1, base_macs // (M * M * M))
        x = jax.random.normal(key, (M, M), jnp.float32)
        b = jax.random.normal(key, (M, M), jnp.bfloat16)
        ms = timeit(chain_kernel(M, M, M, rounds), (x, b))
        report(f"peak ref {M}^3      R={rounds:5d}", ms, M * M * M * rounds)

    # --- row scaling at fixed d=64: N rows vs 2N rows (two-frame shape) ---
    for rows in () if only == "cand" else (196, 392, 98):
        W = max(rows, 128)
        rounds = max(1, base_macs // (rows * 64 * W))
        x = jax.random.normal(key, (rows, W), jnp.float32)
        b = jax.random.normal(key, (64, W), jnp.bfloat16)
        ms = timeit(chain_kernel(rows, 64, W, rounds), (x, b))
        report(f"rows={rows:4d} d=64 W={W} R={rounds:5d}", ms,
               rows * 64 * W * rounds)

    # --- batched v3 form: H=12 d=64 vs H=6 d=128 (equal MACs/iter) ---
    for H, d in () if only == "cand" else ((12, 64), (6, 128)):
        N = 98
        W = max(N, d, 128)
        rounds = max(1, base_macs // (H * N * d * N) // 2)
        x = jax.random.normal(key, (H, N, W), jnp.float32)
        b = jax.random.normal(key, (H, d, N), jnp.bfloat16)
        ms = timeit(chain_kernel_batched(H, N, d, rounds), (x, b))
        report(f"batched H={H:2d} d={d:3d} N={N} R={rounds:5d}", ms,
               H * N * d * N * rounds)

    # --- candidate space-math forms at H=12, d=64 (the kernel decision) ---
    for N in (196, 98):
        H, d = 12, 64
        W = max(N, 128)
        rounds = max(1, base_macs // (H * N * d * N) // 2)
        x = jax.random.normal(key, (H, N, W), jnp.float32)
        b = jax.random.normal(key, (H, d, N), jnp.bfloat16)
        # (b) batched row-major (as above, at this N)
        ms = timeit(chain_kernel_batched(H, N, d, rounds), (x, b))
        report(f"cand batched   H={H} d={d} N={N:3d} R={rounds:5d}", ms,
               H * N * d * N * rounds)
        # (a) per-head unrolled loop (current v2 form)
        ms = timeit(chain_kernel_headloop(H, N, d, rounds), (x, b))
        report(f"cand head-loop H={H} d={d} N={N:3d} R={rounds:5d}", ms,
               H * N * d * N * rounds)
        # (c) d-major lhsT batched: [H,d,N]^T(x)[H,d,N] contraction on dim 1
        xT = jax.random.normal(key, (H, d, max(N, 128)), jnp.float32)
        ms = timeit(chain_kernel_lhsT(H, N, d, rounds), (xT, b))
        report(f"cand lhsT-bat  H={H} d={d} N={N:3d} R={rounds:5d}", ms,
               H * N * d * N * rounds)


def chain_kernel_rect(M: int, K: int, P: int, rounds: int, carry_rows: int):
    """Rectangular chain for projection/MLP shapes: y [M,P] = x[:M,:K] @ b.
    Carry x is [carry_rows, max(K, P)] so both spellings can fold y back."""
    W = max(K, P)

    def kernel(x_ref, b_ref, o_ref):
        x = x_ref[...]
        b = b_ref[...]

        def body(_, x):
            a = x[:M, :K].astype(jnp.bfloat16)
            y = jnp.dot(a, b, preferred_element_type=jnp.float32)  # [M, P]
            y = jnp.pad(y, ((0, carry_rows - M), (0, W - P)))
            return x * 1e-3 + y

        o_ref[...] = jax.lax.fori_loop(0, rounds, body, x)

    def run(x, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((carry_rows, W), jnp.float32),
            interpret=INTERPRET,
            compiler_params=None if INTERPRET else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, b)

    return run


def chain_kernel_transpose(N: int, D: int, rounds: int):
    """Cost of an in-kernel [N,D] <-> [D,N] transpose pair (the v3 per-program
    overhead being weighed against d-major math wins)."""
    M = max(N, D)

    def kernel(x_ref, o_ref):
        x = x_ref[...]                    # [M, M], use [N,D] corner

        def body(_, x):
            t = jnp.swapaxes(x[:N, :D], 0, 1)      # [D, N]
            t2 = jnp.swapaxes(t, 0, 1)             # [N, D]
            return x * (1.0 - 1e-6) + jnp.pad(
                t2, ((0, M - N), (0, M - D))) * 1e-6

        o_ref[...] = jax.lax.fori_loop(0, rounds, body, x)

    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, M), jnp.float32),
            interpret=INTERPRET,
            compiler_params=None if INTERPRET else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x)

    return run


def proj_section(key, base_macs):
    """Row-major vs d-major spellings of the qkv / proj / MLP matmuls at
    extraction frame shape (196 tokens, D=768)."""
    cases = [
        # (tag, M, K, P): y [M,P] = x [M,K] @ b [K,P]
        ("qkv row-major  [196,768]@[768,2304]", 196, 768, 2304),
        ("qkv d-major    [2304,768]@[768,196]", 2304, 768, 196),
        ("proj row-major [196,768]@[768,768]", 196, 768, 768),
        ("proj d-major   [768,768]@[768,196]", 768, 768, 196),
        ("mlp row-major  [196,768]@[768,3072]", 196, 768, 3072),
        ("mlp d-major    [3072,768]@[768,196]", 3072, 768, 196),
        ("mlp2 row-major [196,3072]@[3072,768]", 196, 3072, 768),
        ("mlp2 d-major   [768,3072]@[3072,196]", 768, 3072, 196),
    ]
    cases += [
        # token-grain scaling of the qkv matmul (per-program frame batch)
        ("qkv grain 392  [392,768]@[768,2304]", 392, 768, 2304),
        ("qkv grain 784  [784,768]@[768,2304]", 784, 768, 2304),
        ("qkv grain 2352 [2352,768]@[768,2304]", 2352, 768, 2304),
        ("mlp grain 784  [784,768]@[768,3072]", 784, 768, 3072),
    ]
    for tag, M, K, P in cases:
        rounds = max(1, base_macs // (M * K * P) // 4)
        carry = M
        x = jax.random.normal(key, (carry, max(K, P)), jnp.float32)
        b = jax.random.normal(key, (K, P), jnp.bfloat16)
        ms = timeit(chain_kernel_rect(M, K, P, rounds, carry), (x, b))
        report(f"{tag} R={rounds:5d}", ms, M * K * P * rounds)

    for N, D in ((196, 768), (98, 768)):
        rounds = 40000
        x = jax.random.normal(key, (max(N, D), max(N, D)), jnp.float32)
        ms = timeit(chain_kernel_transpose(N, D, rounds), (x,))
        per = ms / rounds * 1e3
        print(f"transpose pair [{N},{D}] R={rounds}: {ms:7.2f} ms "
              f"({per:.2f} us/pair)", flush=True)


if __name__ == "__main__":
    if os.environ.get("TVTS_PROBE_ONLY", "") == "proj":
        key = jax.random.PRNGKey(0)
        proj_section(key, 196 * 64 * 196 * 2048 * 1024)
    else:
        main()
