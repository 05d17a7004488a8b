#!/usr/bin/env python
"""Fused Pallas attention vs XLA path on hardware, B/16 extraction shapes."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tvts_tpu.ops.attention import divided_space_time_attention
from tvts_tpu.ops.pallas_attention import divided_space_time_attention_fused

B, H, T, N, d = int(os.environ.get("PB", 32)), 12, 12, 196, 64
S = 1 + T * N


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(out))
    err = None
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(jnp.sum(jnp.stack([jnp.sum(o) for o in outs])))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt * 1000:8.2f} ms")
    return np.asarray(out, dtype=np.float32)


def main():
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.normal(size=(B, H, S, d)).astype(np.float32)).astype(jnp.bfloat16)
    q, k, v = mk() * 0.125, mk(), mk()
    for mode in ("space", "time"):
        a = timeit(f"{mode} XLA", jax.jit(
            lambda q, k, v, m=mode: divided_space_time_attention(q, k, v, T, N, m)),
            q, k, v)
        b = timeit(f"{mode} pallas fused", jax.jit(
            lambda q, k, v, m=mode: divided_space_time_attention_fused(q, k, v, T, N, m)),
            q, k, v)
        print(f"{mode} max abs diff: {np.abs(a - b).max():.4f}")


if __name__ == "__main__":
    main()
