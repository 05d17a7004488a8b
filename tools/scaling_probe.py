#!/usr/bin/env python
"""In-graph cost breakdown: scale block count and batch to separate per-block
compute from fixed overhead (per-dispatch RPC overhead pollutes microbenches)."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tvts_tpu.models.configs import VisionConfig
from tvts_tpu.models.space_time_vit import SpaceTimeViT


def timeit(fn, *args, iters=8):
    float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(jnp.sum(jnp.stack([jnp.sum(o) for o in outs])))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    rows = []
    for B in (16, 32):
        video = jnp.asarray(rng.normal(size=(B, 12, 3, 224, 224)).astype(np.float32))
        keep = jnp.asarray(np.tile(np.arange(196, dtype=np.int32), (B, 1)))
        for layers in (1, 6, 12):
            cfg = dataclasses.replace(VisionConfig(mask_ratio=0.0), layers=layers)
            model = SpaceTimeViT(cfg, dtype=jnp.bfloat16)
            params = model.init(jax.random.PRNGKey(0), video, keep)["params"]
            f = jax.jit(lambda p, v, k, m=model: m.apply({"params": p}, v, k)[0])
            dt = timeit(f, params, video, keep)
            rows.append((B, layers, dt))
            print(f"B={B} layers={layers}: {dt * 1000:8.2f} ms  "
                  f"({B / dt:.1f} clips/s)", flush=True)
    # per-block slope
    for B in (16, 32):
        sub = {l: dt for b, l, dt in rows if b == B}
        slope = (sub[12] - sub[1]) / 11
        print(f"B={B}: per-block {slope * 1000:.2f} ms, "
              f"fixed {1000 * (sub[1] - slope):.2f} ms")


if __name__ == "__main__":
    main()
