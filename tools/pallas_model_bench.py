#!/usr/bin/env python
"""Full B/16 extraction: XLA attention vs fused Pallas attention, on hardware."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tvts_tpu.models.configs import VisionConfig
from tvts_tpu.models.space_time_vit import SpaceTimeViT


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(jnp.sum(jnp.stack([jnp.sum(o) for o in outs])))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {dt * 1000:8.2f} ms", flush=True)
    return dt, np.asarray(out, dtype=np.float32)


def main():
    B = int(os.environ.get("PB", 32))
    cfg = VisionConfig(mask_ratio=0.0)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(B, 12, 3, 224, 224)).astype(np.float32))
    keep = jnp.asarray(np.tile(np.arange(196, dtype=np.int32), (B, 1)))

    m_xla = SpaceTimeViT(cfg, dtype=jnp.bfloat16)
    m_pl = SpaceTimeViT(cfg, dtype=jnp.bfloat16, use_pallas=True)
    params = m_xla.init(jax.random.PRNGKey(0), video, keep)["params"]

    dt_x, out_x = timeit("B/16 extract XLA", jax.jit(
        lambda p, v, k: m_xla.apply({"params": p}, v, k)[0]), params, video, keep)
    dt_p, out_p = timeit("B/16 extract pallas", jax.jit(
        lambda p, v, k: m_pl.apply({"params": p}, v, k)[0]), params, video, keep)
    print(f"max abs diff: {np.abs(out_x - out_p).max():.5f}")
    print(f"XLA {B / dt_x:.1f} clips/s | pallas {B / dt_p:.1f} clips/s "
          f"({dt_x / dt_p:.2f}x)")


if __name__ == "__main__":
    main()
