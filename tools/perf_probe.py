#!/usr/bin/env python
"""Microbenchmark the B/16 extraction path on the live chip: full model, one
block, each attention mode, and the MLP — to find where time goes."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tvts_tpu.models.configs import VisionConfig
from tvts_tpu.models.layers import Mlp, VarAttention
from tvts_tpu.models.space_time_vit import SpaceTimeBlock, SpaceTimeViT


def timeit(name, fn, *args, iters=10):
    float(jnp.sum(fn(*args)))  # compile + force
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(jnp.sum(jnp.stack([jnp.sum(o) for o in outs])))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt * 1000:8.2f} ms")
    return dt


def main():
    B, T, N, D, H = int(os.environ.get("PB", 16)), 12, 196, 768, 12
    S = 1 + T * N
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32)).astype(dt)

    cfg = VisionConfig(mask_ratio=0.0)

    # full model
    model = SpaceTimeViT(cfg, dtype=dt)
    video = jnp.asarray(rng.normal(size=(B, T, 3, 224, 224)).astype(np.float32))
    keep = jnp.asarray(np.tile(np.arange(N, dtype=np.int32), (B, 1)))
    params = model.init(jax.random.PRNGKey(0), video, keep)["params"]
    full = timeit("full SpaceTimeViT (12 blocks)",
                  jax.jit(lambda p, v, k: model.apply({"params": p}, v, k)[0]),
                  params, video, keep)

    # one block
    blk = SpaceTimeBlock(cfg, dtype=dt)
    bp = blk.init(jax.random.PRNGKey(0), x, T, N)["params"]
    timeit("one SpaceTimeBlock",
           jax.jit(lambda p, x: blk.apply({"params": p}, x, T, N)), bp, x)

    # attention modes
    for mode in ("space", "time"):
        att = VarAttention(D, H, dtype=dt)
        ap = att.init(jax.random.PRNGKey(0), x, T, N, mode)["params"]
        timeit(f"VarAttention {mode}",
               jax.jit(lambda p, x, m=mode: att.apply({"params": p}, x, T, N, m)),
               ap, x)

    # mlp
    mlp = Mlp(D * 4, D, dtype=dt)
    mp = mlp.init(jax.random.PRNGKey(0), x)["params"]
    timeit("Mlp (c_fc/gelu/c_proj)",
           jax.jit(lambda p, x: mlp.apply({"params": p}, x)), mp, x)

    # patchify conv alone
    conv_model = SpaceTimeViT(cfg, dtype=dt)

    @jax.jit
    def patchify(p, v):
        frames = v.reshape(-1, 3, 224, 224).transpose(0, 2, 3, 1).astype(dt)
        import flax.linen as nn

        return jax.lax.conv_general_dilated(
            frames, p["conv1"]["kernel"].astype(dt),
            window_strides=(16, 16), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    timeit("patchify conv", patchify, params, video)

    print(f"\nfull model: {B / full:.1f} clips/s at batch {B}")


if __name__ == "__main__":
    main()
