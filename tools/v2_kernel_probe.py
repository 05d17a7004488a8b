#!/usr/bin/env python
"""Isolate which v2 kernel fails Mosaic lowering on the TPU and why."""

import os
import sys
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tvts_tpu.ops.pallas_block_attention import (
        fused_space_attention_block_v2,
        fused_time_attention_block_v2,
    )

    B, T, N, D, H = 4, 12, 196, 768, 12
    S = 1 + T * N
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32)).astype(jnp.bfloat16)
    base = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32)).astype(jnp.bfloat16)
    wqkv = jnp.asarray(rng.normal(size=(D, 3 * D)).astype(np.float32) * .02).astype(jnp.bfloat16)
    bqkv = jnp.zeros((3 * D,), jnp.bfloat16)
    wproj = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * .02).astype(jnp.bfloat16)
    bproj = jnp.zeros((D,), jnp.bfloat16)
    ln_s = jnp.ones((D,), jnp.float32)
    ln_b = jnp.zeros((D,), jnp.float32)

    def try_case(name, fn):
        try:
            out = jax.jit(fn)()
            float(jnp.sum(out))
            print(f"{name}: OK {out.shape}", flush=True)
        except Exception:
            tb = traceback.format_exc()
            print(f"{name}: FAILED\n{tb[-3000:]}\n{'='*70}", flush=True)

    for chunk in (32, 64):
        try_case(f"time_v2_c{chunk}",
                 lambda chunk=chunk: fused_time_attention_block_v2(
                     x, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                     num_frames=T, patches_per_frame=N, num_heads=H,
                     chunk=chunk))
    try_case("space_v2",
             lambda: fused_space_attention_block_v2(
                 x, base, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                 num_frames=T, patches_per_frame=N, num_heads=H))


if __name__ == "__main__":
    main()
