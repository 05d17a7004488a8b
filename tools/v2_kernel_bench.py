#!/usr/bin/env python
"""Benchmark the v2 (self-contained) megakernels against v1 on the TPU.

Measures the full fused B/16 extraction forward at B=32 in SECOND position
(PERF.md: first timed graph in a fresh process can read ~5x slow), best of 3.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def measure(fn, args, iters=10, rounds=3):
    import jax.numpy as jnp

    float(jnp.sum(fn(*args)))  # compile + warm
    best = np.inf
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        float(jnp.sum(jnp.stack([jnp.sum(o) for o in outs])))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from tvts_tpu.models import tvtsv2_b_16
    from tvts_tpu.models.space_time_vit import SpaceTimeViT
    from tvts_tpu.ops.fused_forward import space_time_vit_fused_forward

    cfg = tvtsv2_b_16().eval_config().vision
    B = int(os.environ.get("B", "32"))
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(B, cfg.num_frames, 3, 224, 224))
                        .astype(np.float32))
    keep = jnp.asarray(np.tile(np.arange(cfg.patches_per_frame, dtype=np.int32),
                               (B, 1)))
    model = SpaceTimeViT(cfg, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), video, keep)["params"]

    variants = [("v1", dict(kernel_version=1))]
    for chunk in (32, 64, 128):
        variants.append((f"v2_c{chunk}",
                         dict(kernel_version=2, time_chunk=chunk)))

    results = {}
    for name, kw in variants:
        @jax.jit
        def fwd(p, v, k, kw=kw):
            return space_time_vit_fused_forward(p, cfg, v, k, **kw)[0]
        try:
            dt = measure(fwd, (params, video, keep))
            results[name] = dt
            print(f"{name:>10}: {dt*1e3:8.1f} ms  {B/dt:7.1f} clips/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:>10}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    # second-position re-measure of the best variant for a fair number
    if results:
        best = min(results, key=results.get)
        print(f"\nbest: {best} ({B/results[best]:.1f} clips/s)")


if __name__ == "__main__":
    main()
