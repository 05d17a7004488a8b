#!/usr/bin/env python
"""H/14 tower on real TPU: compile + throughput for the 632M-param OpenCLIP-style
tower (SURVEY §7 hard part (c); VERDICT round-1 weak #4).

Measures TVTSv2 H/14 video feature extraction (12 frames x 224x224, mask 0,
256 patches/frame -> 3073 tokens, width 1280, 32 layers) and the pretrain-shape
masked forward (mask 0.7 -> 77 keep). Paths: XLA `model.apply` and the fused
v2 megakernel forward (ops/fused_forward.py, pool_style 'openclip').

Usage: python tools/h14_bench.py [--fused 0|1] [--batch B] [--mask 0|1]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tvts_tpu.models import tvtsv2_h_14
from tvts_tpu.models.space_time_vit import SpaceTimeViT


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fused", type=int, default=1)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--mask", type=int, default=0,
                    help="1 = pretrain shape (mask_ratio 0.7)")
    ap.add_argument("--time_chunk", type=int, default=128)
    ap.add_argument("--kv", type=int, default=2,
                    help="kernel_version (7 = d-major tower; at H/14 "
                         "extraction N=256 the d-major lane pad is ZERO)")
    ap.add_argument("--sfpp", type=int, default=0,
                    help="v9 frames-per-program for the space kernel (kv=7)")
    ap.add_argument("--tokens", type=int, default=1,
                    help="0 = pooled-only (the zero-shot eval contract): "
                         "skips the token projection and, at kv=7, runs the "
                         "dead-work-free CLS-only last block")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    cfg = tvtsv2_h_14()
    vcfg = cfg.vision if args.mask else cfg.eval_config().vision
    model = SpaceTimeViT(vcfg, dtype=jnp.bfloat16)

    B = args.batch
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(
        size=(B, vcfg.num_frames, 3, vcfg.input_resolution,
              vcfg.input_resolution)).astype(np.float32))
    n_keep = vcfg.n_keep if args.mask else vcfg.patches_per_frame
    keep = jnp.asarray(np.stack([
        np.sort(rng.permutation(vcfg.patches_per_frame)[:n_keep])
        for _ in range(B)]).astype(np.int32))

    t0 = time.perf_counter()
    params = model.init(jax.random.PRNGKey(0), video, keep)["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    print(f"init: {time.perf_counter()-t0:.1f}s, {n_params/1e6:.0f}M params, "
          f"tokens/clip = {1 + vcfg.num_frames * n_keep}")

    if args.fused:
        from tvts_tpu.ops.fused_forward import space_time_vit_fused_forward

        @jax.jit
        def extract(params, video, keep):
            pooled, _ = space_time_vit_fused_forward(
                params, vcfg, video, keep, kernel_version=args.kv,
                space_fpp=args.sfpp or None,
                need_tokens=bool(args.tokens),
                time_chunk=args.time_chunk)
            return pooled
    else:
        @jax.jit
        def extract(params, video, keep):
            pooled, _ = model.apply({"params": params}, video, keep)
            return pooled

    t0 = time.perf_counter()
    float(jnp.sum(extract(params, video, keep)))
    print(f"compile+first: {time.perf_counter()-t0:.1f}s")

    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [extract(params, video, keep) for _ in range(args.iters)]
        float(jnp.sum(jnp.stack([jnp.sum(o) for o in outs])))
        dt = time.perf_counter() - t0
        best = max(best, B * args.iters / dt)
    label = "mask0.7" if args.mask else "extract"
    path = f"fused-v{args.kv}" if args.fused else "xla"
    print(f"H/14 {label} ({path}, B={B}): {best:.2f} clips/s/chip "
          f"({B / best * 1000:.0f} ms/batch)")


if __name__ == "__main__":
    main()
