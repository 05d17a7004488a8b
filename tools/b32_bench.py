#!/usr/bin/env python
"""B/32 tower on real TPU (VERDICT r2 #5): patch-32 geometry has 49
patches/frame (sublane-hostile: 49 pads to 64 in bf16 tiles) and had zero
hardware measurements. Benches extraction (mask 0 -> 589 tokens/clip) and the
pretrain shape (mask 0.5 -> 24 keep), XLA vs the fused v2 megakernels.

Reference counterpart: v2/model/video_encoder_ViT_B_32.py /
model_dist_TVTSv2_ViT_B_32.py.

Usage: python tools/b32_bench.py [--fused 0|1] [--batch B] [--mask 0|1]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tvts_tpu.models import tvtsv2_b_32
from tvts_tpu.models.space_time_vit import SpaceTimeViT


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fused", type=int, default=1)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--mask", type=int, default=0,
                    help="1 = pretrain shape (mask_ratio 0.5)")
    ap.add_argument("--time_chunk", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=0,
                    help="1 = also produce per-token embeddings (pre-round-3 "
                         "semantics); 0 = pooled CLS only, which lets the "
                         "fused path run the CLS-only last-block tail")
    ap.add_argument("--keep", type=int, default=0,
                    help="1 = explicit full-arange keep gather at mask 0")
    args = ap.parse_args()

    cfg = tvtsv2_b_32()
    vcfg = cfg.vision if args.mask else cfg.eval_config().vision
    model = SpaceTimeViT(vcfg, dtype=jnp.bfloat16)

    B = args.batch
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(
        size=(B, vcfg.num_frames, 3, vcfg.input_resolution,
              vcfg.input_resolution)).astype(np.float32))
    n_keep = vcfg.n_keep if args.mask else vcfg.patches_per_frame
    if args.mask or args.keep:
        keep = jnp.asarray(np.stack([
            np.sort(rng.permutation(vcfg.patches_per_frame)[:n_keep])
            for _ in range(B)]).astype(np.int32))
    else:
        keep = None  # extraction never tube-masks (B/16 bench trim)

    t0 = time.perf_counter()
    params = model.init(jax.random.PRNGKey(0), video, keep)["params"]
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    print(f"init: {time.perf_counter()-t0:.1f}s, {n_params/1e6:.0f}M params, "
          f"tokens/clip = {1 + vcfg.num_frames * n_keep}")

    if args.fused:
        from tvts_tpu.ops.fused_forward import space_time_vit_fused_forward

        @jax.jit
        def extract(params, video, keep):
            pooled, _ = space_time_vit_fused_forward(
                params, vcfg, video, keep, kernel_version=2,
                time_chunk=args.time_chunk, need_tokens=bool(args.tokens))
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
    label = "mask0.5" if args.mask else "extract"
    path = "fused-v2" if args.fused else "xla"
    trims = "" if args.mask else f", tokens={args.tokens}, keep={args.keep}"
    print(f"B/32 {label} ({path}, B={B}, time_chunk={args.time_chunk}{trims}): "
          f"{best:.2f} clips/s/chip ({B / best * 1000:.1f} ms/batch)")


if __name__ == "__main__":
    main()
