#!/usr/bin/env python
"""Pretraining-step throughput: full TVTSv2 train step (masked tower, n-clip
text, sort head, backward + AdamW) on the local chip.

Covers all three towers (--arch TVTSv2_B_16 / TVTSv2_B_32 / TVTSv2_H_14);
reference counterparts v2/train_dist_TVTSv2_ViT_*.py. H/14 runs the 842M-param
tower at mask 0.7 in bf16 + fp32 LNs (VERDICT r2 #3: first H/14 train-step
hardware numbers).

Env knobs: TB (batch), TVTS_TPU_TRAIN_FUSED=1, TVTS_TIME_CHUNK,
TVTS_MLP_MODE, TVTS_SPACE_MODE, TVTS_TIME_MODE.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tvts_tpu.models import TVTSv2
from tvts_tpu.models.configs import MODEL_REGISTRY
from tvts_tpu.models.factory import init_params
from tvts_tpu.train.optim import OptimizerConfig, freeze_mask, make_optimizer
from tvts_tpu.train.step import create_train_state, make_train_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="TVTSv2_B_16",
                    choices=sorted(k for k in MODEL_REGISTRY
                                   if k.startswith("TVTSv2")))
    ap.add_argument("-B", "--batch", type=int,
                    default=int(os.environ.get("TB", 8)))
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--remat", action="store_true",
                    help="activation checkpointing on the tower (XLA path)")
    ap.add_argument("--bf16_state", action="store_true",
                    help="bf16 params + bf16 AdamW first moment: single-chip "
                         "H/14 probe (f32 params+m+v for 842M = ~10 GB and "
                         "cannot fit one v5e; production shards the f32 "
                         "state over the fsdp axis instead)")
    args = ap.parse_args()
    B = args.batch

    cfg = MODEL_REGISTRY[args.arch]()
    model = TVTSv2(cfg, dtype=jnp.bfloat16, remat=args.remat)
    v = cfg.vision
    res = v.input_resolution
    rng = np.random.default_rng(0)
    batch = {
        "video": jnp.asarray(rng.normal(
            size=(B, v.num_frames, 3, res, res)).astype(np.float32)),
        "text_ids": jnp.asarray(np.concatenate([
            np.full((cfg.num_clips * B, 1), 49406, np.int32),
            rng.integers(1, 49000,
                         size=(cfg.num_clips * B, 75)).astype(np.int32),
            np.full((cfg.num_clips * B, 1), 49407, np.int32)], axis=1)),
        "keep_ind": jnp.asarray(np.stack([
            rng.permutation(v.patches_per_frame)[: v.n_keep] for _ in range(B)
        ]).astype(np.int32)),
        "labels": jnp.asarray(np.tile(np.arange(cfg.num_clips),
                                      (B, 1)).astype(np.int32)),
    }
    t0 = time.perf_counter()
    params = init_params(model, cfg)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    print(f"init {time.perf_counter()-t0:.1f}s; {n_params/1e6:.0f}M params; "
          f"tokens/clip {1 + v.num_frames * v.n_keep} (mask {v.mask_ratio})")
    if args.bf16_state:
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
        print("bf16 params + bf16 AdamW mu (single-chip probe)")
    ocfg = OptimizerConfig(schedule=(6, 8), steps_per_epoch=1000,
                           text_layers=cfg.text.layers,
                           text_tune_layers=6 if args.arch == "TVTSv2_H_14"
                           else 3,
                           mu_dtype="bfloat16" if args.bf16_state else None)
    if os.environ.get("TVTS_OPT") == "sgd0":
        # optimizer-cost ablation: a zero-LR SGD removes the AdamW state
        # traffic from the step — the delta vs the default run IS the
        # in-step AdamW cost (PERF.md round 5)
        import optax

        tx = optax.sgd(0.0)
        print("TVTS_OPT=sgd0: zero-LR SGD (AdamW-cost ablation)")
    else:
        tx = make_optimizer(params, ocfg)
    state = create_train_state(params, tx)
    apply_fn = None
    if os.environ.get("TVTS_TPU_TRAIN_FUSED", "0") == "1":
        from tvts_tpu.ops.fused_forward import make_fused_train_apply
        from tvts_tpu.ops.kernel_config import resolve_kernel_config

        # per-arch defaults from the PERF.md decision tables; TVTS_* env
        # vars override (preset via TVTS_KERNEL_PRESET=default|best)
        kcfg = resolve_kernel_config(
            args.arch,
            {"preset": os.environ.get("TVTS_KERNEL_PRESET", "default")})
        if kcfg.get("text_mode") == "pallas" \
                and os.environ.get("TVTS_FREEZE", "1") == "1":
            # match the optimizer's frozen split so the text kernels use the
            # dx-only backward for frozen blocks
            kcfg["text_tune_from"] = ocfg.text_layers - ocfg.text_tune_layers
        apply_fn = make_fused_train_apply(
            model, cfg, num_frames=v.num_frames, n_keep=v.n_keep, **kcfg)
        print(f"fused train path (Pallas fwd+bwd megakernels): {kcfg}")
    # production default: frozen text blocks are stop_gradient'd so their
    # dW matmuls drop out of the backward (TVTS_FREEZE=0 for the A/B)
    fmask = (freeze_mask(params, ocfg)
             if os.environ.get("TVTS_FREEZE", "1") == "1" else None)
    step = make_train_step(model, tx, donate=True, apply_fn=apply_fn,
                           freeze_mask=fmask)

    t0 = time.perf_counter()
    state, aux = step(state, batch)
    float(aux["loss"])  # force compile + first step
    print(f"compile+first {time.perf_counter()-t0:.1f}s")
    iters = args.iters
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, aux = step(state, batch)
        float(aux["loss"])
        dt = min(dt, (time.perf_counter() - t0) / iters)
    print(f"{args.arch} pretrain step (B={B}): {dt * 1000:.1f} ms = "
          f"{B / dt:.2f} clips/s/chip, loss {float(aux['loss']):.3f} "
          f"sort_acc {float(aux['sort_acc']):.3f}")


if __name__ == "__main__":
    main()
