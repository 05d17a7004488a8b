#!/usr/bin/env python
"""Pretraining-step throughput: full TVTSv2 B/16 train step (mask 0.5, 4-clip
text, sort head, backward + AdamW) on the local chip."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tvts_tpu.models import TVTSv2, tvtsv2_b_16
from tvts_tpu.models.factory import init_params
from tvts_tpu.train.optim import OptimizerConfig, make_optimizer
from tvts_tpu.train.step import create_train_state, make_train_step


def main():
    B = int(os.environ.get("TB", 8))
    cfg = tvtsv2_b_16()
    model = TVTSv2(cfg, dtype=jnp.bfloat16)
    v = cfg.vision
    rng = np.random.default_rng(0)
    batch = {
        "video": jnp.asarray(rng.normal(size=(B, v.num_frames, 3, 224, 224)).astype(np.float32)),
        "text_ids": jnp.asarray(np.concatenate([
            np.full((cfg.num_clips * B, 1), 49406, np.int32),
            rng.integers(1, 49000, size=(cfg.num_clips * B, 75)).astype(np.int32),
            np.full((cfg.num_clips * B, 1), 49407, np.int32)], axis=1)),
        "keep_ind": jnp.asarray(np.stack([
            rng.permutation(v.patches_per_frame)[: v.n_keep] for _ in range(B)
        ]).astype(np.int32)),
        "labels": jnp.asarray(np.tile(np.arange(4), (B, 1)).astype(np.int32)),
    }
    params = init_params(model, cfg)
    ocfg = OptimizerConfig(schedule=(6, 8), steps_per_epoch=1000)
    tx = make_optimizer(params, ocfg)
    state = create_train_state(params, tx)
    apply_fn = None
    if os.environ.get("TVTS_TPU_TRAIN_FUSED", "0") == "1":
        from tvts_tpu.ops.fused_forward import make_fused_train_apply

        apply_fn = make_fused_train_apply(
            model, cfg, num_frames=v.num_frames, n_keep=v.n_keep,
            time_chunk=int(os.environ.get("TVTS_TIME_CHUNK", "128")),
            mlp_mode=os.environ.get("TVTS_MLP_MODE", "xla"),
            space_mode=os.environ.get("TVTS_SPACE_MODE", "pallas"))
        print("fused train path (Pallas fwd+bwd megakernels)")
    step = make_train_step(model, tx, donate=True, apply_fn=apply_fn)

    state, aux = step(state, batch)
    float(aux["loss"])  # force compile + first step
    iters = 8
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, aux = step(state, batch)
        float(aux["loss"])
        dt = min(dt, (time.perf_counter() - t0) / iters)
    print(f"B/16 pretrain step (B={B}): {dt * 1000:.1f} ms = "
          f"{B / dt:.2f} clips/s/chip, loss {float(aux['loss']):.3f} "
          f"sort_acc {float(aux['sort_acc']):.3f}")


if __name__ == "__main__":
    main()
