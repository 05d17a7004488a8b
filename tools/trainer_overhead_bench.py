#!/usr/bin/env python
"""Production-Trainer overhead vs the raw train step (VERDICT r4 #2).

tools/train_bench.py measures the jitted step alone (198.5 ms at B=20, best
preset). The PRODUCTION path (train/trainer.Trainer._train_epoch) adds
prepare_batch (tokenize), device_put/shard, the aux bookkeeping, and — in
round 4 — a per-step host loss fetch that cost ~8x on this tunnel. Round 5
batches the aux fetches at log_step boundaries; this harness measures the
remaining overhead by driving the REAL Trainer.train() epoch loop with an
in-memory loader (decode removed: the 1-vCPU container's decode ceiling,
~7 clips/s/core, would otherwise bind — PERF.md round-1 input pipeline).

Prints ms/step for the Trainer epoch vs the bare step at the same shapes.
Usage: python tools/trainer_overhead_bench.py [-B 20] [--steps 40]
       [--log_step 50] [--preset best]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


class MemoryLoader:
    """ShardedLoader-shaped wrapper over a fixed pool of raw batches."""

    def __init__(self, batches, batch_size, name="YTTemporal"):
        self._batches = batches
        self.batch_size = batch_size
        self.num_processes = 1

        class _DS:  # Trainer reads dataset.dataset_name for epoch_loader
            dataset_name = name

        self.dataset = _DS()

    def __len__(self):
        return len(self._batches)

    def set_epoch(self, epoch):
        pass

    def __iter__(self):
        return iter(self._batches)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-B", type=int, default=20)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--pool", type=int, default=4)
    ap.add_argument("--log_step", type=int, default=50)
    ap.add_argument("--preset", default="best")
    ap.add_argument("--arch", default="TVTSv2_B_16")
    ap.add_argument("--device_pool", action="store_true",
                    help="pre-tokenize + device_put the pool once: isolates "
                         "the Trainer LOOP overhead from the tunnel's "
                         "host->device transfer (per-step 144 MB at B=20, "
                         "seconds over the axon RPC — a PCIe-era artifact "
                         "this harness cannot hide)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from tvts_tpu.models.factory import build_model
    from tvts_tpu.ops.fused_forward import make_fused_train_apply
    from tvts_tpu.ops.kernel_config import resolve_kernel_config
    from tvts_tpu.train.optim import OptimizerConfig, make_optimizer
    from tvts_tpu.train.trainer import Trainer

    cfg, model, params = build_model(args.arch, eval_mode=False,
                                     dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    v = cfg.vision
    words = ("the quick brown fox jumps over the lazy dog and keeps going "
             "while the narrator describes the scene in plain words").split()
    batches = []
    for _ in range(args.pool):
        video = rng.normal(size=(args.B, v.num_frames, 3, v.input_resolution,
                                 v.input_resolution)).astype(np.float32)
        keep = np.stack([rng.permutation(v.patches_per_frame)[: v.n_keep]
                         for _ in range(args.B)]).astype(np.int32)
        text = [[" ".join(rng.choice(words, size=40))
                 for _ in range(cfg.num_clips)] for _ in range(args.B)]
        label = np.tile(np.arange(cfg.num_clips), (args.B, 1)).astype(np.int32)
        batches.append({"video": video, "keep_ind": keep, "text": text,
                        "label": label})
    if args.device_pool:
        import jax

        from tvts_tpu.train.trainer import prepare_batch

        batches = [jax.device_put(prepare_batch(b)) for b in batches]
    loader = MemoryLoader(batches * (args.steps // args.pool + 1), args.B)

    kcfg = resolve_kernel_config(args.arch, {"preset": args.preset})
    apply_fn = make_fused_train_apply(model, cfg,
                                      num_frames=cfg.vision.num_frames,
                                      n_keep=cfg.vision.n_keep, **kcfg)
    ocfg = OptimizerConfig(text_layers=cfg.text.layers, schedule=(6, 8),
                           steps_per_epoch=args.steps)
    tx = make_optimizer(params, ocfg)
    trainer = Trainer(model, params, tx, [loader], valid_loaders=None,
                      epochs=1, apply_fn=apply_fn, log_step=args.log_step,
                      max_samples_per_epoch=args.steps * args.B)

    # warm epoch (compiles), then the timed epoch
    trainer.epochs = 1
    t0 = time.perf_counter()
    trainer._train_epoch(1)
    warm = time.perf_counter() - t0
    n = trainer._len_epoch()
    t0 = time.perf_counter()
    trainer._train_epoch(2)
    dt = time.perf_counter() - t0
    ms = dt / n * 1000
    clips = args.B * n / dt
    print(f"trainer epoch: {n} steps, {ms:.1f} ms/step = {clips:.2f} clips/s "
          f"(warm epoch {warm:.1f}s incl. compile; log_step={args.log_step})")


if __name__ == "__main__":
    main()
