#!/usr/bin/env python
"""ONE-pipeline extraction measurement (VERDICT r2 #7): mp4 -> C++ decoder
(decode-side resize, uint8) -> device -> fused on-device normalize + fused
B/16 model, with thread prefetch overlapping host decode and TPU compute.

Reports end-to-end clips/s next to the stage ceilings (host decode alone,
model alone) so the honest gap to the synthetic bench.py number is explicit.
On this 1-vCPU container the host decode ceiling (~7 clips/s/core, PERF.md)
binds; a production v5e host (~112 vCPUs / 4-8 chips) has ~14-28 cores/chip.

Mirrors: /root/reference/v2/downstream/feature_extraction_TVTSv2_B_16.py:33-94.

Usage: python tools/e2e_extraction_bench.py [--videos 32] [--batch 8]
       [--workers 4]
"""

import argparse
import os
import queue
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--frames", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tools.pipeline_bench import make_corpus
    from tvts_tpu.data.transforms import preprocess_on_device
    from tvts_tpu.data.video_reader import get_video_len, read_frames_at
    from tvts_tpu.models import tvtsv2_b_16
    from tvts_tpu.models.space_time_vit import SpaceTimeViT
    from tvts_tpu.ops.fused_forward import space_time_vit_fused_forward

    cfg = tvtsv2_b_16().eval_config().vision
    model = SpaceTimeViT(cfg, dtype=jnp.bfloat16)
    B = args.batch

    with tempfile.TemporaryDirectory() as td:
        root = os.path.join(td, "data")
        make_corpus(root, n_videos=args.videos, n_frames=120, size=320)
        paths = [os.path.join(root, "train", f"{i}.mp4")
                 for i in range(args.videos)]

        def decode_clip(path):
            vlen = get_video_len(path, backend="native")
            idxs = np.linspace(0, vlen - 1, args.frames).astype(int)
            return read_frames_at(path, idxs.tolist(), backend="native",
                                  resize=(224, 224))  # uint8 [T,224,224,3]

        # ---- stage ceiling: host decode alone ------------------------------
        t0 = time.perf_counter()
        first = decode_clip(paths[0])
        t_one = time.perf_counter() - t0
        decode_ceiling = args.workers / t_one  # per-core ceiling x workers

        # ---- model setup + model-only ceiling ------------------------------
        rng = np.random.default_rng(0)
        video_syn = jnp.asarray(rng.normal(
            size=(B, cfg.num_frames, 3, 224, 224)).astype(np.float32))
        keep = jnp.asarray(np.tile(
            np.arange(cfg.patches_per_frame, dtype=np.int32), (B, 1)))
        params = model.init(jax.random.PRNGKey(0), video_syn, keep)["params"]

        @jax.jit
        def extract(params, frames_u8, keep):
            clip = preprocess_on_device(frames_u8, crop_size=224)
            pooled, _ = space_time_vit_fused_forward(
                params, cfg, clip, keep, kernel_version=2, time_chunk=128)
            return pooled

        u8_batch = jnp.asarray(np.stack([first] * B))  # [B,T,224,224,3] u8
        float(jnp.sum(extract(params, u8_batch, keep)))  # compile
        t0 = time.perf_counter()
        outs = [extract(params, u8_batch, keep) for _ in range(6)]
        float(jnp.sum(jnp.stack([jnp.sum(o) for o in outs])))
        model_ceiling = 6 * B / (time.perf_counter() - t0)

        # ---- end-to-end: threaded decode -> device -> model ----------------
        q: "queue.Queue" = queue.Queue(maxsize=args.workers * 2)
        idx_lock = threading.Lock()
        next_idx = [0]

        def worker():
            while True:
                with idx_lock:
                    i = next_idx[0]
                    if i >= args.videos:
                        return
                    next_idx[0] += 1
                q.put(decode_clip(paths[i]))

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(args.workers)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        results = []
        pending = []
        done = 0
        while done < args.videos:
            take = min(B, args.videos - done)
            clips = [q.get() for _ in range(take)]
            done += take
            if take < B:  # pad the tail batch (static shapes)
                clips += [clips[-1]] * (B - take)
            batch = jnp.asarray(np.stack(clips))
            results.append(extract(params, batch, keep))  # async dispatch
            pending.append(take)
        float(jnp.sum(jnp.stack([jnp.sum(r) for r in results])))  # force all
        dt = time.perf_counter() - t0
        e2e = args.videos / dt

        print(f"stage ceilings: decode {decode_ceiling:.1f} clips/s "
              f"({args.workers} workers x {1/t_one:.1f}/core), "
              f"model {model_ceiling:.1f} clips/s (fused, uint8-in)")
        print(f"END-TO-END: {e2e:.2f} clips/s over {args.videos} mp4s "
              f"(B={B}, {args.workers} decode threads, {dt:.1f}s)")
        bound = "host-decode" if decode_ceiling < model_ceiling else "model"
        eff = e2e / min(decode_ceiling, model_ceiling)
        print(f"bound by {bound}; pipeline efficiency vs binding stage: "
              f"{100 * eff:.0f}%")


if __name__ == "__main__":
    main()
