#!/usr/bin/env python
"""Input-pipeline throughput: can the host decode path feed the model?

Builds a synthetic video corpus, then measures ShardedLoader throughput
(decode + PIL transform + collate) for the extraction access pattern, across
worker counts and backends. Model-side consumption is ~79 clips/s on one v5e
(bench.py); the loader must exceed that per host.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from tvts_tpu.data.loader import ShardedLoader


def make_corpus(root, n_videos=48, n_frames=300, size=320):
    import cv2

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, size=(size, size, 3)).astype(np.uint8)
    lines = []
    for i in range(n_videos):
        rel = f"{i}.mp4"
        path = os.path.join(root, "train", rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0,
                            (size, size))
        for f in range(n_frames):
            w.write(np.roll(base, f * 2 + i, axis=1))
        w.release()
        lines.append(f"caption {i}\t{i}")
    return lines


def main():
    from tvts_tpu.data.datasets import WebVid

    with tempfile.TemporaryDirectory() as td:
        data = os.path.join(td, "data")
        meta = os.path.join(td, "meta")
        os.makedirs(meta)
        lines = make_corpus(data)
        with open(os.path.join(meta, "webvid_train.tsv"), "w") as f:
            f.write("caption\tvideoid\n" + "\n".join(lines) + "\n")

        for backend in ("native", "cv2"):
            for workers in (8, 16):
                ds = WebVid("WebVid", {}, {"num_frames": 12, "input_res": 224,
                                           "loading": "strict"},
                            data, split="train", meta_root=meta,
                            reader=backend, patches_per_frame=196,
                            mask_ratio=0.0)
                loader = ShardedLoader(ds, batch_size=8, shuffle=True,
                                       num_workers=workers, process_index=0,
                                       num_processes=1)
                t0 = time.perf_counter()
                n = 0
                for batch in loader:
                    n += batch["video"].shape[0]
                dt = time.perf_counter() - t0
                print(f"{backend:7s} workers={workers:2d}: "
                      f"{n / dt:7.1f} clips/s  ({n} clips in {dt:.1f}s)",
                      flush=True)


if __name__ == "__main__":
    main()
