#!/usr/bin/env python
"""Decode throughput: C++ FFmpeg decoder vs OpenCV seek-per-frame, per the
reference's 12-uniform-frames extraction access pattern."""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from tvts_tpu.data import native_decoder, video_reader


def make_video(path, n=300, size=320, fps=30):
    import cv2

    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (size, size))
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, size=(size, size, 3)).astype(np.uint8)
    for i in range(n):
        # moving content so the codec produces realistic P-frames
        frame = np.roll(base, i * 3, axis=1)
        w.write(frame)
    w.release()


def bench(backend, path, iters=30):
    t0 = time.perf_counter()
    for _ in range(iters):
        idxs = np.linspace(0, 299, 12).astype(int).tolist()
        frames = video_reader.read_frames_at(path, idxs, backend=backend)
    dt = time.perf_counter() - t0
    return iters / dt, frames.shape


def main():
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "bench.mp4")
        make_video(path)
        print(f"native available: {native_decoder.available()}")
        for backend in ("cv2", "native"):
            if backend == "native" and not native_decoder.available():
                continue
            clips_s, shape = bench(backend, path)
            print(f"{backend:8s}: {clips_s:7.1f} clips(12f)/s  frames {shape}")
        if native_decoder.available():
            # fused decode+resize (the extraction fast path)
            t0 = time.perf_counter()
            for _ in range(30):
                idxs = np.linspace(0, 299, 12).astype(int).tolist()
                native_decoder.decode_frames(path, idxs, resize=(224, 224))
            print(f"native+resize: {30 / (time.perf_counter() - t0):7.1f} clips/s")


if __name__ == "__main__":
    main()
