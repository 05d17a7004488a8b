"""Video decode layer.

Behavioral contract: reference L0/L1 (SURVEY §2.2) — decord/OpenCV batch frame
decode with rand/uniform/fix_start sampling (base_dataset.py:288-328) and the
multi-clip YT-Temporal window reader (base_dataset_yt.py:333-391).

Backends:
- "native" — the framework's C++ FFmpeg decoder (tvts_tpu/cpp, loaded via ctypes):
  one-pass sequential decode of sorted frame indices with in-decoder swscale
  RGB24 conversion + optional resize. This replaces the reference's decord
  dependency and is the throughput path.
- "cv2"    — OpenCV seek-per-frame fallback, mirroring read_frames_cv2.

All functions return uint8 [T, H, W, 3] frames; transforms handle normalization.
"""

from __future__ import annotations

import os

import numpy as np

from tvts_tpu.data.sampling_bridge import sample_frames
from tvts_tpu.data import native_decoder

try:
    import cv2

    cv2.setNumThreads(0)  # reference guard: v1/train_dist_TVTS.py:116-117
    try:
        cv2.ocl.setUseOpenCL(False)
    except Exception:
        pass
except ImportError:  # pragma: no cover
    cv2 = None

DEFAULT_BACKEND = os.environ.get("TVTS_TPU_VIDEO_BACKEND", "auto")


def _pick_backend(backend: str) -> str:
    if backend == "auto":
        return "native" if native_decoder.available() else "cv2"
    return backend


def get_video_len(path: str, backend: str = DEFAULT_BACKEND) -> int:
    backend = _pick_backend(backend)
    if backend == "native":
        return native_decoder.probe(path).n_frames
    if cv2 is None:
        raise RuntimeError("no video backend available")
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {path}")
    vlen = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    return vlen


def probe(path: str, backend: str = DEFAULT_BACKEND):
    """(n_frames, duration_sec, width, height)."""
    backend = _pick_backend(backend)
    if backend == "native":
        info = native_decoder.probe(path)
        return info.n_frames, info.duration, info.width, info.height
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {path}")
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    fps = cap.get(cv2.CAP_PROP_FPS) or 0.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    cap.release()
    return n, (n / fps if fps > 0 else 0.0), w, h


def read_frames_at(path: str, frame_idxs, backend: str = DEFAULT_BACKEND,
                   resize: tuple[int, int] | None = None) -> np.ndarray:
    """Decode specific frame indices -> uint8 [T, H, W, 3] RGB."""
    backend = _pick_backend(backend)
    if backend == "native":
        return native_decoder.decode_frames(path, frame_idxs, resize=resize)
    if cv2 is None:
        raise RuntimeError("no video backend available")
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {path}")
    frames = []
    last = None
    for idx in frame_idxs:
        cap.set(cv2.CAP_PROP_POS_FRAMES, int(idx))
        ret, frame = cap.read()
        if not ret:
            # reference read_frames_cv2 silently skips failed frames; we repeat the
            # previous frame to keep static shapes (documented deviation)
            if last is None:
                raise IOError(f"frame {idx} decode failed: {path}")
            frame = last
        last = frame
        rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        if resize is not None:
            rgb = cv2.resize(rgb, resize, interpolation=cv2.INTER_LINEAR)
        frames.append(rgb)
    cap.release()
    return np.stack(frames)


def read_frames_sampled(path: str, num_frames: int, sample: str = "rand",
                        fix_start: int | None = None,
                        rng: np.random.Generator | None = None,
                        backend: str = DEFAULT_BACKEND) -> tuple[np.ndarray, list[int]]:
    """Reference read_frames_cv2/decord: sample indices over the whole video, then
    decode. Returns (frames uint8 [T,H,W,3], frame_idxs)."""
    vlen = get_video_len(path, backend)
    idxs = sample_frames(num_frames, vlen, sample=sample, fix_start=fix_start, rng=rng)
    return read_frames_at(path, idxs, backend), idxs


def read_multi_clip(path: str, begin_time_all, end_time_all, duration: float,
                    num_frames: int, num_clips: int,
                    rng: np.random.Generator | None = None,
                    backend: str = DEFAULT_BACKEND) -> np.ndarray:
    """Reference video_clip_reader_cat: rand-sample num_frames*num_clips indices
    inside the [begin, end] window (fps estimated as vlen/duration)."""
    from tvts_tpu.ops.sampling import multi_clip_frame_indices

    vlen = get_video_len(path, backend)
    idxs = multi_clip_frame_indices(begin_time_all, end_time_all, duration, vlen,
                                    num_frames, num_clips, rng=rng)
    return read_frames_at(path, idxs, backend)
