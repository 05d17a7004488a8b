"""ctypes binding for the C++ FFmpeg decoder (tvts_tpu/cpp/decoder.cc).

Builds the shared library on first use if the toolchain + FFmpeg dev headers are
present (make -C tvts_tpu/cpp); otherwise `available()` is False and the video
reader falls back to OpenCV.
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "_native", "libtvtsdecode.so")
_CPP_DIR = os.path.join(_HERE, "..", "cpp")

_lock = threading.Lock()
_lib = None
_build_attempted = False


@dataclasses.dataclass
class VideoInfo:
    n_frames: int
    duration: float
    width: int
    height: int
    fps: float


def _try_build() -> bool:
    global _build_attempted
    if _build_attempted:
        return os.path.exists(_LIB_PATH)
    _build_attempted = True
    try:
        subprocess.run(["make", "-C", _CPP_DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        return False
    return os.path.exists(_LIB_PATH)


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _try_build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.tvts_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double)]
        lib.tvts_probe.restype = ctypes.c_int
        lib.tvts_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
        lib.tvts_decode.restype = ctypes.c_int
        lib.tvts_decode_aug.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.tvts_decode_aug.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def probe(path: str) -> VideoInfo:
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    n = ctypes.c_int64()
    dur = ctypes.c_double()
    w = ctypes.c_int()
    h = ctypes.c_int()
    fps = ctypes.c_double()
    rc = lib.tvts_probe(path.encode(), ctypes.byref(n), ctypes.byref(dur),
                        ctypes.byref(w), ctypes.byref(h), ctypes.byref(fps))
    if rc != 0:
        raise IOError(f"tvts_probe failed ({rc}) for {path}")
    return VideoInfo(int(n.value), float(dur.value), int(w.value),
                     int(h.value), float(fps.value))


def decode_frames(path: str, frame_idxs, resize: tuple[int, int] | None = None
                  ) -> np.ndarray:
    """Decode specific frames -> uint8 [T, H, W, 3] RGB. resize=(w, h) optional."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    idxs = np.ascontiguousarray(np.asarray(frame_idxs, dtype=np.int64))
    if resize is not None:
        out_w, out_h = resize
    else:
        info = probe(path)
        out_w, out_h = info.width, info.height
    out = np.empty((len(idxs), out_h, out_w, 3), dtype=np.uint8)
    rc = lib.tvts_decode(
        path.encode(), idxs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(idxs), out_w, out_h,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise IOError(f"tvts_decode failed ({rc}) for {path}")
    return out


def decode_frames_aug(path: str, frame_idxs, crop_size: int,
                      crop_frac: tuple[float, float] = (0.5, 0.5),
                      hflip: bool = False,
                      resize: tuple[int, int] | None = None) -> np.ndarray:
    """Fast-path decode with the crop/hflip fused in-decoder (the reference's
    ffmpeg-filtergraph `fast_decode`, base_dataset_yt.py:394-436): crop a
    crop_size x crop_size window at fractional position (aw, ah) of the slack,
    optionally mirror horizontally. Returns uint8 [T, H, W, 3] RGB."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    info = probe(path)
    aw, ah = crop_frac
    cw = min(crop_size, info.width)
    ch = min(crop_size, info.height)
    cx = int((info.width - cw) * aw)
    cy = int((info.height - ch) * ah)
    out_w, out_h = resize if resize is not None else (cw, ch)
    idxs = np.ascontiguousarray(np.asarray(frame_idxs, dtype=np.int64))
    out = np.empty((len(idxs), out_h, out_w, 3), dtype=np.uint8)
    rc = lib.tvts_decode_aug(
        path.encode(), idxs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(idxs), cx, cy, cw, ch, out_w, out_h, int(hflip),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise IOError(f"tvts_decode_aug failed ({rc}) for {path}")
    return out
