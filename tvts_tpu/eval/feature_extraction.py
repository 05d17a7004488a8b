"""Single-video feature extraction (the public out-of-the-box API).

Behavioral contract: reference v2/downstream/feature_extraction_TVTSv2_B_16.py:
uniform 12 frames via linspace -> Resize(224,224) bilinear -> /255 ->
ImageNet-normalize -> full keep set arange(patches_per_frame) -> [1, D] video
embedding (:54-94).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tvts_tpu.data.transforms import extract_transform
from tvts_tpu.data.video_reader import get_video_len, read_frames_at
from tvts_tpu.eval.embed import make_embed_fns


def load_clip_for_extraction(video_path: str, num_frames: int = 12,
                             size: int = 224, backend: str = "auto") -> np.ndarray:
    vlen = get_video_len(video_path, backend=backend)
    # reference: np.linspace(0, vlen-1, num_frames) int indices (decord path)
    idxs = np.linspace(0, vlen - 1, num_frames).astype(int)
    frames = read_frames_at(video_path, idxs.tolist(), backend=backend)
    return extract_transform(frames, size=size)[None]  # [1, T, 3, H, W]


def load_clip_fast(video_path: str, num_frames: int = 12, size: int = 224,
                   backend: str = "auto") -> np.ndarray:
    """Fast pipeline: resize happens inside the decoder (swscale bilinear) and
    uint8 frames ship to device where /255 + normalization run fused in XLA.
    4x less PCIe traffic than the f32 host path; bilinear-resize numerics differ
    marginally from the PIL host path (documented deviation)."""
    from tvts_tpu.data.transforms import preprocess_on_device

    vlen = get_video_len(video_path, backend=backend)
    idxs = np.linspace(0, vlen - 1, num_frames).astype(int)
    frames = read_frames_at(video_path, idxs.tolist(), backend=backend,
                            resize=(size, size))  # uint8 [T, size, size, 3]
    return preprocess_on_device(jnp.asarray(frames[None]), crop_size=size)


def extract_video_feature(model, params, video_path: str,
                          backend: str = "auto",
                          use_fused: bool = False,
                          fast_pipeline: bool = False) -> np.ndarray:
    cfg = model.cfg.vision
    if fast_pipeline:
        clip = load_clip_fast(video_path, num_frames=cfg.num_frames,
                              size=cfg.input_resolution, backend=backend)
    else:
        clip = load_clip_for_extraction(video_path, num_frames=cfg.num_frames,
                                        size=cfg.input_resolution,
                                        backend=backend)
    keep = np.arange(cfg.patches_per_frame, dtype=np.int32)[None]
    _, embed_video = make_embed_fns(model, use_fused=use_fused)
    out = embed_video(params, jnp.asarray(clip), jnp.asarray(keep))
    return np.asarray(out, dtype=np.float32)
