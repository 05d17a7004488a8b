"""Host-side clip preprocessing.

Behavioral contract: reference v2/video_transforms/videoaug.py (`VideoTransform`) —
the transform that the reference hardcodes for EVERY video dataset
(base_dataset.py:44-45, overriding whatever the config passes):

  train: PIL NEAREST shorter-side resize to int(1.2*crop) -> RandomCrop(crop)
         -> /255 -> ImageNet mean/std normalize
  eval:  same with CenterCrop

PIL is used for the resizes (as the reference does via TensorToNumpy -> PIL) so
interpolation grids match exactly. A device-side fused path (`preprocess_on_device`)
resizes/crops/normalizes inside XLA instead — preferred for throughput: ship uint8
frames over PCIe (4x smaller than f32) and let the TPU do the math.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def _resize_shorter_pil(frame: np.ndarray, size: int, resample) -> np.ndarray:
    h, w = frame.shape[:2]
    if (w <= h and w == size) or (h <= w and h == size):
        return frame
    if w < h:
        ow, oh = size, int(size * h / w)
    else:
        oh, ow = size, int(size * w / h)
    return np.asarray(Image.fromarray(frame).resize((ow, oh), resample))


def video_transform(
    frames: np.ndarray,
    crop_size: int = 224,
    mode: str = "test",
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """[T, H, W, 3] uint8 -> [T, 3, crop, crop] float32 normalized."""
    resized = np.stack([
        _resize_shorter_pil(f, int(crop_size * 1.2), Image.NEAREST) for f in frames
    ])
    t, h, w = resized.shape[:3]
    if mode == "train":
        if rng is None:
            rng = np.random.default_rng()
        x1 = int(rng.integers(0, w - crop_size + 1))
        y1 = int(rng.integers(0, h - crop_size + 1))
    else:
        x1 = int(round((w - crop_size) / 2.0))
        y1 = int(round((h - crop_size) / 2.0))
    cropped = resized[:, y1: y1 + crop_size, x1: x1 + crop_size]
    out = cropped.astype(np.float32) / 255.0
    out = (out - IMAGENET_MEAN) / IMAGENET_STD
    return out.transpose(0, 3, 1, 2)


INCEPTION_MEAN = np.array([0.5, 0.5, 0.5], dtype=np.float32)
INCEPTION_STD = np.array([0.5, 0.5, 0.5], dtype=np.float32)


def pixelbert_transform(frames: np.ndarray, size: int = 224,
                        mode: str = "test",
                        rng: np.random.Generator | None = None) -> np.ndarray:
    """Pixel-BERT-style clip transform (reference v2/video_transforms/pixelbert.py):
    shorter-side resize then (train) random / (eval) center crop with INCEPTION
    mean/std normalization. [T, H, W, 3] uint8 -> [T, 3, size, size] float32."""
    resized = np.stack([
        _resize_shorter_pil(f, int(size * 1.15), Image.BILINEAR) for f in frames])
    t, h, w = resized.shape[:3]
    if mode == "train":
        if rng is None:
            rng = np.random.default_rng()
        y = int(rng.integers(0, h - size + 1))
        x = int(rng.integers(0, w - size + 1))
    else:
        y, x = (h - size) // 2, (w - size) // 2
    out = resized[:, y: y + size, x: x + size].astype(np.float32) / 255.0
    out = (out - INCEPTION_MEAN) / INCEPTION_STD
    return out.transpose(0, 3, 1, 2)


def extract_transform(frames: np.ndarray, size: int = 224) -> np.ndarray:
    """Feature-extraction preprocessing (reference
    feature_extraction_TVTSv2_B_16.py:63-76): direct bilinear resize to (size, size),
    /255, ImageNet normalize. [T, H, W, 3] uint8 -> [T, 3, size, size] float32."""
    resized = np.stack([
        np.asarray(Image.fromarray(f).resize((size, size), Image.BILINEAR))
        for f in frames
    ])
    out = resized.astype(np.float32) / 255.0
    out = (out - IMAGENET_MEAN) / IMAGENET_STD
    return out.transpose(0, 3, 1, 2)


def preprocess_on_device(frames_u8, crop_size: int = 224, train: bool = False,
                         crop_xy=None):
    """Fused XLA preprocessing: [B, T, H, W, 3] uint8 (device array) ->
    [B, T, 3, crop, crop] float32. Resize is skipped when H == W == crop already
    (decode-side scaling); otherwise a bilinear jax.image.resize runs on device.

    Deviation (documented): the device path uses bilinear resize instead of the
    host path's PIL NEAREST — gate accuracy-parity evals on the host path.
    """
    import jax.numpy as jnp
    from jax import image as jimage

    x = frames_u8.astype(jnp.float32)
    B, T, H, W, C = x.shape
    if (H, W) != (crop_size, crop_size):
        short = min(H, W)
        target = int(crop_size * 1.2)
        nh, nw = (target, int(target * W / H)) if H < W else (int(target * H / W), target)
        if short != target:
            x = jimage.resize(x, (B, T, nh, nw, C), method="bilinear")
        H, W = nh, nw
        if crop_xy is None:
            y1 = int(round((H - crop_size) / 2.0))
            x1 = int(round((W - crop_size) / 2.0))
        else:
            y1, x1 = crop_xy
        x = x[:, :, y1: y1 + crop_size, x1: x1 + crop_size, :]
    x = x / 255.0
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    x = (x - mean) / std
    return x.transpose(0, 1, 4, 2, 3)
