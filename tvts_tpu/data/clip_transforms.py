"""Clip-level transform classes (the reference's video transform library).

Behavioral contract: reference v2/video_transforms/video_transform.py (classes at
:24-664) — the torchvision-style library of clip ops, applied consistently across
the frames of one clip. The subset used by TVTS training is composed in
data/transforms.py; this module provides the full class suite for downstream /
custom pipelines, operating on numpy [T, H, W, C] uint8 clips (ClipToTensor
converts to the reference's float [T, C, H, W] contract).
"""

from __future__ import annotations

import numbers
import random as _random

import numpy as np
from PIL import Image, ImageEnhance

from tvts_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, clip):
        for t in self.transforms:
            clip = t(clip)
        return clip


def _pil_frames(clip):
    return [Image.fromarray(f) for f in clip]


def _np_frames(frames):
    return np.stack([np.asarray(f) for f in frames])


class Resize:
    """Shorter-side (int size) or exact (h, w) resize; 'nearest' default matches
    the reference (video_transform.py:171-189)."""

    def __init__(self, size, interpolation="nearest"):
        self.size = size
        self.resample = {"nearest": Image.NEAREST, "bilinear": Image.BILINEAR,
                         "bicubic": Image.BICUBIC}[interpolation]

    def __call__(self, clip):
        h, w = clip.shape[1:3]
        if isinstance(self.size, numbers.Number):
            size = int(self.size)
            if (w <= h and w == size) or (h <= w and h == size):
                return clip
            if w < h:
                ow, oh = size, int(size * h / w)
            else:
                oh, ow = size, int(size * w / h)
        else:
            oh, ow = self.size
        return _np_frames(f.resize((ow, oh), self.resample) for f in _pil_frames(clip))


class RandomResize:
    def __init__(self, ratio=(3.0 / 4.0, 4.0 / 3.0), interpolation="nearest"):
        self.ratio = ratio
        self.interpolation = interpolation

    def __call__(self, clip):
        scale = _random.uniform(*self.ratio)
        h, w = clip.shape[1:3]
        return Resize((int(h * scale), int(w * scale)),
                      self.interpolation)(clip)


class RandomCrop:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, numbers.Number) else size

    def __call__(self, clip):
        h, w = self.size
        ih, iw = clip.shape[1:3]
        if w > iw or h > ih:
            raise ValueError("crop larger than clip")
        y = _random.randint(0, ih - h)
        x = _random.randint(0, iw - w)
        return clip[:, y: y + h, x: x + w]


class CenterCrop:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, numbers.Number) else size

    def __call__(self, clip):
        h, w = self.size
        ih, iw = clip.shape[1:3]
        y = int(round((ih - h) / 2.0))
        x = int(round((iw - w) / 2.0))
        return clip[:, y: y + h, x: x + w]


class CornerCrop:
    """Crop one of 5 positions (4 corners + center), random if not fixed
    (reference video_transform.py:235-286)."""

    POSITIONS = ("c", "tl", "tr", "bl", "br")

    def __init__(self, size, crop_position=None):
        self.size = size
        self.crop_position = crop_position

    def __call__(self, clip):
        s = self.size
        ih, iw = clip.shape[1:3]
        pos = self.crop_position or _random.choice(self.POSITIONS)
        if pos == "c":
            y, x = (ih - s) // 2, (iw - s) // 2
        elif pos == "tl":
            y, x = 0, 0
        elif pos == "tr":
            y, x = 0, iw - s
        elif pos == "bl":
            y, x = ih - s, 0
        else:
            y, x = ih - s, iw - s
        return clip[:, y: y + s, x: x + s]


class RandomHorizontalFlip:
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, clip):
        if _random.random() < self.p:
            return clip[:, :, ::-1].copy()
        return clip


class RandomRotation:
    def __init__(self, degrees):
        if isinstance(degrees, numbers.Number):
            degrees = (-degrees, degrees)
        self.degrees = degrees

    def __call__(self, clip):
        angle = _random.uniform(*self.degrees)
        return _np_frames(f.rotate(angle) for f in _pil_frames(clip))


class ColorJitter:
    """Brightness/contrast/saturation/hue jitter, one sampled factor set per clip
    (reference video_transform.py:461-543)."""

    def __init__(self, brightness=0, contrast=0, saturation=0, hue=0,
                 rng=None):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue
        # Optional numpy Generator; module-level stdlib random otherwise
        # (keeps determinism when a caller injects its own rng).
        self.rng = rng

    def _uniform(self, lo, hi):
        if self.rng is not None:
            return float(self.rng.uniform(lo, hi))
        return _random.uniform(lo, hi)

    def _factor(self, amount):
        if amount <= 0:
            return None
        return self._uniform(max(0.0, 1 - amount), 1 + amount)

    def __call__(self, clip):
        b = self._factor(self.brightness)
        c = self._factor(self.contrast)
        s = self._factor(self.saturation)
        h = self._uniform(-self.hue, self.hue) if self.hue > 0 else None
        out = []
        for img in _pil_frames(clip):
            if b is not None:
                img = ImageEnhance.Brightness(img).enhance(b)
            if c is not None:
                img = ImageEnhance.Contrast(img).enhance(c)
            if s is not None:
                img = ImageEnhance.Color(img).enhance(s)
            if h is not None:
                hsv = np.asarray(img.convert("HSV")).copy()
                hsv[..., 0] = (hsv[..., 0].astype(np.int16)
                               + int(h * 255)) % 256
                img = Image.fromarray(hsv, "HSV").convert("RGB")
            out.append(img)
        return _np_frames(out)


class ClipToTensor:
    """[T, H, W, C] uint8 -> [T, C, H, W] float in [0, 1] (reference :24-75
    returns [C, T, H, W]; callers here use the frame-major layout the models
    consume — permuted once, not per transform)."""

    def __init__(self, div_255: bool = True):
        self.div_255 = div_255

    def __call__(self, clip):
        x = clip.astype(np.float32)
        if self.div_255:
            x = x / 255.0
        return x.transpose(0, 3, 1, 2)


class Normalize:
    def __init__(self, mean=IMAGENET_MEAN, std=IMAGENET_STD):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def __call__(self, clip):
        return (clip - self.mean[:, None, None]) / self.std[:, None, None]
