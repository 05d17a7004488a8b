"""RandAugment for video clips (PIL-based, applied consistently across frames).

Behavioral contract: reference v1/downstream/rand_augment.py (timm-lineage
RandAugment, 531 LoC) as used by the VideoMAE fine-tune aug stack
(`create_random_augment` with config like 'rand-m7-n4-mstd0.5-inc1'): N ops
sampled per clip, each with magnitude M (std jitter), the SAME op+magnitude
applied to every frame of the clip. The standard 15-op set is implemented with
PIL ImageOps/ImageEnhance.
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

_MAX_LEVEL = 10.0
_FILL = (128, 128, 128)


def _rotate(img, mag):
    return img.rotate(mag, fillcolor=_FILL)


def _shear_x(img, mag):
    return img.transform(img.size, Image.AFFINE, (1, mag, 0, 0, 1, 0),
                         fillcolor=_FILL)


def _shear_y(img, mag):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, mag, 1, 0),
                         fillcolor=_FILL)


def _translate_x(img, mag):
    return img.transform(img.size, Image.AFFINE,
                         (1, 0, mag * img.size[0], 0, 1, 0), fillcolor=_FILL)


def _translate_y(img, mag):
    return img.transform(img.size, Image.AFFINE,
                         (1, 0, 0, 0, 1, mag * img.size[1]), fillcolor=_FILL)


OPS = {
    "AutoContrast": (lambda img, m: ImageOps.autocontrast(img), None),
    "Equalize": (lambda img, m: ImageOps.equalize(img), None),
    "Invert": (lambda img, m: ImageOps.invert(img), None),
    "Rotate": (_rotate, lambda lvl: (lvl / _MAX_LEVEL) * 30.0),
    "Posterize": (lambda img, m: ImageOps.posterize(img, int(m)),
                  lambda lvl: 4 - (lvl / _MAX_LEVEL) * 4),
    "Solarize": (lambda img, m: ImageOps.solarize(img, int(m)),
                 lambda lvl: 256 - (lvl / _MAX_LEVEL) * 256),
    "SolarizeAdd": (lambda img, m: _solarize_add(img, int(m)),
                    lambda lvl: (lvl / _MAX_LEVEL) * 110),
    "Color": (lambda img, m: ImageEnhance.Color(img).enhance(m),
              lambda lvl: 1.0 + (lvl / _MAX_LEVEL) * 0.9),
    "Contrast": (lambda img, m: ImageEnhance.Contrast(img).enhance(m),
                 lambda lvl: 1.0 + (lvl / _MAX_LEVEL) * 0.9),
    "Brightness": (lambda img, m: ImageEnhance.Brightness(img).enhance(m),
                   lambda lvl: 1.0 + (lvl / _MAX_LEVEL) * 0.9),
    "Sharpness": (lambda img, m: ImageEnhance.Sharpness(img).enhance(m),
                  lambda lvl: 1.0 + (lvl / _MAX_LEVEL) * 0.9),
    "ShearX": (_shear_x, lambda lvl: (lvl / _MAX_LEVEL) * 0.3),
    "ShearY": (_shear_y, lambda lvl: (lvl / _MAX_LEVEL) * 0.3),
    "TranslateX": (_translate_x, lambda lvl: (lvl / _MAX_LEVEL) * 0.45),
    "TranslateY": (_translate_y, lambda lvl: (lvl / _MAX_LEVEL) * 0.45),
}

_SIGNED = {"Rotate", "ShearX", "ShearY", "TranslateX", "TranslateY",
           "Color", "Contrast", "Brightness", "Sharpness"}


def _solarize_add(img, add, thresh=128):
    arr = np.asarray(img).astype(np.int32)
    arr = np.where(arr < thresh, np.clip(arr + add, 0, 255), arr)
    return Image.fromarray(arr.astype(np.uint8))


class RandAugment:
    def __init__(self, num_ops: int = 4, magnitude: float = 7,
                 mag_std: float = 0.5, rng: np.random.Generator | None = None):
        self.num_ops = num_ops
        self.magnitude = magnitude
        self.mag_std = mag_std
        self.rng = rng or np.random.default_rng()
        self.op_names = list(OPS)

    def _sample_ops(self):
        chosen = self.rng.choice(len(self.op_names), size=self.num_ops)
        plan = []
        for ci in chosen:
            name = self.op_names[int(ci)]
            fn, level_fn = OPS[name]
            lvl = self.magnitude
            if self.mag_std > 0:
                lvl = float(np.clip(self.rng.normal(lvl, self.mag_std), 0, _MAX_LEVEL))
            mag = level_fn(lvl) if level_fn else None
            if name in _SIGNED and "enhance" in repr(fn):
                pass
            if mag is not None and name in _SIGNED and self.rng.random() < 0.5:
                if name in ("Color", "Contrast", "Brightness", "Sharpness"):
                    mag = 2.0 - mag  # mirror around identity 1.0
                else:
                    mag = -mag
            plan.append((fn, mag))
        return plan

    def __call__(self, frames: np.ndarray) -> np.ndarray:
        """[T, H, W, 3] uint8 -> same, with one sampled op sequence applied to all
        frames (clip-consistent, as in the reference video pipeline)."""
        plan = self._sample_ops()
        out = []
        for f in frames:
            img = Image.fromarray(f)
            for fn, mag in plan:
                img = fn(img, mag)
            out.append(np.asarray(img))
        return np.stack(out)
