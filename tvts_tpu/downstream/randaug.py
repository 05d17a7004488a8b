"""timm-grade RandAugment for video clips (PIL-based, clip-consistent).

Behavioral contract: reference v1/downstream/rand_augment.py (timm
auto_augment lineage) as used by the VideoMAE fine-tune recipe
(`rand-m7-n4-mstd0.5-inc1`):

- full 24-op surface (LEVEL_TO_ARG, reference :281-306): the 15-op standard
  set `_RAND_TRANSFORMS` (:400-416) and the increasing-severity set
  `_RAND_INCREASING_TRANSFORMS` (:419-435) selected by `-incN`
- AugmentOp semantics (:337-397): per-op apply probability 0.5, gaussian
  magnitude jitter (`mstd`), clamp to [0, _MAX_LEVEL], one magnitude sampled
  per CLIP with the same op+args applied to every frame
- config-string parser `rand_augment_transform` (:481-531): `rand-m<int>`
  `-n<int>` `-w<int>` `-mstd<float>` `-inc<bool>`
- weighted op choice `_RAND_CHOICE_WEIGHTS_0` for `-w0` (:437-450)

Deviations (documented): randomness comes from an injectable
`np.random.Generator` instead of the global `random` module (determinism for
tests/workers), and the BILINEAR/BICUBIC interpolation choice for geometric
ops is sampled once per op application instead of once per frame (the
reference resamples per frame, making frames of one clip disagree — treated
as a quirk, not a contract).
"""

from __future__ import annotations

import re

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

_MAX_LEVEL = 10.0
_FILL = (128, 128, 128)
_HPARAMS_DEFAULT = {"translate_const": 250, "img_mean": _FILL}
_RANDOM_INTERPOLATION = (Image.BILINEAR, Image.BICUBIC)


# --- op implementations (img, *args, fillcolor=, resample=) ---------------

def _shear_x(img, factor, **kw):
    return img.transform(img.size, Image.AFFINE, (1, factor, 0, 0, 1, 0), **kw)


def _shear_y(img, factor, **kw):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, factor, 1, 0), **kw)


def _translate_x_abs(img, pixels, **kw):
    return img.transform(img.size, Image.AFFINE, (1, 0, pixels, 0, 1, 0), **kw)


def _translate_y_abs(img, pixels, **kw):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, pixels), **kw)


def _translate_x_rel(img, pct, **kw):
    return _translate_x_abs(img, pct * img.size[0], **kw)


def _translate_y_rel(img, pct, **kw):
    return _translate_y_abs(img, pct * img.size[1], **kw)


def _rotate(img, degrees, **kw):
    return img.rotate(degrees, **kw)


def _auto_contrast(img, **__):
    return ImageOps.autocontrast(img)


def _invert(img, **__):
    return ImageOps.invert(img)


def _equalize(img, **__):
    return ImageOps.equalize(img)


def _solarize(img, thresh, **__):
    return ImageOps.solarize(img, thresh)


def _solarize_add(img, add, thresh=128, **__):
    lut = [min(255, i + add) if i < thresh else i for i in range(256)]
    if img.mode in ("L", "RGB"):
        return img.point(lut * 3 if img.mode == "RGB" else lut)
    return img


def _posterize(img, bits_to_keep, **__):
    if bits_to_keep >= 8:
        return img
    return ImageOps.posterize(img, bits_to_keep)


def _enhance(enhancer):
    def fn(img, factor, **__):
        return enhancer(img).enhance(factor)
    return fn


# --- level -> op-arg mappings (reference :200-306) -------------------------

def _neg(rng, v):
    return -v if rng.random() > 0.5 else v


def _rotate_arg(level, hp, rng):
    return (_neg(rng, (level / _MAX_LEVEL) * 30.0),)


def _enhance_arg(level, hp, rng):
    return ((level / _MAX_LEVEL) * 1.8 + 0.1,)


def _enhance_increasing_arg(level, hp, rng):
    return (1.0 + _neg(rng, (level / _MAX_LEVEL) * 0.9),)


def _shear_arg(level, hp, rng):
    return (_neg(rng, (level / _MAX_LEVEL) * 0.3),)


def _translate_abs_arg(level, hp, rng):
    return (_neg(rng, (level / _MAX_LEVEL) * float(hp["translate_const"])),)


def _translate_rel_arg(level, hp, rng):
    return (_neg(rng, (level / _MAX_LEVEL) * hp.get("translate_pct", 0.45)),)


def _posterize_arg(level, hp, rng):
    return (int((level / _MAX_LEVEL) * 4),)


def _posterize_increasing_arg(level, hp, rng):
    return (4 - _posterize_arg(level, hp, rng)[0],)


def _posterize_original_arg(level, hp, rng):
    return (int((level / _MAX_LEVEL) * 4) + 4,)


def _solarize_arg(level, hp, rng):
    return (int((level / _MAX_LEVEL) * 256),)


def _solarize_increasing_arg(level, hp, rng):
    return (256 - _solarize_arg(level, hp, rng)[0],)


def _solarize_add_arg(level, hp, rng):
    return (int((level / _MAX_LEVEL) * 110),)


OPS = {
    # name: (fn, level_fn, geometric)
    "AutoContrast": (_auto_contrast, None, False),
    "Equalize": (_equalize, None, False),
    "Invert": (_invert, None, False),
    "Rotate": (_rotate, _rotate_arg, True),
    "Posterize": (_posterize, _posterize_arg, False),
    "PosterizeIncreasing": (_posterize, _posterize_increasing_arg, False),
    "PosterizeOriginal": (_posterize, _posterize_original_arg, False),
    "Solarize": (_solarize, _solarize_arg, False),
    "SolarizeIncreasing": (_solarize, _solarize_increasing_arg, False),
    "SolarizeAdd": (_solarize_add, _solarize_add_arg, False),
    "Color": (_enhance(ImageEnhance.Color), _enhance_arg, False),
    "ColorIncreasing": (_enhance(ImageEnhance.Color), _enhance_increasing_arg, False),
    "Contrast": (_enhance(ImageEnhance.Contrast), _enhance_arg, False),
    "ContrastIncreasing": (_enhance(ImageEnhance.Contrast), _enhance_increasing_arg, False),
    "Brightness": (_enhance(ImageEnhance.Brightness), _enhance_arg, False),
    "BrightnessIncreasing": (_enhance(ImageEnhance.Brightness), _enhance_increasing_arg, False),
    "Sharpness": (_enhance(ImageEnhance.Sharpness), _enhance_arg, False),
    "SharpnessIncreasing": (_enhance(ImageEnhance.Sharpness), _enhance_increasing_arg, False),
    "ShearX": (_shear_x, _shear_arg, True),
    "ShearY": (_shear_y, _shear_arg, True),
    "TranslateX": (_translate_x_abs, _translate_abs_arg, True),
    "TranslateY": (_translate_y_abs, _translate_abs_arg, True),
    "TranslateXRel": (_translate_x_rel, _translate_rel_arg, True),
    "TranslateYRel": (_translate_y_rel, _translate_rel_arg, True),
}

RAND_TRANSFORMS = [
    "AutoContrast", "Equalize", "Invert", "Rotate", "Posterize", "Solarize",
    "SolarizeAdd", "Color", "Contrast", "Brightness", "Sharpness", "ShearX",
    "ShearY", "TranslateXRel", "TranslateYRel",
]

RAND_INCREASING_TRANSFORMS = [
    "AutoContrast", "Equalize", "Invert", "Rotate", "PosterizeIncreasing",
    "SolarizeIncreasing", "SolarizeAdd", "ColorIncreasing",
    "ContrastIncreasing", "BrightnessIncreasing", "SharpnessIncreasing",
    "ShearX", "ShearY", "TranslateXRel", "TranslateYRel",
]

_RAND_CHOICE_WEIGHTS_0 = {
    "Rotate": 0.3, "ShearX": 0.2, "ShearY": 0.2, "TranslateXRel": 0.1,
    "TranslateYRel": 0.1, "Color": 0.025, "Sharpness": 0.025,
    "AutoContrast": 0.025, "Solarize": 0.005, "SolarizeAdd": 0.005,
    "Contrast": 0.005, "Brightness": 0.005, "Equalize": 0.005,
    "Posterize": 0, "Invert": 0,
}


class AugmentOp:
    """One augmentation with probability gate + jittered magnitude, applied
    with identical args to every frame of a clip (reference :337-397)."""

    def __init__(self, name: str, prob: float = 0.5, magnitude: float = 10,
                 hparams: dict | None = None):
        hp = dict(_HPARAMS_DEFAULT, **(hparams or {}))
        self.name = name
        self.fn, self.level_fn, self.geometric = OPS[name]
        self.prob = prob
        self.magnitude = magnitude
        self.hparams = hp
        self.fill = hp.get("img_mean", _FILL)
        self.interpolation = hp.get("interpolation", _RANDOM_INTERPOLATION)
        self.magnitude_std = hp.get("magnitude_std", 0)

    def __call__(self, frames, rng: np.random.Generator):
        if self.prob < 1.0 and rng.random() > self.prob:
            return frames
        magnitude = self.magnitude
        if self.magnitude_std and self.magnitude_std > 0:
            magnitude = rng.normal(magnitude, self.magnitude_std)
        magnitude = min(_MAX_LEVEL, max(0.0, magnitude))
        args = (self.level_fn(magnitude, self.hparams, rng)
                if self.level_fn is not None else ())
        kw = {}
        if self.geometric:
            resample = self.interpolation
            if isinstance(resample, (list, tuple)):
                resample = resample[int(rng.integers(len(resample)))]
            kw = {"fillcolor": self.fill, "resample": resample}
        if isinstance(frames, list):
            return [self.fn(img, *args, **kw) for img in frames]
        return self.fn(frames, *args, **kw)


def rand_augment_ops(magnitude: float = 10, hparams: dict | None = None,
                     transforms: list[str] | None = None) -> list[AugmentOp]:
    transforms = transforms or RAND_TRANSFORMS
    return [AugmentOp(name, prob=0.5, magnitude=magnitude, hparams=hparams)
            for name in transforms]


def _select_rand_weights(weight_idx: int = 0, transforms=None) -> np.ndarray:
    transforms = transforms or RAND_TRANSFORMS
    assert weight_idx == 0, "only weight set 0 exists (reference :444-450)"
    probs = np.array([_RAND_CHOICE_WEIGHTS_0[k] for k in transforms], float)
    return probs / probs.sum()


class RandAugment:
    """Apply `num_ops` randomly chosen AugmentOps to a clip.

    Constructable either from explicit ops (timm-style) or the legacy
    (num_ops, magnitude, mag_std) signature used by cls_dataset."""

    def __init__(self, ops: list[AugmentOp] | None = None, num_ops: int = 2,
                 magnitude: float = 10, mag_std: float = 0.5,
                 choice_weights: np.ndarray | None = None,
                 rng: np.random.Generator | None = None):
        if ops is None:
            ops = rand_augment_ops(
                magnitude=magnitude, hparams={"magnitude_std": mag_std})
        self.ops = ops
        self.num_ops = num_ops
        self.choice_weights = choice_weights
        self.rng = rng or np.random.default_rng()

    def _apply(self, frames):
        idx = self.rng.choice(
            len(self.ops), size=self.num_ops,
            replace=self.choice_weights is None, p=self.choice_weights)
        for i in idx:
            frames = self.ops[int(i)](frames, self.rng)
        return frames

    def __call__(self, frames):
        """list[PIL] -> list[PIL], or [T, H, W, 3] uint8 -> same."""
        if isinstance(frames, list):
            return self._apply(frames)
        imgs = [Image.fromarray(f) for f in frames]
        return np.stack([np.asarray(i) for i in self._apply(imgs)])


def rand_augment_transform(config_str: str, hparams: dict | None = None,
                           rng: np.random.Generator | None = None) -> RandAugment:
    """Parse 'rand-m7-n4-mstd0.5-inc1' into a RandAugment (reference :481-531)."""
    hparams = dict(hparams or {})
    magnitude = _MAX_LEVEL
    num_layers = 2
    weight_idx = None
    transforms = RAND_TRANSFORMS
    config = config_str.split("-")
    assert config[0] == "rand", f"unknown augment scheme {config[0]!r}"
    for c in config[1:]:
        cs = re.split(r"(\d.*)", c)
        if len(cs) < 2:
            continue
        key, val = cs[:2]
        if key == "mstd":
            hparams.setdefault("magnitude_std", float(val))
        elif key == "inc":
            if bool(int(val)):
                transforms = RAND_INCREASING_TRANSFORMS
        elif key == "m":
            magnitude = int(val)
        elif key == "n":
            num_layers = int(val)
        elif key == "w":
            weight_idx = int(val)
        else:
            raise NotImplementedError(f"unknown RandAugment key {key!r}")
    ops = rand_augment_ops(magnitude=magnitude, hparams=hparams,
                           transforms=transforms)
    weights = (None if weight_idx is None
               else _select_rand_weights(weight_idx, transforms))
    return RandAugment(ops=ops, num_ops=num_layers, choice_weights=weights,
                       rng=rng)
