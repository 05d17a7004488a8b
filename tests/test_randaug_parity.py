"""timm-grade RandAugment parity vs the reference rand_augment module:
config-string parsing, level->arg mappings, and per-op image outputs."""

import numpy as np
import pytest
from PIL import Image

from tests.conftest import has_reference, load_reference_module
from tvts_tpu.downstream import randaug as RA

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref():
    return load_reference_module("v1/downstream/rand_augment.py", "ref_randaug")


class _PosRng:
    """Stub rng whose random() never triggers negation/prob-skips."""

    def random(self):
        return 0.0

    def integers(self, n):
        return 0

    def normal(self, mu, std):
        return mu


def _img():
    rng = np.random.default_rng(0)
    return Image.fromarray(rng.integers(0, 256, size=(64, 48, 3), dtype=np.uint8))


def test_config_string_parity(ref):
    for cfg_str in ("rand-m7-n4-mstd0.5-inc1", "rand-m9-n3-mstd0.5",
                    "rand-mstd1-w0", "rand-m5-n2-inc1"):
        theirs = ref.rand_augment_transform(cfg_str, {})
        ours = RA.rand_augment_transform(cfg_str)
        assert ours.num_ops == theirs.num_layers
        their_names = []
        for op in theirs.ops:
            # reference AugmentOp doesn't store the name; recover via fn+level_fn
            for name in ref.NAME_TO_OP:
                if ref.NAME_TO_OP[name] is op.aug_fn and \
                        ref.LEVEL_TO_ARG[name] is op.level_fn:
                    their_names.append(name)
                    break
        assert [o.name for o in ours.ops] == their_names
        assert [o.magnitude for o in ours.ops] == \
            [o.magnitude for o in theirs.ops]
        assert [o.magnitude_std for o in ours.ops] == \
            [o.magnitude_std for o in theirs.ops]
        if ours.choice_weights is None:
            assert theirs.choice_weights is None
        else:
            np.testing.assert_allclose(ours.choice_weights,
                                       theirs.choice_weights)


def test_level_to_arg_parity(ref, monkeypatch):
    # neutralize reference negation (random.random() > 0.5 -> False keeps +v)
    monkeypatch.setattr(ref.random, "random", lambda: 0.0)
    pos = _PosRng()
    hp = dict(RA._HPARAMS_DEFAULT)
    for name, (_, level_fn, _) in RA.OPS.items():
        ref_fn = ref.LEVEL_TO_ARG[name]
        for level in (0.0, 2.5, 5.0, 7.0, 10.0):
            want = ref_fn(level, hp) if ref_fn else ()
            got = level_fn(level, hp, pos) if level_fn else ()
            assert got == want, f"{name} at level {level}: {got} != {want}"


def test_op_image_parity(ref):
    img = _img()
    kw = {"fillcolor": RA._FILL, "resample": Image.BILINEAR}
    cases = {
        "AutoContrast": (), "Equalize": (), "Invert": (),
        "Rotate": (17.3,), "Posterize": (2,), "Solarize": (77,),
        "SolarizeAdd": (45,), "Color": (1.4,), "Contrast": (0.3,),
        "Brightness": (1.7,), "Sharpness": (0.6,), "ShearX": (0.21,),
        "ShearY": (-0.13,), "TranslateX": (11.0,), "TranslateY": (-7.0,),
        "TranslateXRel": (0.2,), "TranslateYRel": (-0.3,),
    }
    for name, args in cases.items():
        ours_fn, _, geometric = RA.OPS[name]
        theirs_fn = ref.NAME_TO_OP[name]
        okw = kw if geometric else {}
        got = np.asarray(ours_fn(img, *args, **okw))
        want = np.asarray(theirs_fn(img, *args, **dict(kw)))
        np.testing.assert_array_equal(got, want, err_msg=name)


def test_clip_consistency_and_shapes():
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(4, 32, 32, 3), dtype=np.uint8)
    aug = RA.rand_augment_transform("rand-m7-n4-mstd0.5-inc1",
                                    rng=np.random.default_rng(5))
    out = aug(frames)
    assert out.shape == frames.shape and out.dtype == np.uint8
    # geometric ops must use identical args across frames: augment a clip of
    # IDENTICAL frames and require identical outputs
    same = np.repeat(frames[:1], 4, axis=0)
    out2 = RA.rand_augment_transform(
        "rand-m9-n4-mstd0.5-inc1", rng=np.random.default_rng(7))(same)
    assert (out2 == out2[0]).all()
