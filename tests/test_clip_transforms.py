import numpy as np
import pytest

from tvts_tpu.data import clip_transforms as CT


@pytest.fixture
def clip():
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, size=(3, 48, 64, 3)).astype(np.uint8)


def test_resize_shorter_side(clip):
    out = CT.Resize(24)(clip)
    assert out.shape == (3, 24, 32, 3)
    out2 = CT.Resize((20, 30))(clip)
    assert out2.shape == (3, 20, 30, 3)


def test_crops(clip):
    assert CT.RandomCrop(32)(clip).shape == (3, 32, 32, 3)
    c = CT.CenterCrop(32)(clip)
    np.testing.assert_array_equal(c, clip[:, 8:40, 16:48])
    for pos in CT.CornerCrop.POSITIONS:
        assert CT.CornerCrop(24, pos)(clip).shape == (3, 24, 24, 3)
    np.testing.assert_array_equal(CT.CornerCrop(24, "tl")(clip),
                                  clip[:, :24, :24])


def test_flip_and_rotation(clip):
    flipped = CT.RandomHorizontalFlip(p=1.0)(clip)
    np.testing.assert_array_equal(flipped, clip[:, :, ::-1])
    same = CT.RandomHorizontalFlip(p=0.0)(clip)
    np.testing.assert_array_equal(same, clip)
    rot = CT.RandomRotation(30)(clip)
    assert rot.shape == clip.shape


def test_color_jitter_consistent_across_frames():
    base = np.full((4, 16, 16, 3), 100, dtype=np.uint8)
    out = CT.ColorJitter(brightness=0.5, contrast=0.5, saturation=0.5, hue=0.1)(base)
    assert out.shape == base.shape
    for f in out[1:]:
        np.testing.assert_array_equal(out[0], f)  # same factors per clip


def test_to_tensor_and_normalize(clip):
    t = CT.ClipToTensor()(clip)
    assert t.shape == (3, 3, 48, 64)
    assert t.max() <= 1.0
    n = CT.Normalize()(t)
    assert np.isfinite(n).all()


def test_compose(clip):
    pipe = CT.Compose([CT.Resize(32), CT.CenterCrop(32), CT.ClipToTensor(),
                       CT.Normalize()])
    out = pipe(clip)
    assert out.shape == (3, 3, 32, 32)
