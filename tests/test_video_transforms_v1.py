"""v1 downstream video_transforms functional API vs the reference torch
implementations (deterministic subset as oracles; RNG-driven ones by
contract)."""

import numpy as np
import pytest

from tests.conftest import has_reference, load_reference_module
from tvts_tpu.downstream import video_transforms as vt

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref():
    return load_reference_module("v1/downstream/video_transforms.py",
                                 "ref_v1_video_transforms")


@pytest.fixture()
def clip():
    rng = np.random.default_rng(0)
    return rng.uniform(size=(3, 3, 48, 64)).astype(np.float32)  # [T,C,H,W]


def test_uniform_crop_matches(ref, clip):
    import torch

    for idx in (0, 1, 2):
        got, _ = vt.uniform_crop(clip, 32, idx)
        want, _ = ref.uniform_crop(torch.from_numpy(clip), 32, idx)
        np.testing.assert_allclose(got, want.numpy(), atol=1e-6)


def test_grayscale_and_blend_match(ref, clip):
    import torch

    t = torch.from_numpy(clip)
    np.testing.assert_allclose(vt.grayscale(clip), ref.grayscale(t).numpy(),
                               atol=1e-6)
    other = clip[::-1].copy()
    np.testing.assert_allclose(
        vt.blend(clip, other, 0.3),
        ref.blend(t, torch.from_numpy(other), 0.3).numpy(), atol=1e-6)


def test_boxes_match(ref):
    import torch

    boxes = np.array([[5.0, 6.0, 40.0, 40.0], [0.0, 0.0, 70.0, 50.0]],
                     dtype=np.float32)
    np.testing.assert_allclose(
        vt.crop_boxes(boxes, 3, 4), ref.crop_boxes(boxes.copy(), 3, 4),
        atol=1e-6)
    np.testing.assert_allclose(
        vt.clip_boxes_to_image(boxes, 48, 64),
        ref.clip_boxes_to_image(boxes.copy(), 48, 64), atol=1e-6)
    assert torch is not None


def test_color_normalization_matches(ref, clip):
    import torch

    mean, std = [0.45, 0.45, 0.45], [0.225, 0.225, 0.225]
    got = vt.color_normalization(clip, mean, std)
    want = ref.color_normalization(torch.from_numpy(clip), mean, std)
    np.testing.assert_allclose(got, want.numpy(), atol=1e-6)


def test_random_crop_contract(clip):
    rng = np.random.default_rng(1)
    out, _ = vt.random_crop(clip, 32, rng=rng)
    assert out.shape == (3, 3, 32, 32)
    # crop is a spatial window: every output value comes from the input
    assert np.isin(out, clip).all()


def test_horizontal_flip_contract(clip):
    out, _ = vt.horizontal_flip(1.0, clip, rng=np.random.default_rng(0))
    np.testing.assert_allclose(out, clip[..., ::-1])
    boxes = np.array([[2.0, 3.0, 10.0, 20.0]], dtype=np.float32)
    _, fb = vt.horizontal_flip(1.0, clip, boxes=boxes,
                               rng=np.random.default_rng(0))
    np.testing.assert_allclose(fb[0], [64 - 10 - 1, 3, 64 - 2 - 1, 20])


def test_short_side_scale_jitter_contract(clip):
    out, _ = vt.random_short_side_scale_jitter(
        clip, 40, 40, rng=np.random.default_rng(0))
    assert min(out.shape[2], out.shape[3]) == 40
    assert out.shape[3] / out.shape[2] == pytest.approx(64 / 48, rel=0.05)


def test_random_resized_crop_shapes(clip):
    out = vt.random_resized_crop(clip, 32, 32, rng=np.random.default_rng(2))
    assert out.shape == (3, 3, 32, 32)
    out = vt.random_resized_crop_with_shift(clip, 32, 32,
                                            rng=np.random.default_rng(2))
    assert out.shape == (3, 3, 32, 32)


def test_three_crop(clip):
    out = vt.ThreeCrop(32)(clip)
    assert out.shape == (9, 3, 32, 32)
    # center crop present and equal to uniform_crop idx=1 after resize
    scale = 32 / 48
    resized = vt._interp_resize(clip, 32, int(round(64 * scale)))
    want_center, _ = vt.uniform_crop(resized, 32, 1)
    np.testing.assert_allclose(out[3:6], want_center, atol=1e-6)


def test_create_random_augment_runs():
    from PIL import Image

    frames = [Image.fromarray(np.full((32, 32, 3), 128, np.uint8))
              for _ in range(2)]
    aug = vt.create_random_augment(32, "rand-m7-n2-mstd0.5",
                                   rng=np.random.default_rng(0))
    out = aug(frames)
    assert len(out) == 2 and out[0].size == (32, 32)


def test_color_jitter_runs(clip):
    out = vt.color_jitter(clip, 0.4, 0.4, 0.4, rng=np.random.default_rng(3))
    assert out.shape == clip.shape and not np.allclose(out, clip)


def test_rrc_and_interpolation_get_params_matches(ref):
    """The crop-window sampler agrees with the reference's static
    get_params distributionally: identical fallback (degenerate scale) and
    in-range windows for the stochastic path."""
    from PIL import Image

    img = Image.fromarray(np.zeros((40, 60, 3), np.uint8))  # W=60, H=40
    # degenerate ranges force the deterministic central fallback
    i, j, h, w = ref.RandomResizedCropAndInterpolation.get_params(
        img, scale=(4.0, 4.0), ratio=(1.0, 1.0))
    ours = vt.RandomResizedCropAndInterpolation(
        (8, 8), scale=(4.0, 4.0), ratio=(1.0, 1.0),
        rng=np.random.default_rng(0))
    i2, j2, h2, w2 = ours.get_params(60, 40, np.random.default_rng(0))
    assert (i, j, h, w) == (i2, j2, h2, w2)

    t = vt.RandomResizedCropAndInterpolation(
        (16, 16), rng=np.random.default_rng(1))
    for _ in range(50):
        i, j, h, w = t.get_params(60, 40, np.random.default_rng(_))
        assert 0 <= i <= 40 - h and 0 <= j <= 60 - w and h > 0 and w > 0


def test_rrc_and_interpolation_call_shapes():
    from PIL import Image

    rng = np.random.default_rng(0)
    t = vt.RandomResizedCropAndInterpolation((16, 24), rng=rng,
                                             interpolation="random")
    img = Image.fromarray((np.arange(40 * 60 * 3) % 255).astype(
        np.uint8).reshape(40, 60, 3))
    out = t(img)
    assert out.size == (24, 16)  # PIL (W, H)
    # clip form: list of PIL -> list, consistent window
    outs = t([img, img, img])
    assert len(outs) == 3
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(outs[2]))
    # uint8 array clip form
    arr = np.stack([np.asarray(img)] * 2)
    out_arr = t(arr)
    assert out_arr.shape == (2, 16, 24, 3)
    assert "RandomResizedCropAndInterpolation" in repr(t)


@pytest.mark.parametrize("auto_augment", [None, "rand-m7-n2-mstd0.5-inc1"])
def test_transforms_imagenet_train_pipeline(auto_augment):
    from PIL import Image

    rng = np.random.default_rng(0)
    pipe = vt.transforms_imagenet_train(
        img_size=32, auto_augment=auto_augment, re_prob=0.5, re_mode="pixel",
        rng=rng)
    img = Image.fromarray(
        np.random.default_rng(1).integers(0, 255, (48, 56, 3)).astype(
            np.uint8))
    out = pipe(img)
    assert out.shape == (3, 32, 32) and out.dtype == np.float32
    # normalized output is roughly centered
    assert abs(float(out.mean())) < 3.0
    # clip input -> [T, C, H, W], spatially consistent primary stage
    clip = [img, img]
    out_clip = pipe(clip)
    assert out_clip.shape == (2, 3, 32, 32)


def test_transforms_imagenet_train_separate_stages():
    from PIL import Image

    rng = np.random.default_rng(0)
    primary, secondary, final = vt.transforms_imagenet_train(
        img_size=24, separate=True, rng=rng)
    img = Image.fromarray(np.full((40, 40, 3), 128, np.uint8))
    p = primary(img)
    assert p.size == (24, 24)
    s = secondary(p)
    out = final(s)
    assert out.shape == (3, 24, 24)


def test_transforms_imagenet_train_rejects_unknown_aa():
    with pytest.raises(NotImplementedError):
        vt.transforms_imagenet_train(auto_augment="augmix-m3")
