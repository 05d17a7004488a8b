import numpy as np
import pytest

from tvts_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    extract_transform,
    preprocess_on_device,
    video_transform,
)


def test_device_preprocess_matches_host_normalize_when_presized():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(2, 3, 224, 224, 3)).astype(np.uint8)
    import jax.numpy as jnp

    out = np.asarray(preprocess_on_device(jnp.asarray(frames), crop_size=224))
    want = (frames.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    want = want.transpose(0, 1, 4, 2, 3)
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_device_preprocess_resize_crop_shapes():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(1, 2, 360, 480, 3)).astype(np.uint8)
    import jax.numpy as jnp

    out = np.asarray(preprocess_on_device(jnp.asarray(frames), crop_size=224))
    assert out.shape == (1, 2, 3, 224, 224)
    assert np.isfinite(out).all()


def test_host_video_transform_properties():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, size=(3, 360, 480, 3)).astype(np.uint8)
    out = video_transform(frames, crop_size=224, mode="test")
    assert out.shape == (3, 3, 224, 224)
    # center crop is deterministic
    out2 = video_transform(frames, crop_size=224, mode="test")
    np.testing.assert_array_equal(out, out2)
    # train random crop differs across rngs
    a = video_transform(frames, crop_size=224, mode="train",
                        rng=np.random.default_rng(0))
    b = video_transform(frames, crop_size=224, mode="train",
                        rng=np.random.default_rng(5))
    assert not np.array_equal(a, b)


def test_extract_transform():
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, size=(12, 240, 320, 3)).astype(np.uint8)
    out = extract_transform(frames, size=224)
    assert out.shape == (12, 3, 224, 224)
