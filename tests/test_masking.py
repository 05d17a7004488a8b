import jax.numpy as jnp
import numpy as np

from tvts_tpu.ops.masking import gather_tube_tokens, make_tube_keep_indices, n_keep_patches


def test_n_keep():
    assert n_keep_patches(196, 0.5) == 98
    assert n_keep_patches(196, 0.0) == 196
    assert n_keep_patches(256, 0.7) == 76  # H/14 config


def test_keep_indices_unique_and_in_range():
    rng = np.random.default_rng(0)
    ki = make_tube_keep_indices(196, 0.5, rng=rng)
    assert ki.shape == (98,)
    assert len(set(ki.tolist())) == 98
    assert ki.min() >= 0 and ki.max() < 196

    kb = make_tube_keep_indices(196, 0.5, rng=rng, batch=4)
    assert kb.shape == (4, 98)


def test_gather_matches_numpy_fancy_indexing():
    rng = np.random.default_rng(1)
    B, T, N, D = 3, 4, 16, 8
    x = rng.normal(size=(B, T, N, D)).astype(np.float32)
    keep = make_tube_keep_indices(N, 0.5, rng=rng, batch=B)
    got = np.asarray(gather_tube_tokens(jnp.asarray(x), jnp.asarray(keep)))
    # reference semantics (video_encoder_ViT_B_16.py:200-216): same spatial keep set
    # applied to every frame of an example
    want = np.stack([x[b][:, keep[b]] for b in range(B)])
    np.testing.assert_allclose(got, want)
