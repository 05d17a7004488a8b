"""Fused Pallas attention vs the XLA reference path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tvts_tpu.ops.attention import divided_space_time_attention
from tvts_tpu.ops.pallas_attention import divided_space_time_attention_fused


@pytest.mark.parametrize("mode", ["space", "time"])
def test_fused_matches_xla(mode):
    rng = np.random.default_rng(0)
    B, H, T, N, d = 2, 2, 4, 16, 8
    S = 1 + T * N
    q = jnp.asarray(rng.normal(size=(B, H, S, d)).astype(np.float32)) * 0.35
    k = jnp.asarray(rng.normal(size=(B, H, S, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, S, d)).astype(np.float32))

    want = np.asarray(divided_space_time_attention(q, k, v, T, N, mode))
    got = np.asarray(divided_space_time_attention_fused(q, k, v, T, N, mode,
                                                        interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
