"""Cosine similarity matrix between two embedding sets.

Behavioral contract: reference v2/model/model_dist_TVTSv2_ViT_B_16.py:119-127
(`sim_matrix`): rows/cols are L2-normalized with the norm clamped below at `eps`
(norm replaced by max(norm, eps), not norm+eps).
"""

from __future__ import annotations

import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, eps: float = 1e-8, axis: int = -1) -> jnp.ndarray:
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def sim_matrix(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """[N, D] x [M, D] -> [N, M] cosine similarities."""
    a_norm = l2_normalize(a, eps)
    b_norm = l2_normalize(b, eps)
    return a_norm @ b_norm.T
