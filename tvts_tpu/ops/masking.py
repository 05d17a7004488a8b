"""Tube masking: drop a random subset of spatial patch positions, shared across time.

Behavioral contract: reference v2/base/base_dataset.py:133-138 (host-side keep-index
generation, one permutation per example) and v2/model/video_encoder_ViT_B_16.py:200-216
(the in-model gather that applies the same spatial keep set to every frame).

TPU-first notes: the gather runs on device as a batched `take_along_axis` over a
statically-shaped `[B, T, N, D]` token array — `n_keep` is static (mask ratio is a
model-config constant), so XLA compiles a single dynamic-gather with no retracing.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def n_keep_patches(patches_per_frame: int, mask_ratio: float) -> int:
    return int(patches_per_frame * (1.0 - mask_ratio))


def make_tube_keep_indices(
    patches_per_frame: int,
    mask_ratio: float,
    rng: np.random.Generator | None = None,
    batch: int | None = None,
) -> np.ndarray:
    """Host-side random keep indices: first `n_keep` entries of a permutation.

    Returns [n_keep] int32, or [batch, n_keep] if `batch` is given.
    """
    if rng is None:
        rng = np.random.default_rng()
    n_keep = n_keep_patches(patches_per_frame, mask_ratio)
    if batch is None:
        return rng.permutation(patches_per_frame)[:n_keep].astype(np.int32)
    return np.stack(
        [rng.permutation(patches_per_frame)[:n_keep] for _ in range(batch)]
    ).astype(np.int32)


def gather_tube_tokens(x_patch: jnp.ndarray, keep_ind: jnp.ndarray) -> jnp.ndarray:
    """Apply a per-example spatial keep set to every frame.

    x_patch:  [B, T, N, D] patch tokens (post positional-embedding add)
    keep_ind: [B, n_keep] int indices into the N axis

    Returns [B, T, n_keep, D].
    """
    b, t, n, d = x_patch.shape
    idx = keep_ind[:, None, :, None]  # [B, 1, n_keep, 1]
    return jnp.take_along_axis(x_patch, idx, axis=2)
