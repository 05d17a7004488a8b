#!/usr/bin/env python
"""On-chip numerics band for the fused text / sort kernels (round 5).

Compares the fused Pallas text tower (text_transformer_fused_forward) and
sort head (sort_transformer_fused_forward) against the XLA module forward
at real B/16 shapes in bf16 on the TPU — the same protocol as
tools/numerics_check.py for the video tower. Prints max|diff| / mean|ref|.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tvts_tpu.models import TVTSv2, tvtsv2_b_16
from tvts_tpu.models.factory import init_params
from tvts_tpu.ops.pallas_text_attention import (
    sort_transformer_fused_forward,
    text_transformer_fused_forward,
)


def main():
    cfg = tvtsv2_b_16()
    model = TVTSv2(cfg, dtype=jnp.bfloat16)
    params = init_params(model, cfg)
    rng = np.random.default_rng(0)
    B = 20
    ids = np.concatenate([
        np.full((cfg.num_clips * B, 1), 49406, np.int32),
        rng.integers(1, 49000, size=(cfg.num_clips * B, 75)).astype(np.int32),
        np.full((cfg.num_clips * B, 1), 49407, np.int32)], axis=1)
    ids = jnp.asarray(ids)

    want = jax.jit(lambda p, t: model.apply(
        {"params": p}, t, method=lambda m, tt: m.compute_text(tt)))(params, ids)
    got = jax.jit(lambda p, t: text_transformer_fused_forward(
        p["text_model"], cfg.text, t))(params, ids)
    d = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    print(f"text : max|diff| {d.max():.5f} on mean|ref| "
          f"{np.abs(np.asarray(want, np.float32)).mean():.4f}")

    S = 1 + cfg.vision.num_frames * cfg.vision.n_keep
    tokens = jnp.asarray(rng.normal(size=(B, S, cfg.vision.output_dim))
                         .astype(np.float32)).astype(jnp.bfloat16)
    st = jnp.asarray(rng.normal(size=(B, cfg.num_clips, cfg.text.output_dim))
                     .astype(np.float32)).astype(jnp.bfloat16)
    want = jax.jit(lambda p, a, b: model.apply(
        {"params": p}, a, b, method=lambda m, x, y: m.pred_model(x, y)))(
        params, st, tokens)
    got = jax.jit(lambda p, a, b: sort_transformer_fused_forward(
        p["pred_model"], cfg.sort, a, b))(params, st, tokens)
    d = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    print(f"sort : max|diff| {d.max():.5f} on mean|ref| "
          f"{np.abs(np.asarray(want, np.float32)).mean():.4f}")


if __name__ == "__main__":
    main()
