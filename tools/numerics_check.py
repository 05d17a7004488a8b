#!/usr/bin/env python
"""On-chip numerics band of the fused extraction path vs model.apply.

Runs the bench configuration (kv7 d-major tower + v9 space + CLS-only tail
+ mm_group) and the XLA model.apply on the SAME inputs at B/16 full shape,
both bf16 on the TPU, and prints max|diff| on mean|out| — the band PERF.md
tracks per round (0.031-0.039 across v1/v2/v4/v7/v9).

Env: B (default 8), MMG (default auto), SFPP (default 3), ARCH (b_16).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tvts_tpu.models import tvtsv2_b_16, tvtsv2_h_14
from tvts_tpu.models.space_time_vit import SpaceTimeViT
from tvts_tpu.ops.fused_forward import space_time_vit_fused_forward


def main():
    arch = os.environ.get("ARCH", "b_16")
    cfg = (tvtsv2_h_14() if arch == "h_14" else tvtsv2_b_16()).vision
    B = int(os.environ.get("B", 8))
    mmg = int(os.environ.get("MMG", "0")) or None
    sfpp = int(os.environ.get("SFPP", "3")) or None

    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(
        size=(B, cfg.num_frames, 3, cfg.input_resolution,
              cfg.input_resolution)).astype(np.float32))
    model = SpaceTimeViT(cfg, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), video)["params"]

    want, _ = jax.jit(lambda p, v: model.apply({"params": p}, v))(
        params, video)
    got, _ = jax.jit(lambda p, v: space_time_vit_fused_forward(
        p, cfg, v, kernel_version=7, space_fpp=sfpp, mm_group=mmg,
        need_tokens=False))(params, video)
    w = np.asarray(want.astype(jnp.float32))
    g = np.asarray(got.astype(jnp.float32))
    print(f"arch={arch} B={B} mmg={mmg} sfpp={sfpp}: "
          f"max|diff|={np.abs(g - w).max():.5f} "
          f"mean|out|={np.abs(w).mean():.4f}", flush=True)


if __name__ == "__main__":
    main()
