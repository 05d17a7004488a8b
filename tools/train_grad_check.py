#!/usr/bin/env python
"""REAL-shape gradient parity of the fused train path vs XLA, on the TPU.

The suite proves grad parity at toy widths in interpret mode
(tests/test_block_backward.py); this runs a full tower geometry (--arch: B/16
768x12L mask 0.5 default, or H/14 1280x32L d=80 mask 0.7) in bf16 on the
actual chip and compares loss + per-group gradient norms + worst relative
gradient error between the fused differentiable tower (Pallas fwd+bwd) and
the all-XLA apply.
B must stay small (<=8): the XLA backward stores the divided-attention probs.
"""

import argparse

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tvts_tpu.models import TVTSv2
from tvts_tpu.models.configs import MODEL_REGISTRY
from tvts_tpu.models.factory import init_params
from tvts_tpu.ops.fused_forward import make_fused_train_apply
from tvts_tpu.train.step import make_loss_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="TVTSv2_B_16",
                    choices=sorted(k for k in MODEL_REGISTRY
                                   if k.startswith("TVTSv2")))
    ap.add_argument("-B", "--batch", type=int,
                    default=int(os.environ.get("TB", 4)))
    args = ap.parse_args()
    B = args.batch
    cfg = MODEL_REGISTRY[args.arch]()
    model = TVTSv2(cfg, dtype=jnp.bfloat16)
    v = cfg.vision
    rng = np.random.default_rng(0)
    batch = {
        "video": jnp.asarray(rng.normal(
            size=(B, v.num_frames, 3, v.input_resolution,
                  v.input_resolution)).astype(np.float32)),
        "text_ids": jnp.asarray(np.concatenate([
            np.full((cfg.num_clips * B, 1), 49406, np.int32),
            rng.integers(1, 49000, size=(cfg.num_clips * B, 75))
            .astype(np.int32),
            np.full((cfg.num_clips * B, 1), 49407, np.int32)], axis=1)),
        "keep_ind": jnp.asarray(np.stack([
            rng.permutation(v.patches_per_frame)[: v.n_keep]
            for _ in range(B)]).astype(np.int32)),
        "labels": jnp.asarray(np.tile(np.arange(4), (B, 1)).astype(np.int32)),
    }
    params = init_params(model, cfg)

    from tvts_tpu.ops.kernel_config import resolve_kernel_config

    # per-arch defaults (B/32: row-major v2 space + time_chunk 64; H/14:
    # space v2 hybrid + XLA time) with the same TVTS_* env overrides as
    # train_bench, so the parity check measures the path that actually runs
    kcfg = resolve_kernel_config(
        args.arch, {"preset": os.environ.get("TVTS_KERNEL_PRESET", "default")})
    print(f"kernel config: {kcfg}")
    apply_fused = make_fused_train_apply(model, cfg, num_frames=v.num_frames,
                                         n_keep=v.n_keep, **kcfg)
    loss_xla = make_loss_fn(model)
    loss_fused = make_loss_fn(model, apply_fn=apply_fused)

    g_xla_fn = jax.jit(jax.value_and_grad(lambda p, b: loss_xla(p, b)[0]))
    g_fus_fn = jax.jit(jax.value_and_grad(lambda p, b: loss_fused(p, b)[0]))
    l_x, g_x = g_xla_fn(params, batch)
    l_f, g_f = g_fus_fn(params, batch)
    print(f"loss  xla {float(l_x):.6f}  fused {float(l_f):.6f}  "
          f"|diff| {abs(float(l_x) - float(l_f)):.2e}")

    flat_x = jax.tree_util.tree_flatten_with_path(g_x)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(g_f)[0]
    gscale = max(float(np.abs(np.asarray(a, np.float32)).max())
                 for _, a in flat_x)
    rows = []
    for (path, a), (_, b) in zip(flat_x, flat_f):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        amax = float(np.abs(a).max())
        abserr = float(np.abs(a - b).max())
        rows.append((abserr / (amax + 1e-6), abserr, amax, name))
    rows.sort(reverse=True)
    print(f"global max|g| = {gscale:.3e}; top-5 by rel err:")
    for rel, abserr, amax, name in rows[:5]:
        print(f"  rel {rel:9.2e}  abs {abserr:9.2e}  max|g| {amax:9.2e}  "
              f"{name}")
    # judge SIGNIFICANT tensors only: bf16 accumulation-order noise dominates
    # the relative error of tensors whose gradients are cancellation-level
    # small (e.g. the zero-init timeattn biases at step 0)
    sig = sorted((r for r in rows if r[2] > 1e-2 * gscale), reverse=True)
    print("top-5 among significant tensors (max|g| > 1e-2*global):")
    for rel, abserr, amax, name in sig[:5]:
        print(f"  rel {rel:9.2e}  abs {abserr:9.2e}  max|g| {amax:9.2e}  "
              f"{name}")
    worst_sig = sig[0][0] if sig else 0.0
    # measured band on v5e (B=4, random init): loss bit-identical, worst
    # significant rel err 5.8e-2 on early-layer bias tensors — bf16
    # accumulation-order noise compounding over the 12-block chain (the
    # fp32 interpret tests prove the math identical). Flag at 2x that band.
    ok = worst_sig < 0.12 and abs(float(l_x) - float(l_f)) < 2e-2
    print("PARITY OK" if ok else "PARITY SUSPECT")
    return ok


if __name__ == "__main__":
    import sys
    sys.exit(0 if main() else 1)
