#!/usr/bin/env python
"""Split the train step cost into forward vs backward for the XLA and fused
paths (localizes where the training time goes)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tvts_tpu.models import TVTSv2, tvtsv2_b_16
from tvts_tpu.models.factory import init_params
from tvts_tpu.ops.fused_forward import make_fused_train_apply
from tvts_tpu.train.step import make_loss_fn


def timeit(fn, args, iters=8, rounds=3):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    best = np.inf
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        float(jnp.sum(jnp.stack([jnp.sum(jax.tree.leaves(o)[0])
                                 for o in outs])))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    B = int(os.environ.get("TB", 8))
    cfg = tvtsv2_b_16()
    model = TVTSv2(cfg, dtype=jnp.bfloat16)
    v = cfg.vision
    rng = np.random.default_rng(0)
    batch = {
        "video": jnp.asarray(rng.normal(size=(B, v.num_frames, 3, 224, 224)).astype(np.float32)),
        "text_ids": jnp.asarray(np.concatenate([
            np.full((cfg.num_clips * B, 1), 49406, np.int32),
            rng.integers(1, 49000, size=(cfg.num_clips * B, 75)).astype(np.int32),
            np.full((cfg.num_clips * B, 1), 49407, np.int32)], axis=1)),
        "keep_ind": jnp.asarray(np.stack([
            rng.permutation(v.patches_per_frame)[: v.n_keep] for _ in range(B)
        ]).astype(np.int32)),
        "labels": jnp.asarray(np.tile(np.arange(4), (B, 1)).astype(np.int32)),
    }
    params = init_params(model, cfg)

    fused_apply = make_fused_train_apply(model, cfg, num_frames=v.num_frames,
                                         n_keep=v.n_keep)
    for name, apply_fn in [("xla", None), ("fused", fused_apply)]:
        loss_fn = make_loss_fn(model, apply_fn=apply_fn)
        fwd = jax.jit(lambda p, b, lf=loss_fn: lf(p, b)[0])
        grad = jax.jit(lambda p, b, lf=loss_fn: jax.grad(
            lambda pp: lf(pp, b)[0])(p))
        t_f = timeit(fwd, (params, batch))
        t_g = timeit(grad, (params, batch))
        print(f"{name:>6} B={B}: fwd {t_f*1e3:7.1f} ms | fwd+bwd "
              f"{t_g*1e3:7.1f} ms | bwd ~{(t_g-t_f)*1e3:7.1f} ms | "
              f"{B/t_g:6.1f} clips/s", flush=True)


if __name__ == "__main__":
    main()
