#!/usr/bin/env python
"""Split the NON-TOWER cost of the B/16 pretrain step: text tower, sort head,
patchify stem, and optimizer update, each timed as its own jitted fwd+bwd at
the train batch size. Complements tools/bwd_split_probe.py (tower sub-paths).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tvts_tpu.models import TVTSv2, tvtsv2_b_16
from tvts_tpu.models.factory import init_params
from tvts_tpu.train.optim import OptimizerConfig, make_optimizer


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
    return best * 1000


def main():
    B = int(os.environ.get("TB", 32))
    cfg = tvtsv2_b_16()
    model = TVTSv2(cfg, dtype=jnp.bfloat16)
    v = cfg.vision
    rng = np.random.default_rng(0)
    params = init_params(model, cfg)

    ids = np.concatenate([
        np.full((cfg.num_clips * B, 1), 49406, np.int32),
        rng.integers(1, 49000, size=(cfg.num_clips * B, 75)).astype(np.int32),
        np.full((cfg.num_clips * B, 1), 49407, np.int32)], axis=1)
    ids = jnp.asarray(ids)
    video = jnp.asarray(rng.normal(size=(B, v.num_frames, 3, 224, 224))
                        .astype(np.float32))
    keep = jnp.asarray(np.stack([
        rng.permutation(v.patches_per_frame)[: v.n_keep] for _ in range(B)
    ]).astype(np.int32))
    S = 1 + v.num_frames * v.n_keep
    tokens = jnp.asarray(rng.normal(size=(B, S, cfg.vision.output_dim))
                         .astype(np.float32)).astype(jnp.bfloat16)
    sort_text = jnp.asarray(rng.normal(
        size=(B, cfg.num_clips, cfg.text.output_dim)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def text_loss(p, ids):
        e = model.apply({"params": p}, ids, method=lambda m, t: m.compute_text(t))
        return jnp.sum(e.astype(jnp.float32))

    def sort_loss(p, st, tok):
        o = model.apply({"params": p}, st, tok,
                        method=lambda m, a, b: m.pred_model(a, b))
        return jnp.sum(o.astype(jnp.float32))

    from tvts_tpu.ops.fused_forward import _embed_stem

    def stem_loss(p, video, keep):
        x, _ = _embed_stem(p["video_model"], v, video, keep, jnp.bfloat16)
        return jnp.sum(x.astype(jnp.float32))

    def grad_scalar(loss):
        # reduce the grad tree to one scalar INSIDE jit so timing iterations
        # do not hold 8 full param-sized gradient trees alive (OOM)
        def fn(*args):
            g = jax.grad(loss)(*args)
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree.leaves(g))
        return jax.jit(fn)

    cases = {
        "text fwd+bwd": (grad_scalar(text_loss), (params, ids)),
        "sort fwd+bwd": (grad_scalar(sort_loss), (params, sort_text, tokens)),
        "stem fwd+bwd": (grad_scalar(stem_loss), (params, video, keep)),
    }
    print(f"B={B} non-tower step components:")
    for name, (fn, args) in cases.items():
        print(f"{name:>14}: {timeit(fn, args):7.1f} ms", flush=True)

    tx = make_optimizer(params, OptimizerConfig(schedule=(6, 8),
                                                steps_per_epoch=1000))
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.zeros_like, params)

    @jax.jit
    def opt_update(grads, opt_state, params):
        import optax
        updates, new_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree.leaves(new_params))

    t = timeit(opt_update, (grads, opt_state, params))
    print(f"{'optimizer':>14}: {t:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
