#!/usr/bin/env python
"""Optimizer-residue probe (train-step ≥85 hunt, PERF.md round 3).

other_split_probe.py measured the 4-group AdamW update at 12.0 ms — vs a
~4-5 ms HBM roofline for ~150M params (read grad+param+mu+nu 16B, write
param+mu+nu 12B). This probe isolates where the excess lives:

  a) the round-2 measurement form: multi_transform update, NOT donated
  b) same, with donated buffers (in-place param/mu/nu writes)
  c) plain optax.adamw (no groups/masking), donated — grouping overhead
  d) flat-buffer adamw: one ravel'd vector per state — per-leaf overhead
     lower bound (a real step would pay ravel/unravel traffic instead)

Run on hardware: python tools/adamw_probe.py [-B unused]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from tvts_tpu.models.configs import tvtsv2_b_16
from tvts_tpu.models.tvts_v2 import TVTSv2
from tvts_tpu.train.optim import OptimizerConfig, make_optimizer


def timeit(fn, args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(iters):
        o = fn(*args)
        s += float(o if o.ndim == 0 else jnp.sum(o))
    t1 = time.perf_counter()
    return (t1 - t0) / iters * 1e3


def main():
    cfg = tvtsv2_b_16()
    model = TVTSv2(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    video = jnp.zeros((1, 12, 3, 224, 224), jnp.float32)
    ids = jnp.zeros((4, 77), jnp.int32)  # clip-major [n_trans * B, ctx]
    params = model.init(rng, video, ids)["params"]
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n/1e6:.1f}M in {len(jax.tree.leaves(params))} leaves")

    grads = jax.tree.map(lambda p: jnp.full_like(p, 1e-6), params)

    def scalar_probe(new_params):
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree.leaves(new_params))

    # (a) grouped, not donated (round-2 form)
    tx = make_optimizer(params, OptimizerConfig(schedule=(6, 8),
                                                steps_per_epoch=1000))
    opt_state = tx.init(params)

    @jax.jit
    def upd_a(grads, opt_state, params):
        updates, st = tx.update(grads, opt_state, params)
        return scalar_probe(optax.apply_updates(params, updates))

    print(f"a) grouped, no-donate : {timeit(upd_a, (grads, opt_state, params)):7.1f} ms",
          flush=True)

    # (b) grouped, donated
    from functools import partial

    @partial(jax.jit, donate_argnums=(1, 2))
    def upd_b(grads, opt_state, params):
        updates, st = tx.update(grads, opt_state, params)
        newp = optax.apply_updates(params, updates)
        return scalar_probe(newp), newp, st

    # donation consumes state; re-init per timing round is too slow, so carry
    def run_b(grads, opt_state, params, iters=20):
        s, params, opt_state = upd_b(grads, opt_state, params)
        float(s)
        t0 = time.perf_counter()
        for _ in range(iters):
            s, params, opt_state = upd_b(grads, opt_state, params)
            float(s)
        return (time.perf_counter() - t0) / iters * 1e3

    print(f"b) grouped, donated   : {run_b(grads, tx.init(params), params):7.1f} ms",
          flush=True)

    # (c) plain adamw, donated
    tx2 = optax.adamw(1e-4, b1=0.9, b2=0.999, eps=1e-6, weight_decay=0.05)

    @partial(jax.jit, donate_argnums=(1, 2))
    def upd_c(grads, opt_state, params):
        updates, st = tx2.update(grads, opt_state, params)
        newp = optax.apply_updates(params, updates)
        return scalar_probe(newp), newp, st

    def run_c(grads, opt_state, params, iters=20):
        s, params, opt_state = upd_c(grads, opt_state, params)
        float(s)
        t0 = time.perf_counter()
        for _ in range(iters):
            s, params, opt_state = upd_c(grads, opt_state, params)
            float(s)
        return (time.perf_counter() - t0) / iters * 1e3

    print(f"c) plain,   donated   : {run_c(grads, tx2.init(params), params):7.1f} ms",
          flush=True)

    # (d) flat single-vector adamw, donated (per-leaf overhead lower bound)
    from jax.flatten_util import ravel_pytree
    flat_p, _ = ravel_pytree(params)
    flat_g = jnp.full_like(flat_p, 1e-6)

    @partial(jax.jit, donate_argnums=(1, 2))
    def upd_d(g, opt_state, p):
        updates, st = tx2.update(g, opt_state, p)
        newp = p + updates
        return jnp.sum(newp), newp, st

    def run_d(iters=20):
        st = tx2.init(flat_p)
        s, p, st = upd_d(flat_g, st, flat_p)
        float(s)
        t0 = time.perf_counter()
        for _ in range(iters):
            s, p, st = upd_d(flat_g, st, p)
            float(s)
        return (time.perf_counter() - t0) / iters * 1e3

    print(f"d) flat,    donated   : {run_d():7.1f} ms", flush=True)
    roofline = n * 28 / 819e9 * 1e3
    print(f"   HBM roofline ~{roofline:.1f} ms at 819 GB/s")


if __name__ == "__main__":
    main()
