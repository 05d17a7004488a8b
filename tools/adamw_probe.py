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

    # Methodology note (round 5): the first version of this probe timed 20
    # dispatches with a host fetch per iteration — on this tunnel that
    # measures RPC, not the update (38-62 ms "results", nonsense ordering).
    # These probes CHAIN the update 8x inside ONE jit (state carried
    # through) and fetch once, like every other in-graph probe here.
    CHAIN = 8

    def chain_timeit(tx_, params_, label, iters=3):
        st0 = tx_.init(params_)

        @jax.jit
        def run(grads, opt_state, params):
            for _ in range(CHAIN):
                updates, opt_state = tx_.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
            return scalar_probe(params)

        float(run(grads, st0, params_))
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            float(run(grads, st0, params_))
            best = min(best, (time.perf_counter() - t0) / CHAIN)
        print(f"{label}: {best * 1e3:7.1f} ms/update", flush=True)

    tx = make_optimizer(params, OptimizerConfig(schedule=(6, 8),
                                                steps_per_epoch=1000))
    chain_timeit(tx, params, "a) 4-group multi_transform")

    tx2 = optax.adamw(1e-4, b1=0.9, b2=0.999, eps=1e-6, weight_decay=0.05)
    chain_timeit(tx2, params, "b) plain adamw (no groups) ")

    tx3 = optax.adamw(1e-4, b1=0.9, b2=0.999, eps=1e-6, weight_decay=0.05,
                      mu_dtype=jnp.bfloat16)
    chain_timeit(tx3, params, "c) plain adamw, bf16 mu    ")

    # d) flat single-vector adamw — the per-leaf-overhead lower bound
    from jax.flatten_util import ravel_pytree

    flat_p, _ = ravel_pytree(params)
    flat_g = jnp.full_like(flat_p, 1e-6)

    @jax.jit
    def run_flat(g, opt_state, p):
        for _ in range(CHAIN):
            updates, opt_state = tx2.update(g, opt_state, p)
            p = p + updates
        return jnp.sum(p)

    st = tx2.init(flat_p)
    float(run_flat(flat_g, st, flat_p))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_flat(flat_g, st, flat_p))
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    print(f"d) flat single-vector      : {best * 1e3:7.1f} ms/update",
          flush=True)
    n = sum(x.size for x in jax.tree.leaves(params))
    roofline = n * 28 / 819e9 * 1e3
    print(f"   HBM roofline ~{roofline:.1f} ms at 819 GB/s (f32 state)")


if __name__ == "__main__":
    main()
