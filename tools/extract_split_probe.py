#!/usr/bin/env python
"""Per-subpath forward cost at EXTRACTION shapes (B/16, mask 0, N=196).

Times 12 chained calls (one model depth) of each sub-path variant the
extraction graph can use, in one jit graph each — the decision table for the
extraction kernel defaults (PERF.md round-3). Forward-only, no stats/acts.

Env: B (default 32), CASES (comma-separated substring filter).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tvts_tpu.ops.fused_forward import _layernorm, _mlp, _var_attention_xla
from tvts_tpu.ops.pallas_block_attention import (
    fused_mlp_block,
    fused_mlp_block_v7,
    fused_space_attention_block_v2,
    fused_space_attention_block_v3,
    fused_space_attention_block_v7,
    fused_space_attention_block_v9,
    fused_spacemlp_block_v7,
    fused_time_attention_block_v2,
    fused_time_attention_block_v4,
    fused_time_attention_block_v7,
)

B = int(os.environ.get("B", 32))
T, N, D, H = 12, 196, 768, 12
S = 1 + T * N
DEPTH = 12


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
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32) * 0.02
                    ).astype(jnp.bfloat16)
    wqkv = jnp.asarray((rng.normal(size=(D, 3 * D)) * 0.02).astype(np.float32)
                       ).astype(jnp.bfloat16)
    bqkv = jnp.zeros((3 * D,), jnp.bfloat16)
    wproj = jnp.asarray((rng.normal(size=(D, D)) * 0.02).astype(np.float32)
                        ).astype(jnp.bfloat16)
    bproj = jnp.zeros((D,), jnp.bfloat16)
    wfc = jnp.asarray((rng.normal(size=(D, 4 * D)) * 0.02).astype(np.float32)
                      ).astype(jnp.bfloat16)
    bfc = jnp.zeros((4 * D,), jnp.bfloat16)
    wpr = jnp.asarray((rng.normal(size=(4 * D, D)) * 0.02).astype(np.float32)
                      ).astype(jnp.bfloat16)
    bpr = jnp.zeros((D,), jnp.bfloat16)
    ln_s = jnp.ones((D,), jnp.float32)
    ln_b = jnp.zeros((D,), jnp.float32)

    aw = (ln_s, ln_b, wqkv, bqkv, wproj, bproj)
    mw = (ln_s, ln_b, wfc, bfc, wpr, bpr)

    def chain(sub):
        def run(x, *w):
            for _ in range(DEPTH):
                x = sub(x, *w)
            return jnp.sum(x.astype(jnp.float32))
        return run

    tc = int(os.environ.get("TIME_CHUNK", 128))
    cases = {
        "space/v2": (chain(lambda x, *w: fused_space_attention_block_v2(
            x, x, *w, num_frames=T, patches_per_frame=N, num_heads=H)),
            (x,) + aw),
        "space/v3": (chain(lambda x, *w: fused_space_attention_block_v3(
            x, x, *w, num_frames=T, patches_per_frame=N, num_heads=H)),
            (x,) + aw),
        "space/xla": (chain(lambda x, ln_s, ln_b, wq, bq, wp, bp:
                            x + _var_attention_xla(
                                _layernorm(x, {"scale": ln_s, "bias": ln_b}),
                                {"qkv": {"kernel": wq, "bias": bq},
                                 "proj": {"kernel": wp, "bias": bp}},
                                T, N, "space", H)),
                      (x,) + aw),
        "time/v2": (chain(lambda x, *w: fused_time_attention_block_v2(
            x, *w, num_frames=T, patches_per_frame=N, num_heads=H, chunk=tc)),
            (x,) + aw),
        "time/v4": (chain(lambda x, *w: fused_time_attention_block_v4(
            x, *w, num_frames=T, patches_per_frame=N, num_heads=H, chunk=tc)),
            (x,) + aw),
        "time/xla": (chain(lambda x, ln_s, ln_b, wq, bq, wp, bp:
                           x + _var_attention_xla(
                               _layernorm(x, {"scale": ln_s, "bias": ln_b}),
                               {"qkv": {"kernel": wq, "bias": bq},
                                "proj": {"kernel": wp, "bias": bp}},
                               T, N, "time", H)),
                     (x,) + aw),
        "mlp/fused": (chain(lambda x, *w: fused_mlp_block(x, *w)),
                      (x,) + mw),
        "mlp/xla": (chain(lambda x, ln_s, ln_b, wf, bf, wp, bp:
                          x + _mlp(_layernorm(x, {"scale": ln_s,
                                                  "bias": ln_b}),
                                   {"c_fc": {"kernel": wf, "bias": bf},
                                    "c_proj": {"kernel": wp, "bias": bp}},
                                   "quick_gelu")),
                    (x,) + mw),
    }

    # v7 d-major cases: activations [B, T, D, N] + row-major [B, 1, D] CLS
    xT = jnp.swapaxes(x[:, 1:].reshape(B, T, N, D), -1, -2)
    cls = x[:, :1]

    def chainT(sub):
        def run(xT, cls, *w):
            for _ in range(DEPTH):
                xT, cls = sub(xT, cls, *w)
            return jnp.sum(xT.astype(jnp.float32))
        return run

    cases["time/v7"] = (chainT(lambda xT, cls, *w: fused_time_attention_block_v7(
        xT, cls, *w, num_heads=H)), (xT, cls) + aw)
    cases["space/v7"] = (chainT(lambda xT, cls, *w: fused_space_attention_block_v7(
        xT, xT, cls, cls, *w, num_heads=H)), (xT, cls) + aw)
    sfpp = int(os.environ.get("SFPP", "3"))
    cases[f"space/v9f{sfpp}"] = (chainT(
        lambda xT, cls, *w: fused_space_attention_block_v9(
            xT, xT, cls, cls, *w, num_heads=H, fpp=sfpp)), (xT, cls) + aw)
    cases[f"space/v9f{sfpp}w"] = (chainT(
        lambda xT, cls, *w: fused_space_attention_block_v9(
            xT, xT, cls, cls, *w, num_heads=H, fpp=sfpp, wide_mm=True)),
        (xT, cls) + aw)
    cases["mlp/v7"] = (chainT(lambda xT, cls, *w: fused_mlp_block_v7(
        xT, cls, *w)), (xT, cls) + mw)
    cases["spacemlp/v7"] = (chainT(lambda xT, cls, *w: fused_spacemlp_block_v7(
        xT, xT, cls, cls, *w, num_heads=H)), (xT, cls) + aw + mw)

    only = os.environ.get("CASES")
    if only:
        keys = [k.strip() for k in only.split(",")]
        cases = {n: c for n, c in cases.items() if any(k in n for k in keys)}
    print(f"B={B}, extraction shapes (T={T}, N={N}): ms per {DEPTH}-block "
          f"chain, fwd only", flush=True)
    for name, (fn, args) in cases.items():
        t_f = timeit(jax.jit(fn), args)
        print(f"{name:>10}: fwd {t_f:7.1f}", flush=True)


if __name__ == "__main__":
    main()
