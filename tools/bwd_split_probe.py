#!/usr/bin/env python
"""Per-subpath forward vs backward cost at PRETRAIN shapes (B/16, mask 0.5).

For each sub-path (time / space / mlp), times 12 chained calls (one model depth)
in one jit graph — forward-only and value_and_grad — for both the fused Pallas
subpath (custom VJP) and the XLA formulation. Localizes where the train step's
time goes (PERF.md round-2 training section).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tvts_tpu.ops.fused_forward import _layernorm, _mlp, _var_attention_xla
from tvts_tpu.ops.pallas_block_attention import make_mlp_subpath
from tvts_tpu.ops.pallas_block_backward import (
    make_space_subpath,
    make_space_subpath_v3,
    make_time_subpath,
    make_time_subpath_v3,
)

B = int(os.environ.get("B", 32))
T, N, D, H = 12, 98, 768, 12
S = 1 + T * N
DEPTH = 12


def timeit(fn, args, iters=8, rounds=3):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    best = np.inf
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        float(jnp.sum(jnp.stack([jnp.sum(jax.tree.leaves(o)[0]) for o in outs])))
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

    time_f = make_time_subpath(T, N, H, chunk=128)
    time_v3 = make_time_subpath_v3(T, N, H, chunk=128)
    space_f = make_space_subpath(T, N, H)
    space_v3 = make_space_subpath_v3(T, N, H)
    from tvts_tpu.ops.pallas_block_backward import make_space_subpath_v5

    space_v5 = make_space_subpath_v5(
        T, N, H, fpp=int(os.environ.get("FPP", "12")))
    from tvts_tpu.ops.pallas_block_backward import make_space_subpath_v10

    # the round-4 best train preset: v10 frame-batched probs-saving space +
    # probs-saving (tps) time
    space_v10 = make_space_subpath_v10(
        T, N, H, fpp=int(os.environ.get("SFPP", "4")), save_probs=True)
    time_tps = make_time_subpath(T, N, H, chunk=128, save_acts=True,
                                 save_probs=True)
    mlp_f = make_mlp_subpath(act="quick_gelu", chunk=256)

    def chain(sub):
        def run(x, *w):
            for _ in range(DEPTH):
                x = sub(x, *w)
            return jnp.sum(x.astype(jnp.float32))
        return run

    cases = {
        "time/fused": (chain(lambda x, *w: time_f(x, *w)),
                       (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj)),
        "time/v3": (chain(lambda x, *w: time_v3(x, *w)),
                    (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj)),
        "time/xla": (chain(lambda x, ln_s, ln_b, wq, bq, wp, bp:
                           x + _var_attention_xla(
                               _layernorm(x, {"scale": ln_s, "bias": ln_b}),
                               {"qkv": {"kernel": wq, "bias": bq},
                                "proj": {"kernel": wp, "bias": bp}},
                               T, N, "time", H)),
                     (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj)),
        "space/fused": (chain(lambda x, *w: space_f(x, x, *w)),
                        (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj)),
        "space/v3": (chain(lambda x, *w: space_v3(x, x, *w)),
                     (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj)),
        "space/v5": (chain(lambda x, *w: space_v5(x, x, *w)),
                     (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj)),
        "space/v10": (chain(lambda x, *w: space_v10(x, x, *w)),
                      (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj)),
        "time/tps": (chain(lambda x, *w: time_tps(x, *w)),
                     (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj)),
        "space/xla": (chain(lambda x, ln_s, ln_b, wq, bq, wp, bp:
                            x + _var_attention_xla(
                                _layernorm(x, {"scale": ln_s, "bias": ln_b}),
                                {"qkv": {"kernel": wq, "bias": bq},
                                 "proj": {"kernel": wp, "bias": bp}},
                                T, N, "space", H)),
                      (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj)),
        "mlp/fused": (chain(lambda x, *w: mlp_f(x, *w)),
                      (x, ln_s, ln_b, wfc, bfc, wpr, bpr)),
        "mlp/xla": (chain(lambda x, ln_s, ln_b, wf, bf, wp, bp:
                          x + _mlp(_layernorm(x, {"scale": ln_s, "bias": ln_b}),
                                   {"c_fc": {"kernel": wf, "bias": bf},
                                    "c_proj": {"kernel": wp, "bias": bp}},
                                   "quick_gelu")),
                    (x, ln_s, ln_b, wfc, bfc, wpr, bpr)),
    }

    only = os.environ.get("CASES")  # comma-separated substring filter
    if only:
        keys = [k.strip() for k in only.split(",")]
        cases = {n: c for n, c in cases.items()
                 if any(k in n for k in keys)}
    print(f"B={B}, pretrain shapes (T={T}, N={N}): ms per 12-block chain",
          flush=True)
    for name, (fn, args) in cases.items():
        fwd = jax.jit(fn)
        grad = jax.jit(lambda *a, fn=fn: jax.grad(fn)(*a))
        t_f = timeit(fwd, args)
        t_g = timeit(grad, args)
        print(f"{name:>12}: fwd {t_f:7.1f} | fwd+bwd {t_g:7.1f} | "
              f"bwd ~{t_g - t_f:7.1f}", flush=True)


if __name__ == "__main__":
    main()
