#!/usr/bin/env python
"""Time sub-path fwd+bwd at H/14 TRAIN geometry (D=1280, H=16, n_keep=76).

Round-3 question: the v2 time backward blew the ~100 MB scoped-VMEM ceiling
at D=1280 with the default chunk (112-127 MB: f32 weight-grad accumulators
are chunk-independent, but the recompute working set scales with chunk).
Does a smaller chunk fit — and if so, how does the Pallas pair compare with
the XLA+remat hybrid the fused H/14 train step currently uses?

Times DEPTH chained sub-path calls under value_and_grad in one jit graph.
Env: B (default 8), DEPTH (default 8), CASES substring filter.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tvts_tpu.ops.fused_forward import _layernorm, _var_attention_xla
from tvts_tpu.ops.pallas_block_backward import make_time_subpath

B = int(os.environ.get("B", 8))
T, N, D, H = 12, 76, 1280, 16
S = 1 + T * N
DEPTH = int(os.environ.get("DEPTH", 8))


def timeit(fn, args, iters=4, rounds=3):
    out = fn(*args)
    float(jax.tree.leaves(out)[0])
    best = np.inf
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        float(jnp.sum(jnp.stack([jax.tree.leaves(o)[0] for o in outs])))
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
    ln_s = jnp.ones((D,), jnp.float32)
    ln_b = jnp.zeros((D,), jnp.float32)
    weights = (ln_s, ln_b, wqkv, bqkv, wproj, bproj)

    def chain_grad(sub):
        def loss(x, *w):
            y = x
            for _ in range(DEPTH):
                y = sub(y, *w)
            return jnp.sum(y.astype(jnp.float32))

        def run(x, *w):
            val, grads = jax.value_and_grad(loss, argnums=(0, 3))(x, *w)
            return val, grads
        return run

    @jax.checkpoint
    def time_xla(x, ln_s, ln_b, wq, bq, wp, bp):
        p = {"qkv": {"kernel": wq, "bias": bq},
             "proj": {"kernel": wp, "bias": bp}}
        return x + _var_attention_xla(
            _layernorm(x, {"scale": ln_s, "bias": ln_b}), p, T, N, "time", H)

    cases = {"xla+remat": time_xla}
    vmem = int(os.environ.get("TVTS_VMEM_MB", "120"))
    for chunk in (64, 32, 16):
        for sa in (True, False):
            cases[f"pallas c{chunk} sa{int(sa)} v{vmem}"] = make_time_subpath(
                T, N, H, chunk=chunk, save_acts=sa, vmem_limit_mb=vmem)
    cases["pallas c16 sa0 tps v{}".format(vmem)] = make_time_subpath(
        T, N, H, chunk=16, save_acts=True, save_probs=True,
        vmem_limit_mb=vmem)
    only = os.environ.get("CASES")
    if only:
        keys = [k.strip() for k in only.split(",")]
        cases = {n: c for n, c in cases.items() if any(k in n for k in keys)}

    print(f"H/14 train geometry B={B} S={S} D={D} H={H}; ms per {DEPTH}-chain "
          f"fwd+bwd", flush=True)
    for name, sub in cases.items():
        try:
            t = timeit(jax.jit(chain_grad(sub)), (x,) + weights)
            print(f"{name:>16}: {t:8.1f} ms", flush=True)
        except Exception as e:  # noqa: BLE001 - report compile failures inline
            msg = str(e).split("\n")[0][:160]
            print(f"{name:>16}: FAIL {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
