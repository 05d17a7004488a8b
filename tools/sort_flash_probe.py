#!/usr/bin/env python
"""Is the stock Pallas TPU flash attention worth using for the sort head?

Sort head: full self-attention over [B, 8 heads, ~1181 tokens, d=64], 2 layers,
fwd+bwd (tools/other_split_probe.py: 46 ms of the 418 ms train step). Compares
XLA attention vs jax.experimental.pallas flash_attention at the padded shape.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


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
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

    B, H, S, d = int(os.environ.get("TB", 32)), 8, 1280, 64
    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray((rng.normal(size=shape) * 0.1).astype(np.float32)
                           ).astype(jnp.bfloat16)

    q, k, v = mk((B, H, S, d)), mk((B, H, S, d)), mk((B, H, S, d))

    def xla_attn(q, k, v):
        logits = jnp.einsum("bhid,bhjd->bhij", q, k)
        p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhij,bhjd->bhid", p, v)

    def flash(q, k, v):
        return flash_attention(q, k, v, sm_scale=1.0)

    for name, fn in [("xla", xla_attn), ("flash", flash)]:
        # 2 chained layers, like the sort head
        def fwd2(q, k, v, fn=fn):
            o = fn(q, k, v)
            return jnp.sum(fn(o, k, v).astype(jnp.float32))

        f = jax.jit(fwd2)
        g = jax.jit(jax.grad(fwd2, argnums=(0, 1, 2)))
        t_f = timeit(f, (q, k, v))
        t_g = timeit(g, (q, k, v))
        print(f"{name:>6}: fwd {t_f:6.1f} ms | fwd+bwd {t_g:6.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
