#!/usr/bin/env python
"""Text-tower cost anatomy (train ≥115 hunt, VERDICT r4 #4).

other_split_probe measured the text tower fwd+bwd at 26.2 ms (B=32 ->
[128, 77] token batch) vs a ~7 ms matmul roofline (12L x 512w causal
transformer, ~1.4 TFLOP fwd+bwd at B=32) — 27% MFU. This probe ablates the
block components on an equivalent hand-rolled forward (same shapes/dtypes
as models/text.py, grad wrt weights) to locate the excess:

  full      — LN + causal attention + LN + MLP (the real structure)
  noattn    — attention sub-path removed (matmul+LN+MLP remainder)
  attnonly  — qkv + causal attention + proj only
  nocausal  — attention without the mask where-op (mask cost)
  flat      — attention via one folded [B*H, S, d] batched matmul spelling
  nomask77  — context padded 77 -> 128 (tile-aligned lanes: does the 77-lane
              pad in the [B,H,77,77] logits/probs tensors cost or save?)
  f32ln0    — LNs in bf16 (fp32-LN cast traffic)

Run: python tools/text_split_probe.py   (env TB=batch, default 32 videos ->
4*TB text rows)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

L, W, H, CTX = 12, 512, 8, 77
D = W // H


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


def make_weights(rng, dtype):
    ws = []
    for _ in range(L):
        ws.append(dict(
            ln1_s=jnp.ones((W,), jnp.float32),
            ln1_b=jnp.zeros((W,), jnp.float32),
            wqkv=jnp.asarray(rng.normal(size=(W, 3 * W)) * 0.02, dtype),
            bqkv=jnp.zeros((3 * W,), dtype),
            wproj=jnp.asarray(rng.normal(size=(W, W)) * 0.02, dtype),
            bproj=jnp.zeros((W,), dtype),
            ln2_s=jnp.ones((W,), jnp.float32),
            ln2_b=jnp.zeros((W,), jnp.float32),
            wfc=jnp.asarray(rng.normal(size=(W, 4 * W)) * 0.02, dtype),
            bfc=jnp.zeros((4 * W,), dtype),
            wout=jnp.asarray(rng.normal(size=(4 * W, W)) * 0.02, dtype),
            bout=jnp.zeros((W,), dtype),
        ))
    return ws


def ln(x, s, b, f32=True):
    xf = x.astype(jnp.float32) if f32 else x
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * s + b).astype(x.dtype)


def attention(x, w, causal=True, flat=False):
    B, S, _ = x.shape
    qkv = x @ w["wqkv"] + w["bqkv"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, S, H, D).transpose(0, 2, 1, 3) * (D ** -0.5)
    k = k.reshape(B, S, H, D).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, H, D).transpose(0, 2, 1, 3)
    if flat:
        q = q.reshape(B * H, S, D)
        k = k.reshape(B * H, S, D)
        v = v.reshape(B * H, S, D)
        logits = jnp.einsum("gid,gjd->gij", q, k)
    else:
        logits = jnp.einsum("bhid,bhjd->bhij", q, k)
    if causal:
        mask = jnp.tril(jnp.ones((S, S), dtype=bool))
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    if flat:
        o = jnp.einsum("gij,gjd->gid", p, v).reshape(B, H, S, D)
    else:
        o = jnp.einsum("bhij,bhjd->bhid", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, S, W)
    return o @ w["wproj"] + w["bproj"]


def mlp(x, w):
    h = x @ w["wfc"] + w["bfc"]
    h = h * jax.nn.sigmoid(1.702 * h)
    return h @ w["wout"] + w["bout"]


def tower(ws, x, attn=True, do_mlp=True, causal=True, flat=False, f32ln=True):
    for w in ws:
        if attn:
            x = x + attention(ln(x, w["ln1_s"], w["ln1_b"], f32ln), w,
                              causal=causal, flat=flat)
        if do_mlp:
            x = x + mlp(ln(x, w["ln2_s"], w["ln2_b"], f32ln), w)
    return x


def main():
    B = 4 * int(os.environ.get("TB", 32))  # text rows = 4 clips per video
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    ws = make_weights(rng, dtype)
    x77 = jnp.asarray(rng.normal(size=(B, CTX, W)).astype(np.float32)).astype(dtype)
    x128 = jnp.asarray(rng.normal(size=(B, 128, W)).astype(np.float32)).astype(dtype)

    def g(fn):
        def f(ws, x):
            def loss(ws):
                return jnp.sum(fn(ws, x).astype(jnp.float32))
            gr = jax.grad(loss)(ws)
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree.leaves(gr))
        return jax.jit(f)

    cases = {
        "full": (g(tower), x77),
        "noattn": (g(lambda ws, x: tower(ws, x, attn=False)), x77),
        "attnonly": (g(lambda ws, x: tower(ws, x, do_mlp=False)), x77),
        "nocausal": (g(lambda ws, x: tower(ws, x, causal=False)), x77),
        "flat": (g(lambda ws, x: tower(ws, x, flat=True)), x77),
        "ctx128": (g(tower), x128),
        "bf16ln": (g(lambda ws, x: tower(ws, x, f32ln=False)), x77),
    }
    print(f"text tower anatomy, {B} rows x ctx {CTX} (12L x 512w, bf16):")
    for name, (fn, x) in cases.items():
        print(f"{name:>9}: {timeit(fn, (ws, x)):7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
