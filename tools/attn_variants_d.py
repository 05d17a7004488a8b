#!/usr/bin/env python
"""Compare XLA formulations of the divided space-time attention core on the chip.

Variants (same math, different layouts):
  A: current — transpose to group-major [B,H,G,L,d], grouped einsums
  B: no-transpose einsums with direct index orders
  C: heads folded into batch, groups flattened, dot_general on 3D shapes
  D: fold heads*groups, single 3D bmm layout [BG, L, d] like the reference's
     (b h) folding
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B, T, N, D, H = 16, 12, 196, 768, 12
d = D // H
S = 1 + T * N
DT = jnp.bfloat16


def timeit(name, fn, *args, iters=10):
    float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(jnp.sum(jnp.stack([jnp.sum(o) for o in outs])))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1000:8.2f} ms")
    return dt


def softmax32(x):
    return jax.nn.softmax(x.astype(jnp.float32), axis=-1).astype(DT)


def make_qkv(seed):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, S, d)).astype(np.float32)).astype(DT)
    k = jnp.asarray(rng.normal(size=(B, H, S, d)).astype(np.float32)).astype(DT)
    v = jnp.asarray(rng.normal(size=(B, H, S, d)).astype(np.float32)).astype(DT)
    return q, k, v


# ---- variant A: current implementation -----------------------------------
from tvts_tpu.ops.attention import divided_space_time_attention  # noqa: E402


def var_a(mode):
    @jax.jit
    def f(q, k, v):
        return divided_space_time_attention(q, k, v, T, N, mode)
    return f


# ---- variant B: no-transpose einsums --------------------------------------
def var_b(mode):
    @jax.jit
    def f(q, k, v):
        cls_q, cls_k, cls_v = q[:, :, :1], k[:, :, 0], v[:, :, 0]
        cls_out = jnp.einsum("bhij,bhjd->bhid", softmax32(
            jnp.einsum("bhid,bhjd->bhij", cls_q, k)), v)
        q5 = q[:, :, 1:].reshape(B, H, T, N, d)
        k5 = k[:, :, 1:].reshape(B, H, T, N, d)
        v5 = v[:, :, 1:].reshape(B, H, T, N, d)
        if mode == "time":
            logits = jnp.einsum("bhtnd,bhsnd->bhnts", q5, k5)
            cls_l = jnp.einsum("bhtnd,bhd->bhnt", q5, cls_k)
            p = softmax32(jnp.concatenate([cls_l[..., None], logits], -1))
            out = jnp.einsum("bhnts,bhsnd->bhtnd", p[..., 1:], v5)
            out = out + jnp.einsum("bhnt,bhd->bhtnd", p[..., 0], cls_v)
        else:
            logits = jnp.einsum("bhtnd,bhtmd->bhtnm", q5, k5)
            cls_l = jnp.einsum("bhtnd,bhd->bhtn", q5, cls_k)
            p = softmax32(jnp.concatenate([cls_l[..., None], logits], -1))
            out = jnp.einsum("bhtnm,bhtmd->bhtnd", p[..., 1:], v5)
            out = out + p[..., 0][..., None] * cls_v[:, :, None, None, :]
        out = out.reshape(B, H, T * N, d)
        return jnp.concatenate([cls_out, out], axis=2)
    return f


# ---- variant C: fold (B,H,groups) into one batch dim -----------------------
def var_c(mode):
    @jax.jit
    def f(q, k, v):
        cls_q, cls_k, cls_v = q[:, :, :1], k[:, :, 0], v[:, :, 0]
        cls_out = jnp.einsum("bhij,bhjd->bhid", softmax32(
            jnp.einsum("bhid,bhjd->bhij", cls_q, k)), v)

        def group(x):
            x = x[:, :, 1:].reshape(B, H, T, N, d)
            if mode == "time":
                x = x.transpose(0, 1, 3, 2, 4)  # [B,H,N,T,d]
                return x.reshape(B * H * N, T, d)
            return x.reshape(B * H * T, N, d)

        qg, kg, vg = group(q), group(k), group(v)
        G = qg.shape[0] // (B * H)
        ck = jnp.repeat(cls_k.reshape(B * H, 1, d), G, axis=0)
        cv = jnp.repeat(cls_v.reshape(B * H, 1, d), G, axis=0)
        kg2 = jnp.concatenate([ck, kg], axis=1)
        vg2 = jnp.concatenate([cv, vg], axis=1)
        p = softmax32(jnp.einsum("gid,gjd->gij", qg, kg2))
        out = jnp.einsum("gij,gjd->gid", p, vg2)
        if mode == "time":
            out = out.reshape(B, H, N, T, d).transpose(0, 1, 3, 2, 4)
        out = out.reshape(B, H, T * N, d)
        return jnp.concatenate([cls_out, out], axis=2)
    return f


def var_d(mode):
    @jax.jit
    def f(q, k, v):
        cls_q, cls_k, cls_v = q[:, :, :1], k[:, :, 0], v[:, :, 0]
        cls_out = jnp.einsum("bhij,bhjd->bhid", softmax32(
            jnp.einsum("bhid,bhjd->bhij", cls_q, k)), v)
        q5 = q[:, :, 1:].reshape(B, H, T, N, d)
        k5 = k[:, :, 1:].reshape(B, H, T, N, d)
        v5 = v[:, :, 1:].reshape(B, H, T, N, d)
        # time attention with N kept in the lane (last) dim
        logits = jnp.einsum("bhtnd,bhsnd->bhtsn", q5, k5)   # [B,H,T,S,N]
        cls_l = jnp.einsum("bhtnd,bhd->bhtn", q5, cls_k)    # [B,H,T,N]
        full = jnp.concatenate([cls_l[:, :, :, None, :], logits], axis=3)
        p = jax.nn.softmax(full.astype(jnp.float32), axis=3).astype(DT)
        out = jnp.einsum("bhtsn,bhsnd->bhtnd", p[:, :, :, 1:, :], v5)
        out = out + jnp.einsum("bhtn,bhd->bhtnd", p[:, :, :, 0, :], cls_v)
        out = out.reshape(B, H, T * N, d)
        return jnp.concatenate([cls_out, out], axis=2)
    return f


def main():
    for mode in ("time",):
        print(f"--- {mode} ---")
        q, k, v = make_qkv(0)
        ref = None
        for name, maker in [("A current", var_a), ("C folded-batch", var_c),
                            ("D n-last", var_d)]:
            f = maker(mode)
            out = f(q, k, v)
            if ref is None:
                ref = np.asarray(out, dtype=np.float32)
            else:
                err = np.abs(np.asarray(out, dtype=np.float32) - ref).max()
                assert err < 0.2, (name, err)
            timeit(f"{mode} {name}", f, q, k, v)


if __name__ == "__main__":
    main()
