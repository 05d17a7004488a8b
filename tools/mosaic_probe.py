#!/usr/bin/env python
"""Minimal Mosaic lowering probes for layout ops the kernels depend on.

Run on real TPU; each case compiles a tiny kernel and prints OK / the Mosaic
error class. Findings land in CLAUDE.md's Mosaic-limits list.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, H, d, Nc, D = 12, 12, 64, 128, 768


def run_case(name, kernel, in_shape, out_shape):
    x = jnp.asarray(np.random.default_rng(0).normal(size=in_shape)
                    .astype(np.float32))
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        float(jnp.sum(out))
        print(f"{name}: OK")
        return True
    except Exception as e:
        msg = str(e)
        for line in msg.split("\n"):
            if "Not implemented" in line or "Unsupported" in line \
                    or "NotImplemented" in line or "INTERNAL" in line:
                print(f"{name}: FAIL — {line.strip()[:140]}")
                break
        else:
            print(f"{name}: FAIL — {msg[:140]}")
        return False


def main():
    run_case("leading-4d-transpose [T,H,d,Nc]->(1,0,2,3)",
             lambda i, o: o.__setitem__(
                 ..., jnp.transpose(i[...], (1, 0, 2, 3))),
             (T, H, d, Nc), (H, T, d, Nc))
    run_case("batched-swapaxes-3d [T,Nc,D]->[T,D,Nc]",
             lambda i, o: o.__setitem__(..., jnp.swapaxes(i[...], -1, -2)),
             (T, Nc, D), (T, D, Nc))
    run_case("axis0-reduce-3d [13,H,Nc]->[H,Nc]",
             lambda i, o: o.__setitem__(..., jnp.sum(i[...], axis=0)),
             (13, H, Nc), (H, Nc))
    run_case("axis1-reduce-3d [H,13,Nc]->[H,Nc]",
             lambda i, o: o.__setitem__(..., jnp.sum(i[...], axis=1)),
             (H, 13, Nc), (H, Nc))
    run_case("axis03-reduce-4d [T,H,d,Nc]->[H,d]",
             lambda i, o: o.__setitem__(..., jnp.sum(i[...], axis=(0, 3))),
             (T, H, d, Nc), (H, d))
    run_case("axis13-reduce-4d [H,T,d,Nc]->[H,d]",
             lambda i, o: o.__setitem__(..., jnp.sum(i[...], axis=(1, 3))),
             (H, T, d, Nc), (H, d))
    run_case("sublane-merge-4d->3d [T,H,d,Nc]->[T,D,Nc]",
             lambda i, o: o.__setitem__(..., i[...].reshape(T, D, Nc)),
             (T, H, d, Nc), (T, D, Nc))
    run_case("sublane-split-3d->4d [T,D,Nc]->[T,H,d,Nc]",
             lambda i, o: o.__setitem__(..., i[...].reshape(T, H, d, Nc)),
             (T, D, Nc), (T, H, d, Nc))
    run_case("ABt-dot-lanes [D,Nc]x[D,Nc]->[D,D] (dot_general contract lanes)",
             lambda i, o: o.__setitem__(..., jax.lax.dot_general(
                 i[0], i[1], (((1,), (1,)), ((), ())),
                 preferred_element_type=jnp.float32)),
             (2, D, Nc), (D, D))


if __name__ == "__main__":
    main()


def extra_probes():
    """Multi-contracting-dim dot_general variants (weight-grad batching)."""
    def case(name, kernel, shapes, out_shape):
        xs = [jnp.asarray(np.random.default_rng(i).normal(size=s)
                          .astype(np.float32)) for i, s in enumerate(shapes)]
        try:
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(xs),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(*xs)
            float(jnp.sum(out))
            print(f"{name}: OK")
        except Exception as e:
            line = next((ln for ln in str(e).split("\n")
                         if "Not implemented" in ln or "Unsupported" in ln
                         or "INTERNAL" in ln), str(e)[:140])
            print(f"{name}: FAIL — {line.strip()[:140]}")

    T2, D3 = 4, 3 * D
    case("dot2c [T,3D,Nc]x[T,D,Nc] contract((0,2),(0,2)) -> [3D,D]",
         lambda a, b, o: o.__setitem__(..., jax.lax.dot_general(
             a[...], b[...], (((0, 2), (0, 2)), ((), ())),
             preferred_element_type=jnp.float32)),
         [(T2, D3, Nc), (T2, D, Nc)], (D3, D))
    case("dot2c-rowmajor [T,Nc,3D]x[T,Nc,D] contract((0,1),(0,1)) -> [3D,D]",
         lambda a, b, o: o.__setitem__(..., jax.lax.dot_general(
             a[...], b[...], (((0, 1), (0, 1)), ((), ())),
             preferred_element_type=jnp.float32)),
         [(T2, Nc, D3), (T2, Nc, D)], (D3, D))
    case("dotb [D,3D]x[T,3D,Nc] contract((1,),(1,)) -> [D,T,Nc]",
         lambda a, b, o: o.__setitem__(..., jax.lax.dot_general(
             a[...], b[...], (((1,), (1,)), ((), ())),
             preferred_element_type=jnp.float32)),
         [(D, D3), (T2, D3, Nc)], (D, T2, Nc))


if __name__ == "__main__" and os.environ.get("EXTRA"):
    extra_probes()


def extra2_probes():
    """3D lane-broadcast variants (v5/v6 'Lane broadcast' failure hunt)."""
    def case(name, kernel, shapes, out_shape):
        xs = [jnp.asarray(np.random.default_rng(i).normal(size=s)
                          .astype(np.float32)) for i, s in enumerate(shapes)]
        try:
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(xs),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(*xs)
            float(jnp.sum(out))
            print(f"{name}: OK")
        except Exception as e:
            line = next((ln for ln in str(e).split("\n")
                         if "Not implemented" in ln or "Unsupported" in ln
                         or "INTERNAL" in ln), str(e)[:140])
            print(f"{name}: FAIL — {line.strip()[:120]}")

    F, Nq = 6, 196
    case("3d-lane-bcast-mul a[F,N,1]*b[F,N,d]",
         lambda a, b, o: o.__setitem__(..., a[...] * b[...]),
         [(F, Nq, 1), (F, Nq, d)], (F, Nq, d))
    case("3d-lane-bcast-sub a[F,N,Nk]-m[F,N,1]",
         lambda a, b, o: o.__setitem__(..., a[...] - b[...]),
         [(F, Nq, Nq), (F, Nq, 1)], (F, Nq, Nq))
    case("3d-keepdims-max-then-sub (flash pattern)",
         lambda a, o: o.__setitem__(..., a[...] - jnp.max(
             a[...], axis=-1, keepdims=True)),
         [(F, Nq, Nq)], (F, Nq, Nq))
    case("v2-style [H,1,N]*[H,d,1]",
         lambda a, b, o: o.__setitem__(..., a[...] * b[...]),
         [(H, 1, Nc), (H, d, 1)], (H, d, Nc))
    case("slice-reshape-dot x[:,sl].reshape(F,N,d) @ batched",
         lambda x, y, o: o.__setitem__(..., jax.lax.dot_general(
             x[...][:, 64:64 + d].reshape(F, 28, d),
             y[...], (((2,), (2,)), ((0,), (0,))),
             preferred_element_type=jnp.float32)),
         [(F * 28, D), (F, 28, d)], (F, 28, 28))
    case("batched-dot pc[F,N,1] x vh[F,N,d] contract N",
         lambda a, b, o: o.__setitem__(..., jax.lax.dot_general(
             a[...], b[...], (((1,), (1,)), ((0,), (0,))),
             preferred_element_type=jnp.float32)),
         [(F, Nq, 1), (F, Nq, d)], (F, 1, d))


if __name__ == "__main__" and os.environ.get("EXTRA2"):
    extra2_probes()
