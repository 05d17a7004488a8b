#!/usr/bin/env python
"""Patchify-stem spellings at extraction shapes (B/16, B=32).

The round-1 ablation put the non-tower 'fixed' cost at ~9 ms/batch (conv +
embeds + gather + ln_pre + pool). XLA's conv_general_dilated on a patch-16
stride-16 kernel is an im2col matmul in disguise; this probe measures whether
spelling it explicitly (reshape/transpose + [B*T*196, 768] @ [768, D] matmul,
bf16 throughout) beats the conv lowering on the v5e.

Reference stem: /root/reference/v2/model/video_encoder_ViT_B_16.py:176-216.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B, T, C, R = int(os.environ.get("B", 32)), 12, 3, 224
P, D = 16, 768
N = (R // P) ** 2


def timeit(fn, args, iters=10, rounds=3):
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
    video = jnp.asarray(rng.normal(size=(B, T, C, R, R)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(P, P, C, D)) * 0.02
                     ).astype(np.float32)).astype(jnp.bfloat16)

    def conv_stem(video, w):
        frames = video.reshape(B * T, C, R, R).transpose(0, 2, 3, 1) \
            .astype(jnp.bfloat16)
        x = jax.lax.conv_general_dilated(
            frames, w, window_strides=(P, P), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x.reshape(B, T, N, D)

    def matmul_stem(video, w):
        # [B,T,C,R,R] -> [B*T, 14, P, 14, P, C] -> [B*T*196, P*P*C] @ [., D]
        frames = video.reshape(B * T, C, 14, P, 14, P).astype(jnp.bfloat16)
        patches = frames.transpose(0, 2, 4, 3, 5, 1).reshape(
            B * T * N, P * P * C)
        wm = w.reshape(P * P * C, D)
        return (patches @ wm).reshape(B, T, N, D)

    def matmul_stem_bf16in(video, w):
        video = video.astype(jnp.bfloat16)
        frames = video.reshape(B * T, C, 14, P, 14, P)
        patches = frames.transpose(0, 2, 4, 3, 5, 1).reshape(
            B * T * N, P * P * C)
        wm = w.reshape(P * P * C, D)
        return (patches @ wm).reshape(B, T, N, D)

    a = jax.jit(conv_stem)(video, w)
    b = jax.jit(matmul_stem)(video, w)
    print("max|conv - matmul|:",
          float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                - b.astype(jnp.float32)))), flush=True)
    for name, fn in [("conv", conv_stem), ("matmul", matmul_stem),
                     ("matmul_bf16in", matmul_stem_bf16in)]:
        print(f"{name:>14}: {timeit(jax.jit(fn), (video, w)):6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
