#!/usr/bin/env python
"""Ablate each v2 megakernel back to XLA inside the fused extraction forward
to localize the remaining per-block costs (second-position, best-of-3)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tvts_tpu.models import tvtsv2_b_16
from tvts_tpu.models.space_time_vit import SpaceTimeViT
from tvts_tpu.ops.fused_forward import (
    _embed_stem,
    _layernorm,
    _mlp,
    _pool,
    _var_attention_xla,
)
from tvts_tpu.ops.pallas_block_attention import (
    fused_mlp_block,
    fused_space_attention_block_v2,
    fused_time_attention_block_v2,
)


def forward(params, cfg, video, keep, use_time, use_space, use_mlp,
            time_chunk=128, dtype=jnp.bfloat16):
    x, T = _embed_stem(params, cfg, video, keep, dtype)
    n_keep = (x.shape[1] - 1) // T
    for i in range(cfg.layers):
        bp = params[f"blocks_{i}"]
        if use_time:
            tr = fused_time_attention_block_v2(
                x, bp["ln_3"]["scale"], bp["ln_3"]["bias"],
                bp["timeattn"]["qkv"]["kernel"].astype(dtype),
                bp["timeattn"]["qkv"]["bias"].astype(dtype),
                bp["timeattn"]["proj"]["kernel"].astype(dtype),
                bp["timeattn"]["proj"]["bias"].astype(dtype),
                num_frames=T, patches_per_frame=n_keep, num_heads=cfg.heads,
                chunk=time_chunk)
        else:
            tr = x + _var_attention_xla(_layernorm(x, bp["ln_3"]),
                                        bp["timeattn"], T, n_keep, "time",
                                        cfg.heads)
        if use_space:
            sr = fused_space_attention_block_v2(
                tr, x, bp["ln_1"]["scale"], bp["ln_1"]["bias"],
                bp["attn"]["qkv"]["kernel"].astype(dtype),
                bp["attn"]["qkv"]["bias"].astype(dtype),
                bp["attn"]["proj"]["kernel"].astype(dtype),
                bp["attn"]["proj"]["bias"].astype(dtype),
                num_frames=T, patches_per_frame=n_keep, num_heads=cfg.heads)
        else:
            sr = x + _var_attention_xla(_layernorm(tr, bp["ln_1"]),
                                        bp["attn"], T, n_keep, "space",
                                        cfg.heads)
        if use_mlp:
            x = fused_mlp_block(
                sr, bp["ln_2"]["scale"], bp["ln_2"]["bias"],
                bp["mlp"]["c_fc"]["kernel"].astype(dtype),
                bp["mlp"]["c_fc"]["bias"].astype(dtype),
                bp["mlp"]["c_proj"]["kernel"].astype(dtype),
                bp["mlp"]["c_proj"]["bias"].astype(dtype), act=cfg.act)
        else:
            x = sr + _mlp(_layernorm(sr, bp["ln_2"]), bp["mlp"], cfg.act)
    return _pool(params, cfg, x, dtype)[0]


def main():
    cfg = tvtsv2_b_16().eval_config().vision
    B = int(os.environ.get("B", "32"))
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(B, cfg.num_frames, 3, 224, 224))
                        .astype(np.float32))
    keep = jnp.asarray(np.tile(np.arange(cfg.patches_per_frame, dtype=np.int32),
                               (B, 1)))
    model = SpaceTimeViT(cfg, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), video, keep)["params"]

    cases = [("all_v2", (1, 1, 1)), ("time->xla", (0, 1, 1)),
             ("space->xla", (1, 0, 1)), ("mlp->xla", (1, 1, 0))]
    for name, (ut, us, um) in cases:
        fn = jax.jit(lambda p, v, k, ut=ut, us=us, um=um: forward(
            p, cfg, v, k, bool(ut), bool(us), bool(um)))
        float(jnp.sum(fn(params, video, keep)))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(params, video, keep) for _ in range(8)]
            float(jnp.sum(jnp.stack([jnp.sum(o) for o in outs])))
            best = min(best, (time.perf_counter() - t0) / 8)
        print(f"{name:>11}: {best*1e3:7.1f} ms  {B/best:6.1f} clips/s",
              flush=True)


if __name__ == "__main__":
    main()
