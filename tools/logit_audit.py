#!/usr/bin/env python
"""Clamp-safety audit for the smv="cp" extraction softmax (VERDICT r4 #6).

The extraction-default max-free softmax (ops/pallas_block_attention.py,
smv="clamp"/"cp") is exact only while every attention logit <= SMV_CLAMP=70
(it elementwise-mins logits at 70; the binding bound is the p@v numerator
fitting f32, not exp overflow — see the SMV_CLAMP derivation).
This audits a CHECKPOINT: runs the XLA video tower with flax
capture_intermediates on the per-block qkv projections and reports the exact
per-layer max logit over the same divided-attention groups the kernels
compute (ops/attention.divided_attention_max_logit).

Rule (ops/kernel_config.py docstring): if any layer's max logit > 64
(safety margin under the 70 clamp), run extraction with TVTS_V9_SMV=pvones /
trainer.kernels.smv="pvones" instead — exact at any magnitude, ~9% slower.

Usage:
  python tools/logit_audit.py --arch TVTSv2_B_16                # fresh init
  python tools/logit_audit.py --arch TVTSv2_B_16 --checkpoint x.npz -B 8
Exit code 1 when the audit exceeds the threshold (scriptable gate).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

THRESHOLD = 64.0


def audit_video_tower(model, params, video, keep_ind=None):
    """Per-layer max attention logits of a SpaceTimeViT.

    Returns {layer_idx: {"time": float, "space": float}} computed exactly as
    the kernels see them (post-LN qkv, q scaled by d**-0.5, f32 logits).
    """
    import jax.numpy as jnp

    from tvts_tpu.ops.attention import (
        divided_attention_max_logit, split_heads)

    _, state = model.apply(
        {"params": params}, video, keep_ind,
        capture_intermediates=lambda mdl, _: mdl.name == "qkv")
    inter = state["intermediates"]

    cfg = model.cfg
    T = video.shape[1] if video.ndim == 5 else 1
    out = {}
    for i in range(cfg.layers):
        blk = inter[f"blocks_{i}"]
        out[i] = {}
        for attn_name, mode in (("timeattn", "time"), ("attn", "space")):
            qkv = blk[attn_name]["qkv"]["__call__"][0]  # [B, S, 3D]
            q, k, _ = jnp.split(qkv, 3, axis=-1)
            d = cfg.width // cfg.heads
            q = split_heads(q * (d ** -0.5), cfg.heads)
            k = split_heads(k, cfg.heads)
            N = (q.shape[2] - 1) // T
            out[i][mode] = float(divided_attention_max_logit(q, k, T, N, mode))
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--arch", default="TVTSv2_B_16")
    ap.add_argument("--checkpoint", default=None,
                    help=".npz export / orbax dir / torch .pth (fresh init "
                         "when omitted)")
    ap.add_argument("-B", type=int, default=4)
    ap.add_argument("--mask_ratio", type=float, default=0.0,
                    help="0 = extraction semantics (the clamp's domain)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--real_stats", action="store_true",
                    help="use ImageNet-normalized uniform pixels instead of "
                         "N(0,1) (closer to transform output statistics)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tvts_tpu.models.factory import build_model
    from tvts_tpu.models.space_time_vit import SpaceTimeViT

    cfg, _, params = build_model(args.arch, load_checkpoint=args.checkpoint,
                                 eval_mode=True, dtype=jnp.bfloat16,
                                 strict=False)
    v = cfg.vision
    model = SpaceTimeViT(v, dtype=jnp.bfloat16)
    rng = np.random.default_rng(args.seed)
    shape = (args.B, v.num_frames, 3, v.input_resolution, v.input_resolution)
    if args.real_stats:
        # pixels ~ U(0,1) through the CLIP normalize constants
        mean = np.array([0.48145466, 0.4578275, 0.40821073])
        std = np.array([0.26862954, 0.26130258, 0.27577711])
        pix = rng.random(shape).astype(np.float32)
        video = (pix - mean[None, None, :, None, None]) \
            / std[None, None, :, None, None]
    else:
        video = rng.normal(size=shape).astype(np.float32)
    video = jnp.asarray(video.astype(np.float32))
    keep = None
    if args.mask_ratio > 0:
        n_keep = int(v.patches_per_frame * (1 - args.mask_ratio))
        keep = jnp.asarray(np.stack(
            [rng.permutation(v.patches_per_frame)[:n_keep]
             for _ in range(args.B)]).astype(np.int32))

    report = audit_video_tower(model, params["video_model"], video, keep)
    worst = -np.inf
    print(f"{'layer':>5} {'time max':>10} {'space max':>10}")
    for i, row in report.items():
        print(f"{i:>5} {row['time']:>10.3f} {row['space']:>10.3f}")
        worst = max(worst, row["time"], row["space"])
    verdict = "SAFE for smv='cp'" if worst <= THRESHOLD else \
        f"UNSAFE — set smv='pvones' (exceeds the {THRESHOLD} margin)"
    print(f"max logit {worst:.3f} (clamp 70.0, margin {THRESHOLD}): {verdict}")
    sys.exit(0 if worst <= THRESHOLD else 1)


if __name__ == "__main__":
    main()
