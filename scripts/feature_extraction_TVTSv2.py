#!/usr/bin/env python
"""Single-video feature extraction (mirrors v2/downstream/feature_extraction_TVTSv2_*.py).

Usage: python scripts/feature_extraction_TVTSv2.py --arch TVTSv2_B_16 \
           --load_checkpoint TVTSv2_ViT_B_16.pth --video_path demo.mp4
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    from tvts_tpu.models.configs import MODEL_REGISTRY

    ap.add_argument("--arch", default="TVTSv2_B_16",
                    choices=sorted(MODEL_REGISTRY))
    ap.add_argument("--video_path", required=True)
    ap.add_argument("--load_checkpoint", default=None)
    ap.add_argument("--out", default=None, help="save embedding to .npy")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--fast_pipeline", action="store_true",
                    help="decode-side resize + on-device normalization")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from tvts_tpu.eval.feature_extraction import extract_video_feature
    from tvts_tpu.models.factory import build_model

    cfg, model, params = build_model(
        args.arch, load_checkpoint=args.load_checkpoint, eval_mode=True,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    emb = extract_video_feature(model, params, args.video_path,
                                use_fused=args.fused,
                                fast_pipeline=args.fast_pipeline)
    print(f"video embedding shape: {emb.shape}")
    print(emb[0, :8])
    if args.out:
        np.save(args.out, emb)


if __name__ == "__main__":
    main()
