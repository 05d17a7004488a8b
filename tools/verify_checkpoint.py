#!/usr/bin/env python
"""Checkpoint-parity workflow: load a released TVTSv2 `.pth`, extract a video
embedding, and (optionally) compare against a reference-side embedding.

Usage:
  python tools/verify_checkpoint.py --arch TVTSv2_B_16 \
      --checkpoint TVTSv2_ViT_B_16.pth --video demo.mp4 \
      [--reference_npy ref_embed.npy]

With --reference_npy (an embedding produced by the reference torch code on the
same video), prints cosine similarity and max abs diff — the acceptance check
for end-to-end numerical parity on real weights.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="TVTSv2_B_16")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--video", required=True)
    ap.add_argument("--reference_npy", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np

    from tvts_tpu.eval.feature_extraction import extract_video_feature
    from tvts_tpu.models.factory import build_model

    cfg, model, params = build_model(args.arch, load_checkpoint=args.checkpoint,
                                     eval_mode=True, strict=True)
    emb = extract_video_feature(model, params, args.video)
    print(f"embedding shape {emb.shape}; first 8: {emb[0, :8]}")
    if args.out:
        np.save(args.out, emb)

    if args.reference_npy:
        ref = np.load(args.reference_npy).reshape(emb.shape)
        cos = float(np.sum(emb * ref) /
                    (np.linalg.norm(emb) * np.linalg.norm(ref)))
        print(f"cosine vs reference: {cos:.6f}")
        print(f"max abs diff: {np.abs(emb - ref).max():.6f}")
        assert cos > 0.999, "embedding parity check FAILED"
        print("parity check PASSED")


if __name__ == "__main__":
    main()
