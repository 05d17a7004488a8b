#!/usr/bin/env bash
# Mirrors reference v2/downstream/feature_extraction_TVTSv2_H_14.py (no .sh upstream)
cd "$(dirname "$0")/../.."

# VIDEO_PATH: input .mp4; CKPT: converted TVTSv2 checkpoint
VIDEO_PATH=${VIDEO_PATH:-demo.mp4}
CKPT=${CKPT:-TVTSv2_ViT_H_14.pth}

python scripts/feature_extraction_TVTSv2_H_14.py "$@" \
  --video_path "${VIDEO_PATH}" \
  --load_checkpoint "${CKPT}"

