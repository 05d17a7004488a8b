#!/usr/bin/env bash
# Mirrors reference v2/scripts/zero_recognition_hmdb51_TVTSv2_ViT_B_16.sh
cd "$(dirname "$0")/../.."

python scripts/zero_recognition_TVTSv2_ViT_B_16.py "$@" \
  --config tvts_tpu/configs/zero-hmdb51-vit-b-16.json \
  --dataset hmdb51

