#!/usr/bin/env bash
# Mirrors reference v2/scripts/zero_recognition_ucf101_TVTSv2_ViT_H_14.sh
cd "$(dirname "$0")/../.."

python scripts/zero_recognition_TVTSv2_ViT_H_14.py "$@" \
  --config tvts_tpu/configs/zero-ucf101-vit-h-14.json \
  --dataset ucf101

