#!/usr/bin/env bash
# Mirrors reference v2/scripts/zero_ret_msrvtt_TVTSv2_ViT_H_14.sh
cd "$(dirname "$0")/../.."

python scripts/zero_ret_TVTSv2_ViT_H_14.py "$@" \
  --config tvts_tpu/configs/zero-msrvtt-vit-h-14.json

