#!/usr/bin/env bash
# Mirrors reference v2/scripts/zero_ret_msrvtt_TVTSv2_ViT_B_16.sh
cd "$(dirname "$0")/../.."

python scripts/zero_ret_TVTSv2_ViT_B_16.py "$@" \
  --config tvts_tpu/configs/zero-msrvtt-vit-b-16.json

