#!/usr/bin/env bash
# Mirrors reference v2/scripts/zero_ret_didemo_TVTSv2_ViT_B_16.sh
cd "$(dirname "$0")/../.."

python scripts/zero_ret_TVTSv2_ViT_B_16.py "$@" \
  --config tvts_tpu/configs/zero-didemo-vit-b-16.json

