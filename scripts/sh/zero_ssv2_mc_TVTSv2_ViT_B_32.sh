#!/usr/bin/env bash
# Mirrors reference v2/scripts/zero_ssv2_mc_TVTSv2_ViT_B_32.sh
cd "$(dirname "$0")/../.."

python scripts/zero_ssv2_mc_TVTSv2_ViT_B_32.py "$@" \
  --config tvts_tpu/configs/zero-ssv2-mc-vit-b-32.json

