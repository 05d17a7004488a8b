#!/usr/bin/env bash
# Mirrors reference v2/scripts/train_dist_TVTSv2_ViT_B_32.sh
cd "$(dirname "$0")/../.."

python scripts/train_dist_TVTSv2_ViT_B_32.py "$@" \
  --config tvts_tpu/configs/dist-yt-web-pt-vit-b-32.json \
  --schedule 6 8

if [ $? != 0 ]; then
  echo "Fail! Exit with 1"
  exit 1
else
  echo "Success! Exit with 0"
  exit 0
fi
