#!/usr/bin/env bash
# Mirrors reference v1/scripts/train_yt.sh
cd "$(dirname "$0")/../.."

python scripts/train_dist_TVTS.py "$@" \
  --config tvts_tpu/configs/v1-dist-yt-pt.json

if [ $? != 0 ]; then
  echo "Fail! Exit with 1"
  exit 1
else
  echo "Success! Exit with 0"
  exit 0
fi
