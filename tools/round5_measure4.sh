#!/bin/bash
# Round-5 phase 2c: sort_mode=pallas + combined-best + final B sweep.
set -x
cd "$(dirname "$0")/.."

echo "=== [1] B/16 B=20: + sort_mode=pallas (full round-5 kernel stack)"
TVTS_TPU_TRAIN_FUSED=1 TVTS_KERNEL_PRESET=best TVTS_TEXT_MODE=pallas \
  TVTS_SORT_MODE=pallas timeout 2400 python tools/train_bench.py -B 20

echo "=== [2] sort-kernel-only A/B (xla text)"
TVTS_TPU_TRAIN_FUSED=1 TVTS_KERNEL_PRESET=best TVTS_SORT_MODE=pallas \
  timeout 2400 python tools/train_bench.py -B 20

echo "=== [3] full stack at B=24"
TVTS_TPU_TRAIN_FUSED=1 TVTS_KERNEL_PRESET=best TVTS_TEXT_MODE=pallas \
  TVTS_SORT_MODE=pallas timeout 2400 python tools/train_bench.py -B 24

echo "=== done4"
