#!/bin/bash
# Round-5 phase 2d: sort-kernel adoption checks on the other archs +
# sustained-train validation of the full round-5 kernel stack.
set -x
cd "$(dirname "$0")/.."

echo "=== [1] B/32 B=32 + sort kernel"
TVTS_TPU_TRAIN_FUSED=1 TVTS_SORT_MODE=pallas timeout 2400 \
  python tools/train_bench.py --arch TVTSv2_B_32 -B 32

echo "=== [2] H/14 B=8 + sort kernel (patch-token sort input)"
TVTS_TPU_TRAIN_FUSED=1 TVTS_SAVE_ACTS=0 TVTS_TIME_MODE=xla \
  TVTS_TEXT_MODE=pallas TVTS_SORT_MODE=pallas timeout 3000 \
  python tools/train_bench.py --arch TVTSv2_H_14 -B 8 --bf16_state

echo "=== [3] sustained 150-step run + resume replay, full round-5 stack"
TVTS_TPU_TRAIN_FUSED=1 TVTS_SPACE_MODE=pallas_v10 TVTS_SFPP=4 \
  TVTS_TIME_MODE=pallas_tps TVTS_TEXT_MODE=pallas TVTS_SORT_MODE=pallas \
  timeout 4800 python tools/sustained_train.py --steps 150 -B 16 \
  --ckpt_at 90 --resume_tail 30

echo "=== done5"
