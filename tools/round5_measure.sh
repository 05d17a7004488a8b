#!/bin/bash
# Round-5 sequential TPU measurement batch (one job at a time — the tunnel
# serializes dispatches, and concurrent compiles skew timings).
set -x
cd "$(dirname "$0")/.."

echo "=== [1] B/16 train baseline (best preset), B=20"
TVTS_TPU_TRAIN_FUSED=1 TVTS_SPACE_MODE=pallas_v10 TVTS_SFPP=4 \
  TVTS_TIME_MODE=pallas_tps timeout 2400 python tools/train_bench.py -B 20

echo "=== [2] non-tower split at B=20"
TB=20 timeout 2400 python tools/other_split_probe.py

echo "=== [3] text tower anatomy at B=20"
TB=20 timeout 2400 python tools/text_split_probe.py

echo "=== [4] adamw probe"
timeout 1800 python tools/adamw_probe.py

echo "=== [5] B/32 extraction refresh (round-4 kernel gen: time smv=cp default)"
timeout 2400 python tools/b32_bench.py --batch 32

echo "=== [6] B/32 train refresh"
TVTS_TPU_TRAIN_FUSED=1 timeout 2400 python tools/train_bench.py \
  --arch TVTSv2_B_32 -B 32

echo "=== [7] H/14 extraction refresh (kv7 + sfpp2 + CLS-only tail)"
timeout 3000 python tools/h14_bench.py --kv 7 --sfpp 2 --tokens 0 --batch 8

echo "=== [8] H/14 train refresh (fused-space hybrid)"
TVTS_TPU_TRAIN_FUSED=1 TVTS_SAVE_ACTS=0 TVTS_TIME_MODE=xla \
  timeout 3000 python tools/train_bench.py --arch TVTSv2_H_14 -B 8 --bf16_state

echo "=== done"
