#!/bin/bash
# Round-5 phase 2: measure the new train-step levers (sort tail trim,
# frozen-text dW skip, fused text kernel) + the optimizer anatomy.
# Sequential — the tunnel serializes dispatches.
set -x
cd "$(dirname "$0")/.."

echo "=== [1] B/16 train, all round-5 defaults (sort trim + freeze), B=20"
TVTS_TPU_TRAIN_FUSED=1 TVTS_KERNEL_PRESET=best timeout 2400 \
  python tools/train_bench.py -B 20

echo "=== [2] + fused text kernel"
TVTS_TPU_TRAIN_FUSED=1 TVTS_KERNEL_PRESET=best TVTS_TEXT_MODE=pallas \
  timeout 2400 python tools/train_bench.py -B 20

echo "=== [3] A/B: round-4 state (no sort trim, no freeze) — drift check"
TVTS_TPU_TRAIN_FUSED=1 TVTS_KERNEL_PRESET=best TVTS_SORT_TAIL=0 \
  TVTS_FREEZE=0 timeout 2400 python tools/train_bench.py -B 20

echo "=== [4] adamw probe (fixed shapes)"
timeout 1800 python tools/adamw_probe.py

echo "=== [5] non-tower split with the new defaults (sort trim visible)"
TB=20 timeout 2400 python tools/other_split_probe.py

echo "=== [6] batch re-sweep with the new levers"
for B in 16 24 28; do
  TVTS_TPU_TRAIN_FUSED=1 TVTS_KERNEL_PRESET=best TVTS_TEXT_MODE=pallas \
    timeout 2400 python tools/train_bench.py -B $B
done

echo "=== [7] trainer overhead vs raw step (VERDICT r4 #2 re-measure)"
TVTS_TPU_TRAIN_FUSED=1 timeout 3000 python tools/trainer_overhead_bench.py \
  -B 20 --steps 40

echo "=== done"
