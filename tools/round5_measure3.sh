#!/bin/bash
# Round-5 phase 2b: the text kernel with the dx-only frozen backward +
# rpp sweep + per-arch text-kernel adoption checks + B=20 tower split.
set -x
cd "$(dirname "$0")/.."

echo "=== [1] B/16 B=20: text pallas + tune_from frozen backward"
TVTS_TPU_TRAIN_FUSED=1 TVTS_KERNEL_PRESET=best TVTS_TEXT_MODE=pallas \
  timeout 2400 python tools/train_bench.py -B 20

echo "=== [2] rpp sweep"
for R in 8 16; do
  TVTS_TPU_TRAIN_FUSED=1 TVTS_KERNEL_PRESET=best TVTS_TEXT_MODE=pallas \
    TVTS_TEXT_RPP=$R timeout 2400 python tools/train_bench.py -B 20
done

echo "=== [3] tower sub-path split at B=20 (v10/tps vs the v3-era rows)"
B=20 SFPP=4 CASES=space/v10,time/tps,time/fused,space/v3,mlp/xla \
  timeout 3000 python tools/bwd_split_probe.py

echo "=== [4] H/14 train with the fused text tower (24L, 18 frozen)"
TVTS_TPU_TRAIN_FUSED=1 TVTS_SAVE_ACTS=0 TVTS_TIME_MODE=xla \
  TVTS_TEXT_MODE=pallas timeout 3000 python tools/train_bench.py \
  --arch TVTSv2_H_14 -B 8 --bf16_state

echo "=== [5] B/32 train with the fused text tower"
TVTS_TPU_TRAIN_FUSED=1 TVTS_TEXT_MODE=pallas timeout 2400 \
  python tools/train_bench.py --arch TVTSv2_B_32 -B 32

echo "=== done"

echo "=== [6] optimizer in-step cost ablation (sgd0 vs adamw)"
TVTS_TPU_TRAIN_FUSED=1 TVTS_KERNEL_PRESET=best TVTS_TEXT_MODE=pallas \
  TVTS_OPT=sgd0 timeout 2400 python tools/train_bench.py -B 20

echo "=== [7] fixed adamw probe (chained in-graph)"
timeout 1800 python tools/adamw_probe.py

echo "=== done2"

echo "=== [8] trainer loop overhead, device-resident pool"
TVTS_TPU_TRAIN_FUSED=1 timeout 3000 python tools/trainer_overhead_bench.py \
  -B 20 --steps 40 --device_pool

echo "=== [9] trainer epoch, realistic host batches (pipelined input path)"
TVTS_TPU_TRAIN_FUSED=1 timeout 3000 python tools/trainer_overhead_bench.py \
  -B 20 --steps 40
echo "=== done3"
