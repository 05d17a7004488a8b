#!/usr/bin/env bash
# Mirrors reference v1/scripts/ft_ssv2.sh
cd "$(dirname "$0")/../.."

# Set the path to save checkpoints
OUTPUT_DIR=${OUTPUT_DIR:-results/TVTS_downstream/ft_ssv2}
# path to SSV2 set (train.csv/val.csv/test.csv)
DATA_PATH=${DATA_PATH:-data/SSV2}
# path to pretrain model
MODEL_PATH=${MODEL_PATH:-TVTS_yt_pt.pth}

python scripts/run_class_finetuning.py "$@" \
  --model vit_base_patch16_224 \
  --nb_classes 174 \
  --data_path "${DATA_PATH}" \
  --finetune "${MODEL_PATH}" \
  --output_dir "${OUTPUT_DIR}" \
  --batch_size 12 \
  --input_size 224 \
  --short_side_size 224 \
  --num_frames 16 \
  --lr 1e-3 \
  --weight_decay 0.05 \
  --epochs 50 \
  --test_num_segment 2 \
  --test_num_crop 3

if [ $? != 0 ]; then
  echo "Fail! Exit with 1"
  exit 1
else
  echo "Success! Exit with 0"
  exit 0
fi
