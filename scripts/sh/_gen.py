#!/usr/bin/env python
"""Regenerate the launch-script surface (scripts/sh/*.sh).

Mirrors the reference's shell entry points (v2/scripts/*.sh, v1/scripts/*.sh)
one-for-one so the README reproduction commands can be pasted. Each script
invokes the parameterized TPU python drivers; multi-host SPMD flags
(--coordinator/--num_processes/--process_id) pass through via "$@" where the
reference forwarded torch.distributed.launch args the same way.
"""

import os
import stat

HERE = os.path.dirname(os.path.abspath(__file__))

HEADER = """#!/usr/bin/env bash
# Mirrors reference {ref}
cd "$(dirname "$0")/../.."

"""

FOOTER = """
if [ $? != 0 ]; then
  echo "Fail! Exit with 1"
  exit 1
else
  echo "Success! Exit with 0"
  exit 0
fi
"""


def write(name, ref, body, footer=True):
    path = os.path.join(HERE, name)
    with open(path, "w") as f:
        f.write(HEADER.format(ref=ref) + body + (FOOTER if footer else "\n"))
    os.chmod(path, os.stat(path).st_mode | stat.S_IXUSR | stat.S_IXGRP
             | stat.S_IXOTH)


TOWERS = [("B_16", "b-16"), ("B_32", "b-32"), ("H_14", "h-14")]

# ---- v2 pretrain (train ×3) -----------------------------------------------
for suff, cfg in TOWERS:
    write(
        f"train_dist_TVTSv2_ViT_{suff}.sh",
        f"v2/scripts/train_dist_TVTSv2_ViT_{suff}.sh",
        f"""python scripts/train_dist_TVTSv2_ViT_{suff}.py "$@" \\
  --config tvts_tpu/configs/dist-yt-web-pt-vit-{cfg}.json \\
  --schedule 6 8
""")

# ---- v2 zero-shot retrieval (3 datasets × 3 towers) ------------------------
for ds in ("msrvtt", "didemo", "lsmdc"):
    for suff, cfg in TOWERS:
        write(
            f"zero_ret_{ds}_TVTSv2_ViT_{suff}.sh",
            f"v2/scripts/zero_ret_{ds}_TVTSv2_ViT_{suff}.sh",
            f"""python scripts/zero_ret_TVTSv2_ViT_{suff}.py "$@" \\
  --config tvts_tpu/configs/zero-{ds}-vit-{cfg}.json
""", footer=False)

# ---- v2 zero-shot recognition (3 datasets × 3 towers) ----------------------
for ds in ("hmdb51", "ucf101", "k400"):
    for suff, cfg in TOWERS:
        write(
            f"zero_recognition_{ds}_TVTSv2_ViT_{suff}.sh",
            f"v2/scripts/zero_recognition_{ds}_TVTSv2_ViT_{suff}.sh",
            f"""python scripts/zero_recognition_TVTSv2_ViT_{suff}.py "$@" \\
  --config tvts_tpu/configs/zero-{ds}-vit-{cfg}.json \\
  --dataset {ds}
""", footer=False)

# ---- v2 SSV2 multiple-choice (×3) -----------------------------------------
for suff, cfg in TOWERS:
    write(
        f"zero_ssv2_mc_TVTSv2_ViT_{suff}.sh",
        f"v2/scripts/zero_ssv2_mc_TVTSv2_ViT_{suff}.sh",
        f"""python scripts/zero_ssv2_mc_TVTSv2_ViT_{suff}.py "$@" \\
  --config tvts_tpu/configs/zero-ssv2-mc-vit-{cfg}.json
""", footer=False)

# ---- v2 single-video feature extraction (×3) ------------------------------
for suff, _ in TOWERS:
    write(
        f"feature_extraction_TVTSv2_{suff}.sh",
        f"v2/downstream/feature_extraction_TVTSv2_{suff}.py (no .sh upstream)",
        f"""# VIDEO_PATH: input .mp4; CKPT: converted TVTSv2 checkpoint
VIDEO_PATH=${{VIDEO_PATH:-demo.mp4}}
CKPT=${{CKPT:-TVTSv2_ViT_{suff}.pth}}

python scripts/feature_extraction_TVTSv2_{suff}.py "$@" \\
  --video_path "${{VIDEO_PATH}}" \\
  --load_checkpoint "${{CKPT}}"
""", footer=False)

# ---- v1 -------------------------------------------------------------------
write("train_yt.sh", "v1/scripts/train_yt.sh",
      """python scripts/train_dist_TVTS.py "$@" \\
  --config tvts_tpu/configs/v1-dist-yt-pt.json
""")

write("train_cc_web.sh", "v1/scripts/train_cc_web.sh",
      """python scripts/train_dist_TVTS.py "$@" \\
  --config tvts_tpu/configs/v1-dist-cc-web-pt.json
""")

V1_COMMON = """# Set the path to save checkpoints
OUTPUT_DIR=${{OUTPUT_DIR:-results/TVTS_downstream/{job}}}
# path to SSV2 set (train.csv/val.csv/test.csv)
DATA_PATH=${{DATA_PATH:-data/SSV2}}
# path to pretrain model
MODEL_PATH=${{MODEL_PATH:-TVTS_yt_pt.pth}}

python scripts/{driver} "$@" \\
  --model vit_base_patch16_224 \\
  --nb_classes 174 \\
  --data_path "${{DATA_PATH}}" \\
  --finetune "${{MODEL_PATH}}" \\
  --output_dir "${{OUTPUT_DIR}}" \\
  --batch_size 12 \\
  --input_size 224 \\
  --short_side_size 224 \\
  --num_frames 16 \\
{extra}  --test_num_segment 2 \\
  --test_num_crop 3
"""

write("ft_ssv2.sh", "v1/scripts/ft_ssv2.sh",
      V1_COMMON.format(job="ft_ssv2", driver="run_class_finetuning.py",
                       extra="  --lr 1e-3 \\\n  --weight_decay 0.05 \\\n"
                             "  --epochs 50 \\\n"))
write("linear_ssv2.sh", "v1/scripts/linear_ssv2.sh",
      V1_COMMON.format(job="linear_ssv2", driver="run_class_linear.py",
                       extra="  --lr 0.1 \\\n  --weight_decay 1e-9 \\\n"
                             "  --warmup_epochs 10 \\\n  --epochs 100 \\\n"))
write("zero_ssv2.sh", "v1/scripts/zero_ssv2.sh",
      V1_COMMON.format(job="zero_ssv2", driver="run_class_zero.py", extra=""))

print("generated", len(os.listdir(HERE)) - 1, "launch scripts in", HERE)
