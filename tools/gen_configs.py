#!/usr/bin/env python
"""Generate the shipped config JSONs (same schema as the reference's
v2/configs/*.json and v2/downstream/configs/zero-*.json)."""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "tvts_tpu", "configs")

VARIANTS = {
    "b-32": {"arch": "TVTSv2_B_32", "patches": 196, "pt_mask": 0.0},
    "b-16": {"arch": "TVTSv2_B_16", "patches": 196, "pt_mask": 0.5},
    "h-14": {"arch": "TVTSv2_H_14", "patches": 256, "pt_mask": 0.7},
}

EVAL_DATASETS = {
    "msrvtt": {"dataset_name": "MSRVTT", "data_dir": "data/msrvtt", "cut": "jsfusion"},
    "didemo": {"dataset_name": "DiDeMo", "data_dir": "data/didemo"},
    "lsmdc": {"dataset_name": "LSMDC", "data_dir": "data/lsmdc"},
    "hmdb51": {"dataset_name": "HMDB51", "data_dir": "data/hmdb51"},
    "ucf101": {"dataset_name": "UCF101", "data_dir": "data/ucf101"},
    "k400": {"dataset_name": "Kinetics400", "data_dir": "data/k400"},
    "ssv2-mc": {"dataset_name": "SSV2_mc", "data_dir": "data/ssv2"},
}


def loader_spec(dataset_name, data_dir, patches, mask, num_frames, batch_size,
                split, cut=None, loading="strict", shuffle=False):
    args = {
        "dataset_name": dataset_name,
        "data_dir": data_dir,
        "reader": "auto",
        "patches_per_frame": patches,
        "mask_ratio": mask,
        "shuffle": shuffle,
        "num_workers": 16,
        "batch_size": batch_size,
        "split": split,
        "subsample": 1,
        "text_params": {"input": "text"},
        "video_params": {"input_res": 224, "num_frames": num_frames,
                         "loading": loading},
    }
    if cut:
        args["cut"] = cut
    return {"type": "ShardedLoader", "args": args}


def pretrain_config(key):
    v = VARIANTS[key]
    return {
        "name": f"yttemporal-{key}",
        "arch": {"type": v["arch"], "args": {"load_checkpoint": ""}},
        "data_loader": [
            loader_spec("YTTemporal", "data/YTTemporal", v["patches"], v["pt_mask"],
                        3, 12, "train", loading="lax", shuffle=True),
            loader_spec("WebVid", "data/WebVid", v["patches"], v["pt_mask"],
                        12, 12, "train", loading="lax", shuffle=True),
        ],
        "loss": {"type": "NormSoftmaxLoss", "args": {}},
        "metrics": ["t2v_metrics", "v2t_metrics"],
        "trainer": {
            "epochs": 10,
            "max_samples_per_epoch": 1000000,
            "save_dir": "./results/TVTSv2",
            "save_period": 1,
            "monitor": "min val_loss_0",
            "init_val": True,
        },
        "visualizer": {"type": ""},
    }


def eval_config(ds_key, var_key):
    v = VARIANTS[var_key]
    d = EVAL_DATASETS[ds_key]
    ckpt = f"TVTSv2_ViT_{v['arch'].split('_', 1)[1]}.pth"
    return {
        "name": d["dataset_name"],
        "arch": {"type": v["arch"], "args": {"load_checkpoint": ckpt}},
        "sliding_window_stride": -1,
        "data_loader": loader_spec(
            d["dataset_name"], d["data_dir"], v["patches"], 0, 12,
            24 if var_key == "h-14" else 48, "test", cut=d.get("cut")),
        "loss": {"type": "NormSoftmaxLoss", "args": {}},
        "metrics": ["t2v_metrics", "v2t_metrics"],
        "trainer": {"save_dir": "exps"},
        "visualizer": {"type": ""},
    }


def main():
    os.makedirs(OUT, exist_ok=True)
    for key in VARIANTS:
        path = os.path.join(OUT, f"dist-yt-web-pt-vit-{key}.json")
        with open(path, "w") as f:
            json.dump(pretrain_config(key), f, indent=2)
    for ds in EVAL_DATASETS:
        for key in VARIANTS:
            path = os.path.join(OUT, f"zero-{ds}-vit-{key}.json")
            with open(path, "w") as f:
                json.dump(eval_config(ds, key), f, indent=2)
    print(f"wrote {len(VARIANTS) * (1 + len(EVAL_DATASETS))} configs to {OUT}")


if __name__ == "__main__":
    main()
