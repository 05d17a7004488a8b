#!/usr/bin/env python
"""Zero-shot action recognition (mirrors v2/downstream/zero_recognition_TVTSv2_ViT_*.py).

Builds an 'a person {}' prompt classifier from meta_data/<ds>/prompt/label2id.json.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--dataset", default=None,
                    choices=[None, "ucf101", "hmdb51", "k400"])
    ap.add_argument("--load_checkpoint", default=None)
    ap.add_argument("--meta_root", default="meta_data")
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    from tvts_tpu.eval.zero_recognition import load_label2id, run_recognition
    from tvts_tpu.models.factory import build_model
    from tvts_tpu.utils.config import ConfigParser, read_json

    config = ConfigParser(read_json(args.config), test=True)
    ckpt = args.load_checkpoint or config["arch"]["args"].get("load_checkpoint")
    cfg, model, params = build_model(
        config["arch"]["type"], load_checkpoint=ckpt, eval_mode=True,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32)

    _, loader = config.initialize_dataset_loader(
        config["data_loader"], {"split": "test", "shuffle": False})

    ds = args.dataset or config["data_loader"]["args"]["dataset_name"].lower()
    ds = {"kinetics400": "k400"}.get(ds, ds)
    label2id = load_label2id(os.path.join(args.meta_root, ds, "prompt",
                                          "label2id.json"))
    # classifier columns in the json's key order, exactly like the reference
    # (zero_recognition_...py:62-64 uses list(label2id.keys()))
    classnames = list(label2id.keys())
    run_recognition(model, params, loader, classnames,
                    context_length=cfg.text.context_length)


if __name__ == "__main__":
    main()
