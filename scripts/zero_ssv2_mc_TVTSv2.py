#!/usr/bin/env python
"""SSV2 multiple-choice zero-shot eval (mirrors v2/downstream/zero_ssv2_mc_TVTSv2_ViT_*.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--load_checkpoint", default=None)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    from tvts_tpu.eval.zero_ssv2_mc import run_ssv2_mc
    from tvts_tpu.models.factory import build_model
    from tvts_tpu.utils.config import ConfigParser, read_json

    config = ConfigParser(read_json(args.config), test=True)
    ckpt = args.load_checkpoint or config["arch"]["args"].get("load_checkpoint")
    cfg, model, params = build_model(
        config["arch"]["type"], load_checkpoint=ckpt, eval_mode=True,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32)

    _, loader = config.initialize_dataset_loader(
        config["data_loader"], {"split": "test", "shuffle": False})
    run_ssv2_mc(model, params, loader, context_length=cfg.text.context_length)


if __name__ == "__main__":
    main()
