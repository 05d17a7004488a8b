#!/usr/bin/env python
"""Zero-shot text<->video retrieval (mirrors v2/downstream/zero_ret_TVTSv2_ViT_*.py).

Usage: python scripts/zero_ret_TVTSv2.py --config tvts_tpu/configs/zero-msrvtt-vit-b-16.json
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--sliding_window_stride", type=int, default=-1)
    ap.add_argument("--load_checkpoint", default=None)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--fused", action="store_true",
                    help="fused megakernel video forward (B towers)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from tvts_tpu.eval.zero_ret import run_retrieval
    from tvts_tpu.models.factory import build_model
    from tvts_tpu.utils.config import ConfigParser, read_json

    config = ConfigParser(read_json(args.config), test=True)
    ckpt = args.load_checkpoint or config["arch"]["args"].get("load_checkpoint")
    cfg, model, params = build_model(
        config["arch"]["type"], load_checkpoint=ckpt, eval_mode=True,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32)

    spec = config["data_loader"]
    overrides = {"split": "test", "shuffle": False}
    if args.sliding_window_stride != -1:
        overrides["sliding_window_stride"] = args.sliding_window_stride
    _, loader = config.initialize_dataset_loader(spec, overrides)

    run_retrieval(model, params, loader,
                  metric_names=tuple(config.get("metrics",
                                                ["t2v_metrics", "v2t_metrics"])),
                  sliding_window=args.sliding_window_stride != -1,
                  context_length=cfg.text.context_length, use_fused=args.fused)


if __name__ == "__main__":
    main()
