#!/usr/bin/env python
"""TVTS v1 distributed pretraining driver.

Mirrors the reference v1/train_dist_TVTS.py: YT-Temporal (and optionally
CC3M+WebVid) pretraining of the MAE-init joint-attention ViT-B + DistilBERT
towers with single-group AdamW (config-driven lr/wd) and milestone LR decay.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description="TVTS v1 TPU pretraining")
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-r", "--resume", default=None)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)
    ap.add_argument("--schedule", type=int, nargs="*", default=[10])
    ap.add_argument("--fsdp", type=int, default=1)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--bert_vocab", default=None,
                    help="path to distilbert-base-uncased vocab.txt")
    ap.add_argument("--mae_init", default=None,
                    help="path to mae_pretrain_vit_base.pth for 2D->3D init")
    args = ap.parse_args()

    if args.coordinator:
        import jax

        jax.distributed.initialize(args.coordinator, args.num_processes,
                                   args.process_id)

    import jax
    import jax.numpy as jnp
    import optax

    from tvts_tpu.models.factory import init_params as _unused  # noqa: F401
    from tvts_tpu.models.tvts_v1 import TVTSv1, TVTSv1Config
    from tvts_tpu.parallel import create_mesh, shard_params
    from tvts_tpu.train.optim import milestone_scale_fn, OptimizerConfig
    from tvts_tpu.train.trainer import Trainer, wordpiece_tokenize_fn
    from tvts_tpu.utils.checkpoint import CheckpointManager
    from tvts_tpu.utils.config import ConfigParser, read_json
    import numpy as np

    config = ConfigParser(read_json(args.config), resume=args.resume)
    vp = config["arch"]["args"].get("video_params", {})
    cfg = TVTSv1Config(num_frames=vp.get("num_frames", 16))
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = TVTSv1(cfg, dtype=dtype)

    rng = np.random.default_rng(0)
    video = jnp.zeros((1, cfg.num_frames, 3, cfg.img_size, cfg.img_size))
    keep = jnp.asarray(rng.integers(0, cfg.patches_per_frame,
                                    size=(1, cfg.n_tubes, cfg.n_keep)).astype(np.int32))
    ids = jnp.zeros((cfg.num_clips, cfg.max_text_len), jnp.int32)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(0), video, ids, mask, keep)["params"]

    if args.mae_init:
        from tvts_tpu.utils.torch_convert import (
            convert_v1_state_dict, inflate_mae_2d_to_3d, load_torch_state_dict,
            merge_params)

        sd = inflate_mae_2d_to_3d(load_torch_state_dict(args.mae_init))
        sd = {f"video_model.{k}": v for k, v in sd.items()}
        params = merge_params(params, convert_v1_state_dict(sd), strict=False)
        print("video tower initialized from MAE IN-1K weights (2D->3D inflated)")
    lc = config["arch"]["args"].get("load_checkpoint")
    if lc:
        from tvts_tpu.utils.torch_convert import (
            convert_v1_state_dict, load_torch_state_dict, merge_params)

        params = merge_params(params, convert_v1_state_dict(
            load_torch_state_dict(lc)), strict=False)

    dl_specs = config["data_loader"]
    if isinstance(dl_specs, dict):
        dl_specs = [dl_specs]
    loaders = []
    for spec in dl_specs:
        spec["args"].setdefault("per_tube_masks", cfg.n_tubes)
        _, loader = config.initialize_dataset_loader(spec)
        loaders.append(loader)

    ocfg_json = config.get("optimizer", {"args": {}})["args"]
    steps_per_epoch = max(max(len(dl) for dl in loaders), 1) * len(loaders)
    scale = milestone_scale_fn(OptimizerConfig(
        schedule=tuple(args.schedule), steps_per_epoch=steps_per_epoch))
    base_lr = ocfg_json.get("lr", 1e-4)
    tx = optax.adamw(lambda step: base_lr * scale(step),
                     b1=ocfg_json.get("betas", [0.9, 0.999])[0],
                     b2=ocfg_json.get("betas", [0.9, 0.999])[1],
                     eps=1e-6, weight_decay=ocfg_json.get("weight_decay", 0.0))

    mesh = create_mesh(fsdp=args.fsdp, tp=args.tp)
    with mesh:
        params = shard_params(params, mesh)
        tcfg = config["trainer"]
        ckpt = CheckpointManager(config.save_dir, tcfg.get("save_period", 1),
                                 tcfg.get("monitor", "off"))
        trainer = Trainer(
            model, params, tx, loaders, [],
            epochs=tcfg.get("epochs", 16), mesh=mesh, ckpt_manager=ckpt,
            max_samples_per_epoch=tcfg.get("max_samples_per_epoch"),
            tokenize_fn=wordpiece_tokenize_fn(args.bert_vocab,
                                              max_length=cfg.max_text_len),
            epoch_loader=tcfg.get("epoch_loader"))
        trainer.train()


if __name__ == "__main__":
    main()
