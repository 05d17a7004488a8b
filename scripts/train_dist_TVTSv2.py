#!/usr/bin/env python
"""TVTSv2 distributed pretraining driver (covers ViT-B/32, B/16, H/14 by config).

Mirrors the reference entry points v2/train_dist_TVTSv2_ViT_{B_32,B_16,H_14}.py:
JSON config + CLI overrides (-lr/-bs, --schedule), YT-Temporal + WebVid joint
training, 4-group AdamW, milestone LR decay, init validation, checkpointing.

TPU-native launch: one process per host (`jax.distributed.initialize` when
--coordinator is given), SPMD over a dp/fsdp/tp mesh instead of
torch.distributed.launch per-GPU processes.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description="TVTSv2 TPU pretraining")
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-r", "--resume", default=None)
    ap.add_argument("--coordinator", default=None,
                    help="host:port for multi-host jax.distributed.initialize")
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)
    ap.add_argument("--schedule", type=int, nargs="*", default=[6, 8])
    ap.add_argument("--fsdp", type=int, default=1)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                    default=True, help="--no-bf16 runs f32 (exactness tests)")
    ap.add_argument("--fused_kernels", action="store_true",
                    help="video tower via the Pallas fwd+bwd megakernels; "
                         "runs under the dp/fsdp mesh via shard_map when the "
                         "data axes exceed 1 (grads parity-tested, loss "
                         "equality vs the XLA path in tests/test_fused_sharded)")
    ap.add_argument("-lr", "--learning_rate", type=float, default=None)
    ap.add_argument("-bs", "--batch_size", type=int, default=None)
    ap.add_argument("--clip_init", default=None,
                    help="path to a CLIP/OpenCLIP .pt state dict to initialize "
                         "the towers (the reference's clip.load init path)")
    args = ap.parse_args()

    if args.coordinator:
        import jax

        jax.distributed.initialize(args.coordinator, args.num_processes,
                                   args.process_id)

    import jax
    import jax.numpy as jnp

    from tvts_tpu.models.factory import build_model
    from tvts_tpu.parallel import create_mesh, shard_params
    from tvts_tpu.train.optim import OptimizerConfig, freeze_mask, make_optimizer
    from tvts_tpu.train.trainer import Trainer
    from tvts_tpu.utils.checkpoint import CheckpointManager
    from tvts_tpu.utils.config import ConfigParser, read_json

    config = ConfigParser(read_json(args.config), resume=args.resume)
    arch = config["arch"]["type"]

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    cfg, model, params = build_model(
        arch, load_checkpoint=config["arch"]["args"].get("load_checkpoint") or None,
        eval_mode=False, dtype=dtype, remat=(arch == "TVTSv2_H_14"), strict=False)

    if args.clip_init:
        # initialize from raw CLIP weights: visual tower via the in_proj->qkv
        # remap (model_dist_TVTSv2_*.py:33-45), text tower via the standard map;
        # space-time-only params (timeattn/ln_3/temporal_embedding) stay fresh
        from tvts_tpu.utils.torch_convert import (
            convert_clip_full, load_torch_state_dict, merge_params)

        sd = load_torch_state_dict(args.clip_init)
        params = merge_params(params, convert_clip_full(sd), strict=False)
        print(f"towers initialized from CLIP weights: {args.clip_init}")

    # data
    dl_specs = config["data_loader"]
    if isinstance(dl_specs, dict):
        dl_specs = [dl_specs]
    overrides = {}
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    loaders, val_loaders = [], []
    for spec in dl_specs:
        _, loader = config.initialize_dataset_loader(spec, overrides)
        loaders.append(loader)
        try:
            _, vloader = config.initialize_dataset_loader(
                spec, {**overrides, "split": "val", "shuffle": False})
            val_loaders.append(vloader)
        except Exception as e:
            print(f"no val split for {spec['args'].get('dataset_name')}: {e}")

    # optimizer (4-group AdamW, frozen text layers, milestone decay)
    steps_per_epoch = max(max(len(dl) for dl in loaders), 1)
    ocfg = OptimizerConfig(
        lr_new=args.learning_rate or 1e-4,
        text_layers=cfg.text.layers,
        text_tune_layers=6 if arch == "TVTSv2_H_14" else 3,
        schedule=tuple(args.schedule),
        steps_per_epoch=steps_per_epoch * len(loaders))
    tx = make_optimizer(params, ocfg)
    fmask = freeze_mask(params, ocfg)

    mesh = create_mesh(fsdp=args.fsdp, tp=args.tp)
    with mesh:
        params = shard_params(params, mesh)
        tcfg = config["trainer"]
        ckpt = CheckpointManager(config.save_dir, tcfg.get("save_period", 1),
                                 tcfg.get("monitor", "off"))
        from tvts_tpu.utils.logging import ScalarWriter, setup_logging

        setup_logging(str(config.log_dir), verbosity=tcfg.get("verbosity", 2))
        writer = ScalarWriter(str(config.log_dir),
                              tensorboard=tcfg.get("tensorboard", False))
        if tcfg.get("neptune"):
            # reference configs can request a Sacred/Neptune observer
            # (train_dist_TVTSv2_ViT_B_16.py:210-216); TPU pods have no
            # network trackers, so scalars go to the JSONL ScalarWriter (and
            # TensorBoard event files when trainer.tensorboard is set)
            import logging

            logging.getLogger(__name__).warning(
                "config requests neptune=true: no network trackers here; "
                "scalars are written to %s (JSONL / TensorBoard)",
                config.log_dir)
        visualizer = None
        if config.get("visualizer", {}).get("type"):
            from tvts_tpu.utils.visualizer import RetrievalVis

            visualizer = RetrievalVis(config["name"], str(config._web_log_dir))
        apply_fn = None
        if args.fused_kernels or tcfg.get("kernels", {}).get("fused"):
            from tvts_tpu.ops.fused_forward import make_fused_train_apply
            from tvts_tpu.ops.kernel_config import resolve_kernel_config

            # kernel modes resolve config-first (trainer.kernels.* keys,
            # per-arch preset tables in ops/kernel_config.py) with the
            # TVTS_* env vars as sweep-time overrides
            kcfg = resolve_kernel_config(arch, tcfg.get("kernels"))
            if kcfg.get("text_mode") == "pallas":
                # frozen text blocks take the dx-only kernel backward
                kcfg["text_tune_from"] = (ocfg.text_layers
                                          - ocfg.text_tune_layers)
            # pass the mesh so the fused tower shard_maps over the dp/fsdp
            # data axes (the wrapper is skipped automatically when every
            # data axis is size 1 — plain jit on a single chip)
            apply_fn = make_fused_train_apply(
                model, cfg, num_frames=cfg.vision.num_frames,
                n_keep=cfg.vision.n_keep, dtype=dtype, mesh=mesh, **kcfg)
            print(f"fused Pallas train kernels enabled: {kcfg}")
        trainer = Trainer(model, params, tx, loaders, val_loaders,
                          apply_fn=apply_fn, freeze_mask=fmask,
                          epochs=tcfg.get("epochs", 10), mesh=mesh,
                          ckpt_manager=ckpt, init_val=tcfg.get("init_val", False),
                          max_samples_per_epoch=tcfg.get("max_samples_per_epoch"),
                          context_length=cfg.text.context_length,
                          writer=writer, visualizer=visualizer,
                          temperature=config.get("loss", {}).get("args", {})
                          .get("temperature", 0.05),
                          epoch_loader=tcfg.get("epoch_loader"),
                          profile_dir=tcfg.get("profile_dir"),
                          profile_steps=tuple(tcfg.get("profile_steps",
                                                       (10, 13))))
        if args.resume:
            trainer.resume()
        trainer.train()


if __name__ == "__main__":
    main()
