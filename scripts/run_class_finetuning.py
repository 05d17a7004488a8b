#!/usr/bin/env python
"""Video classification fine-tuning / linear probe / zero-shot v2v retrieval.

Mirrors the reference v1/downstream/run_class_{finetuning,linear,zero}.py in one
driver: --mode finetune|linear|zero. VideoMAE recipe: mixup/cutmix + label
smoothing, layer-wise LR decay, per-step cosine LR with warmup, model EMA,
multi-view test merging.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def get_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="finetune",
                    choices=["finetune", "linear", "zero"])
    ap.add_argument("--model", default="vit_base_patch16_224")
    ap.add_argument("--embed_dim", type=int, default=768)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--patch_size", type=int, default=16)
    ap.add_argument("--data_path", required=True,
                    help="dir containing train.csv/val.csv/test.csv")
    ap.add_argument("--data_root", default="")
    ap.add_argument("--nb_classes", type=int, default=174)
    ap.add_argument("--num_frames", type=int, default=16)
    ap.add_argument("--input_size", type=int, default=224)
    ap.add_argument("--short_side_size", type=int, default=224)
    ap.add_argument("--batch_size", type=int, default=12)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--warmup_epochs", type=int, default=5)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--min_lr", type=float, default=1e-6)
    ap.add_argument("--weight_decay", type=float, default=0.05)
    ap.add_argument("--layer_decay", type=float, default=0.75)
    ap.add_argument("--clip_grad", type=float, default=5.0)
    ap.add_argument("--mixup", type=float, default=0.8)
    ap.add_argument("--cutmix", type=float, default=1.0)
    ap.add_argument("--smoothing", type=float, default=0.1)
    ap.add_argument("--model_ema", action="store_true")
    ap.add_argument("--test_num_segment", type=int, default=2)
    ap.add_argument("--test_num_crop", type=int, default=3)
    ap.add_argument("--finetune", default=None, help="pretrain checkpoint")
    ap.add_argument("--output_dir", default="./results/downstream")
    ap.add_argument("--use_flip", action="store_true",
                    help="horizontal flip aug (off for SSV2)")
    ap.add_argument("--bf16", action="store_true", default=True)
    args = ap.parse_args()
    return args


def main():
    args = get_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tvts_tpu.data.loader import ShardedLoader
    from tvts_tpu.downstream.cls_dataset import VideoClsDataset
    from tvts_tpu.downstream.engine import (
        EmaParams, MultiViewAccumulator, make_cls_eval_step,
        make_cls_train_step, make_finetune_optimizer)
    from tvts_tpu.downstream.mixup import Mixup, one_hot
    from tvts_tpu.downstream.model import FinetuneViT, load_pretrain_video_tower
    from tvts_tpu.train.step import create_train_state
    from tvts_tpu.utils.checkpoint import CheckpointManager

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    if args.mode == "zero":
        from tvts_tpu.downstream.zero_v2v import run_zero_v2v
        from tvts_tpu.models.joint_vit import JointViT

        model = JointViT(img_size=args.input_size, patch_size=args.patch_size,
                         embed_dim=args.embed_dim, depth=args.depth,
                         heads=args.heads, num_frames=args.num_frames,
                         dtype=dtype)
        video = jnp.zeros((1, args.num_frames, 3, args.input_size, args.input_size))
        params = model.init(jax.random.PRNGKey(0), video, None)["params"]
        if args.finetune:
            from tvts_tpu.utils.torch_convert import (
                convert_v1_state_dict, load_torch_state_dict, merge_params)

            loaded = convert_v1_state_dict(load_torch_state_dict(args.finetune))
            params = merge_params(params, loaded.get("video_model", loaded),
                                  strict=False)
        ds = VideoClsDataset(os.path.join(args.data_path, "val.csv"),
                             args.data_root, mode="validation",
                             num_frames=args.num_frames,
                             input_size=args.input_size,
                             short_side_size=args.short_side_size)
        loader = ShardedLoader(ds, args.batch_size, shuffle=False,
                               drop_last=False, num_workers=8)
        run_zero_v2v(model, params, loader,
                     embed_fn=jax.jit(lambda p, v: model.apply(
                         {"params": p}, v, None)[:, 0]))
        return

    model = FinetuneViT(num_classes=args.nb_classes, num_frames=args.num_frames,
                        img_size=args.input_size, patch_size=args.patch_size,
                        embed_dim=args.embed_dim, depth=args.depth,
                        heads=args.heads, dtype=dtype, remat=True)
    video = jnp.zeros((1, args.num_frames, 3, args.input_size, args.input_size))
    params = model.init(jax.random.PRNGKey(0), video)["params"]
    if args.finetune:
        from tvts_tpu.utils.torch_convert import load_torch_state_dict

        params = load_pretrain_video_tower(
            params, load_torch_state_dict(args.finetune), from_torch=True)
        print(f"initialized video tower from {args.finetune}")

    train_ds = VideoClsDataset(os.path.join(args.data_path, "train.csv"),
                               args.data_root, mode="train",
                               num_frames=args.num_frames,
                               input_size=args.input_size,
                               short_side_size=args.short_side_size,
                               use_flip=args.use_flip)
    val_ds = VideoClsDataset(os.path.join(args.data_path, "val.csv"),
                             args.data_root, mode="validation",
                             num_frames=args.num_frames,
                             input_size=args.input_size,
                             short_side_size=args.short_side_size)
    train_loader = ShardedLoader(train_ds, args.batch_size, shuffle=True,
                                 num_workers=16)
    val_loader = ShardedLoader(val_ds, args.batch_size, shuffle=False,
                               drop_last=False, num_workers=8)

    steps_per_epoch = max(len(train_loader), 1)
    tx, _ = make_finetune_optimizer(
        params, args.lr, args.weight_decay, args.epochs, steps_per_epoch,
        warmup_epochs=args.warmup_epochs, min_lr=args.min_lr,
        layer_decay=args.layer_decay, num_layers=model.depth,
        clip_grad=args.clip_grad, linear_probe=args.mode == "linear")
    state = create_train_state(jax.tree.map(jnp.copy, params), tx)
    train_step = make_cls_train_step(model, tx)
    eval_step = make_cls_eval_step(model)
    mixup = Mixup(args.mixup, args.cutmix, label_smoothing=args.smoothing,
                  num_classes=args.nb_classes) if args.mixup > 0 else None
    ema = EmaParams(params) if args.model_ema else None
    ckpt = CheckpointManager(args.output_dir, save_period=10, monitor="max top1")

    for epoch in range(1, args.epochs + 1):
        train_loader.set_epoch(epoch)
        for i, batch in enumerate(train_loader):
            video_np, labels = batch["video"], np.asarray(batch["label"])
            if mixup is not None:
                video_np, targets = mixup(video_np, labels)
            else:
                targets = one_hot(labels, args.nb_classes, args.smoothing)
            state, loss = train_step(state, jnp.asarray(video_np),
                                     jnp.asarray(targets))
            if ema is not None:
                ema.update(state.params)
            if i % 50 == 0:
                print(f"epoch {epoch} [{i}/{steps_per_epoch}] "
                      f"loss {float(loss):.4f}", flush=True)

        # validation
        correct = total = 0
        for batch in val_loader:
            logits = np.asarray(eval_step(state.params,
                                          jnp.asarray(batch["video"])))
            n = len(batch["label"])
            correct += int(np.sum(np.argmax(logits[:n], 1) ==
                                  np.asarray(batch["label"])))
            total += n
        top1 = correct / max(total, 1)
        print(f"epoch {epoch}: val top1 {100 * top1:.2f}%", flush=True)
        ckpt.save_epoch(epoch, {"params": state.params}, {"top1": top1})

    # multi-view final test
    test_csv = os.path.join(args.data_path, "test.csv")
    if os.path.exists(test_csv):
        test_ds = VideoClsDataset(test_csv, args.data_root, mode="test",
                                  num_frames=args.num_frames,
                                  input_size=args.input_size,
                                  short_side_size=args.short_side_size,
                                  test_num_segment=args.test_num_segment,
                                  test_num_crop=args.test_num_crop)
        test_loader = ShardedLoader(test_ds, args.batch_size, shuffle=False,
                                    drop_last=False, num_workers=8)
        acc = MultiViewAccumulator(len(test_ds.samples), args.nb_classes)
        for batch in test_loader:
            logits = np.asarray(eval_step(state.params,
                                          jnp.asarray(batch["video"])))
            n = len(batch["label"])
            acc.add(batch["sample_index"][:n], logits[:n],
                    np.asarray(batch["label"])[:n])
        res = acc.merge()
        print(f"final test (multi-view merged): top1 {100 * res['top1']:.2f}% "
              f"top5 {100 * res['top5']:.2f}% over {res['n']} videos")


if __name__ == "__main__":
    main()
