"""Fine-tuning engine: cosine schedules, layer-wise LR decay, soft-target CE,
multi-view test merging.

Behavioral contracts:
- per-step cosine LR + WD schedules with linear warmup
  (v1/downstream/utils.py `cosine_scheduler`, engine_for_finetuning.py:48-53)
- layer-wise LR decay: scale lr by decay^(num_layers - layer_id) where patch
  embed is layer 0, block i is layer i+1, head is num_layers+1
  (optim_factory.py `LayerDecayValueAssigner`/`get_num_layer_for_vit`)
- losses: SoftTargetCrossEntropy under mixup, LabelSmoothingCrossEntropy else
  (run_class_finetuning.py / timm.loss)
- final_test/merge: per-view logits averaged per video, then top-1/5
  (engine_for_finetuning.py:178-283) — here an in-memory accumulation instead of
  the reference's per-rank files + filesystem barrier
- linear probe: freeze everything but the head (+ fc_norm), run_class_linear.py
  diff at :341-346.

bf16 on TPU replaces the reference's AMP + NativeScalerWithGradNormCount; the
grad-norm clip is kept (optax.clip_by_global_norm).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tvts_tpu.train.step import TrainState



def cosine_schedule(base_value: float, final_value: float, epochs: int,
                    steps_per_epoch: int, warmup_epochs: int = 0,
                    warmup_start: float = 1e-6) -> Callable:
    """Per-step cosine schedule with linear warmup (utils.py cosine_scheduler)."""
    warmup_steps = int(warmup_epochs * steps_per_epoch)
    total = int(epochs * steps_per_epoch)

    def fn(step):
        step = jnp.minimum(step, total - 1)
        warm = warmup_start + (base_value - warmup_start) * step / max(warmup_steps, 1)
        prog = (step - warmup_steps) / max(total - warmup_steps, 1)
        cos = final_value + 0.5 * (base_value - final_value) * (1 + jnp.cos(math.pi * prog))
        return jnp.where(step < warmup_steps, warm, cos)

    return fn


def layer_id_for_param(path: tuple[str, ...], num_layers: int) -> int:
    """get_num_layer_for_vit semantics (optim_factory.py:26-38)."""
    top = path[0]
    if top in ("cls_token", "mask_token", "pos_embed", "patch_embed"):
        return 0
    if top.startswith("blocks_"):
        return int(top.split("_")[1]) + 1
    return num_layers + 1  # norm/fc_norm/head


NO_WD_PARAMS = {"pos_embed", "cls_token", "temporal_embed"}


def make_finetune_optimizer(params, lr: float, weight_decay: float,
                            epochs: int, steps_per_epoch: int,
                            warmup_epochs: int = 5, min_lr: float = 1e-6,
                            layer_decay: float = 0.75, num_layers: int = 12,
                            clip_grad: float | None = 5.0,
                            betas=(0.9, 0.999),
                            linear_probe: bool = False):
    """Layer-decayed AdamW with cosine LR; linear_probe freezes all but
    head/fc_norm (run_class_linear.py:341-346)."""
    lr_fn = cosine_schedule(lr, min_lr, epochs, steps_per_epoch, warmup_epochs)

    def label(path, value):
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        if linear_probe:
            if keys[0] in ("head", "fc_norm"):
                lid = num_layers + 1
            else:
                return "frozen"
        else:
            lid = layer_id_for_param(keys, num_layers)
        nd = (keys[-1] == "bias" or np.ndim(value) <= 1
              or keys[0] in NO_WD_PARAMS)
        return f"l{lid}_{'nd' if nd else 'wd'}"

    labels = jax.tree_util.tree_map_with_path(label, params)
    scales = {}
    flat_labels = set(jax.tree_util.tree_leaves(labels))
    transforms = {}
    for lab in flat_labels:
        if lab == "frozen":
            transforms[lab] = optax.set_to_zero()
            continue
        lid = int(lab[1:].split("_")[0])
        scale = layer_decay ** (num_layers + 1 - lid)
        wd = weight_decay if lab.endswith("_wd") else 0.0
        chain = []
        if clip_grad:
            chain.append(optax.clip_by_global_norm(clip_grad))
        chain.append(optax.adamw(lambda s, sc=scale: lr_fn(s) * sc,
                                 b1=betas[0], b2=betas[1], eps=1e-8,
                                 weight_decay=wd))
        transforms[lab] = optax.chain(*chain)
        scales[lab] = scale
    return optax.multi_transform(transforms, labels), scales


def soft_ce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """SoftTargetCrossEntropy: targets are probabilities [B, C]."""
    return jnp.mean(jnp.sum(-targets * jax.nn.log_softmax(logits, axis=-1), axis=-1))


def make_cls_train_step(model, tx, donate: bool = True):
    def step(state: TrainState, video, targets):
        def loss_fn(params):
            logits = model.apply({"params": params}, video)
            return soft_ce(logits, targets)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_cls_eval_step(model):
    @jax.jit
    def step(params, video):
        return model.apply({"params": params}, video)

    return step


class EmaParams:
    """Model EMA (reference uses timm ModelEma, decay 0.9999)."""

    def __init__(self, params, decay: float = 0.9999):
        self.decay = decay
        self.params = jax.tree.map(jnp.copy, params)
        self._update = jax.jit(lambda ema, p, d: jax.tree.map(
            lambda e, q: e * d + q * (1.0 - d), ema, p))

    def update(self, params):
        self.params = self._update(self.params, params, self.decay)


class MultiViewAccumulator:
    """final_test/merge: average per-view logits per video, then top-1/5."""

    def __init__(self, num_samples: int, num_classes: int):
        self.sum = np.zeros((num_samples, num_classes), dtype=np.float64)
        self.count = np.zeros(num_samples, dtype=np.int64)
        self.labels = np.full(num_samples, -1, dtype=np.int64)

    def add(self, sample_idx, logits, labels):
        logits = np.asarray(logits, dtype=np.float64)
        for i, s in enumerate(np.asarray(sample_idx)):
            self.sum[s] += logits[i]
            self.count[s] += 1
            self.labels[s] = labels[i]

    def merge(self):
        mask = self.count > 0
        avg = self.sum[mask] / self.count[mask, None]
        labels = self.labels[mask]
        pred = np.argsort(-avg, axis=1)
        top1 = float(np.mean(pred[:, 0] == labels))
        top5 = float(np.mean(np.any(pred[:, :5] == labels[:, None], axis=1)))
        return {"top1": top1, "top5": top5, "n": int(mask.sum())}
