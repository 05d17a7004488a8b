"""Optimizer: 4-group AdamW with frozen text layers and milestone LR decay.

Behavioral contract: reference v2/train_dist_TVTSv2_ViT_B_16.py:66-125 (H/14 diff at
train_dist_TVTSv2_ViT_H_14.py:69-79) and trainer.py:402-417 (`_adjust_learning_rate`):

- "new" params — inside the video tower only `timeattn`, `ln_3` (+ `ls_3` for H/14);
  everything outside the video/text towers (sort head): lr 1e-4.
- "clip" (pretrained) params — the rest of the video tower and the trainable slice of
  the text tower: lr 1e-7.
- weight decay 0.05, except 0 for params whose name contains bias/ln_/norm.
- text tower: only the last `text_tune_layers` resblocks train (3 for B/*, 6 for
  H/14); earlier resblocks are frozen (requires_grad=False ≙ zero updates here).
  Non-resblock text params (embeddings, ln_final, projection) stay trainable.
- LR decays by 0.1 at the END of each epoch listed in `schedule` (trainer.py:523),
  epochs 1-based: lr(epoch) = base * 0.1^|{m in schedule : m < epoch}|.

AdamW matches transformers.AdamW hyperparameters (betas (0.9, 0.999), eps 1e-6,
decoupled weight decay). The eps sits outside the bias-corrected sqrt in optax vs
inside the correction in HF — a sub-1e-6-scale difference, documented deviation.
"""

from __future__ import annotations

import dataclasses

import jax
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    lr_new: float = 1e-4
    lr_clip: float = 1e-7
    weight_decay: float = 0.05
    betas: tuple = (0.9, 0.999)
    eps: float = 1e-6
    text_layers: int = 12       # total text resblocks
    text_tune_layers: int = 3   # last-k trainable (3 for B/*, 6 for H/14)
    schedule: tuple = ()        # epoch milestones, e.g. (6, 8)
    steps_per_epoch: int = 1
    mu_dtype: str | None = None  # e.g. "bfloat16": halve the first-moment
                                 # state (single-chip H/14 probe; production
                                 # shards the f32 state over the fsdp axis)


NO_DECAY_SUBSTRINGS = ("bias", "ln_", "norm")


def _is_no_decay(name: str) -> bool:
    return any(s in name for s in NO_DECAY_SUBSTRINGS)


def label_params(params, cfg: OptimizerConfig):
    """Pytree of group labels: new_decay / new_nodecay / clip_decay / clip_nodecay /
    frozen — replicating the reference's named_parameters() walk."""
    tuned = {f"blocks_{i}" for i in range(cfg.text_layers - cfg.text_tune_layers,
                                          cfg.text_layers)}

    def label(path, _):
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        name = "/".join(keys)
        nd = _is_no_decay(name)
        if keys[0] == "video_model":
            if "timeattn" in name or "ln_3" in name or "ls_3" in name:
                return "new_nodecay" if nd else "new_decay"
            return "clip_nodecay" if nd else "clip_decay"
        if keys[0] == "text_model":
            if keys[1].startswith("blocks_"):
                if keys[1] in tuned:
                    return "clip_nodecay" if nd else "clip_decay"
                return "frozen"
            return "clip_nodecay" if nd else "clip_decay"
        return "new_nodecay" if nd else "new_decay"

    return jax.tree_util.tree_map_with_path(label, params)


def freeze_mask(params, cfg: OptimizerConfig):
    """Pytree of bools: True where the optimizer group is 'frozen' (zero
    updates). The train steps stop_gradient those leaves so XLA never emits
    their weight-gradient matmuls — the TPU-side analog of the reference's
    requires_grad=False (v2/train_dist_TVTSv2_ViT_B_16.py:82-90); activation
    gradients still flow through the frozen blocks (the token/positional
    embeddings BELOW them stay trainable)."""
    return jax.tree.map(lambda l: l == "frozen", label_params(params, cfg))


def milestone_scale_fn(cfg: OptimizerConfig):
    """Step -> LR multiplier. Decay by 0.1 applied after each milestone epoch ends."""
    boundaries = sorted(int(m) * cfg.steps_per_epoch for m in cfg.schedule)

    def scale(step):
        s = 1.0
        for b in boundaries:
            s = jax.numpy.where(step >= b, s * 0.1, s)
        return s

    return scale


def make_optimizer(params, cfg: OptimizerConfig) -> optax.GradientTransformation:
    scale = milestone_scale_fn(cfg)

    def adamw(base_lr, wd):
        return optax.adamw(
            learning_rate=lambda step: base_lr * scale(step),
            b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps, weight_decay=wd,
            mu_dtype=cfg.mu_dtype)

    transforms = {
        "new_decay": adamw(cfg.lr_new, cfg.weight_decay),
        "new_nodecay": adamw(cfg.lr_new, 0.0),
        "clip_decay": adamw(cfg.lr_clip, cfg.weight_decay),
        "clip_nodecay": adamw(cfg.lr_clip, 0.0),
        "frozen": optax.set_to_zero(),
    }
    labels = label_params(params, cfg)
    return optax.multi_transform(transforms, labels)
