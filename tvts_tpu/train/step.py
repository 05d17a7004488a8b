"""Functional training / evaluation steps.

Behavioral contract: reference v2/trainer/trainer.py:463-499 (one optimizer step per
dataloader per batch): forward -> all_gather embeds -> sim_matrix(video, text) ->
NormSoftmaxLoss + 2x sort cross-entropy -> backward -> AdamW step.

TPU-first notes: under jit with a device mesh, `video_emb`/`text_emb` are global
arrays — computing the full similarity matrix makes XLA insert the all_gather over
the data axes, and AD through it reproduces the reference's AllGather_multi
slice-gradient + DDP grad-allreduce semantics exactly (SURVEY §5, distributed
backend). No explicit collectives needed. `donate` the state for in-place buffers.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from tvts_tpu.ops.losses import norm_softmax_loss, sort_accuracy, sort_loss
from tvts_tpu.ops.sim import sim_matrix


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))


def default_apply(model):
    """Forward adapter for TVTSv2-style batches; TVTSv1 batches additionally
    carry an attention_mask (DistilBERT tower)."""

    def apply(params, batch):
        if "attention_mask" in batch:
            return model.apply({"params": params}, batch["video"],
                               batch["text_ids"], batch["attention_mask"],
                               batch.get("keep_ind"))
        return model.apply({"params": params}, batch["video"],
                           batch["text_ids"], batch.get("keep_ind"))

    return apply


def _stop_frozen(params, freeze_mask):
    """stop_gradient the frozen-group leaves: their weight-grad matmuls are
    dead (the optimizer zeroes those updates), so cutting them at the source
    lets XLA drop the dW computations from the backward entirely."""
    if freeze_mask is None:
        return params
    return jax.tree.map(
        lambda p, f: jax.lax.stop_gradient(p) if f else p, params, freeze_mask)


def make_loss_fn(model, temperature: float = 0.05,
                 apply_fn: Callable | None = None,
                 freeze_mask=None) -> Callable:
    fwd = apply_fn or default_apply(model)

    def loss_fn(params, batch):
        params = _stop_frozen(params, freeze_mask)
        text_emb, video_emb, pred_order = fwd(params, batch)
        sim = sim_matrix(video_emb, text_emb)
        loss_ct = norm_softmax_loss(sim, temperature)
        if pred_order is not None and "labels" in batch:
            loss_ce = sort_loss(pred_order, batch["labels"])
            s_acc = sort_accuracy(pred_order, batch["labels"])
        else:
            loss_ce = jnp.zeros(())
            s_acc = jnp.zeros(())
        loss = loss_ct + loss_ce
        aux = {"loss": loss, "loss_ct": loss_ct, "loss_ce": loss_ce,
               "sort_acc": s_acc}
        return loss, aux

    return loss_fn


def make_train_step(model, tx: optax.GradientTransformation,
                    temperature: float = 0.05, donate: bool = True,
                    apply_fn: Callable | None = None,
                    freeze_mask=None) -> Callable:
    loss_fn = make_loss_fn(model, temperature, apply_fn, freeze_mask)

    def train_step(state: TrainState, batch) -> tuple[TrainState, dict]:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, aux), grads = grad_fn(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        return new_state, aux

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, temperature: float = 0.05,
                   apply_fn: Callable | None = None) -> Callable:
    """Validation step: returns embeddings + per-batch losses (reference
    _valid_epoch gathers embeddings per batch, trainer.py:527-635)."""
    fwd = apply_fn or default_apply(model)
    loss_fn = make_loss_fn(model, temperature, apply_fn)

    @jax.jit
    def eval_step(params, batch):
        text_emb, video_emb, pred_order = fwd(params, batch)
        out = {"text_emb": text_emb, "video_emb": video_emb}
        if pred_order is not None and "labels" in batch:
            out["sort_acc"] = sort_accuracy(pred_order, batch["labels"])
        _, aux = loss_fn(params, batch)
        out["loss"] = aux["loss"]
        return out

    return eval_step


def make_embed_fns(model) -> tuple[Callable, Callable]:
    """Jitted text / video embedding extractors for the zero-shot eval harness."""

    @jax.jit
    def embed_text(params, token_ids):
        return model.apply({"params": params}, token_ids,
                           method=lambda m, t: m.compute_text(t))

    @partial(jax.jit, static_argnums=())
    def embed_video(params, video, keep_ind=None):
        pooled, _ = model.apply(
            {"params": params}, video, keep_ind,
            method=lambda m, v, k: m.compute_video(v, k))
        return pooled

    return embed_text, embed_video


def make_sharded_train_step(model, tx: optax.GradientTransformation,
                            mesh, temperature: float = 0.05,
                            donate: bool = True,
                            apply_fn: Callable | None = None,
                            axis_names=("dp", "fsdp"),
                            freeze_mask=None) -> Callable:
    """Explicit shard_map train step: replicated params, batch sharded over the
    data axes, per-device forward, all_gather'd contrastive matrix, grad psum.

    Semantically identical to the jit/global-array step (the reference's
    DDP + AllGather_multi contract), but REQUIRED when apply_fn contains
    Pallas kernels: GSPMD cannot partition custom calls, so each device must
    run the kernel on its local shard explicitly.

    Expects the same batch dict as make_train_step, with text_ids clip-major
    [n_trans * B, L]; the clip-major -> video-major resharding is done on the
    global array before entering shard_map so each device gets its own
    videos' clips.
    """
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from tvts_tpu.ops.losses import sort_accuracy, sort_loss

    fwd = apply_fn or default_apply(model)
    spec = P(axis_names)

    def local_step(state, batch):
        def loss_fn(params):
            params = _stop_frozen(params, freeze_mask)
            text_emb, video_emb, pred_order = fwd(params, batch)
            video_all = jax.lax.all_gather(video_emb, axis_names, axis=0,
                                           tiled=True)
            text_all = jax.lax.all_gather(text_emb, axis_names, axis=0,
                                          tiled=True)
            sim = sim_matrix(video_all, text_all)
            loss_ct = norm_softmax_loss(sim, temperature)
            if pred_order is not None and "labels" in batch:
                loss_ce = jax.lax.pmean(sort_loss(pred_order, batch["labels"]),
                                        axis_names)
                s_acc = jax.lax.pmean(
                    sort_accuracy(pred_order, batch["labels"]), axis_names)
            else:
                loss_ce = jnp.zeros(())
                s_acc = jnp.zeros(())
            loss = loss_ct + loss_ce
            return loss, {"loss": loss, "loss_ct": loss_ct,
                          "loss_ce": loss_ce, "sort_acc": s_acc}

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        grads = jax.lax.psum(grads, axis_names)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), aux

    def train_step(state: TrainState, batch):
        B = batch["video"].shape[0]
        n_trans = batch["text_ids"].shape[0] // B
        batch = dict(batch)
        if n_trans > 1:
            # clip-major [n_trans*B, L] -> video-major so dim-0 sharding gives
            # each device its own videos' clips
            ids = batch["text_ids"]
            batch["text_ids"] = ids.reshape(n_trans, B, -1) \
                .transpose(1, 0, 2).reshape(n_trans * B, -1)

        def local(state, batch):
            if n_trans > 1:
                b = dict(batch)
                ids_l = b["text_ids"]
                bl = ids_l.shape[0] // n_trans
                # back to clip-major locally (the apply contract)
                b["text_ids"] = ids_l.reshape(bl, n_trans, -1) \
                    .transpose(1, 0, 2).reshape(n_trans * bl, -1)
            else:
                b = batch
            return local_step(state, b)

        batch_specs = {k: spec for k in batch}
        sharded = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), batch_specs),
            out_specs=(P(), P()), check_vma=False)
        return sharded(state, batch)

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
