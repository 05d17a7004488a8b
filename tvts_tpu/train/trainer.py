"""Pretraining driver: multi-dataset round-robin epochs, validation, checkpoints.

Behavioral contract: reference v2/trainer/trainer.py (`Trainer_TVTSv2_*`) +
v2/base/base_trainer.py (`Multi_BaseTrainer_dist`):

- one optimizer step per dataloader per iteration; the YTT loader defines
  len_epoch, other loaders restart their iterators when exhausted (:149-167,
  :451-461)
- text: concat the per-clip caption lists then CLIP-tokenize truncate=True
  (:465-473); YTT yields 4 transcripts/sample (sort loss on), WebVid 1 (off)
- optional init validation before epoch 1 (base_trainer.py:87-88)
- per-epoch validation: embeddings + sort accuracy -> sim matrix -> t2v/v2t
  metrics + val_loss per loader (:527-635)
- rank-0 checkpointing with monitor/best ("min val_loss_0") (base_trainer:119-189)
- milestone LR decay is part of the optax schedule (train/optim.py)

TPU-first notes: one jitted train_step per distinct batch shape (YTT vs WebVid
differ in text length only); batches are device_put with the mesh batch sharding;
the loss computes the GLOBAL sim matrix, XLA inserting the embedding all_gather.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from tvts_tpu.eval.embed import verbose
from tvts_tpu.ops import metrics as metrics_mod
from tvts_tpu.ops.sim import sim_matrix
from tvts_tpu.parallel import shard_batch
from tvts_tpu.text.tokenizer import tokenize_openclip
from tvts_tpu.train.step import create_train_state, make_eval_step, make_train_step


def clip_tokenize_fn(context_length: int = 77):
    """Default text pipeline: CLIP BPE, truncate (v2 towers)."""

    def fn(texts):
        return {"text_ids": tokenize_openclip(texts, context_length=context_length)}

    return fn


def wordpiece_tokenize_fn(vocab_path: str | None = None, max_length: int = 50):
    """v1 text pipeline: DistilBERT WordPiece with attention mask (reference
    v1/trainer/trainer.py:130-131, statically padded to max_length)."""
    from tvts_tpu.text.wordpiece import WordPieceTokenizer

    tk = WordPieceTokenizer(vocab_path)

    def fn(texts):
        enc = tk(texts, max_length=max_length)
        return {"text_ids": enc["input_ids"],
                "attention_mask": enc["attention_mask"]}

    return fn


def prepare_batch(batch, context_length: int = 77, tokenize_fn=None):
    """Collated loader batch -> numeric arrays for the train step.

    Pre-tokenized batches (already carrying ``text_ids``) pass through —
    the fast path for datasets tokenized at collate time or device-resident
    pools."""
    if "text_ids" in batch:
        return batch

    def cast(a, dt):
        a = np.asarray(a)
        return a if a.dtype == dt else a.astype(dt)

    text = batch["text"]
    if isinstance(text, list) and text and isinstance(text[0], list):
        flat = [cap for clip_caps in text for cap in clip_caps]  # clip-major concat
    else:
        flat = list(text)
    tokenize_fn = tokenize_fn or clip_tokenize_fn(context_length)
    out = {
        "video": cast(batch["video"], np.float32),
        "keep_ind": cast(batch["keep_ind"], np.int32),
    }
    out.update(tokenize_fn(flat))
    if "label" in batch and np.ndim(batch["label"]) == 2:
        out["labels"] = cast(batch["label"], np.int32)
    return out


class Trainer:
    def __init__(self, model, params, tx, data_loaders, valid_loaders=None,
                 epochs: int = 10, mesh=None, ckpt_manager=None,
                 init_val: bool = False, max_samples_per_epoch: int | None = None,
                 context_length: int = 77, log_step: int = 50, writer=None,
                 tokenize_fn=None, apply_fn=None,
                 save_every_steps: int | None = None, visualizer=None,
                 temperature: float = 0.05,
                 epoch_loader: int | str | None = None,
                 profile_dir: str | None = None,
                 profile_steps: tuple[int, int] = (10, 13),
                 freeze_mask=None):
        self.model = model
        self.tx = tx
        self.data_loaders = list(data_loaders)
        self.valid_loaders = list(valid_loaders or [])
        self.epochs = epochs
        self.mesh = mesh
        self.ckpt = ckpt_manager
        self.init_val = init_val
        self.max_samples_per_epoch = max_samples_per_epoch
        self.context_length = context_length
        self.log_step = log_step
        self.writer = writer
        self.tokenize_fn = tokenize_fn
        # mid-epoch step-interval checkpointing (elastic-recovery extension over
        # the reference's epoch-only checkpoints, SURVEY §5)
        self.save_every_steps = save_every_steps
        self.visualizer = visualizer  # RetrievalVis, gated like the reference
        # which loader defines len_epoch: an index or dataset name from the
        # config (trainer.epoch_loader). None falls back to the reference's
        # implicit convention (the YT-Temporal loader, trainer.py:76-79).
        self.epoch_loader = epoch_loader
        # timeline profiling (trainer.profile_dir config key): trace steps
        # [start, stop) of the FIRST epoch into an XProf/TensorBoard profile
        # dir. The reference has no profiler; utils/profiling.py documents the
        # tunnel degradation.
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps

        # copy params into the state: train_step donates its input state, and the
        # caller's arrays must stay valid (e.g. for a final eval with the originals)
        params = jax.tree.map(jnp.copy, params)
        self.state = create_train_state(params, tx)
        # freeze_mask (optim.freeze_mask): stop_gradient the frozen text
        # blocks so their dW matmuls never compile into the backward
        self.train_step = make_train_step(model, tx, donate=True,
                                          apply_fn=apply_fn,
                                          temperature=temperature,
                                          freeze_mask=freeze_mask)
        self.eval_step = make_eval_step(model, apply_fn=apply_fn,
                                        temperature=temperature)

    def _len_epoch(self) -> int:
        n = None
        if isinstance(self.epoch_loader, int):
            n = len(self.data_loaders[self.epoch_loader])
        elif isinstance(self.epoch_loader, str):
            for dl in self.data_loaders:
                name = getattr(getattr(dl, "dataset", None), "dataset_name", "")
                if str(name) == self.epoch_loader:
                    n = len(dl)
            if n is None:
                raise ValueError(
                    f"trainer.epoch_loader={self.epoch_loader!r} matches no "
                    "loader dataset_name")
        else:
            # reference convention: the YT loader defines the epoch
            # (trainer.py:76-79); fall back to the first loader otherwise
            for dl in self.data_loaders:
                name = getattr(getattr(dl, "dataset", None), "dataset_name", "")
                if str(name).startswith("YT"):
                    n = len(dl)
        if n is None:
            n = len(self.data_loaders[0])
        if self.max_samples_per_epoch:
            per_step = self.data_loaders[0].batch_size * max(
                1, self.data_loaders[0].num_processes)
            n = min(n, self.max_samples_per_epoch // per_step)
        return max(n, 1)

    def _put(self, batch):
        if self.mesh is not None:
            return shard_batch(batch, self.mesh)
        return jax.device_put(batch)

    def _pipeline(self, dl):
        """prepare_batch -> device placement, two batches in flight: host
        tokenize/collate and the host->device copy overlap device compute
        (the reference's pin_memory + non_blocking contract, TPU-style)."""
        from tvts_tpu.data.prefetch import prefetch_to_device

        prepared = (prepare_batch(raw, self.context_length, self.tokenize_fn)
                    for raw in dl)
        return prefetch_to_device(prepared, size=2, put=self._put)

    def resume(self, tag: str | None = None) -> int:
        """Restore params/optimizer/step from a checkpoint (reference
        _resume_checkpoint, base_trainer.py:191-247). Returns the next epoch."""
        assert self.ckpt is not None, "no checkpoint manager configured"
        if tag is None:
            latest = self.ckpt.latest_epoch()
            if latest is None:
                return 1
            tag = f"checkpoint-epoch{latest}"
        target = {"params": self.state.params, "opt_state": self.state.opt_state,
                  "step": self.state.step}
        restored = self.ckpt.restore(tag, target)
        from tvts_tpu.train.step import TrainState

        self.state = TrainState(step=restored["step"], params=restored["params"],
                                opt_state=restored["opt_state"])
        self.start_epoch = (int(tag.split("epoch")[-1]) + 1
                            if "epoch" in tag else 1)
        print(f"resumed from {tag}; continuing at epoch {self.start_epoch}")
        return self.start_epoch

    def train(self):
        log = {}
        start = getattr(self, "start_epoch", 1)
        if self.init_val and self.valid_loaders and start == 1:
            log.update(self._valid_epoch(0))
        for epoch in range(start, self.epochs + 1):
            log = self._train_epoch(epoch)
            if self.valid_loaders:
                val_log = self._valid_epoch(epoch)
                log.update(val_log)
            if self.ckpt is not None:
                self.ckpt.save_epoch(
                    epoch, {"params": self.state.params,
                            "opt_state": self.state.opt_state,
                            "step": self.state.step}, val_log=log)
            print(f"epoch {epoch}: " + ", ".join(
                f"{k}={v:.4f}" for k, v in log.items() if np.isscalar(v)))
        return log

    def _flush_aux(self, pending, totals):
        """Batch-fetch buffered per-step aux dicts (ONE device->host round trip
        for the whole buffer), accumulate totals, emit scalars. Returns the
        last fetched aux (host numpy) for the caller's log line."""
        if not pending:
            return None
        fetched = jax.device_get([aux for _, _, aux in pending])
        for (dl_idx, step, _), aux in zip(pending, fetched):
            loss = float(aux["loss"])
            totals[dl_idx] += loss
            if self.writer is not None:
                self.writer(f"loss_train_{dl_idx}", loss, step)
        pending.clear()
        return fetched[-1]

    def _train_epoch(self, epoch: int) -> dict:
        for dl in self.data_loaders:
            dl.set_epoch(epoch)
        len_epoch = self._len_epoch()
        iters = [self._pipeline(dl) for dl in self.data_loaders]
        totals = [0.0] * len(self.data_loaders)
        t0 = time.time()

        # TPU-first deviation from the reference (trainer.py:496-501, which
        # calls .item() per step): fetching the loss per step blocks the host
        # on every dispatch (several ms each over a tunnel). Buffer the aux
        # scalars as device arrays and fetch them in ONE transfer per log_step
        # window; the host-side step counter avoids syncing on state.step.
        host_step = int(self.state.step)
        pending = []  # (dl_idx, step, aux-device-dict)

        prof = None
        try:
            for batch_idx in range(len_epoch):
                if (self.profile_dir is not None
                        and epoch == getattr(self, "start_epoch", 1)
                        and batch_idx == self.profile_steps[0]):
                    from tvts_tpu.utils.profiling import trace

                    prof = trace(self.profile_dir)
                    prof.__enter__()
                for dl_idx in range(len(self.data_loaders)):
                    try:
                        batch = next(iters[dl_idx])
                    except StopIteration:
                        iters[dl_idx] = self._pipeline(self.data_loaders[dl_idx])
                        batch = next(iters[dl_idx])
                    self.state, aux = self.train_step(self.state, batch)
                    host_step += 1
                    pending.append((dl_idx, host_step, aux))
                    if (self.save_every_steps and
                            host_step % self.save_every_steps == 0
                            and self.ckpt is not None):
                        self._flush_aux(pending, totals)
                        self.ckpt.save_step(
                            host_step,
                            {"params": self.state.params,
                             "opt_state": self.state.opt_state,
                             "step": self.state.step})
                if batch_idx % self.log_step == 0:
                    last = self._flush_aux(pending, totals)
                    if last is not None:
                        print(f"Train Epoch: {epoch} [{batch_idx}/{len_epoch}] "
                              f"Loss_ct: {float(last['loss_ct']):.6f} "
                              f"Loss_ce: {float(last['loss_ce']):.6f} "
                              f"steps/s: {(batch_idx + 1) / (time.time() - t0):.2f}",
                              flush=True)
                if prof is not None and batch_idx + 1 >= self.profile_steps[1]:
                    prof.__exit__(None, None, None)
                    prof = None
        finally:
            if prof is not None:  # short epoch or mid-epoch failure: close the trace
                prof.__exit__(None, None, None)
        self._flush_aux(pending, totals)

        return {f"loss_{i}": totals[i] / len_epoch for i in range(len(self.data_loaders))}

    def _valid_epoch(self, epoch: int) -> dict:
        log = {}
        for dl_idx, dl in enumerate(self.valid_loaders):
            txts, vids = [], []
            sort_correct, sort_num = 0.0, 0
            metas = []
            for raw in dl:
                batch = self._put(prepare_batch(raw, self.context_length, self.tokenize_fn))
                out = self.eval_step(self.state.params, batch)
                txts.append(np.asarray(out["text_emb"], dtype=np.float32))
                vids.append(np.asarray(out["video_emb"], dtype=np.float32))
                metas.extend(raw.get("meta", []))
                if "sort_acc" in out:
                    bsz = len(np.asarray(batch["video"]))
                    sort_correct += float(out["sort_acc"]) * bsz
                    sort_num += bsz
            if not txts:
                continue
            txt = np.concatenate(txts)
            vid = np.concatenate(vids)
            sims = np.asarray(sim_matrix(jnp.asarray(txt), jnp.asarray(vid)))
            # reference quirk, reproduced: `val_loss_{i}` is NOT a loss — it is
            # the per-batch-accumulated sort exact-match ratio, or 1.0 for
            # loaders without sort supervision (trainer.py:585-597,630-631).
            # The config's "min val_loss_0" monitor therefore tracks this ratio.
            log[f"val_loss_{dl_idx}"] = (sort_correct / sort_num
                                         if sort_num else 1.0)
            for name in ("t2v_metrics", "v2t_metrics"):
                res = getattr(metrics_mod, name)(sims)
                verbose(epoch=epoch, metrics=res, name=f"val_{dl_idx}", mode=name)
                log[f"val_{dl_idx}_{name}_R1"] = res["R1"]
            if sort_num:
                acc = sort_correct / sort_num
                log[f"val_{dl_idx}_sort_acc"] = acc
                print(f"Top-1 Accuracy for Frame Prediction: {acc:.4f}")
            if self.visualizer is not None and metas:
                meta = {"paths": [m.get("paths", "") for m in metas],
                        "raw_captions": [m.get("raw_captions", "") for m in metas]}
                self.visualizer.visualize_ranking(sims, epoch, meta)
            if self.writer is not None:
                for k, v in log.items():
                    if np.isscalar(v):
                        self.writer(k, float(v), int(self.state.step))
        return log
