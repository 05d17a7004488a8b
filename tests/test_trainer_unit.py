"""Unit tests for the Trainer epoch loop's buffered-aux bookkeeping.

Round 5 removed the per-step device->host loss fetch (the reference calls
.item() per step, v2/trainer/trainer.py:496-501; we batch the fetches at
log_step boundaries — a documented TPU-first deviation). These tests pin the
bookkeeping semantics: epoch totals equal the per-step losses' mean, writer
rows carry the right step numbers, and save_every_steps still fires on the
host-side counter.
"""

import jax.numpy as jnp
import numpy as np

from tvts_tpu.train.step import TrainState
from tvts_tpu.train.trainer import Trainer


class FakeLoader:
    def __init__(self, n, batch_size=2):
        self.n = n
        self.batch_size = batch_size
        self.num_processes = 1

        class _DS:
            dataset_name = "YTTemporal"

        self.dataset = _DS()

    def __len__(self):
        return self.n

    def set_epoch(self, epoch):
        pass

    def __iter__(self):
        for i in range(self.n):
            yield {"video": np.zeros((self.batch_size, 1, 3, 4, 4), np.float32),
                   "keep_ind": np.zeros((self.batch_size, 1), np.int32),
                   "text": ["a"] * self.batch_size}


class RecordingCkpt:
    def __init__(self):
        self.step_saves = []

    def save_step(self, step, state):
        self.step_saves.append(step)


def _bare_trainer(n_steps, log_step, save_every_steps=None, start_step=0):
    t = Trainer.__new__(Trainer)  # skip __init__ (no real model/step)
    t.data_loaders = [FakeLoader(n_steps)]
    t.valid_loaders = []
    t.mesh = None
    t.ckpt = RecordingCkpt() if save_every_steps else None
    t.max_samples_per_epoch = None
    t.context_length = 16
    t.log_step = log_step
    t.writer = None
    t.tokenize_fn = lambda texts: {"text_ids": np.zeros((len(texts), 4),
                                                        np.int32)}
    t.save_every_steps = save_every_steps
    t.visualizer = None
    t.epoch_loader = None
    t.profile_dir = None
    t.profile_steps = (10, 13)
    t.state = TrainState(step=jnp.asarray(start_step, jnp.int32), params={},
                         opt_state={})
    losses = []

    def fake_step(state, batch):
        new = TrainState(step=state.step + 1, params=state.params,
                         opt_state=state.opt_state)
        val = float(int(state.step)) + 1.0  # deterministic per-step loss
        losses.append(val)
        aux = {"loss": jnp.asarray(val), "loss_ct": jnp.asarray(val / 2),
               "loss_ce": jnp.asarray(val / 2), "sort_acc": jnp.asarray(0.0)}
        return new, aux

    t.train_step = fake_step
    return t, losses


def test_buffered_totals_match_per_step_mean():
    for log_step in (1, 3, 100):  # flush per step / mid-epoch / end-only
        t, losses = _bare_trainer(7, log_step)
        log = t._train_epoch(1)
        assert len(losses) == 7
        np.testing.assert_allclose(log["loss_0"], np.mean(losses), rtol=1e-6)


def test_writer_steps_are_correct_without_host_sync():
    rows = []
    t, _ = _bare_trainer(5, log_step=2, start_step=10)
    t.writer = lambda key, val, step: rows.append((key, val, step))
    t._train_epoch(1)
    assert [r[2] for r in rows] == [11, 12, 13, 14, 15]
    assert [r[1] for r in rows] == [11.0, 12.0, 13.0, 14.0, 15.0]


def test_save_every_steps_uses_host_counter():
    t, _ = _bare_trainer(6, log_step=100, save_every_steps=2)
    t._train_epoch(1)
    assert t.ckpt.step_saves == [2, 4, 6]
