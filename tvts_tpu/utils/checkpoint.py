"""Checkpointing with the reference's monitor/best semantics, on orbax.

Behavioral contract: reference v2/base/base_trainer.py:119-189: save every
`save_period` epochs as checkpoint-epoch{N}, plus model_best on monitor
improvement ("min val_loss_0" style monitor strings); resume restores epoch,
monitor_best, params and optimizer state (:191-247). Model-only init loading from
torch `.pth` goes through utils/torch_convert (the reference's
state_dict_data_parallel_fix + load path).
"""

from __future__ import annotations

import math
import os
from typing import Any

import numpy as np
import orbax.checkpoint as ocp


class Monitor:
    """Parse 'min val_loss_0' / 'max R1' monitor strings (base_trainer.py:40-52)."""

    def __init__(self, spec: str = "off"):
        self.spec = spec
        if spec == "off":
            self.mode, self.metric = "off", None
            self.best = 0.0
        else:
            self.mode, self.metric = spec.split()
            assert self.mode in ("min", "max")
            self.best = math.inf if self.mode == "min" else -math.inf

    def improved(self, log: dict) -> bool:
        if self.mode == "off" or self.metric not in log:
            return False
        val = log[self.metric]
        better = val <= self.best if self.mode == "min" else val >= self.best
        if better:
            self.best = val
        return better


class CheckpointManager:
    def __init__(self, save_dir: str, save_period: int = 1, monitor: str = "off"):
        self.save_dir = os.path.abspath(str(save_dir))
        self.save_period = save_period
        self.monitor = Monitor(monitor)
        os.makedirs(self.save_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, tag: str) -> str:
        return os.path.join(self.save_dir, tag)

    def save_epoch(self, epoch: int, state: Any, val_log: dict | None = None):
        """Periodic + best checkpointing after epoch `epoch` (1-based)."""
        if epoch % self.save_period == 0:
            self._ckptr.save(self._path(f"checkpoint-epoch{epoch}"), state,
                             force=True)
        if val_log is not None and self.monitor.improved(val_log):
            self._ckptr.save(self._path("model_best"), state, force=True)
        self._ckptr.wait_until_finished()

    def save_step(self, step: int, state: Any):
        """Mid-epoch step-interval checkpoint (elastic-recovery extension over
        the reference's epoch-only saves, SURVEY §5)."""
        self._ckptr.save(self._path(f"step{int(step)}"), state, force=True)
        # orbax saves are async; a caller that keeps training (or restores
        # this tag for a resume-replay check) must not race the finalize
        self._ckptr.wait_until_finished()

    def restore(self, tag: str, target: Any) -> Any:
        return self._ckptr.restore(self._path(tag), target=target)

    def latest_epoch(self) -> int | None:
        eps = []
        for d in os.listdir(self.save_dir):
            if d.startswith("checkpoint-epoch"):
                try:
                    eps.append(int(d[len("checkpoint-epoch"):]))
                except ValueError:
                    pass
        return max(eps) if eps else None


def load_params_from_torch(path: str, init_params: dict, strict: bool = False) -> dict:
    """Initialize flax params from a reference `.pth` checkpoint (model-level
    `load_checkpoint` semantics, model_dist_TVTSv2_*.py:51-56)."""
    from tvts_tpu.utils.torch_convert import (
        convert_state_dict,
        load_torch_state_dict,
        merge_params,
    )

    sd = load_torch_state_dict(path)
    return merge_params(init_params, convert_state_dict(sd), strict=strict)


def save_params_npz(path: str, params: dict):
    """Flat .npz export (portable interchange without orbax)."""
    flat = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, prefix + (k,))
            else:
                flat["/".join(prefix + (k,))] = np.asarray(v)

    walk(params, ())
    np.savez(path, **flat)


def load_params_npz(path: str) -> dict:
    data = np.load(path)
    tree: dict = {}
    for key in data.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return tree
