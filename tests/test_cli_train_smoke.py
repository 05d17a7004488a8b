"""End-to-end smoke of scripts/train_dist_TVTSv2.py: tiny arch, synthetic
YT-Temporal tree, one epoch over the full driver (config parsing, dataset
construction, mesh, optimizer groups, checkpointing)."""

import json
import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tests.test_cli_smoke import load_script, tiny_arch  # noqa: F401,E402
from tests.test_datasets import write_video  # noqa: E402


@pytest.fixture(scope="module")
def big_ytt_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("ytt8")
    data_dir = root / "data"
    meta_root = root / "meta"
    os.makedirs(meta_root)
    names = []
    for k in range(8):
        rel = f"s0/data/v{k}.mp4"
        write_video(str(data_dir / "videos" / rel), n_frames=300, size=80)
        words = [{"word": f"w{i}", "time": float(i * 0.5)} for i in range(60)]
        ann = {"subtitles": words,
               "denoised": [{"cleanasr": " ".join(f"w{i}" for i in range(60))}],
               "info": {"duration": 30.0}}
        ann_path = data_dir / "videos" / "s0" / "annotations" / f"v{k}.json"
        os.makedirs(ann_path.parent, exist_ok=True)
        ann_path.write_text(json.dumps(ann))
        names.append(rel)
    (meta_root / "yttemporal_train.csv").write_text("Name\n" + "\n".join(names) + "\n")
    return str(data_dir), str(meta_root)


def _run_driver(cfg_path, monkeypatch, capsys, extra_args=()):
    """Drive scripts/train_dist_TVTSv2.py main() and return (stdout, loss_0)."""
    import random
    import re

    mod = load_script("train_dist_TVTSv2")
    random.seed(1234)  # dataset __getitem__ seeds per-sample rngs from `random`
    monkeypatch.setattr(sys, "argv", [
        "train", "-c", str(cfg_path), "--schedule", "6", "8", *extra_args])
    mod.main()
    out = capsys.readouterr().out
    m = re.search(r"epoch 1: .*?loss_0=([0-9.]+)", out)
    return out, (float(m.group(1)) if m else None)


def test_train_driver_end_to_end(big_ytt_tree, tmp_path, monkeypatch, capsys,
                                 tiny_arch):  # noqa: F811
    data_dir, meta_root = big_ytt_tree
    config = {
        "name": "tiny-pretrain",
        "arch": {"type": "TVTSv2_TINY", "args": {"load_checkpoint": ""}},
        "data_loader": [{
            "type": "ShardedLoader",
            "args": {
                "dataset_name": "YTTemporal", "data_dir": data_dir,
                "reader": "auto", "patches_per_frame": 16, "mask_ratio": 0.5,
                "shuffle": True, "num_workers": 0, "batch_size": 8,
                "split": "train", "subsample": 1, "meta_root": meta_root,
                "text_params": {"input": "text"},
                "video_params": {"input_res": 64, "num_frames": 1,
                                 "loading": "lax"},
            },
        }],
        "loss": {"type": "NormSoftmaxLoss", "args": {}},
        "metrics": ["t2v_metrics", "v2t_metrics"],
        "trainer": {"epochs": 1, "save_dir": str(tmp_path / "results"),
                    "save_period": 1, "monitor": "off", "init_val": False},
        "visualizer": {"type": ""},
    }
    cfg_path = tmp_path / "pretrain.json"
    cfg_path.write_text(json.dumps(config))

    mod = load_script("train_dist_TVTSv2")
    monkeypatch.setattr(sys, "argv", [
        "train", "-c", str(cfg_path), "--schedule", "6", "8"])
    mod.main()
    out = capsys.readouterr().out
    assert "Train Epoch: 1" in out
    assert "epoch 1:" in out
    # a checkpoint landed in the run dir
    runs = list((tmp_path / "results" / "models" / "tiny-pretrain").iterdir())
    assert runs, "no run dir created"
    assert any("checkpoint-epoch1" in str(p) for p in runs[0].iterdir())


def test_train_driver_fused_sharded_matches_xla(big_ytt_tree, tmp_path,
                                                monkeypatch, capsys,
                                                tiny_arch):  # noqa: F811
    """The flagship combination through the PRODUCTION entry point: the
    --fused_kernels Pallas train path (interpret mode) under the 8-virtual-CPU
    dp mesh must complete an epoch and reproduce the XLA driver run's loss
    (same seeds -> identical batches; f32 via --no-bf16).

    Library-level equality is proven in tests/test_fused_sharded.py; this
    certifies the driver plumbing (mesh= into make_fused_train_apply,
    trainer.kernels config resolution) users actually invoke.
    """
    data_dir, meta_root = big_ytt_tree

    def cfg_for(name, kernels=None):
        config = {
            "name": name,
            "arch": {"type": "TVTSv2_TINY", "args": {"load_checkpoint": ""}},
            "data_loader": [{
                "type": "ShardedLoader",
                "args": {
                    "dataset_name": "YTTemporal", "data_dir": data_dir,
                    "reader": "auto", "patches_per_frame": 16,
                    "mask_ratio": 0.5, "shuffle": True, "num_workers": 0,
                    "batch_size": 8, "split": "train", "subsample": 1,
                    "meta_root": meta_root,
                    "text_params": {"input": "text"},
                    "video_params": {"input_res": 64, "num_frames": 1,
                                     "loading": "lax"},
                },
            }],
            "loss": {"type": "NormSoftmaxLoss", "args": {}},
            "metrics": ["t2v_metrics", "v2t_metrics"],
            "trainer": {"epochs": 1, "save_dir": str(tmp_path / name),
                        "save_period": 1, "monitor": "off", "init_val": False},
            "visualizer": {"type": ""},
        }
        if kernels is not None:
            config["trainer"]["kernels"] = kernels
        p = tmp_path / f"{name}.json"
        p.write_text(json.dumps(config))
        return p

    xla_cfg = cfg_for("smoke-xla")
    fused_cfg = cfg_for("smoke-fused", kernels={
        "space_mode": "pallas_v10", "time_mode": "pallas_tps",
        "time_chunk": 8, "interpret": True})

    _, xla_loss = _run_driver(xla_cfg, monkeypatch, capsys,
                              extra_args=("--no-bf16",))
    fused_out, fused_loss = _run_driver(
        fused_cfg, monkeypatch, capsys,
        extra_args=("--no-bf16", "--fused_kernels"))
    assert "fused Pallas train kernels enabled" in fused_out
    assert xla_loss is not None and fused_loss is not None
    # identical batches, f32 everywhere; fused-vs-XLA differs only by
    # summation order inside the kernels
    assert abs(fused_loss - xla_loss) <= 2e-3, (xla_loss, fused_loss)
