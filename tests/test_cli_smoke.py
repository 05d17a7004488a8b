"""CLI smoke tests: drive the actual scripts/ mains end-to-end with a tiny arch
injected into the model registry and synthetic data."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tests.test_datasets import msrvtt_tree, write_video  # noqa: F401,E402
from tests.test_integration import tiny_real_vocab_config  # noqa: E402
from tvts_tpu.models import configs as model_configs  # noqa: E402

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def load_script(name):
    path = os.path.join(SCRIPTS, f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(autouse=True)
def tiny_arch():
    model_configs.MODEL_REGISTRY["TVTSv2_TINY"] = tiny_real_vocab_config
    yield
    model_configs.MODEL_REGISTRY.pop("TVTSv2_TINY", None)


def test_zero_ret_cli(msrvtt_tree, tmp_path, monkeypatch, capsys):  # noqa: F811
    data_dir, meta_root = msrvtt_tree
    config = {
        "name": "tiny-msrvtt",
        "arch": {"type": "TVTSv2_TINY", "args": {"load_checkpoint": ""}},
        "sliding_window_stride": -1,
        "data_loader": {"type": "ShardedLoader", "args": {
            "dataset_name": "MSRVTT", "data_dir": data_dir, "reader": "auto",
            "patches_per_frame": 16, "mask_ratio": 0, "shuffle": False,
            "num_workers": 0, "batch_size": 2, "split": "test",
            "cut": "jsfusion", "subsample": 1, "meta_root": meta_root,
            "text_params": {"input": "text"},
            "video_params": {"input_res": 64, "num_frames": 4}}},
        "metrics": ["t2v_metrics", "v2t_metrics"],
        "trainer": {"save_dir": str(tmp_path)},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(config))

    mod = load_script("zero_ret_TVTSv2")
    monkeypatch.setattr(sys, "argv", ["zero_ret", "-c", str(cfg_path)])
    mod.main()
    out = capsys.readouterr().out
    assert "[t2v_metrics]" in out and "[v2t_metrics]" in out


def test_feature_extraction_cli(tmp_path, monkeypatch, capsys):
    video_path = str(tmp_path / "demo.mp4")
    write_video(video_path, n_frames=30, size=80)
    out_path = str(tmp_path / "emb.npy")

    mod = load_script("feature_extraction_TVTSv2")
    monkeypatch.setattr(sys, "argv", [
        "fe", "--arch", "TVTSv2_TINY", "--video_path", video_path,
        "--out", out_path])
    mod.main()
    emb = np.load(out_path)
    assert emb.shape == (1, 48)
    assert "video embedding shape" in capsys.readouterr().out
