"""End-to-end smoke of scripts/run_class_finetuning.py in all three modes
(tiny ViT over synthetic classification videos)."""

import os
import sys

import pytest

cv2 = pytest.importorskip("cv2")

from tests.test_cli_smoke import load_script  # noqa: E402
from tests.test_datasets import write_video  # noqa: E402

TINY = ["--embed_dim", "64", "--depth", "2", "--heads", "4",
        "--patch_size", "16", "--input_size", "64", "--short_side_size", "64",
        "--num_frames", "4", "--nb_classes", "3", "--batch_size", "4",
        "--epochs", "1", "--warmup_epochs", "0"]


@pytest.fixture(scope="module")
def cls_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("cls")
    lines = []
    for i in range(8):
        rel = f"videos/c{i % 3}/v{i}.mp4"
        write_video(str(root / rel), n_frames=40, size=80)
        lines.append(f"{rel} {i % 3}")
    for split in ("train", "val", "test"):
        (root / f"{split}.csv").write_text("\n".join(lines) + "\n")
    return str(root)


@pytest.mark.parametrize("mode", ["finetune", "linear", "zero"])
def test_run_class_modes(cls_tree, mode, monkeypatch, capsys):
    mod = load_script("run_class_finetuning")
    argv = ["rc", "--mode", mode, "--data_path", cls_tree,
            "--data_root", cls_tree, "--output_dir",
            os.path.join(cls_tree, f"out_{mode}")] + TINY
    if mode != "zero":
        argv += ["--mixup", "0.8" if mode == "finetune" else "0"]
    monkeypatch.setattr(sys, "argv", argv)
    mod.main()
    out = capsys.readouterr().out
    if mode == "zero":
        assert "R@1" in out
    else:
        assert "val top1" in out
        assert "final test (multi-view merged)" in out
