"""Joint YTT+WebVid training: round-robin over both loaders per iteration, one
jitted step per text shape (4-clip sort batch vs 1-caption batch), YT loader
defining the epoch length (reference trainer.py:76-79,451-461)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import optax  # noqa: E402

from tests.test_datasets import write_video, ytt_tree  # noqa: F401,E402
from tests.test_integration import tiny_model  # noqa: F401,E402
from tvts_tpu.data.datasets import WebVid  # noqa: E402
from tvts_tpu.data.loader import ShardedLoader  # noqa: E402
from tvts_tpu.data.ytt import YTTemporal  # noqa: E402
from tvts_tpu.train.trainer import Trainer  # noqa: E402


@pytest.fixture(scope="module")
def webvid_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("webvid")
    meta_root = root / "meta"
    os.makedirs(meta_root)
    lines = []
    for i in range(6):
        write_video(str(root / "train" / f"{i}.mp4"), n_frames=30, size=80)
        lines.append(f"a video number {i}\t{i}")
    (meta_root / "webvid_train.tsv").write_text(
        "caption\tvideoid\n" + "\n".join(lines) + "\n")
    return str(root), str(meta_root)


def test_joint_two_loader_epoch(ytt_tree, webvid_tree, tiny_model):  # noqa: F811
    ytt_dir, ytt_meta = ytt_tree
    web_dir, web_meta = webvid_tree
    cfg, model, params = tiny_model

    ytt = YTTemporal("YTTemporal", {}, {"num_frames": 1, "input_res": 64},
                     ytt_dir, split="train", meta_root=ytt_meta,
                     patches_per_frame=16, mask_ratio=0.5)
    web = WebVid("WebVid", {}, {"num_frames": 4, "input_res": 64,
                                "loading": "strict"},
                 web_dir, split="train", meta_root=web_meta,
                 patches_per_frame=16, mask_ratio=0.5)
    ytt_loader = ShardedLoader(ytt, batch_size=2, shuffle=True, num_workers=0,
                               process_index=0, num_processes=1)
    web_loader = ShardedLoader(web, batch_size=2, shuffle=True, num_workers=0,
                               process_index=0, num_processes=1)

    tx = optax.adamw(1e-3)
    trainer = Trainer(model, params, tx, [ytt_loader, web_loader],
                      valid_loaders=[], epochs=1, log_step=1,
                      context_length=cfg.text.context_length)
    # YT loader defines the epoch: len(ytt_loader)=1 even though web has 3
    assert trainer._len_epoch() == len(ytt_loader) == 1
    log = trainer.train()
    assert np.isfinite(log["loss_0"]) and np.isfinite(log["loss_1"])
    # one step per loader happened
    assert int(trainer.state.step) == 2 * trainer._len_epoch()
