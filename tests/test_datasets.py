"""End-to-end dataset tests over synthetic video trees (cv2-encoded clips +
metadata files matching the reference layouts)."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tvts_tpu.data.datasets import MSRVTT, SSV2_mc, WebVid, dataset_loader  # noqa: E402
from tvts_tpu.data.loader import ShardedLoader  # noqa: E402
from tvts_tpu.data.ytt import YTTemporal  # noqa: E402

VIDEO_PARAMS = {"num_frames": 4, "input_res": 64, "loading": "strict"}


def write_video(path, n_frames=40, size=80, fps=10.0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (size, size))
    assert w.isOpened()
    for i in range(n_frames):
        frame = np.zeros((size, size, 3), np.uint8)
        frame[:] = (i * 3 % 256, 100, 200)
        w.write(frame)
    w.release()


@pytest.fixture(scope="module")
def ytt_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("ytt")
    data_dir = root / "data"
    meta_root = root / "meta"
    os.makedirs(meta_root)
    # 2 videos of 30s @ 10fps = 300 frames
    names = []
    for k in range(2):
        rel = f"subset_0/data/vid{k}.mp4"
        write_video(str(data_dir / "videos" / rel), n_frames=300, size=80)
        words = [{"word": f"w{i}", "time": float(i * 0.5)} for i in range(60)]
        ann = {
            "subtitles": words,
            "denoised": [{"cleanasr": " ".join(f"w{i}" for i in range(60))}],
            "info": {"duration": 30.0},
        }
        ann_path = data_dir / "videos" / "subset_0" / "annotations" / f"vid{k}.json"
        os.makedirs(ann_path.parent, exist_ok=True)
        ann_path.write_text(json.dumps(ann))
        names.append(rel)
    (meta_root / "yttemporal_train.csv").write_text(
        "Name\n" + "\n".join(names) + "\n")
    return str(data_dir), str(meta_root)


def test_yttemporal_end_to_end(ytt_tree):
    data_dir, meta_root = ytt_tree
    ds = YTTemporal("YTTemporal", {}, {"num_frames": 3, "input_res": 64},
                    data_dir, split="train", meta_root=meta_root,
                    patches_per_frame=16, mask_ratio=0.5)
    assert len(ds) == 2
    item = ds[0]
    assert item["video"].shape == (12, 3, 64, 64)  # 3 frames x 4 clips
    assert len(item["text"]) == 4
    assert all(isinstance(t, str) for t in item["text"])
    assert any(len(t.strip()) > 0 for t in item["text"])
    np.testing.assert_array_equal(item["label"], np.arange(4))
    assert item["keep_ind"].shape == (8,)

    loader = ShardedLoader(ds, batch_size=2, shuffle=True, num_workers=2,
                           process_index=0, num_processes=1)
    batch = next(iter(loader))
    assert batch["video"].shape == (2, 12, 3, 64, 64)
    assert len(batch["text"]) == 4 and len(batch["text"][0]) == 2
    assert batch["label"].shape == (2, 4)


@pytest.fixture(scope="module")
def msrvtt_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("msrvtt")
    data_dir = root / "data"
    meta_root = root / "meta"
    vids = [f"video{i}" for i in range(4)]
    for v in vids:
        write_video(str(data_dir / "videos" / "all" / f"{v}.mp4"), n_frames=30)
    anns = [{"image_id": v, "caption": f"caption {j} of {v}"}
            for v in vids for j in range(3)]
    os.makedirs(meta_root / "msrvtt", exist_ok=True)
    (meta_root / "msrvtt" / "MSR_VTT.json").write_text(json.dumps({"annotations": anns}))
    split_dir = data_dir / "high-quality" / "structured-symlinks"
    os.makedirs(split_dir, exist_ok=True)
    (split_dir / "train_list_jsfusion.txt").write_text("\n".join(vids[:2]) + "\n")
    (split_dir / "val_list_jsfusion.txt").write_text("\n".join(vids[2:]) + "\n")
    import pandas as pd
    import pickle

    with open(split_dir / "jsfusion_val_caption_idx.pkl", "wb") as f:
        pickle.dump(pd.Series([1, 2], index=vids[2:]), f)
    return str(data_dir), str(meta_root)


def test_msrvtt_jsfusion(msrvtt_tree):
    data_dir, meta_root = msrvtt_tree
    ds = MSRVTT("MSRVTT", {}, VIDEO_PARAMS, data_dir, split="test",
                cut="jsfusion", meta_root=meta_root, patches_per_frame=16)
    assert len(ds) == 2
    item = ds[0]
    assert item["video"].shape == (4, 3, 64, 64)
    # jsfusion uses the pinned caption index (1 for video2)
    assert item["text"] == "caption 1 of video2"
    assert item["keep_ind"].shape == (16,)


def test_webvid(tmp_path):
    data_dir = tmp_path / "webvid"
    meta_root = tmp_path / "meta"
    os.makedirs(meta_root)
    write_video(str(data_dir / "train" / "123.mp4"), n_frames=30)
    (meta_root / "webvid_train.tsv").write_text("caption\tvideoid\nA cat plays\t123\n")
    ds = WebVid("WebVid", {}, VIDEO_PARAMS, str(data_dir), split="train",
                meta_root=str(meta_root), patches_per_frame=16)
    item = ds[0]
    assert item["text"] == ["A cat plays"]  # list-wrapped for YTT compat
    assert item["video"].shape == (4, 3, 64, 64)


def test_ssv2_mc(tmp_path):
    data_dir = tmp_path / "ssv2"
    meta_root = tmp_path / "meta"
    os.makedirs(meta_root / "ssv2" / "mc", exist_ok=True)
    write_video(str(data_dir / "videos" / "1.webm.mp4"), n_frames=30)
    rec = {"clip_name": "1.webm.mp4", "options": [f"opt{i}" for i in range(5)],
           "answer": 3}
    (meta_root / "ssv2" / "mc" / "val.jsonl").write_text(json.dumps(rec) + "\n")
    ds = SSV2_mc("SSV2_mc", {}, VIDEO_PARAMS, str(data_dir), split="test",
                 meta_root=str(meta_root), patches_per_frame=16)
    item = ds[0]
    assert item["label"] == 3
    assert len(item["text"]) == 5


def test_lax_loading_black_frame(tmp_path):
    meta_root = tmp_path / "meta"
    os.makedirs(meta_root)
    (meta_root / "webvid_train.tsv").write_text("caption\tvideoid\nmissing\t999\n")
    ds = WebVid("WebVid", {}, {**VIDEO_PARAMS, "loading": "lax"}, str(tmp_path),
                split="train", meta_root=str(meta_root), patches_per_frame=16)
    item = ds[0]  # video file absent -> black clip, zero-padded
    assert item["video"].shape == (4, 3, 64, 64)
    strict = WebVid("WebVid", {}, VIDEO_PARAMS, str(tmp_path), split="train",
                    meta_root=str(meta_root), patches_per_frame=16)
    with pytest.raises(ValueError):
        strict[0]


def test_registry_dispatch(msrvtt_tree):
    data_dir, meta_root = msrvtt_tree
    ds = dataset_loader("MSRVTT", {}, VIDEO_PARAMS, data_dir, split="test",
                        cut="jsfusion", meta_root=meta_root, patches_per_frame=16)
    assert isinstance(ds, MSRVTT)
    with pytest.raises(NotImplementedError):
        dataset_loader("Bogus", {}, VIDEO_PARAMS, data_dir)
