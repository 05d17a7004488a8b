"""Sliding-window test-time temporal augmentation (base_dataset.py:90-97 +
zero_ret mean-pool grouping)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tests.test_datasets import write_video  # noqa: E402
from tvts_tpu.data.datasets import WebVid  # noqa: E402
from tvts_tpu.eval.zero_ret import sliding_window_meanpool  # noqa: E402


def test_fix_temporal_samples_expands_metadata(tmp_path):
    data_dir = tmp_path / "webvid"
    meta_root = tmp_path / "meta"
    os.makedirs(meta_root)
    write_video(str(data_dir / "test" / "1.mp4"), n_frames=40)
    (meta_root / "webvid_train.tsv").write_text("caption\tvideoid\na cat\t1\n")

    class TestWebVid(WebVid):
        def _load_metadata(self):
            import pandas as pd

            self.metadata = pd.read_csv(
                os.path.join(self.meta_root, "webvid_train.tsv"), sep="\t")

    ds = TestWebVid("WebVid", {}, {"num_frames": 4, "input_res": 64},
                    str(data_dir), split="test", meta_root=str(meta_root),
                    sliding_window_stride=4, patches_per_frame=16)
    # one 40-frame video, 4 frames -> interval len 10, windows at stride 4
    assert len(ds) > 1
    item = ds[0]
    assert item["video"].shape == (4, 3, 64, 64)
    # different windows sample different frames
    assert ds.metadata["fix_start"].nunique() == len(ds)


def test_sliding_window_meanpool_groups_by_video():
    vid = np.array([[1.0, 0], [3.0, 0], [0, 2.0]], dtype=np.float32)
    txt = np.array([[1.0, 1], [1.0, 1], [5.0, 5]], dtype=np.float32)
    metas = [{"paths": "a.mp4", "raw_captions": "cap a"},
             {"paths": "a.mp4", "raw_captions": "cap a"},
             {"paths": "b.mp4", "raw_captions": "cap b"}]
    v, t = sliding_window_meanpool(vid, txt, metas)
    assert v.shape == (2, 2)
    np.testing.assert_allclose(v[0], [2.0, 0])  # mean of the two a.mp4 windows
    assert t.shape == (2, 2)
