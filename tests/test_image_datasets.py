import io
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from tvts_tpu.data.image_datasets import ConceptualCaptions3M, TextImageTarDataset, image_transform

VIDEO_PARAMS = {"input_res": 64, "loading": "strict"}


def make_image(path=None, color=(200, 30, 30), size=(90, 70)):
    img = Image.new("RGB", size, color)
    if path:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        img.save(path)
    return img


def test_image_transform_modes():
    rng = np.random.default_rng(0)
    img = make_image()
    for mode in ("train", "test"):
        arr = image_transform(img, 64, mode, rng)
        assert arr.shape == (3, 64, 64)
        assert np.isfinite(arr).all()


def test_cc3m(tmp_path):
    meta_root = tmp_path / "meta"
    os.makedirs(meta_root)
    make_image(str(tmp_path / "training" / "a.jpg"))
    (meta_root / "cc3m_train.tsv").write_text(
        "caption\tpath\na red square\ta.jpg\n")
    ds = ConceptualCaptions3M("ConceptualCaptions3M", {}, VIDEO_PARAMS,
                              str(tmp_path), split="train",
                              meta_root=str(meta_root), patches_per_frame=16)
    item = ds[0]
    assert item["video"].shape == (1, 3, 64, 64)  # 1-frame video contract
    assert item["text"] == ["a red square"]  # list-wrapped (YTT compat)
    assert item["keep_ind"].shape == (16,)

    ds2 = ConceptualCaptions3M("ConceptualCaptions3M", {},
                               {**VIDEO_PARAMS, "num_frames": 2}, str(tmp_path),
                               split="train", meta_root=str(meta_root),
                               patches_per_frame=16)
    assert ds2[0]["video"].shape == (2, 3, 64, 64)  # tiled for tubelet-2


def test_tar_dataset(tmp_path):
    meta_root = tmp_path / "meta"
    os.makedirs(meta_root)
    tar_path = tmp_path / "shard0.tar"
    with tarfile.open(tar_path, "w") as tar:
        buf = io.BytesIO()
        make_image().save(buf, format="JPEG")
        data = buf.getvalue()
        info = tarfile.TarInfo("img_000.jpg")
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))
    (meta_root / "tarimages_train.tsv").write_text(
        "caption\ttar\tmember\nhello tar\tshard0.tar\timg_000.jpg\n")
    ds = TextImageTarDataset("TarImages", {}, VIDEO_PARAMS, str(tmp_path),
                             split="train", meta_root=str(meta_root),
                             patches_per_frame=16)
    item = ds[0]
    assert item["video"].shape == (1, 3, 64, 64)
    assert item["text"] == "hello tar"

    # threaded access works (per-thread tar handles)
    from tvts_tpu.data.loader import ShardedLoader

    loader = ShardedLoader(ds, batch_size=1, shuffle=False, num_workers=2,
                           process_index=0, num_processes=1)
    batch = next(iter(loader))
    assert batch["video"].shape == (1, 1, 3, 64, 64)
