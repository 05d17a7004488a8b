"""Image-text datasets (TVTS v1 CC3M joint-training path).

Behavioral contract: reference v2/base/base_dataset.py `TextImageDataset`
(:146-194) and v1/data_loader/ConceptualCaptions_dataset.py: tsv metadata of
(caption, relative path); an image is loaded, transformed with the train/val
image transform dict (RandomResizedCrop+flip for train, Resize+CenterCrop for
eval — v2/video_transforms/image_transforms.py:5-37), and replicated as a
1-frame video so it flows through the video towers unchanged.
"""

from __future__ import annotations

import os
import random

import numpy as np
import pandas as pd
from PIL import Image

from tvts_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


def image_transform(img: Image.Image, size: int, mode: str,
                    rng: np.random.Generator) -> np.ndarray:
    if mode == "train":
        # RandomResizedCrop(scale 0.5-1.0) + horizontal flip
        w, h = img.size
        area = w * h
        for _ in range(10):
            target = rng.uniform(0.5, 1.0) * area
            aspect = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
            cw = int(round(np.sqrt(target * aspect)))
            ch = int(round(np.sqrt(target / aspect)))
            if cw <= w and ch <= h:
                x = int(rng.integers(0, w - cw + 1))
                y = int(rng.integers(0, h - ch + 1))
                img = img.crop((x, y, x + cw, y + ch))
                break
        img = img.resize((size, size), Image.BILINEAR)
        if rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
    else:
        w, h = img.size
        scale = 256 / min(w, h)
        img = img.resize((int(w * scale), int(h * scale)), Image.BILINEAR)
        w, h = img.size
        x, y = (w - 256) // 2, (h - 256) // 2
        img = img.crop((x, y, x + 256, y + 256)).resize((size, size), Image.BILINEAR)
    arr = np.asarray(img.convert("RGB")).astype(np.float32) / 255.0
    arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    return arr.transpose(2, 0, 1)  # [C, H, W]


class TextImageDataset:
    """Metadata-driven image+caption dataset, emitted as 1-frame video."""

    def __init__(self, dataset_name, text_params, video_params, data_dir,
                 metadata_dir=None, split="train", cut=None, subsample=1,
                 sliding_window_stride=-1, reader="auto",
                 patches_per_frame=196, mask_ratio=0.0, meta_root="meta_data",
                 **_):
        self.dataset_name = dataset_name
        self.video_params = video_params
        self.data_dir = os.path.expandvars(data_dir)
        self.split = split
        self.patches_per_frame = patches_per_frame
        self.mask_ratio = mask_ratio
        self.meta_root = meta_root
        self._load_metadata()

    def _load_metadata(self):
        raise NotImplementedError

    def _get_image_path(self, sample):
        raise NotImplementedError

    def _get_caption(self, sample):
        return sample.iloc[0]

    def __len__(self):
        return len(self.metadata)

    def __getitem__(self, item):
        rng = np.random.default_rng(random.getrandbits(63))
        sample = self.metadata.iloc[item % len(self.metadata)]
        path, rel = self._get_image_path(sample)
        res = self.video_params["input_res"]
        try:
            img = Image.open(path)
            arr = image_transform(img, res, self.split, rng)
        except Exception:
            if self.video_params.get("loading", "strict") == "strict":
                raise
            arr = np.zeros((3, res, res), dtype=np.float32)
        n_keep = int(self.patches_per_frame * (1 - self.mask_ratio))
        keep = rng.permutation(self.patches_per_frame)[:n_keep].astype(np.int32)
        caption = self._get_caption(sample)
        # image as a static video: tile to num_frames (>=2 needed for the v1
        # tubelet-2 Conv3d patchify; the reference's CC3M joint-training path)
        nf = int(self.video_params.get("num_frames", 1))
        video = np.repeat(arr[None], max(nf, 1), axis=0).astype(np.float32)
        return {
            "video": video,  # [num_frames, C, H, W]
            "text": caption,
            "keep_ind": keep,
            "meta": {"raw_captions": caption, "paths": rel,
                     "dataset": self.dataset_name},
        }


class TextImageTarDataset(TextImageDataset):
    """Tar-sharded image dataset (reference base_dataset.py:198-221): images live
    in tar shards; each worker thread keeps its own tar handles (tarfile objects
    are not thread-safe — the reference's per-worker handle pattern)."""

    def __init__(self, *args, **kwargs):
        import threading

        self._tls = threading.local()
        super().__init__(*args, **kwargs)

    def _tar_handle(self, tar_path: str):
        import tarfile

        cache = getattr(self._tls, "tars", None)
        if cache is None:
            cache = self._tls.tars = {}
        if tar_path not in cache:
            cache[tar_path] = tarfile.open(tar_path, "r")
        return cache[tar_path]

    def _load_image(self, tar_rel: str, member: str) -> Image.Image:
        import io

        tar = self._tar_handle(os.path.join(self.data_dir, tar_rel))
        data = tar.extractfile(member).read()
        return Image.open(io.BytesIO(data))

    def _load_metadata(self):
        """tsv rows: caption, tar shard relative path, member name."""
        md = pd.read_csv(os.path.join(self.meta_root, f"{self.dataset_name.lower()}_{self.split}.tsv"),
                         sep="\t")
        self.metadata = md

    def __getitem__(self, item):
        rng = np.random.default_rng(random.getrandbits(63))
        sample = self.metadata.iloc[item % len(self.metadata)]
        res = self.video_params["input_res"]
        try:
            img = self._load_image(sample.iloc[1], sample.iloc[2])
            arr = image_transform(img, res, self.split, rng)
        except Exception:
            if self.video_params.get("loading", "strict") == "strict":
                raise
            arr = np.zeros((3, res, res), dtype=np.float32)
        n_keep = int(self.patches_per_frame * (1 - self.mask_ratio))
        keep = rng.permutation(self.patches_per_frame)[:n_keep].astype(np.int32)
        caption = self._get_caption(sample)
        return {
            "video": arr[None].astype(np.float32),
            "text": caption,
            "keep_ind": keep,
            "meta": {"raw_captions": caption, "paths": str(sample.iloc[2]),
                     "dataset": self.dataset_name},
        }


class ConceptualCaptions3M(TextImageDataset):
    """CC3M (reference v1/data_loader/ConceptualCaptions_dataset.py:49-80): tsv
    rows of (caption, filename); images live under training/ or validation/;
    caption list-wrapped for YTT joint-training compat."""

    def _load_metadata(self):
        split_files = {"train": "cc3m_train.tsv", "val": "cc3m_val.tsv",
                       "test": "cc3m_val.tsv"}
        md = pd.read_csv(os.path.join(self.meta_root, split_files[self.split]),
                         sep="\t")
        if self.split == "val":
            md = md.sample(min(1000, len(md)), random_state=0)
        self.metadata = md

    def _get_image_path(self, sample):
        rel_dir = "training" if self.split == "train" else "validation"
        rel = os.path.join(rel_dir, str(sample.iloc[1]))
        return os.path.join(self.data_dir, rel), rel

    def _get_caption(self, sample):
        return [sample.iloc[0]]
