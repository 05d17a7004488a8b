"""Metadata-driven video-text datasets (torch-free).

Behavioral contract: reference v2/base/base_dataset.py:18-142 (`TextVideoDataset`)
and the per-dataset subclasses in v2/data_loader/*_dataset.py. Each item is the
reference's data dict: {'video' [T,C,H,W] float32 normalized, 'text', 'keep_ind',
'label' (classification/MC only), 'meta'}. Semantics preserved:

- rand frame sampling for train, uniform for test; sliding-window fix_start
  expansion for test-time temporal aug (base_dataset.py:90-97)
- strict vs lax loading: lax substitutes a black clip (base_dataset.py:116-123)
- zero-padding to num_frames (:128-130); per-sample random tube keep set (:133-138)
- metadata formats per dataset (MSRVTT cuts + jsfusion caption-idx pickle, DiDeMo/
  LSMDC tsv, WebVid tsv + page dirs, HMDB51/UCF101/K400 prompt tsvs, SSV2-MC jsonl)

Known reference quirk fixed here (SURVEY §7): the LSMDC import typo in
v2/data_loader/data_loader.py:6 — the registry below simply registers LSMDC.
"""

from __future__ import annotations

import json
import os
import random

import numpy as np
import pandas as pd

from tvts_tpu.data import video_reader
from tvts_tpu.data.transforms import video_transform


class TextVideoDataset:
    def __init__(self,
                 dataset_name: str,
                 text_params: dict,
                 video_params: dict,
                 data_dir: str,
                 metadata_dir: str | None = None,
                 split: str = "train",
                 cut: str | None = None,
                 subsample: float = 1,
                 sliding_window_stride: int = -1,
                 reader: str = "auto",
                 patches_per_frame: int = 196,
                 mask_ratio: float = 0.0,
                 meta_root: str = "meta_data"):
        self.dataset_name = dataset_name
        self.text_params = text_params
        self.video_params = video_params
        self.data_dir = os.path.expandvars(data_dir)
        self.metadata_dir = os.path.expandvars(metadata_dir) if metadata_dir else self.data_dir
        self.meta_root = meta_root
        self.split = split
        self.cut = cut
        self.subsample = subsample
        self.sliding_window_stride = sliding_window_stride
        self.reader = reader
        self.patches_per_frame = patches_per_frame
        self.mask_ratio = mask_ratio
        self.label_type = "caption"
        self._load_metadata()
        if self.sliding_window_stride != -1:
            if self.split != "test":
                raise ValueError("fixed frame sampling is test-time only")
            self._fix_temporal_samples()

    # --- subclass hooks -------------------------------------------------
    def _load_metadata(self):
        raise NotImplementedError

    def _get_video_path(self, sample):
        raise NotImplementedError

    def _get_caption(self, sample):
        raise NotImplementedError

    # --- shared machinery ------------------------------------------------
    def _get_video_lens(self):
        out = []
        for _, row in self.metadata.iterrows():
            try:
                out.append(video_reader.get_video_len(self._get_video_path(row)[0],
                                                      backend=self.reader))
            except Exception:
                out.append(0)
        return out

    def _fix_temporal_samples(self):
        """Sliding-window test expansion (base_dataset.py:90-97)."""
        nf = self.video_params["num_frames"]
        self.metadata["vlen"] = self._get_video_lens()
        self.metadata["frame_intervals"] = self.metadata["vlen"].apply(
            lambda x: np.linspace(start=0, stop=x, num=min(x, nf) + 1).astype(int))
        self.metadata["fix_start"] = self.metadata["frame_intervals"].apply(
            lambda x: np.arange(0, int(x[-1] / len(x - 1)), self.sliding_window_stride))
        self.metadata = self.metadata.explode("fix_start")

    def __len__(self):
        return len(self.metadata)

    def _load_clip(self, video_fp, fix_start, rng):
        num_frames = self.video_params["num_frames"]
        res = self.video_params["input_res"]
        frame_sample = "uniform" if self.split == "test" else "rand"
        loading = self.video_params.get("loading", "strict")
        try:
            frames, _ = video_reader.read_frames_sampled(
                video_fp, num_frames, sample=frame_sample, fix_start=fix_start,
                rng=rng, backend=self.reader)
        except Exception:
            if loading == "strict":
                raise ValueError(
                    f"Video loading failed for {video_fp}, loading is strict")
            frames = np.zeros((1, res, res, 3), dtype=np.uint8)  # lax: black frame
        imgs = video_transform(frames, crop_size=res,
                               mode="train" if self.split == "train" else "test",
                               rng=rng)
        final = np.zeros((num_frames, 3, res, res), dtype=np.float32)
        final[: imgs.shape[0]] = imgs
        return final

    def _tube_mask(self, rng):
        n_keep = int(self.patches_per_frame * (1 - self.mask_ratio))
        ind = rng.permutation(self.patches_per_frame)
        return ind[:n_keep].astype(np.int32)

    def __getitem__(self, item):
        rng = np.random.default_rng(random.getrandbits(63))
        item = item % len(self.metadata)
        sample = self.metadata.iloc[item]
        video_fp, rel_fp = self._get_video_path(sample)
        caption = self._get_caption(sample)
        fix_start = sample["fix_start"] if self.sliding_window_stride != -1 else None
        final = self._load_clip(video_fp, fix_start, rng)
        data = {
            "video": final,
            "text": caption,
            "keep_ind": self._tube_mask(rng),
            "meta": {"raw_captions": caption, "paths": rel_fp,
                     "dataset": self.dataset_name},
        }
        if self.label_type == "label":
            data["label"] = int(sample.iloc[1])
        return data


# --------------------------------------------------------------------------
# retrieval datasets


class MSRVTT(TextVideoDataset):
    """MSRVTT with miech/jsfusion/full cuts (reference MSRVTT_dataset.py:10-73)."""

    def _load_metadata(self):
        with open(os.path.join(self.meta_root, "msrvtt", "MSR_VTT.json")) as fid:
            data = json.load(fid)
        df = pd.DataFrame(data["annotations"])

        split_dir = os.path.join(self.metadata_dir, "high-quality", "structured-symlinks")
        js_test_cap_idx_path = None
        challenge_splits = {"val", "public_server_val", "public_server_test"}
        if self.cut == "miech":
            train_list, test_list = "train_list_miech.txt", "test_list_miech.txt"
        elif self.cut == "jsfusion":
            train_list, test_list = "train_list_jsfusion.txt", "val_list_jsfusion.txt"
            js_test_cap_idx_path = "jsfusion_val_caption_idx.pkl"
        elif self.cut in {"full-val", "full-test"}:
            train_list = "train_list_full.txt"
            test_list = "val_list_full.txt" if self.cut == "full-val" else "test_list_full.txt"
        elif self.cut in challenge_splits:
            train_list = "train_list.txt"
            test_list = f"{self.cut}_list.txt" if self.cut == "val" else f"{self.cut}.txt"
        else:
            raise ValueError(f"unrecognised MSRVTT split: {self.cut}")

        train_df = pd.read_csv(os.path.join(split_dir, train_list), names=["videoid"])
        test_df = pd.read_csv(os.path.join(split_dir, test_list), names=["videoid"])
        self.split_sizes = {"train": len(train_df), "val": len(test_df), "test": len(test_df)}

        keep = train_df if self.split == "train" else test_df
        df = df[df["image_id"].isin(keep["videoid"])]
        self.metadata = df.groupby(["image_id"])["caption"].apply(list)
        if self.subsample < 1:
            self.metadata = self.metadata.sample(frac=self.subsample)

        if js_test_cap_idx_path is not None and self.split != "train":
            # a pickled pandas Series mapping video id -> pinned caption index
            caps = pd.Series(np.load(os.path.join(split_dir, js_test_cap_idx_path),
                                     allow_pickle=True))
            new_res = pd.DataFrame({"caps": self.metadata, "cap_idx": caps})
            new_res["test_caps"] = new_res.apply(
                lambda x: [x["caps"][int(x["cap_idx"])]], axis=1)
            self.metadata = new_res["test_caps"]
        self.metadata = pd.DataFrame({"captions": self.metadata})

    def _get_video_path(self, sample):
        return (os.path.join(self.data_dir, "videos", "all", sample.name + ".mp4"),
                sample.name + ".mp4")

    def _get_caption(self, sample):
        if self.split in ("train", "val") and self.text_params.get("caption_sample", "rand") == "rand":
            return random.choice(sample["captions"])
        return sample["captions"][0]


class DiDeMo(TextVideoDataset):
    def _load_metadata(self):
        split_files = {"train": "didemo/DiDeMo_train.tsv",
                       "val": "didemo/DiDeMo_test.tsv",
                       "test": "didemo/DiDeMo_test.tsv"}
        md = pd.read_csv(os.path.join(self.meta_root, split_files[self.split]), sep="\t")
        if self.subsample < 1:
            md = md.sample(frac=self.subsample)
        self.metadata = md

    def _get_video_path(self, sample):
        rel = sample.iloc[1]
        return os.path.join(self.data_dir, rel), rel

    def _get_caption(self, sample):
        return sample.iloc[0]


class LSMDC(TextVideoDataset):
    def _load_metadata(self):
        split_files = {"train": "lsmdc/LSMDC16_annos_training_real.csv",
                       "val": "lsmdc/LSMDC16_challenge_1000_publictect.csv",
                       "test": "lsmdc/LSMDC16_challenge_1000_publictect.csv"}
        md = pd.read_csv(os.path.join(self.meta_root, split_files[self.split]), sep="\t")
        if self.subsample < 1:
            md = md.sample(frac=self.subsample)
        self.metadata = md

    def _get_video_path(self, sample):
        video_fp = sample.iloc[0]
        sub_path = video_fp.split(".")[0]
        remove = sub_path.split("_")[-1]
        sub_path = sub_path.replace("_" + remove, "/")
        rel = sub_path + video_fp + ".avi"
        return os.path.join(self.data_dir, rel), rel

    def _get_caption(self, sample):
        return sample.iloc[-1]


class WebVid(TextVideoDataset):
    def _load_metadata(self):
        split_files = {"train": "webvid_train.tsv", "val": "webvid_val.tsv"}
        md = pd.read_csv(os.path.join(self.meta_root, split_files[self.split]), sep="\t")
        if self.subsample < 1:
            md = md.sample(frac=self.subsample)
        elif self.split == "val":
            md = md.sample(min(1000, len(md)), random_state=0)
        self.metadata = md

    def _get_video_path(self, sample):
        rel = str(sample.iloc[1]) + ".mp4"
        return os.path.join(self.data_dir, self.split, rel), rel

    def _get_caption(self, sample):
        return [sample.iloc[0]]  # list-wrapped for YTT joint-training compat


# --------------------------------------------------------------------------
# classification / multiple-choice datasets


class _PromptClassDataset(TextVideoDataset):
    """HMDB51/UCF101/K400 shape: tsv rows (relpath, label_int); text is 'NULL'
    (the zero-shot classifier is built from prompts at eval time)."""

    prompt_subdir = ""
    split_files: dict = {}

    def _load_metadata(self):
        md = pd.read_table(os.path.join(self.meta_root, self.split_files[self.split]),
                           sep="\t")
        if self.subsample < 1:
            md = md.sample(frac=self.subsample)
        elif self.split == "val":
            md = md.sample(min(1000, len(md)), random_state=0)
        self.metadata = md
        self.label_type = "label"

    def _get_caption(self, sample):
        return "NULL"


class Kinetics400(_PromptClassDataset):
    split_files = {"train": "k400/prompt/kinetics400_train_list_videos.tsv",
                   "val": "k400/prompt/kinetics400_val_list_videos.tsv",
                   "test": "k400/prompt/kinetics400_val_list_videos.tsv"}

    def _get_video_path(self, sample):
        rel_path = sample.iloc[0]
        class_name, video_name = rel_path.split("/")
        if video_name.endswith(".mkv"):
            video_name = video_name[:-4] + ".mp4"
        sub = "train/train" if self.split == "train" else "videos_val"
        return os.path.join(self.data_dir, sub, video_name), video_name


class HMDB51(_PromptClassDataset):
    # reference HMDB51_dataset.py: split_1 lists, video path relative to data_dir
    split_files = {"train": "hmdb51/prompt/split_1_train_list.tsv",
                   "val": "hmdb51/prompt/split_1_test_list.tsv",
                   "test": "hmdb51/prompt/split_1_test_list.tsv"}

    def _get_video_path(self, sample):
        rel = sample.iloc[0]
        return os.path.join(self.data_dir, rel), rel


class UCF101(_PromptClassDataset):
    # reference UCF101_dataset.py: trainlist01/testlist01 tsvs
    split_files = {"train": "ucf101/prompt/trainlist01_new.tsv",
                   "val": "ucf101/prompt/testlist01_new.tsv",
                   "test": "ucf101/prompt/testlist01_new.tsv"}

    def _get_video_path(self, sample):
        rel = sample.iloc[0]
        return os.path.join(self.data_dir, rel), rel


class SSV2_mc(TextVideoDataset):
    """174-option multiple choice (reference SSV2_mc_dataset.py:13-73)."""

    def _load_metadata(self):
        split_files = {"val": "ssv2/mc/val.jsonl", "test": "ssv2/mc/val.jsonl"}
        self.metadata = []
        with open(os.path.join(self.meta_root, split_files[self.split])) as f:
            for line in f:
                line = line.strip()
                if line:
                    self.metadata.append(json.loads(line))

    def __len__(self):
        return len(self.metadata)

    def _get_video_path(self, sample):
        return (os.path.join(self.data_dir, "videos", sample["clip_name"]),
                os.path.join("videos", sample["clip_name"]))

    def __getitem__(self, item):
        rng = np.random.default_rng(random.getrandbits(63))
        sample = self.metadata[item % len(self.metadata)]
        video_fp, rel_fp = self._get_video_path(sample)
        final = self._load_clip(video_fp, None, rng)
        return {
            "video": final,
            "text": sample["options"],
            "label": int(sample["answer"]),
            "keep_ind": self._tube_mask(rng),
            "meta": {"raw_captions": "NULL", "paths": rel_fp,
                     "dataset": self.dataset_name},
        }


DATASET_REGISTRY = {
    "MSRVTT": MSRVTT,
    "DiDeMo": DiDeMo,
    "LSMDC": LSMDC,
    "WebVid": WebVid,
    "Kinetics400": Kinetics400,
    "HMDB51": HMDB51,
    "UCF101": UCF101,
    "SSV2_mc": SSV2_mc,
}


def dataset_loader(dataset_name: str, *args, **kwargs):
    """Name -> dataset dispatch (reference data_loader.py:15-68)."""
    from tvts_tpu.data.image_datasets import ConceptualCaptions3M
    from tvts_tpu.data.ytt import YTTemporal

    registry = dict(DATASET_REGISTRY, YTTemporal=YTTemporal,
                    ConceptualCaptions3M=ConceptualCaptions3M)
    if dataset_name not in registry:
        raise NotImplementedError(f"dataset {dataset_name} not implemented")
    return registry[dataset_name](dataset_name, *args, **kwargs)
