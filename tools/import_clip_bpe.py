#!/usr/bin/env python
"""Snapshot the canonical OpenAI CLIP BPE merge table into the framework asset format.

Reads any `bpe_simple_vocab_16e6.txt.gz` (the public vocab file shipped with every
CLIP/open_clip install) and writes `tvts_tpu/assets/clip_bpe.json.gz` containing
only the 48894 merge rules, as JSON. The tokenizer loads this framework-owned
format by default; the original txt.gz also works via TVTS_TPU_BPE_PATH.
"""

import argparse
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tvts_tpu.text.tokenizer import _NUM_MERGES, default_asset_path  # noqa: E402

DEFAULT_SOURCES = [
    "/root/reference/v2/CLIP/clip/bpe_simple_vocab_16e6.txt.gz",
    "/root/reference/v2/OpenCLIP/bpe_simple_vocab_16e6.txt.gz",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=None, help="path to bpe_simple_vocab_16e6.txt.gz")
    ap.add_argument("--dst", default=os.path.normpath(default_asset_path()))
    args = ap.parse_args()

    src = args.src or next((p for p in DEFAULT_SOURCES if os.path.exists(p)), None)
    if src is None:
        raise SystemExit("no source vocab found; pass --src")

    lines = gzip.open(src).read().decode("utf-8").split("\n")
    merges = [" ".join(line.split()) for line in lines[1 : _NUM_MERGES + 1]]
    assert len(merges) == _NUM_MERGES and all(len(m.split(" ")) == 2 for m in merges)

    os.makedirs(os.path.dirname(args.dst), exist_ok=True)
    with gzip.open(args.dst, "wt", encoding="utf-8") as f:
        json.dump({"format": "tvts-tpu-clip-bpe-v1", "merges": merges}, f)
    print(f"wrote {len(merges)} merges -> {args.dst}")


if __name__ == "__main__":
    main()
