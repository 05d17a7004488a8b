"""ASR transcript cleaning and DTW alignment for YT-Temporal.

Behavioral contract: reference v2/base/base_dataset_yt.py:439-522
(`align_using_dtw`, `clean_subtitles`, `clean_description`). The reference pulls in
editdistance (C), tslearn (numba DTW), ftfy and demoji; none are TPU-relevant and
all run host-side, so they are reimplemented in pure numpy/python:

- `edit_distance` — classic Levenshtein DP (== editdistance.eval).
- `dtw_path` — dynamic-programming DTW over a precomputed cost matrix
  (== tslearn.metrics.dtw_path_from_metric(metric='precomputed')), standard
  3-way recurrence with path backtracking.
- ftfy/demoji fallbacks degrade to identity / regex emoji stripping when the
  packages are absent (they only affect mojibake and emoji spans).
"""

from __future__ import annotations

import re
import string

import numpy as np

try:
    import ftfy as _ftfy

    def _fix_text(s: str) -> str:
        return _ftfy.ftfy(s)
except ImportError:
    def _fix_text(s: str) -> str:
        return s

_EMOJI_RE = re.compile(
    "[\U0001F000-\U0001FAFF\U00002600-\U000027BF\U0001F1E6-\U0001F1FF←-⇿⬀-⯿]+"
)
_URL_RE = re.compile(
    r"""(?i)\b((?:https?://|www\d{0,3}[.]|[a-z0-9.\-]+[.][a-z]{2,4}/)"""
    r"""(?:[^\s()<>]+|\(([^\s()<>]+|(\([^\s()<>]+\)))*\))+"""
    r"""(?:\(([^\s()<>]+|(\([^\s()<>]+\)))*\)|[^\s`!()\[\]{};:'".,<>?«»“”‘’]))"""
)


def edit_distance(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a or not b:
        return max(len(a), len(b))
    prev = np.arange(len(b) + 1)
    cur = np.empty(len(b) + 1, dtype=np.int64)
    for i, ca in enumerate(a, 1):
        cur[0] = i
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev, cur = cur, prev
    return int(prev[len(b)])


def dtw_path(cost: np.ndarray) -> list[tuple[int, int]]:
    """Optimal DTW path through a precomputed cost matrix (monotone, step set
    {(1,0),(0,1),(1,1)}), matching tslearn's precomputed-metric dtw."""
    n, m = cost.shape
    acc = np.full((n + 1, m + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, n + 1):
        row_c = cost[i - 1]
        for j in range(1, m + 1):
            acc[i, j] = row_c[j - 1] + min(acc[i - 1, j], acc[i, j - 1], acc[i - 1, j - 1])
    path = []
    i, j = n, m
    while i > 0 and j > 0:
        path.append((i - 1, j - 1))
        moves = (acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1])
        k = int(np.argmin(moves))
        if k == 0:
            i, j = i - 1, j - 1
        elif k == 1:
            i -= 1
        else:
            j -= 1
    path.reverse()
    return path


def align_using_dtw(input_asr, grover_output, radius_perc: float = 0.1,
                    radius_abs: int = 32) -> list[str]:
    """Align raw ASR words to denoised text via banded edit-distance DTW."""
    input_asr = list(input_asr)
    grover_output = list(grover_output)
    max_radius = int(max(len(input_asr) * radius_perc, radius_abs))
    if len(grover_output) > len(input_asr):
        grover_output = grover_output[: len(input_asr) + max_radius]

    cost = np.full((len(input_asr), len(grover_output)), 9999.0, dtype=np.float32)

    def _pre(x: str) -> str:
        return x.translate(str.maketrans("", "", string.punctuation)).strip().lower()

    asr_pre = [_pre(x) for x in input_asr]
    gro_pre = [_pre(x) for x in grover_output]
    for a_idx, a in enumerate(asr_pre):
        lo = max(a_idx - max_radius, 0)
        hi = min(a_idx + max_radius, len(gro_pre))
        for o_idx in range(lo, hi):
            cost[a_idx, o_idx] = edit_distance(a, gro_pre[o_idx])

    idxs = dtw_path(cost)
    denoised_out: list[list[str]] = [[] for _ in input_asr]
    has_seen = -1
    for idx1, idx2 in idxs:
        if idx1 >= len(input_asr) or idx2 >= len(grover_output):
            break
        if idx2 > has_seen:  # skip duplicate grover matches
            denoised_out[idx1].append(grover_output[idx2])
        has_seen = idx2
    return [" ".join(x) for x in denoised_out]


def clean_subtitles(subtitle_dicts: list[dict]) -> list[dict]:
    """Drop HTML-entity junk words and ftfy-fix the rest."""
    out = []
    for x in subtitle_dicts:
        word = x["word"]
        if word.startswith("&") or word.endswith(";"):
            continue
        fixed = _fix_text(word)
        if not fixed:
            continue
        out.append({**x, "word": fixed})
    return out


def clean_description(text: str) -> str:
    """Strip emojis, URLs (replaced by '%'), collapse whitespace."""
    text = _EMOJI_RE.sub("", text).strip()
    text = _URL_RE.sub("%", text)
    text = re.sub(" +", " ", text)
    text = re.sub(r"\s*\n+", "\n", text)
    return text.strip()
