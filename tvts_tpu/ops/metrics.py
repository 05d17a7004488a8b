"""Retrieval / classification metrics.

Behavioral contract: reference v2/model/metric.py. Rank semantics are preserved
exactly, including tie-breaking:

- `t2v_metrics` (metric.py:16-124) breaks ties *optimistically* — the rank of the
  ground truth is the count of strictly smaller distances in the row.
- `v2t_metrics` (metric.py:127-216) breaks ties by *averaging* — rank =
  (#strictly-smaller) + (#equal - 1) / 2 — and takes the best-ranked ground-truth
  caption per video. Masked captions get distance 1e8.
- `retrieval_as_classification` (metric.py:219-282) averages ties and subtracts the
  enumeration index of each ground-truth label (in ascending label order, matching
  the reference's np.where iteration).

Implementations are vectorized numpy rather than the reference's sort-and-scan,
verified equal by tests/test_metrics.py against the reference module.
"""

from __future__ import annotations

import numpy as np
import scipy.stats


MISSING_VAL = 1e8


def cols2metrics(cols: np.ndarray, num_queries: int) -> dict:
    cols = np.asarray(cols)
    metrics = {
        "R1": 100 * float(np.sum(cols == 0)) / num_queries,
        "R5": 100 * float(np.sum(cols < 5)) / num_queries,
        "R10": 100 * float(np.sum(cols < 10)) / num_queries,
        "R50": 100 * float(np.sum(cols < 50)) / num_queries,
        "MedR": float(np.median(cols) + 1),
        "MeanR": float(np.mean(cols) + 1),
    }
    stats = [metrics[x] for x in ("R1", "R5", "R10")]
    metrics["geometric_mean_R1-R5-R10"] = float(scipy.stats.mstats.gmean(stats))
    return metrics


def t2v_metrics(sims: np.ndarray, query_masks: np.ndarray | None = None) -> dict:
    """sims: [num_queries, num_vids]; query i's ground truth video is i // (N/M)."""
    sims = np.asarray(sims)
    assert sims.ndim == 2, "expected a matrix"
    num_queries, num_vids = sims.shape
    dists = -sims
    queries_per_video = num_queries // num_vids
    gt_vid = np.arange(num_queries) // queries_per_video
    gt_dists = dists[np.arange(num_queries), gt_vid][:, None]
    # optimistic tie-break: rank = count of strictly smaller distances
    cols = np.sum(dists < gt_dists, axis=1)

    if query_masks is not None:
        assert query_masks.size == num_queries, "invalid query mask shape"
        keep = query_masks.reshape(-1).astype(bool)
        cols = cols[keep]
        num_queries = int(query_masks.sum())
    return cols2metrics(cols, num_queries)


def v2t_metrics(sims: np.ndarray, query_masks: np.ndarray | None = None) -> dict:
    """sims: [num_caps, num_vids] (same orientation as t2v input; transposed inside)."""
    sims = np.asarray(sims)
    dists = -sims.T  # [num_vids, num_caps]
    assert dists.ndim == 2, "expected a matrix"
    num_queries, num_caps = dists.shape
    caps_per_video = num_caps // num_queries

    dists = dists.copy()
    if query_masks is not None:
        dists[:, ~query_masks.reshape(-1).astype(bool)] = MISSING_VAL

    query_ranks = np.empty(num_queries)
    for ii in range(num_queries):
        row = dists[ii]
        best = np.inf
        for jj in range(ii * caps_per_video, (ii + 1) * caps_per_video):
            val = row[jj]
            if val == MISSING_VAL:
                continue
            less = np.sum(row < val)
            eq = np.sum(row == val)
            rank = less + (eq - 1) / 2.0  # averaging tie-break
            if rank < best:
                best = rank
        query_ranks[ii] = best
    return cols2metrics(query_ranks, num_queries)


def retrieval_as_classification(sims: np.ndarray, query_masks: np.ndarray) -> dict:
    """sims: [num_labels, num_videos]; query_masks marks the gt labels per video."""
    sims = np.asarray(sims)
    assert sims.ndim == 2, "expected a matrix"
    dists = -sims.T  # [num_videos, num_labels]
    masks = np.asarray(query_masks).T
    num_queries, _ = dists.shape

    query_ranks = []
    for ii in range(num_queries):
        row = dists[ii]
        label_ranks = []
        for gt_label in np.where(masks[ii])[0]:
            val = row[gt_label]
            less = np.sum(row < val)
            eq = np.sum(row == val)
            label_ranks.append(less + (eq - 1) / 2.0)
        # discount better-ranked gt labels (reference enumerates in np.where order)
        label_ranks = [x - idx for idx, x in enumerate(label_ranks)]
        query_ranks.extend(label_ranks)
    query_ranks = np.array(query_ranks)
    return cols2metrics(query_ranks, num_queries=len(query_ranks))


def acc(output: np.ndarray, target: np.ndarray) -> float:
    """Top-1 accuracy. Reference metric.py:304-310."""
    pred = np.argmax(np.asarray(output), axis=1)
    target = np.asarray(target)
    assert pred.shape[0] == len(target)
    return float(np.sum(pred == target)) / len(target)


def topk_acc(output: np.ndarray, target: np.ndarray, k: int = 5) -> float:
    """Top-k accuracy. Reference metric.py:313-320 (`my_metric2`)."""
    output = np.asarray(output)
    target = np.asarray(target)
    topk = np.argsort(-output, axis=1, kind="stable")[:, :k]
    return float(np.sum(topk == target[:, None])) / len(target)


def _pair_matches(output: np.ndarray, target: np.ndarray) -> int:
    """Count predicted (video, text) pairs appearing in the target pair set.

    output/target: [B, P, 2] int arrays of id pairs. A predicted pair counts
    when some target row of the same batch element matches in BOTH columns.
    """
    output = np.asarray(output)
    target = np.asarray(target)
    assert output.shape[0] == target.shape[0]
    assert output.shape[2] == target.shape[2] == 2
    # [B, P_out, P_targ]: full-pair equality, any target row per predicted pair
    hit = (output[:, :, None, :] == target[:, None, :, :]).all(-1).any(-1)
    return int(hit.sum())


def video_precision(output: np.ndarray, target: np.ndarray) -> float:
    """Fraction of predicted pairs aligned to a matching text pair.

    Reference metric.py:323-334.
    """
    target = np.asarray(target)
    return _pair_matches(output, target) / (target.shape[0] * target.shape[1])


def video_precision_adj(output: np.ndarray, target: np.ndarray) -> float:
    """video_precision with the denominator restricted to videos that have
    an aligning text: the number of unique video ids in target[:, :, 0].

    Reference metric.py:337-372 (defined twice there, identically; the second
    definition wins at import time — both compute this).
    """
    target = np.asarray(target)
    denom = len(np.unique(target[:, :, 0]))
    return _pair_matches(output, target) / denom
