"""Zero-shot video-to-video retrieval (TVTS v1 downstream eval).

Behavioral contract: reference v1/downstream/run_class_zero.py:345-414:
embed every val clip (video tower CLS, no classifier head), self-masked cosine
similarity matrix (diagonal set to -1000), rank = first top-10 retrieved video
sharing the query's class label; report R@1/5/10.
"""

from __future__ import annotations

import numpy as np


def v2v_retrieval_metrics(feats: np.ndarray, labels: np.ndarray,
                          recall_k: int = 10) -> dict:
    feats = np.asarray(feats, dtype=np.float32)
    labels = np.asarray(labels)
    norm = np.linalg.norm(feats, axis=1, keepdims=True)
    f = feats / np.maximum(norm, 1e-8)
    scores = f @ f.T
    np.fill_diagonal(scores, -1000.0)

    same = labels[:, None] == labels[None, :]
    ix = np.argsort(-scores, axis=1)
    n = len(labels)
    ranks = np.full(n, 1e20)
    for q in range(n):
        for r in range(recall_k):
            if same[q, ix[q, r]]:
                ranks[q] = r
                break
    return {
        "R1": 100.0 * float(np.sum(ranks < 1)) / n,
        "R5": 100.0 * float(np.sum(ranks < 5)) / n,
        "R10": 100.0 * float(np.sum(ranks < 10)) / n,
    }


def run_zero_v2v(model, params, loader, embed_fn=None):
    """Embed all val clips with the (headless) video tower and score v2v."""
    import jax
    import jax.numpy as jnp

    if embed_fn is None:
        @jax.jit
        def embed_fn(p, video):
            tokens = model.apply({"params": p}, video)
            return tokens[:, 0] if tokens.ndim == 3 else tokens

    feats, labels = [], []
    for batch in loader:
        out = embed_fn(params, jnp.asarray(batch["video"]))
        feats.append(np.asarray(out, dtype=np.float32))
        labels.extend(np.asarray(batch["label"]).tolist())
    res = v2v_retrieval_metrics(np.concatenate(feats), np.asarray(labels))
    print(f"R@1: {res['R1']}\nR@5: {res['R5']}\nR@10: {res['R10']}")
    return res
