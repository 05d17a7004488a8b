"""Zero-shot text<->video retrieval.

Behavioral contract: reference v2/downstream/zero_ret_TVTSv2_ViT_B_16.py:27-106:
split=test, shuffle off; optional --sliding_window_stride test-time temporal aug
with per-video mean-pooling of window embeddings (:71-95); sims -> t2v/v2t metrics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tvts_tpu.eval.embed import extract_embeddings, verbose
from tvts_tpu.ops import metrics as metrics_mod
from tvts_tpu.ops.sim import sim_matrix


def sliding_window_meanpool(vid_embeds, text_embeds, metas):
    """Mean-pool per-video window embeddings; dedup captions (reference :71-95)."""
    videoids = pd.Series([m["paths"] for m in metas])
    raw_caps = pd.Series([str(m["raw_captions"]) for m in metas])
    df = pd.DataFrame({"videoid": videoids, "cap": raw_caps,
                       "vid": list(vid_embeds), "txt": list(text_embeds)})
    new_vid, new_txt = [], []
    for vid in df["videoid"].unique():
        tdf = df[df["videoid"] == vid]
        new_vid.append(np.stack(tdf["vid"].tolist()).mean(axis=0))
        for cap in tdf["cap"].unique():
            cdf = df[df["cap"] == cap]
            new_txt.append(cdf["txt"].iloc[0])
    return np.stack(new_vid), np.stack(new_txt)


def run_retrieval(model, params, loader, metric_names=("t2v_metrics", "v2t_metrics"),
                  sliding_window: bool = False, context_length: int = 77,
                  use_fused: bool = False):
    out = extract_embeddings(model, params, loader, context_length=context_length,
                             use_fused=use_fused)
    vid, txt = out["video"], out["text"]
    if sliding_window:
        vid, txt = sliding_window_meanpool(vid, txt, out["metas"])
    sims = np.asarray(sim_matrix(txt, vid))
    nested = {}
    for name in metric_names:
        res = getattr(metrics_mod, name)(sims)
        verbose(epoch=0, metrics=res, name="", mode=name)
        nested[name] = res
    return nested, sims
