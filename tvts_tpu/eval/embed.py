"""Shared embedding-extraction loop for all zero-shot evals.

Behavioral contract: the collection loop shared by
zero_ret_/zero_recognition_/zero_ssv2_mc_TVTSv2_*.py (e.g. zero_ret_...:51-65):
tokenize(truncate) -> model -> collect text/video embeddings (+ labels/meta).

TPU-first notes: batches are padded to a fixed size so a single jitted graph
serves the whole epoch (no retracing on the ragged last batch); pad rows are
trimmed after device execution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tvts_tpu.text.tokenizer import tokenize_openclip


def _pad_to(arr: np.ndarray, n: int) -> np.ndarray:
    if arr.shape[0] == n:
        return arr
    pad = np.repeat(arr[-1:], n - arr.shape[0], axis=0)
    return np.concatenate([arr, pad], axis=0)


def make_embed_fns(model, use_fused: bool = False):
    """use_fused: route the video tower through the hand-scheduled fused
    megakernel forward (ops/fused_forward.py; 'openai'-pool towers only —
    checkpoint-compatible, ~1.18x on v5e)."""

    tcfg = getattr(model.cfg, "text", None)
    if use_fused and tcfg is not None:
        from tvts_tpu.ops.pallas_text_attention import (
            text_transformer_fused_forward,
        )

        @jax.jit
        def embed_text(params, ids):
            return text_transformer_fused_forward(
                params["text_model"], tcfg, ids, dtype=model.dtype)
    else:
        @jax.jit
        def embed_text(params, ids):
            return model.apply({"params": params}, ids,
                               method=lambda m, t: m.compute_text(t))

    vcfg0 = getattr(model.cfg, "vision", None)
    if (use_fused and vcfg0 is not None
            and vcfg0.pool_style in ("openai", "openclip")
            and vcfg0.ls_init is None):  # fused path has no LayerScale support
        from tvts_tpu.ops.fused_forward import space_time_vit_fused_forward

        vcfg = model.cfg.vision
        # geometry-aware kernel choice (PERF.md round-5 refresh):
        # N >= 128 patches/frame -> v7 d-major tower + v9 frame-batched
        # space (B/16 227.8 clips/s, H/14 24.95); small-N geometries (B/32's
        # 49) keep the v2 row-major kernels (d-major lane pad dominates;
        # B/32 424.4 clips/s)
        if vcfg.patches_per_frame >= 128:
            kv = 7
            fpp = next((c for c in (3, 2) if vcfg.num_frames % c == 0), 1)
        else:
            kv, fpp = 2, None

        @jax.jit
        def embed_video(params, video, keep):
            pooled, _ = space_time_vit_fused_forward(
                params["video_model"], vcfg, video, keep, dtype=model.dtype,
                kernel_version=kv, space_fpp=fpp, need_tokens=False)
            return pooled
    else:
        @jax.jit
        def embed_video(params, video, keep):
            pooled, _ = model.apply({"params": params}, video, keep,
                                    method=lambda m, v, k: m.compute_video(v, k))
            return pooled

    return embed_text, embed_video


def extract_embeddings(model, params, loader, with_text: bool = True,
                       context_length: int = 77, use_fused: bool = False):
    """Iterate a test loader; returns dict with 'video' [N,D] (f32), optionally
    'text' [N,D], plus 'labels' and 'metas' when present."""
    embed_text, embed_video = make_embed_fns(model, use_fused=use_fused)
    batch_size = loader.batch_size

    vid_out, txt_out, labels, metas = [], [], [], []
    for batch in loader:
        n = batch["video"].shape[0]
        video = _pad_to(batch["video"].astype(np.float32), batch_size)
        keep = _pad_to(batch["keep_ind"].astype(np.int32), batch_size)
        v = embed_video(params, jnp.asarray(video), jnp.asarray(keep))
        vid_out.append(np.asarray(v, dtype=np.float32)[:n])
        if with_text and isinstance(batch.get("text"), list) \
                and batch["text"] and isinstance(batch["text"][0], str):
            ids = tokenize_openclip(batch["text"], context_length=context_length)
            ids = _pad_to(ids, batch_size)
            t = embed_text(params, jnp.asarray(ids))
            txt_out.append(np.asarray(t, dtype=np.float32)[:n])
        if "label" in batch:
            labels.extend(np.asarray(batch["label"]).tolist())
        if "meta" in batch:
            metas.extend(batch["meta"])

    out = {"video": np.concatenate(vid_out)}
    if txt_out:
        out["text"] = np.concatenate(txt_out)
    if labels:
        out["labels"] = np.asarray(labels)
    if metas:
        out["metas"] = metas
    return out


def verbose(epoch: int, metrics: dict, name: str = "", mode: str = "t2v_metrics"):
    """Retrieval metric pretty-printer (reference trainer.py:942-947)."""
    r1, r5, r10, r50 = metrics["R1"], metrics["R5"], metrics["R10"], metrics["R50"]
    msg = f"[{mode}]{name:s} epoch {epoch}, R@1: {r1:.1f}"
    msg += f", R@5: {r5:.1f}, R@10 {r10:.1f}, R@50 {r50:.1f}"
    msg += f"MedR: {metrics['MedR']:g}, MeanR: {metrics['MeanR']:.1f}"
    print(msg)
    return msg
