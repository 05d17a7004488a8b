"""Zero-shot action recognition via a prompt classifier.

Behavioral contract: reference v2/downstream/zero_recognition_TVTSv2_ViT_B_16.py:
- classifier: per class, tokenize 'a person {cls}', embed, L2-normalize, average
  over templates, stack into W (:67-80); label names/ids from
  meta_data/<ds>/prompt/label2id.json (:60-64)
- logits = 100 * normalized_video @ W; accumulate top-1/top-5 (:87-115)
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from tvts_tpu.eval.embed import extract_embeddings, make_embed_fns
from tvts_tpu.text.tokenizer import tokenize_openclip

PROMPT_TEMPLATES = ["a person {}"]


def build_zero_shot_classifier(model, params, classnames,
                               templates=PROMPT_TEMPLATES,
                               context_length: int = 77) -> np.ndarray:
    """[D, n_classes] prompt-averaged normalized text classifier."""
    embed_text, _ = make_embed_fns(model)
    weights = []
    for name in classnames:
        texts = [t.format(name) for t in templates]
        ids = tokenize_openclip(texts, context_length=context_length)
        emb = np.asarray(embed_text(params, jnp.asarray(ids)), dtype=np.float32)
        emb = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
        mean = emb.mean(axis=0)
        weights.append(mean / np.linalg.norm(mean))
    return np.stack(weights, axis=1)


def load_label2id(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def run_recognition(model, params, loader, classnames,
                    templates=PROMPT_TEMPLATES, context_length: int = 77,
                    use_fused: bool = False):
    W = build_zero_shot_classifier(model, params, classnames, templates,
                                   context_length)
    out = extract_embeddings(model, params, loader, with_text=False,
                             context_length=context_length, use_fused=use_fused)
    v = out["video"]
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    logits = 100.0 * v @ W
    labels = out["labels"]
    top1 = float(np.mean(np.argmax(logits, axis=1) == labels))
    top5_idx = np.argsort(-logits, axis=1)[:, :5]
    top5 = float(np.mean(np.any(top5_idx == labels[:, None], axis=1)))
    print(f"Top-1 accuracy: {100 * top1:.2f}%  Top-5 accuracy: {100 * top5:.2f}%")
    return {"top1": top1, "top5": top5, "logits": logits}
