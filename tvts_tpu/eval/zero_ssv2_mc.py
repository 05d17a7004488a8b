"""SSV2 multiple-choice zero-shot eval.

Behavioral contract: reference v2/downstream/zero_ssv2_mc_TVTSv2_ViT_B_16.py:66-94:
per video, embed its 174 candidate texts separately (the `_mc` model variants skip
text averaging), score with bmm(video, optionsᵀ) on normalized embeddings, take
argmax vs the answer index.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tvts_tpu.eval.embed import _pad_to, make_embed_fns
from tvts_tpu.text.tokenizer import tokenize_openclip


def run_ssv2_mc(model, params, loader, context_length: int = 77):
    embed_text, embed_video = make_embed_fns(model)
    batch_size = loader.batch_size

    correct, total = 0, 0
    for batch in loader:
        n = batch["video"].shape[0]
        video = _pad_to(batch["video"].astype(np.float32), batch_size)
        keep = _pad_to(batch["keep_ind"].astype(np.int32), batch_size)
        v = np.asarray(embed_video(params, jnp.asarray(video), jnp.asarray(keep)),
                       dtype=np.float32)[:n]
        v = v / np.linalg.norm(v, axis=-1, keepdims=True)

        # batch['text'] is option-major: [n_options][batch]
        n_opt = len(batch["text"])
        labels = np.asarray(batch["label"])[:n]
        for b in range(n):
            options = [batch["text"][o][b] for o in range(n_opt)]
            ids = tokenize_openclip(options, context_length=context_length)
            t = np.asarray(embed_text(params, jnp.asarray(ids)), dtype=np.float32)
            t = t / np.linalg.norm(t, axis=-1, keepdims=True)
            pred = int(np.argmax(t @ v[b]))
            correct += int(pred == labels[b])
            total += 1
    acc = correct / max(total, 1)
    print(f"SSV2-MC accuracy: {100 * acc:.2f}% ({correct}/{total})")
    return {"accuracy": acc, "correct": correct, "total": total}
