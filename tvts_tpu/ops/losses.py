"""Training losses.

Behavioral contracts:
- `norm_softmax_loss`: reference v2/model/loss.py:7-25 (`NormSoftmaxLoss`,
  temperature 0.05) — symmetric log-softmax over the similarity matrix, negative
  mean of both diagonals. For non-square matrices the reference's `torch.diag`
  takes the main diagonal of length min(N, M); we match that.
- `sort_loss`: reference v2/trainer/trainer.py:487-492 — cross-entropy of the
  [B, n, n] sort logits against [B, n] integer labels, flattened, scaled by 2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def norm_softmax_loss(sim: jnp.ndarray, temperature: float = 0.05) -> jnp.ndarray:
    """Symmetric InfoNCE over a cosine-similarity matrix (diagonal = positives)."""
    x = sim / temperature
    i_logsm = jax.nn.log_softmax(x, axis=1)
    j_logsm = jax.nn.log_softmax(x.T, axis=1)
    k = min(sim.shape)
    loss_i = jnp.mean(jnp.diagonal(i_logsm)[:k])
    loss_j = jnp.mean(jnp.diagonal(j_logsm)[:k])
    return -loss_i - loss_j


def sort_loss(pred_order: jnp.ndarray, labels: jnp.ndarray, scale: float = 2.0) -> jnp.ndarray:
    """Transcript-sorting cross-entropy.

    pred_order: [B, n_trans, n_trans] logits — row i scores transcript i's clip position.
    labels:     [B, n_trans] int class targets (identity arange in the released data).
    """
    n = pred_order.shape[-1]
    logits = pred_order.reshape(-1, n)
    tgt = labels.reshape(-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
    return scale * jnp.mean(nll)


def sort_accuracy(pred_order: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Exact-match accuracy of the sort head: a sample counts only if ALL
    clip positions are predicted correctly (`np.all(preds == labels, axis=1)`,
    reference v2/trainer/trainer.py:585-588). The reference logs this ratio
    both as 'Top-1 Accuracy for Frame Prediction' (:633) and — quirk — as
    `val_loss_{i}` (:630-631)."""
    pred = jnp.argmax(pred_order, axis=-1)
    return jnp.mean(jnp.all(pred == labels, axis=-1).astype(jnp.float32))
