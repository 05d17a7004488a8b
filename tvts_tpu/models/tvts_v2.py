"""TVTSv2 combined model: text tower + space-time video tower + sort head.

Behavioral contract: reference v2/model/model_dist_TVTSv2_ViT_B_16.py:61-116 (and the
B_32 / H_14 twins):

- text ids arrive clip-major as [n_trans * B, ctx]; per-clip embeddings are reshaped
  to [n_trans, B, D];
- the sort head consumes the per-clip text embeddings DETACHED (:69, stop_gradient
  here) alongside the video order tokens (all projected tokens for B/*, patch tokens
  only for H/14);
- the contrastive text embedding is the mean over the n_trans clips (:74-76);
- the contrastive video embedding is the pooled CLS (:113-116).

Returns (text_embeddings [B, D], video_embeddings [B, D], predict_order
[B, n_trans, n_trans] or None when n_trans == 1).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tvts_tpu.models.configs import TVTSv2Config
from tvts_tpu.models.sort import SortTransformer
from tvts_tpu.models.space_time_vit import SpaceTimeViT
from tvts_tpu.models.text import TextTransformer


class TVTSv2(nn.Module):
    cfg: TVTSv2Config
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    use_pallas: bool = False  # fused attention kernels (forward-only)
    token_partition: tuple | None = None  # sequence-parallel token sharding

    def setup(self):
        self.video_model = SpaceTimeViT(self.cfg.vision, dtype=self.dtype,
                                        remat=self.remat,
                                        use_pallas=self.use_pallas,
                                        token_partition=self.token_partition)
        self.text_model = TextTransformer(self.cfg.text, dtype=self.dtype,
                                          remat=self.remat)
        self.pred_model = SortTransformer(self.cfg.sort, dtype=self.dtype)

    def compute_text(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        """[N, ctx] int32 -> [N, D] text embeddings (pre-normalization)."""
        return self.text_model(token_ids)

    def compute_video(self, video: jnp.ndarray, keep_ind: jnp.ndarray | None = None):
        """[B, T, C, H, W] -> (pooled [B, D], order_tokens [B, S', D])."""
        pooled, tokens = self.video_model(video, keep_ind)
        return pooled, tokens

    def __call__(self, video: jnp.ndarray, text_ids: jnp.ndarray,
                 keep_ind: jnp.ndarray | None = None):
        bz = video.shape[0]
        text_emb = self.compute_text(text_ids)  # [n_trans * B, D]
        n_trans = text_emb.shape[0] // bz

        per_clip = text_emb.reshape(n_trans, bz, text_emb.shape[-1])
        text_embeddings = per_clip.mean(axis=0)

        video_embeddings, order_tokens = self.compute_video(video, keep_ind)

        predict_order = None
        if n_trans != 1:
            sort_text = jax.lax.stop_gradient(per_clip).transpose(1, 0, 2)  # [B, n, D]
            predict_order = self.pred_model(sort_text, order_tokens)

        return text_embeddings, video_embeddings, predict_order
