"""TVTS v1 combined model: DistilBERT text tower + joint-attention video ViT +
sort head + minimal projections.

Behavioral contract: reference v1/model/model_dist_TVTS.py:18-143:
- text: DistilBERT last_hidden_state[:, 0] (CLS); txt_proj = ReLU -> Linear(768,256)
- video: JointViT tokens; contrastive embedding = vid_proj(CLS) = Linear(768,256)
- sort head: SortTransformer(embed 768, 12 heads) over PRE-projection features —
  detached per-clip text CLS [B, 4, 768] + all video tokens (:101-117)
- text ids arrive clip-major [n_trans * B, L] with an attention mask (the
  reference pads dynamically to the longest; we pad statically to max_length for
  XLA shape stability — attention-masked, numerically identical).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from tvts_tpu.models.configs import SortConfig
from tvts_tpu.models.distilbert import DistilBertConfig, DistilBertEncoder
from tvts_tpu.models.joint_vit import JointViT
from tvts_tpu.models.sort import SortTransformer


@dataclasses.dataclass(frozen=True)
class TVTSv1Config:
    name: str = "TVTS"
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    heads: int = 12
    num_frames: int = 16
    tubelet_size: int = 2
    projection_dim: int = 256
    num_clips: int = 4
    mask_ratio: float = 0.75
    max_text_len: int = 50
    sort_heads: int = 12
    text: DistilBertConfig = DistilBertConfig()

    @property
    def patches_per_frame(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def n_keep(self) -> int:
        return int(self.patches_per_frame * (1.0 - self.mask_ratio))

    @property
    def n_tubes(self) -> int:
        return self.num_frames // self.tubelet_size


class TVTSv1(nn.Module):
    cfg: TVTSv1Config = TVTSv1Config()
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        cfg = self.cfg
        self.text_model = DistilBertEncoder(cfg.text, dtype=self.dtype)
        self.video_model = JointViT(
            img_size=cfg.img_size, patch_size=cfg.patch_size,
            embed_dim=cfg.embed_dim, depth=cfg.depth, heads=cfg.heads,
            num_frames=cfg.num_frames, tubelet_size=cfg.tubelet_size,
            dtype=self.dtype, remat=self.remat)
        self.txt_proj = nn.Dense(cfg.projection_dim, dtype=self.dtype)
        self.vid_proj = nn.Dense(cfg.projection_dim, dtype=self.dtype)
        self.pred_model = SortTransformer(
            SortConfig(embed_dim=cfg.embed_dim, num_heads=cfg.sort_heads,
                       num_classes=cfg.num_clips), dtype=self.dtype)

    def compute_text(self, input_ids, attention_mask):
        """-> (pre-projection CLS [N, 768], projected [N, 256])."""
        hidden = self.text_model(input_ids, attention_mask)
        before = hidden[:, 0]
        return before, self.txt_proj(nn.relu(before))

    def compute_video(self, video, keep_ind=None):
        """-> (all tokens [B, S, 768], projected CLS [B, 256])."""
        tokens = self.video_model(video, keep_ind)
        return tokens, self.vid_proj(tokens[:, 0])

    def __call__(self, video, input_ids, attention_mask, keep_ind=None):
        bz = video.shape[0]
        before, projected = self.compute_text(input_ids, attention_mask)
        n_trans = before.shape[0] // bz

        text_embeddings = projected.reshape(n_trans, bz, -1).mean(axis=0)
        tokens, video_embeddings = self.compute_video(video, keep_ind)

        predict_order = None
        if n_trans != 1:
            sort_text = jax.lax.stop_gradient(
                before.reshape(n_trans, bz, -1)).transpose(1, 0, 2)
            predict_order = self.pred_model(sort_text, tokens)
        return text_embeddings, video_embeddings, predict_order
