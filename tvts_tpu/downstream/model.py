"""Fine-tuning video classifier (VideoMAE-style ViT).

Behavioral contract: reference v1/downstream/modeling_finetune.py
(`vit_base_patch16_224`): tubelet Conv3d patchify, NO cls token, FIXED sinusoidal
positional table over all 1568 tokens (:213-215), pre-norm blocks (LN eps 1e-6),
mean-pooling head (`fc_norm` on the token mean, norm=Identity, :226-227,274-275).
Pretrain init extracts the `video_model.*` subtree of a TVTS checkpoint with
strict=False (run_class_finetuning.py:316-341) — block weights and patch-embed
transfer; cls/pos/temporal embeddings are dropped.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tvts_tpu.models.joint_vit import JointBlock
from tvts_tpu.models.layers import LayerNormF32


def sinusoid_table(n_position: int, d_hid: int) -> np.ndarray:
    """VideoMAE get_sinusoid_encoding_table (modeling_finetune.py)."""
    pos = np.arange(n_position)[:, None]
    i = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (i // 2) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


class FinetuneViT(nn.Module):
    num_classes: int = 174
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    heads: int = 12
    num_frames: int = 16
    tubelet_size: int = 2
    use_mean_pooling: bool = True
    head_init_scale: float = 0.001
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:
        """video: [B, T, C, H, W] normalized -> [B, num_classes] logits."""
        B, T, C, H, W = video.shape
        n_tubes = T // self.tubelet_size
        grid = self.img_size // self.patch_size
        x = video.transpose(0, 1, 3, 4, 2).astype(self.dtype)
        x = nn.Conv(self.embed_dim,
                    kernel_size=(self.tubelet_size, self.patch_size, self.patch_size),
                    strides=(self.tubelet_size, self.patch_size, self.patch_size),
                    use_bias=True, dtype=self.dtype, name="patch_embed")(x)
        x = x.reshape(B, n_tubes * grid * grid, self.embed_dim)

        pos = sinusoid_table(x.shape[1], self.embed_dim)  # fixed, not learned
        x = x + jnp.asarray(pos, self.dtype)[None]

        block_cls = nn.remat(JointBlock) if self.remat else JointBlock
        for i in range(self.depth):
            x = block_cls(self.embed_dim, self.heads, dtype=self.dtype,
                          name=f"blocks_{i}")(x)

        if self.use_mean_pooling:
            feat = LayerNormF32(eps=1e-6, name="fc_norm")(x.mean(axis=1))
        else:
            feat = LayerNormF32(eps=1e-6, name="norm")(x)[:, 0]

        head_init = nn.initializers.truncated_normal(0.02 * self.head_init_scale)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        kernel_init=head_init, name="head")(feat)


def load_pretrain_video_tower(init_params: dict, ckpt_params_or_sd,
                              from_torch: bool = False) -> dict:
    """Initialize FinetuneViT from a TVTS v1 pretrain checkpoint: copy blocks_* ,
    patch_embed (and norm -> fc_norm is NOT transferred; the reference's
    strict=False load drops it since names differ)."""
    from tvts_tpu.utils.torch_convert import convert_v1_state_dict, merge_params

    if from_torch:
        tower = convert_v1_state_dict(ckpt_params_or_sd).get("video_model", {})
    else:
        tower = ckpt_params_or_sd.get("video_model", ckpt_params_or_sd)
    transfer = {k: v for k, v in tower.items()
                if k.startswith("blocks_") or k == "patch_embed"}
    return merge_params(init_params, transfer, strict=False)
