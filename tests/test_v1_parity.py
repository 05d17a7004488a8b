"""TVTS v1 parity tests: JointViT vs reference v1 video encoder, DistilBERT
encoder vs transformers, and the full composed v1 model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import has_reference, load_reference_module
from tvts_tpu.models.distilbert import (
    DistilBertConfig,
    DistilBertEncoder,
    convert_distilbert_state_dict,
)
from tvts_tpu.models.joint_vit import JointViT
from tvts_tpu.models.tvts_v1 import TVTSv1, TVTSv1Config
from tvts_tpu.utils.torch_convert import (
    convert_v1_state_dict,
    inflate_mae_2d_to_3d,
    merge_params,
)

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")


def make_ref_joint_vit(num_classes=0):
    import torch

    ref = load_reference_module("v1/model/video_encoder.py", "ref_v1_vit")
    torch.manual_seed(0)
    m = ref.VisionTransformer(img_size=32, patch_size=16, embed_dim=64, depth=2,
                              num_heads=4, num_frames=4, tubelet_size=2,
                              num_classes=num_classes)
    m.eval()
    return m


def test_joint_vit_parity():
    import torch

    tmodel = make_ref_joint_vit()
    rng = np.random.default_rng(0)
    B, T = 2, 4
    video = rng.normal(size=(B, T, 3, 32, 32)).astype(np.float32)
    keep = np.stack([np.stack([rng.permutation(4)[:2] for _ in range(2)])
                     for _ in range(B)]).astype(np.int32)  # [B, n_tubes=2, n_keep=2]

    with torch.no_grad():
        want = tmodel(torch.from_numpy(video), torch.from_numpy(keep).long()).numpy()

    model = JointViT(img_size=32, patch_size=16, embed_dim=64, depth=2, heads=4,
                     num_frames=4, tubelet_size=2)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(video), jnp.asarray(keep))
    sd = {f"video_model.{k}": v.detach().numpy() for k, v in tmodel.state_dict().items()}
    loaded = convert_v1_state_dict(sd)["video_model"]
    params = merge_params(init["params"], loaded, strict=True)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(video),
                                 jnp.asarray(keep)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_mae_inflation():
    w2d = {"patch_embed.proj.weight": np.arange(2 * 3 * 4 * 4).reshape(2, 3, 4, 4).astype(np.float32)}
    out = inflate_mae_2d_to_3d(w2d, tubelet_size=2)
    w = out["patch_embed.proj.weight"]
    assert w.shape == (2, 3, 2, 4, 4)
    np.testing.assert_array_equal(w[:, :, 0], w[:, :, 1])


def make_hf_distilbert(cfg: DistilBertConfig):
    import torch
    from transformers import DistilBertConfig as HFConfig
    from transformers import DistilBertModel

    torch.manual_seed(1)
    hf = DistilBertModel(HFConfig(
        vocab_size=cfg.vocab_size, max_position_embeddings=cfg.max_position_embeddings,
        dim=cfg.dim, hidden_dim=cfg.hidden_dim, n_layers=cfg.n_layers,
        n_heads=cfg.n_heads, dropout=0.0, attention_dropout=0.0))
    hf.eval()
    return hf


def test_distilbert_parity():
    import torch

    cfg = DistilBertConfig(vocab_size=100, max_position_embeddings=64, dim=64,
                           hidden_dim=128, n_layers=2, n_heads=4)
    hf = make_hf_distilbert(cfg)

    rng = np.random.default_rng(2)
    ids = rng.integers(1, 99, size=(3, 12)).astype(np.int64)
    mask = np.ones((3, 12), dtype=np.int64)
    mask[0, 8:] = 0
    mask[2, 5:] = 0
    with torch.no_grad():
        want = hf(torch.from_numpy(ids),
                  attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()

    model = DistilBertEncoder(cfg)
    jids = jnp.asarray(ids.astype(np.int32))
    jmask = jnp.asarray(mask.astype(np.int32))
    init = model.init(jax.random.PRNGKey(0), jids, jmask)
    loaded = convert_distilbert_state_dict(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()})
    params = merge_params(init["params"], loaded, strict=True)
    got = np.asarray(model.apply({"params": params}, jids, jmask))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_tvts_v1_full_model_parity():
    import torch
    import torch.nn as nn

    ref_sort = load_reference_module("v2/model/sort_transformer.py", "ref_sort_v1")

    bert_cfg = DistilBertConfig(vocab_size=100, max_position_embeddings=64, dim=64,
                                hidden_dim=128, n_layers=2, n_heads=4)
    cfg = TVTSv1Config(img_size=32, patch_size=16, embed_dim=64, depth=2, heads=4,
                       num_frames=4, tubelet_size=2, projection_dim=32, sort_heads=4,
                       mask_ratio=0.5, max_text_len=12, text=bert_cfg)

    hf = make_hf_distilbert(bert_cfg)
    tvideo = make_ref_joint_vit()
    torch.manual_seed(3)
    tsort = ref_sort.SortTransformer(num_classes=4, embed_dim=64, num_heads=4)
    tsort.eval()
    txt_proj = nn.Sequential(nn.ReLU(), nn.Linear(64, 32))
    vid_proj = nn.Sequential(nn.Linear(64, 32))

    rng = np.random.default_rng(4)
    B = 2
    video = rng.normal(size=(B, 4, 3, 32, 32)).astype(np.float32)
    keep = np.stack([np.stack([rng.permutation(4)[:2] for _ in range(2)])
                     for _ in range(B)]).astype(np.int32)
    ids = rng.integers(1, 99, size=(4 * B, 12)).astype(np.int64)
    mask = np.ones_like(ids)
    mask[:, 9:] = 0

    # reference composition (model_dist_TVTS.py:96-143)
    with torch.no_grad():
        before = hf(torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask)).last_hidden_state[:, 0]
        t_emb = txt_proj(before)
        want_text = t_emb.reshape(4, B, -1).mean(0).numpy()
        tokens = tvideo(torch.from_numpy(video), torch.from_numpy(keep).long())
        want_video = vid_proj(tokens[:, 0]).numpy()
        want_order = tsort(before.reshape(4, B, -1).permute(1, 0, 2), tokens).numpy()

    model = TVTSv1(cfg)
    jv = jnp.asarray(video)
    jids = jnp.asarray(ids.astype(np.int32))
    jmask = jnp.asarray(mask.astype(np.int32))
    jkeep = jnp.asarray(keep)
    init = model.init(jax.random.PRNGKey(0), jv, jids, jmask, jkeep)

    sd = {}
    sd.update({f"text_model.{k}": v.detach().numpy() for k, v in hf.state_dict().items()})
    sd.update({f"video_model.{k}": v.detach().numpy() for k, v in tvideo.state_dict().items()})
    sd.update({f"pred_model.{k}": v.detach().numpy() for k, v in tsort.state_dict().items()})
    sd.update({f"txt_proj.{k}": v.detach().numpy() for k, v in txt_proj.state_dict().items()})
    sd.update({f"vid_proj.{k}": v.detach().numpy() for k, v in vid_proj.state_dict().items()})
    loaded = convert_v1_state_dict(sd)
    params = merge_params(init["params"], loaded, strict=True)

    got_text, got_video, got_order = model.apply({"params": params}, jv, jids,
                                                 jmask, jkeep)
    np.testing.assert_allclose(np.asarray(got_text), want_text, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_video), want_video, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_order), want_order, atol=2e-5, rtol=1e-4)
