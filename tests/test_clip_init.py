"""CLIP-weights initialization path: a raw CLIP state dict (visual.* + text at
top level) converts and merges into TVTSv2 params, with the space-time-only
params left at fresh init (reference model_dist_TVTSv2_ViT_B_16.py:33-45)."""

import jax
import numpy as np
import pytest
import torch

from tests.conftest import has_reference, load_reference_module
from tests.test_tvtsv2_parity import tiny_config
from tvts_tpu.models.factory import init_params
from tvts_tpu.models.tvts_v2 import TVTSv2
from tvts_tpu.utils.torch_convert import convert_clip_full, merge_params

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")


def test_convert_clip_full_merges():
    ref = load_reference_module("v2/CLIP/clip/model.py", "ref_clip_for_init")
    torch.manual_seed(0)
    clip_model = ref.CLIP(embed_dim=48, image_resolution=32, vision_layers=2,
                          vision_width=64, vision_patch_size=16,
                          context_length=16, vocab_size=120,
                          transformer_width=64, transformer_heads=4,
                          transformer_layers=2)
    sd = {k: v.detach().numpy() for k, v in clip_model.state_dict().items()}

    cfg = tiny_config("openai")
    model = TVTSv2(cfg)
    params = init_params(model, cfg)
    before_timeattn = np.asarray(
        params["video_model"]["blocks_0"]["timeattn"]["qkv"]["kernel"]).copy()

    merged = merge_params(params, convert_clip_full(sd), strict=False)

    # visual attention weights transferred (in_proj -> qkv remap)
    want = sd["visual.transformer.resblocks.0.attn.in_proj_weight"].T
    got = np.asarray(merged["video_model"]["blocks_0"]["attn"]["qkv"]["kernel"])
    np.testing.assert_allclose(got, want, atol=1e-6)
    # conv patchify transferred
    np.testing.assert_allclose(
        np.asarray(merged["video_model"]["conv1"]["kernel"]),
        sd["visual.conv1.weight"].transpose(2, 3, 1, 0), atol=1e-6)
    # text transferred
    np.testing.assert_allclose(
        np.asarray(merged["text_model"]["token_embedding"]["embedding"]),
        sd["token_embedding.weight"], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(merged["text_model"]["text_projection"]), sd["text_projection"],
        atol=1e-6)
    # space-time-only params untouched (zero-init timeattn stays zero-init)
    np.testing.assert_array_equal(
        np.asarray(merged["video_model"]["blocks_0"]["timeattn"]["qkv"]["kernel"]),
        before_timeattn)
