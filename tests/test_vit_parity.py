"""Checkpoint-parity tests: the Flax space-time ViT must reproduce the reference
torch video towers bit-for-bit (up to float tolerance) after weight conversion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import has_reference, load_reference_module
from tvts_tpu.models.configs import VisionConfig
from tvts_tpu.models.space_time_vit import SpaceTimeViT
from tvts_tpu.utils.torch_convert import convert_state_dict, merge_params

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")

SMALL = dict(input_resolution=32, patch_size=16, width=64, layers=2, heads=4,
             output_dim=48, num_frames=4)


def _torch_state(prefix, module):
    return {f"{prefix}.{k}": v.detach().numpy() for k, v in module.state_dict().items()}


def _run_case(pool_style, mask_ratio, ls_init=None):
    import torch

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    cfg = VisionConfig(pool_style=pool_style, mask_ratio=mask_ratio, ls_init=ls_init,
                       act="quick_gelu" if pool_style == "openai" else "gelu", **SMALL)

    if pool_style == "openai":
        ref = load_reference_module("v2/model/video_encoder_ViT_B_16.py", "ref_vit_b")
        tmodel = ref.VisionTransformer(
            input_resolution=cfg.input_resolution, patch_size=cfg.patch_size,
            width=cfg.width, layers=cfg.layers, heads=cfg.heads,
            output_dim=cfg.output_dim, num_frames=cfg.num_frames,
            mask_ratio=cfg.mask_ratio)
    else:
        ref = load_reference_module("v2/model/video_encoder_ViT_H_14.py", "ref_vit_h")
        tmodel = ref.VisionTransformer(
            image_size=cfg.input_resolution, patch_size=cfg.patch_size,
            width=cfg.width, layers=cfg.layers, heads=cfg.heads, mlp_ratio=4.0,
            ls_init_value=ls_init, output_dim=cfg.output_dim,
            num_frames=cfg.num_frames, mask_ratio=cfg.mask_ratio)
    tmodel.eval()

    B, T = 2, cfg.num_frames
    video = rng.normal(size=(B, T, 3, 32, 32)).astype(np.float32)
    n_keep = cfg.n_keep
    keep = np.stack([rng.permutation(cfg.patches_per_frame)[:n_keep] for _ in range(B)]).astype(np.int32)

    with torch.no_grad():
        tout = tmodel(torch.from_numpy(video), torch.from_numpy(keep).long())

    model = SpaceTimeViT(cfg)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(video), jnp.asarray(keep))
    loaded = convert_state_dict(_torch_state("video_model", tmodel))["video_model"]
    params = merge_params(init["params"], loaded, strict=True)
    pooled, tokens = model.apply({"params": params}, jnp.asarray(video), jnp.asarray(keep))
    return tout, np.asarray(pooled), np.asarray(tokens)


def test_b16_style_parity():
    tout, pooled, tokens = _run_case("openai", mask_ratio=0.5)
    np.testing.assert_allclose(tokens, tout.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(pooled, tout.numpy()[:, 0], atol=2e-5, rtol=1e-4)


def test_b32_style_no_mask_parity():
    tout, pooled, tokens = _run_case("openai", mask_ratio=0.0)
    np.testing.assert_allclose(tokens, tout.numpy(), atol=2e-5, rtol=1e-4)


def test_h14_style_parity():
    (tpooled, ttokens), pooled, tokens = _run_case("openclip", mask_ratio=0.5)
    np.testing.assert_allclose(pooled, tpooled.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(tokens, ttokens.numpy(), atol=2e-5, rtol=1e-4)


def test_h14_style_layerscale_parity():
    (tpooled, ttokens), pooled, tokens = _run_case("openclip", mask_ratio=0.5, ls_init=0.1)
    np.testing.assert_allclose(pooled, tpooled.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(tokens, ttokens.numpy(), atol=2e-5, rtol=1e-4)


def test_h14_attentional_pool_parity():
    """AttentionalPooler path (reference H_14.py:184-207,366-372,478-480):
    bypassed by the shipped config but part of the tower surface."""
    import torch

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    cfg = VisionConfig(pool_style="openclip", mask_ratio=0.5, act="gelu",
                       attentional_pool=True, n_queries=6, attn_pooler_heads=4,
                       **SMALL)
    ref = load_reference_module("v2/model/video_encoder_ViT_H_14.py", "ref_vit_h_ap")
    tmodel = ref.VisionTransformer(
        image_size=cfg.input_resolution, patch_size=cfg.patch_size,
        width=cfg.width, layers=cfg.layers, heads=cfg.heads, mlp_ratio=4.0,
        output_dim=cfg.output_dim, num_frames=cfg.num_frames,
        mask_ratio=cfg.mask_ratio, attentional_pool=True, n_queries=6,
        attn_pooler_heads=4)
    tmodel.eval()

    B, T = 2, cfg.num_frames
    video = rng.normal(size=(B, T, 3, 32, 32)).astype(np.float32)
    keep = np.stack([rng.permutation(cfg.patches_per_frame)[: cfg.n_keep]
                     for _ in range(B)]).astype(np.int32)
    with torch.no_grad():
        tpooled, ttokens = tmodel(torch.from_numpy(video),
                                  torch.from_numpy(keep).long())

    model = SpaceTimeViT(cfg)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(video), jnp.asarray(keep))
    loaded = convert_state_dict(_torch_state("video_model", tmodel))["video_model"]
    params = merge_params(init["params"], loaded, strict=True)
    pooled, tokens = model.apply({"params": params}, jnp.asarray(video),
                                 jnp.asarray(keep))
    np.testing.assert_allclose(np.asarray(pooled), tpooled.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(tokens), ttokens.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_patch_dropout_behavior():
    """PatchDropout is identity in eval; in train it keeps CLS + a random
    (1-prob) subset of patch tokens, each row a subset of the input rows."""
    from tvts_tpu.models.space_time_vit import PatchDropout

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 17, 8)).astype(np.float32))
    mod = PatchDropout(0.5)
    ev = mod.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(x))

    out = mod.apply({}, x, deterministic=False,
                    rngs={"patch_dropout": jax.random.PRNGKey(1)})
    assert out.shape == (3, 1 + max(1, int(16 * 0.5)), 8)
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(x[:, 0]))
    for b in range(3):
        src = {tuple(np.round(r, 5)) for r in np.asarray(x[b, 1:])}
        for r in np.asarray(out[b, 1:]):
            assert tuple(np.round(r, 5)) in src
