"""Full-model parity: TVTSv2.__call__ (text avg + video CLS + sort head, with the
text-detach) against the composed reference torch modules, for both the openai
(B/*) and openclip (H/14) pooling contracts."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import has_reference, load_reference_module
from tests.test_text_sort_parity import build_ref_text_parts, parts_state_dict, ref_compute_text
from tvts_tpu.models.configs import SortConfig, TextConfig, TVTSv2Config, VisionConfig
from tvts_tpu.models.tvts_v2 import TVTSv2
from tvts_tpu.utils.torch_convert import convert_state_dict, merge_params

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")


def tiny_config(pool_style):
    return TVTSv2Config(
        name="tiny",
        vision=VisionConfig(input_resolution=32, patch_size=16, width=64, layers=2,
                            heads=4, output_dim=48, num_frames=4, mask_ratio=0.5,
                            pool_style=pool_style,
                            act="quick_gelu" if pool_style == "openai" else "gelu"),
        text=TextConfig(context_length=16, vocab_size=120, width=64, layers=2,
                        heads=4, output_dim=48),
        sort=SortConfig(embed_dim=48, num_heads=4, num_classes=4),
    )


@pytest.mark.parametrize("pool_style", ["openai", "openclip"])
def test_full_model_parity(pool_style):
    import torch

    cfg = tiny_config(pool_style)
    v = cfg.vision

    # --- reference torch parts ---
    text_parts = build_ref_text_parts(64, 2, 4, 16, 120, 48)
    if pool_style == "openai":
        refv = load_reference_module("v2/model/video_encoder_ViT_B_16.py", "ref_vit_b2")
        tvideo = refv.VisionTransformer(input_resolution=32, patch_size=16, width=64,
                                        layers=2, heads=4, output_dim=48,
                                        num_frames=4, mask_ratio=0.5)
    else:
        refv = load_reference_module("v2/model/video_encoder_ViT_H_14.py", "ref_vit_h2")
        tvideo = refv.VisionTransformer(image_size=32, patch_size=16, width=64,
                                        layers=2, heads=4, mlp_ratio=4.0,
                                        output_dim=48, num_frames=4, mask_ratio=0.5)
    refs = load_reference_module("v2/model/sort_transformer.py", "ref_sort2")
    torch.manual_seed(3)
    tsort = refs.SortTransformer(num_classes=4, embed_dim=48, num_heads=4)
    tvideo.eval(), tsort.eval()

    # --- inputs ---
    rng = np.random.default_rng(0)
    B, n_trans = 2, 4
    video = rng.normal(size=(B, 4, 3, 32, 32)).astype(np.float32)
    keep = np.stack([rng.permutation(4)[: v.n_keep] for _ in range(B)]).astype(np.int32)
    ids = rng.integers(1, 118, size=(n_trans * B, 16)).astype(np.int64)
    for r in range(ids.shape[0]):
        ids[r, rng.integers(2, 16)] = 119

    # --- reference forward (model_dist_TVTSv2_*.py:61-116) ---
    with torch.no_grad():
        t_emb = ref_compute_text(text_parts, torch.from_numpy(ids))
        per_clip = t_emb.reshape(n_trans, B, -1)
        want_text = per_clip.mean(0).numpy()
        vout = tvideo(torch.from_numpy(video), torch.from_numpy(keep).long())
        if pool_style == "openai":
            want_video = vout[:, 0].numpy()
            order_tokens = vout
        else:
            want_video = vout[0].numpy()
            order_tokens = vout[1]
        want_order = tsort(per_clip.permute(1, 0, 2), order_tokens).numpy()

    # --- flax ---
    model = TVTSv2(cfg)
    jvideo, jids = jnp.asarray(video), jnp.asarray(ids.astype(np.int32))
    jkeep = jnp.asarray(keep)
    init = model.init(jax.random.PRNGKey(0), jvideo, jids, jkeep)

    sd = {}
    sd.update({f"video_model.{k}": p.detach().numpy() for k, p in tvideo.state_dict().items()})
    sd.update(parts_state_dict(text_parts))
    sd.update({f"pred_model.{k}": p.detach().numpy() for k, p in tsort.state_dict().items()})
    params = merge_params(init["params"], convert_state_dict(sd), strict=True)

    got_text, got_video, got_order = model.apply({"params": params}, jvideo, jids, jkeep)
    np.testing.assert_allclose(np.asarray(got_text), want_text, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_video), want_video, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_order), want_order, atol=2e-5, rtol=1e-4)


def test_eval_config_disables_masking():
    cfg = tiny_config("openai")
    ev = cfg.eval_config()
    assert ev.vision.mask_ratio == 0.0
    assert ev.vision.n_keep == ev.vision.patches_per_frame
