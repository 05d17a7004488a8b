"""Flax -> torch checkpoint export (VERDICT r3 #7): the inverse bridge.

Round-trips torch -> flax -> torch bit-exactly and proves the reference's own
modules/loaders accept the exported state_dict, so a TPU-trained model can be
validated on GPUs with zero code from this repo. Reference counterparts:
state_dict_data_parallel_fix (v2/utils/util.py:25-51), the checkpoint format
(v2/base/base_trainer.py:165-189), and the downstream `module.video_model.*`
subtree extraction (v1/downstream/run_class_finetuning.py:336-341).
"""

import jax
import numpy as np
import pytest

from tests.conftest import has_reference, load_reference_module
from tests.test_text_sort_parity import build_ref_text_parts, parts_state_dict
from tests.test_tvtsv2_parity import tiny_config
from tvts_tpu.models.tvts_v2 import TVTSv2
from tvts_tpu.utils.torch_convert import (convert_state_dict,
                                          export_state_dict, merge_params,
                                          save_reference_checkpoint)

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference repo not mounted")


def _compose_reference(pool_style, seed=3):
    """Toy-geometry reference torch modules + the composed TVTSv2 state_dict
    (the same assembly as test_tvtsv2_parity)."""
    import torch

    cfg = tiny_config(pool_style)
    torch.manual_seed(seed)
    text_parts = build_ref_text_parts(64, 2, 4, 16, 120, 48)
    if pool_style == "openai":
        refv = load_reference_module("v2/model/video_encoder_ViT_B_16.py",
                                     "ref_vit_b_exp")
        tvideo = refv.VisionTransformer(input_resolution=32, patch_size=16,
                                        width=64, layers=2, heads=4,
                                        output_dim=48, num_frames=4,
                                        mask_ratio=0.5)
    else:
        refv = load_reference_module("v2/model/video_encoder_ViT_H_14.py",
                                     "ref_vit_h_exp")
        tvideo = refv.VisionTransformer(image_size=32, patch_size=16,
                                        width=64, layers=2, heads=4,
                                        mlp_ratio=4.0, output_dim=48,
                                        num_frames=4, mask_ratio=0.5)
    refs = load_reference_module("v2/model/sort_transformer.py",
                                 "ref_sort_exp")
    tsort = refs.SortTransformer(num_classes=4, embed_dim=48, num_heads=4)
    tvideo.eval(), tsort.eval()

    sd = {f"video_model.{k}": p.detach().numpy()
          for k, p in tvideo.state_dict().items()}
    sd.update(parts_state_dict(text_parts))
    sd.update({f"pred_model.{k}": p.detach().numpy()
               for k, p in tsort.state_dict().items()})
    return cfg, tvideo, text_parts, tsort, sd


def _flax_params(cfg, sd):
    model = TVTSv2(cfg)
    rng = np.random.default_rng(0)
    v = cfg.vision
    video = np.zeros((1, v.num_frames, 3, v.input_resolution,
                      v.input_resolution), np.float32)
    keep = np.stack([rng.permutation(v.patches_per_frame)[: v.n_keep]])
    ids = np.ones((cfg.num_clips, cfg.text.context_length), np.int32)
    init = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                          jax.numpy.asarray(video), jax.numpy.asarray(ids),
                          jax.numpy.asarray(keep.astype(np.int32)))
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, np.float32),
                         init["params"])
    return model, merge_params(zeros, convert_state_dict(sd), strict=True)


def _is_buffer(key):
    # deterministic non-parameter state the torch modules rebuild in __init__
    return "attn_mask" in key or "num_batches_tracked" in key


@pytest.mark.parametrize("pool_style", ["openai", "openclip"])
def test_export_roundtrip_bitexact(pool_style):
    cfg, _, _, _, sd = _compose_reference(pool_style)
    _, params = _flax_params(cfg, sd)
    exported = export_state_dict(params, ddp_prefix=False)

    param_keys = {k for k in sd if not _is_buffer(k)}
    missing = param_keys - set(exported)
    extra = set(exported) - set(sd)
    assert not missing, f"export lost keys: {sorted(missing)[:8]}"
    assert not extra, f"export invented keys: {sorted(extra)[:8]}"
    for k in sorted(param_keys):
        np.testing.assert_array_equal(
            exported[k], sd[k], err_msg=f"value drift at {k}")


def test_export_ddp_prefix_matches_reference_fix():
    """module.-prefixed export goes through the reference's own
    state_dict_data_parallel_fix and comes out with bare keys."""
    cfg, _, _, _, sd = _compose_reference("openai")
    _, params = _flax_params(cfg, sd)
    exported = export_state_dict(params, ddp_prefix=True)
    assert all(k.startswith("module.") for k in exported)

    util = load_reference_module("v2/utils/util.py", "ref_util_exp")
    fixed = util.state_dict_data_parallel_fix(exported, sd)
    # curr (sd) has bare keys -> the reference fix strips the module. prefix
    param_keys = {k for k in sd if not _is_buffer(k)}
    assert set(fixed) == {k[len("module."):] for k in exported}
    assert set(fixed) >= param_keys
    for k in param_keys:
        np.testing.assert_array_equal(fixed[k], sd[k])


@pytest.mark.parametrize("pool_style", ["openai", "openclip"])
def test_reference_video_tower_loads_export(pool_style, tmp_path):
    """The full reference-format .pth round trip: save_reference_checkpoint ->
    torch.load -> module.video_model.* subtree extraction (the downstream
    recipe) -> load_state_dict into a FRESH reference VisionTransformer ->
    forward parity with the original tower."""
    import torch

    cfg, tvideo, _, _, sd = _compose_reference(pool_style)
    _, params = _flax_params(cfg, sd)
    path = str(tmp_path / "export.pth")
    save_reference_checkpoint(params, path, arch=f"TVTSv2_{pool_style}",
                              epoch=7)

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["arch"] == f"TVTSv2_{pool_style}" and ckpt["epoch"] == 7
    # v1/downstream/run_class_finetuning.py:336-341 subtree extraction
    vid_sd = {k[len("module.video_model."):]: v
              for k, v in ckpt["state_dict"].items()
              if k.startswith("module.video_model.")}

    refv = load_reference_module(
        "v2/model/video_encoder_ViT_B_16.py" if pool_style == "openai"
        else "v2/model/video_encoder_ViT_H_14.py", f"ref_vit_fresh_{pool_style}")
    torch.manual_seed(99)  # different init than the exported weights
    if pool_style == "openai":
        fresh = refv.VisionTransformer(input_resolution=32, patch_size=16,
                                       width=64, layers=2, heads=4,
                                       output_dim=48, num_frames=4,
                                       mask_ratio=0.5)
    else:
        fresh = refv.VisionTransformer(image_size=32, patch_size=16, width=64,
                                       layers=2, heads=4, mlp_ratio=4.0,
                                       output_dim=48, num_frames=4,
                                       mask_ratio=0.5)
    fresh.eval()
    result = fresh.load_state_dict(vid_sd, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    assert all(_is_buffer(k) for k in result.missing_keys), \
        result.missing_keys

    rng = np.random.default_rng(5)
    video = torch.from_numpy(
        rng.normal(size=(2, 4, 3, 32, 32)).astype(np.float32))
    keep = torch.from_numpy(np.stack(
        [rng.permutation(4)[: cfg.vision.n_keep] for _ in range(2)])).long()
    with torch.no_grad():
        want = tvideo(video, keep)
        got = fresh(video, keep)
    if pool_style == "openai":
        np.testing.assert_array_equal(got.numpy(), want.numpy())
    else:
        np.testing.assert_array_equal(got[0].numpy(), want[0].numpy())
        np.testing.assert_array_equal(got[1].numpy(), want[1].numpy())
