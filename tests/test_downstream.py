"""Downstream fine-tune tier tests: aug suite, FinetuneViT parity, engine
schedules/layer-decay, multi-view merge, zero-shot v2v, end-to-end tiny finetune."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import has_reference, load_reference_module
from tvts_tpu.downstream.engine import (
    MultiViewAccumulator,
    cosine_schedule,
    layer_id_for_param,
    make_cls_eval_step,
    make_cls_train_step,
    make_finetune_optimizer,
    soft_ce,
)
from tvts_tpu.downstream.mixup import Mixup, one_hot
from tvts_tpu.downstream.model import FinetuneViT, load_pretrain_video_tower, sinusoid_table
from tvts_tpu.downstream.randaug import RandAugment
from tvts_tpu.downstream.random_erasing import RandomErasing
from tvts_tpu.downstream.zero_v2v import v2v_retrieval_metrics
from tvts_tpu.train.step import create_train_state


def test_randaug_shapes_and_dtype():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(4, 32, 32, 3)).astype(np.uint8)
    out = RandAugment(num_ops=3, magnitude=7, rng=rng)(frames)
    assert out.shape == frames.shape and out.dtype == np.uint8
    # clip-consistency: same op applied to identical frames gives identical output
    same = np.repeat(frames[:1], 4, axis=0)
    out2 = RandAugment(num_ops=3, magnitude=7, rng=np.random.default_rng(1))(same)
    for f in out2[1:]:
        np.testing.assert_array_equal(out2[0], f)


def test_random_erasing():
    rng = np.random.default_rng(0)
    clip = np.zeros((4, 3, 32, 32), dtype=np.float32)
    out = RandomErasing(probability=1.0, rng=rng)(clip)
    assert (out != 0).any()
    # cube mode: same region erased in every frame
    mask = out != 0
    for f in range(1, 4):
        np.testing.assert_array_equal(mask[0], mask[f])
    out2 = RandomErasing(probability=0.0, rng=rng)(clip)
    np.testing.assert_array_equal(out2, clip)


def test_mixup_targets_sum_to_one():
    rng = np.random.default_rng(0)
    video = rng.normal(size=(4, 2, 3, 8, 8)).astype(np.float32)
    labels = np.array([0, 1, 2, 3])
    mix = Mixup(num_classes=5, label_smoothing=0.1, rng=rng)
    mixed, targets = mix(video, labels)
    assert mixed.shape == video.shape
    np.testing.assert_allclose(targets.sum(axis=1), 1.0, atol=1e-5)
    y = one_hot(labels, 5, smoothing=0.1)
    np.testing.assert_allclose(y.sum(axis=1), 1.0, atol=1e-6)
    assert y[0, 0] == pytest.approx(0.92)


def test_cosine_schedule_and_layer_ids():
    fn = cosine_schedule(1e-3, 1e-6, epochs=10, steps_per_epoch=10,
                         warmup_epochs=2)
    assert float(fn(0)) == pytest.approx(1e-6, rel=1e-3)
    assert float(fn(20)) == pytest.approx(1e-3, rel=1e-2)
    assert float(fn(99)) < 2e-5

    assert layer_id_for_param(("patch_embed", "kernel"), 12) == 0
    assert layer_id_for_param(("blocks_0", "attn"), 12) == 1
    assert layer_id_for_param(("blocks_11", "mlp"), 12) == 12
    assert layer_id_for_param(("head", "kernel"), 12) == 13
    assert layer_id_for_param(("fc_norm", "scale"), 12) == 13


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_finetune_vit_parity():
    import torch

    # load the downstream dependency chain by path first
    load_reference_module("v1/downstream/video_transformer.py", "video_transformer")
    ref = load_reference_module("v1/downstream/modeling_finetune.py", "ref_ft")
    torch.manual_seed(0)
    tmodel = ref.VisionTransformer(img_size=32, patch_size=16, embed_dim=64,
                                   depth=2, num_heads=4, num_classes=7,
                                   qkv_bias=True, all_frames=4, tubelet_size=2,
                                   use_mean_pooling=True,
                                   norm_layer=torch.nn.LayerNorm)
    tmodel.eval()

    rng = np.random.default_rng(0)
    video = rng.normal(size=(2, 4, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        # reference takes [B, C, T, H, W]
        want = tmodel(torch.from_numpy(video.transpose(0, 2, 1, 3, 4))).numpy()

    model = FinetuneViT(num_classes=7, img_size=32, patch_size=16, embed_dim=64,
                        depth=2, heads=4, num_frames=4, tubelet_size=2)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(video))["params"]
    from tvts_tpu.utils.torch_convert import convert_v1_state_dict, merge_params

    sd = {f"video_model.{k}": v.detach().numpy()
          for k, v in tmodel.state_dict().items() if k != "pos_embed"}
    loaded = convert_v1_state_dict(sd)["video_model"]
    params = merge_params(init, loaded, strict=True)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(video)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_sinusoid_table_matches_reference_formula():
    tab = sinusoid_table(8, 6)
    pos = 3
    assert tab[pos, 4] == pytest.approx(
        np.sin(pos / np.power(10000, 2 * (4 // 2) / 6)), rel=1e-6)
    assert tab[pos, 5] == pytest.approx(
        np.cos(pos / np.power(10000, 2 * (5 // 2) / 6)), rel=1e-6)


def test_multiview_accumulator():
    acc = MultiViewAccumulator(num_samples=2, num_classes=3)
    acc.add([0, 0], np.array([[1.0, 0, 0], [0, 3.0, 0]]), [1, 1])
    acc.add([1], np.array([[0, 0, 2.0]]), [2])
    res = acc.merge()
    # video 0: avg logits [0.5, 1.5, 0] -> pred 1 == label 1; video 1: pred 2 == 2
    assert res["top1"] == 1.0 and res["n"] == 2


def test_v2v_metrics_self_masked():
    feats = np.eye(4, dtype=np.float32) + 0.01
    labels = np.array([0, 0, 1, 1])
    res = v2v_retrieval_metrics(feats, labels)
    assert set(res) == {"R1", "R5", "R10"}
    assert 0 <= res["R1"] <= 100


def test_finetune_step_linear_probe_freezes_backbone():
    model = FinetuneViT(num_classes=5, img_size=32, patch_size=16, embed_dim=64,
                        depth=2, heads=4, num_frames=4, tubelet_size=2)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(4, 4, 3, 32, 32)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), video)["params"]
    tx, scales = make_finetune_optimizer(params, 1e-3, 0.05, epochs=2,
                                         steps_per_epoch=2, warmup_epochs=0,
                                         num_layers=2, linear_probe=True)
    state = create_train_state(jax.tree.map(jnp.copy, params), tx)
    step = make_cls_train_step(model, tx, donate=False)
    targets = jnp.asarray(one_hot(np.array([0, 1, 2, 3]), 5, 0.1))
    losses = []
    for _ in range(3):
        state, loss = step(state, video, targets)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    np.testing.assert_array_equal(
        np.asarray(params["blocks_0"]["attn"]["qkv"]["kernel"]),
        np.asarray(state.params["blocks_0"]["attn"]["qkv"]["kernel"]))
    assert not np.allclose(np.asarray(params["head"]["kernel"]),
                           np.asarray(state.params["head"]["kernel"]))


def test_finetune_full_descends_with_layer_decay():
    model = FinetuneViT(num_classes=5, img_size=32, patch_size=16, embed_dim=64,
                        depth=2, heads=4, num_frames=4, tubelet_size=2)
    rng = np.random.default_rng(1)
    video = jnp.asarray(rng.normal(size=(4, 4, 3, 32, 32)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), video)["params"]
    tx, scales = make_finetune_optimizer(params, 1e-3, 0.05, epochs=2,
                                         steps_per_epoch=4, warmup_epochs=0,
                                         layer_decay=0.75, num_layers=2)
    # layer scale ordering: earlier layers get smaller lr multipliers
    assert scales["l0_wd"] < scales["l1_wd"] < scales["l3_wd"]
    state = create_train_state(jax.tree.map(jnp.copy, params), tx)
    step = make_cls_train_step(model, tx, donate=False)
    targets = jnp.asarray(one_hot(np.array([0, 1, 2, 3]), 5, 0.1))
    losses = []
    for _ in range(4):
        state, loss = step(state, video, targets)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_pretrain_tower_transfer():
    from tvts_tpu.models.joint_vit import JointViT

    vit = JointViT(img_size=32, patch_size=16, embed_dim=64, depth=2, heads=4,
                   num_frames=4, tubelet_size=2)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(1, 4, 3, 32, 32)).astype(np.float32))
    pre = vit.init(jax.random.PRNGKey(1), video, None)["params"]

    ft = FinetuneViT(num_classes=5, img_size=32, patch_size=16, embed_dim=64,
                     depth=2, heads=4, num_frames=4, tubelet_size=2)
    init = ft.init(jax.random.PRNGKey(0), video)["params"]
    merged = load_pretrain_video_tower(init, {"video_model": pre})
    np.testing.assert_array_equal(
        np.asarray(merged["blocks_0"]["attn"]["qkv"]["kernel"]),
        np.asarray(pre["blocks_0"]["attn"]["qkv"]["kernel"]))
    # head stays at fresh init
    np.testing.assert_array_equal(np.asarray(merged["head"]["kernel"]),
                                  np.asarray(init["head"]["kernel"]))
