"""Training-step tests: optimizer grouping, frozen params, loss descent, and
multi-device sharded execution equivalence on the 8-CPU virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_tvtsv2_parity import tiny_config
from tvts_tpu.models.tvts_v2 import TVTSv2
from tvts_tpu.parallel import create_mesh, shard_batch, shard_params
from tvts_tpu.train.optim import OptimizerConfig, label_params, make_optimizer, milestone_scale_fn
from tvts_tpu.train.step import create_train_state, make_loss_fn, make_train_step


def make_batch(cfg, B=8, seed=0):
    rng = np.random.default_rng(seed)
    v = cfg.vision
    video = rng.normal(size=(B, v.num_frames, 3, v.input_resolution,
                             v.input_resolution)).astype(np.float32)
    keep = np.stack([rng.permutation(v.patches_per_frame)[: v.n_keep]
                     for _ in range(B)]).astype(np.int32)
    ids = rng.integers(1, cfg.text.vocab_size - 2,
                       size=(cfg.num_clips * B, cfg.text.context_length)).astype(np.int32)
    ids[:, -1] = cfg.text.vocab_size - 1
    labels = np.tile(np.arange(cfg.num_clips), (B, 1)).astype(np.int32)
    return {"video": video, "text_ids": ids, "keep_ind": keep, "labels": labels}


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config("openai")
    model = TVTSv2(cfg)
    batch = make_batch(cfg)
    params = model.init(jax.random.PRNGKey(0), batch["video"][:2],
                        batch["text_ids"][: 2 * cfg.num_clips],
                        batch["keep_ind"][:2])["params"]
    return cfg, model, params, batch


def test_label_params_grouping(setup):
    cfg, model, params, _ = setup
    ocfg = OptimizerConfig(text_layers=cfg.text.layers, text_tune_layers=1)
    labels = label_params(params, ocfg)
    flat = {"/".join(str(k.key) for k in p): v
            for p, v in jax.tree_util.tree_flatten_with_path(labels)[0]}
    assert flat["video_model/blocks_0/timeattn/qkv/kernel"] == "new_decay"
    assert flat["video_model/blocks_0/timeattn/qkv/bias"] == "new_nodecay"
    assert flat["video_model/blocks_0/ln_3/scale"] == "new_nodecay"
    assert flat["video_model/blocks_0/attn/qkv/kernel"] == "clip_decay"
    assert flat["video_model/conv1/kernel"] == "clip_decay"
    assert flat["video_model/temporal_embedding"] == "clip_decay"
    assert flat["text_model/blocks_0/attn/qkv/kernel"] == "frozen"  # below tune range
    assert flat["text_model/blocks_1/attn/qkv/kernel"] == "clip_decay"  # last-1
    assert flat["text_model/token_embedding/embedding"] == "clip_decay"
    assert flat["text_model/ln_final/scale"] == "clip_nodecay"
    assert flat["pred_model/blocks_0/attn/qkv/kernel"] == "new_decay"
    assert flat["pred_model/norm/scale"] == "new_nodecay"
    assert flat["pred_model/head/bias"] == "new_nodecay"


def test_milestone_schedule():
    ocfg = OptimizerConfig(schedule=(6, 8), steps_per_epoch=10)
    scale = milestone_scale_fn(ocfg)
    # end of epoch 6 = step 60: decay applies from step 60 onward
    assert float(scale(0)) == 1.0
    assert float(scale(59)) == 1.0
    np.testing.assert_allclose(float(scale(60)), 0.1)
    np.testing.assert_allclose(float(scale(79)), 0.1)
    np.testing.assert_allclose(float(scale(80)), 0.01)


def test_train_step_descends_and_freezes(setup):
    cfg, model, params, batch = setup
    ocfg = OptimizerConfig(lr_new=1e-3, lr_clip=1e-3,
                           text_layers=cfg.text.layers, text_tune_layers=1)
    tx = make_optimizer(params, ocfg)
    state = create_train_state(params, tx)
    step = make_train_step(model, tx, donate=False)
    loss_fn = make_loss_fn(model)

    frozen_before = np.asarray(params["text_model"]["blocks_0"]["attn"]["qkv"]["kernel"])
    tuned_before = np.asarray(params["text_model"]["blocks_1"]["attn"]["qkv"]["kernel"])

    losses = []
    for _ in range(5):
        state, aux = step(state, batch)
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5
    _, aux0 = loss_fn(params, batch)
    assert float(aux0["loss_ce"]) > 0

    frozen_after = np.asarray(state.params["text_model"]["blocks_0"]["attn"]["qkv"]["kernel"])
    tuned_after = np.asarray(state.params["text_model"]["blocks_1"]["attn"]["qkv"]["kernel"])
    np.testing.assert_array_equal(frozen_before, frozen_after)
    assert not np.allclose(tuned_before, tuned_after)


def test_freeze_mask_step_matches_unmasked(setup):
    """freeze_mask stop_gradients the frozen text blocks (their dW matmuls
    drop out of the backward). The optimizer already zeroes those updates,
    so the masked step must produce IDENTICAL params and loss — and the
    frozen leaves' raw grads must be exactly zero."""
    from tvts_tpu.train.optim import freeze_mask

    cfg, model, params, batch = setup
    ocfg = OptimizerConfig(lr_new=1e-3, lr_clip=1e-3,
                           text_layers=cfg.text.layers, text_tune_layers=1)
    tx = make_optimizer(params, ocfg)
    fmask = freeze_mask(params, ocfg)
    assert any(jax.tree.leaves(fmask)), "tiny config should have a frozen block"

    plain = make_train_step(model, tx, donate=False)
    masked = make_train_step(model, tx, donate=False, freeze_mask=fmask)
    s0 = create_train_state(params, tx)
    s_plain, aux_p = plain(s0, batch)
    s_mask, aux_m = masked(s0, batch)
    np.testing.assert_allclose(float(aux_p["loss"]), float(aux_m["loss"]),
                               rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), s_plain.params, s_mask.params)

    grads = jax.grad(lambda p: make_loss_fn(model, freeze_mask=fmask)(p, batch)[0])(params)
    frozen_g = grads["text_model"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert not np.any(np.asarray(frozen_g))


def test_sharded_step_matches_single_device(setup):
    cfg, model, params, batch = setup
    ocfg = OptimizerConfig(lr_new=1e-3, lr_clip=1e-3,
                           text_layers=cfg.text.layers, text_tune_layers=1)
    tx = make_optimizer(params, ocfg)
    step = make_train_step(model, tx, donate=False)

    # single device
    state1 = create_train_state(params, tx)
    state1, aux1 = step(state1, batch)

    # 8-device mesh: dp=2, fsdp=2, tp=2 — global batch identical
    mesh = create_mesh(dp=2, fsdp=2, tp=2)
    sp = shard_params(params, mesh)
    state8 = create_train_state(sp, tx)
    sb = shard_batch(batch, mesh)
    state8, aux8 = step(state8, sb)

    np.testing.assert_allclose(float(aux8["loss"]), float(aux1["loss"]), rtol=1e-5)
    p1 = np.asarray(state1.params["video_model"]["blocks_0"]["attn"]["qkv"]["kernel"])
    p8 = np.asarray(state8.params["video_model"]["blocks_0"]["attn"]["qkv"]["kernel"])
    np.testing.assert_allclose(p8, p1, atol=1e-5)


def test_sharded_train_step_matches_global():
    """shard_map step (explicit all_gather + grad psum; required for Pallas
    kernels under dp) == the jit/global-array step, on an 8-device CPU mesh."""
    import jax
    from tests.test_tvtsv2_parity import tiny_config
    from tvts_tpu.models.tvts_v2 import TVTSv2
    from tvts_tpu.parallel import create_mesh, shard_batch
    from tvts_tpu.train.optim import OptimizerConfig, make_optimizer
    from tvts_tpu.train.step import (create_train_state, make_sharded_train_step,
                                     make_train_step)

    cfg = tiny_config("openai")
    batch = make_batch(cfg, B=8)
    model = TVTSv2(cfg)
    params = model.init(jax.random.PRNGKey(0), batch["video"][:1],
                        batch["text_ids"][: cfg.num_clips],
                        batch["keep_ind"][:1])["params"]
    tx = make_optimizer(params, OptimizerConfig(text_layers=cfg.text.layers,
                                                text_tune_layers=1))
    step_ref = make_train_step(model, tx, donate=False)
    state_ref, aux_ref = step_ref(create_train_state(params, tx), batch)

    mesh = create_mesh(dp=4, fsdp=2)
    with mesh:
        step_sh = make_sharded_train_step(model, tx, mesh, donate=False)
        state_sh, aux_sh = step_sh(create_train_state(params, tx),
                                   shard_batch(batch, mesh))
    np.testing.assert_allclose(float(aux_sh["loss"]), float(aux_ref["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(aux_sh["loss_ce"]),
                               float(aux_ref["loss_ce"]), rtol=1e-5)
    # psum reduction order differs from the global-matmul grad path; Adam
    # amplifies that fp32 noise, so compare with a hair more slack
    for a, b in zip(jax.tree.leaves(state_sh.params),
                    jax.tree.leaves(state_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-3)
