"""Fused Pallas train path under a sharded mesh (VERDICT r3 #3).

The pallas_call is opaque to GSPMD, so make_fused_train_apply(mesh=...)
wraps the fused tower in a jax.shard_map over the data axes: batch split
per shard (grid-over-B runs on the local batch), params replicated in with
psum'd cotangents — the DDP-grad-allreduce contract. These tests run the
REAL kernels in interpret mode on the 8-virtual-CPU mesh and require the
sharded loss and gradients to match the unsharded fused path exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_train_step import make_batch
from tests.test_tvtsv2_parity import tiny_config
from tvts_tpu.models.tvts_v2 import TVTSv2
from tvts_tpu.ops.fused_forward import make_fused_train_apply
from tvts_tpu.parallel import create_mesh, shard_batch, shard_params
from tvts_tpu.train.optim import OptimizerConfig, make_optimizer
from tvts_tpu.train.step import (create_train_state, make_loss_fn,
                                 make_train_step)

pytestmark = pytest.mark.kernels


def _setup(B=8):
    cfg = tiny_config("openai")
    batch = make_batch(cfg, B=B)
    model = TVTSv2(cfg)
    params = model.init(jax.random.PRNGKey(0), batch["video"][:1],
                        batch["text_ids"][: cfg.num_clips],
                        batch["keep_ind"][:1])["params"]
    return cfg, model, params, batch


FUSED_KW = dict(dtype=jnp.float32, time_chunk=8, space_mode="pallas_v10",
                time_mode="pallas_tps", interpret=True)


@pytest.mark.parametrize("dp,fsdp,text_mode",
                         [(4, 2, "xla"), (2, 1, "pallas")])
def test_sharded_fused_loss_and_grads_match_unsharded(dp, fsdp, text_mode):
    """text_mode='pallas' additionally certifies the fused text AND sort
    kernels' own shard_maps (rows split over the data axes) against the
    unsharded XLA fused path."""
    cfg, model, params, batch = _setup(B=8)
    mesh = create_mesh(dp=dp, fsdp=fsdp,
                       devices=jax.devices()[: dp * fsdp])

    mk = dict(model=model, cfg=cfg, num_frames=cfg.vision.num_frames,
              n_keep=cfg.vision.n_keep)
    apply_plain = make_fused_train_apply(**mk, **FUSED_KW)
    apply_sharded = make_fused_train_apply(**mk, **FUSED_KW, mesh=mesh,
                                           text_mode=text_mode,
                                           sort_mode=text_mode)

    loss_plain = make_loss_fn(model, apply_fn=apply_plain)
    loss_sharded = make_loss_fn(model, apply_fn=apply_sharded)

    (l_p, _), g_p = jax.value_and_grad(loss_plain, has_aux=True)(params, batch)
    sparams = shard_params(params, mesh)
    sbatch = shard_batch(batch, mesh)
    with mesh:
        (l_s, _), g_s = jax.jit(jax.value_and_grad(loss_sharded,
                                                   has_aux=True))(
            sparams, sbatch)
    np.testing.assert_allclose(float(l_s), float(l_p), rtol=1e-6)
    flat_p = jax.tree_util.tree_flatten_with_path(g_p)[0]
    flat_s = jax.tree_util.tree_flatten_with_path(g_s)[0]
    for (path, a), (_, b) in zip(flat_s, flat_p):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-4, err_msg=name)


def test_sharded_fused_full_train_step():
    """End to end: optimizer step with the sharded fused apply on the mesh
    (sharded params + opt state), one step, finite loss equal to the
    unsharded fused step's."""
    cfg, model, params, batch = _setup(B=8)
    mesh = create_mesh(dp=4, fsdp=2, devices=jax.devices()[:8])
    tx = make_optimizer(params, OptimizerConfig(text_layers=cfg.text.layers,
                                                text_tune_layers=1))
    mk = dict(model=model, cfg=cfg, num_frames=cfg.vision.num_frames,
              n_keep=cfg.vision.n_keep)

    step_plain = make_train_step(model, tx, donate=False,
                                 apply_fn=make_fused_train_apply(**mk,
                                                                 **FUSED_KW))
    _, aux_p = step_plain(create_train_state(params, tx), batch)

    apply_sharded = make_fused_train_apply(**mk, **FUSED_KW, mesh=mesh)
    with mesh:
        sparams = shard_params(params, mesh)
        state = create_train_state(sparams, tx)
        sbatch = shard_batch(batch, mesh)
        step = make_train_step(model, tx, donate=False,
                               apply_fn=apply_sharded)
        state, aux = step(state, sbatch)
        jax.block_until_ready(aux["loss"])
    assert np.isfinite(float(aux["loss"]))
    np.testing.assert_allclose(float(aux["loss"]), float(aux_p["loss"]),
                               rtol=1e-6)


def test_sharded_fused_h14_structure():
    """H/14-GEOMETRY sharding contract (VERDICT r4 #8): openclip pool, causal
    gelu text, mask 0.7, D=128, the H/14 hybrid kernel recipe (fused v2
    flash-recompute space + XLA-remat time, save_acts=False — the 12.08
    clips/s preset, ops/kernel_config.py) under a dp2 x fsdp2 mesh. Loss and
    grads must match the unsharded fused path. LayerScale stays off as in
    the shipped H/14 config (the fused path rejects ls_init, and
    /root/reference/v2/model/video_encoder_ViT_H_14.py:227-294 only builds
    LayerScale when init_values is set)."""
    import dataclasses

    from tvts_tpu.models.configs import (SortConfig, TextConfig, TVTSv2Config,
                                         VisionConfig)

    cfg = TVTSv2Config(
        name="tiny_h14",
        vision=VisionConfig(input_resolution=64, patch_size=16, width=128,
                            layers=2, heads=4, output_dim=64, num_frames=4,
                            mask_ratio=0.75, act="gelu",
                            pool_style="openclip"),
        text=TextConfig(context_length=16, vocab_size=120, width=64, layers=2,
                        heads=4, output_dim=64, act="gelu"),
        sort=SortConfig(embed_dim=64, num_heads=4, num_classes=4),
    )
    batch = make_batch(cfg, B=8)
    model = TVTSv2(cfg)
    params = model.init(jax.random.PRNGKey(0), batch["video"][:1],
                        batch["text_ids"][: cfg.num_clips],
                        batch["keep_ind"][:1])["params"]
    mesh = create_mesh(dp=2, fsdp=2, devices=jax.devices()[:4])

    kw = dict(dtype=jnp.float32, space_mode="pallas", time_mode="xla",
              save_acts=False, interpret=True)
    mk = dict(model=model, cfg=cfg, num_frames=cfg.vision.num_frames,
              n_keep=cfg.vision.n_keep)
    loss_plain = make_loss_fn(model, apply_fn=make_fused_train_apply(**mk, **kw))
    loss_sharded = make_loss_fn(model, apply_fn=make_fused_train_apply(
        **mk, **kw, mesh=mesh))

    (l_p, _), g_p = jax.value_and_grad(loss_plain, has_aux=True)(params, batch)
    with mesh:
        (l_s, _), g_s = jax.jit(jax.value_and_grad(loss_sharded,
                                                   has_aux=True))(
            shard_params(params, mesh), shard_batch(batch, mesh))
    np.testing.assert_allclose(float(l_s), float(l_p), rtol=1e-6)
    flat_p = jax.tree_util.tree_flatten_with_path(g_p)[0]
    flat_s = jax.tree_util.tree_flatten_with_path(g_s)[0]
    for (path, a), (_, b) in zip(flat_s, flat_p):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-4, err_msg=name)


def test_fused_train_rejects_layerscale_config():
    """ls_init configs must be rejected, not silently dropped (the fused
    block_weights never read the ls_* gammas)."""
    import dataclasses

    cfg, model, params, batch = _setup(B=2)
    ls_cfg = dataclasses.replace(cfg, vision=dataclasses.replace(
        cfg.vision, ls_init=1e-5))
    with pytest.raises(NotImplementedError, match="LayerScale"):
        make_fused_train_apply(model=model, cfg=ls_cfg,
                               num_frames=ls_cfg.vision.num_frames,
                               n_keep=ls_cfg.vision.n_keep, **FUSED_KW)


def test_sharded_fused_no_keep_ind():
    """mask_ratio 0 (B/32-style): keep_ind is None through the shard_map."""
    cfg, model, params, batch = _setup(B=8)
    # rebuild at mask 0: n_keep == patches_per_frame, no tube gather
    import dataclasses

    cfg = dataclasses.replace(cfg, vision=dataclasses.replace(
        cfg.vision, mask_ratio=0.0))
    model = TVTSv2(cfg)
    batch = make_batch(cfg, B=8)
    batch.pop("keep_ind", None)
    params = model.init(jax.random.PRNGKey(0), batch["video"][:1],
                        batch["text_ids"][: cfg.num_clips])["params"]
    mesh = create_mesh(dp=2, fsdp=1, devices=jax.devices()[:2])
    mk = dict(model=model, cfg=cfg, num_frames=cfg.vision.num_frames,
              n_keep=cfg.vision.n_keep)
    loss_plain = make_loss_fn(model, apply_fn=make_fused_train_apply(
        **mk, **FUSED_KW))
    loss_sharded = make_loss_fn(model, apply_fn=make_fused_train_apply(
        **mk, **FUSED_KW, mesh=mesh))
    l_p, _ = loss_plain(params, batch)
    with mesh:
        l_s, _ = jax.jit(loss_sharded)(shard_params(params, mesh),
                                       shard_batch(batch, mesh))
    np.testing.assert_allclose(float(l_s), float(l_p), rtol=1e-6)
