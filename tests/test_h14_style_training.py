"""H/14-recipe specifics: openclip pooling + remat + FSDP param sharding on the
virtual 8-device mesh (the reference only stubbed grad checkpointing and had no
param sharding — SURVEY §2.10)."""

import jax
import numpy as np
import pytest

from tests.test_train_step import make_batch
from tests.test_tvtsv2_parity import tiny_config
from tvts_tpu.models.tvts_v2 import TVTSv2
from tvts_tpu.parallel import create_mesh, param_shardings, shard_batch, shard_params
from tvts_tpu.train.optim import OptimizerConfig, make_optimizer
from tvts_tpu.train.step import create_train_state, make_train_step


def test_openclip_remat_fsdp_train_step():
    cfg = tiny_config("openclip")
    model = TVTSv2(cfg, remat=True)
    batch = make_batch(cfg, B=8)
    params = model.init(jax.random.PRNGKey(0), batch["video"][:2],
                        batch["text_ids"][: 2 * cfg.num_clips],
                        batch["keep_ind"][:2])["params"]

    ocfg = OptimizerConfig(text_layers=cfg.text.layers, text_tune_layers=1)
    tx = make_optimizer(params, ocfg)

    mesh = create_mesh(dp=2, fsdp=4, tp=1)
    with mesh:
        sp = shard_params(params, mesh)
        # verify at least one large matrix actually got fsdp-sharded
        shardings = param_shardings(params, mesh)
        qkv = shardings["video_model"]["blocks_0"]["attn"]["qkv"]["kernel"]
        assert "fsdp" in str(qkv.spec)
        state = create_train_state(sp, tx)
        step = make_train_step(model, tx, donate=False)
        state, aux = step(state, shard_batch(batch, mesh))
        assert np.isfinite(float(aux["loss"]))
        assert float(aux["loss_ce"]) > 0


def test_remat_matches_no_remat():
    cfg = tiny_config("openai")
    batch = make_batch(cfg, B=4)
    m1 = TVTSv2(cfg, remat=False)
    m2 = TVTSv2(cfg, remat=True)
    params = m1.init(jax.random.PRNGKey(0), batch["video"][:1],
                     batch["text_ids"][: cfg.num_clips],
                     batch["keep_ind"][:1])["params"]
    a = m1.apply({"params": params}, batch["video"], batch["text_ids"],
                 batch["keep_ind"])
    b = m2.apply({"params": params}, batch["video"], batch["text_ids"],
                 batch["keep_ind"])
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a[2]), np.asarray(b[2]), atol=1e-6)
