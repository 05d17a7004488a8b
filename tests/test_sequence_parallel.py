"""Sequence-parallel (sp axis) token sharding: train step runs on a dp/sp/tp
mesh and matches the unsharded loss."""

import jax
import numpy as np

from tests.test_train_step import make_batch
from tests.test_tvtsv2_parity import tiny_config
from tvts_tpu.models.tvts_v2 import TVTSv2
from tvts_tpu.parallel import create_mesh, shard_batch, shard_params
from tvts_tpu.train.optim import OptimizerConfig, make_optimizer
from tvts_tpu.train.step import create_train_state, make_train_step


def test_sp_sharded_step_matches_unsharded():
    cfg = tiny_config("openai")
    batch = make_batch(cfg, B=8)
    model_plain = TVTSv2(cfg)
    params = model_plain.init(jax.random.PRNGKey(0), batch["video"][:2],
                              batch["text_ids"][: 2 * cfg.num_clips],
                              batch["keep_ind"][:2])["params"]
    ocfg = OptimizerConfig(text_layers=cfg.text.layers, text_tune_layers=1)
    tx = make_optimizer(params, ocfg)

    # reference value: single device
    step = make_train_step(model_plain, tx, donate=False)
    _, aux_ref = step(create_train_state(params, tx), batch)

    # dp=2, sp=2, tp=2 mesh with token sharding constraints
    model_sp = TVTSv2(cfg, token_partition=(("dp", "fsdp"), "sp", None))
    mesh = create_mesh(dp=2, fsdp=1, sp=2, tp=2)
    with mesh:
        sp_params = shard_params(params, mesh)
        step_sp = make_train_step(model_sp, tx, donate=False)
        state, aux = step_sp(create_train_state(sp_params, tx),
                             shard_batch(batch, mesh))
    np.testing.assert_allclose(float(aux["loss"]), float(aux_ref["loss"]),
                               rtol=1e-5)
    assert np.isfinite(float(aux["loss_ce"]))
