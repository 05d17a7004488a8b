"""Explicit shard_map contrastive gather vs the single-device global loss:
values AND gradients must match (AllGather_multi semantics, trainer.py:41-57)."""

import jax
import jax.numpy as jnp
import numpy as np

from tvts_tpu.ops.losses import norm_softmax_loss
from tvts_tpu.ops.sim import sim_matrix
from tvts_tpu.parallel import create_mesh
from tvts_tpu.parallel.collectives import batch_shard, make_gathered_loss


def global_loss(video, text):
    return norm_softmax_loss(sim_matrix(video, text))


def test_shard_map_gather_matches_global():
    rng = np.random.default_rng(0)
    N, D = 16, 12
    video = rng.normal(size=(N, D)).astype(np.float32)
    text = rng.normal(size=(N, D)).astype(np.float32)

    want_loss, (want_gv, want_gt) = jax.value_and_grad(global_loss, argnums=(0, 1))(
        jnp.asarray(video), jnp.asarray(text))

    mesh = create_mesh(dp=4, fsdp=2, tp=1)
    with mesh:
        gathered = make_gathered_loss(global_loss, mesh)
        vs = batch_shard(jnp.asarray(video), mesh)
        ts = batch_shard(jnp.asarray(text), mesh)
        got_loss, (got_gv, got_gt) = jax.value_and_grad(gathered, argnums=(0, 1))(vs, ts)

    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_gv), np.asarray(want_gv), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_gt), np.asarray(want_gt), atol=1e-6)
