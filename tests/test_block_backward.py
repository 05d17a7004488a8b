"""Gradient parity of the backward megakernels vs jax.grad of the XLA
sub-paths (fp32, interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvts_tpu.ops.fused_forward import _layernorm, _var_attention_xla
from tvts_tpu.ops.pallas_block_attention import make_mlp_subpath
from tvts_tpu.ops.pallas_block_backward import make_space_subpath

pytestmark = pytest.mark.kernels

ARGNAMES_SPACE = ["dx", "dbase", "dls", "dlb", "dwqkv", "dbqkv", "dwproj", "dbproj"]


def _attn_args(seed, B, T, N, D):
    rng = np.random.default_rng(seed)
    S = 1 + T * N
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    base = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    ln_s = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    ln_b = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    wqkv = jnp.asarray((rng.normal(size=(D, 3 * D)) * 0.07).astype(np.float32))
    bqkv = jnp.asarray((rng.normal(size=(3 * D,)) * 0.07).astype(np.float32))
    wproj = jnp.asarray((rng.normal(size=(D, D)) * 0.07).astype(np.float32))
    bproj = jnp.asarray((rng.normal(size=(D,)) * 0.07).astype(np.float32))
    return x, base, ln_s, ln_b, wqkv, bqkv, wproj, bproj


def _space_ref(T, N, H):
    def ref(x, base, ln_s, ln_b, wqkv, bqkv, wproj, bproj):
        p = {"qkv": {"kernel": wqkv, "bias": bqkv},
             "proj": {"kernel": wproj, "bias": bproj}}
        ln = {"scale": ln_s, "bias": ln_b}
        return base + _var_attention_xla(_layernorm(x, ln), p, T, N, "space", H)
    return ref


@pytest.mark.parametrize("shape", [(2, 3, 5, 32)])
@pytest.mark.parametrize("save_acts,bwd_mode", [(True, "xla"), (True, "pallas"),
                                               (False, "pallas")])
def test_space_subpath_grads(shape, save_acts, bwd_mode):
    B, T, N, D = shape
    H = 4
    args = _attn_args(0, B, T, N, D)
    f = make_space_subpath(T, N, H, save_acts=save_acts, bwd_mode=bwd_mode,
                           interpret=True)
    ref = _space_ref(T, N, H)

    np.testing.assert_allclose(np.asarray(f(*args)), np.asarray(ref(*args)),
                               atol=3e-5, rtol=1e-4)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a)))

    g_f = jax.grad(loss(f), argnums=tuple(range(8)))(*args)
    g_r = jax.grad(loss(ref), argnums=tuple(range(8)))(*args)
    for n, a, b in zip(ARGNAMES_SPACE, g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=2e-3, err_msg=n)


@pytest.mark.parametrize("shape", [(2, 3, 5, 32)])
@pytest.mark.parametrize("save_probs", [False, True])
def test_space_subpath_v3_grads(shape, save_probs):
    """d-major head-batched variant (the training default); save_probs
    consumes the forward-saved softmax state in the backward."""
    from tvts_tpu.ops.pallas_block_backward import make_space_subpath_v3

    B, T, N, D = shape
    H = 4
    args = _attn_args(3, B, T, N, D)
    f = make_space_subpath_v3(T, N, H, save_probs=save_probs,
                              interpret=True)
    ref = _space_ref(T, N, H)

    np.testing.assert_allclose(np.asarray(f(*args)), np.asarray(ref(*args)),
                               atol=3e-5, rtol=1e-4)
    g_f = jax.grad(lambda *a: jnp.sum(jnp.sin(f(*a))),
                   argnums=tuple(range(8)))(*args)
    g_r = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                   argnums=tuple(range(8)))(*args)
    for n, a, b in zip(ARGNAMES_SPACE, g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=2e-3, err_msg=n)


def test_mlp_subpath_grads_gelu():
    rng = np.random.default_rng(1)
    B, S, D, Hd = 2, 21, 32, 128
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    ln_s = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    ln_b = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    wfc = jnp.asarray((rng.normal(size=(D, Hd)) * 0.07).astype(np.float32))
    bfc = jnp.asarray((rng.normal(size=(Hd,)) * 0.07).astype(np.float32))
    wproj = jnp.asarray((rng.normal(size=(Hd, D)) * 0.07).astype(np.float32))
    bproj = jnp.asarray((rng.normal(size=(D,)) * 0.07).astype(np.float32))
    args = (x, ln_s, ln_b, wfc, bfc, wproj, bproj)

    from tvts_tpu.ops.fused_forward import _mlp

    def ref(x, ln_s, ln_b, wfc, bfc, wproj, bproj):
        p = {"c_fc": {"kernel": wfc, "bias": bfc},
             "c_proj": {"kernel": wproj, "bias": bproj}}
        return x + _mlp(_layernorm(x, {"scale": ln_s, "bias": ln_b}), p, "gelu")

    f = make_mlp_subpath(act="gelu", chunk=16, interpret=True)
    np.testing.assert_allclose(np.asarray(f(*args)), np.asarray(ref(*args)),
                               atol=3e-5, rtol=1e-4)
    g_f = jax.grad(lambda *a: jnp.sum(jnp.sin(f(*a))),
                   argnums=tuple(range(7)))(*args)
    g_r = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                   argnums=tuple(range(7)))(*args)
    for i, (a, b) in enumerate(zip(g_f, g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=2e-3, err_msg=f"arg {i}")


def _time_ref(T, N, H):
    def ref(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj):
        p = {"qkv": {"kernel": wqkv, "bias": bqkv},
             "proj": {"kernel": wproj, "bias": bproj}}
        ln = {"scale": ln_s, "bias": ln_b}
        return x + _var_attention_xla(_layernorm(x, ln), p, T, N, "time", H)
    return ref


@pytest.mark.parametrize("shape,chunk", [((2, 3, 5, 32), 4)])
@pytest.mark.parametrize("save_acts", [True, False])
def test_time_subpath_grads(shape, chunk, save_acts):
    from tvts_tpu.ops.pallas_block_backward import make_time_subpath

    B, T, N, D = shape
    H = 4
    x, _, ln_s, ln_b, wqkv, bqkv, wproj, bproj = _attn_args(2, B, T, N, D)
    args = (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj)
    f = make_time_subpath(T, N, H, chunk=chunk, save_acts=save_acts,
                          interpret=True)
    ref = _time_ref(T, N, H)

    np.testing.assert_allclose(np.asarray(f(*args)), np.asarray(ref(*args)),
                               atol=3e-5, rtol=1e-4)
    g_f = jax.grad(lambda *a: jnp.sum(jnp.sin(f(*a))),
                   argnums=tuple(range(7)))(*args)
    g_r = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                   argnums=tuple(range(7)))(*args)
    names = ["dx", "dls", "dlb", "dwqkv", "dbqkv", "dwproj", "dbproj"]
    for n, a, b in zip(names, g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=2e-3, err_msg=n)


@pytest.mark.parametrize("shape,chunk", [((2, 3, 5, 32), 4)])
def test_time_subpath_tps_grads(shape, chunk):
    """Time sub-path with the probs-saving backward (save_probs=True)."""
    from tvts_tpu.ops.pallas_block_backward import make_time_subpath

    B, T, N, D = shape
    H = 4
    x, _, ln_s, ln_b, wqkv, bqkv, wproj, bproj = _attn_args(21, B, T, N, D)
    args = (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj)
    f = make_time_subpath(T, N, H, chunk=chunk, save_probs=True,
                          interpret=True)
    ref = _time_ref(T, N, H)

    np.testing.assert_allclose(np.asarray(f(*args)), np.asarray(ref(*args)),
                               atol=3e-5, rtol=1e-4)
    g_f = jax.grad(lambda *a: jnp.sum(jnp.sin(f(*a))),
                   argnums=tuple(range(7)))(*args)
    g_r = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                   argnums=tuple(range(7)))(*args)
    names = ["dx", "dls", "dlb", "dwqkv", "dbqkv", "dwproj", "dbproj"]
    for n, a, b in zip(names, g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=2e-3, err_msg=n)


@pytest.mark.parametrize("shape,chunk", [((2, 3, 5, 32), 4), ((1, 4, 9, 64), 16)])
def test_time_subpath_v3_grads(shape, chunk):
    """d-major T-leading time backward (v3) vs jax.grad of the XLA path."""
    from tvts_tpu.ops.pallas_block_backward import make_time_subpath_v3

    B, T, N, D = shape
    H = 4
    x, _, ln_s, ln_b, wqkv, bqkv, wproj, bproj = _attn_args(3, B, T, N, D)
    args = (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj)
    f = make_time_subpath_v3(T, N, H, chunk=chunk, interpret=True)
    ref = _time_ref(T, N, H)

    np.testing.assert_allclose(np.asarray(f(*args)), np.asarray(ref(*args)),
                               atol=3e-5, rtol=1e-4)
    g_f = jax.grad(lambda *a: jnp.sum(jnp.sin(f(*a))),
                   argnums=tuple(range(7)))(*args)
    g_r = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                   argnums=tuple(range(7)))(*args)
    names = ["dx", "dls", "dlb", "dwqkv", "dbqkv", "dwproj", "dbproj"]
    for n, a, b in zip(names, g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=2e-3, err_msg=n)


def test_fused_train_step_matches_xla(monkeypatch):
    """Full TVTSv2 train step with the fused differentiable tower (Pallas
    fwd+bwd, interpret) matches the XLA train step: loss + gradients."""
    from tests.test_train_step import make_batch
    from tests.test_tvtsv2_parity import tiny_config
    from tvts_tpu.models.tvts_v2 import TVTSv2
    from tvts_tpu.ops.fused_forward import make_fused_train_apply
    from tvts_tpu.train.optim import OptimizerConfig, make_optimizer
    from tvts_tpu.train.step import create_train_state, make_train_step

    cfg = tiny_config("openai")
    batch = make_batch(cfg, B=2)
    model = TVTSv2(cfg)
    params = model.init(jax.random.PRNGKey(0), batch["video"][:1],
                        batch["text_ids"][: cfg.num_clips],
                        batch["keep_ind"][:1])["params"]
    tx = make_optimizer(params, OptimizerConfig(text_layers=cfg.text.layers,
                                                text_tune_layers=1))

    from tvts_tpu.train.step import make_loss_fn

    apply_fn = make_fused_train_apply(
        model, cfg, num_frames=cfg.vision.num_frames,
        n_keep=cfg.vision.n_keep, dtype=jnp.float32, time_chunk=8,
        interpret=True)

    loss_ref = make_loss_fn(model)
    loss_fused = make_loss_fn(model, apply_fn=apply_fn)
    (l_ref, _), g_ref = jax.value_and_grad(loss_ref, has_aux=True)(params, batch)
    (l_f, _), g_f = jax.value_and_grad(loss_fused, has_aux=True)(params, batch)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(g_f)[0]
    for (path, a), (_, b) in zip(flat_f, flat_ref):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   rtol=2e-3, err_msg=name)

    # the optimizer step runs end to end with the fused apply
    step_f = make_train_step(model, tx, donate=False, apply_fn=apply_fn)
    state_f, aux_f = step_f(create_train_state(params, tx), batch)
    assert np.isfinite(float(aux_f["loss"]))

    # scan-over-blocks (one kernel trace per sub-path, stacked weights) must
    # reproduce the unrolled fused loss AND gradients
    apply_scan = make_fused_train_apply(
        model, cfg, num_frames=cfg.vision.num_frames,
        n_keep=cfg.vision.n_keep, dtype=jnp.float32, time_chunk=8,
        scan_blocks=True, interpret=True)
    loss_scan = make_loss_fn(model, apply_fn=apply_scan)
    (l_s, _), g_s = jax.value_and_grad(loss_scan, has_aux=True)(params, batch)
    np.testing.assert_allclose(float(l_s), float(l_f), rtol=1e-6)
    flat_s = jax.tree_util.tree_flatten_with_path(g_s)[0]
    for (path, a), (_, b) in zip(flat_s, flat_f):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-4, err_msg=name)


@pytest.mark.parametrize("shape,fpp", [((2, 3, 5, 32), 1), ((2, 4, 5, 32), 4)])
def test_space_subpath_v5_grads(shape, fpp):
    """Frame-batched space backward (v5) vs jax.grad of the XLA path."""
    from tvts_tpu.ops.pallas_block_backward import make_space_subpath_v5

    B, T, N, D = shape
    H = 4
    args = _attn_args(9, B, T, N, D)
    f = make_space_subpath_v5(T, N, H, fpp=fpp, interpret=True)
    ref = _space_ref(T, N, H)
    np.testing.assert_allclose(np.asarray(f(*args)), np.asarray(ref(*args)),
                               atol=3e-5, rtol=1e-4)
    g_f = jax.grad(lambda *a: jnp.sum(jnp.sin(f(*a))),
                   argnums=tuple(range(8)))(*args)
    g_r = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                   argnums=tuple(range(8)))(*args)
    for n, a, b in zip(ARGNAMES_SPACE, g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=2e-3, err_msg=n)


@pytest.mark.parametrize("shape", [(2, 3, 5, 32)])
@pytest.mark.parametrize("save_attn", [False, True])
def test_space_subpath_v7_grads(shape, save_attn):
    """d-major TOWER space sub-path (v7 train): d-major in/out, zero
    per-program transposes. Checked against the row-major XLA reference by
    transposing at the boundary."""
    from tvts_tpu.ops.pallas_block_backward import make_space_subpath_v7

    B, T, N, D = shape
    H = 4
    args = _attn_args(7, B, T, N, D)
    f7 = make_space_subpath_v7(H, save_attn=save_attn, interpret=True)
    ref = _space_ref(T, N, H)

    def f(x, base, *w):
        xT = jnp.swapaxes(x[:, 1:].reshape(B, T, N, D), -1, -2)
        baseT = jnp.swapaxes(base[:, 1:].reshape(B, T, N, D), -1, -2)
        oT, ocls = f7(xT, baseT, x[:, :1], base[:, :1], *w)
        return jnp.concatenate(
            [ocls, jnp.swapaxes(oT, -1, -2).reshape(B, T * N, D)], axis=1)

    np.testing.assert_allclose(np.asarray(f(*args)), np.asarray(ref(*args)),
                               atol=3e-5, rtol=1e-4)
    g_f = jax.grad(lambda *a: jnp.sum(jnp.sin(f(*a))),
                   argnums=tuple(range(8)))(*args)
    g_r = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                   argnums=tuple(range(8)))(*args)
    for n, a, b in zip(ARGNAMES_SPACE, g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=2e-3, err_msg=n)


@pytest.mark.parametrize("shape,chunk,save_attn",
                         [((2, 3, 6, 32), 3, False),
                          ((2, 3, 6, 32), 3, True),
                          ((1, 4, 9, 64), None, False)])
def test_time_subpath_v7_grads(shape, chunk, save_attn):
    """d-major TOWER time sub-path (v7 train): d-major in/out, no
    lane<->sublane transpose sets."""
    from tvts_tpu.ops.pallas_block_backward import make_time_subpath_v7

    B, T, N, D = shape
    H = 4
    x, _, ln_s, ln_b, wqkv, bqkv, wproj, bproj = _attn_args(9, B, T, N, D)
    args = (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj)
    f7 = make_time_subpath_v7(H, chunk=chunk, save_attn=save_attn,
                              interpret=True)
    ref = _time_ref(T, N, H)

    def f(x, *w):
        xT = jnp.swapaxes(x[:, 1:].reshape(B, T, N, D), -1, -2)
        oT, ocls = f7(xT, x[:, :1], *w)
        return jnp.concatenate(
            [ocls, jnp.swapaxes(oT, -1, -2).reshape(B, T * N, D)], axis=1)

    np.testing.assert_allclose(np.asarray(f(*args)), np.asarray(ref(*args)),
                               atol=3e-5, rtol=1e-4)
    g_f = jax.grad(lambda *a: jnp.sum(jnp.sin(f(*a))),
                   argnums=tuple(range(7)))(*args)
    g_r = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                   argnums=tuple(range(7)))(*args)
    names = ["dx", "dls", "dlb", "dwqkv", "dbqkv", "dwproj", "dbproj"]
    for n, a, b in zip(names, g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=2e-3, err_msg=n)


@pytest.mark.parametrize("act", ["quick_gelu", "gelu"])
def test_mlp_subpath_v7_grads(act):
    """d-major TOWER MLP sub-path (v7 train): saved pre-activation hiddens,
    lane-contraction weight grads."""
    from tvts_tpu.ops.fused_forward import _mlp
    from tvts_tpu.ops.pallas_block_backward import make_mlp_subpath_v7

    rng = np.random.default_rng(11)
    B, T, N, D, Hd = 2, 3, 5, 32, 128
    S = 1 + T * N
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    ln_s = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    ln_b = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    wfc = jnp.asarray((rng.normal(size=(D, Hd)) * 0.07).astype(np.float32))
    bfc = jnp.asarray((rng.normal(size=(Hd,)) * 0.07).astype(np.float32))
    wpr = jnp.asarray((rng.normal(size=(Hd, D)) * 0.07).astype(np.float32))
    bpr = jnp.asarray((rng.normal(size=(D,)) * 0.07).astype(np.float32))
    args = (x, ln_s, ln_b, wfc, bfc, wpr, bpr)

    def ref(x, ln_s, ln_b, wfc, bfc, wpr, bpr):
        p = {"c_fc": {"kernel": wfc, "bias": bfc},
             "c_proj": {"kernel": wpr, "bias": bpr}}
        return x + _mlp(_layernorm(x, {"scale": ln_s, "bias": ln_b}), p, act)

    f7 = make_mlp_subpath_v7(act=act, interpret=True)

    def f(x, *w):
        xT = jnp.swapaxes(x[:, 1:].reshape(B, T, N, D), -1, -2)
        oT, ocls = f7(xT, x[:, :1], *w)
        return jnp.concatenate(
            [ocls, jnp.swapaxes(oT, -1, -2).reshape(B, T * N, D)], axis=1)

    np.testing.assert_allclose(np.asarray(f(*args)), np.asarray(ref(*args)),
                               atol=3e-5, rtol=1e-4)
    g_f = jax.grad(lambda *a: jnp.sum(jnp.sin(f(*a))),
                   argnums=tuple(range(7)))(*args)
    g_r = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                   argnums=tuple(range(7)))(*args)
    names = ["dx", "dls", "dlb", "dwfc", "dbfc", "dwpr", "dbpr"]
    for n, a, b in zip(names, g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=2e-3, err_msg=n)


def test_fused_train_step_dmajor_matches_xla():
    """Full TVTSv2 train step with the d-major v7 tower (layout='dmajor',
    all three sub-paths Pallas fwd+bwd, interpret) matches the XLA train
    step: loss + gradients; scan and unrolled agree."""
    from tests.test_train_step import make_batch
    from tests.test_tvtsv2_parity import tiny_config
    from tvts_tpu.models.tvts_v2 import TVTSv2
    from tvts_tpu.ops.fused_forward import make_fused_train_apply
    from tvts_tpu.train.step import make_loss_fn

    cfg = tiny_config("openai")
    batch = make_batch(cfg, B=2)
    model = TVTSv2(cfg)
    params = model.init(jax.random.PRNGKey(0), batch["video"][:1],
                        batch["text_ids"][: cfg.num_clips],
                        batch["keep_ind"][:1])["params"]

    apply_fn = make_fused_train_apply(
        model, cfg, num_frames=cfg.vision.num_frames,
        n_keep=cfg.vision.n_keep, dtype=jnp.float32, time_chunk=8,
        layout="dmajor", interpret=True)
    loss_ref = make_loss_fn(model)
    loss_dm = make_loss_fn(model, apply_fn=apply_fn)
    (l_r, _), g_r = jax.value_and_grad(loss_ref, has_aux=True)(params, batch)
    (l_d, _), g_d = jax.value_and_grad(loss_dm, has_aux=True)(params, batch)
    np.testing.assert_allclose(float(l_d), float(l_r), rtol=1e-5)
    flat_r = jax.tree_util.tree_flatten_with_path(g_r)[0]
    flat_d = jax.tree_util.tree_flatten_with_path(g_d)[0]
    for (path, a), (_, b) in zip(flat_d, flat_r):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   rtol=2e-3, err_msg=name)

    apply_scan = make_fused_train_apply(
        model, cfg, num_frames=cfg.vision.num_frames,
        n_keep=cfg.vision.n_keep, dtype=jnp.float32, time_chunk=8,
        layout="dmajor", scan_blocks=True, interpret=True)
    loss_scan = make_loss_fn(model, apply_fn=apply_scan)
    (l_s, _), g_s = jax.value_and_grad(loss_scan, has_aux=True)(params, batch)
    np.testing.assert_allclose(float(l_s), float(l_d), rtol=1e-6)
    flat_s = jax.tree_util.tree_flatten_with_path(g_s)[0]
    for (path, a), (_, b) in zip(flat_s, flat_d):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-4, err_msg=name)


@pytest.mark.parametrize("fpp,save_probs", [(2, True), (2, False), (3, True)])
def test_space_subpath_v9_grads(fpp, save_probs):
    """FPP-frame-batched d-major space sub-path (v9 train) vs the XLA
    reference; save_probs consumes the forward-saved softmax state."""
    from tvts_tpu.ops.pallas_block_backward import make_space_subpath_v9

    B, T, N, D = 2, 6, 5, 32
    H = 4
    args = _attn_args(13, B, T, N, D)
    f9 = make_space_subpath_v9(H, fpp=fpp, save_probs=save_probs,
                               interpret=True)
    ref = _space_ref(T, N, H)

    def f(x, base, *w):
        xT = jnp.swapaxes(x[:, 1:].reshape(B, T, N, D), -1, -2)
        baseT = jnp.swapaxes(base[:, 1:].reshape(B, T, N, D), -1, -2)
        oT, ocls = f9(xT, baseT, x[:, :1], base[:, :1], *w)
        return jnp.concatenate(
            [ocls, jnp.swapaxes(oT, -1, -2).reshape(B, T * N, D)], axis=1)

    np.testing.assert_allclose(np.asarray(f(*args)), np.asarray(ref(*args)),
                               atol=3e-5, rtol=1e-4)
    g_f = jax.grad(lambda *a: jnp.sum(jnp.sin(f(*a))),
                   argnums=tuple(range(8)))(*args)
    g_r = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                   argnums=tuple(range(8)))(*args)
    for n, a, b in zip(ARGNAMES_SPACE, g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=2e-3, err_msg=n)


# one case per axis value rather than the cross-product (suite-budget trim,
# VERDICT r4 #9): fpp {2,3}, save_probs {T,F}, wide_mm {T,F}, smv all four
@pytest.mark.parametrize("fpp,save_probs,wide_mm,smv",
                         [(3, True, False, "base"), (2, False, False, "base"),
                          (3, True, True, "base"),
                          (3, True, False, "pvones"),
                          (2, True, True, "densdot"),
                          (3, False, False, "cp")])
def test_space_subpath_v10_grads(fpp, save_probs, wide_mm, smv):
    """Row-I/O FPP-frame-batched space sub-path (v10 train: v9 kernels with
    in-kernel per-frame transposes) vs the XLA reference. wide_mm: round-4
    frame-concatenated qkv/proj (+grad) matmuls; smv: MXU-denominator
    softmax variants threaded through the probs-saving fwd+bwd pair."""
    from tvts_tpu.ops.pallas_block_backward import make_space_subpath_v10

    B, T, N, D = 2, 6, 5, 32
    H = 4
    args = _attn_args(17, B, T, N, D)
    f = make_space_subpath_v10(T, N, H, fpp=fpp, save_probs=save_probs,
                               wide_mm=wide_mm, smv=smv, interpret=True)
    ref = _space_ref(T, N, H)

    np.testing.assert_allclose(np.asarray(f(*args)), np.asarray(ref(*args)),
                               atol=3e-5, rtol=1e-4)
    g_f = jax.grad(lambda *a: jnp.sum(jnp.sin(f(*a))),
                   argnums=tuple(range(8)))(*args)
    g_r = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                   argnums=tuple(range(8)))(*args)
    for n, a, b in zip(ARGNAMES_SPACE, g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=2e-3, err_msg=n)
