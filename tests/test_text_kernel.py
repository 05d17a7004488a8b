"""Fused text-attention kernel vs the flax TextTransformer (f32 + interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvts_tpu.models.configs import TextConfig
from tvts_tpu.models.text import TextTransformer

pytestmark = pytest.mark.kernels


def _weights(rng, D):
    return dict(
        ln_s=jnp.ones((D,), jnp.float32),
        ln_b=jnp.asarray(rng.normal(size=(D,)) * 0.02, jnp.float32),
        wqkv=jnp.asarray(rng.normal(size=(D, 3 * D)) * 0.05, jnp.float32),
        bqkv=jnp.asarray(rng.normal(size=(3 * D,)) * 0.02, jnp.float32),
        wproj=jnp.asarray(rng.normal(size=(D, D)) * 0.05, jnp.float32),
        bproj=jnp.asarray(rng.normal(size=(D,)) * 0.02, jnp.float32),
    )


def _xla_ref(x, w, H, causal=True):
    """The SelfAttention(causal=True) formulation (models/layers.py)."""
    D = x.shape[-1]
    d = D // H
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    xln = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * w["ln_s"] + w["ln_b"]
    qkv = xln @ w["wqkv"] + w["bqkv"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    B, S, _ = x.shape
    q = q.reshape(B, S, H, d).transpose(0, 2, 1, 3) * (d ** -0.5)
    k = k.reshape(B, S, H, d).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, H, d).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhid,bhjd->bhij", q, k)
    if causal:
        mask = jnp.tril(jnp.ones((S, S), dtype=bool))
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhij,bhjd->bhid", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, S, D)
    return x + o @ w["wproj"] + w["bproj"]


@pytest.mark.parametrize("rpp", [1, 2])
@pytest.mark.parametrize("causal", [True, False])
def test_text_attention_block_forward(rpp, causal):
    from tvts_tpu.ops.pallas_text_attention import fused_text_attention_block

    B, S, D, H = 4, 10, 32, 4
    rng = np.random.default_rng(0)
    w = _weights(rng, D)
    x = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    want = _xla_ref(x, w, H, causal)
    got = fused_text_attention_block(
        x, w["ln_s"], w["ln_b"], w["wqkv"], w["bqkv"], w["wproj"], w["bproj"],
        num_heads=H, causal=causal, rpp=rpp, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("rpp", [1, 2])
def test_text_subpath_grads(rpp):
    from tvts_tpu.ops.pallas_text_attention import make_text_subpath

    B, S, D, H = 4, 10, 32, 4
    rng = np.random.default_rng(1)
    w = _weights(rng, D)
    x = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    args = (x, w["ln_s"], w["ln_b"], w["wqkv"], w["bqkv"], w["wproj"],
            w["bproj"])
    sub = make_text_subpath(H, causal=True, rpp=rpp, interpret=True)
    cot = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)

    def loss_fused(*a):
        return jnp.sum(sub(*a) * cot)

    def loss_ref(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj):
        return jnp.sum(_xla_ref(x, dict(ln_s=ln_s, ln_b=ln_b, wqkv=wqkv,
                                        bqkv=bqkv, wproj=wproj, bproj=bproj),
                                H) * cot)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for gf, gr, name in zip(g_fused, g_ref,
                            ("x", "ln_s", "ln_b", "wqkv", "bqkv", "wproj",
                             "bproj")):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=3e-4, rtol=2e-4, err_msg=name)


def test_text_subpath_frozen_dx_matches(
):
    """frozen=True: dx must equal the trainable subpath's dx exactly; the
    weight cotangents come back as zeros (the dx-only backward kernel)."""
    from tvts_tpu.ops.pallas_text_attention import make_text_subpath

    B, S, D, H = 4, 10, 32, 4
    rng = np.random.default_rng(3)
    w = _weights(rng, D)
    x = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    args = (x, w["ln_s"], w["ln_b"], w["wqkv"], w["bqkv"], w["wproj"],
            w["bproj"])
    cot = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    sub = make_text_subpath(H, interpret=True)
    sub_f = make_text_subpath(H, frozen=True, interpret=True)

    np.testing.assert_allclose(np.asarray(sub_f(*args)),
                               np.asarray(sub(*args)), atol=1e-6)
    g = jax.grad(lambda *a: jnp.sum(sub(*a) * cot),
                 argnums=tuple(range(7)))(*args)
    g_f = jax.grad(lambda *a: jnp.sum(sub_f(*a) * cot),
                   argnums=tuple(range(7)))(*args)
    np.testing.assert_allclose(np.asarray(g_f[0]), np.asarray(g[0]),
                               atol=2e-5, rtol=1e-5)  # dx identical
    for gf in g_f[1:]:
        assert not np.any(np.asarray(gf))              # weight grads zero


def test_text_transformer_tune_from_matches_full_grads_on_tuned():
    """tune_from=k: pooled output identical; grads on the TUNED blocks and
    the embeddings match the no-freeze fused forward (the frozen blocks'
    grads are zeros the optimizer discards)."""
    from tvts_tpu.ops.pallas_text_attention import (
        text_transformer_fused_forward,
    )

    cfg = TextConfig(context_length=10, vocab_size=50, width=32, heads=4,
                     layers=3, output_dim=16)
    model = TextTransformer(cfg)
    rng = np.random.default_rng(4)
    ids = rng.integers(1, 48, size=(4, 10)).astype(np.int32)
    ids[:, -1] = 49
    ids = jnp.asarray(ids)
    params = model.init(jax.random.PRNGKey(0), ids)["params"]

    def emb(p, tune_from=None):
        return text_transformer_fused_forward(p, cfg, ids, dtype=jnp.float32,
                                              tune_from=tune_from,
                                              interpret=True)

    np.testing.assert_allclose(np.asarray(emb(params, 1)),
                               np.asarray(emb(params)), atol=1e-6)
    g_full = jax.grad(lambda p: jnp.sum(emb(p)))(params)
    g_tf = jax.grad(lambda p: jnp.sum(emb(p, 1)))(params)
    np.testing.assert_allclose(
        np.asarray(g_tf["blocks_1"]["attn"]["qkv"]["kernel"]),
        np.asarray(g_full["blocks_1"]["attn"]["qkv"]["kernel"]),
        atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(g_tf["token_embedding"]["embedding"]),
        np.asarray(g_full["token_embedding"]["embedding"]),
        atol=2e-5, rtol=1e-4)
    assert not np.any(np.asarray(g_tf["blocks_0"]["attn"]["qkv"]["kernel"]))
    assert not np.any(np.asarray(g_tf["blocks_0"]["mlp"]["c_fc"]["kernel"]))


def test_sort_transformer_fused_forward_matches_apply():
    """Fused sort forward (causal=False kernels, eps 1e-6, text-rows tail)
    vs the flax SortTransformer — outputs and grads."""
    from tvts_tpu.models.configs import SortConfig
    from tvts_tpu.models.sort import SortTransformer
    from tvts_tpu.ops.pallas_text_attention import (
        sort_transformer_fused_forward,
    )

    cfg = SortConfig(embed_dim=32, num_heads=4, depth=2, num_classes=4)
    model = SortTransformer(cfg)
    rng = np.random.default_rng(5)
    t = jnp.asarray(rng.normal(size=(4, 4, 32)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(4, 9, 32)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), t, v)["params"]
    want = model.apply({"params": params}, t, v)
    got = sort_transformer_fused_forward(params, cfg, t, v,
                                         dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)

    def loss(fn):
        return lambda p, tt, vv: jnp.sum(jnp.sin(fn(p, tt, vv)))

    g_ref = jax.grad(loss(lambda p, tt, vv: model.apply({"params": p}, tt, vv)),
                     argnums=(0, 1, 2))(params, t, v)
    g_fus = jax.grad(loss(lambda p, tt, vv: sort_transformer_fused_forward(
        p, cfg, tt, vv, dtype=jnp.float32, interpret=True)),
        argnums=(0, 1, 2))(params, t, v)
    flat_r = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(g_fus)[0]
    for (path, a), (_, b) in zip(flat_f, flat_r):
        name = "/".join(str(getattr(q, "key", q)) for q in path)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=2e-4, err_msg=name)


@pytest.mark.parametrize("act", ["quick_gelu", "gelu"])
def test_text_transformer_fused_forward_matches_apply(act):
    from tvts_tpu.ops.pallas_text_attention import (
        text_transformer_fused_forward,
    )

    cfg = TextConfig(context_length=10, vocab_size=50, width=32, heads=4,
                     layers=2, output_dim=16, act=act)
    model = TextTransformer(cfg)
    rng = np.random.default_rng(2)
    ids = rng.integers(1, 48, size=(6, 10)).astype(np.int32)
    # EOT (largest id) at VARIED positions — the fused forward's EOT-only
    # last block gathers per-row, so position handling must be exact
    for r, pos in enumerate([9, 4, 7, 2, 9, 5]):
        ids[r, pos] = 49
        ids[r, pos + 1:] = 0
    ids = jnp.asarray(ids)
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    want = model.apply({"params": params}, ids)
    got = text_transformer_fused_forward(params, cfg, ids,
                                         dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)
