"""Fused LN+qkv+attention+proj megakernel vs the composed XLA sub-path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tvts_tpu.models.layers import LayerNormF32, VarAttention
from tvts_tpu.ops.pallas_block_attention import fused_space_attention_block


def test_fused_space_block_matches_xla():
    rng = np.random.default_rng(0)
    B, T, N, D, H = 2, 3, 16, 32, 4
    S = 1 + T * N
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32)) * 0.5

    class Sub(VarAttention.__mro__[1].__mro__[0]):  # flax Module
        pass

    import flax.linen as nn

    class SubPath(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = LayerNormF32(name="ln")(x)
            return VarAttention(D, H, name="attn")(y, T, N, "space")

    mod = SubPath()
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    # perturb params away from init symmetry
    params = jax.tree.map(
        lambda a: a + 0.02 * np.random.default_rng(1).normal(size=a.shape).astype(np.float32),
        params)
    want = np.asarray(mod.apply({"params": params}, x))

    got = np.asarray(fused_space_attention_block(
        x,
        jnp.asarray(params["ln"]["scale"]), jnp.asarray(params["ln"]["bias"]),
        jnp.asarray(params["attn"]["qkv"]["kernel"]),
        jnp.asarray(params["attn"]["qkv"]["bias"]),
        jnp.asarray(params["attn"]["proj"]["kernel"]),
        jnp.asarray(params["attn"]["proj"]["bias"]),
        num_frames=T, patches_per_frame=N, num_heads=H, interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_fused_time_block_matches_xla():
    import flax.linen as nn

    from tvts_tpu.ops.pallas_block_attention import fused_time_attention_block

    rng = np.random.default_rng(2)
    B, T, N, D, H = 2, 3, 20, 32, 4  # N=20 forces padding to chunk
    S = 1 + T * N
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32)) * 0.5

    class SubPath(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = LayerNormF32(name="ln")(x)
            return VarAttention(D, H, name="attn")(y, T, N, "time")

    mod = SubPath()
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree.map(
        lambda a: a + 0.02 * np.random.default_rng(3).normal(size=a.shape).astype(np.float32),
        params)
    want = np.asarray(mod.apply({"params": params}, x))

    got = np.asarray(fused_time_attention_block(
        x,
        jnp.asarray(params["ln"]["scale"]), jnp.asarray(params["ln"]["bias"]),
        jnp.asarray(params["attn"]["qkv"]["kernel"]),
        jnp.asarray(params["attn"]["qkv"]["bias"]),
        jnp.asarray(params["attn"]["proj"]["kernel"]),
        jnp.asarray(params["attn"]["proj"]["bias"]),
        num_frames=T, patches_per_frame=N, num_heads=H, chunk=8,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_fused_space_block_multi_frames_per_program():
    import flax.linen as nn

    rng = np.random.default_rng(5)
    B, T, N, D, H = 2, 4, 16, 32, 4
    S = 1 + T * N
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32)) * 0.5

    class SubPath(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = LayerNormF32(name="ln")(x)
            return VarAttention(D, H, name="attn")(y, T, N, "space")

    mod = SubPath()
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree.map(
        lambda a: a + 0.02 * np.random.default_rng(6).normal(size=a.shape).astype(np.float32),
        params)
    want = np.asarray(mod.apply({"params": params}, x))
    got = np.asarray(fused_space_attention_block(
        x,
        jnp.asarray(params["ln"]["scale"]), jnp.asarray(params["ln"]["bias"]),
        jnp.asarray(params["attn"]["qkv"]["kernel"]),
        jnp.asarray(params["attn"]["qkv"]["bias"]),
        jnp.asarray(params["attn"]["proj"]["kernel"]),
        jnp.asarray(params["attn"]["proj"]["bias"]),
        num_frames=T, patches_per_frame=N, num_heads=H, frames_per_program=2,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_fused_mlp_block_matches_xla():
    import flax.linen as nn

    from tvts_tpu.models.layers import Mlp
    from tvts_tpu.ops.pallas_block_attention import fused_mlp_block

    rng = np.random.default_rng(7)
    B, S, D = 2, 37, 32  # odd S forces padding
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32)) * 0.5

    class SubPath(nn.Module):
        @nn.compact
        def __call__(self, x):
            return x + Mlp(D * 4, D, act="quick_gelu", name="mlp")(
                LayerNormF32(name="ln")(x))

    mod = SubPath()
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    want = np.asarray(mod.apply({"params": params}, x))
    got = np.asarray(fused_mlp_block(
        x, jnp.asarray(params["ln"]["scale"]), jnp.asarray(params["ln"]["bias"]),
        jnp.asarray(params["mlp"]["c_fc"]["kernel"]),
        jnp.asarray(params["mlp"]["c_fc"]["bias"]),
        jnp.asarray(params["mlp"]["c_proj"]["kernel"]),
        jnp.asarray(params["mlp"]["c_proj"]["bias"]),
        act="quick_gelu", chunk=16, interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_fused_time_block_v4_matches_xla():
    """v4 T-leading time forward (extraction path) vs the XLA sub-path,
    including the folded residual."""
    import flax.linen as nn

    from tvts_tpu.ops.pallas_block_attention import fused_time_attention_block_v4

    rng = np.random.default_rng(4)
    B, T, N, D, H = 2, 3, 20, 32, 4  # N=20 forces padding to chunk
    S = 1 + T * N
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32)) * 0.5

    class SubPath(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = LayerNormF32(name="ln")(x)
            return x + VarAttention(D, H, name="attn")(y, T, N, "time")

    mod = SubPath()
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree.map(
        lambda a: a + 0.02 * np.random.default_rng(5).normal(
            size=a.shape).astype(np.float32), params)
    want = np.asarray(mod.apply({"params": params}, x))

    got = np.asarray(fused_time_attention_block_v4(
        x,
        jnp.asarray(params["ln"]["scale"]), jnp.asarray(params["ln"]["bias"]),
        jnp.asarray(params["attn"]["qkv"]["kernel"]),
        jnp.asarray(params["attn"]["qkv"]["bias"]),
        jnp.asarray(params["attn"]["proj"]["kernel"]),
        jnp.asarray(params["attn"]["proj"]["bias"]),
        num_frames=T, patches_per_frame=N, num_heads=H, chunk=8,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("fpp", [1, 3])
def test_fused_space_block_v5_matches_xla(fpp):
    """v5 frame-batched space forward vs the XLA sub-path (incl. residual)."""
    import flax.linen as nn

    from tvts_tpu.ops.pallas_block_attention import fused_space_attention_block_v5

    rng = np.random.default_rng(6)
    B, T, N, D, H = 2, 3, 5, 32, 4
    S = 1 + T * N
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32)) * 0.5
    base = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32)) * 0.5

    class SubPath(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = LayerNormF32(name="ln")(x)
            return VarAttention(D, H, name="attn")(y, T, N, "space")

    mod = SubPath()
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree.map(
        lambda a: a + 0.02 * np.random.default_rng(7).normal(
            size=a.shape).astype(np.float32), params)
    want = np.asarray(base + mod.apply({"params": params}, x))

    got = np.asarray(fused_space_attention_block_v5(
        x, base,
        jnp.asarray(params["ln"]["scale"]), jnp.asarray(params["ln"]["bias"]),
        jnp.asarray(params["attn"]["qkv"]["kernel"]),
        jnp.asarray(params["attn"]["qkv"]["bias"]),
        jnp.asarray(params["attn"]["proj"]["kernel"]),
        jnp.asarray(params["attn"]["proj"]["bias"]),
        num_frames=T, patches_per_frame=N, num_heads=H, fpp=fpp,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)
