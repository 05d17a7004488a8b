"""Parity tests for the text tower (vs reference CLIP transformer composed as the
TVTSv2 wrappers do) and the sort head (vs reference sort_transformer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import has_reference, load_reference_module
from tvts_tpu.models.configs import SortConfig, TextConfig
from tvts_tpu.models.sort import SortTransformer
from tvts_tpu.models.text import TextTransformer
from tvts_tpu.utils.torch_convert import convert_state_dict, merge_params

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")


def build_ref_text_parts(width, layers, heads, ctx, vocab, out_dim):
    """Assemble the raw text modules exactly as TVTSv2 does
    (model_dist_TVTSv2_ViT_B_16.py:22-26 splits clip_model into these five)."""
    import torch
    import torch.nn as nn

    ref = load_reference_module("v2/CLIP/clip/model.py", "ref_clip_model")
    torch.manual_seed(1)
    mask = torch.empty(ctx, ctx).fill_(float("-inf")).triu_(1)
    parts = {
        "transformer": ref.Transformer(width, layers, heads, attn_mask=mask),
        "token_embedding": nn.Embedding(vocab, width),
        "positional_embedding": nn.Parameter(torch.randn(ctx, width) * 0.01),
        "ln_final": ref.LayerNorm(width),
        "text_projection": nn.Parameter(torch.randn(width, out_dim) * width ** -0.5),
    }
    return parts


def ref_compute_text(parts, token_ids):
    """Reference compute_text (model_dist_TVTSv2_ViT_B_16.py:97-111)."""
    import torch

    with torch.no_grad():
        x = parts["token_embedding"](token_ids)
        x = x + parts["positional_embedding"]
        x = x.permute(1, 0, 2)
        x = parts["transformer"](x)
        x = x.permute(1, 0, 2)
        x = parts["ln_final"](x)
        pooled = x[torch.arange(x.shape[0]), token_ids.argmax(dim=-1)]
        return pooled @ parts["text_projection"]


def parts_state_dict(parts):
    sd = {}
    sd.update({f"text_model.{k}": v.detach().numpy()
               for k, v in parts["transformer"].state_dict().items()})
    sd["text_token_embedding.weight"] = parts["token_embedding"].weight.detach().numpy()
    sd["text_positional_embedding"] = parts["positional_embedding"].detach().numpy()
    sd.update({f"text_ln_final.{k}": v.detach().numpy()
               for k, v in parts["ln_final"].state_dict().items()})
    sd["text_projection"] = parts["text_projection"].detach().numpy()
    return sd


@pytest.mark.parametrize("act", ["quick_gelu"])
def test_text_tower_parity(act):
    import torch

    width, layers, heads, ctx, vocab, out_dim = 64, 3, 4, 16, 120, 48
    cfg = TextConfig(context_length=ctx, vocab_size=vocab, width=width,
                     layers=layers, heads=heads, output_dim=out_dim, act=act)
    parts = build_ref_text_parts(width, layers, heads, ctx, vocab, out_dim)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, vocab - 1, size=(5, ctx)).astype(np.int64)
    ids[:, 0] = 1
    # force a unique max (EOT-like) position per row
    for r in range(5):
        pos = rng.integers(2, ctx)
        ids[r, pos] = vocab - 1

    want = ref_compute_text(parts, torch.from_numpy(ids)).numpy()

    model = TextTransformer(cfg)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(ids.astype(np.int32)))
    loaded = convert_state_dict(parts_state_dict(parts))["text_model"]
    params = merge_params(init["params"], loaded, strict=True)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(ids.astype(np.int32))))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_sort_transformer_parity():
    import torch

    ref = load_reference_module("v2/model/sort_transformer.py", "ref_sort")
    torch.manual_seed(2)
    D, heads, n_trans = 64, 4, 4
    tmodel = ref.SortTransformer(num_classes=n_trans, embed_dim=D, num_heads=heads)
    tmodel.eval()

    rng = np.random.default_rng(3)
    text = rng.normal(size=(2, n_trans, D)).astype(np.float32)
    video = rng.normal(size=(2, 9, D)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(text), torch.from_numpy(video)).numpy()

    cfg = SortConfig(embed_dim=D, num_heads=heads, num_classes=n_trans)
    model = SortTransformer(cfg)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(text), jnp.asarray(video))
    sd = {f"pred_model.{k}": v.detach().numpy() for k, v in tmodel.state_dict().items()}
    loaded = convert_state_dict(sd)["pred_model"]
    params = merge_params(init["params"], loaded, strict=True)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(text), jnp.asarray(video)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_text_tower_parity_openclip_module():
    """H/14 text contract vs the REAL vendored OpenCLIP Transformer (nn.GELU
    blocks, causal mask passed per call — model_dist_TVTSv2_ViT_H_14.py:134-149),
    not the CLIP QuickGELU module the other tests use."""
    import sys
    import types

    import torch
    import torch.nn as nn

    # parent package shim so transformer.py's relative import resolves
    if "OpenCLIP" not in sys.modules or not hasattr(sys.modules["OpenCLIP"], "__path__"):
        from tests.conftest import _install_shims

        _install_shims()
    sys.modules["OpenCLIP"].__path__ = []
    ref = load_reference_module("v2/OpenCLIP/transformer.py", "OpenCLIP.transformer")

    width, layers, heads, ctx, vocab, out_dim = 64, 2, 4, 16, 120, 48
    torch.manual_seed(5)
    transformer = ref.Transformer(width=width, layers=layers, heads=heads,
                                  act_layer=nn.GELU, norm_layer=ref.LayerNorm)
    token_embedding = nn.Embedding(vocab, width)
    positional_embedding = nn.Parameter(torch.randn(ctx, width) * 0.01)
    ln_final = ref.LayerNorm(width)
    text_projection = nn.Parameter(torch.randn(width, out_dim) * width ** -0.5)
    mask = torch.empty(ctx, ctx).fill_(float("-inf")).triu_(1)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, vocab - 2, size=(3, ctx)).astype(np.int64)
    ids[:, 0] = 1
    for r in range(3):
        ids[r, rng.integers(2, ctx)] = vocab - 1

    with torch.no_grad():
        x = token_embedding(torch.from_numpy(ids))
        x = x + positional_embedding
        x = x.permute(1, 0, 2)
        x = transformer(x, attn_mask=mask)
        x = x.permute(1, 0, 2)
        x = ln_final(x)
        want = (x[torch.arange(3), torch.from_numpy(ids).argmax(dim=-1)]
                @ text_projection).numpy()

    from tvts_tpu.models.text import TextTransformer
    from tvts_tpu.models.configs import TextConfig

    cfg = TextConfig(context_length=ctx, vocab_size=vocab, width=width,
                     layers=layers, heads=heads, output_dim=out_dim, act="gelu")
    model = TextTransformer(cfg)
    ids32 = jnp.asarray(ids.astype(np.int32))
    init = model.init(jax.random.PRNGKey(0), ids32)

    sd = {f"text_model.{k}": v.detach().numpy()
          for k, v in transformer.state_dict().items()}
    sd["text_token_embedding.weight"] = token_embedding.weight.detach().numpy()
    sd["text_positional_embedding"] = positional_embedding.detach().numpy()
    sd.update({f"text_ln_final.{k}": v.detach().numpy()
               for k, v in ln_final.state_dict().items()})
    sd["text_projection"] = text_projection.detach().numpy()
    loaded = convert_state_dict(sd)["text_model"]
    params = merge_params(init["params"], loaded, strict=True)
    got = np.asarray(model.apply({"params": params}, ids32))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
