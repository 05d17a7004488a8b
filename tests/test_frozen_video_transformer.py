"""Parity: downstream Frozen-style SpaceTimeTransformer vs the reference
v1/downstream/video_transformer.py module (timm lineage)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import has_reference, load_reference_module
from tvts_tpu.downstream.video_transformer import SpaceTimeTransformer

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")


def convert_frozen_sd(sd):
    """torch state_dict of the reference SpaceTimeTransformer -> flax params."""
    import re

    tree = {}

    def put(path, arr):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr

    for k, v in sd.items():
        arr = v.detach().numpy()
        k = re.sub(r"^blocks\.(\d+)\.", r"blocks_\1.", k)
        k = k.replace("patch_embed.proj.", "patch_embed.")
        k = k.replace("pre_logits.fc.", "pre_logits.")
        parts = k.split(".")
        leaf = parts[-1]
        if leaf == "weight":
            if arr.ndim == 4:
                put(parts[:-1] + ["kernel"], arr.transpose(2, 3, 1, 0))
            elif arr.ndim == 2:
                put(parts[:-1] + ["kernel"], arr.T)
            else:
                put(parts[:-1] + ["scale"], arr)
        elif leaf == "bias":
            put(parts[:-1] + ["bias"], arr)
        else:
            put(parts, arr)
    return tree


def test_frozen_space_time_transformer_parity():
    import torch

    ref = load_reference_module("v1/downstream/video_transformer.py", "ref_frozen_vt")
    torch.manual_seed(0)
    tmodel = ref.SpaceTimeTransformer(
        img_size=32, patch_size=16, num_classes=7, embed_dim=64, depth=2,
        num_heads=4, num_frames=4)
    # give the zero-init time attention + embeds real values so parity is
    # non-trivial
    with torch.no_grad():
        for p in tmodel.parameters():
            if p.numel() and float(p.abs().sum()) == 0.0:
                p.normal_(0, 0.02)
    tmodel.eval()

    rng = np.random.default_rng(0)
    video = rng.normal(size=(2, 3, 4, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(video)).numpy()

    model = SpaceTimeTransformer(img_size=32, patch_size=16, num_classes=7,
                                 embed_dim=64, depth=2, num_heads=4,
                                 num_frames=4)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(video))
    loaded = convert_frozen_sd(tmodel.state_dict())
    from tvts_tpu.utils.torch_convert import merge_params

    params = merge_params(init["params"], loaded, strict=True)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(video)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_frozen_short_clip_truncation():
    """pos/temporal embeds truncate for clips shorter than num_frames."""
    model = SpaceTimeTransformer(img_size=32, patch_size=16, num_classes=5,
                                 embed_dim=64, depth=1, num_heads=4,
                                 num_frames=8)
    rng = np.random.default_rng(1)
    video = jnp.asarray(rng.normal(size=(1, 3, 3, 32, 32)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), video)["params"]
    out = model.apply({"params": params}, video)
    assert out.shape == (1, 5)
    assert np.isfinite(np.asarray(out)).all()
