import numpy as np
import pytest

from tests.conftest import has_reference, load_reference_module
from tvts_tpu.ops.losses import norm_softmax_loss, sort_accuracy, sort_loss
from tvts_tpu.ops.sim import sim_matrix


def test_sim_matrix_cosine():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(5, 8)).astype(np.float32)
    b = rng.normal(size=(7, 8)).astype(np.float32)
    s = np.asarray(sim_matrix(a, b))
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    np.testing.assert_allclose(s, an @ bn.T, atol=1e-6)


def test_sim_matrix_zero_row_stable():
    a = np.zeros((2, 4), dtype=np.float32)
    b = np.ones((3, 4), dtype=np.float32)
    s = np.asarray(sim_matrix(a, b))
    assert np.isfinite(s).all()


@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_norm_softmax_loss_matches_reference():
    import torch

    ref = load_reference_module("v2/model/loss.py", "ref_loss")
    rng = np.random.default_rng(1)
    for shape in [(8, 8), (16, 16)]:
        sim = rng.uniform(-1, 1, size=shape).astype(np.float32)
        want = ref.NormSoftmaxLoss()(torch.from_numpy(sim)).item()
        got = float(norm_softmax_loss(sim))
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sort_loss_matches_torch_ce():
    import torch
    import torch.nn as nn

    rng = np.random.default_rng(2)
    pred = rng.normal(size=(6, 4, 4)).astype(np.float32)
    labels = np.tile(np.arange(4), (6, 1))
    want = (nn.CrossEntropyLoss()(torch.from_numpy(pred.reshape(-1, 4)),
                                  torch.from_numpy(labels.reshape(-1))) * 2).item()
    got = float(sort_loss(pred, labels))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sort_accuracy():
    pred = np.zeros((2, 4, 4), dtype=np.float32)
    pred[:, np.arange(4), np.arange(4)] = 1.0  # predicts identity
    labels = np.tile(np.arange(4), (2, 1))
    assert float(sort_accuracy(pred, labels)) == 1.0
