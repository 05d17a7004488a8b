import numpy as np
import pytest

from tests.conftest import has_reference, load_reference_module
from tvts_tpu.ops import metrics as M

ref = None
if has_reference():
    ref = load_reference_module("v2/model/metric.py", "ref_metric")


def rand_sims(n_q, n_v, seed, ties=False):
    rng = np.random.default_rng(seed)
    sims = rng.uniform(-1, 1, size=(n_q, n_v))
    if ties:
        sims = np.round(sims, 1)  # force many exact ties
    return sims


@pytest.mark.skipif(ref is None, reason="reference repo not mounted")
@pytest.mark.parametrize("qpv", [1, 2])
@pytest.mark.parametrize("ties", [False, True])
def test_t2v_matches_reference(qpv, ties):
    sims = rand_sims(20 * qpv, 20, seed=qpv, ties=ties)
    want = ref.t2v_metrics(sims.copy())
    got = M.t2v_metrics(sims)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-9, err_msg=k)


@pytest.mark.skipif(ref is None, reason="reference repo not mounted")
def test_t2v_with_query_mask():
    sims = rand_sims(40, 20, seed=3)
    masks = (np.random.default_rng(0).uniform(size=(20, 2)) > 0.2).astype(np.float64)
    want = ref.t2v_metrics(sims.copy(), masks.copy())
    got = M.t2v_metrics(sims, masks)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-9, err_msg=k)


@pytest.mark.skipif(ref is None, reason="reference repo not mounted")
@pytest.mark.parametrize("cpv", [1, 2])
@pytest.mark.parametrize("ties", [False, True])
def test_v2t_matches_reference(cpv, ties):
    sims = rand_sims(15 * cpv, 15, seed=cpv + 10, ties=ties)
    want = ref.v2t_metrics(sims.copy())
    got = M.v2t_metrics(sims)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-9, err_msg=k)


@pytest.mark.skipif(ref is None, reason="reference repo not mounted")
def test_retrieval_as_classification_matches_reference():
    rng = np.random.default_rng(5)
    n_labels, n_videos = 12, 30
    sims = rng.uniform(-1, 1, size=(n_labels, n_videos))
    masks = np.zeros((n_labels, n_videos))
    for v in range(n_videos):
        masks[rng.integers(0, n_labels), v] = 1
        if rng.uniform() < 0.3:
            masks[rng.integers(0, n_labels), v] = 1
    want = ref.retrieval_as_classification(sims.copy(), masks.copy())
    got = M.retrieval_as_classification(sims, masks)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-9, err_msg=k)


def test_cols2metrics_basic():
    got = M.cols2metrics(np.array([0, 0, 4, 11, 60]), 5)
    assert got["R1"] == 40.0
    assert got["R5"] == 60.0
    assert got["R10"] == 60.0
    assert got["R50"] == 80.0
    assert got["MedR"] == 5.0


def test_acc_and_topk():
    out = np.array([[0.9, 0.1, 0.0], [0.2, 0.5, 0.3], [0.1, 0.2, 0.7]])
    tgt = np.array([0, 2, 2])
    assert M.acc(out, tgt) == pytest.approx(2 / 3)
    assert M.topk_acc(out, tgt, k=2) == pytest.approx(1.0)


@pytest.mark.skipif(ref is None, reason="reference repo not mounted")
def test_video_precision_matches_reference():
    import torch

    rng = np.random.default_rng(7)
    for seed in range(3):
        rng = np.random.default_rng(seed)
        B, P = 4, 6
        output = rng.integers(0, 8, size=(B, P, 2))
        target = rng.integers(0, 8, size=(B, P, 2))
        want = ref.video_precision(torch.from_numpy(output), torch.from_numpy(target))
        got = M.video_precision(output, target)
        np.testing.assert_allclose(got, want, rtol=1e-12)
        want_adj = ref.video_precision_adj(torch.from_numpy(output),
                                           torch.from_numpy(target))
        got_adj = M.video_precision_adj(output, target)
        np.testing.assert_allclose(got_adj, want_adj, rtol=1e-12)
