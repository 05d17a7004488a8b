import numpy as np
import pytest

from tvts_tpu.ops.sampling import multi_clip_frame_indices, sample_frames


def test_uniform_matches_reference_formula():
    # reference: midpoint (lo + hi)//2 with hi = next_interval - 1
    vlen, n = 300, 12
    intervals = np.linspace(0, vlen, n + 1).astype(int)
    expected = [(intervals[i] + intervals[i + 1] - 1) // 2 for i in range(n)]
    assert sample_frames(n, vlen, sample="uniform") == expected


def test_fix_start():
    vlen, n = 120, 4
    intervals = np.linspace(0, vlen, n + 1).astype(int)
    got = sample_frames(n, vlen, fix_start=3)
    assert got == [int(intervals[i]) + 3 for i in range(n)]


def test_rand_within_intervals():
    rng = np.random.default_rng(0)
    vlen, n = 250, 12
    intervals = np.linspace(0, vlen, n + 1).astype(int)
    for _ in range(50):
        idxs = sample_frames(n, vlen, sample="rand", rng=rng)
        assert len(idxs) == n
        for i, idx in enumerate(idxs):
            # reference draws from [lo, next-1) i.e. excludes the interval's last frame
            assert intervals[i] <= idx < max(intervals[i + 1] - 1, intervals[i] + 1)


def test_short_video_clamps():
    idxs = sample_frames(12, 5, sample="uniform")
    assert len(idxs) == 5
    assert all(0 <= i < 5 for i in idxs)


def test_single_frame_video_does_not_crash():
    assert sample_frames(4, 1, sample="rand", rng=np.random.default_rng(0)) == [0]


def test_rand_is_deterministic_given_rng():
    a = sample_frames(12, 300, rng=np.random.default_rng(7))
    b = sample_frames(12, 300, rng=np.random.default_rng(7))
    assert a == b


def test_unknown_mode_raises():
    with pytest.raises(NotImplementedError):
        sample_frames(4, 100, sample="bogus")


def test_multi_clip_frame_indices():
    rng = np.random.default_rng(0)
    vlen, duration = 900, 30.0  # 30 fps
    idxs = multi_clip_frame_indices([4.0, 8.0, 12.0, 16.0], [8.0, 12.0, 16.0, 20.0],
                                    duration, vlen, num_frames=3, num_clips=4, rng=rng)
    assert len(idxs) == 12
    # window = [4s, 20s] -> frames [120, 600)
    assert all(120 <= i < 600 for i in idxs)
    assert idxs == sorted(idxs)
