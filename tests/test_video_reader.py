"""Decode-layer tests using a synthetic cv2-encoded video: per-frame solid colors
encode the frame index, so both backends can be checked for frame-accurate seeks."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tvts_tpu.data import native_decoder, video_reader  # noqa: E402


@pytest.fixture(scope="module")
def synth_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "synth.mp4")
    n, size = 60, 64
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                             (size, size))
    assert writer.isOpened(), "cv2 cannot encode mp4v"
    for i in range(n):
        frame = np.zeros((size, size, 3), np.uint8)
        frame[:] = (255 - i * 4, 128, i * 4)  # BGR: blue encodes inverse, red encodes i
        writer.write(frame)
    writer.release()
    return path, n


def frame_to_index(rgb_frame):
    # RGB red channel ~= 4*i
    return int(round(float(rgb_frame[:, :, 0].mean()) / 4.0))


def test_probe_backends_agree(synth_video):
    path, n = synth_video
    assert video_reader.get_video_len(path, backend="cv2") == n
    if native_decoder.available():
        info = native_decoder.probe(path)
        assert info.n_frames == n
        assert (info.width, info.height) == (64, 64)


@pytest.mark.parametrize("backend", ["cv2", "native"])
def test_read_frames_at(synth_video, backend):
    if backend == "native" and not native_decoder.available():
        pytest.skip("native decoder not built")
    path, n = synth_video
    req = [0, 7, 23, 24, 42, 59]
    frames = video_reader.read_frames_at(path, req, backend=backend)
    assert frames.shape == (len(req), 64, 64, 3)
    got = [frame_to_index(f) for f in frames]
    for want, g in zip(req, got):
        assert abs(g - want) <= 1, (req, got)


def test_native_unsorted_and_duplicate_indices(synth_video):
    if not native_decoder.available():
        pytest.skip("native decoder not built")
    path, _ = synth_video
    req = [30, 5, 30, 55, 5]
    frames = native_decoder.decode_frames(path, req)
    got = [frame_to_index(f) for f in frames]
    for want, g in zip(req, got):
        assert abs(g - want) <= 1, (req, got)


def test_native_resize(synth_video):
    if not native_decoder.available():
        pytest.skip("native decoder not built")
    path, _ = synth_video
    frames = native_decoder.decode_frames(path, [3, 40], resize=(32, 48))
    assert frames.shape == (2, 48, 32, 3)
    assert abs(frame_to_index(frames[0]) - 3) <= 1


def test_read_frames_sampled(synth_video):
    path, n = synth_video
    frames, idxs = video_reader.read_frames_sampled(
        path, 8, sample="uniform", backend="cv2")
    assert frames.shape[0] == 8
    assert all(0 <= i < n for i in idxs)


def test_out_of_range_clamps(synth_video):
    if not native_decoder.available():
        pytest.skip("native decoder not built")
    path, n = synth_video
    frames = native_decoder.decode_frames(path, [n - 1, n + 10])
    assert frames.shape[0] == 2
    assert abs(frame_to_index(frames[0]) - (n - 1)) <= 1


def test_native_decode_aug_crop_hflip(tmp_path):
    """Fused crop+hflip fast path equals full decode -> numpy crop/flip
    (reference fast_decode filtergraph semantics, base_dataset_yt.py:394-436).
    Uses a spatial-gradient video so a wrong crop offset cannot pass."""
    from tvts_tpu.data import native_decoder as nd

    if not nd.available():
        pytest.skip("native decoder unavailable")
    path = str(tmp_path / "grad.mp4")
    size_full = 64
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                             (size_full, size_full))
    assert writer.isOpened()
    yy, xx = np.mgrid[0:size_full, 0:size_full].astype(np.uint8)
    for i in range(10):
        frame = np.stack([np.full_like(xx, i * 20), 4 * xx, 4 * yy], axis=-1)
        writer.write(frame)  # BGR
    writer.release()
    synth_video = path
    info = nd.probe(synth_video)
    size = 32
    aw, ah = 0.25, 0.75
    idxs = [1, 4, 7]
    full = nd.decode_frames(synth_video, idxs)
    cx = int((info.width - size) * aw) & ~1
    cy = int((info.height - size) * ah) & ~1
    want = full[:, cy:cy + size, cx:cx + size]

    got = nd.decode_frames_aug(synth_video, idxs, crop_size=size,
                               crop_frac=(aw, ah))
    assert got.shape == (3, size, size, 3)
    # swscale paths may round chroma slightly differently: compare loosely
    assert np.mean(np.abs(got.astype(int) - want.astype(int))) < 2.0

    flipped = nd.decode_frames_aug(synth_video, idxs, crop_size=size,
                                   crop_frac=(aw, ah), hflip=True)
    np.testing.assert_array_equal(flipped, got[:, :, ::-1])
