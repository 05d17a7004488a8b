import numpy as np

from tvts_tpu.data.prefetch import prefetch_to_device


def test_prefetch_preserves_order_and_count():
    batches = [{"x": np.full((2,), i, dtype=np.float32)} for i in range(7)]
    out = list(prefetch_to_device(iter(batches), size=3))
    assert len(out) == 7
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])


def test_prefetch_short_iterator():
    batches = [{"x": np.zeros(1)}]
    assert len(list(prefetch_to_device(iter(batches), size=4))) == 1
    assert list(prefetch_to_device(iter([]), size=2)) == []
