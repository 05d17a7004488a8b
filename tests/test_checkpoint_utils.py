import numpy as np

from tvts_tpu.utils.checkpoint import Monitor, load_params_npz, save_params_npz


def test_npz_roundtrip(tmp_path):
    params = {"a": {"b": np.arange(6.0).reshape(2, 3)},
              "c": np.ones(4, dtype=np.float32)}
    path = str(tmp_path / "p.npz")
    save_params_npz(path, params)
    back = load_params_npz(path)
    np.testing.assert_array_equal(back["a"]["b"], params["a"]["b"])
    np.testing.assert_array_equal(back["c"], params["c"])


def test_monitor_min_max():
    m = Monitor("min val_loss_0")
    assert m.improved({"val_loss_0": 1.0})
    assert not m.improved({"val_loss_0": 2.0})
    assert m.improved({"val_loss_0": 0.5})
    assert not m.improved({"other": 0.1})  # metric absent -> no improvement

    mx = Monitor("max R1")
    assert mx.improved({"R1": 10.0})
    assert not mx.improved({"R1": 5.0})

    off = Monitor("off")
    assert not off.improved({"anything": 1.0})
