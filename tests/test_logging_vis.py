import json
import os

import numpy as np

from tvts_tpu.utils.logging import MetricLogger, ScalarWriter, SmoothedValue, setup_logging
from tvts_tpu.utils.visualizer import RetrievalVis


def test_scalar_writer_jsonl(tmp_path):
    w = ScalarWriter(str(tmp_path), flush_every=1)
    w("loss", 1.5, step=1)
    w("loss", 1.2, step=2)
    w.close()
    lines = [json.loads(l) for l in
             open(tmp_path / "scalars.jsonl").read().splitlines()]
    tags = [l["tag"] for l in lines]
    assert "loss" in tags and "steps_per_sec" in tags
    losses = [l for l in lines if l["tag"] == "loss"]
    assert losses[0]["value"] == 1.5 and losses[1]["step"] == 2


def test_smoothed_value_and_metric_logger():
    sv = SmoothedValue(window_size=3)
    for v in (1.0, 2.0, 3.0, 4.0):
        sv.update(v)
    assert sv.avg == 3.0          # window = (2, 3, 4)
    assert sv.global_avg == 2.5
    ml = MetricLogger()
    ml.update(loss=1.0, acc=0.5)
    ml.update(loss=0.5)
    assert "loss" in str(ml) and "acc" in str(ml)
    out = list(ml.log_every(range(5), print_freq=2, header="t"))
    assert out == list(range(5))


def test_setup_logging_creates_file(tmp_path):
    logger = setup_logging(str(tmp_path), name="t_test", verbosity=1)
    logger.info("hello")
    for h in logger.handlers:
        h.flush()
    assert (tmp_path / "info.log").exists()
    assert "hello" in (tmp_path / "info.log").read_text()


def test_retrieval_vis_writes_html(tmp_path):
    vis = RetrievalVis("exp", str(tmp_path), num_samples=2)
    sims = np.array([[0.9, 0.1, 0.2], [0.3, 0.8, 0.1]], dtype=np.float32)
    meta = {"paths": ["a.mp4", "b.mp4", "c.mp4"],
            "raw_captions": ["cap a", "cap b"]}
    out = vis.visualize_ranking(sims, epoch=1, meta=meta, topk=2)
    html = open(out).read()
    assert "cap a" in html and "a.mp4" in html
    assert "GT rank: 1" in html
    # gated off when epoch not on the frequency
    vis2 = RetrievalVis("exp", str(tmp_path), vis_vid_freq=2)
    assert vis2.visualize_ranking(sims, epoch=1, meta=meta) is None


def test_tb_event_file_roundtrip(tmp_path):
    """EventWriter produces CRC-valid TFRecord Event protos that parse back."""
    from tvts_tpu.utils.tb_events import EventWriter, read_events

    w = EventWriter(str(tmp_path))
    w.add_scalar("loss_train_0", 1.5, 10)
    w.add_scalar("val_loss_0", 0.25, 10)
    w.add_scalar("loss_train_0", 1.25, 20)
    w.close()
    got = read_events(w.path)
    assert got == [(10, "loss_train_0", 1.5), (10, "val_loss_0", 0.25),
                   (20, "loss_train_0", 1.25)]


def test_scalar_writer_tensorboard_sink(tmp_path):
    import glob

    from tvts_tpu.utils.logging import ScalarWriter
    from tvts_tpu.utils.tb_events import read_events

    w = ScalarWriter(str(tmp_path), tensorboard=True)
    w("loss", 3.0, 1)
    w.close()
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    assert (1, "loss", 3.0) in read_events(files[0])
