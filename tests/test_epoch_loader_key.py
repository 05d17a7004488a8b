"""trainer.epoch_loader config key: which loader defines len_epoch.

Replaces reliance on the reference's implicit convention (the YT-named loader
defines the epoch, v2/trainer/trainer.py:76-79) with an explicit designation;
the heuristic remains the default for reference-config compatibility.
"""

import pytest

from tvts_tpu.train.trainer import Trainer


class _FakeDS:
    def __init__(self, name):
        self.dataset_name = name


class _FakeLoader:
    def __init__(self, name, n):
        self.dataset = _FakeDS(name)
        self._n = n
        self.batch_size = 2
        self.num_processes = 1

    def __len__(self):
        return self._n


def _trainer(loaders, epoch_loader=None):
    t = Trainer.__new__(Trainer)
    t.data_loaders = loaders
    t.max_samples_per_epoch = None
    t.epoch_loader = epoch_loader
    return t


def test_default_yt_heuristic():
    t = _trainer([_FakeLoader("WebVid", 7), _FakeLoader("YTTemporal", 3)])
    assert t._len_epoch() == 3


def test_default_falls_back_to_first():
    t = _trainer([_FakeLoader("WebVid", 7), _FakeLoader("CC3M", 3)])
    assert t._len_epoch() == 7


def test_index_designation():
    t = _trainer([_FakeLoader("WebVid", 7), _FakeLoader("CC3M", 3)],
                 epoch_loader=1)
    assert t._len_epoch() == 3


def test_name_designation():
    t = _trainer([_FakeLoader("WebVid", 7), _FakeLoader("CC3M", 3)],
                 epoch_loader="CC3M")
    assert t._len_epoch() == 3


def test_unknown_name_raises():
    t = _trainer([_FakeLoader("WebVid", 7)], epoch_loader="Nope")
    with pytest.raises(ValueError, match="matches no loader"):
        t._len_epoch()
