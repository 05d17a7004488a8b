import numpy as np

from tvts_tpu.data.loader import ShardedLoader, default_collate


class ToyDataset:
    def __init__(self, n=32, n_clips=4):
        self.n = n
        self.n_clips = n_clips

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {
            "video": np.full((2, 3, 4, 4), i, dtype=np.float32),
            "text": [f"clip{c}_of_{i}" for c in range(self.n_clips)],
            "label": np.arange(self.n_clips, dtype=np.int32),
            "keep_ind": np.arange(2, dtype=np.int32),
            "meta": {"idx": i},
        }


def test_collate_text_clip_major():
    batch = default_collate([ToyDataset()[0], ToyDataset()[1]])
    assert batch["video"].shape == (2, 2, 3, 4, 4)
    assert len(batch["text"]) == 4          # clip-major
    assert batch["text"][0] == ["clip0_of_0", "clip0_of_1"]
    assert batch["text"][3] == ["clip3_of_0", "clip3_of_1"]
    assert batch["label"].shape == (2, 4)


def test_sharding_partitions_data():
    ds = ToyDataset(n=32)
    seen = []
    for rank in range(4):
        loader = ShardedLoader(ds, batch_size=2, shuffle=False, num_workers=0,
                               process_index=rank, num_processes=4)
        assert len(loader) == 4
        for batch in loader:
            seen.extend(batch["video"][:, 0, 0, 0, 0].astype(int).tolist())
    assert sorted(seen) == list(range(32))


def test_epoch_reshuffle_deterministic():
    ds = ToyDataset(n=16)
    loader = ShardedLoader(ds, batch_size=4, shuffle=True, num_workers=0,
                           process_index=0, num_processes=1, seed=7)
    loader.set_epoch(0)
    e0 = [b["video"][:, 0, 0, 0, 0].astype(int).tolist() for b in loader]
    loader.set_epoch(1)
    e1 = [b["video"][:, 0, 0, 0, 0].astype(int).tolist() for b in loader]
    loader.set_epoch(0)
    e0b = [b["video"][:, 0, 0, 0, 0].astype(int).tolist() for b in loader]
    assert e0 == e0b
    assert e0 != e1


def test_threaded_matches_sync():
    ds = ToyDataset(n=24)
    kw = dict(batch_size=3, shuffle=True, seed=1, process_index=0, num_processes=1)
    sync = [b["video"].sum() for b in ShardedLoader(ds, num_workers=0, **kw)]
    thr = [b["video"].sum() for b in ShardedLoader(ds, num_workers=4, **kw)]
    assert sync == thr


def test_val_split():
    from tvts_tpu.data.loader import make_val_split

    ds = ToyDataset(n=20)
    train, val = make_val_split(ds, val_fraction=0.25, seed=1)
    assert len(train) == 15 and len(val) == 5
    all_idx = sorted(np.concatenate([train.indices, val.indices]).tolist())
    assert all_idx == list(range(20))
    assert train.n_clips == 4  # attribute passthrough
    # deterministic given seed
    t2, v2 = make_val_split(ds, val_fraction=0.25, seed=1)
    np.testing.assert_array_equal(val.indices, v2.indices)


def test_string_text_collate():
    samples = [{"video": np.zeros((1,), np.float32), "text": "a cat"},
               {"video": np.ones((1,), np.float32), "text": "a dog"}]
    batch = default_collate(samples)
    assert batch["text"] == ["a cat", "a dog"]


def test_process_pool_loader_matches_threaded():
    ds = ToyDataset(n=12)
    kw = dict(batch_size=3, shuffle=True, seed=2, process_index=0, num_processes=1)
    thr = [b["video"].sum() for b in ShardedLoader(ds, num_workers=2, **kw)]
    proc = [b["video"].sum() for b in ShardedLoader(ds, num_workers=2,
                                                    use_processes=True, **kw)]
    assert thr == proc
