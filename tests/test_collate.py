"""MLM-style collate parity (reference base_dataset_yt.py:183-269 semantics)."""

import numpy as np

from tvts_tpu.data.collate import MLMCollator, mlm_collate


def _enc(ids):
    return {"input_ids": list(ids), "attention_mask": [1] * len(ids)}


def test_mlm_collator_semantics():
    rng = np.random.default_rng(0)
    coll = MLMCollator(vocab_size=1000, mask_token_id=103,
                       special_ids=(101, 102, 0), mlm_probability=0.15,
                       rng=rng)
    base = [101] + list(range(200, 200 + 60)) + [102]
    out = coll([_enc(base) for _ in range(200)])
    ids, labels = out["input_ids"], out["labels"]
    assert ids.shape == labels.shape == (200, 62)

    orig = np.tile(np.asarray(base), (200, 1))
    selected = labels != -100
    # specials (CLS/SEP) are never selected
    assert not selected[:, 0].any() and not selected[:, -1].any()
    # labels hold the ORIGINAL token on selected positions
    assert (labels[selected] == orig[selected]).all()
    # unselected positions keep their token
    assert (ids[~selected] == orig[~selected]).all()
    # selection rate ~15%
    rate = selected[:, 1:-1].mean()
    assert 0.12 < rate < 0.18, rate
    # ~80% of selected become [MASK]
    mask_rate = (ids[selected] == 103).mean()
    assert 0.72 < mask_rate < 0.88, mask_rate
    # some selected positions keep the original token (the 10% branch)
    assert (ids[selected] == labels[selected]).any()


def test_mlm_collate_images_and_text():
    rng = np.random.default_rng(1)
    coll = MLMCollator(vocab_size=100, mask_token_id=4, special_ids=(1, 2, 0),
                       rng=rng)
    T = 3
    batch = [
        {"image": [np.ones((T, 3, 6, 5), np.float32)],
         "text": ("hello", _enc([1, 10, 11, 2]))},
        {"image": [np.full((T, 3, 4, 7), 2.0, np.float32)],
         "text": ("world", _enc([1, 12, 13, 14, 2]))},
    ]
    out = mlm_collate(batch, num_frames=T, mlm_collator=coll)

    # images zero-padded to batch max H/W into one [B,T,3,H,W] per view
    img = out["image"][0]
    assert img.shape == (2, T, 3, 6, 7)
    assert img[0, :, :, :6, :5].min() == 1.0 and img[0, :, :, :, 5:].max() == 0
    assert img[1, :, :, :4, :7].min() == 2.0 and img[1, :, :, 4:, :].max() == 0

    # text keys: raw list + ids/labels/mlm variants/masks
    assert out["text"] == ["hello", "world"]
    assert out["text_ids"].shape == out["text_ids_mlm"].shape == (2, 5)
    assert (out["text_labels"] == -100).all()
    assert (out["text_masks"] == np.array([[1, 1, 1, 1, 0],
                                           [1, 1, 1, 1, 1]])).all()
    # unpadded ids round-trip
    assert out["text_ids"][0, :4].tolist() == [1, 10, 11, 2]
    assert out["text_ids"][1].tolist() == [1, 12, 13, 14, 2]
