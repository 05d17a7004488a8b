"""v1 end-to-end: YTT per-tube masks -> WordPiece tokenize -> TVTSv1 train step."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax  # noqa: E402

from tests.test_datasets import ytt_tree  # noqa: F401,E402
from tests.test_wordpiece import VOCAB  # noqa: E402
from tvts_tpu.data.loader import ShardedLoader  # noqa: E402
from tvts_tpu.data.ytt import YTTemporal  # noqa: E402
from tvts_tpu.models.distilbert import DistilBertConfig  # noqa: E402
from tvts_tpu.models.tvts_v1 import TVTSv1, TVTSv1Config  # noqa: E402
from tvts_tpu.train.step import create_train_state, make_train_step  # noqa: E402
from tvts_tpu.train.trainer import prepare_batch, wordpiece_tokenize_fn  # noqa: E402

import optax  # noqa: E402


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    # include the synthetic YTT words (w0..w59)
    extra = [f"w{i}" for i in range(60)] + [f"##{i}" for i in range(10)]
    p.write_text("\n".join(VOCAB + extra) + "\n")
    return str(p)


def test_v1_train_step_on_ytt(ytt_tree, vocab_file):  # noqa: F811
    data_dir, meta_root = ytt_tree
    cfg = TVTSv1Config(
        img_size=64, patch_size=16, embed_dim=64, depth=2, heads=4,
        num_frames=4, tubelet_size=2, projection_dim=32, sort_heads=4,
        mask_ratio=0.5, max_text_len=16,
        text=DistilBertConfig(vocab_size=len(VOCAB) + 70,
                              max_position_embeddings=32, dim=64,
                              hidden_dim=128, n_layers=2, n_heads=4))

    ds = YTTemporal("YTTemporal", {}, {"num_frames": 1, "input_res": 64},
                    data_dir, split="train", meta_root=meta_root,
                    patches_per_frame=cfg.patches_per_frame,
                    mask_ratio=cfg.mask_ratio, per_tube_masks=cfg.n_tubes)
    loader = ShardedLoader(ds, batch_size=2, shuffle=False, num_workers=0,
                           process_index=0, num_processes=1)
    raw = next(iter(loader))
    assert raw["keep_ind"].shape == (2, cfg.n_tubes, cfg.n_keep)

    batch = prepare_batch(raw, tokenize_fn=wordpiece_tokenize_fn(vocab_file, 16))
    assert batch["text_ids"].shape == (8, 16)
    assert batch["attention_mask"].shape == (8, 16)

    model = TVTSv1(cfg)
    params = model.init(jax.random.PRNGKey(0), batch["video"][:1],
                        batch["text_ids"][:4], batch["attention_mask"][:4],
                        batch["keep_ind"][:1])["params"]
    tx = optax.adamw(1e-3)
    state = create_train_state(params, tx)
    step = make_train_step(model, tx, donate=False)
    losses = []
    for _ in range(3):
        state, aux = step(state, batch)
        losses.append(float(aux["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert float(aux["loss_ce"]) > 0  # sort loss active (4 clips)
