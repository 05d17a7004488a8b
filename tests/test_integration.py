"""End-to-end integration: tiny-model pretraining over the synthetic YTT tree,
zero-shot eval harness over synthetic datasets, checkpoint round-trip."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tests.test_datasets import msrvtt_tree, write_video, ytt_tree  # noqa: F401,E402
from tvts_tpu.data.datasets import MSRVTT  # noqa: E402
from tvts_tpu.data.loader import ShardedLoader  # noqa: E402
from tvts_tpu.data.ytt import YTTemporal  # noqa: E402
from tvts_tpu.models.configs import SortConfig, TextConfig, TVTSv2Config, VisionConfig  # noqa: E402
from tvts_tpu.models.factory import init_params  # noqa: E402
from tvts_tpu.models.tvts_v2 import TVTSv2  # noqa: E402
from tvts_tpu.train.optim import OptimizerConfig, make_optimizer  # noqa: E402
from tvts_tpu.train.trainer import Trainer, prepare_batch  # noqa: E402
from tvts_tpu.utils.checkpoint import CheckpointManager  # noqa: E402


def tiny_real_vocab_config(mask_ratio=0.5):
    """Tiny towers but the real CLIP vocab/context so live tokenization works."""
    return TVTSv2Config(
        name="tiny_e2e",
        vision=VisionConfig(input_resolution=64, patch_size=16, width=64, layers=2,
                            heads=4, output_dim=48, num_frames=4,
                            mask_ratio=mask_ratio),
        text=TextConfig(context_length=77, vocab_size=49408, width=64, layers=2,
                        heads=4, output_dim=48),
        sort=SortConfig(embed_dim=48, num_heads=4, num_classes=4),
    )


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_real_vocab_config()
    model = TVTSv2(cfg)
    params = init_params(model, cfg)
    return cfg, model, params


def test_pretrain_epoch_on_ytt(ytt_tree, tiny_model, tmp_path):  # noqa: F811
    data_dir, meta_root = ytt_tree
    cfg, model, params = tiny_model
    ds = YTTemporal("YTTemporal", {}, {"num_frames": 1, "input_res": 64},
                    data_dir, split="train", meta_root=meta_root,
                    patches_per_frame=16, mask_ratio=0.5)
    loader = ShardedLoader(ds, batch_size=2, shuffle=True, num_workers=0,
                           process_index=0, num_processes=1)

    ocfg = OptimizerConfig(lr_new=1e-3, lr_clip=1e-4, text_layers=cfg.text.layers,
                           text_tune_layers=1, steps_per_epoch=len(loader))
    tx = make_optimizer(params, ocfg)
    ckpt = CheckpointManager(str(tmp_path / "ckpt"), save_period=1,
                             monitor="min loss_0")
    trainer = Trainer(model, params, tx, [loader], valid_loaders=[],
                      epochs=1, ckpt_manager=ckpt, log_step=1,
                      context_length=cfg.text.context_length)
    log = trainer.train()
    assert np.isfinite(log["loss_0"])
    assert int(trainer.state.step) == len(loader)
    assert ckpt.latest_epoch() == 1

    # checkpoint round-trip
    restored = ckpt.restore("checkpoint-epoch1",
                            {"params": trainer.state.params,
                             "opt_state": trainer.state.opt_state,
                             "step": trainer.state.step})
    a = np.asarray(trainer.state.params["pred_model"]["head"]["kernel"])
    b = np.asarray(restored["params"]["pred_model"]["head"]["kernel"])
    np.testing.assert_array_equal(a, b)

    # resume: a fresh trainer restores state and continues at epoch 2
    trainer2 = Trainer(model, params, tx, [loader], valid_loaders=[],
                       epochs=1, ckpt_manager=ckpt, log_step=10,
                       context_length=cfg.text.context_length)
    assert trainer2.resume() == 2
    assert int(trainer2.state.step) == len(loader)
    c = np.asarray(trainer2.state.params["pred_model"]["head"]["kernel"])
    np.testing.assert_array_equal(a, c)


def test_prepare_batch_ytt_shapes(ytt_tree):  # noqa: F811
    data_dir, meta_root = ytt_tree
    ds = YTTemporal("YTTemporal", {}, {"num_frames": 1, "input_res": 64},
                    data_dir, split="train", meta_root=meta_root,
                    patches_per_frame=16, mask_ratio=0.5)
    loader = ShardedLoader(ds, batch_size=2, shuffle=False, num_workers=0,
                           process_index=0, num_processes=1)
    batch = prepare_batch(next(iter(loader)))
    assert batch["video"].shape == (2, 4, 3, 64, 64)
    assert batch["text_ids"].shape == (8, 77)     # clip-major 4 clips x B=2
    assert batch["labels"].shape == (2, 4)
    assert batch["keep_ind"].shape == (2, 8)


def test_zero_ret_harness(msrvtt_tree, tiny_model):  # noqa: F811
    from tvts_tpu.eval.zero_ret import run_retrieval

    data_dir, meta_root = msrvtt_tree
    cfg, model, params = tiny_model
    ds = MSRVTT("MSRVTT", {}, {"num_frames": 4, "input_res": 64}, data_dir,
                split="test", cut="jsfusion", meta_root=meta_root,
                patches_per_frame=16, mask_ratio=0.5)
    loader = ShardedLoader(ds, batch_size=2, shuffle=False, num_workers=0,
                           process_index=0, num_processes=1, drop_last=False)
    nested, sims = run_retrieval(model, params, loader)
    assert sims.shape == (2, 2)
    assert "R1" in nested["t2v_metrics"]
    assert "R1" in nested["v2t_metrics"]


def test_zero_recognition_harness(msrvtt_tree, tiny_model):  # noqa: F811
    from tvts_tpu.eval.zero_recognition import run_recognition

    data_dir, meta_root = msrvtt_tree
    cfg, model, params = tiny_model

    class LabeledDS(MSRVTT):
        def __getitem__(self, i):
            item = super().__getitem__(i)
            item["label"] = i % 3
            item["text"] = "NULL"
            return item

    ds = LabeledDS("MSRVTT", {}, {"num_frames": 4, "input_res": 64}, data_dir,
                   split="test", cut="jsfusion", meta_root=meta_root,
                   patches_per_frame=16, mask_ratio=0.5)
    loader = ShardedLoader(ds, batch_size=2, shuffle=False, num_workers=0,
                           process_index=0, num_processes=1, drop_last=False)
    res = run_recognition(model, params, loader, ["running", "jumping", "eating"])
    assert 0.0 <= res["top1"] <= 1.0
    assert res["logits"].shape == (2, 3)


def test_feature_extraction(tiny_model, tmp_path):
    from tvts_tpu.eval.feature_extraction import extract_video_feature

    cfg, model, params = tiny_model
    path = str(tmp_path / "demo.mp4")
    write_video(path, n_frames=30, size=80)
    emb = extract_video_feature(model, params, path)
    assert emb.shape == (1, 48)
    assert np.isfinite(emb).all()


def test_feature_extraction_fast_pipeline(tiny_model, tmp_path):
    from tvts_tpu.eval.feature_extraction import extract_video_feature

    cfg, model, params = tiny_model
    path = str(tmp_path / "demo_fast.mp4")
    write_video(path, n_frames=30, size=80)
    slow = extract_video_feature(model, params, path)
    fast = extract_video_feature(model, params, path, fast_pipeline=True)
    assert fast.shape == (1, 48)
    assert np.isfinite(fast).all()
    # both pipelines should land close (bilinear vs PIL resize differ slightly)
    cos = float(np.sum(slow * fast) /
                (np.linalg.norm(slow) * np.linalg.norm(fast)))
    assert cos > 0.98, cos
