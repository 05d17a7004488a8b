"""utils/profiling: timeline trace artifacts + result-fetching step timer
(SURVEY §5 tracing/profiling subsystem; strictly additive vs the reference,
which ships no profiler)."""

import jax
import jax.numpy as jnp
import numpy as np

from tvts_tpu.utils.profiling import StepTimer, annotate, trace, trace_artifacts


def test_trace_produces_xplane(tmp_path):
    log_dir = str(tmp_path / "prof")

    @jax.jit
    def f(x):
        return jnp.sum(x * x)

    with trace(log_dir):
        with annotate("probe-step"):
            float(f(jnp.arange(1024.0)))
    arts = trace_artifacts(log_dir)
    assert arts, "no .xplane.pb written by jax.profiler.trace on CPU"
    assert arts[0].endswith(".xplane.pb")


def test_trace_survives_failing_backend(tmp_path, monkeypatch):
    """The epoch loop must not die when the backend cannot profile
    (the tunnel case)."""
    def boom(_):
        raise RuntimeError("profiling unsupported on this backend")

    monkeypatch.setattr(jax.profiler, "trace", boom)
    with trace(str(tmp_path / "p2")):
        pass  # no raise


def test_step_timer_warmup_and_summary():
    t = StepTimer(warmup=2)
    for i in range(6):
        t.mark(jnp.float32(i))
    s = t.summary()
    # 6 marks = 5 intervals, the first 2 steps warm up -> 3 recorded
    assert s["steps"] == 3
    assert s["min_s"] <= s["p50_s"] <= s["max_s"]
    assert np.isclose(s["steps_per_s"], s["steps"] / sum(t.times))
    assert StepTimer().summary() == {"steps": 0}


def test_trainer_profile_hook(tmp_path):
    """Trainer traces [start, stop) of the first epoch and closes the trace
    even when the epoch is shorter than the window (profile_steps=(0, 100)
    over a 2-step epoch exercises the short-epoch close path)."""
    from tests.test_integration import tiny_real_vocab_config
    from tvts_tpu.models import TVTSv2
    from tvts_tpu.models.factory import init_params
    from tvts_tpu.train.optim import OptimizerConfig, make_optimizer
    from tvts_tpu.train.trainer import Trainer

    cfg = tiny_real_vocab_config()
    model = TVTSv2(cfg)
    params = init_params(model, cfg)

    # 2-batch synthetic loader: the Trainer only needs __len__/__iter__ and
    # set_epoch/batch_size/num_processes attributes
    rng = np.random.default_rng(0)
    B = 2
    batches = [{
        "video": rng.normal(size=(B, cfg.vision.num_frames, 3, 64, 64))
        .astype(np.float32),
        "text": [[f"clip {j} of sample {i}" for j in range(cfg.num_clips)]
                 for i in range(B)],
        "keep_ind": np.stack([
            np.sort(rng.permutation(16)[:8]) for _ in range(B)]
        ).astype(np.int32),
        "label": np.stack([rng.permutation(cfg.num_clips)
                           for _ in range(B)]).astype(np.int32),
    } for _ in range(2)]

    class FakeLoader:
        batch_size = B
        num_processes = 1

        class dataset:
            dataset_name = "YTTemporal"

        def __len__(self):
            return len(batches)

        def __iter__(self):
            return iter(batches)

        def set_epoch(self, e):
            pass

    loader = FakeLoader()
    ocfg = OptimizerConfig(lr_new=1e-3, steps_per_epoch=2,
                           text_layers=cfg.text.layers)
    tx = make_optimizer(params, ocfg)
    trainer = Trainer(model, params, tx, [loader], epochs=1, log_step=10,
                      context_length=cfg.text.context_length,
                      profile_dir=str(tmp_path / "tb"),
                      profile_steps=(0, 100))
    log = trainer.train()
    assert np.isfinite(log["loss_0"])
    assert trace_artifacts(str(tmp_path / "tb"))
