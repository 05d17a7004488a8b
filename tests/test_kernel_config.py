"""trainer.kernels config-key resolution (VERDICT r3 #8).

The measured-best runs (PERF.md) must be reproducible from a config file
alone; TVTS_* env vars stay as the highest-priority sweep override.
"""

from tvts_tpu.ops.kernel_config import (KERNEL_BEST, KERNEL_DEFAULTS,
                                        resolve_kernel_config)


def test_defaults_b16():
    out = resolve_kernel_config("TVTSv2_B_16", None, env={})
    assert out["space_mode"] == "pallas_v10r"
    assert out["time_mode"] == "pallas"
    assert out["mlp_mode"] == "xla"
    assert out["save_acts"] is True


def test_best_preset_reproduces_peak_b16():
    # the 96.8 clips/s setting: v10 fpp=4 + space probs-save + time probs-save
    out = resolve_kernel_config("TVTSv2_B_16", {"preset": "best"}, env={})
    assert out["space_mode"] == "pallas_v10"
    assert out["space_fpp"] == 4
    assert out["time_mode"] == "pallas_tps"


def test_h14_defaults_are_the_hybrid():
    # the 12.08 clips/s recipe (PERF r3 late): v2 flash-recompute space +
    # XLA time + no probs saves; v10r HBM-OOMs sustained runs at D=1280 (r4)
    out = resolve_kernel_config("TVTSv2_H_14", None, env={})
    assert out["space_mode"] == "pallas"
    assert out["time_mode"] == "xla"
    assert out["save_acts"] is False
    best = resolve_kernel_config("TVTSv2_H_14", {"preset": "best"}, env={})
    assert best["space_mode"] == "pallas"


def test_config_keys_override_preset():
    out = resolve_kernel_config(
        "TVTSv2_B_16",
        {"preset": "best", "sfpp": 3, "time_mode": "pallas", "scan": True},
        env={})
    assert out["space_fpp"] == 3
    assert out["time_mode"] == "pallas"
    assert out["scan_blocks"] is True
    assert out["space_mode"] == "pallas_v10"  # preset survives for other keys


def test_env_overrides_config():
    out = resolve_kernel_config(
        "TVTSv2_B_16", {"preset": "best", "sfpp": 3},
        env={"TVTS_SFPP": "6", "TVTS_SPACE_MODE": "pallas_ps",
             "TVTS_SAVE_ACTS": "0"})
    assert out["space_fpp"] == 6
    assert out["space_mode"] == "pallas_ps"
    assert out["save_acts"] is False


def test_sfpp_zero_means_auto():
    out = resolve_kernel_config("TVTSv2_B_16", {"sfpp": 0}, env={})
    assert out["space_fpp"] is None
    out = resolve_kernel_config("TVTSv2_B_16", {}, env={"TVTS_SFPP": "0"})
    assert out["space_fpp"] is None


def test_unknown_arch_falls_back_to_base():
    out = resolve_kernel_config("TVTSv1", None, env={})
    assert out["space_mode"] == "pallas_v10r"


def test_bad_preset_raises():
    import pytest

    with pytest.raises(ValueError):
        resolve_kernel_config("TVTSv2_B_16", {"preset": "fastest"}, env={})


def test_tables_cover_all_archs():
    for table in (KERNEL_DEFAULTS, KERNEL_BEST):
        assert set(table) == {"TVTSv2_B_16", "TVTSv2_B_32", "TVTSv2_H_14"}


def test_preset_kwargs_match_fused_apply_signature():
    """Every key a preset table can emit must be an accepted kwarg of
    make_fused_train_apply — catches preset/signature drift (the round-5
    text_mode/sort_mode additions made this a real hazard)."""
    import inspect

    from tvts_tpu.ops.fused_forward import make_fused_train_apply
    from tvts_tpu.ops.kernel_config import resolve_kernel_config

    accepted = set(inspect.signature(make_fused_train_apply).parameters)
    for arch in ("TVTSv2_B_16", "TVTSv2_B_32", "TVTSv2_H_14"):
        for preset in ("default", "best"):
            kcfg = resolve_kernel_config(arch, {"preset": preset}, env={})
            assert set(kcfg) <= accepted, (arch, preset,
                                           set(kcfg) - accepted)
