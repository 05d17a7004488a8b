"""Fused-kernel mode resolution: config keys + env overrides + per-arch tables.

The reference drives every training knob through its JSON config
(/root/reference/v2/parse_config_dist_multi.py:73-98); round-3 left the
Pallas kernel modes env-var-only, so a config file could not reproduce the
measured-best run. This module makes `trainer.kernels.*` first-class config
keys while keeping the TVTS_* env vars as the highest-priority override
(handy for sweeps — tools/train_bench.py uses them).

Resolution order (highest wins):
    1. TVTS_* environment variables
    2. explicit keys in the config's ``trainer.kernels`` section
    3. the per-arch preset table (``preset`` key: "default" or "best")

Per-arch tables (PERF.md decision tables, round 3):

    arch         preset    space_mode   sfpp  time_mode   save  notes
    -----------  --------  -----------  ----  ----------  ----  -------------------------
    TVTSv2_B_16  default   pallas_v10r  3     pallas      yes   memory-neutral, 90.5 c/s
    TVTSv2_B_16  best      pallas_v10   4     pallas_tps  yes   100.8 c/s @ B=20 (+~1 GB HBM probs saves; flash-delta bwds r4)
    TVTSv2_B_32  default   pallas_v2    -     pallas      yes   N=49 lanes pad d-major; row v2 wins
    TVTSv2_B_32  best      pallas_v2    -     pallas      yes   same (no probs-save win measured yet)
    TVTSv2_H_14  default   pallas       -     xla         no    fused time MEASURED slower at D=1280 (PERF r4)
    TVTSv2_H_14  best      pallas       -     xla         no    same (fused space hybrid, 12.08 c/s)

Round 4 note: the v2 time backward now FITS at D=1280 (time_vmem_mb=120,
time_chunk<=32 — the 100 MB ceiling was a soft compiler budget), but it
measures 63.8 ms vs 57.5 for xla+remat per 8-chain (tools/h14_time_probe.py),
so H/14 keeps time_mode="xla" on the merits, not on a compile blocker.

Clamp-safety rule (round 5): the extraction default smv="cp" clamps attention
logits at SMV_CLAMP=70 — exact only while every logit <= 70. Before trusting
it on a NEW checkpoint, run ``python tools/logit_audit.py --arch <arch>
--checkpoint <ckpt>``; if any layer's max logit exceeds 64 (the margin), set
``trainer.kernels.smv = "pvones"`` / ``TVTS_V9_SMV=pvones`` — exact at any
logit magnitude for ~9% extraction throughput. Fresh-init B/16 audits far
below the margin (PERF.md round 5); training paths always pin exact variants.
"""

from __future__ import annotations

import os

# kwargs accepted by ops.fused_forward.make_fused_train_apply, with the
# config-key spelling (sfpp/scan) and the TVTS_* env override for each.
_KEYS = (
    # (kwarg,        config key,   env var,           parse)
    ("space_mode", "space_mode", "TVTS_SPACE_MODE", str),
    ("time_mode", "time_mode", "TVTS_TIME_MODE", str),
    ("mlp_mode", "mlp_mode", "TVTS_MLP_MODE", str),
    ("layout", "layout", "TVTS_LAYOUT", str),
    ("space_fpp", "sfpp", "TVTS_SFPP", lambda s: int(s) or None),
    ("time_chunk", "time_chunk", "TVTS_TIME_CHUNK", int),
    ("save_acts", "save_acts", "TVTS_SAVE_ACTS", lambda s: s == "1"),
    ("scan_blocks", "scan", "TVTS_SCAN", lambda s: s == "1"),
    ("time_vmem_mb", "time_vmem_mb", "TVTS_TIME_VMEM_MB", int),
    # softmax-variant knob for the v9/v10 space kernels (PERF.md round 4:
    # MXU-offloaded denominator / max-free clamp softmax). None defers to
    # the kernel wrappers' own defaults, which are asymmetric on purpose:
    # extraction (v9) uses "cp" (clamp-shift — exact while logits <= 70,
    # true at inference scale), training (v10) uses "pvones" (exact
    # max-shift at any logit magnitude).
    ("smv", "smv", "TVTS_V9_SMV", str),
    # text-tower attention sub-path: "xla" (flax module) or "pallas" (fused
    # causal-attention kernel, ops/pallas_text_attention.py — kills the
    # [B,H,S,S] HBM softmax round trips; PERF.md round 5)
    ("text_mode", "text_mode", "TVTS_TEXT_MODE", str),
    # sort-head attention sub-path: "xla" or "pallas" (the same fused
    # kernel family, causal=False, eps 1e-6 — kills the [B,H,~1181,~1181]
    # HBM probs traffic)
    ("sort_mode", "sort_mode", "TVTS_SORT_MODE", str),
    # interpret=True runs the Pallas kernels via the interpreter (CPU-device
    # test runs — the CLI smoke tests drive the production script on the
    # 8-virtual-CPU mesh this way; never set on real TPU runs)
    ("interpret", "interpret", "TVTS_INTERPRET", lambda s: s == "1"),
)

_BASE = dict(space_mode="pallas_v10r", time_mode="pallas", mlp_mode="xla",
             layout="row", space_fpp=None, time_chunk=128, save_acts=True,
             scan_blocks=False, time_vmem_mb=100, smv=None,
             text_mode="xla", sort_mode="xla", interpret=False)

# Memory-neutral defaults (safe at any measured batch).
KERNEL_DEFAULTS = {
    "TVTSv2_B_16": dict(_BASE),
    "TVTSv2_B_32": dict(_BASE, space_mode="pallas_v2", time_chunk=64),
    # H/14 hybrid per the 12.08 clips/s recipe (PERF r3 late): space v2
    # flash-recompute ("pallas"), NOT v10r — the v10r frame batching at
    # D=1280/B=8 HBM-OOMs a sustained run (r4) and measured only a wash
    # (11.94) as a single step
    "TVTSv2_H_14": dict(_BASE, space_mode="pallas", time_mode="xla",
                        save_acts=False),
}

# Measured-best (PERF.md): may spend HBM on probs saves. Round 5: the
# fused text tower (text_mode="pallas" + the callers' text_tune_from) is
# a measured win at B/16 (105.4 -> 106.7 at B=20) and H/14 (12.01 ->
# 12.28 at B=8); a wash at B/32 (118.55 -> 118.85, inside the noise band)
# where the N=49 tower dominates — left "xla" there. The fused sort head
# (sort_mode="pallas") adds 106.7 -> 108.6 at B/16 B=20.
KERNEL_BEST = {
    "TVTSv2_B_16": dict(_BASE, space_mode="pallas_v10", space_fpp=4,
                        time_mode="pallas_tps", text_mode="pallas",
                        sort_mode="pallas"),
    "TVTSv2_B_32": dict(_BASE, space_mode="pallas_v2", time_chunk=64),
    "TVTSv2_H_14": dict(_BASE, space_mode="pallas", time_mode="xla",
                        save_acts=False, text_mode="pallas"),
}


def resolve_kernel_config(arch: str, kernels_cfg: dict | None = None,
                          env: dict | None = None) -> dict:
    """Resolve the fused-kernel kwargs for ``arch``.

    ``kernels_cfg`` is the config's ``trainer.kernels`` section (may be
    None); ``env`` defaults to ``os.environ``. Returns kwargs for
    ``make_fused_train_apply`` (space_mode/time_mode/mlp_mode/layout/
    space_fpp/time_chunk/save_acts/scan_blocks).
    """
    env = os.environ if env is None else env
    kernels_cfg = kernels_cfg or {}
    preset = kernels_cfg.get("preset", "default")
    if preset not in ("default", "best"):
        raise ValueError(f"trainer.kernels.preset must be 'default' or "
                         f"'best', got {preset!r}")
    table = KERNEL_BEST if preset == "best" else KERNEL_DEFAULTS
    out = dict(table.get(arch, _BASE))
    for kwarg, cfg_key, env_var, parse in _KEYS:
        if cfg_key in kernels_cfg:
            val = kernels_cfg[cfg_key]
            out[kwarg] = parse(str(val)) if isinstance(val, str) else val
            if kwarg == "space_fpp" and val in (0, "0"):
                out[kwarg] = None
        if env_var in env:
            out[kwarg] = parse(env[env_var])
    return out
