#!/usr/bin/env python
"""HLO cost-analysis workflow (PERF.md: 'a real profile is the blocker').

jax.profiler doesn't complete over the remote tunnel and client-side XLA_FLAGS
(xla_dump_to) are overridden by the axon terminal, but `lowered.compile()` still
returns the OPTIMIZED module text + aggregate cost analysis from the remote
compile. This tool compiles the bench graph(s), saves the optimized HLO, and
ranks fusions/ops by a byte-traffic estimate computed from the instruction
shapes — enough to locate layout inflation and fusion-boundary traffic.

Usage:
  python tools/hlo_cost.py [--mode fused|xla|both] [--batch 32] [--out /tmp/hlo]
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


_SHAPE_RE = re.compile(r"(bf16|f32|f16|s32|u32|s8|u8|pred|s64|f64)\[([\d,]*)\]")
_BYTES = {"bf16": 2, "f16": 2, "f32": 4, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
          "pred": 1, "s64": 8, "f64": 8}

# TPU (8,128) tiling for f32 / (16,128) for bf16: physical size of a tensor is
# inflated when trailing dims are much smaller than a tile.
_TILE = {"f32": (8, 128), "bf16": (16, 128), "f16": (16, 128)}


def shape_bytes(dtype: str, dims: list[int], tiled: bool) -> int:
    if not dims:
        return _BYTES.get(dtype, 4)
    if not tiled or dtype not in _TILE or len(dims) == 1:
        return int(np.prod(dims)) * _BYTES.get(dtype, 4)
    sub, lane = _TILE[dtype]
    phys = list(dims)
    phys[-1] = -(-phys[-1] // lane) * lane
    phys[-2] = -(-phys[-2] // sub) * sub
    return int(np.prod(phys)) * _BYTES.get(dtype, 4)


def parse_instruction_shapes(line: str) -> list[tuple[str, list[int]]]:
    out = []
    for m in _SHAPE_RE.finditer(line):
        dims = [int(x) for x in m.group(2).split(",") if x] if m.group(2) else []
        out.append((m.group(1), dims))
    return out


def rank_hlo(text: str, top: int = 40) -> list[dict]:
    """Rank top-level (entry-computation) instructions by logical+physical bytes."""
    rows = []
    in_entry = False
    fusion_bodies: dict[str, int] = collections.defaultdict(int)
    for line in text.splitlines():
        s = line.strip()
        if s.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and s == "}":
            in_entry = False
        if not in_entry or "=" not in s:
            continue
        shapes = parse_instruction_shapes(s)
        if not shapes:
            continue
        opm = re.match(
            r"(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*\(?\s*\w+\[[^\]]*\][^\s]*"
            r"(?:,\s*\w+\[[^\]]*\][^\s]*)*\)?\s+([\w\-]+)\(", s)
        name = opm.group(1) if opm else "?"
        op = opm.group(2) if opm else "?"
        logical = sum(shape_bytes(d, dims, tiled=False) for d, dims in shapes)
        physical = sum(shape_bytes(d, dims, tiled=True) for d, dims in shapes)
        rows.append({"name": name[:60], "op": op, "logical_mb": logical / 1e6,
                     "physical_mb": physical / 1e6,
                     "inflation": physical / max(logical, 1)})
    rows.sort(key=lambda r: -r["physical_mb"])
    return rows[:top]


def build_graph(mode: str, batch: int):
    import jax
    import jax.numpy as jnp

    from tvts_tpu.models import tvtsv2_b_16
    from tvts_tpu.models.space_time_vit import SpaceTimeViT

    cfg = tvtsv2_b_16().eval_config().vision
    model = SpaceTimeViT(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(batch, cfg.num_frames, 3,
                                         cfg.input_resolution,
                                         cfg.input_resolution)).astype(np.float32))
    keep = jnp.asarray(np.tile(np.arange(cfg.patches_per_frame, dtype=np.int32),
                               (batch, 1)))
    params = model.init(jax.random.PRNGKey(0), video, keep)["params"]

    if mode == "fused":
        from tvts_tpu.ops.fused_forward import space_time_vit_fused_forward

        def fn(params, video, keep):
            return space_time_vit_fused_forward(params, cfg, video, keep)[0]
    else:
        def fn(params, video, keep):
            return model.apply({"params": params}, video, keep)[0]
    return fn, (params, video, keep)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both", choices=["fused", "xla", "both"])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--out", default="/tmp/hlo")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax

    for mode in (["fused", "xla"] if args.mode == "both" else [args.mode]):
        fn, fargs = build_graph(mode, args.batch)
        lowered = jax.jit(fn).lower(*fargs)
        compiled = lowered.compile()
        text = compiled.as_text()
        path = os.path.join(args.out, f"bench_{mode}_b{args.batch}.hlo")
        with open(path, "w") as f:
            f.write(text)
        print(f"\n=== {mode} (optimized HLO -> {path}, {len(text)} bytes) ===")
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            for k in ("flops", "bytes accessed", "transcendentals",
                      "optimal_seconds"):
                if k in ca:
                    print(f"  cost_analysis[{k}] = {ca[k]:.4g}")
        except Exception as e:  # noqa: BLE001 — remote backends may not support it
            print(f"  cost_analysis unavailable: {e}")
        print(f"  top {args.top} entry instructions by physical bytes "
              f"(tile-inflated):")
        print(f"  {'op':<14} {'phys MB':>9} {'logical MB':>11} {'infl':>5}  name")
        for r in rank_hlo(text, args.top):
            print(f"  {r['op']:<14} {r['physical_mb']:>9.1f} "
                  f"{r['logical_mb']:>11.1f} {r['inflation']:>5.2f}  {r['name']}")


if __name__ == "__main__":
    main()
