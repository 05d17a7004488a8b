#!/usr/bin/env python
"""Sweep bench.py env knobs (fresh process each) and print a ranked table.

Round-3 re-tune: the SFPP/MCHUNK defaults were chosen before the CLS-only
tail landed; re-check the optimum at the current graph.
"""

import itertools
import json
import os
import subprocess
import sys

CONFIGS = [
    {"TVTS_TPU_BENCH_SFPP": s, "TVTS_TPU_BENCH_TCHUNK": t}
    for s, t in itertools.product(["2", "3", "4"], ["128", "256"])
] + [
    {"TVTS_TPU_BENCH_SFPP": "3", "TVTS_TPU_BENCH_MCHUNK": m}
    for m in ["512"]
]

if len(sys.argv) > 1:
    CONFIGS = [json.loads(a) for a in sys.argv[1:]]

results = []
for cfg in CONFIGS:
    env = dict(os.environ, **cfg)
    out = subprocess.run([sys.executable, "bench.py"], env=env,
                         capture_output=True, text=True, timeout=1800)
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    try:
        val = json.loads(line)["value"]
    except Exception:
        val = None
        print(f"FAIL {cfg}: {out.stderr[-500:]}", flush=True)
    results.append((val, cfg))
    print(f"{val} clips/s  {cfg}", flush=True)

print("\n== ranked ==")
for val, cfg in sorted(results, key=lambda r: -(r[0] or 0)):
    print(f"{val} clips/s  {cfg}")
