"""Rescale a BENCH json line by its CPU-credit probe calibration.

This sandbox's CPU is burst-credit throttled: the SAME code measures the
sf0.1 headline anywhere from 7.8 s (probe ~10-12 Mops/s) to 42.6 s (probe
~6.6) with zero code change (BASELINE.md, "Reading BENCH wall times").
``bench.py`` records a single-core integer-spin probe before/after every
run; this tool divides every wall time by (NOMINAL / probe_before) to give
fresh-box-equivalent numbers. The correction is conservative — the
all-core throttle under Ray load is deeper than the single-core probe
shows.

Usage:  python tools/normalize_bench.py BENCH_r02.json
"""

from __future__ import annotations

import json
import sys

NOMINAL_MOPS = 12.4  # fresh-box probe (BASELINE.md calibration table)


def normalize(d: dict) -> dict:
    probe = d.get("cpu_probe_mops_before")
    if not probe:
        raise SystemExit("no cpu_probe_mops_before in input; cannot calibrate")
    scale = probe / NOMINAL_MOPS  # < 1 on a drained box
    out = dict(d)
    out["value_normalized"] = round(d["value"] * scale, 3)
    if "turns_per_sec" in d:
        out["turns_per_sec_normalized"] = round(d["turns_per_sec"] / scale, 1)
    out["queries_normalized"] = {
        k: round(v * scale, 3) for k, v in d.get("queries", {}).items()
    }
    out["calibration"] = {
        "probe_before_mops": probe,
        "nominal_mops": NOMINAL_MOPS,
        "scale_applied": round(scale, 4),
        "note": "walls multiplied by probe/nominal; conservative (all-core "
        "throttle under load exceeds the single-core probe)",
    }
    return out


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else "/dev/stdin"
    with open(path) as f:
        raw = f.read().strip()
    try:
        d = json.loads(raw)  # whole file (incl. pretty-printed wrappers)
    except json.JSONDecodeError:
        d = json.loads(raw.splitlines()[-1])  # one-JSON-line-per-run logs
    if "tail" in d and "value" not in d:  # driver wrapper format
        d = json.loads(d["tail"].strip().splitlines()[-1])
    print(json.dumps(normalize(d)))
