"""A/B the grouped_scan exchange transports (Ray sort shuffle vs
filesystem fragment fan-out) on the 1M-event timeseries family.

Back-to-back alternating runs in ONE Ray session (the only valid
protocol on this credit-throttled box, per BASELINE.md); prints a
min-of-N table per (query, exchange).

Usage: python tools/gs_exchange_ab.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
        )

    from ocr_ray.ops.timeseries import (
        user_days_gapfilled,
        user_days_locf,
        user_retention_cohorts,
        user_trailing_hour_spend,
    )
    from ocr_ray.sources.bigdocs import ensure_bigevents

    ev1m = ensure_bigevents(1_000_000, seed=7)

    def consume(x) -> int:
        if hasattr(x, "iter_batches"):
            n = 0
            for b in x.iter_batches(batch_size=None, batch_format="pyarrow"):
                n += b.num_rows
            return n
        return len(x)

    queries = {
        "gapfill_1m": user_days_gapfilled,
        "locf_1m": user_days_locf,
        "trailing_hour_1m": user_trailing_hour_spend,
        "retention_1m": user_retention_cohorts,
    }

    results: dict[tuple[str, str], list[float]] = {}
    rowcounts: dict[tuple[str, str], int] = {}
    # warm-up (page cache + worker imports), untimed
    os.environ["OCR_RAY_GS_EXCHANGE"] = "ray"
    consume(user_days_gapfilled(ev1m))
    for rep in range(reps):
        for name, fn in queries.items():
            for mode in ("ray", "fs"):
                os.environ["OCR_RAY_GS_EXCHANGE"] = mode
                t0 = time.monotonic()
                n = consume(fn(ev1m))
                dt = time.monotonic() - t0
                results.setdefault((name, mode), []).append(dt)
                prev = rowcounts.setdefault((name, mode), n)
                assert prev == n, (name, mode, prev, n)
                print(f"rep{rep} {name:>18} {mode:>4} {dt:7.2f}s rows={n}", flush=True)
    os.environ.pop("OCR_RAY_GS_EXCHANGE", None)
    print("\n== min-of-%d ==" % reps)
    for name in queries:
        r = min(results[(name, "ray")])
        f = min(results[(name, "fs")])
        same = rowcounts[(name, "ray")] == rowcounts[(name, "fs")]
        print(
            f"{name:>18}: ray {r:6.2f}s  fs {f:6.2f}s  "
            f"({'fs' if f < r else 'ray'} wins {max(r, f) / min(r, f):.2f}x, rows_equal={same})"
        )
    ray.shutdown()


if __name__ == "__main__":
    main()
