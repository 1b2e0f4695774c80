"""One-shot stress run at a larger synthetic scale; prints a JSON line."""
import json, shutil, time

import ray

ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from ocr_ray.pipelines.extract_pipeline import extract_from_path
from ocr_ray.sources.transcripts import ensure_transcripts
from ocr_ray.state.sink import write_partitioned

N = 200_000
t0 = time.monotonic()
inp = ensure_transcripts(N, seed=42, root="/dev/shm/ocr_ray_fixtures")
gen_s = round(time.monotonic() - t0, 1)

out = "/dev/shm/ocr_ray_stress_out"
shutil.rmtree(out, ignore_errors=True)
t0 = time.monotonic()
m = write_partitioned(extract_from_path(inp), out, num_partitions=64, resume=False)
wall = time.monotonic() - t0
rows = sum(m.column("rows_out").to_pylist())
bytes_in = sum(m.column("bytes_in").to_pylist())
print(json.dumps({
    "n_convs": N, "rows": rows, "gen_s": gen_s, "wall_s": round(wall, 1),
    "turns_per_sec": round(rows / wall, 1), "mb_in_per_sec": round(bytes_in / wall / 1e6, 1),
    "gb_in": round(bytes_in / 1e9, 2), "partitions": m.num_rows,
    "n_errors": sum(m.column("n_errors").to_pylist()),
}))
shutil.rmtree(out, ignore_errors=True)
ray.shutdown()
