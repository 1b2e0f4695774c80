"""N->4N measurement on the 4x input (amortizes the fixed per-run floor)."""
import glob, json, shutil, sys, time

import ray

ncpu = int(sys.argv[1])
ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
from ocr_ray.pipelines.extract_pipeline import extract_and_commit, extract_from_path
from ocr_ray.sources.transcripts import ensure_transcripts

inp = ensure_transcripts(200_000, seed=42, root="/dev/shm/ocr_ray_fixtures")
_ = extract_from_path(sorted(glob.glob(inp + "/*.parquet"))[0]).materialize()  # warm workers
out = f"/dev/shm/sb_{ncpu}"
shutil.rmtree(out, ignore_errors=True)
t0 = time.monotonic()
m = extract_and_commit(inp, out, num_partitions=64, resume=False, finalize_num_cpus=1)
wall = time.monotonic() - t0
rows = sum(m.column("rows_out").to_pylist())
print(json.dumps({"ncpu": ncpu, "wall": round(wall, 1), "rps": round(rows / wall), "rows": rows}))
shutil.rmtree(out, ignore_errors=True)
ray.shutdown()
