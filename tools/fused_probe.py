import json, shutil, sys, time
import ray
ncpu = int(sys.argv[1]); bs = int(sys.argv[2])
ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import glob
import ray.data as rd
from ocr_ray.pipelines.extract_pipeline import extract_and_commit, extract_from_path
inp = "/dev/shm/ocr_ray_fixtures/transcripts_s42_c60000"
_ = extract_from_path(sorted(glob.glob(inp+"/*.parquet"))[0]).materialize()
out = f"/dev/shm/fp_{ncpu}_{bs}"
shutil.rmtree(out, ignore_errors=True)
t0 = time.monotonic()
m = extract_and_commit(inp, out, num_partitions=max(8, ncpu), resume=False,
                       finalize_num_cpus=1, fanout_batch_size=bs)
wall = time.monotonic() - t0
rows = sum(m.column("rows_out").to_pylist())
print(json.dumps({"ncpu": ncpu, "bs": bs, "wall": round(wall,1), "rps": round(rows/wall)}))
shutil.rmtree(out, ignore_errors=True)
ray.shutdown()
