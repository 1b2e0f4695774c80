"""End-to-end user-surface drive (verify skill recipe)."""
import ray, os, shutil, hashlib
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="error")
from ocr_ray.sources.transcripts import ensure_transcripts
from ocr_ray.pipelines.extract_pipeline import extract_from_path
from ocr_ray.state.sink import write_partitioned
import ray.data as rd

src = ensure_transcripts(100, seed=42)
out = "/dev/shm/verify_out"
shutil.rmtree(out, ignore_errors=True)
ds = extract_from_path(src, concurrency=(1, 8))
m = write_partitioned(ds, out, num_partitions=8, input_tag="verify")
print("manifest rows:", m.num_rows)
back = rd.read_parquet(out)
n = back.count()
print("rows back:", n, "schema:", back.schema().names)
assert n > 0
# resume: rerun -> all partitions already committed
ds2 = extract_from_path(src, concurrency=(1, 8))
m2 = write_partitioned(ds2, out, num_partitions=8, input_tag="verify")
print("resume manifest rows:", m2.num_rows)
# num_partitions mismatch guard (new this round)
try:
    write_partitioned(extract_from_path(src), out, num_partitions=4, input_tag="verify")
    print("GUARD FAIL: mismatch accepted")
except ValueError as e:
    print("guard ok:", str(e)[:80])
# kill/rebuild byte-identity probe
f = sorted(p for p in os.listdir(out) if p.endswith(".parquet"))[0]
sha1 = hashlib.sha256(open(os.path.join(out, f), "rb").read()).hexdigest()
os.remove(os.path.join(out, f))
os.remove(os.path.join(out, "_manifest", f.replace(".parquet", ".json")))
write_partitioned(extract_from_path(src), out, num_partitions=8, input_tag="verify")
sha2 = hashlib.sha256(open(os.path.join(out, f), "rb").read()).hexdigest()
print("rebuild byte-identical:", sha1 == sha2)
ray.shutdown()
