"""Job entry point — the ``ray job submit`` surface of the engine.

    python -m ocr_ray.run --input DIR --output DIR [--num-partitions P]
                          [--no-resume] [--explode-out DIR] [--metrics]
                          [--num-cpus N]

Reads the transcript Parquet table, runs the extraction pipeline, commits a
resumable partitioned output (atomic per-partition files + manifests), and
optionally writes the exploded block table and the metrics sidecar. This is
the one place (besides bench.py and tests) that owns a Ray session; the
library itself never calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="ocr_ray extraction job")
    ap.add_argument("--input", required=True, help="transcript parquet dir/file")
    ap.add_argument("--output", required=True, help="output dir (partitioned parquet)")
    ap.add_argument("--num-partitions", type=int, default=64)
    ap.add_argument("--no-resume", action="store_true", help="ignore existing manifests")
    ap.add_argument("--explode-out", default=None, help="also write exploded blocks here")
    ap.add_argument("--metrics", action="store_true", help="write _manifest/_metrics.json")
    ap.add_argument("--num-cpus", type=int, default=None, help="local-mode CPU count")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kw = dict(address="local", include_dashboard=False, logging_level="ERROR")
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)

    from ocr_ray.pipelines.extract_pipeline import exploded_blocks, extract_from_path
    from ocr_ray.stages.schemas import EXTRACTED_SCHEMA
    from ocr_ray.state.metrics import extraction_metrics, write_metrics_sidecar
    from ocr_ray.state.sink import write_partitioned

    manifest = write_partitioned(
        extract_from_path(args.input),
        args.output,
        num_partitions=args.num_partitions,
        resume=not args.no_resume,
        input_tag=args.input,
        expected_schema=EXTRACTED_SCHEMA,
    )
    summary = {
        "partitions": manifest.num_rows,
        "rows_out": sum(manifest.column("rows_out").to_pylist()),
        "bytes_in": sum(manifest.column("bytes_in").to_pylist()),
        "n_errors": sum(manifest.column("n_errors").to_pylist()),
    }

    # derived views read the COMMITTED output back — no second extraction
    # pass, and they see exactly what resume committed
    import glob

    committed_files = sorted(glob.glob(os.path.join(args.output, "part-*.parquet")))
    if args.explode_out:
        import ray.data as rd

        exploded_blocks(rd.read_parquet(committed_files)).write_parquet(args.explode_out)
        summary["explode_out"] = args.explode_out
    if args.metrics:
        import ray.data as rd

        m = extraction_metrics(rd.read_parquet(committed_files))
        summary["metrics_path"] = write_metrics_sidecar(m, args.output)

    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
