"""Per-run metrics / QC aggregation (lineage sidecar).

Generalizes the reference's implicit QC signals — the per-record count field
(pdf-data-schema.ts:10), the queue counters (page.tsx:466-470) and the
Mongoose timestamps (route.ts:34) — into a distributed metrics pass:
per-payload-kind row/byte/error totals computed with per-batch partial
aggregation (the shuffle moves one row per kind per batch, never data).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum


def _partial(batch: pa.Table) -> pa.Table:
    t = pa.table(
        {
            "payload_kind": batch.column("payload_kind"),
            "rows": pa.array([1] * batch.num_rows, pa.int64()),
            "bytes_in": batch.column("bytes_in"),
            "n_blocks": pc.cast(batch.column("n_blocks"), pa.int64()),
            "n_errors": pc.cast(
                pc.not_equal(batch.column("error"), ""), pa.int64()
            ),
        }
    )
    return t.group_by(["payload_kind"]).aggregate(
        [("rows", "sum"), ("bytes_in", "sum"), ("n_blocks", "sum"), ("n_errors", "sum")]
    ).rename_columns(["payload_kind", "rows", "bytes_in", "n_blocks", "n_errors"])


def extraction_metrics(extracted: Dataset) -> pa.Table:
    """Tiny table: per payload_kind -> rows, bytes_in, n_blocks, n_errors."""
    agg = extracted.map_batches(_partial, batch_format="pyarrow").groupby(
        "payload_kind"
    ).aggregate(
        Sum("rows", alias_name="rows"),
        Sum("bytes_in", alias_name="bytes_in"),
        Sum("n_blocks", alias_name="n_blocks"),
        Sum("n_errors", alias_name="n_errors"),
    )
    t = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    return t.sort_by([("payload_kind", "ascending")])


def write_metrics_sidecar(metrics: pa.Table, out_dir: str) -> str:
    """Write the metrics table as a JSON sidecar next to the manifests."""
    path = os.path.join(out_dir, "_manifest", "_metrics.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rows = metrics.to_pylist()
    tmp = path + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"by_payload_kind": rows}, f, indent=2)
    os.replace(tmp, path)
    return path
