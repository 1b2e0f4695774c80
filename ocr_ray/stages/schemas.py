"""Canonical Arrow schemas asserted on stage boundaries.

The reference enforces one closed, fixed output schema twice (zod structured
output, extract-data-from-pdf.ts:43,:62; sink safeParse, route.ts:106-114).
Our analog: explicit ``pyarrow.Schema`` constants + ``cast`` before write.
"""

from __future__ import annotations

import pyarrow as pa

# input table (BASELINE.json input_hint)
TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

BLOCK_TYPE = pa.struct(
    [
        pa.field("block_idx", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
    ]
)

# output table (FIXTURES.md §2 + lineage columns)
EXTRACTED_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("payload_kind", pa.string()),
        pa.field("main_text", pa.string()),
        pa.field("blocks", pa.list_(BLOCK_TYPE)),
        pa.field("n_blocks", pa.int32()),
        pa.field("error", pa.string()),
        pa.field("bytes_in", pa.int64()),
    ]
)

# exploded block table (sheet-sink analog, save-to-google-sheet.ts:199-215)
EXPLODED_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("payload_kind", pa.string()),
        pa.field("block_idx", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
    ]
)


def assert_schema(t: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast to the canonical schema; raises on mismatch (schema-assert stage,
    analog of the reference's double validation)."""
    return t.select(schema.names).cast(schema)
