"""Lenient type coercion — the reference's editor coercion semantics
(``data-editor.tsx:16-42``): string -> number via parseFloat with
fallback-to-raw on NaN; string -> bool via ``== 'true'``; JSON try-parse
keeping the raw string on failure. Used by lenient-input paths and fixture
tooling; vectorized where Arrow kernels allow.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc


def coerce_number(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """string -> float64 where parseable, else null (caller decides the
    fallback — the reference keeps the raw string, data-editor.tsx:33-34)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = []
    for v in col.to_pylist():
        if v is None:
            out.append(None)
            continue
        try:
            out.append(float(v))
        except (TypeError, ValueError):
            out.append(None)
    return pa.array(out, pa.float64())


def coerce_bool(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """string -> bool via strict equality with 'true' (data-editor.tsx:35-36)."""
    return pc.equal(col, pa.scalar("true"))


def try_parse_json(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """string -> canonical compact JSON where parseable, else the raw string
    (data-editor.tsx:38-41 keeps the raw value on parse failure)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = []
    for v in col.to_pylist():
        if v is None:
            out.append(None)
            continue
        try:
            out.append(json.dumps(json.loads(v), sort_keys=True, separators=(",", ":")))
        except (TypeError, ValueError):
            out.append(v)
    return pa.array(out, pa.string())


def coalesce_default(col: pa.ChunkedArray | pa.Array, default) -> pa.ChunkedArray:
    """The ``?? default`` pattern applied on every sheet field
    (save-to-google-sheet.ts:190-206)."""
    return pc.coalesce(col, pa.scalar(default))


def json_int_field(col: pa.ChunkedArray | pa.Array, field: str) -> pa.Array:
    """Extract an integer field from a JSON-string column; null where the
    JSON is malformed or the field is missing/non-integer (total output —
    the M5 parse-failure path keeps the row, never drops it)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = []
    for v in col.to_pylist():
        try:
            x = json.loads(v)[field]
            out.append(int(x) if isinstance(x, (int, float)) and not isinstance(x, bool) else None)
        except (TypeError, ValueError, KeyError):
            out.append(None)
    return pa.array(out, pa.int64())
