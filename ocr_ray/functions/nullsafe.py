"""Null-safe grouping keys for Ray's sort-based groupby.

SQL GROUP BY treats NULL as a regular group; Ray 2.49's sort-based
shuffle compares raw Python values and raises ``TypeError: '<' not
supported between 'NoneType' and 'str'`` the moment a key column holds a
NULL. The fix is a reversible encoding applied per batch BEFORE the
shuffle: each key column gains a ``__n_<key>`` null-marker (int8 0/1)
and its NULLs are filled with the type's zero value. Grouping on
``(marker, filled)`` pairs is exactly SQL's NULL-as-a-group — the marker
keeps genuine zero/empty values distinct from encoded NULLs — and the
decode step restores NULL afterwards. Cost: one int8 column per key
through the shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

NULL_MARK = "__n_"


def _zero_for(t: pa.DataType):
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pa.scalar("", t)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return pa.scalar(b"", t)
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return pa.scalar(0, pa.int64()).cast(t)
    return pa.scalar(0, t)


def encode_null_keys(t: pa.Table, keys: list[str]) -> pa.Table:
    """Per-batch: add ``__n_<k>`` markers and fill NULL keys (reversible)."""
    for k in keys:
        col = t.column(k)
        mark = pc.cast(pc.is_null(col), pa.int8())
        t = t.set_column(
            t.schema.get_field_index(k), k, pc.fill_null(col, _zero_for(col.type))
        )
        t = t.append_column(NULL_MARK + k, mark)
    return t


def decode_null_keys(t: pa.Table, keys: list[str]) -> pa.Table:
    """Per-batch: restore NULLs from the markers and drop them."""
    for k in keys:
        m = NULL_MARK + k
        if m not in t.column_names:
            continue
        col = t.column(k)
        is_null = pc.equal(t.column(m), pa.scalar(1, pa.int8()))
        t = t.set_column(
            t.schema.get_field_index(k), k,
            pc.if_else(is_null, pa.scalar(None, col.type), col),
        )
        t = t.drop_columns([m])
    return t


def grouping_keys(keys: list[str]) -> list[str]:
    """The key list to hand Ray's ``groupby`` after ``encode_null_keys``."""
    return [NULL_MARK + k for k in keys] + list(keys)


def null_safe_groupby_agg(ds, keys: list[str], *aggs):
    """Drop-in for ``ds.groupby(keys).aggregate(*aggs)`` that survives (and
    SQL-correctly groups) NULL keys. One extra int8 per key through the
    shuffle; decode restores NULLs on the way out."""
    enc = ds.map_batches(
        lambda t, _k=tuple(keys): encode_null_keys(t, list(_k)),
        batch_format="pyarrow",
    )
    out = enc.groupby(grouping_keys(keys)).aggregate(*aggs)
    return out.map_batches(
        lambda t, _k=tuple(keys): decode_null_keys(t, list(_k)),
        batch_format="pyarrow",
    )
