"""Unit tests for functions/nullsafe.py — the reversible NULL-key encoding
that lets Ray's sort-based groupby carry SQL NULL groups."""

import pyarrow as pa
import pytest

from ocr_ray.functions.nullsafe import (
    decode_null_keys,
    encode_null_keys,
    grouping_keys,
)


@pytest.mark.parametrize(
    "typ,vals,zero",
    [
        (pa.string(), ["a", None, "", "b"], ""),
        (pa.int64(), [1, None, 0, -5], 0),
        (pa.float64(), [1.5, None, 0.0], 0.0),
        (pa.timestamp("us"), [1_000_000, None, 0], None),
        (pa.binary(), [b"x", None, b""], b""),
    ],
)
def test_roundtrip(typ, vals, zero):
    col = pa.array(vals, typ)
    t = pa.table({"k": col, "v": pa.array(range(len(vals)), pa.int64())})
    enc = encode_null_keys(t, ["k"])
    assert "__n_k" in enc.column_names
    assert enc.column("k").null_count == 0  # shuffle-safe
    dec = decode_null_keys(enc, ["k"])
    assert dec.column("k").to_pylist() == col.to_pylist()
    assert dec.column_names == ["k", "v"]


def test_zero_value_distinct_from_null():
    """The marker keeps a genuine '' / 0 distinct from an encoded NULL —
    grouping on (marker, filled) is exactly SQL NULL-as-a-group."""
    t = pa.table({"k": pa.array(["", None, ""], pa.string())})
    enc = encode_null_keys(t, ["k"])
    pairs = list(
        zip(enc.column("__n_k").to_pylist(), enc.column("k").to_pylist())
    )
    assert pairs == [(0, ""), (1, ""), (0, "")]
    assert grouping_keys(["k"]) == ["__n_k", "k"]


def test_multi_key():
    t = pa.table(
        {
            "a": pa.array([None, "x"], pa.string()),
            "b": pa.array([3, None], pa.int64()),
        }
    )
    dec = decode_null_keys(encode_null_keys(t, ["a", "b"]), ["a", "b"])
    assert dec.column("a").to_pylist() == [None, "x"]
    assert dec.column("b").to_pylist() == [3, None]
