"""Vectorized scalar helpers (pyarrow.compute kernels) shared by pipelines.

Money columns are converted to integer cents before any aggregation so that
sums are exact and order-independent — a float sum's value depends on
reduction order, which would break the order-insensitive value-hash
comparison against the DuckDB oracle (and is bad practice at 100 TB anyway).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def to_cents(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """dollars (double, 2dp) -> exact integer cents (int64).

    Matches SQL ``CAST(ROUND(x * 100) AS BIGINT)``: DuckDB ROUND is
    half-away-from-zero, while pyarrow's default is half-to-even — the
    explicit ``round_mode`` keeps parity for exact .5-cent inputs.
    """
    return pc.cast(
        pc.round(pc.multiply(col, pa.scalar(100.0)), round_mode="half_towards_infinity"),
        pa.int64(),
    )


def discounted_c4(price: pa.Array, discount: pa.Array) -> pa.ChunkedArray:
    """price * (1 - discount) in units of 1e-4 dollars, exact int64.

    Matches SQL ``price_cents * (100 - discount_cents)``.
    """
    return pc.multiply(
        to_cents(price), pc.subtract(pa.scalar(100, pa.int64()), to_cents(discount))
    )


def count_tokens(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Whitespace token count per string (vectorized regex count of ``\\S+``)."""
    return pc.cast(pc.count_substring_regex(col, pattern=r"\S+"), pa.int64())


def epoch_hours(ts: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """timestamp[us] -> hour bucket since epoch (int64, floor).

    Matches SQL ``epoch_us(ts) // 3600000000`` (FLOOR division — DuckDB's
    ``//`` floors while int64 ``pc.divide`` truncates toward zero, which
    diverges for pre-1970 timestamps; subtract the modulo first).
    """
    us = pc.cast(ts, pa.int64())
    h = pa.scalar(3_600_000_000, pa.int64())
    # floor(us / h) == (us - ((us % h) + h) % h) / h for any sign of us
    rem = pc.subtract(us, pc.multiply(pc.divide(us, h), h))  # trunc remainder
    rem = pc.subtract(rem, pc.multiply(pc.cast(pc.less(rem, 0), pa.int64()), pc.negate(h)))
    return pc.divide(pc.subtract(us, rem), h)
