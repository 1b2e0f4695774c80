"""Statistical-aggregate operators: mergeable moments (variance / covariance
numerators), exact integer histograms, and market-basket co-occurrence.

These generalize the reference's per-run metric rollups (the extraction flow
reports count/size summaries per batch — extract-data-from-pdf.ts:134-145's
guard counters) to the distributive-statistics family a profiling pass over a
100 TB corpus needs: every operator here reduces to per-batch integer partial
states that merge associatively through ONE small groupby, so the shuffle
carries a handful of int64s per group regardless of input width.

Exactness contract: all moments are emitted as *integer numerators* of the
textbook formulas (m2_num = n*Σx² − (Σx)², cov_num = n*Σxy − Σx·Σy) rather
than floats — float variance depends on reduction order, which would break
the order-insensitive value-hash gate vs DuckDB (and is why Welford exists).
The consumer divides by n(n−1) at display time. Overflow bounds are
documented per operator; inputs are scaled (cents vs whole dollars) so the
numerators stay inside int64 at every tested scale, and the bound to watch
at larger corpora is stated in each docstring.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Sum

from ocr_ray.functions.scalars import to_cents

__all__ = [
    "event_value_moments",
    "event_value_outliers",
    "EVENT_VALUE_OUTLIERS_SQL",
    "events_value_histogram",
    "price_qty_moments",
    "part_pair_counts",
    "EVENT_VALUE_MOMENTS_SQL",
    "EVENTS_VALUE_HISTOGRAM_SQL",
    "PRICE_QTY_MOMENTS_SQL",
    "PART_PAIR_COUNTS_SQL",
]


def _pq(sf_dir: str, table: str) -> str:
    return f"{sf_dir}/{table}.parquet"


# ---------------------------------------------------------------------------
# mergeable moments: per-(event_type, day) variance numerator
# ---------------------------------------------------------------------------


def event_value_moments(sf_dir: str) -> Dataset:
    """Per-(event_type, day) count / sum / variance-numerator over event
    value — the mergeable-moments pattern: each batch reduces to one
    (n, Σc, Σc²) triple per group, the single shuffle moves three int64s
    per (type, day), and the final map computes m2_num = n·Σc² − (Σc)².

    Overflow bound (int64): with cents ≤ 10^5 per event, n·Σc² ≈ n²·10^10
    stays under 2^63 for n ≤ ~10^4 rows per (type, day) group at one
    cent-scale — the (type, day) key keeps groups bounded as the corpus
    grows in TIME rather than in per-day density; a denser domain should
    group finer (hour) or scale to whole dollars like price_qty_moments.
    NULL value/ts rows are excluded (mirrored in SQL); NULL event_type is
    a regular SQL group (null-safe keys through Ray's sort shuffle).
    """
    from ocr_ray.functions.nullsafe import null_safe_groupby_agg

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t.column("value")), pc.is_valid(t.column("ts"))))
        c = to_cents(t.column("value"))
        us = pc.cast(t.column("ts"), pa.int64())
        day = pc.divide(pc.subtract(us, pc.if_else(pc.less(us, 0), 86_399_999_999, 0)), 86_400_000_000)
        g = pa.table(
            {
                "event_type": t.column("event_type"),
                "day": day,
                "n": pa.array(np.ones(t.num_rows, np.int64)),
                "s": c,
                "ss": pc.multiply(c, c),
            }
        ).group_by(["event_type", "day"]).aggregate([("n", "sum"), ("s", "sum"), ("ss", "sum")])
        return g.rename_columns(["event_type", "day", "n", "s", "ss"])

    agg = null_safe_groupby_agg(
        events.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "day"],
        Sum("n", alias_name="n"),
        Sum("s", alias_name="s"),
        Sum("ss", alias_name="ss"),
    )

    def final(t: pa.Table) -> pa.Table:
        n, s, ss = t.column("n"), t.column("s"), t.column("ss")
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "day": t.column("day"),
                "n": n,
                "sum_cents": s,
                "m2_num": pc.subtract(pc.multiply(n, ss), pc.multiply(s, s)),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow")


EVENT_VALUE_MOMENTS_SQL = """
WITH c AS (
  -- FLOOR day bucket: DuckDB integer // truncates toward zero (pre-1970
  -- would bucket up), so subtract the positive modulo first — exactly the
  -- arithmetic the Ray side uses
  SELECT event_type,
         (epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000) % 86400000000))
           // 86400000000 AS day,
         CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
)
SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(c) AS BIGINT) AS sum_cents,
       CAST(COUNT(*) * SUM(c * c) - SUM(c) * SUM(c) AS BIGINT) AS m2_num
FROM c GROUP BY event_type, day
"""


# ---------------------------------------------------------------------------
# exact integer histogram
# ---------------------------------------------------------------------------

_HIST_BIN_CENTS = 5_000  # $50 buckets
_HIST_MAX_BIN = 19  # everything >= $1000 clamps into the last bin


def events_value_histogram(sf_dir: str) -> Dataset:
    """Fixed-bin value histogram over events — the profiling primitive under
    quantile/NTILE plans, exposed first-class. Binning is integer cents
    floor-division (never float bucket math: a double boundary like 49.999…
    would bin differently across engines), per-batch ``np.bincount``
    partials, one tiny groupby over at most 20 rows per batch.
    """
    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("value")))
        c = to_cents(t.column("value")).to_numpy(zero_copy_only=False)
        b = np.minimum(np.floor_divide(c, _HIST_BIN_CENTS), _HIST_MAX_BIN)
        b = np.maximum(b, 0)
        cnt = np.bincount(b, minlength=_HIST_MAX_BIN + 1)
        bins = np.nonzero(cnt)[0]
        return pa.table(
            {"bin": pa.array(bins.astype(np.int64)), "n": pa.array(cnt[bins].astype(np.int64))}
        )

    agg = (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
    )

    def final(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bin": t.column("bin"),
                "lo_cents": pc.multiply(t.column("bin"), _HIST_BIN_CENTS),
                "n": t.column("n"),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow")


EVENTS_VALUE_HISTOGRAM_SQL = f"""
WITH c AS (
  SELECT LEAST(GREATEST(CAST(ROUND(value * 100) AS BIGINT) // {_HIST_BIN_CENTS}, 0),
               {_HIST_MAX_BIN}) AS bin
  FROM events WHERE value IS NOT NULL
)
SELECT bin, bin * {_HIST_BIN_CENTS} AS lo_cents, CAST(COUNT(*) AS BIGINT) AS n
FROM c GROUP BY bin
"""


# ---------------------------------------------------------------------------
# mergeable covariance / correlation numerators
# ---------------------------------------------------------------------------


def price_qty_moments(sf_dir: str) -> Dataset:
    """Per-(returnflag, linestatus, ship-month) covariance/correlation state
    between quantity and extended price — the two-variable moments sibling:
    partial (n, Σx, Σy, Σxy, Σx², Σy²) per batch, one shuffle of six int64s
    per group, integer numerators out (corr² = cov_num² / (sxx_num·syy_num)
    at display time, exactly).

    Scaling choice: y is whole DOLLARS (ROUND(price)), not cents — with
    y ≤ 10^5 and x = quantity ≤ 10^2, n·Σy² ≈ n²·10^10 holds inside int64
    up to n ≈ 10^4 rows per (flag, status, month) group; cents would cut
    that bound 10^4×. The month key grows with the corpus timespan, keeping
    per-group n roughly constant as total volume scales.
    """
    li = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_shipdate", "l_quantity", "l_extendedprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.and_(pc.is_valid(t.column("l_quantity")), pc.is_valid(t.column("l_extendedprice"))),
                pc.is_valid(t.column("l_shipdate")),
            )
        )
        x = pc.cast(pc.round(t.column("l_quantity"), round_mode="half_towards_infinity"), pa.int64())
        y = pc.cast(
            pc.round(t.column("l_extendedprice"), round_mode="half_towards_infinity"), pa.int64()
        )
        month = pc.cast(
            pc.add(pc.multiply(pc.year(t.column("l_shipdate")), 12), pc.month(t.column("l_shipdate"))),
            pa.int64(),
        )
        g = pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "month": month,
                "n": pa.array(np.ones(t.num_rows, np.int64)),
                "sx": x,
                "sy": y,
                "sxy": pc.multiply(x, y),
                "sxx": pc.multiply(x, x),
                "syy": pc.multiply(y, y),
            }
        ).group_by(["l_returnflag", "l_linestatus", "month"]).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"), ("sxy", "sum"), ("sxx", "sum"), ("syy", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "month", "n", "sx", "sy", "sxy", "sxx", "syy"]
        )

    from ocr_ray.functions.nullsafe import null_safe_groupby_agg

    agg = null_safe_groupby_agg(
        li.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus", "month"],
        Sum("n", alias_name="n"),
        Sum("sx", alias_name="sx"),
        Sum("sy", alias_name="sy"),
        Sum("sxy", alias_name="sxy"),
        Sum("sxx", alias_name="sxx"),
        Sum("syy", alias_name="syy"),
    )

    def final(t: pa.Table) -> pa.Table:
        n = t.column("n")
        sx, sy = t.column("sx"), t.column("sy")
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "month": t.column("month"),
                "n": n,
                "sum_qty": sx,
                "sum_price_usd": sy,
                "cov_num": pc.subtract(pc.multiply(n, t.column("sxy")), pc.multiply(sx, sy)),
                "sxx_num": pc.subtract(pc.multiply(n, t.column("sxx")), pc.multiply(sx, sx)),
                "syy_num": pc.subtract(pc.multiply(n, t.column("syy")), pc.multiply(sy, sy)),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow")


PRICE_QTY_MOMENTS_SQL = """
WITH c AS (
  SELECT l_returnflag, l_linestatus,
         CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS month,
         CAST(ROUND(l_quantity) AS BIGINT) AS x,
         CAST(ROUND(l_extendedprice) AS BIGINT) AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL AND l_shipdate IS NOT NULL
)
SELECT l_returnflag, l_linestatus, month, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(x) AS BIGINT) AS sum_qty,
       CAST(SUM(y) AS BIGINT) AS sum_price_usd,
       CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT) AS cov_num,
       CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT) AS sxx_num,
       CAST(COUNT(*) * SUM(y * y) - SUM(y) * SUM(y) AS BIGINT) AS syy_num
FROM c GROUP BY l_returnflag, l_linestatus, month
"""


# ---------------------------------------------------------------------------
# market-basket co-occurrence: top part pairs across orders
# ---------------------------------------------------------------------------

_PAIR_TOPK = 100


def part_pair_counts(sf_dir: str) -> Dataset:
    """Top co-purchased part pairs — frequent-itemset mining at k=2, the
    association primitive of a recommendations pipeline.

    Plan (shuffle budget: two small exchanges, never the raw rows):
      1. per-batch DISTINCT (orderkey, partkey) shrink;
      2. coarse-key ``grouped_scan`` by orderkey co-locates each order,
         then pair expansion is vectorized over the whole partition —
         one diagonal pass per offset d (d bounded by the max lines per
         order, ≤ ~13 here) instead of per-order Python;
      3. per-partition pair census via lexsort + run-length count over the
         (part_a, part_b) columns (no key-range contract — negative /
         full-int64 keys are fine), ONE groupby over (pair, n) partials;
      4. per-block partial top-k then a driver merge of ≤ k rows per
         block (k = 100): the global sort is never materialized.
    Ties are total-ordered (n DESC, part_a, part_b) so LIMIT is stable.
    """
    from ocr_ray.pipelines.conversation import grouped_scan

    li = rd.read_parquet(_pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"])

    def distinct_partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("l_orderkey")), pc.is_valid(t.column("l_partkey")))
        )
        return t.group_by(["l_orderkey", "l_partkey"]).aggregate([])

    def pairs_in_partition(df) -> "pa.Table":
        df = df.drop_duplicates(["l_orderkey", "l_partkey"]).sort_values(
            ["l_orderkey", "l_partkey"]
        )
        ok = df["l_orderkey"].to_numpy(np.int64)
        pk = df["l_partkey"].to_numpy(np.int64)
        a_all, b_all = [], []
        d = 1
        while True:
            if d >= len(ok):
                break
            m = ok[:-d] == ok[d:]
            if not m.any():
                break
            a_all.append(pk[:-d][m])
            b_all.append(pk[d:][m])
            d += 1
        import pandas as pd

        if not a_all:
            e = np.array([], np.int64)
            return pd.DataFrame({"part_a": e, "part_b": e, "n": e})
        a = np.concatenate(a_all)
        b = np.concatenate(b_all)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        new = np.empty(len(a), dtype=bool)
        new[0] = True
        np.not_equal(a[1:], a[:-1], out=new[1:])
        new[1:] |= b[1:] != b[:-1]
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(a))).astype(np.int64)
        return pd.DataFrame({"part_a": a[starts], "part_b": b[starts], "n": cnt})

    partials = grouped_scan(
        li.map_batches(distinct_partial, batch_format="pyarrow"), "l_orderkey", pairs_in_partition
    )

    # pair-count combine WITHOUT Ray's hash aggregate: 1.2M near-distinct
    # (part_a, part_b) groups cost the multi-key Aggregate ~190 s at sf0.1
    # (measured — it dominated the whole query); a coarse-key exchange on
    # hash(pair) followed by ONE lexsort + run-length sum per partition is
    # exact (a pair lives in exactly one partition, so per-partition sums
    # are its global count) and runs in seconds. Per-partition top-k then
    # bounds the driver merge at k rows per partition.
    _PAIR_PARTS = 64

    def add_pair_part(t: pa.Table) -> pa.Table:
        a = t.column("part_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t.column("part_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = a * np.uint64(0x9E3779B97F4A7C15) ^ b * np.uint64(0xC2B2AE3D27D4EB4F)
        return t.append_column(
            "__part", pa.array((h % np.uint64(_PAIR_PARTS)).astype(np.int32))
        )

    def census_topk(g: pa.Table) -> pa.Table:
        import pandas as pd

        df = g.select(["part_a", "part_b", "n"]).to_pandas()
        a = df["part_a"].to_numpy(np.int64)
        b = df["part_b"].to_numpy(np.int64)
        n = df["n"].to_numpy(np.int64)
        order = np.lexsort((b, a))
        a, b, n = a[order], b[order], n[order]
        new = np.empty(len(a), dtype=bool)
        if len(a):
            new[0] = True
            np.not_equal(a[1:], a[:-1], out=new[1:])
            new[1:] |= b[1:] != b[:-1]
        starts = np.flatnonzero(new)
        sums = np.add.reduceat(n, starts) if len(starts) else np.array([], np.int64)
        out = pd.DataFrame({"part_a": a[starts], "part_b": b[starts], "n": sums})
        out = out.sort_values(["n", "part_a", "part_b"], ascending=[False, True, True])
        return pa.Table.from_pandas(out.head(_PAIR_TOPK), preserve_index=False)

    import pandas as pd

    rows = (
        partials.map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(census_topk, batch_format="pyarrow")
        .take_all()
    )
    merged = pd.DataFrame(rows, columns=["part_a", "part_b", "n"])
    top = merged.sort_values(["n", "part_a", "part_b"], ascending=[False, True, True]).head(
        _PAIR_TOPK
    )
    out = pa.table(
        {
            "part_a": pa.array(top["part_a"].to_numpy(np.int64)),
            "part_b": pa.array(top["part_b"].to_numpy(np.int64)),
            "n": pa.array(top["n"].to_numpy(np.int64)),
        }
    )
    return rd.from_arrow(out)


PART_PAIR_COUNTS_SQL = f"""
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, CAST(COUNT(*) AS BIGINT) AS n
FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n DESC, part_a, part_b
LIMIT {_PAIR_TOPK}
"""


# ---------------------------------------------------------------------------
# exact z-score outliers: global-moment broadcast gate
# ---------------------------------------------------------------------------


def event_value_outliers(sf_dir: str) -> Dataset:
    """Events whose value sits more than 3 population standard deviations
    from the mean — the anomaly-flagging pass of a data-quality sweep,
    with the z-test evaluated EXACTLY in integers (no float mean/stddev
    in either engine).

    Algebra: with μ = Σc/n and σ² = (n·Σc² − (Σc)²)/n², the test
    |x − μ| > 3σ multiplies through by n to (n·x − Σc)² > 9·(n·Σc² − (Σc)²). The
    left side is a per-row int64; the right side is one corpus constant.
    Per-row we compare |n·x − Σc| against T = isqrt(RHS) (exact integer
    floor square root — for non-negative integers L > √R ⟺ L > isqrt(R)),
    so the hot loop is one multiply + one compare per row.

    Scale plan: pass 1 folds (n, Σc, Σc²) from per-batch int64 partials
    into exact Python ints on the driver (three numbers per batch, not
    data); pass 2 re-streams with the two broadcast constants. Overflow
    bounds: per-batch Σc² needs |cents| ≤ ~3·10^9 at 10^5-row batches;
    the per-row product n·x and T both stay inside int64 for n ≤ ~10^9
    rows at cent-scale dispersion — past that, rescale to whole dollars
    (the DuckDB mirror is HUGEINT throughout and has no such bound).

    NULL semantics (mirrored): NULL event_id / value rows are excluded
    from BOTH the population moments and the output."""
    import math

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        keep = t.filter(
            pc.and_(pc.is_valid(t.column("event_id")), pc.is_valid(t.column("value")))
        )
        return pa.table(
            {
                "event_id": keep.column("event_id"),
                "value_cents": to_cents(keep.column("value")),
            }
        )

    v = events.map_batches(prep, batch_format="pyarrow")

    def moments(t: pa.Table) -> pa.Table:
        c = t.column("value_cents").to_numpy()
        return pa.table(
            {
                "n": pa.array([len(c)], pa.int64()),
                "s1": pa.array([int(c.sum())], pa.int64()),
                "s2": pa.array([int((c * c).sum())], pa.int64()),
            }
        )

    parts = v.map_batches(moments, batch_format="pyarrow").take_all()
    n = sum(int(r["n"]) for r in parts)
    out_schema = pa.schema([("event_id", pa.int64()), ("value_cents", pa.int64())])
    if n == 0:
        return rd.from_arrow(out_schema.empty_table())
    s1 = sum(int(r["s1"]) for r in parts)
    s2 = sum(int(r["s2"]) for r in parts)
    rhs = 9 * (n * s2 - s1 * s1)  # exact, arbitrary precision
    thresh = math.isqrt(rhs) if rhs >= 0 else -1

    def gate(t: pa.Table) -> pa.Table:
        dev = pc.abs(
            pc.subtract(
                pc.multiply(t.column("value_cents"), pa.scalar(n, pa.int64())),
                pa.scalar(s1, pa.int64()),
            )
        )
        return t.filter(pc.greater(dev, pa.scalar(thresh, pa.int64())))

    return v.map_batches(gate, batch_format="pyarrow").union(
        rd.from_arrow(out_schema.empty_table())
    )


EVENT_VALUE_OUTLIERS_SQL = """
WITH v AS (
    SELECT event_id, CAST(ROUND(value*100) AS BIGINT) AS value_cents
    FROM events
    WHERE event_id IS NOT NULL AND value IS NOT NULL
),
s AS (
    SELECT COUNT(*) AS n,
           SUM(CAST(value_cents AS HUGEINT)) AS s1,
           SUM(CAST(value_cents AS HUGEINT) * CAST(value_cents AS HUGEINT)) AS s2
    FROM v
)
SELECT event_id, value_cents
FROM v, s
WHERE (n * CAST(value_cents AS HUGEINT) - s1) * (n * CAST(value_cents AS HUGEINT) - s1)
      > 9 * (n * s2 - s1 * s1)
"""


# ---------------------------------------------------------------------------
# grouped OLS trend — per-user value drift as exact integer rationals
# ---------------------------------------------------------------------------

_TREND_BASE_US = 1_704_067_200_000_000  # 2024-01-01 (rebase keeps x^2 small)


def user_value_trend(sf_dir: str) -> Dataset:
    """Per-user OLS slope of event value (cents) against event time
    (minutes since 2024-01-01) as an EXACT integer rational —
    slope = slope_num / slope_den with slope_num = n·Σxy − Σx·Σy and
    slope_den = n·Σx² − (Σx)² — the drift detector of a quality-monitoring
    pipeline, reduction-order independent because every partial is an
    integer sum.

    Mergeable-moments plan (one shuffle of five int64s per user): each
    batch reduces to (n, Σx, Σy, Σxy, Σx²) per user. Overflow bound: with
    x ≤ 10^5 minutes and cents ≤ 10^5, n·Σx² ≈ n²·10^10 holds to n ≈ 10^4
    rows per user; a longer time axis should rebase/coarsen x (the
    constant above is the lever). NULL ts/value/user rows are excluded
    (mirrored in SQL: x and y are NON NULL by the WHERE)."""
    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.and_(pc.is_valid(t.column("value")), pc.is_valid(t.column("ts"))),
                pc.is_valid(t.column("user_id")),
            )
        )
        y = to_cents(t.column("value"))
        us = pc.cast(t.column("ts"), pa.int64())
        # fixture timestamps are all >= the base, so trunc == floor
        x = pc.divide(pc.subtract(us, pa.scalar(_TREND_BASE_US, pa.int64())), 60_000_000)
        g = pa.table(
            {
                "user_id": t.column("user_id"),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
                "sx": x,
                "sy": y,
                "sxy": pc.multiply(x, y),
                "sxx": pc.multiply(x, x),
            }
        ).group_by(["user_id"]).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"), ("sxy", "sum"), ("sxx", "sum")]
        )
        return g.rename_columns(["user_id", "n", "sx", "sy", "sxy", "sxx"])

    agg = (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
        )
    )

    def final(t: pa.Table) -> pa.Table:
        n, sx, sy, sxy, sxx = (t.column(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "n": n,
                "slope_num": pc.subtract(pc.multiply(n, sxy), pc.multiply(sx, sy)),
                "slope_den": pc.subtract(pc.multiply(n, sxx), pc.multiply(sx, sx)),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow")


USER_VALUE_TREND_SQL = """
WITH p AS (
  SELECT user_id,
         (epoch_us(ts) - 1704067200000000) // 60000000 AS x,
         CAST(ROUND(value*100) AS BIGINT) AS y
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND user_id IS NOT NULL
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) * SUM(x*y) - SUM(x) * SUM(y) AS BIGINT) AS slope_num,
       CAST(COUNT(*) * SUM(x*x) - SUM(x) * SUM(x) AS BIGINT) AS slope_den
FROM p
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# JSON property extraction rollup (the M5 parse surface, distributed)
# ---------------------------------------------------------------------------


def events_props_k_stats(sf_dir: str) -> Dataset:
    """Parse the JSON ``props`` payload per event, extract the integer
    field ``k``, and roll up (count, sum, min, max) per event_type — the
    semi-structured-column path every telemetry pipeline needs.

    The parse is genuinely per-row work (like the extraction kernel); the
    partial aggregation keeps the shuffle at one 4-int64 row per type per
    batch. Semantics mirrored with DuckDB's json functions: invalid/NULL
    JSON yields NULL k (json_valid guard), integer-valued strings cast,
    booleans/floats do not. NULL event_type is a regular SQL group."""
    import json

    from ray.data.aggregate import Max, Min

    from ocr_ray.functions.nullsafe import null_safe_groupby_agg

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "props"])

    def extract_k(s):
        if s is None:
            return None
        try:
            v = json.loads(s)
        except (ValueError, TypeError):
            return None
        if not isinstance(v, dict):
            return None
        k = v.get("k")
        if isinstance(k, bool):
            return None  # json 'true' does not TRY_CAST to BIGINT
        if isinstance(k, int):
            return k
        if isinstance(k, str):
            try:
                return int(k)  # mirrors TRY_CAST('12' AS BIGINT)
            except ValueError:
                return None
        return None

    def partial(t: pa.Table) -> pa.Table:
        ks = pa.array(
            [extract_k(s) for s in t.column("props").to_pylist()], pa.int64()
        )
        t = pa.table({"event_type": t.column("event_type"), "k": ks}).filter(
            pc.is_valid(ks)
        )
        t = t.append_column("n_k", pa.array(np.ones(t.num_rows, np.int64)))
        g = t.group_by(["event_type"]).aggregate(
            [("n_k", "sum"), ("k", "sum"), ("k", "min"), ("k", "max")]
        )
        return g.rename_columns(["event_type", "n_k", "sum_k", "min_k", "max_k"])

    return null_safe_groupby_agg(
        events.map_batches(partial, batch_format="pyarrow"),
        ["event_type"],
        Sum("n_k", alias_name="n_k"),
        Sum("sum_k", alias_name="sum_k"),
        Min("min_k", alias_name="min_k"),
        Max("max_k", alias_name="max_k"),
    )


EVENTS_PROPS_K_STATS_SQL = """
SELECT event_type,
       CAST(COUNT(k) AS BIGINT) AS n_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k
FROM (
  SELECT event_type,
         CASE WHEN props IS NOT NULL AND json_valid(props)
              THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k
  FROM events
)
WHERE k IS NOT NULL
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# robust outliers: median absolute deviation (the 3-sigma op's robust sibling)
# ---------------------------------------------------------------------------

_MAD_K = 3  # flag |x - median| > K * MAD
_MAD_BUCKET = 10_000  # $100-wide rank-histogram buckets


def _rank_element_cents(v: Dataset, col: str, rank: int) -> int:
    """Exact value at ascending ``rank`` (1-based) of an int64 column via
    the bucket-histogram two-pass plan (no global sort): per-batch bucket
    counts fold to a tiny driver table (buckets = value range / width);
    only the one target bucket's rows are pulled and sorted."""

    def hist(t: pa.Table) -> pa.Table:
        c = t.column(col).to_numpy()
        b, n = np.unique(c // _MAD_BUCKET, return_counts=True)
        return pa.table(
            {"bucket": pa.array(b, pa.int64()), "n": pa.array(n, pa.int64())}
        )

    rows = sorted(
        (
            (r["bucket"], r["n"])
            for r in v.map_batches(hist, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("n", alias_name="n"))
            .take_all()
        ),
    )
    cum = 0
    target = None
    for b, n in rows:
        if cum + n >= rank:
            target, rank_in = b, rank - cum
            break
        cum += n
    assert target is not None, "rank beyond population"
    in_bucket = np.sort(
        np.concatenate(
            [
                t.column(col).to_numpy()
                for t in v.map_batches(
                    lambda t: t.filter(
                        pc.equal(
                            pa.array(
                                t.column(col).to_numpy() // _MAD_BUCKET, pa.int64()
                            ),
                            pa.scalar(int(target)),
                        )
                    ),
                    batch_format="pyarrow",
                ).iter_batches(batch_size=None, batch_format="pyarrow")
            ]
            or [np.array([], np.int64)]
        )
    )
    return int(in_bucket[rank_in - 1])


def event_value_outliers_mad(sf_dir: str) -> Dataset:
    """Events whose value deviates from the MEDIAN by more than
    ``_MAD_K`` × the median absolute deviation — the robust sibling of
    ``event_value_outliers``: a handful of extreme values inflates the
    3-sigma gate's σ and hides real anomalies; the MAD gate is
    breakdown-resistant and stays exact in integers.

    Median = the lower median (ascending rank (n-1)//2 + 1 — mirrored in
    SQL via row_number, NOT DuckDB's interpolating median()). Four
    streaming passes (two rank-histogram quantiles over cents and over
    |c - med|) plus the final gate pass; the driver only ever holds bucket
    histograms and one bucket's values. NULL event_id / value rows are
    excluded everywhere (mirrored)."""
    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        keep = t.filter(
            pc.and_(pc.is_valid(t.column("event_id")), pc.is_valid(t.column("value")))
        )
        return pa.table(
            {
                "event_id": keep.column("event_id"),
                "value_cents": to_cents(keep.column("value")),
            }
        )

    v = events.map_batches(prep, batch_format="pyarrow").materialize()
    out_schema = pa.schema([("event_id", pa.int64()), ("value_cents", pa.int64())])
    n = v.count()
    if n == 0:
        return rd.from_arrow(out_schema.empty_table())
    rank = (n - 1) // 2 + 1
    med = _rank_element_cents(v, "value_cents", rank)

    def absdev(t: pa.Table) -> pa.Table:
        c = t.column("value_cents").to_numpy()
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "value_cents": t.column("value_cents"),
                "ad": pa.array(np.abs(c - med), pa.int64()),
            }
        )

    d = v.map_batches(absdev, batch_format="pyarrow").materialize()
    mad = _rank_element_cents(d, "ad", rank)
    thresh = _MAD_K * mad

    def gate(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("ad"), pa.scalar(thresh))).select(
            ["event_id", "value_cents"]
        )

    return d.map_batches(gate, batch_format="pyarrow")


EVENT_VALUE_OUTLIERS_MAD_SQL = f"""
WITH v AS (
  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS c FROM events
  WHERE event_id IS NOT NULL AND value IS NOT NULL
),
n AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM v),
med AS (
  SELECT c FROM (SELECT c, row_number() OVER (ORDER BY c) AS rn FROM v)
  WHERE rn = (SELECT (cnt - 1) // 2 + 1 FROM n)
),
d AS (SELECT event_id, c, abs(c - (SELECT c FROM med)) AS ad FROM v),
mad AS (
  SELECT ad FROM (SELECT ad, row_number() OVER (ORDER BY ad) AS rn FROM d)
  WHERE rn = (SELECT (cnt - 1) // 2 + 1 FROM n)
)
SELECT event_id, c AS value_cents FROM d
WHERE ad > {_MAD_K} * (SELECT ad FROM mad)
"""


# ---------------------------------------------------------------------------
# per-user behavioral diversity: exact-rational Gini impurity of event mix
# ---------------------------------------------------------------------------


def user_type_gini(sf_dir: str) -> Dataset:
    """Per-user Gini impurity of the event-type distribution — the
    behavioral-diversity feature (1 - sum_t (c_t/n)^2) emitted as EXACT
    integers so the gate is reduction-order independent: ``n_events``,
    ``sum_sq = sum c_t^2`` and ``gini_bp = (n^2 - sum_sq)*10000 // n^2``
    (all operands non-negative, so DuckDB's truncating BIGINT ``//`` and
    numpy ``//`` agree). Entropy needs a log and would float-diverge;
    Gini is the exactly-gateable diversity measure.

    Plan: per-batch Arrow C++ census collapses each batch to its distinct
    (user, type) counts; ONE groupby folds partials to global per-(user,
    type) counts; squaring is only valid on the GLOBAL count, so the
    square happens after that shuffle, and a second tiny groupby(user)
    sums (n, sum_sq). Shuffle traffic is bounded by group cardinality
    (|users| x |types| rows of three int64s), never events.

    Contract (mirrored): NULL user_id / event_type rows are excluded
    (both key the census)."""
    from ray.data.aggregate import Sum

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "event_type"]
    )

    def census(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.is_valid(t.column("user_id")), pc.is_valid(t.column("event_type"))
        )
        g = (
            t.filter(m)
            .group_by(["user_id", "event_type"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["user_id", "event_type", "cnt"])

    per_type = (
        events.map_batches(census, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def square(t: pa.Table) -> pa.Table:
        c = pc.cast(t.column("cnt"), pa.int64())
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "n_events": c,
                "sum_sq": pc.multiply_checked(c, c),
            }
        )

    per_user = (
        per_type.map_batches(square, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("sum_sq", alias_name="sum_sq"))
    )

    def finish(t: pa.Table) -> pa.Table:
        n = np.asarray(pc.cast(t.column("n_events"), pa.int64()))
        ss = np.asarray(pc.cast(t.column("sum_sq"), pa.int64()))
        n2 = n * n
        gini = np.where(n2 > 0, (n2 - ss) * 10_000 // np.maximum(n2, 1), 0)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "n_events": pa.array(n),
                "sum_sq": pa.array(ss),
                "gini_bp": pa.array(gini.astype(np.int64)),
            }
        )

    return per_user.map_batches(finish, batch_format="pyarrow")


USER_TYPE_GINI_SQL = """
WITH e AS (
  SELECT user_id, event_type FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
),
c AS (SELECT user_id, event_type, COUNT(*) AS cnt FROM e GROUP BY 1, 2),
u AS (SELECT user_id, SUM(cnt) AS n, SUM(cnt*cnt) AS ss FROM c GROUP BY 1)
SELECT user_id,
       CAST(n AS BIGINT) AS n_events,
       CAST(ss AS BIGINT) AS sum_sq,
       CAST((n*n - ss) * 10000 // (n*n) AS BIGINT) AS gini_bp
FROM u
"""


# ---------------------------------------------------------------------------
# winsorized aggregate (percentile-clipped robust sum/mean)
# ---------------------------------------------------------------------------

_WINS_LO_BP = 100  # p1
_WINS_HI_BP = 9900  # p99
_WINS_BUCKET_CENTS = 1_000  # $10 histogram buckets for the rank location


def events_value_winsorized(sf_dir: str) -> pa.Table:
    """Winsorized value aggregate: clip every event value to the exact
    [p1, p99] discrete percentiles (lower-neighbor rank, the
    PERCENTILE_DISC convention) and report the clipped sum plus the clip
    census — the robust-preprocessing step that tames heavy-tailed metrics
    before means/trends (completes the robust family: MAD gate, 3-sigma
    gate, rolling median).

    Plan: the bucket-histogram rank machinery of ``order_percentile_cont``
    WITHOUT interpolation — pass 1 histograms cents into $10 buckets (one
    tiny groupby; trunc-division bucketing is monotone so bucket-local
    ranks compose into global ranks), the driver maps the two clip ranks
    to (bucket, local rank), pass 2 sorts ONLY the rank-bearing buckets,
    and pass 3 streams clip+sum partials (three int64s per batch) — no
    global sort at any point. All math in exact integer cents, so the
    value hash is reduction-order independent.

    Contract (mirrored): NULL values excluded; empty input returns zero
    rows."""
    import ray
    from ray.data.aggregate import Count

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["value"])

    def cents(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("value")))
        c = to_cents(t.column("value"))
        return pa.table(
            {"cents": c, "bucket": pc.divide(c, pa.scalar(_WINS_BUCKET_CENTS))}
        )

    empty = pa.table(
        {
            "n_values": pa.array([], pa.int64()),
            "lo_cents": pa.array([], pa.int64()),
            "hi_cents": pa.array([], pa.int64()),
            "wsum_cents": pa.array([], pa.int64()),
            "n_clipped_lo": pa.array([], pa.int64()),
            "n_clipped_hi": pa.array([], pa.int64()),
        }
    )

    vals = events.map_batches(cents, batch_format="pyarrow").materialize()
    hist = vals.groupby("bucket").aggregate(Count(alias_name="c")).take_all()
    hist.sort(key=lambda r: r["bucket"])
    n = sum(r["c"] for r in hist)
    if n == 0:
        return empty

    needed: dict[int, list[tuple[int, int]]] = {}  # bucket -> [(which, local_rk)]
    for which, q_bp in ((0, _WINS_LO_BP), (1, _WINS_HI_BP)):
        rk = (n - 1) * q_bp // 10_000 + 1
        cum = 0
        for r in hist:
            if cum + r["c"] >= rk:
                needed.setdefault(r["bucket"], []).append((which, rk - cum))
                break
            cum += r["c"]
    ref = ray.put(needed)

    def pick(g: pa.Table) -> pa.Table:
        want = ray.get(ref).get(g.column("bucket")[0].as_py(), [])
        if not want:
            return pa.table(
                {"which": pa.array([], pa.int64()), "cents": pa.array([], pa.int64())}
            )
        srt = np.sort(g.column("cents").to_numpy())
        return pa.table(
            {
                "which": pa.array([w for w, _ in want], pa.int64()),
                "cents": pa.array([int(srt[rk - 1]) for _, rk in want], pa.int64()),
            }
        )

    target_buckets = pa.array(sorted(needed), pa.int64())
    picked = (
        vals.map_batches(
            lambda t: t.filter(pc.is_in(t.column("bucket"), value_set=target_buckets)),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .map_groups(pick, batch_format="pyarrow")
        .take_all()
    )
    bounds = {r["which"]: r["cents"] for r in picked}
    lo_c, hi_c = bounds[0], bounds[1]

    def clip_partial(t: pa.Table) -> pa.Table:
        c = t.column("cents")
        clipped = pc.min_element_wise(
            pc.max_element_wise(c, pa.scalar(lo_c, pa.int64())),
            pa.scalar(hi_c, pa.int64()),
        )
        return pa.table(
            {
                "wsum": pa.array([pc.sum(clipped).as_py() or 0], pa.int64()),
                "nlo": pa.array(
                    [pc.sum(pc.cast(pc.less(c, lo_c), pa.int64())).as_py() or 0],
                    pa.int64(),
                ),
                "nhi": pa.array(
                    [pc.sum(pc.cast(pc.greater(c, hi_c), pa.int64())).as_py() or 0],
                    pa.int64(),
                ),
            }
        )

    wsum = nlo = nhi = 0
    for b in vals.map_batches(clip_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        wsum += sum(b.column("wsum").to_pylist())
        nlo += sum(b.column("nlo").to_pylist())
        nhi += sum(b.column("nhi").to_pylist())
    return pa.table(
        {
            "n_values": pa.array([n], pa.int64()),
            "lo_cents": pa.array([lo_c], pa.int64()),
            "hi_cents": pa.array([hi_c], pa.int64()),
            "wsum_cents": pa.array([wsum], pa.int64()),
            "n_clipped_lo": pa.array([nlo], pa.int64()),
            "n_clipped_hi": pa.array([nhi], pa.int64()),
        }
    )


EVENTS_VALUE_WINSORIZED_SQL = """
WITH v AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events WHERE value IS NOT NULL
),
o AS (SELECT c, row_number() OVER (ORDER BY c) AS rn FROM v),
n AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM v),
b AS (
  SELECT (SELECT c FROM o WHERE rn = ((cnt - 1) * 100) // 10000 + 1) AS lo,
         (SELECT c FROM o WHERE rn = ((cnt - 1) * 9900) // 10000 + 1) AS hi,
         cnt
  FROM n
)
SELECT cnt AS n_values, lo AS lo_cents, hi AS hi_cents,
       CAST((SELECT SUM(LEAST(GREATEST(c, lo), hi)) FROM v) AS BIGINT) AS wsum_cents,
       CAST((SELECT COUNT(*) FROM v WHERE c < lo) AS BIGINT) AS n_clipped_lo,
       CAST((SELECT COUNT(*) FROM v WHERE c > hi) AS BIGINT) AS n_clipped_hi
FROM b WHERE cnt > 0
"""


# ---------------------------------------------------------------------------
# distinct-set overlap: exact census + KMV (theta-style) sketch sibling
# ---------------------------------------------------------------------------


def distinct_user_overlap(sf_dir: str) -> pa.Table:
    """Exact distinct-set overlap between two event cohorts: how many
    distinct users clicked, how many purchased, and how many did BOTH —
    the set-intersection cardinality that sizes audience overlap (and the
    exact gate for the KMV sketch sibling below).

    Plan: per-batch arrow ``group_by(user)`` collapses to at most one
    (user, clicked, purchased) row per user per block, then ONE
    user-keyed groupby merges the flags (Max is the OR of 0/1 ints), then
    a per-batch count partial + driver fold (``batch_size=None`` — the
    default 4096-row re-slice on a wide pull is the measured 51 s trap,
    BASELINE rule). The shuffle carries three small ints per distinct
    user; nothing text-like or row-cardinality lands on the driver.

    Contract (mirrored in SQL): NULL user_id rows are excluded."""
    from ray.data.aggregate import Max

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.is_valid(t.column("user_id")),
                pc.is_in(t.column("event_type"), value_set=pa.array(["click", "purchase"])),
            )
        )
        flags = pa.table(
            {
                "user_id": t.column("user_id"),
                "c": pc.cast(pc.equal(t.column("event_type"), "click"), pa.int64()),
                "p": pc.cast(pc.equal(t.column("event_type"), "purchase"), pa.int64()),
            }
        )
        return flags.group_by("user_id").aggregate([("c", "max"), ("p", "max")]).rename_columns(
            ["user_id", "c", "p"]
        )

    per_user = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Max("c", alias_name="c"), Max("p", alias_name="p"))
    )

    def count_partial(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False)
        p = t.column("p").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "users_click": pa.array([int((c == 1).sum())], pa.int64()),
                "users_purchase": pa.array([int((p == 1).sum())], pa.int64()),
                "users_both": pa.array([int(((c == 1) & (p == 1)).sum())], pa.int64()),
            }
        )

    parts = [
        b
        for b in per_user.map_batches(count_partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ]
    if not parts:
        return pa.table(
            {
                "users_click": pa.array([0], pa.int64()),
                "users_purchase": pa.array([0], pa.int64()),
                "users_both": pa.array([0], pa.int64()),
            }
        )
    t = pa.concat_tables(parts)
    return pa.table(
        {
            name: pa.array([pc.sum(t.column(name)).as_py() or 0], pa.int64())
            for name in ("users_click", "users_purchase", "users_both")
        }
    )


DISTINCT_USER_OVERLAP_SQL = """
SELECT
  CAST(COUNT(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS BIGINT) AS users_click,
  CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS BIGINT) AS users_purchase,
  CAST((SELECT COUNT(*) FROM (
     SELECT user_id FROM events WHERE user_id IS NOT NULL AND event_type = 'click'
     INTERSECT
     SELECT user_id FROM events WHERE user_id IS NOT NULL AND event_type = 'purchase'
  )) AS BIGINT) AS users_both
FROM events WHERE user_id IS NOT NULL
"""

_KMV_K = 512


def distinct_user_overlap_kmv(sf_dir: str, k: int = _KMV_K) -> pa.Table:
    """KMV (theta-style) sketch estimate of the same three cardinalities —
    the mergeable bounded-memory path when the per-user census itself is
    the bottleneck (10^11 distinct keys): each side keeps only its k
    smallest md5(user) hashes, the sketches merge by union+truncate, and
    the intersection is estimated on the union sample below theta
    (standard KMV/theta intersection: |A∩B| ≈ (matching samples/k) ·
    est_union). Relative error ~1/sqrt(k) ≈ 4.4% at k=512;
    pytest-bounded against the exact sibling, which carries the gate.

    Plan: per-batch partial = per-side k smallest hashes (uint64 numpy
    partition), driver fold of ≤ k·blocks·2 hashes — same bounded-driver
    contract as every sketch here (HLL / CMS / MG / quantile / KMV)."""
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "event_type"])
    import hashlib as _h

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("user_id")))
        out = {}
        for side, label in (("click", "c"), ("purchase", "p")):
            s = t.filter(pc.equal(t.column("event_type"), side))
            ids = np.unique(s.column("user_id").to_numpy(zero_copy_only=False))
            hs = np.fromiter(
                (
                    int.from_bytes(_h.md5(str(i).encode("ascii")).digest()[:8], "big")
                    for i in ids
                ),
                dtype=np.uint64,
                count=len(ids),
            )
            if len(hs) > k:
                hs = np.partition(hs, k)[:k]
            out[label] = hs
        n = max(len(out["c"]), len(out["p"]))
        pad = np.iinfo(np.uint64).max
        return pa.table(
            {
                "hc": pa.array(np.pad(out["c"], (0, n - len(out["c"])), constant_values=pad), pa.uint64()),
                "hp": pa.array(np.pad(out["p"], (0, n - len(out["p"])), constant_values=pad), pa.uint64()),
            }
        )

    parts = [
        b
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ]
    pad = np.iinfo(np.uint64).max
    if parts:
        t = pa.concat_tables(parts)
        hc = np.unique(t.column("hc").to_numpy(zero_copy_only=False))
        hp = np.unique(t.column("hp").to_numpy(zero_copy_only=False))
        hc = hc[hc != pad][:k] if len(hc) else hc
        hp = hp[hp != pad][:k] if len(hp) else hp
    else:
        hc = hp = np.array([], dtype=np.uint64)

    def est_distinct(h: np.ndarray) -> int:
        if len(h) < k:
            return len(h)  # exact: the sketch saw everything
        theta = float(h[k - 1])
        return int(round((k - 1) * (2.0**64) / theta))

    est_c, est_p = est_distinct(hc), est_distinct(hp)
    if len(hc) < k and len(hp) < k:
        # both sketches saw their full key sets: intersection is exact
        both = int(np.isin(hc, hp).sum())
    else:
        # union sketch: k smallest of the merged streams (>= k elements
        # whenever either side saturated); count samples present in both
        hu = np.unique(np.concatenate((hc, hp)))[:k]
        theta = float(hu[-1])
        est_u = int(round((k - 1) * (2.0**64) / theta))
        both_samples = int(np.isin(hu[np.isin(hu, hc)], hp).sum())
        both = int(round(both_samples * est_u / len(hu)))
    return pa.table(
        {
            "users_click": pa.array([est_c], pa.int64()),
            "users_purchase": pa.array([est_p], pa.int64()),
            "users_both": pa.array([both], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# self-join size (F2 second frequency moment): exact census + AMS sketch
# ---------------------------------------------------------------------------


def events_selfjoin_size(sf_dir: str) -> pa.Table:
    """EXACT self-join cardinality of events on user_id — the F2 second
    frequency moment Σ c(k)²: what a user_id-keyed join or groupby would
    explode to. The query-planning diagnostic behind broadcast-vs-hash
    decisions and the exact gate for the AMS sketch sibling below.

    Plan: per-batch (user, n) census partials → ONE user-keyed groupby sum
    (keys-only) → per-batch Σn / Σn² partials → driver fold
    (``batch_size=None``). Contract (mirrored in SQL): NULL user_id rows
    are excluded. Overflow: Σn² ≤ (Σn)² < 2^63 up to ~3·10^9 rows per key
    — beyond that the census itself is the thing to salt first."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id"])

    def count_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("user_id")))
        return t.group_by("user_id").aggregate([([], "count_all")]).rename_columns(
            ["user_id", "n"]
        )

    sizes = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("n", alias_name="n"))
    )

    def f2_partial(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n_rows": pa.array([int(n.sum())], pa.int64()),
                "selfjoin_size": pa.array([int((n * n).sum())], pa.int64()),
            }
        )

    parts = [
        b
        for b in sizes.map_batches(f2_partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ]
    if not parts:
        return pa.table(
            {"n_rows": pa.array([0], pa.int64()), "selfjoin_size": pa.array([0], pa.int64())}
        )
    t = pa.concat_tables(parts)
    return pa.table(
        {
            "n_rows": pa.array([pc.sum(t.column("n_rows")).as_py() or 0], pa.int64()),
            "selfjoin_size": pa.array(
                [pc.sum(t.column("selfjoin_size")).as_py() or 0], pa.int64()
            ),
        }
    )


EVENTS_SELFJOIN_SIZE_SQL = """
WITH c AS (
  SELECT user_id, COUNT(*) AS n FROM events
  WHERE user_id IS NOT NULL GROUP BY user_id
)
SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(SUM(n * n) AS BIGINT) AS selfjoin_size
FROM c
"""

_AMS_R = 64


def events_selfjoin_size_ams(sf_dir: str, r: int = _AMS_R) -> pa.Table:
    """AMS sketch estimate of the same F2 — the bounded-memory path when
    even the (key, n) census is too hot to shuffle: each batch folds its
    local census into ``r`` signed counters Z_j = Σ_k s_j(k)·c(k) where
    s_j(k) is the j-th bit of md5(k) mapped to ±1 (one digest yields 128
    independent sign bits, so the hash cost is one md5 per distinct key
    per batch, not per counter). Counters merge by vector ADD — the
    classic mergeable linear sketch — and E[Z²] = F2; the estimate is the
    median of 4 group means of Z². No per-key state ever leaves a batch;
    the driver folds r int64s per block. Deterministic (md5 signs, no
    RNG). Pytest-bounded against the exact sibling, which carries the
    gate. Overflow: |Z| ≤ Σc = rows; Z² needs float at >3·10^9 rows —
    Z stays int64, the square is float64."""
    import hashlib as _h

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id"])
    assert r % 4 == 0 and r <= 128

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("user_id")))
        g = t.group_by("user_id").aggregate([([], "count_all")])
        ids = g.column("user_id").to_pylist()
        n = g.column("count_all").to_numpy(zero_copy_only=False).astype(np.int64)
        z = np.zeros(r, dtype=np.int64)
        if ids:
            # bit matrix: one md5 per key -> r sign bits
            digs = np.frombuffer(
                b"".join(_h.md5(str(i).encode("ascii")).digest() for i in ids),
                dtype=np.uint8,
            ).reshape(len(ids), 16)
            bits = np.unpackbits(digs, axis=1)[:, :r].astype(np.int64)  # (keys, r)
            signs = 2 * bits - 1
            z = (signs * n[:, None]).sum(axis=0)
        return pa.table({"z": pa.array(z, pa.int64()), "j": pa.array(np.arange(r), pa.int32())})

    parts = [
        b
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ]
    if not parts:
        return pa.table({"selfjoin_size_est": pa.array([0], pa.int64())})
    t = pa.concat_tables(parts)
    agg = t.group_by("j").aggregate([("z", "sum")]).sort_by("j")
    z = agg.column("z_sum").to_numpy(zero_copy_only=False).astype(np.float64)
    means = (z**2).reshape(4, r // 4).mean(axis=1)
    est = int(round(float(np.median(means))))
    return pa.table({"selfjoin_size_est": pa.array([est], pa.int64())})


# ---------------------------------------------------------------------------
# chi-square contingency census (independence-test numerators)
# ---------------------------------------------------------------------------


def events_type_dow_chi2(sf_dir: str) -> pa.Table:
    """Contingency census of event_type x day-of-cycle-week with the EXACT
    integer deviation numerator per cell: dev_num = n·O − R·C (the
    chi-square statistic's per-cell numerator before the /R·C scaling) —
    the independence screen ("does event mix drift by weekday?") a feature
    store runs before trusting a categorical split, with no float in the
    gate. dev_num = 0 for every cell ⟺ exact independence.

    Plan: the cell census is ONE (type, dow)-keyed groupby of per-batch
    partials; the marginals R/C/n fold from the CELLS on the driver
    (|types|×7 rows, never data rows). Overflow: |n·O| ≤ n² — int64-safe
    to ~3·10⁹ events; beyond that scale the census keys stay tiny but the
    numerator needs the float path (documented trade).

    Contract (mirrored in SQL): NULL event_type / ts rows are excluded;
    dow uses the positive-mod day cycle (epoch day % 7)."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "ts"])

    def cells(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("event_type")), pc.is_valid(t.column("ts")))
        )
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        dow = (us // 86_400_000_000) % 7
        g = pa.table(
            {
                "event_type": t.column("event_type"),
                "dow": pa.array(dow.astype(np.int64), pa.int64()),
            }
        )
        return g.group_by(["event_type", "dow"]).aggregate([([], "count_all")]).rename_columns(
            ["event_type", "dow", "obs"]
        )

    agg = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["event_type", "dow"])
        .aggregate(Sum("obs", alias_name="obs"))
    )
    parts = [
        b for b in agg.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "dow": pa.array([], pa.int64()),
            "obs": pa.array([], pa.int64()),
            "row_total": pa.array([], pa.int64()),
            "col_total": pa.array([], pa.int64()),
            "dev_num": pa.array([], pa.int64()),
        }
    )
    if not parts:
        return empty
    t = pa.concat_tables(parts)
    if t.num_rows == 0:
        return empty
    et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
    dow = t.column("dow").to_numpy(zero_copy_only=False).astype(np.int64)
    obs = t.column("obs").to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(obs.sum())
    r_keys, r_inv = np.unique(et, return_inverse=True)
    r_tot = np.bincount(r_inv, weights=obs).astype(np.int64)
    c_keys, c_inv = np.unique(dow, return_inverse=True)
    c_tot = np.bincount(c_inv, weights=obs).astype(np.int64)
    row_total = r_tot[r_inv]
    col_total = c_tot[c_inv]
    dev = n * obs - row_total * col_total
    return pa.table(
        {
            "event_type": t.column("event_type"),
            "dow": pa.array(dow, pa.int64()),
            "obs": pa.array(obs, pa.int64()),
            "row_total": pa.array(row_total, pa.int64()),
            "col_total": pa.array(col_total, pa.int64()),
            "dev_num": pa.array(dev, pa.int64()),
        }
    )


EVENTS_TYPE_DOW_CHI2_SQL = """
WITH c AS (
  SELECT event_type,
         ((epoch_us(ts) // 86400000000) % 7 + 7) % 7 AS dow
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
),
cells AS (
  SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS obs
  FROM c GROUP BY event_type, dow
)
SELECT event_type, dow, obs,
       CAST(SUM(obs) OVER (PARTITION BY event_type) AS BIGINT) AS row_total,
       CAST(SUM(obs) OVER (PARTITION BY dow) AS BIGINT) AS col_total,
       CAST(SUM(obs) OVER () * obs
            - SUM(obs) OVER (PARTITION BY event_type)
              * SUM(obs) OVER (PARTITION BY dow) AS BIGINT) AS dev_num
FROM cells
"""


# ---------------------------------------------------------------------------
# Lorenz / Gini inequality census (exact integer rank-weighted sum)
# ---------------------------------------------------------------------------


def cust_spend_lorenz(sf_dir: str) -> pa.Table:
    """Exact Lorenz/Gini ingredients over per-customer spend: customer
    count n, total spend S (cents), and the rank-weighted sum
    W = Σ rank_i · x_i (spend ascending) — Gini = (2W − (n+1)S) / (nS),
    left as integers so the gate is reduction-order-proof (the float Gini
    never hashes identically). The concentration audit ("do 1% of
    customers carry 50% of revenue?") that decides salting and sampling
    strategy — the weighted sibling of ``events_key_skew``.

    Plan: per-batch (cust, cents) partials → ONE cust-keyed groupby sum →
    per-batch VALUE census (spend → n_custs) → driver fold; W reads off
    the sorted census per value-run (Σ ranks of a k-run starting after
    ``cum`` is k·cum + k(k+1)/2) — no global sort of customers, and ties
    make the rank assignment irrelevant (equal x across any tie order).
    Driver state is the distinct-spend census (value-domain-bounded;
    documented). Overflow: W ≤ n²·x_max — int64-safe to ~10⁷ customers at
    cent scale; beyond, bucket the census first.

    Contract (mirrored in SQL): NULL custkey / totalprice rows excluded."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("o_custkey")), pc.is_valid(t.column("o_totalprice")))
        )
        g = pa.table(
            {"o_custkey": t.column("o_custkey"), "x": to_cents(t.column("o_totalprice"))}
        )
        return g.group_by("o_custkey").aggregate([("x", "sum")]).rename_columns(
            ["o_custkey", "x"]
        )

    spend = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("x", alias_name="x"))
    )

    def census(t: pa.Table) -> pa.Table:
        return t.group_by("x").aggregate([([], "count_all")]).rename_columns(["x", "k"])

    parts = [
        b
        for b in spend.map_batches(census, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ]
    if not parts:
        return pa.table(
            {
                "n_custs": pa.array([0], pa.int64()),
                "sum_cents": pa.array([0], pa.int64()),
                "rank_weighted": pa.array([0], pa.int64()),
            }
        )
    t = pa.concat_tables(parts).group_by("x").aggregate([("k", "sum")])
    x = t.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
    k = t.column("k_sum").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(x, kind="stable")
    x, k = x[order], k[order]
    cum = np.concatenate(([0], np.cumsum(k)[:-1]))
    rank_sums = k * cum + k * (k + 1) // 2
    return pa.table(
        {
            "n_custs": pa.array([int(k.sum())], pa.int64()),
            "sum_cents": pa.array([int((x * k).sum())], pa.int64()),
            "rank_weighted": pa.array([int((x * rank_sums).sum())], pa.int64()),
        }
    )


CUST_SPEND_LORENZ_SQL = """
WITH c AS (
  SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
  FROM orders WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY o_custkey
),
r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS i FROM c)
SELECT CAST(COUNT(*) AS BIGINT) AS n_custs,
       CAST(COALESCE(SUM(x), 0) AS BIGINT) AS sum_cents,
       CAST(COALESCE(SUM(i * x), 0) AS BIGINT) AS rank_weighted
FROM r
"""


# ---------------------------------------------------------------------------
# deterministic half-sample bootstrap replicates
# ---------------------------------------------------------------------------

_BOOT_R = 8


def order_revenue_bootstrap(sf_dir: str, r: int = _BOOT_R) -> pa.Table:
    """Half-sample bootstrap of total revenue: ``r`` deterministic
    replicates, replicate j containing every order whose j-th md5 hex
    nibble has its high bit set (independent p=½ coins from one digest —
    no RNG state, any worker or the SQL oracle draws identical
    replicates). The spread of the replicate sums is the
    uncertainty estimate a profiling pass attaches to its point totals;
    half-sampling (vs Poisson) keeps the inclusion rule one integer
    compare in BOTH engines, so the gate is exact.

    Plan: per-batch (replicate, n, sum) partials — each row folds into at
    most r counters inside the batch via one boolean matrix product-free
    masked sum; the driver folds r rows per block. Nothing shuffles.

    Contract (mirrored in SQL): NULL orderkey rows are excluded (no
    digest); NULL prices sum as 0 (COALESCE)."""
    import hashlib as _h

    assert r <= 16  # one md5 supplies 32 nibbles; 16 keeps the SQL mirror flat
    ds = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("o_orderkey")))
        ids = t.column("o_orderkey").to_pylist()
        cents = (
            pc.coalesce(to_cents(t.column("o_totalprice")), pa.scalar(0, pa.int64()))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        if ids:
            digs = np.frombuffer(
                b"".join(_h.md5(str(i).encode("ascii")).digest() for i in ids),
                dtype=np.uint8,
            ).reshape(len(ids), 16)
            # nibble j of the hex string: high nibble of byte j//2 when j
            # even, low nibble when odd; inclusion = high bit of the nibble
            nibs = np.empty((len(ids), r), dtype=np.uint8)
            for j in range(r):
                byte = digs[:, j // 2]
                nibs[:, j] = (byte >> 4) if j % 2 == 0 else (byte & 0xF)
            inc = nibs >= 8  # (rows, r)
        else:
            inc = np.zeros((0, r), dtype=bool)
        return pa.table(
            {
                "replicate": pa.array(np.arange(r, dtype=np.int64)),
                "n_orders": pa.array(inc.sum(axis=0).astype(np.int64)),
                "revenue_cents": pa.array(
                    (inc * cents[:, None]).sum(axis=0).astype(np.int64)
                ),
            }
        )

    folded_n = np.zeros(r, dtype=np.int64)
    folded_c = np.zeros(r, dtype=np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        rep = b.column("replicate").to_numpy(zero_copy_only=False)
        folded_n[rep] += b.column("n_orders").to_numpy(zero_copy_only=False)
        folded_c[rep] += b.column("revenue_cents").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "replicate": pa.array(np.arange(r, dtype=np.int64)),
            "n_orders": pa.array(folded_n),
            "revenue_cents": pa.array(folded_c),
        }
    )


def _bootstrap_sql(r: int = _BOOT_R) -> str:
    reps = "\nUNION ALL\n".join(
        f"""SELECT CAST({j} AS BIGINT) AS replicate,
       CAST(COUNT(*) FILTER (WHERE strpos('89abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)), {j + 1}, 1)) > 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(SUM(COALESCE(CAST(ROUND(o_totalprice*100) AS BIGINT), 0))
            FILTER (WHERE strpos('89abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)), {j + 1}, 1)) > 0), 0) AS BIGINT) AS revenue_cents
FROM orders WHERE o_orderkey IS NOT NULL"""
        for j in range(r)
    )
    return reps


ORDER_REVENUE_BOOTSTRAP_SQL = _bootstrap_sql()


# ---------------------------------------------------------------------------
# weighted quantiles (quantity-weighted price percentiles)
# ---------------------------------------------------------------------------

_WQ_BP = (2500, 5000, 7500)


def lineitem_weighted_quantiles(sf_dir: str) -> pa.Table:
    """Quantity-WEIGHTED price percentiles over lineitem: the value whose
    cumulative weight first reaches ceil(q·W) — what "median price" means
    when a 40-unit line should count 40× a 1-unit line. Completes the
    quantile matrix's weighted axis (discrete / interpolated ×
    global / grouped × unweighted / weighted), same ceil-rank rule as
    ``order_quantiles`` so the family shares one tie convention.

    Plan: per-batch (cents → Σweight) census partials, ONE cents-keyed
    groupby, driver fold of the value census (value-domain-bounded, the
    ``cust_spend_lorenz`` contract; a wider domain plugs into the
    bucket-histogram rank plan unchanged). Weights stay integers, so the
    rank rule is exact in both engines.

    Contract (mirrored in SQL): NULL price/quantity rows and non-positive
    quantities are excluded (a negative weight has no quantile meaning)."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        _pq(sf_dir, "lineitem"), columns=["l_extendedprice", "l_quantity"]
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.is_valid(t.column("l_extendedprice")),
                pc.and_(
                    pc.is_valid(t.column("l_quantity")),
                    pc.greater(t.column("l_quantity"), 0),
                ),
            )
        )
        g = pa.table(
            {
                "cents": to_cents(t.column("l_extendedprice")),
                "w": pc.cast(t.column("l_quantity"), pa.int64()),
            }
        )
        return g.group_by("cents").aggregate([("w", "sum")]).rename_columns(["cents", "w"])

    census = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cents")
        .aggregate(Sum("w", alias_name="w"))
    )
    vals: dict[int, int] = {}
    for b in census.iter_batches(batch_size=None, batch_format="pyarrow"):
        for r in b.to_pylist():
            vals[r["cents"]] = vals.get(r["cents"], 0) + r["w"]
    empty = pa.table(
        {"q_bp": pa.array([], pa.int64()), "cents": pa.array([], pa.int64())}
    )
    if not vals:
        return empty
    cents = np.array(sorted(vals), dtype=np.int64)
    w = np.array([vals[c] for c in cents], dtype=np.int64)
    cum = np.cumsum(w)
    tot = int(cum[-1])
    out_q, out_c = [], []
    for q in _WQ_BP:
        rank = max(1, (q * tot + 9999) // 10000)
        out_q.append(q)
        out_c.append(int(cents[np.searchsorted(cum, rank, side="left")]))
    return pa.table(
        {"q_bp": pa.array(out_q, pa.int64()), "cents": pa.array(out_c, pa.int64())}
    )


LINEITEM_WEIGHTED_QUANTILES_SQL = f"""
WITH c AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL AND l_quantity > 0
),
r AS (SELECT cents, SUM(w) AS wt FROM c GROUP BY cents),
s AS (SELECT cents, SUM(wt) OVER (ORDER BY cents) AS cum,
             (SELECT SUM(wt) FROM r) AS tot
      FROM r)
SELECT CAST(q_bp AS BIGINT) AS q_bp,
       (SELECT MIN(cents) FROM s
        WHERE cum >= greatest(1, (CAST(q_bp AS BIGINT) * tot + 9999) // 10000)) AS cents
FROM (VALUES {", ".join(f"({q})" for q in _WQ_BP)}) AS qs(q_bp), (SELECT DISTINCT tot FROM s) t
"""


# ---------------------------------------------------------------------------
# two-sample distribution drift (exact KS numerator)
# ---------------------------------------------------------------------------


def value_drift_ks(sf_dir: str) -> pa.Table:
    """Exact Kolmogorov–Smirnov numerator between the value distributions
    of two cohorts (click vs purchase events): ks_num = max over the
    merged value census of |cumA·n_B − cumB·n_A| — the distribution-drift
    test a feature store runs between snapshots, with KS = ks_num/(n_A·n_B)
    left as an exact integer so the gate never sees a float CDF.

    Plan: ONE pass builds both per-batch censuses as (cents, na, nb)
    partials; one cents-keyed groupby merges; the driver folds the sorted
    census (value-domain-bounded, documented) and takes the max. Overflow:
    |cum·n| ≤ n_A·n_B ≤ 10^18 at ~10^9 rows per side — at larger cohorts
    divide both counts by their gcd first (documented trade).

    Contract (mirrored in SQL): NULL value rows are excluded."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.is_valid(t.column("value")),
                pc.is_in(t.column("event_type"), value_set=pa.array(["click", "purchase"])),
            )
        )
        g = pa.table(
            {
                "cents": to_cents(t.column("value")),
                "na": pc.cast(pc.equal(t.column("event_type"), "click"), pa.int64()),
                "nb": pc.cast(pc.equal(t.column("event_type"), "purchase"), pa.int64()),
            }
        )
        return g.group_by("cents").aggregate([("na", "sum"), ("nb", "sum")]).rename_columns(
            ["cents", "na", "nb"]
        )

    census = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cents")
        .aggregate(Sum("na", alias_name="na"), Sum("nb", alias_name="nb"))
    )
    folded: dict[int, list] = {}
    for b in census.iter_batches(batch_size=None, batch_format="pyarrow"):
        for r in b.to_pylist():
            cur = folded.setdefault(r["cents"], [0, 0])
            cur[0] += r["na"]
            cur[1] += r["nb"]
    if not folded:
        return pa.table(
            {
                "n_click": pa.array([0], pa.int64()),
                "n_purchase": pa.array([0], pa.int64()),
                "ks_num": pa.array([0], pa.int64()),
            }
        )
    cents = sorted(folded)
    na = np.array([folded[c][0] for c in cents], dtype=np.int64)
    nb = np.array([folded[c][1] for c in cents], dtype=np.int64)
    ta, tb = int(na.sum()), int(nb.sum())
    ks = int(np.abs(np.cumsum(na) * tb - np.cumsum(nb) * ta).max())
    return pa.table(
        {
            "n_click": pa.array([ta], pa.int64()),
            "n_purchase": pa.array([tb], pa.int64()),
            "ks_num": pa.array([ks], pa.int64()),
        }
    )


VALUE_DRIFT_KS_SQL = """
WITH c AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(event_type = 'click' AS BIGINT) AS na,
         CAST(event_type = 'purchase' AS BIGINT) AS nb
  FROM events WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
),
r AS (SELECT cents, SUM(na) AS na, SUM(nb) AS nb FROM c GROUP BY cents),
s AS (SELECT SUM(na) OVER (ORDER BY cents) AS cuma,
             SUM(nb) OVER (ORDER BY cents) AS cumb,
             (SELECT SUM(na) FROM r) AS ta, (SELECT SUM(nb) FROM r) AS tb
      FROM r)
SELECT CAST(MAX(ta) AS BIGINT) AS n_click, CAST(MAX(tb) AS BIGINT) AS n_purchase,
       CAST(COALESCE(MAX(ABS(cuma * tb - cumb * ta)), 0) AS BIGINT) AS ks_num
FROM s
"""


# ---------------------------------------------------------------------------
# cross-table correlation: per-customer activity vs spend
# ---------------------------------------------------------------------------


def activity_spend_corr(sf_dir: str) -> pa.Table:
    """Does event activity correlate with order spend? Per customer
    matched across BOTH tables (events.user_id = orders.o_custkey), the
    exact integer correlation ingredients over (n_events, spend_cents):
    n, Σe, Σs (whole dollars), and the mergeable numerators cov_num = n·Σes − Σe·Σs,
    see_num = n·Σe² − (Σe)², sss_num = n·Σs² − (Σs)² (corr² =
    cov²/(see·sss) at display time) — the cross-TABLE sibling of
    ``price_qty_moments``' within-row moments.

    Plan: each side reduces to a per-key census first (count partials /
    cents-sum partials through one keyed groupby each); the size-gated
    ``auto_join`` matches the two censuses keys-only; per-batch moment
    partials fold on the driver. Nothing row-sized survives past the
    first map. Overflow: spend is profiled in WHOLE DOLLARS (cents blew
    past int64 in n·Σs² at just 150 matched customers — caught by the
    sf0.01 gate); dollars keep n·Σs² under 2^63 to ~10⁸ customers at
    fixture magnitudes (documented; mirrored ROUND in SQL).

    Contract (mirrored in SQL): NULL keys are excluded; inner-match
    semantics (customers present in only one table don't contribute);
    NULL prices sum as 0 (COALESCE)."""
    from ray.data.aggregate import Sum
    from ocr_ray.functions.joins import auto_join

    ev = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id"])

    def ev_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("user_id")))
        return t.group_by("user_id").aggregate([([], "count_all")]).rename_columns(
            ["user_id", "e"]
        )

    ev_census = (
        ev.map_batches(ev_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("e", alias_name="e"))
    )

    od = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])

    def od_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("o_custkey")))
        dollars = pc.cast(
            pc.round(t.column("o_totalprice"), round_mode="half_towards_infinity"),
            pa.int64(),
        )
        g = pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "s": pc.coalesce(dollars, pa.scalar(0, pa.int64())),
            }
        )
        return g.group_by("o_custkey").aggregate([("s", "sum")]).rename_columns(
            ["o_custkey", "s"]
        )

    od_census = (
        od.map_batches(od_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("s", alias_name="s"))
    )

    joined = auto_join(ev_census, od_census, on="user_id", right_on="o_custkey")

    tot = np.zeros(6, dtype=np.int64)  # n, Σe, Σs, Σee, Σss, Σes
    for b in joined.iter_batches(batch_size=None, batch_format="pyarrow"):
        e = b.column("e").to_numpy(zero_copy_only=False).astype(np.int64)
        s = b.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
        tot += np.array(
            [len(e), e.sum(), s.sum(), (e * e).sum(), (s * s).sum(), (e * s).sum()],
            dtype=np.int64,
        )
    n, se, ss, see, sss, ses = (int(x) for x in tot)
    return pa.table(
        {
            "n_custs": pa.array([n], pa.int64()),
            "sum_events": pa.array([se], pa.int64()),
            "sum_dollars": pa.array([ss], pa.int64()),
            "cov_num": pa.array([n * ses - se * ss], pa.int64()),
            "var_e_num": pa.array([n * see - se * se], pa.int64()),
            "var_s_num": pa.array([n * sss - ss * ss], pa.int64()),
        }
    )


ACTIVITY_SPEND_CORR_SQL = """
WITH e AS (
  SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS e FROM events
  WHERE user_id IS NOT NULL GROUP BY user_id
),
o AS (
  SELECT o_custkey AS k,
         CAST(SUM(COALESCE(CAST(ROUND(o_totalprice) AS BIGINT), 0)) AS BIGINT) AS s
  FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey
),
j AS (SELECT e.e, o.s FROM e JOIN o USING (k))
SELECT CAST(COUNT(*) AS BIGINT) AS n_custs,
       CAST(COALESCE(SUM(e), 0) AS BIGINT) AS sum_events,
       CAST(COALESCE(SUM(s), 0) AS BIGINT) AS sum_dollars,
       CAST(COALESCE(COUNT(*) * SUM(e * s) - SUM(e) * SUM(s), 0) AS BIGINT) AS cov_num,
       CAST(COALESCE(COUNT(*) * SUM(e * e) - SUM(e) * SUM(e), 0) AS BIGINT) AS var_e_num,
       CAST(COALESCE(COUNT(*) * SUM(s * s) - SUM(s) * SUM(s), 0) AS BIGINT) AS var_s_num
FROM j
"""


# ---------------------------------------------------------------------------
# robust statistics: exact median absolute deviation (MAD)
# ---------------------------------------------------------------------------

_MAD_BUCKET_CENTS = 10_000_00  # $10k-wide histogram buckets


def _exact_rank_cents(vals, rank: int) -> int:
    """Value at 1-based ``rank`` of the ascending ``cents`` order, without a
    global sort: fold the (bucket, count) histogram on the driver (tiny —
    O(distinct buckets)), locate the one rank-bearing bucket, and sort ONLY
    that bucket's values in a second streaming pass. ``vals`` must carry
    int64 columns ``cents`` and ``bucket`` where bucket = cents // B (trunc
    division yields contiguous, ordered intervals for either sign)."""
    import pandas as pd

    def census(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"bucket": t.column("bucket")})
            .group_by("bucket")
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["bucket", "c"])

    frames = [
        f
        for f in vals.map_batches(census, batch_format="pyarrow").iter_batches(
            batch_format="pandas", batch_size=None
        )
    ]
    hist = (
        pd.concat(frames).groupby("bucket", sort=True)["c"].sum()
        if frames
        else pd.Series(dtype=np.int64)
    )
    cum = 0
    target_bucket, local_rk = None, None
    for b, c in hist.items():
        if cum + int(c) >= rank:
            target_bucket, local_rk = int(b), rank - cum
            break
        cum += int(c)
    assert target_bucket is not None, "rank exceeds histogram total"

    picked = vals.map_batches(
        lambda t, _b=target_bucket: t.filter(pc.equal(t.column("bucket"), _b)),
        batch_format="pyarrow",
    )
    local = np.concatenate(
        [
            b.column("cents").to_numpy(zero_copy_only=False)
            for b in picked.iter_batches(batch_format="pyarrow", batch_size=None)
        ]
    )
    # np.partition: O(bucket) selection instead of a full local sort
    return int(np.partition(local, local_rk - 1)[local_rk - 1])


def order_price_mad(sf_dir: str) -> pa.Table:
    """Robust location/scale: the exact LOWER MEDIAN of order totals and the
    median absolute deviation around it — the outlier-resistant sibling of
    the moments family (one wild price corrupts mean/variance; median/MAD
    shrug it off, which is why data-quality monitors alarm on MAD).

    Both medians use the discrete lower-median rule (1-based rank
    ``(n+1)//2`` — no interpolation, so every value is an actual data point
    and the hash gate is float-free).

    Plan: two rounds of the bucket-histogram rank plan (no global sort
    anywhere). Round 1 histograms cents into $10k buckets, folds the tiny
    census on the driver, and sorts ONLY the median-bearing bucket. Round 2
    maps each value to |cents − median| (a map over the SAME materialized
    cents — no re-read) and repeats the rank extraction on deviations.
    Shuffle traffic is two tiny bucket censuses; the corpus never moves.

    Contract (mirrored in SQL): NULL prices are excluded; empty input
    returns zero rows."""
    orders = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("o_totalprice")))
        c = to_cents(t.column("o_totalprice"))
        return pa.table(
            {"cents": c, "bucket": pc.divide(c, pa.scalar(_MAD_BUCKET_CENTS))}
        )

    vals = orders.map_batches(cents, batch_format="pyarrow").materialize()
    n = vals.count()
    if n == 0:
        return pa.table(
            {
                "n_orders": pa.array([], pa.int64()),
                "median_cents": pa.array([], pa.int64()),
                "mad_cents": pa.array([], pa.int64()),
            }
        )
    med = _exact_rank_cents(vals, (n + 1) // 2)

    def devs(t: pa.Table, _m=med) -> pa.Table:
        d = pc.abs_checked(pc.subtract_checked(t.column("cents"), pa.scalar(_m)))
        return pa.table(
            {"cents": d, "bucket": pc.divide(d, pa.scalar(_MAD_BUCKET_CENTS))}
        )

    dev_vals = vals.map_batches(devs, batch_format="pyarrow")
    mad = _exact_rank_cents(dev_vals, (n + 1) // 2)
    return pa.table(
        {
            "n_orders": pa.array([n], pa.int64()),
            "median_cents": pa.array([med], pa.int64()),
            "mad_cents": pa.array([mad], pa.int64()),
        }
    )


ORDER_PRICE_MAD_SQL = """
WITH v AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders
  WHERE o_totalprice IS NOT NULL
),
n AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM v),
o AS (SELECT c, row_number() OVER (ORDER BY c) AS rn FROM v),
m AS (SELECT o.c AS med FROM o, n WHERE o.rn = (n.cnt + 1) // 2),
d AS (SELECT abs(v.c - m.med) AS dv FROM v, m),
od AS (SELECT dv, row_number() OVER (ORDER BY dv) AS rn FROM d)
SELECT n.cnt AS n_orders, m.med AS median_cents, CAST(od.dv AS BIGINT) AS mad_cents
FROM n, m, od WHERE od.rn = (n.cnt + 1) // 2
"""


# ---------------------------------------------------------------------------
# association rules over the pair census: confidence / lift as exact rationals
# ---------------------------------------------------------------------------


def part_pair_lift(sf_dir: str) -> Dataset:
    """Association-rule strength for the top co-purchased part pairs:
    support (``pair_n``), per-item basket counts, and LIFT as the exact
    integer rational ``lift_num / lift_den`` = ``N·c(a,b) / (c(a)·c(b))``
    (>1 means the pair co-occurs more than independence predicts — support
    alone just surfaces popular items; lift is the actual signal of a
    recommender census). Confidence(a→b) is ``pair_n / n_a``.

    Plan: reuses ``part_pair_counts``'s bounded top-k census (its result is
    ≤ k rows on the driver by construction), then computes the ≤ 2k item
    basket-counts with a broadcast ``is_in`` prune BEFORE any shuffle —
    the groupbys run over only the pruned pairs, never the corpus — and
    the global basket count N via the per-batch-distinct → grouped-count
    plan (``distinct_users``'s shape). Everything that moves is keys.

    Contract (mirrored in SQL): baskets are DISTINCT (order, part) with
    non-NULL keys; N counts baskets with ≥1 non-NULL part."""
    from ray.data.aggregate import Count, Sum

    top = part_pair_counts(sf_dir).take_all()
    if not top:
        e = pa.array([], pa.int64())
        return rd.from_arrow(
            pa.table(
                {
                    "part_a": e, "part_b": e, "pair_n": e,
                    "n_a": e, "n_b": e, "lift_num": e, "lift_den": e,
                }
            )
        )
    wanted = sorted({r["part_a"] for r in top} | {r["part_b"] for r in top})
    wanted_arr = pa.array(wanted, pa.int64())

    li = rd.read_parquet(_pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"])

    def prune_distinct(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("l_orderkey")), pc.is_valid(t.column("l_partkey")))
        )
        t = t.filter(pc.is_in(t.column("l_partkey"), value_set=wanted_arr))
        return t.group_by(["l_orderkey", "l_partkey"]).aggregate([])

    # global-exact pair dedup (bounded: only wanted parts' rows), then the
    # per-part basket count
    pairs = (
        li.map_batches(prune_distinct, batch_format="pyarrow")
        .groupby(["l_orderkey", "l_partkey"])
        .aggregate(Count(alias_name="_c"))
    )
    item_counts: dict[int, int] = {}
    for b in pairs.map_batches(
        lambda t: t.group_by(["l_partkey"]).aggregate([([], "count_all")]).rename_columns(
            ["l_partkey", "n"]
        ),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        for p, n in zip(b.column("l_partkey").to_pylist(), b.column("n").to_pylist()):
            item_counts[p] = item_counts.get(p, 0) + n

    def distinct_orders(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("l_orderkey")), pc.is_valid(t.column("l_partkey")))
        )
        return pa.table({"o": pc.unique(t.column("l_orderkey"))})

    n_baskets = (
        li.map_batches(distinct_orders, batch_format="pyarrow")
        .groupby("o")
        .aggregate(Count(alias_name="_c"))
        .count()
    )

    a = np.array([r["part_a"] for r in top], dtype=np.int64)
    b = np.array([r["part_b"] for r in top], dtype=np.int64)
    n = np.array([r["n"] for r in top], dtype=np.int64)
    na = np.array([item_counts[int(x)] for x in a], dtype=np.int64)
    nb = np.array([item_counts[int(x)] for x in b], dtype=np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "part_a": pa.array(a), "part_b": pa.array(b), "pair_n": pa.array(n),
                "n_a": pa.array(na), "n_b": pa.array(nb),
                "lift_num": pa.array(n * np.int64(n_baskets)),
                "lift_den": pa.array(na * nb),
            }
        )
    )


PART_PAIR_LIFT_SQL = f"""
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
),
nb AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM op),
ic AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM op GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(COUNT(*) AS BIGINT) AS pair_n
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  ORDER BY pair_n DESC, part_a, part_b
  LIMIT {_PAIR_TOPK}
)
SELECT part_a, part_b, pair_n,
       ca.c AS n_a, cb.c AS n_b,
       CAST(pair_n * nb.n AS BIGINT) AS lift_num,
       CAST(ca.c * cb.c AS BIGINT) AS lift_den
FROM pairs
CROSS JOIN nb
JOIN ic ca ON ca.l_partkey = pairs.part_a
JOIN ic cb ON cb.l_partkey = pairs.part_b
"""


# ---------------------------------------------------------------------------
# equi-width histogram with pinned under/overflow bins
# ---------------------------------------------------------------------------

_HIST_WIDTH_CENTS = 5_000  # $50 bins
_HIST_N_BINS = 20  # [0, $1000); below -> bin -1, at/above -> bin 20


def events_value_histogram(sf_dir: str) -> Dataset:
    """Equi-width histogram of event values: twenty $50 bins over
    [$0, $1000) plus explicit underflow (-1) and overflow (20) bins, each
    with row count and exact cents sum — the profiling primitive every
    column-stats pass starts from (``analyze_orders`` keeps min/max/NDV;
    this is the distribution's shape between them).

    Plan: one per-batch integer census (floor-divide + clip + arrow
    ``group_by``), ONE tiny groupby over at most 22 rows per batch. The
    corpus never shuffles; bin arithmetic is integer floor division so
    negative values land in underflow deterministically.

    Contract (mirrored in SQL): NULL values excluded; bin edges are
    [lo, hi) half-open; ``lo_cents`` is the bin's inclusive lower edge
    (NULL for the open-ended under/overflow bins)."""
    from ray.data.aggregate import Sum

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["value"])

    def census(t: pa.Table) -> pa.Table:
        c = to_cents(t.column("value"))
        c = c.filter(pc.is_valid(c)).to_numpy(zero_copy_only=False)
        b = np.clip(np.floor_divide(c, _HIST_WIDTH_CENTS), -1, _HIST_N_BINS)
        g = pa.table({"bin": pa.array(b, pa.int64()), "c": pa.array(c, pa.int64())})
        out = g.group_by(["bin"]).aggregate([("c", "count"), ("c", "sum")])
        return out.rename_columns(["bin", "n", "s"])

    agg = (
        events.map_batches(census, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="sum_cents"))
    )

    def finish(t: pa.Table) -> pa.Table:
        b = t.column("bin").to_numpy(zero_copy_only=False).astype(np.int64)
        inner = (b >= 0) & (b < _HIST_N_BINS)
        lo = np.where(inner, b * _HIST_WIDTH_CENTS, 0)
        return pa.table(
            {
                "bin": pa.array(b, pa.int64()),
                "lo_cents": pa.array(
                    np.ma.masked_array(lo, mask=~inner), pa.int64(), from_pandas=True
                ),
                "n": pc.cast(t.column("n"), pa.int64()),
                "sum_cents": pc.cast(t.column("sum_cents"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


EVENTS_VALUE_HISTOGRAM_SQL = f"""
WITH v AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS c FROM events WHERE value IS NOT NULL
),
b AS (
  -- DuckDB's // truncates toward zero on negatives; all negatives belong
  -- to the underflow bin, so pin that branch explicitly (floor parity)
  SELECT CASE WHEN c < 0 THEN -1
              ELSE LEAST(c // {_HIST_WIDTH_CENTS}, {_HIST_N_BINS}) END AS bin, c
  FROM v
)
SELECT bin,
       CASE WHEN bin >= 0 AND bin < {_HIST_N_BINS}
            THEN CAST(bin * {_HIST_WIDTH_CENTS} AS BIGINT) END AS lo_cents,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(c) AS BIGINT) AS sum_cents
FROM b GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Wald–Wolfowitz runs test ingredients: ordered global fold with boundary state
# ---------------------------------------------------------------------------

_RUNS_CHUNK_DAYS = 32  # date-bucket chunk key (monotone in order date)


def order_price_runs(sf_dir: str) -> pa.Table:
    """Wald–Wolfowitz runs-test ingredients over the order-price sequence in
    date order: counts above/below the global median and the number of
    sign RUNS. Far fewer runs than expected flags trend/autocorrelation,
    far more flags oscillation — the classic randomness audit on a metric
    stream, and the one aggregate family that genuinely needs GLOBAL
    ORDER, exercised here as a distributed ordered fold.

    Plan: the median comes from the bucket-histogram rank plan (no sort);
    signs are then folded in DATE-BUCKET chunks — each chunk (a 32-day
    range; the chunk key is monotone in the order key, so chunk
    concatenation IS the global order) counts its internal sign changes
    vectorized and ships 4 ints (first/last sign, internal runs, counts);
    the driver stitches chunk boundaries in order. No global sort node
    anywhere; driver state is O(chunks).

    Contract (mirrored in SQL): NULL date / price / orderkey rows are
    excluded; values EQUAL to the median are dropped (the standard runs-
    test convention); order is (o_orderdate, o_orderkey); empty sequence
    reports zero runs."""
    import pandas as pd

    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate", "o_totalprice"]
    )

    def cents(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(t.column("o_totalprice")), pc.is_valid(t.column("o_orderdate"))),
            pc.is_valid(t.column("o_orderkey")),
        )
        t = t.filter(m)
        c = to_cents(t.column("o_totalprice"))
        us = t.column("o_orderdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        days = np.floor_divide(us, 86_400_000_000)
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "days": pa.array(days, pa.int64()),
                "cents": c,
                "bucket": pc.divide(c, pa.scalar(_MAD_BUCKET_CENTS)),
            }
        )

    vals = orders.map_batches(cents, batch_format="pyarrow").materialize()
    n = vals.count()
    empty = pa.table(
        {
            "n_above": pa.array([0], pa.int64()),
            "n_below": pa.array([0], pa.int64()),
            "n_runs": pa.array([0], pa.int64()),
        }
    )
    if n == 0:
        return empty
    med = _exact_rank_cents(vals, (n + 1) // 2)

    def chunked(t: pa.Table, _m=med) -> pa.Table:
        keep = pc.not_equal(t.column("cents"), pa.scalar(_m))
        t = t.filter(keep)
        chunk = np.floor_divide(
            t.column("days").to_numpy(zero_copy_only=False), _RUNS_CHUNK_DAYS
        )
        return pa.table(
            {
                "chunk": pa.array(chunk, pa.int64()),
                "days": t.column("days"),
                "o_orderkey": t.column("o_orderkey"),
                "sign": pc.cast(pc.greater(t.column("cents"), pa.scalar(_m)), pa.int8()),
            }
        )

    def fold_chunk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["days", "o_orderkey"])
        s = df["sign"].to_numpy(np.int8)
        changes = int(np.count_nonzero(s[1:] != s[:-1]))
        return pd.DataFrame(
            {
                "chunk": [int(df["chunk"].iloc[0])],
                "first_sign": [int(s[0])],
                "last_sign": [int(s[-1])],
                "internal_runs": [changes + 1],
                "n_above": [int(s.sum())],
                "n_below": [int(len(s) - s.sum())],
            }
        )

    summaries = (
        vals.map_batches(chunked, batch_format="pyarrow")
        .groupby("chunk")
        .map_groups(fold_chunk, batch_format="pandas")
        .take_all()
    )
    if not summaries:
        return empty
    summaries.sort(key=lambda r: r["chunk"])
    n_above = sum(r["n_above"] for r in summaries)
    n_below = sum(r["n_below"] for r in summaries)
    runs = sum(r["internal_runs"] for r in summaries)
    for prev, cur in zip(summaries, summaries[1:]):
        if prev["last_sign"] == cur["first_sign"]:
            runs -= 1  # the boundary pair continues one run
    return pa.table(
        {
            "n_above": pa.array([n_above], pa.int64()),
            "n_below": pa.array([n_below], pa.int64()),
            "n_runs": pa.array([runs], pa.int64()),
        }
    )


ORDER_PRICE_RUNS_SQL = """
WITH v AS (
  SELECT o_orderkey,
         epoch_us(o_orderdate) // 86400000000 AS days,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
  WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
    AND o_orderkey IS NOT NULL
),
m AS (
  SELECT c AS med FROM (
    SELECT c, row_number() OVER (ORDER BY c) AS rn, COUNT(*) OVER () AS n FROM v
  ) WHERE rn = (n + 1) // 2
),
s AS (
  SELECT (v.c > m.med)::TINYINT AS sign, v.days, v.o_orderkey
  FROM v, m WHERE v.c != m.med
),
l AS (
  SELECT sign, lag(sign) OVER (ORDER BY days, o_orderkey) AS prev FROM s
)
SELECT CAST(COALESCE(SUM(sign), 0) AS BIGINT) AS n_above,
       CAST(COUNT(*) - COALESCE(SUM(sign), 0) AS BIGINT) AS n_below,
       CAST(CASE WHEN COUNT(*) = 0 THEN 0
                 ELSE 1 + COUNT(*) FILTER (WHERE prev IS NOT NULL AND sign != prev)
            END AS BIGINT) AS n_runs
FROM l
"""


# ---------------------------------------------------------------------------
# Herfindahl–Hirschman concentration index per market
# ---------------------------------------------------------------------------


def nation_supplier_hhi(sf_dir: str) -> Dataset:
    """Herfindahl–Hirschman concentration of supplier revenue within each
    nation, as the exact rational ``hhi_num / hhi_den`` = Σdᵢ² / (Σdᵢ)²
    over whole-dollar supplier revenues — the market-concentration
    complement of the Lorenz/Gini inequality census (``cust_spend_lorenz``):
    HHI weights the TOP of the distribution (a monopoly nation → 1).

    Dollars, not cents, keep the squared sums far from int64 range (the
    same overflow lesson the correlation op hit at 150 customers); the
    dollar truncation is toward zero in BOTH engines (DuckDB ``//``
    truncates; the Ray side mirrors it explicitly for negative revenue).

    Plan: per-batch (suppkey → cents) partials, ONE supplier-bounded
    groupby, nation lookup via broadcast ``auto_join``, then a driver fold
    of the supplier-bounded census (suppliers are a dimension, not the
    corpus). NULL nation is a real group.

    Contract (mirrored in SQL): NULL suppkey lineitems excluded; suppliers
    with no lineitems absent (inner join)."""
    from ray.data.aggregate import Sum

    from ocr_ray.functions.joins import auto_join

    li = rd.read_parquet(_pq(sf_dir, "lineitem"), columns=["l_suppkey", "l_extendedprice"])
    supp = rd.read_parquet(_pq(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("l_suppkey")))
        g = pa.table(
            {"l_suppkey": t.column("l_suppkey"), "c": to_cents(t.column("l_extendedprice"))}
        )
        return g.group_by(["l_suppkey"]).aggregate([("c", "sum")]).rename_columns(
            ["l_suppkey", "c"]
        )

    rev = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("c", alias_name="c"))
    )
    joined = auto_join(rev, supp, on="l_suppkey", right_on="s_suppkey")

    folds: dict = {}
    for b in joined.iter_batches(batch_format="pyarrow", batch_size=None):
        cs = b.column("c").to_numpy(zero_copy_only=False)
        for nk, c in zip(b.column("s_nationkey").to_pylist(), cs):
            c = int(c)
            d = c // 100 if c >= 0 else -((-c) // 100)  # trunc like SQL //
            n, s, sq = folds.get(nk, (0, 0, 0))
            folds[nk] = (n + 1, s + d, sq + d * d)

    keys = sorted(folds, key=lambda x: (x is None, x))
    return rd.from_arrow(
        pa.table(
            {
                "s_nationkey": pa.array(keys, pa.int32()),
                "n_suppliers": pa.array([folds[k][0] for k in keys], pa.int64()),
                "hhi_num": pa.array([folds[k][2] for k in keys], pa.int64()),
                "hhi_den": pa.array([folds[k][1] ** 2 for k in keys], pa.int64()),
            }
        )
    )


NATION_SUPPLIER_HHI_SQL = """
WITH r AS (
  SELECT l_suppkey, SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS c
  FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY 1
),
j AS (
  SELECT s.s_nationkey, r.c // 100 AS d
  FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
)
SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(d * d) AS BIGINT) AS hhi_num,
       CAST(SUM(d) * SUM(d) AS BIGINT) AS hhi_den
FROM j GROUP BY 1
"""


# ---------------------------------------------------------------------------
# lag-1 serial dependence (autocorrelation ingredients) per user
# ---------------------------------------------------------------------------


def user_value_autocorr(sf_dir: str) -> Dataset:
    """Per-user lag-1 autocorrelation ingredients over the ordered event
    value series — the serial-dependence profile (is a user's next spend
    predicted by their last?) that distinguishes drift (user_value_trend's
    OLS against *time*) from momentum (value against *previous value*).

    Exact integer outputs per the module contract: over consecutive pairs
    (x = value_t, y = value_{t+1}) in (ts, event_id) order,
    ``ac_num = n·Σxy − Σx·Σy`` and the two variance legs
    ``ac_den_x / ac_den_y``; the consumer forms r = num / sqrt(dx·dy).
    Pairing crosses block boundaries, so this is a co-located ordered scan
    (``grouped_scan`` by user), not a mergeable partial — the exchange
    carries (user_id, ts, event_id, cents) = 32 B/row.

    Contract (mirrored in SQL): NULL user_id / ts / value / event_id rows
    are excluded (key, order tiebreak, observation); users with fewer than
    two qualifying events emit no row. Overflow: the combine runs in
    decimal256 (exact wide integers — the Arrow analog of the DuckDB
    mirror's HUGEINT), so the n·Σxy / Σx·Σy products never wrap; only
    the FINAL differences are cast back to int64, raising loudly iff the
    RESULT itself exceeds int64 — the same failure DuckDB's
    CAST(huge AS BIGINT) produces. The results fit whenever
    n_pairs · |cents|max ≲ 6·10^9 per user (ac_den ≤ (n·c)²/4 ≤ 9.2·10^18)
    — e.g. 10^4 pairs at |cents| ≤ 6·10^5, or 2·10^5 pairs at ≤ 3·10^4;
    beyond that, fail-loud is the contract (never silent wrap)."""
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        m = pc.is_valid(t.column("user_id"))
        for c in ("ts", "event_id", "value"):
            m = pc.and_(m, pc.is_valid(t.column(c)))
        t = t.filter(m)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts": pc.cast(t.column("ts"), pa.int64()),
                "event_id": t.column("event_id"),
                "v": to_cents(t.column("value")),
            }
        )

    def scan(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_pairs": pa.array([], pa.int64()),
                "ac_num": pa.array([], pa.int64()),
                "ac_den_x": pa.array([], pa.int64()),
                "ac_den_y": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        t = t.sort_by(
            [("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")]
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        same = u[1:] == u[:-1]
        if not same.any():
            return empty
        x, y, uu = v[:-1][same], v[1:][same], u[:-1][same]
        pairs = (
            pa.table(
                {
                    "user_id": pa.array(uu),
                    "n": pa.array(np.ones(len(uu), np.int64)),
                    "sx": pa.array(x),
                    "sy": pa.array(y),
                    "sxy": pa.array(x * y),
                    "sxx": pa.array(x * x),
                    "syy": pa.array(y * y),
                }
            )
            .group_by(["user_id"])
            .aggregate(
                [("n", "sum"), ("sx", "sum"), ("sy", "sum"), ("sxy", "sum"),
                 ("sxx", "sum"), ("syy", "sum")]
            )
            .rename_columns(["user_id", "n", "sx", "sy", "sxy", "sxx", "syy"])
        )
        d = pa.decimal256(19, 0)
        n, sx, sy, sxy, sxx, syy = (
            pc.cast(pairs.column(c), d)
            for c in ("n", "sx", "sy", "sxy", "sxx", "syy")
        )

        def wide(prod_l, prod_r):
            return pc.cast(pc.subtract(prod_l, prod_r), pa.int64())

        return pa.table(
            {
                "user_id": pairs.column("user_id"),
                "n_pairs": pairs.column("n"),
                "ac_num": wide(pc.multiply(n, sxy), pc.multiply(sx, sy)),
                "ac_den_x": wide(pc.multiply(n, sxx), pc.multiply(sx, sx)),
                "ac_den_y": wide(pc.multiply(n, syy), pc.multiply(sy, sy)),
            }
        )

    pre = events.map_batches(prep, batch_format="pyarrow")
    return grouped_scan(pre, "user_id", scan, batch_format="pyarrow")


USER_VALUE_AUTOCORR_SQL = """
WITH p AS (
  SELECT user_id, ts, event_id, CAST(ROUND(value * 100) AS BIGINT) AS v
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND value IS NOT NULL
),
pairs AS (
  SELECT user_id, v AS x,
         lead(v) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
  FROM p
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT) AS ac_num,
       CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT) AS ac_den_x,
       CAST(COUNT(*) * SUM(y * y) - SUM(y) * SUM(y) AS BIGINT) AS ac_den_y
FROM pairs WHERE y IS NOT NULL
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# cross-table equi-join output-size estimate (the planner's question)
# ---------------------------------------------------------------------------


def orders_events_join_size(sf_dir: str) -> pa.Table:
    """EXACT output cardinality of the many-to-many equi-join
    ``orders.o_custkey = events.user_id`` WITHOUT running the join — the
    question a cost-based planner (or a pre-flight skew audit before a
    large join) asks: Σ_k c_orders(k)·c_events(k), plus the key-overlap
    census and the single largest contribution (the hot key a salted plan
    would split). events_selfjoin_size is the self-join (F2) special case;
    this is the two-table generalization.

    Plan: both sides reduce to keys-only per-batch censuses (one int64
    count per distinct key per batch), merge through one groupby each,
    then ONE C++ inner join of the two count tables — join traffic is
    bounded by distinct keys, never by rows. NULL keys never join
    (mirrored: SQL inner join drops them)."""
    from ray.data.aggregate import Sum as _Sum

    def census(path: str, col: str) -> pa.Table:
        ds = rd.read_parquet(path, columns=[col])

        def part(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t.column(col)))
            g = (
                pa.table({"k": t.column(col).cast(pa.int64())})
                .group_by(["k"])
                .aggregate([([], "count_all")])
            )
            return g.rename_columns(["k", "c"])

        agg = (
            ds.map_batches(part, batch_format="pyarrow")
            .groupby("k")
            .aggregate(_Sum("c", alias_name="c"))
        )
        out = []
        for b in agg.iter_batches(batch_size=None, batch_format="pyarrow"):
            out.append(b)
        return (
            pa.concat_tables(out)
            if out
            else pa.table({"k": pa.array([], pa.int64()), "c": pa.array([], pa.int64())})
        )

    lhs = census(_pq(sf_dir, "orders"), "o_custkey")
    rhs = census(_pq(sf_dir, "events"), "user_id")
    j = lhs.rename_columns(["k", "cl"]).join(
        rhs.rename_columns(["k", "cr"]), keys=["k"], join_type="inner"
    )
    prod = pc.multiply(j.column("cl"), j.column("cr"))
    est = int(pc.sum(prod).as_py() or 0)
    top = 0 if j.num_rows == 0 else int(pc.max(prod).as_py())
    return pa.table(
        {
            "est_rows": pa.array([est], pa.int64()),
            "n_keys_orders": pa.array([lhs.num_rows], pa.int64()),
            "n_keys_events": pa.array([rhs.num_rows], pa.int64()),
            "n_keys_both": pa.array([j.num_rows], pa.int64()),
            "top_key_rows": pa.array([top], pa.int64()),
        }
    )


ORDERS_EVENTS_JOIN_SIZE_SQL = """
WITH lo AS (
  SELECT CAST(o_custkey AS BIGINT) AS k, COUNT(*) AS cl
  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
),
re AS (
  SELECT CAST(user_id AS BIGINT) AS k, COUNT(*) AS cr
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
),
j AS (SELECT lo.cl * re.cr AS p FROM lo JOIN re USING (k))
SELECT CAST(COALESCE((SELECT SUM(p) FROM j), 0) AS BIGINT) AS est_rows,
       CAST((SELECT COUNT(*) FROM lo) AS BIGINT) AS n_keys_orders,
       CAST((SELECT COUNT(*) FROM re) AS BIGINT) AS n_keys_events,
       CAST((SELECT COUNT(*) FROM j) AS BIGINT) AS n_keys_both,
       CAST(COALESCE((SELECT MAX(p) FROM j), 0) AS BIGINT) AS top_key_rows
"""


def orders_events_join_size_ams(sf_dir: str, r: int = _AMS_R) -> pa.Table:
    """AMS sketch estimate of the cross-table join size — the textbook
    AMS inner-product use: sketch EACH side into r signed counters
    Z_j = Σ_k s_j(k)·c(k) with the SAME md5 sign function, and
    E[Z_o_j · Z_e_j] = Σ_k c_orders(k)·c_events(k) = the exact
    ``orders_events_join_size`` answer. Median of 4 group means tames the
    variance. The bounded-memory path when even the per-key census is too
    hot: each side ships r int64s per block, nothing per key. Deterministic
    (md5 signs); pytest-bounded against the exact sibling, which carries
    the driver gate. The estimator is unbiased but can go negative on
    near-disjoint sides — returned as-is, not clamped."""
    import hashlib as _h

    assert r % 4 == 0 and r <= 128

    def sketch(path: str, col: str) -> np.ndarray:
        ds = rd.read_parquet(path, columns=[col])

        def partial(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_valid(t.column(col)))
            g = t.group_by(col).aggregate([([], "count_all")])
            ids = [int(i) for i in g.column(col).to_pylist()]
            n = g.column("count_all").to_numpy(zero_copy_only=False).astype(np.int64)
            z = np.zeros(r, dtype=np.int64)
            if ids:
                digs = np.frombuffer(
                    b"".join(_h.md5(str(i).encode("ascii")).digest() for i in ids),
                    dtype=np.uint8,
                ).reshape(len(ids), 16)
                bits = np.unpackbits(digs, axis=1)[:, :r].astype(np.int64)
                signs = 2 * bits - 1
                z = (signs * n[:, None]).sum(axis=0)
            return pa.table(
                {"z": pa.array(z, pa.int64()), "j": pa.array(np.arange(r), pa.int32())}
            )

        parts = [
            b
            for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
                batch_size=None, batch_format="pyarrow"
            )
        ]
        if not parts:
            return np.zeros(r, dtype=np.int64)
        agg = pa.concat_tables(parts).group_by("j").aggregate([("z", "sum")]).sort_by("j")
        return agg.column("z_sum").to_numpy(zero_copy_only=False).astype(np.int64)

    zo = sketch(_pq(sf_dir, "orders"), "o_custkey")
    ze = sketch(_pq(sf_dir, "events"), "user_id")
    prod = (zo.astype(np.float64)) * (ze.astype(np.float64))
    means = prod.reshape(4, r // 4).mean(axis=1)
    est = int(round(float(np.median(means))))
    return pa.table({"join_size_est": pa.array([est], pa.int64())})


# ---------------------------------------------------------------------------
# A/B experiment readout (deterministic hash assignment + conversion lift)
# ---------------------------------------------------------------------------


def events_ab_lift(sf_dir: str) -> pa.Table:
    """Online-experiment readout over the event log: users are assigned a
    variant by the top bit of md5 of their decimal id (the deterministic,
    rerun-stable assignment an experimentation platform derives — no
    stored assignment table needed), and each variant reports its exact
    user count, converted-user count (any 'purchase' event) and purchase
    revenue in cents. The consumer forms lift = (c1/n1) / (c0/n0) from
    the integers; everything the gate hashes is exact.

    Plan: per-batch per-user partials (conv flag max, revenue sum) merge
    through ONE groupby(user); the variant census then folds two rows per
    block on the driver. Exact distinct-user semantics with no driver
    sets — the grouped-counts pattern. Contract (mirrored in SQL): NULL
    user_id rows are excluded; NULL event_type never converts; NULL value
    purchases add 0 revenue."""
    import hashlib as _h

    from ray.data.aggregate import Max as _Max

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "event_type", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("user_id")))
        is_p = pc.equal(pc.coalesce(t.column("event_type"), pa.scalar("")), "purchase")
        conv = pc.cast(is_p, pa.int64())
        rev = pc.if_else(
            pc.and_(is_p, pc.is_valid(t.column("value"))),
            to_cents(pc.coalesce(t.column("value"), pa.scalar(0.0))),
            pa.scalar(0, pa.int64()),
        )
        g = (
            pa.table({"user_id": t.column("user_id"), "conv": conv, "rev": rev})
            .group_by(["user_id"])
            .aggregate([("conv", "max"), ("rev", "sum")])
        )
        return g.rename_columns(["user_id", "conv", "rev"])

    per_user = (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(_Max("conv", alias_name="conv"), Sum("rev", alias_name="rev"))
    )

    def variant_census(t: pa.Table) -> pa.Table:
        ids = t.column("user_id").to_pylist()
        var = np.fromiter(
            (
                1 if int(_h.md5(str(i).encode("ascii")).hexdigest()[0], 16) >= 8 else 0
                for i in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        g = (
            pa.table(
                {
                    "variant": pa.array(var),
                    "n_users": pa.array(np.ones(len(ids), np.int64)),
                    "n_converted": t.column("conv"),
                    "revenue_cents": t.column("rev"),
                }
            )
            .group_by(["variant"])
            .aggregate([("n_users", "sum"), ("n_converted", "sum"), ("revenue_cents", "sum")])
        )
        return g.rename_columns(["variant", "n_users", "n_converted", "revenue_cents"])

    parts = [
        b
        for b in per_user.map_batches(variant_census, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ]
    if not parts:
        return pa.table(
            {
                "variant": pa.array([], pa.int64()),
                "n_users": pa.array([], pa.int64()),
                "n_converted": pa.array([], pa.int64()),
                "revenue_cents": pa.array([], pa.int64()),
            }
        )
    folded = (
        pa.concat_tables(parts)
        .group_by(["variant"])
        .aggregate([("n_users", "sum"), ("n_converted", "sum"), ("revenue_cents", "sum")])
    )
    return folded.rename_columns(["variant", "n_users", "n_converted", "revenue_cents"]).sort_by(
        "variant"
    )


EVENTS_AB_LIFT_SQL = """
WITH per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
         SUM(CASE WHEN event_type = 'purchase' AND value IS NOT NULL
                  THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS rev
  FROM events WHERE user_id IS NOT NULL
  GROUP BY user_id
)
SELECT CAST(CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                 IN ('8', '9', 'a', 'b', 'c', 'd', 'e', 'f')
            THEN 1 ELSE 0 END AS BIGINT) AS variant,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(conv) AS BIGINT) AS n_converted,
       CAST(SUM(rev) AS BIGINT) AS revenue_cents
FROM per_user GROUP BY 1
"""
