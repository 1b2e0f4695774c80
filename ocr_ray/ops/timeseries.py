"""Time-series operators: per-key gap-filled resampling, ordered funnel
analysis, and exact distributed NTILE.

These generalize the reference's per-upload timeline (each processed PDF is
one timestamped row, page.tsx state history) to the event-log shapes a
training-data pipeline meets: dense per-entity activity series (feature
windows need zero-filled gaps, not sparse counts), strictly-ordered
conversion funnels (the sequential-pattern sibling of purchase_followups),
and equal-frequency binning for curriculum bucketing.

Scale contract:
* ``user_days_gapfilled`` pre-aggregates (user, day) counts inside each batch
  before the one shuffle; the dense expansion happens AFTER co-location, so
  the shuffle carries one row per OBSERVED (user, day), never the zeros.
* ``session_funnel`` ships only per-partition stage counters to the driver
  (3 ints per partition); user ordering state stays inside the grouped scan.
* ``events_ntile`` reuses the bucket-histogram global-rank plan
  (ops/mlprep.events_global_rank): the driver holds one int per distinct
  coarse value bucket; no global sort node.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset

__all__ = [
    "user_days_gapfilled",
    "user_days_locf",
    "session_funnel",
    "events_ntile",
    "USER_DAYS_GAPFILLED_SQL",
    "USER_DAYS_LOCF_SQL",
    "SESSION_FUNNEL_SQL",
    "EVENTS_NTILE_SQL",
]

_US_PER_DAY = 86_400_000_000


def _pq(sf_dir: str, table: str) -> str:
    return f"{sf_dir}/{table}.parquet"


# ---------------------------------------------------------------------------
# gap-filled per-user daily activity series
# ---------------------------------------------------------------------------


def user_days_gapfilled(sf_dir: str) -> Dataset:
    """One row per (user, day) for every day between the user's first and
    last event, ``n_events`` = 0 where the user was silent — the dense
    resample that rolling-feature windows assume.

    Plan: per-batch (user, day) count partials (Arrow ``group_by``), ONE
    coarse-key shuffle co-locating each user, then a fully vectorized dense
    expansion (repeat/arange over span lengths + scatter of the observed
    counts). Days are positive-epoch floor buckets (``epoch_us // day``);
    NULL ts rows are dropped (mirrored in SQL)."""
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        # an entity series needs an entity and a time: NULL user_id or NULL
        # ts rows are dropped (mirrored in SQL; SQL GROUP BY would otherwise
        # form a NULL group that its own dense-join could never match)
        t = t.filter(
            pc.and_(pc.is_valid(t.column("ts")), pc.is_valid(t.column("user_id")))
        )
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // _US_PER_DAY
        g = (
            pa.table({"user_id": t.column("user_id"), "day": pa.array(day)})
            .group_by(["user_id", "day"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["user_id", "day", "n"])

    pre = events.map_batches(partial, batch_format="pyarrow")

    def dense(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "day": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        # merge cross-block partials, then expand each user's [lo, hi] span
        g = (
            t.group_by(["user_id", "day"])
            .aggregate([("n", "sum")])
            .sort_by([("user_id", "ascending"), ("day", "ascending")])
        )
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        d = g.column("day").to_numpy(zero_copy_only=False)
        n = g.column("n_sum").to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(u)
        starts = np.concatenate(([0], np.flatnonzero(u[1:] != u[:-1]) + 1))
        ends = np.concatenate((starts[1:], [m]))
        lo, hi = d[starts], d[ends - 1]
        lens = hi - lo + 1
        total = int(lens.sum())
        offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
        out_user = np.repeat(u[starts], lens)
        out_day = np.repeat(lo, lens) + (np.arange(total) - np.repeat(offs, lens))
        out_n = np.zeros(total, dtype=np.int64)
        grp = np.repeat(np.arange(len(starts)), ends - starts)
        out_n[offs[grp] + (d - lo[grp])] = n
        return pa.table(
            {
                "user_id": pa.array(out_user),
                "day": pa.array(out_day),
                "n_events": pa.array(out_n),
            }
        )

    return grouped_scan(pre, "user_id", dense, batch_format="pyarrow").select_columns(
        ["user_id", "day", "n_events"]
    )


USER_DAYS_GAPFILLED_SQL = f"""
WITH pts AS (
  SELECT user_id, epoch_us(ts) // {_US_PER_DAY} AS day
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
counts AS (SELECT user_id, day, count(*) AS n FROM pts GROUP BY 1, 2),
span AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM pts GROUP BY 1),
dense AS (SELECT user_id, unnest(generate_series(lo, hi)) AS day FROM span)
SELECT d.user_id, d.day, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
FROM dense d LEFT JOIN counts c USING (user_id, day)
"""


# ---------------------------------------------------------------------------
# gap-filled series with last-observation-carried-forward values
# ---------------------------------------------------------------------------


def user_days_locf(sf_dir: str) -> Dataset:
    """Dense per-user daily series where each day carries the LAST observed
    event value (forward fill / LOCF) — the standard imputation for feature
    series ("account balance as of day d").

    The day's observation is the value of the user's last event that day
    (max (ts, event_id) — exact argmax, not batch order). Per-batch partials
    keep one candidate row per (user, day); the final per-key scan resolves
    cross-block argmax, then forward-fills the gaps with a single
    ``np.repeat`` (no per-day loop). Values stay in exact integer cents so
    the gate is reduction-order independent."""
    from ocr_ray.functions.scalars import to_cents
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        # LOCF needs entity + time + observation: NULL user_id / ts / value
        # rows are not observations (mirrored in SQL — a NULL v would
        # otherwise become "the day's last value" that IGNORE NULLS skips)
        t = t.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(t.column("ts")), pc.is_valid(t.column("user_id"))
                ),
                pc.is_valid(t.column("value")),
            )
        )
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // _US_PER_DAY
        t = t.append_column("day", pa.array(day)).append_column(
            "v", to_cents(t.column("value"))
        )
        # one candidate per (user, day): the lexicographic argmax of
        # (ts, event_id) — sort then keep each run's last row
        t = t.sort_by(
            [
                ("user_id", "ascending"),
                ("day", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ]
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        d = t.column("day").to_numpy(zero_copy_only=False)
        n = len(u)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "day": pa.array([], pa.int64()),
                    "us": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                }
            )
        is_last = np.concatenate(((u[1:] != u[:-1]) | (d[1:] != d[:-1]), [True]))
        t = t.filter(pa.array(is_last))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "day": t.column("day"),
                "us": t.column("ts").cast(pa.int64()),
                "event_id": t.column("event_id"),
                "v": t.column("v"),
            }
        )

    pre = events.map_batches(partial, batch_format="pyarrow")

    def ffill(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "day": pa.array([], pa.int64()),
                "value_cents": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        # cross-block argmax per (user, day): same sort + keep-last
        t = t.sort_by(
            [
                ("user_id", "ascending"),
                ("day", "ascending"),
                ("us", "ascending"),
                ("event_id", "ascending"),
            ]
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        d = t.column("day").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        is_last = np.concatenate(((u[1:] != u[:-1]) | (d[1:] != d[:-1]), [True]))
        u, d, v = u[is_last], d[is_last], v[is_last]
        m = len(u)
        starts = np.concatenate(([0], np.flatnonzero(u[1:] != u[:-1]) + 1))
        ends = np.concatenate((starts[1:], [m]))
        # forward fill: each observed day's value repeats until the next
        # observed day (the user's last day repeats once)
        next_day = np.empty(m, dtype=np.int64)
        next_day[:-1] = d[1:]
        grp_last = ends - 1
        next_day[grp_last] = d[grp_last] + 1
        reps = next_day - d
        out_u = np.repeat(u, reps)
        out_v = np.repeat(v, reps)
        total = int(reps.sum())
        offs = np.concatenate(([0], np.cumsum(reps)[:-1]))
        out_day = np.repeat(d, reps) + (np.arange(total) - np.repeat(offs, reps))
        return pa.table(
            {
                "user_id": pa.array(out_u),
                "day": pa.array(out_day),
                "value_cents": pa.array(out_v),
            }
        )

    return grouped_scan(pre, "user_id", ffill, batch_format="pyarrow").select_columns(
        ["user_id", "day", "value_cents"]
    )


USER_DAYS_LOCF_SQL = f"""
WITH pts AS (
  SELECT user_id, epoch_us(ts) // {_US_PER_DAY} AS day, ts, event_id,
         CAST(ROUND(value*100) AS BIGINT) AS v
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL
),
lastv AS (
  SELECT user_id, day, v FROM (
    SELECT user_id, day, v,
           row_number() OVER (PARTITION BY user_id, day
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM pts
  ) WHERE rn = 1
),
span AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM pts GROUP BY 1),
dense AS (SELECT user_id, unnest(generate_series(lo, hi)) AS day FROM span),
joined AS (
  SELECT d.user_id, d.day, l.v
  FROM dense d LEFT JOIN lastv l USING (user_id, day)
)
SELECT user_id, day,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS value_cents
FROM joined
"""


# ---------------------------------------------------------------------------
# strictly-ordered conversion funnel
# ---------------------------------------------------------------------------

_FUNNEL_STAGES = ("view", "view_click", "view_click_purchase")


def session_funnel(sf_dir: str) -> pd.DataFrame:
    """Users reaching each funnel stage IN ORDER: a view, then a click
    strictly after the first view, then a purchase strictly after the first
    qualifying click.

    Grouped scan co-locates each user's events; per-partition pandas
    ``groupby().min()`` (C-speed) walks the three stages; only 3 counters
    per partition reach the driver (the size-gated local-solve pattern —
    Ray's Aggregate costs ~20 s fixed for a 3-row output)."""
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "ts", "event_type"]
    )

    def keep(t: pa.Table) -> pa.Table:
        # NULL user_id can't convert (mirrored: SQL fv filters it; a NULL
        # GROUP BY row would otherwise inflate the stage-1 count by one)
        return t.filter(
            pc.and_(
                pc.is_in(
                    t.column("event_type"), pa.array(["view", "click", "purchase"])
                ),
                pc.is_valid(t.column("user_id")),
            )
        )

    pre = events.map_batches(keep, batch_format="pyarrow")

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        fv = g[g["event_type"] == "view"].groupby("user_id")["ts"].min()
        c = g[g["event_type"] == "click"]
        after_view = c["ts"] > c["user_id"].map(fv)  # NaT compare -> False
        fc = c[after_view].groupby("user_id")["ts"].min()
        p = g[g["event_type"] == "purchase"]
        after_click = p["ts"] > p["user_id"].map(fc)
        fp = p[after_click].groupby("user_id")["ts"].min()
        return pd.DataFrame(
            {"n_view": [len(fv)], "n_click": [len(fc)], "n_purchase": [len(fp)]}
        )

    parts = grouped_scan(pre, "user_id", scan)
    tot = np.zeros(3, dtype=np.int64)
    for b in parts.iter_batches(batch_format="pandas"):
        tot += b[["n_view", "n_click", "n_purchase"]].to_numpy(np.int64).sum(axis=0)
    return pd.DataFrame({"stage": list(_FUNNEL_STAGES), "users": tot})


SESSION_FUNNEL_SQL = """
WITH fv AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY 1
),
fc AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN fv ON e.user_id = fv.user_id
  WHERE e.event_type = 'click' AND e.ts > fv.t GROUP BY 1
),
fp AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN fc ON e.user_id = fc.user_id
  WHERE e.event_type = 'purchase' AND e.ts > fc.t GROUP BY 1
)
SELECT stage, users FROM (VALUES
  ('view', (SELECT count(*) FROM fv)),
  ('view_click', (SELECT count(*) FROM fc)),
  ('view_click_purchase', (SELECT count(*) FROM fp))
) AS t(stage, users)
"""


# ---------------------------------------------------------------------------
# exact distributed NTILE (equal-frequency binning)
# ---------------------------------------------------------------------------

_NTILE_K = 4


def _ntile_of_rank(rank: np.ndarray, n: int, k: int) -> np.ndarray:
    """Exact SQL NTILE: the first ``n % k`` tiles get ``n // k + 1`` rows.
    Closed form over 1-based ranks, fully vectorized."""
    q, m = divmod(n, k)
    if q == 0:  # fewer rows than tiles: tile == rank
        return rank.copy()
    cut = (q + 1) * m
    return np.where(rank <= cut, (rank - 1) // (q + 1) + 1, m + (rank - cut - 1) // q + 1)


def events_ntile(sf_dir: str, *, k: int = _NTILE_K) -> Dataset:
    """Equal-frequency bin (NTILE(k) over (value, event_id)) per event — the
    curriculum-bucket / percentile-band assignment, computed without a global
    sort: the bucket-histogram census (ops/mlprep.events_global_rank plan)
    yields exact global offsets; each coarse value bucket sorts locally.

    ``value`` has no NULLs in the fixture but NULLS LAST is still honored
    via a +inf sentinel (matching the SQL ``ASC NULLS LAST``)."""
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        v = pc.fill_null(t.column("value"), np.inf).to_numpy(zero_copy_only=False)
        # sentinel assigned in the INT domain: int64-max is not float64-
        # representable, so routing it through np.where's float result
        # would overflow the cast and scramble NULL ordering
        bucket = np.full(len(v), np.iinfo(np.int64).max, dtype=np.int64)
        finite = np.isfinite(v)
        bucket[finite] = np.floor(v[finite]).astype(np.int64)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "value": pa.array(v),
                "bucket": pa.array(bucket),
            }
        )

    pre = events.map_batches(prep, batch_format="pyarrow")

    def census(t: pa.Table) -> pa.Table:
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(uniq), "n": pa.array(cnt.astype(np.int64))})

    frames = [
        f
        for f in pre.map_batches(census, batch_format="pyarrow").iter_batches(
            batch_format="pandas"
        )
    ]
    hist = (
        pd.concat(frames).groupby("bucket", sort=True)["n"].sum()
        if frames
        else pd.Series(dtype=np.int64)
    )
    buckets = hist.index.to_numpy(np.int64)
    counts = hist.to_numpy(np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    n_total = int(counts.sum())
    off_ref = ray.put((buckets, offsets))

    def tile(t: pa.Table) -> pa.Table:
        t = t.sort_by(
            [("bucket", "ascending"), ("value", "ascending"), ("event_id", "ascending")]
        )
        n = t.num_rows
        if n == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()), "tile": pa.array([], pa.int64())}
            )
        bks, offs = ray.get(off_ref)
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(b[1:] != b[:-1]) + 1))
        span = np.diff(np.concatenate((starts, [n])))
        base = offs[np.searchsorted(bks, b[starts])]
        rank = np.repeat(base, span) + (np.arange(n) - np.repeat(starts, span)) + 1
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "tile": pa.array(_ntile_of_rank(rank, n_total, k).astype(np.int64)),
            }
        )

    return grouped_scan(pre, "bucket", tile, batch_format="pyarrow").select_columns(
        ["event_id", "tile"]
    )


EVENTS_NTILE_SQL = f"""
SELECT event_id,
       CAST(ntile({_NTILE_K}) OVER (ORDER BY value ASC NULLS LAST, event_id) AS BIGINT) AS tile
FROM events
"""


# ---------------------------------------------------------------------------
# cohort retention matrix
# ---------------------------------------------------------------------------


def user_retention_cohorts(sf_dir: str) -> pd.DataFrame:
    """Retention matrix: users are cohorted by their FIRST active day;
    cell (cohort_day, day_offset) counts distinct users of that cohort
    active again ``offset`` days later — the engagement curve every
    event-log product reads daily.

    ONE shuffle: the coarse-key grouped scan co-locates each user, so the
    cohort (min day) and the distinct (cohort, offset) pairs are computed
    inside the partition in a single vectorized pass; only the deduped
    per-partition (cohort, offset, n) partials reach the driver (bounded by
    cohorts x offsets, not users — the size-gated local-solve pattern)."""
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("ts")), pc.is_valid(t.column("user_id")))
        )
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // _US_PER_DAY
        g = (
            pa.table({"user_id": t.column("user_id"), "day": pa.array(day)})
            .group_by(["user_id", "day"])
            .aggregate([])
        )
        return g

    pre = events.map_batches(partial, batch_format="pyarrow")

    def scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "cohort_day": pa.array([], pa.int64()),
                    "day_offset": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        # dedup cross-block (user, day) repeats, then per-user min day and
        # offsets — all boundary arithmetic on the sorted frame
        g = t.select(["user_id", "day"]).group_by(["user_id", "day"]).aggregate([])
        g = g.sort_by([("user_id", "ascending"), ("day", "ascending")])
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        d = g.column("day").to_numpy(zero_copy_only=False)
        m = len(u)
        starts = np.concatenate(([0], np.flatnonzero(u[1:] != u[:-1]) + 1))
        counts = np.diff(np.concatenate((starts, [m])))
        cohort = np.repeat(d[starts], counts)
        off = d - cohort
        pairs = (
            pa.table({"cohort_day": pa.array(cohort), "day_offset": pa.array(off)})
            .group_by(["cohort_day", "day_offset"])
            .aggregate([([], "count_all")])
        )
        return pairs.rename_columns(["cohort_day", "day_offset", "n"])

    parts = grouped_scan(pre, "user_id", scan, batch_format="pyarrow")
    frames = [b for b in parts.iter_batches(batch_format="pandas")]
    if not frames:
        return pd.DataFrame(
            {
                "cohort_day": pd.Series(dtype=np.int64),
                "day_offset": pd.Series(dtype=np.int64),
                "users": pd.Series(dtype=np.int64),
            }
        )
    out = (
        pd.concat(frames, ignore_index=True)
        .groupby(["cohort_day", "day_offset"], as_index=False)["n"]
        .sum()
        .rename(columns={"n": "users"})
        .astype({"cohort_day": np.int64, "day_offset": np.int64, "users": np.int64})
    )
    return out


USER_RETENTION_COHORTS_SQL = f"""
WITH pts AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_US_PER_DAY} AS day
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
coh AS (SELECT user_id, min(day) AS cohort_day FROM pts GROUP BY 1)
SELECT c.cohort_day, p.day - c.cohort_day AS day_offset, count(*) AS users
FROM pts p JOIN coh c ON p.user_id = c.user_id
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# partitioned NTILE (NTILE(k) OVER (PARTITION BY ... ORDER BY ...))
# ---------------------------------------------------------------------------


def events_ntile_by_type(sf_dir: str, *, k: int = _NTILE_K) -> Dataset:
    """Equal-frequency bins WITHIN each event_type — the partitioned-window
    form of ``events_ntile`` (per-segment curriculum bands).

    Same bucket-histogram plan with a two-level key: the census counts
    (type, bucket) cells, the driver derives per-type totals and exclusive
    offsets (one int per distinct cell — bounded by types x value buckets,
    not rows), and each co-located (type, bucket) run ranks locally. No
    global or per-type sort node."""
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        v = pc.fill_null(t.column("value"), np.inf).to_numpy(zero_copy_only=False)
        bucket = np.full(len(v), np.iinfo(np.int64).max, dtype=np.int64)
        finite = np.isfinite(v)
        bucket[finite] = np.floor(v[finite]).astype(np.int64)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "etype": pc.fill_null(t.column("event_type"), ""),
                "value": pa.array(v),
                "bucket": pa.array(bucket),
            }
        )

    pre = events.map_batches(prep, batch_format="pyarrow")

    def census(t: pa.Table) -> pa.Table:
        g = (
            t.select(["etype", "bucket"])
            .group_by(["etype", "bucket"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["etype", "bucket", "n"])

    frames = [
        f
        for f in pre.map_batches(census, batch_format="pyarrow").iter_batches(
            batch_format="pandas"
        )
    ]
    hist = (
        pd.concat(frames, ignore_index=True)
        .groupby(["etype", "bucket"], sort=True)["n"]
        .sum()
        .reset_index()
        if frames
        else pd.DataFrame({"etype": [], "bucket": [], "n": []})
    )
    # exclusive offsets within each type + per-type totals
    hist["off"] = hist.groupby("etype")["n"].cumsum() - hist["n"]
    offsets = {
        (r.etype, int(r.bucket)): int(r.off) for r in hist.itertuples()
    }
    totals = hist.groupby("etype")["n"].sum().astype(int).to_dict()
    ref = ray.put((offsets, totals))

    def tile(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()), "tile": pa.array([], pa.int64())}
            )
        t = t.sort_by(
            [
                ("etype", "ascending"),
                ("bucket", "ascending"),
                ("value", "ascending"),
                ("event_id", "ascending"),
            ]
        )
        offs, tots = ray.get(ref)
        et = t.column("etype").to_pylist()
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        n = t.num_rows
        new_run = np.ones(n, dtype=bool)
        etype_changed = np.array(
            [et[i] != et[i - 1] for i in range(1, n)], dtype=bool
        )
        new_run[1:] = (b[1:] != b[:-1]) | etype_changed
        starts = np.flatnonzero(new_run)
        span = np.diff(np.concatenate((starts, [n])))
        base = np.array([offs[(et[s], int(b[s]))] for s in starts], dtype=np.int64)
        rank = np.repeat(base, span) + (np.arange(n) - np.repeat(starts, span)) + 1
        out = np.empty(n, dtype=np.int64)
        # per-type closed form (types are contiguous after the sort)
        tstarts = np.flatnonzero(
            np.concatenate((np.ones(1, dtype=bool), etype_changed))
        )
        tspan = np.diff(np.concatenate((tstarts, [n])))
        for s, ln in zip(tstarts, tspan):
            out[s : s + ln] = _ntile_of_rank(rank[s : s + ln], tots[et[s]], k)
        return pa.table(
            {"event_id": t.column("event_id"), "tile": pa.array(out)}
        )

    # co-locate complete (etype, bucket) cells: partition on the pair key
    def add_pair(t: pa.Table) -> pa.Table:
        pairs = [
            f"{e}|{v}"
            for e, v in zip(
                t.column("etype").to_pylist(),
                t.column("bucket").to_numpy(zero_copy_only=False),
            )
        ]
        return t.append_column("pairkey", pa.array(pairs, pa.string()))

    return grouped_scan(
        pre.map_batches(add_pair, batch_format="pyarrow"), "pairkey", tile,
        batch_format="pyarrow",
    ).select_columns(["event_id", "tile"])


EVENTS_NTILE_BY_TYPE_SQL = f"""
SELECT event_id,
       CAST(ntile({_NTILE_K}) OVER (
         PARTITION BY COALESCE(event_type, '')
         ORDER BY value ASC NULLS LAST, event_id
       ) AS BIGINT) AS tile
FROM events
"""


# ---------------------------------------------------------------------------
# time-based RANGE window (trailing interval sum)
# ---------------------------------------------------------------------------

_TRAIL_US = 3_600_000_000  # 1 hour


def user_trailing_hour_spend(sf_dir: str) -> Dataset:
    """Per event: the user's total spend in the trailing ONE HOUR (a RANGE
    interval frame — the time-based sibling of the ROWS-frame
    ``user_rolling_spend``; rate limits, velocity features, fraud windows).

    Per co-located user segment: one prefix-sum + two vectorized
    ``searchsorted`` calls (needles = the whole segment) give every row's
    frame ends, including the RANGE peer rule (equal-ts rows share a frame
    end). Python cost is per SEGMENT, not per row. Rows lacking entity,
    time, or value are excluded up front (mirrored in SQL)."""
    from ocr_ray.functions.scalars import to_cents
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(t.column("ts")), pc.is_valid(t.column("user_id"))
                ),
                pc.is_valid(t.column("value")),
            )
        )
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "us": t.column("ts").cast(pa.int64()),
                "v": to_cents(t.column("value")),
            }
        )

    pre = events.map_batches(prep, batch_format="pyarrow")

    def trail(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "trail_cents": pa.array([], pa.int64()),
                }
            )
        t = t.sort_by(
            [("user_id", "ascending"), ("us", "ascending"), ("event_id", "ascending")]
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("us").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        n = len(u)
        starts = np.concatenate(([0], np.flatnonzero(u[1:] != u[:-1]) + 1))
        ends = np.concatenate((starts[1:], [n]))
        out = np.empty(n, dtype=np.int64)
        for s, e in zip(starts, ends):
            seg = ts[s:e]
            pref = np.concatenate(([0], np.cumsum(v[s:e])))
            lo = np.searchsorted(seg, seg - _TRAIL_US, side="left")
            hi = np.searchsorted(seg, seg, side="right")  # include equal-ts peers
            out[s:e] = pref[hi] - pref[lo]
        return pa.table(
            {"event_id": t.column("event_id"), "trail_cents": pa.array(out)}
        )

    return grouped_scan(pre, "user_id", trail, batch_format="pyarrow").select_columns(
        ["event_id", "trail_cents"]
    )


USER_TRAILING_HOUR_SPEND_SQL = """
WITH pts AS (
  SELECT event_id, user_id, ts, CAST(ROUND(value*100) AS BIGINT) AS v
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL
)
SELECT event_id,
       CAST(SUM(v) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS trail_cents
FROM pts
"""


# ---------------------------------------------------------------------------
# interval-overlap self-join (temporal conflict counting)
# ---------------------------------------------------------------------------

_WIN_US = 30 * 86_400_000_000  # 30-day window


def overlapping_order_windows(sf_dir: str) -> Dataset:
    """Per order: how many OTHER orders of the same customer have an
    overlapping 30-day service window [o_orderdate, o_orderdate + 30d] —
    the interval-overlap self-join (booking conflicts, concurrent-session
    counts, warranty overlap audits).

    A naive plan is an O(n²) self-join per customer. Here: co-locate by
    customer (``grouped_scan``), and per segment the classic two-pointer
    identity counts overlaps with two vectorized ``searchsorted`` calls —
    overlaps(i) = #(starts ≤ end_i) − #(ends < start_i) − 1 — so the cost
    is O(n log n) per segment and only (orderkey, count) rows leave.
    Intervals are closed on both ends (SQL mirror uses the same bounds)."""
    from ocr_ray.pipelines.conversation import grouped_scan

    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(t.column("o_custkey")),
                    pc.is_valid(t.column("o_orderdate")),
                ),
                pc.is_valid(t.column("o_orderkey")),
            )
        )
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "us": t.column("o_orderdate").cast(pa.int64()),
            }
        )

    pre = orders.map_batches(prep, batch_format="pyarrow")

    def overlaps(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "n_overlaps": pa.array([], pa.int64()),
                }
            )
        t = t.sort_by([("o_custkey", "ascending"), ("us", "ascending")])
        c = t.column("o_custkey").to_numpy(zero_copy_only=False)
        s = t.column("us").to_numpy(zero_copy_only=False)
        n = len(c)
        seg_starts = np.concatenate(([0], np.flatnonzero(c[1:] != c[:-1]) + 1))
        seg_ends = np.concatenate((seg_starts[1:], [n]))
        out = np.empty(n, dtype=np.int64)
        for a, b in zip(seg_starts, seg_ends):
            st = s[a:b]                      # sorted starts
            en = st + _WIN_US                # ends, same order (fixed width)
            lo = np.searchsorted(en, st, side="left")    # #(ends < my start)
            hi = np.searchsorted(st, en, side="right")   # #(starts <= my end)
            out[a:b] = hi - lo - 1
        return pa.table({"o_orderkey": t.column("o_orderkey"), "n_overlaps": pa.array(out)})

    return grouped_scan(pre, "o_custkey", overlaps, batch_format="pyarrow").select_columns(
        ["o_orderkey", "n_overlaps"]
    )


OVERLAPPING_ORDER_WINDOWS_SQL = """
WITH w AS (
  SELECT o_orderkey, o_custkey,
         CAST(o_orderdate AS TIMESTAMP) AS ts,
         CAST(o_orderdate AS TIMESTAMP) + INTERVAL 30 DAY AS te
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL AND o_orderkey IS NOT NULL
)
SELECT a.o_orderkey,
       CAST(COUNT(b.o_orderkey) AS BIGINT) AS n_overlaps
FROM w a
LEFT JOIN w b
  ON a.o_custkey = b.o_custkey AND a.o_orderkey <> b.o_orderkey
 AND a.ts <= b.te AND b.ts <= a.te
GROUP BY a.o_orderkey
"""


# ---------------------------------------------------------------------------
# time-weighted average (TWAP) per user
# ---------------------------------------------------------------------------


def user_twap(sf_dir: str) -> Dataset:
    """Per user: time-weighted value as an exact rational — numerator
    Σ value_cents × hold-seconds (each observation held until the next,
    LOCF-style) and denominator = observed span seconds. The financial
    TWAP / duration-weighted metric, kept in integers so the gate is
    hash-exact at any reduction order (the float quotient is one divide
    away for a consumer).

    Per co-located user segment: sort by (second, event_id), one diff +
    one dot product — Python cost per segment, not per row. Timestamps are
    floored to whole seconds BEFORE ordering (sub-second order must not
    change the pairing, so both engines order by the floored key)."""
    from ocr_ray.functions.scalars import to_cents
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(t.column("ts")), pc.is_valid(t.column("user_id"))
                ),
                pc.is_valid(t.column("value")),
            )
        )
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "s": pa.array(us // 1_000_000),
                "v": to_cents(t.column("value")),
            }
        )

    pre = events.map_batches(prep, batch_format="pyarrow")

    def twap(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "twap_num": pa.array([], pa.int64()),
                    "twap_den": pa.array([], pa.int64()),
                }
            )
        t = t.sort_by(
            [("user_id", "ascending"), ("s", "ascending"), ("event_id", "ascending")]
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        n = len(u)
        starts = np.concatenate(([0], np.flatnonzero(u[1:] != u[:-1]) + 1))
        ends = np.concatenate((starts[1:], [n]))
        nums = np.empty(len(starts), dtype=np.int64)
        dens = np.empty(len(starts), dtype=np.int64)
        for i, (a, b) in enumerate(zip(starts, ends)):
            hold = np.diff(s[a:b])
            nums[i] = int(np.dot(v[a : b - 1], hold)) if b - a > 1 else 0
            dens[i] = int(s[b - 1] - s[a])
        return pa.table(
            {
                "user_id": pa.array(u[starts]),
                "twap_num": pa.array(nums),
                "twap_den": pa.array(dens),
            }
        )

    return grouped_scan(pre, "user_id", twap, batch_format="pyarrow").select_columns(
        ["user_id", "twap_num", "twap_den"]
    )


USER_TWAP_SQL = """
WITH p AS (
  SELECT user_id, event_id,
         epoch_us(ts) // 1000000 AS s,
         CAST(ROUND(value*100) AS BIGINT) AS v
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), l AS (
  SELECT user_id, v, s,
         lead(s) OVER (PARTITION BY user_id ORDER BY s, event_id) AS s2
  FROM p
)
SELECT user_id,
       CAST(COALESCE(SUM(v * (s2 - s)), 0) AS BIGINT) AS twap_num,
       CAST(MAX(s) - MIN(s) AS BIGINT) AS twap_den
FROM l GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# keyless time-window join (bucket-replication stream-stream join)
# ---------------------------------------------------------------------------

_CONC_W = 60_000_000     # ±60 s window
_CONC_B = 120_000_000    # bucket width (>= window half-span x2)


def purchases_concurrent_events(sf_dir: str) -> Dataset:
    """Per purchase: how many events (ANY user — count includes the
    purchase itself) happened within ±60 s — the keyless stream-stream
    time join (load attribution, burst detection, co-occurrence counts).

    There is no entity key to co-locate on, so the plan is the published
    bucket-replication join: time is cut into buckets of twice the window
    half-span, every right-side event ships (bucket, ts) TRIPLES to its
    own and both neighbor buckets (3x replication of 16-byte pairs — the
    text/payload never moves), probes go only to their home bucket, and
    each co-located bucket answers its probes with two vectorized
    searchsorted calls. Every (probe, event) pair is evaluated in exactly
    one bucket, so counts are exact."""
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "ts", "event_type"]
    )

    def fan(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("ts")))
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        home = us // _CONC_B
        # right side: every valid-ts event, replicated to the 3 buckets a
        # probe there could need it from
        r_bucket = np.concatenate([home - 1, home, home + 1])
        r_us = np.concatenate([us, us, us])
        out = {
            "bucket": pa.array(r_bucket),
            "us": pa.array(r_us),
            "event_id": pa.nulls(len(r_us), pa.int64()),
            "probe": pa.array(np.zeros(len(r_us), np.int8())),
        }
        right = pa.table(out)
        p = t.filter(
            pc.and_(
                pc.equal(t.column("event_type"), "purchase"),
                pc.is_valid(t.column("event_id")),
            )
        )
        pus = p.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        probes = pa.table(
            {
                "bucket": pa.array(pus // _CONC_B),
                "us": pa.array(pus),
                "event_id": p.column("event_id"),
                "probe": pa.array(np.ones(len(pus), np.int8())),
            }
        )
        return pa.concat_tables([right, probes])

    fanned = events.map_batches(fan, batch_format="pyarrow")

    def answer(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "n_concurrent": pa.array([], pa.int64()),
                }
            )
        t = t.sort_by([("bucket", "ascending"), ("probe", "ascending"), ("us", "ascending")])
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        pr = t.column("probe").to_numpy(zero_copy_only=False)
        us = t.column("us").to_numpy(zero_copy_only=False)
        ids = t.column("event_id").to_numpy(zero_copy_only=False)
        n = len(b)
        starts = np.concatenate(([0], np.flatnonzero(b[1:] != b[:-1]) + 1))
        ends = np.concatenate((starts[1:], [n]))
        out_id, out_n = [], []
        for a, e in zip(starts, ends):
            seg_pr = pr[a:e]
            split = a + int(np.searchsorted(seg_pr, 1, side="left"))
            rights = us[a:split]          # sorted (probe=0 first, us asc)
            probes = us[split:e]
            if len(probes) == 0:
                continue
            lo = np.searchsorted(rights, probes - _CONC_W, side="left")
            hi = np.searchsorted(rights, probes + _CONC_W, side="right")
            out_id.append(ids[split:e])
            out_n.append((hi - lo).astype(np.int64))
        if not out_id:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "n_concurrent": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "event_id": pa.array(np.concatenate(out_id).astype(np.int64)),
                "n_concurrent": pa.array(np.concatenate(out_n)),
            }
        )

    return grouped_scan(fanned, "bucket", answer, batch_format="pyarrow").select_columns(
        ["event_id", "n_concurrent"]
    )


PURCHASES_CONCURRENT_EVENTS_SQL = """
WITH e AS (
  SELECT ts FROM events WHERE ts IS NOT NULL
), p AS (
  SELECT event_id, ts FROM events
  WHERE event_type = 'purchase' AND ts IS NOT NULL AND event_id IS NOT NULL
)
SELECT p.event_id, CAST(COUNT(*) AS BIGINT) AS n_concurrent
FROM p JOIN e
  ON e.ts >= p.ts - INTERVAL 1 MINUTE AND e.ts <= p.ts + INTERVAL 1 MINUTE
GROUP BY p.event_id
"""


def user_centered_spend(sf_dir: str) -> Dataset:
    """Per event: the user's spend over the CENTERED 3-row frame (ROWS
    BETWEEN 1 PRECEDING AND 1 FOLLOWING, ordered by ts then event_id) —
    the smoothing window; completes the frame-direction matrix (trailing
    ROWS, trailing RANGE, and now FOLLOWING).

    Same per-segment prefix-sum plan as the trailing frames; NULL values
    contribute 0 (COALESCE mirrored in SQL — the frame always contains the
    row itself, so the sum is never NULL)."""
    from ocr_ray.functions.scalars import to_cents
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("ts")), pc.is_valid(t.column("user_id")))
        )
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "us": t.column("ts").cast(pa.int64()),
                "v": pc.coalesce(to_cents(t.column("value")), pa.scalar(0, pa.int64())),
            }
        )

    pre = events.map_batches(prep, batch_format="pyarrow")

    def centered(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "centered_cents": pa.array([], pa.int64()),
                }
            )
        t = t.sort_by(
            [("user_id", "ascending"), ("us", "ascending"), ("event_id", "ascending")]
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        n = len(u)
        starts = np.concatenate(([0], np.flatnonzero(u[1:] != u[:-1]) + 1))
        ends = np.concatenate((starts[1:], [n]))
        out = np.empty(n, dtype=np.int64)
        for a, b in zip(starts, ends):
            seg = v[a:b]
            pref = np.concatenate(([0], np.cumsum(seg)))
            i = np.arange(b - a)
            lo = np.maximum(i - 1, 0)
            hi = np.minimum(i + 1, b - a - 1)
            out[a:b] = pref[hi + 1] - pref[lo]
        return pa.table(
            {"event_id": t.column("event_id"), "centered_cents": pa.array(out)}
        )

    return grouped_scan(pre, "user_id", centered, batch_format="pyarrow").select_columns(
        ["event_id", "centered_cents"]
    )


USER_CENTERED_SPEND_SQL = """
WITH p AS (
  SELECT event_id, user_id, ts,
         COALESCE(CAST(ROUND(value*100) AS BIGINT), 0) AS v
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
)
SELECT event_id,
       CAST(SUM(v) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING
       ) AS BIGINT) AS centered_cents
FROM p
"""


# ---------------------------------------------------------------------------
# Markov transition census over per-user event sequences
# ---------------------------------------------------------------------------


def event_type_transitions(sf_dir: str) -> Dataset:
    """Count of each (prev_type -> event_type) transition across all
    per-user event sequences — the first-order Markov census behind
    session-path analysis and next-event models.

    Determinism under ties: rows are ordered by (ts, event_id, event_type)
    within a user. Any rows still tied after that are IDENTICAL in every
    column the census reads, so the pair multiset — and the counts — are
    order-invariant, NULL-riddled input included (the SQL mirror uses the
    same ORDER BY). First-row-of-user pairs are excluded by row position
    (rn > 1), NOT by prev IS NOT NULL — a genuinely NULL previous type is
    a real transition into a NULL-type census cell.

    Plan: coarse-key grouped scan by user (one pandas pass per PARTITION,
    boundary-masked), per-partition census partials, one null-safe groupby
    over (prev_type, event_type) rows — the shuffle carries distinct census
    cells, never events."""
    from ocr_ray.functions.nullsafe import null_safe_groupby_agg
    from ocr_ray.pipelines.conversation import grouped_scan
    from ray.data.aggregate import Sum

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )

    def census(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["ts", "event_id", "event_type"], na_position="last")
        # stable user grouping that treats NaN user ids as one group
        codes, _ = pd.factorize(df["user_id"], use_na_sentinel=False)
        order = np.argsort(codes, kind="stable")
        df = df.iloc[order]
        codes = codes[order]
        cur = df["event_type"].to_numpy()
        prev = np.roll(cur, 1)
        same_user = np.zeros(len(codes), dtype=bool)
        if len(codes) > 1:
            same_user[1:] = codes[1:] == codes[:-1]
        part = pd.DataFrame({"prev_type": prev[same_user], "event_type": cur[same_user]})
        g = (
            part.groupby(["prev_type", "event_type"], dropna=False)
            .size()
            .reset_index(name="n")
        )
        def as_str(col: pd.Series) -> pa.Array:
            # NULL types surface as NaN floats in pandas object columns
            return pa.array([None if pd.isna(v) else v for v in col], pa.string())

        return pa.table(
            {
                "prev_type": as_str(g["prev_type"]),
                "event_type": as_str(g["event_type"]),
                "n": pa.array(g["n"].to_numpy(np.int64)),
            }
        )

    partials = grouped_scan(events, "user_id", census)
    return null_safe_groupby_agg(
        partials, ["prev_type", "event_type"], Sum("n", alias_name="n")
    )


EVENT_TYPE_TRANSITIONS_SQL = """
WITH s AS (
  SELECT event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id, event_type
         ) AS prev_type,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts, event_id, event_type
         ) AS rn
  FROM events
)
SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE rn > 1
GROUP BY prev_type, event_type
"""


# ---------------------------------------------------------------------------
# SCD Type-2 validity intervals from an append-only change log
# ---------------------------------------------------------------------------


def cust_order_intervals(sf_dir: str) -> Dataset:
    """Slowly-changing-dimension (type 2) build: each customer's orders as
    a validity interval table — valid_from = the order's date, valid_to =
    the NEXT order's date, with the warehouse-standard high-date sentinel
    (9999-12-31) marking each customer's current row (a total column also
    keeps interval predicates sargable — no COALESCE at query time). The
    standard change-log -> dimension-history transform of a loader.

    Determinism under ties: per-customer order is (valid_from, o_orderkey,
    cents); rows still tied are identical in every emitted column, so the
    output multiset is order-invariant. NULL custkey is one partition, NULL
    dates sort last (both engines' default)."""
    from ocr_ray.functions.scalars import to_cents
    from ocr_ray.pipelines.conversation import grouped_scan

    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "valid_from": t.column("o_orderdate"),
                "cents": to_cents(t.column("o_totalprice")),
            }
        )

    def intervals(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["valid_from", "o_orderkey", "cents"], na_position="last")
        codes, _ = pd.factorize(df["o_custkey"], use_na_sentinel=False)
        order = np.argsort(codes, kind="stable")
        df = df.iloc[order]
        codes = codes[order]
        vf = df["valid_from"].to_numpy()
        vt = np.roll(vf, -1)
        last_of_user = np.ones(len(codes), dtype=bool)
        if len(codes) > 1:
            last_of_user[:-1] = codes[:-1] != codes[1:]
        vt = vt.copy()
        # sentinel for last-of-customer AND for a NULL next-date (COALESCE)
        vt[last_of_user | pd.isna(vt)] = np.datetime64("9999-12-31T00:00:00", "us")
        out = df[["o_orderkey", "o_custkey", "cents"]].copy()
        out["valid_from"] = vf
        out["valid_to"] = vt
        return pa.Table.from_pandas(out, preserve_index=False)

    return grouped_scan(orders.map_batches(prep, batch_format="pyarrow"), "o_custkey", intervals)


CUST_ORDER_INTERVALS_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
       o_orderdate AS valid_from,
       COALESCE(
         lead(o_orderdate) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT)
         ),
         TIMESTAMP '9999-12-31 00:00:00'
       ) AS valid_to
FROM orders
"""


# ---------------------------------------------------------------------------
# rolling distinct: trailing-7-day active users per day
# ---------------------------------------------------------------------------

_TRAIL_WINDOW_DAYS = 7


def active_users_trailing_7d(sf_dir: str) -> Dataset:
    """Exact COUNT(DISTINCT user) over a trailing 7-day window per day —
    the windowed-distinct aggregate SQL window functions cannot express
    (no DISTINCT in OVER clauses) and engines usually approximate.

    Plan: distinct (user, day) pairs per batch, ONE coarse-key shuffle
    co-locating each user, then the <= 7-day cover expansion AND the
    per-user cover dedup both run locally in the partition — each user
    contributes exactly one count to each day it covers, so the partition
    emits (day, n) census partials and a tiny groupby(day) finishes. The
    only corpus-sized exchange carries the distinct (user, day) pairs
    (two int64s each), never raw events and never the 7x expansion; cost
    scales with active pairs, not event count or window length. NULL
    users/timestamps are excluded (SQL mirror identical); output days run
    to max(day)+6, the full span the window defines."""
    from ocr_ray.pipelines.conversation import grouped_scan
    from ray.data.aggregate import Sum

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts"))))
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // _US_PER_DAY  # numpy // floors (pre-1970-safe)
        p = pa.table({"user_id": t.column("user_id"), "day": pa.array(day)})
        return p.group_by(["user_id", "day"]).aggregate([])

    def cover_census(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            e = pa.array([], pa.int64())
            return pa.table({"day": e, "n_users": e})
        # cross-batch dedup of this partition's (user, day) pairs, then
        # expand each to its cover days and dedup per user — both local
        g = t.select(["user_id", "day"]).group_by(["user_id", "day"]).aggregate([])
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        d = g.column("day").to_numpy(zero_copy_only=False)
        cov_u = np.repeat(u, _TRAIL_WINDOW_DAYS)
        cov_d = np.repeat(d, _TRAIL_WINDOW_DAYS) + np.tile(
            np.arange(_TRAIL_WINDOW_DAYS, dtype=np.int64), len(d)
        )
        order = np.lexsort((cov_d, cov_u))
        cu, cd = cov_u[order], cov_d[order]
        first = np.empty(len(cu), dtype=bool)
        first[0] = True
        np.not_equal(cu[1:], cu[:-1], out=first[1:])
        first[1:] |= cd[1:] != cd[:-1]
        days, counts = np.unique(cd[first], return_counts=True)
        return pa.table(
            {"day": pa.array(days), "n_users": pa.array(counts.astype(np.int64))}
        )

    partials = grouped_scan(
        events.map_batches(pairs, batch_format="pyarrow"),
        "user_id",
        cover_census,
        batch_format="pyarrow",
    )
    return partials.groupby("day").aggregate(Sum("n_users", alias_name="n_users"))


ACTIVE_USERS_TRAILING_7D_SQL = """
WITH p AS (
  SELECT DISTINCT user_id,
         CAST((epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000) % 86400000000))
              // 86400000000 AS BIGINT) AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
cov AS (SELECT user_id, day + g.i AS day FROM p CROSS JOIN range(7) AS g(i))
SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM cov GROUP BY day
"""


# ---------------------------------------------------------------------------
# longest consecutive-day activity streak per user
# ---------------------------------------------------------------------------


def user_longest_streak(sf_dir: str) -> Dataset:
    """Each user's longest run of consecutive active days — gaps-and-islands
    applied PER ENTITY (the engagement metric behind retention features).

    Plan: distinct (user, day) pairs per batch, one coarse-key shuffle
    co-locating each user, then a fully vectorized run-length scan per
    partition (runs break where the user changes or the day step != 1) and
    a per-user max — no window node, no per-user Python. NULL users/ts are
    excluded (SQL identical)."""
    from ocr_ray.pipelines.conversation import grouped_scan
    from ray.data.aggregate import Max

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts"))))
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // _US_PER_DAY
        p = pa.table({"user_id": t.column("user_id"), "day": pa.array(day)})
        return p.group_by(["user_id", "day"]).aggregate([])

    def streaks(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            e = pa.array([], pa.int64())
            return pa.table({"user_id": e, "streak": e})
        g = t.select(["user_id", "day"]).group_by(["user_id", "day"]).aggregate([])
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        d = g.column("day").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        brk = np.empty(len(u), dtype=bool)
        brk[0] = True
        np.not_equal(u[1:], u[:-1], out=brk[1:])
        brk[1:] |= (d[1:] - d[:-1]) != 1
        run_id = np.cumsum(brk) - 1
        run_len = np.bincount(run_id)
        run_user = u[np.flatnonzero(brk)]
        # per-user max over this partition's runs (user is fully co-located)
        uu, inv = np.unique(run_user, return_inverse=True)
        best = np.zeros(len(uu), np.int64)
        np.maximum.at(best, inv, run_len)
        return pa.table({"user_id": pa.array(uu), "streak": pa.array(best)})

    partials = grouped_scan(
        events.map_batches(pairs, batch_format="pyarrow"),
        "user_id",
        streaks,
        batch_format="pyarrow",
    )
    return partials.groupby("user_id").aggregate(Max("streak", alias_name="streak"))


USER_LONGEST_STREAK_SQL = """
WITH p AS (
  SELECT DISTINCT user_id,
         CAST((epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000) % 86400000000))
              // 86400000000 AS BIGINT) AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
g AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM p
),
runs AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len FROM g GROUP BY user_id, grp
)
SELECT user_id, MAX(len) AS streak FROM runs GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# rolling order-statistic window — trailing 5-order discrete median
# ---------------------------------------------------------------------------


def user_rolling_median_spend(sf_dir: str) -> Dataset:
    """Per-row rolling DISCRETE MEDIAN (``quantile_disc(0.5)`` over ROWS
    BETWEEN 4 PRECEDING AND CURRENT ROW) of each customer's order totals in
    (o_orderdate, o_orderkey) order — the order-statistic member of the
    window family (robust spend baseline for anomaly scoring; the SUM/AVG
    frames can't see through one huge order, the median can).

    Plan: co-locate by customer via ``grouped_scan`` (coarse-key
    partitions); inside each frame the window never exceeds 5 rows, so the
    scan builds an (n, 5) lag matrix with an int64-max sentinel outside the
    frame, one vectorized row-sort, and picks index (k-1)//2 — DuckDB's
    quantile_disc convention for q=0.5 (lower median), pytest-pinned. No
    per-group Python, exact integer cents throughout.

    Non-null contract (mirrored in SQL): rows with NULL o_custkey /
    o_orderkey / o_orderdate / o_totalprice are excluded — the window is
    keyed and ordered on all four, and SQL's in-window NULL-skip semantics
    (quantile over a shrunken frame) has no stable vectorized equivalent.
    """
    from ocr_ray.functions.scalars import to_cents
    from ocr_ray.pipelines.conversation import grouped_scan

    orders = rd.read_parquet(
        _pq(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(t.column("o_orderkey")), pc.is_valid(t.column("o_custkey"))),
            pc.and_(pc.is_valid(t.column("o_orderdate")), pc.is_valid(t.column("o_totalprice"))),
        )
        t = t.filter(m)
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "o_orderdate": t.column("o_orderdate"),
                "cents": to_cents(t.column("o_totalprice")),
            }
        )

    _W = 5
    _SENT = np.iinfo(np.int64).max

    def med(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        n = len(df)
        v = df["cents"].to_numpy(dtype=np.int64)
        cust = df["o_custkey"].to_numpy(dtype=np.int64)
        idx = np.arange(n)
        first = np.r_[True, cust[1:] != cust[:-1]] if n else np.zeros(0, bool)
        seg_start = np.maximum.accumulate(np.where(first, idx, 0))
        offs = idx - seg_start
        k = np.minimum(offs + 1, _W)
        M = np.full((n, _W), _SENT, dtype=np.int64)
        for j in range(_W):
            if n > j:
                M[j:, j] = v[: n - j]
            M[offs < j, j] = _SENT
        M.sort(axis=1)
        med_v = M[idx, (k - 1) // 2] if n else np.zeros(0, np.int64)
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy(dtype=np.int64),
                "o_custkey": cust,
                "cents": v,
                "med5_cents": med_v,
            }
        )

    pre = orders.map_batches(prep, batch_format="pyarrow")
    return grouped_scan(pre, "o_custkey", med)


USER_ROLLING_MEDIAN_SPEND_SQL = """
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents, o_orderdate
  FROM orders
  WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
    AND o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
)
SELECT o_orderkey, o_custkey, cents,
       CAST(quantile_disc(cents, 0.5) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS med5_cents
FROM o
"""


# ---------------------------------------------------------------------------
# event-stream debounce (coalesce repeated signals per (user, type))
# ---------------------------------------------------------------------------

_DEBOUNCE_US = _US_PER_DAY  # collapse repeats within 1 day (domain-tunable)


def events_debounce(sf_dir: str) -> Dataset:
    """Stream-cleaning debounce: within each (user_id, event_type), keep an
    event only if it is the first or arrives more than ``_DEBOUNCE_US``
    after the PREVIOUS ARRIVAL (lag-based gap, not chained-kept-state —
    the SQL-expressible variant; a chained debounce is order-dependent on
    its own output and has no window equivalent). This is the
    repeated-signal collapse pass of telemetry ingestion.

    Plan: co-locate by user via ``grouped_scan``; one sort per coarse
    partition on (user, type, ts, event_id) — a total order, so results
    are partitioning-independent — then a vectorized neighbor-gap scan in
    int64 microseconds. Non-null contract mirrored in SQL: NULL in any of
    the four columns excludes the row (keys and order both need it)."""
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "ts"]
    )

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(t.column("event_id")), pc.is_valid(t.column("user_id"))),
            pc.and_(pc.is_valid(t.column("event_type")), pc.is_valid(t.column("ts"))),
        )
        return t.filter(m)

    def deb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_type", "ts", "event_id"])
        n = len(df)
        if n == 0:
            return df[["event_id", "user_id", "event_type", "ts"]]
        ts = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        u = df["user_id"].to_numpy(dtype=np.int64)
        et = df["event_type"].to_numpy()
        same = np.r_[False, (u[1:] == u[:-1]) & (et[1:] == et[:-1])]
        gap = np.r_[np.int64(0), ts[1:] - ts[:-1]]
        keep = (~same) | (gap > _DEBOUNCE_US)
        return df.loc[keep, ["event_id", "user_id", "event_type", "ts"]]

    pre = events.map_batches(prep, batch_format="pyarrow")
    return grouped_scan(pre, "user_id", deb)


EVENTS_DEBOUNCE_SQL = f"""
WITH e AS (
  SELECT event_id, user_id, event_type, ts FROM events
  WHERE event_id IS NOT NULL AND user_id IS NOT NULL
    AND event_type IS NOT NULL AND ts IS NOT NULL
),
l AS (
  SELECT *, lag(ts) OVER (PARTITION BY user_id, event_type
                          ORDER BY ts, event_id) AS prev_ts
  FROM e
)
SELECT event_id, user_id, event_type, ts FROM l
WHERE prev_ts IS NULL OR date_diff('microsecond', prev_ts, ts) > {_DEBOUNCE_US}
"""


# ---------------------------------------------------------------------------
# session path census (sequence mining: top event-type journeys)
# ---------------------------------------------------------------------------

_PATH_MAX_STEPS = 8
_PATH_TOP_K = 20


def session_paths(sf_dir: str) -> pd.DataFrame:
    """Top-``_PATH_TOP_K`` most common session JOURNEYS: each session's
    first ``_PATH_MAX_STEPS`` event types joined with '>' (sessionization =
    the ``events_sessions`` rule, gap > 1h splits), counted corpus-wide —
    the product-analytics "top paths" report, and the sequence-census
    shape the transition matrix (``event_type_transitions``) can't see
    (whole journeys, not adjacent pairs).

    Plan: one coarse-key ``grouped_scan`` co-locates each user; inside a
    partition the session scan is vectorized (cumsum breaks, rank-in-
    session via running first-index) and paths materialize with ZERO
    per-session Python — a ListArray wrap over the kept rows +
    ``pc.binary_join`` (the conv_texts trick). Each partition emits its
    local (path, n) census; one tiny ``groupby(path)`` folds partials and
    a per-block local top-k bounds the driver merge to k rows per block.
    Ties at the cut are deterministic: (n DESC, path ASC), mirrored.

    Non-null contract (mirrored): rows with NULL user_id / ts / event_id /
    event_type are excluded — all four key or order the scan."""
    from ray.data.aggregate import Sum

    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "event_id", "ts", "event_type"]
    )

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts"))),
            pc.and_(pc.is_valid(t.column("event_id")), pc.is_valid(t.column("event_type"))),
        )
        return t.filter(m)

    def census(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        n = len(g)
        if n == 0:
            return pd.DataFrame({"path": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        uid = g["user_id"].to_numpy(dtype=np.int64)
        us = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        new = np.ones(n, dtype=bool)
        new[1:] = (uid[1:] != uid[:-1]) | (us[1:] - us[:-1] > 3_600_000_000)
        idx = np.arange(n)
        first_idx = np.maximum.accumulate(np.where(new, idx, 0))
        rn = idx - first_idx
        keep = rn < _PATH_MAX_STEPS
        sess = np.cumsum(new)[keep]
        et = g["event_type"].to_numpy()[keep]
        starts = np.flatnonzero(np.r_[True, sess[1:] != sess[:-1]])
        offsets = np.r_[starts, len(sess)].astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(et, pa.string())
        )
        paths = pc.binary_join(lists, ">")
        vc = pa.table({"path": paths}).group_by(["path"]).aggregate([([], "count_all")])
        return pd.DataFrame(
            {"path": vc.column("path").to_pandas(),
             "n": vc.column("count_all").to_pandas().astype("int64")}
        )

    partials = grouped_scan(events.map_batches(prep, batch_format="pyarrow"),
                            "user_id", census)
    folded = partials.groupby("path").aggregate(Sum("n", alias_name="n_sessions"))

    def local_topk(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            t, sort_keys=[("n_sessions", "descending"), ("path", "ascending")]
        )
        return t.take(order[:_PATH_TOP_K])

    blocks = folded.map_batches(local_topk, batch_format="pyarrow").take_all()
    top = sorted(blocks, key=lambda r: (-int(r["n_sessions"]), r["path"]))[:_PATH_TOP_K]
    return pd.DataFrame(
        {"path": [r["path"] for r in top],
         "n_sessions": np.array([r["n_sessions"] for r in top], np.int64)}
    )


SESSION_PATHS_SQL = f"""
WITH x AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL AND event_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), y AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM x
), r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, sess_id
                               ORDER BY ts, event_id) AS rn
  FROM y
), p AS (
  SELECT user_id, sess_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM r WHERE rn <= {_PATH_MAX_STEPS} GROUP BY user_id, sess_id
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM p GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT {_PATH_TOP_K}
"""


# ---------------------------------------------------------------------------
# interval coalescing — merge overlapping validity windows per entity
# ---------------------------------------------------------------------------


def cust_merged_windows(sf_dir: str) -> Dataset:
    """Coalesce each customer's overlapping 30-day order windows into
    maximal merged intervals (islands in continuous time) — the interval
    union every entitlement/coverage/session system needs: n overlapping
    service windows become one [min start, max end] row with the order
    count and cents total they cover.

    Plan: co-locate by customer (``grouped_scan`` — one Python call per
    coarse partition, not per customer), sort within the segment, and the
    classic cummax sweep marks island breaks (start > running max of prior
    ends; closed intervals, touch = merge) — all vectorized pandas/numpy;
    only (customer, island) aggregate rows leave the scan. Tie safety: a
    tied start implies an identical (start, end) pair here (end is
    derived), so island assignment is input-order invariant. NULL
    custkey/orderdate rows are WHERE-dropped in both engines; an
    all-NULL-price island reports a NULL total (min_count=1 mirror of SQL
    SUM)."""
    import pandas as pd

    from ocr_ray.functions.scalars import to_cents
    from ocr_ray.pipelines.conversation import grouped_scan

    day_us = 86_400_000_000
    orders = rd.read_parquet(
        _pq(sf_dir, "orders"), columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("o_custkey")), pc.is_valid(t.column("o_orderdate")))
        )
        s = pc.cast(t.column("o_orderdate"), pa.int64())
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "s": s,
                "e": pc.add(s, pa.scalar(30 * day_us, pa.int64())),
                "c": to_cents(t.column("o_totalprice")),
            }
        )

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "s"], kind="mergesort").reset_index(drop=True)
        prev_max = df.groupby("o_custkey", sort=False)["e"].cummax().shift()
        first = ~df["o_custkey"].eq(df["o_custkey"].shift())
        brk = first | (df["s"] > prev_max.fillna(-(2**62)))
        df["island"] = brk.cumsum()
        g = df.groupby(["o_custkey", "island"], sort=False)
        out = pd.DataFrame(
            {
                "o_custkey": g["o_custkey"].first(),
                "island_start": g["s"].min(),
                "island_end": g["e"].max(),
                "n_orders": g["s"].size().astype("int64"),
                "total_c": g["c"].sum(min_count=1),
            }
        ).reset_index(drop=True)
        return out

    merged = grouped_scan(orders.map_batches(prep, batch_format="pyarrow"), "o_custkey", scan)

    def finish(t: pa.Table) -> pa.Table:
        tc = t.column("total_c")
        if pa.types.is_floating(tc.type):
            # pandas carries an all-NULL-cents island as NaN float — restore
            # the SQL NULL before the exact-integer cast
            tc = pc.if_else(pc.is_nan(tc), pa.scalar(None, tc.type), tc)
        tc = pc.cast(tc, pa.int64())
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "island_start": pc.cast(t.column("island_start"), pa.timestamp("us")),
                "island_end": pc.cast(t.column("island_end"), pa.timestamp("us")),
                "n_orders": pc.cast(t.column("n_orders"), pa.int64()),
                "total_c": tc,
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


CUST_MERGED_WINDOWS_SQL = """
WITH w AS (
  SELECT o_custkey, o_orderdate AS s, o_orderdate + INTERVAL 30 DAY AS e,
         CAST(ROUND(o_totalprice*100) AS BIGINT) AS c
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
),
m AS (
  SELECT *, MAX(e) OVER (PARTITION BY o_custkey ORDER BY s
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM w
),
g AS (
  SELECT *, SUM(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
              OVER (PARTITION BY o_custkey ORDER BY s ROWS UNBOUNDED PRECEDING) AS island
  FROM m
)
SELECT o_custkey, MIN(s) AS island_start, MAX(e) AS island_end,
       CAST(COUNT(*) AS BIGINT) AS n_orders, CAST(SUM(c) AS BIGINT) AS total_c
FROM g
GROUP BY o_custkey, island
"""


# ---------------------------------------------------------------------------
# multi-touch (linear) attribution — interval-stabbing credit assignment
# ---------------------------------------------------------------------------

_ATTR_WINDOW_US = 3_600_000_000  # 1 hour
_ATTR_SCALE = 1_000_000


def purchase_linear_attribution(sf_dir: str) -> Dataset:
    """Linear multi-touch attribution: every purchase's cents are split
    EQUALLY across the same user's clicks in the trailing hour
    (pts - 1h < cts <= pts) — the many-to-many sibling of the last-touch
    as-of ``purchase_attribution``. Output per credited click:
    (event_id, touches, credit_e6) where credit is the exact integer
    ``cents * 1e6 // k`` summed over covering purchases (// truncates
    toward zero in DuckDB — mirrored for hostile negative values).

    Plan: one coarse-key grouped scan on user_id. Per user segment the
    purchase windows are stabbed against the sorted click timestamps with
    two vectorized ``searchsorted`` calls, and per-click credit falls out
    of a difference array + cumsum (O(n log n) per user, no pair
    expansion — a purchase covering 10^4 clicks adds 2 array writes, not
    10^4 rows). Id-keyed contract: NULL event_id/user_id/ts rows drop
    (NULL pid would fuse distinct purchases into one SQL count partition)."""
    from ocr_ray.functions.scalars import to_cents
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"),
        columns=["event_id", "user_id", "event_type", "ts", "value"],
    )

    def prep(t: pa.Table) -> pa.Table:
        is_p = pc.fill_null(pc.equal(t.column("event_type"), "purchase"), False)
        is_c = pc.fill_null(pc.equal(t.column("event_type"), "click"), False)
        keep = pc.and_(
            pc.and_(pc.or_(is_p, is_c), pc.is_valid(t.column("event_id"))),
            pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts"))),
        )
        # purchases additionally need a value to credit
        keep = pc.and_(keep, pc.or_(is_c, pc.is_valid(t.column("value"))))
        t = t.filter(keep)
        is_p2 = pc.equal(t.column("event_type"), "purchase")
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "is_p": is_p2,
                "us": t.column("ts").cast(pa.int64()),
                "cents": to_cents(
                    pc.if_else(is_p2, t.column("value"), pa.scalar(0.0))
                ),
            }
        )

    pre = events.map_batches(prep, batch_format="pyarrow")
    _empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "touches": pa.array([], pa.int64()),
            "credit_e6": pa.array([], pa.int64()),
        }
    )

    def attribute(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        t = t.sort_by(
            [("user_id", "ascending"), ("us", "ascending"), ("event_id", "ascending")]
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        us = t.column("us").to_numpy(zero_copy_only=False)
        isp = t.column("is_p").to_numpy(zero_copy_only=False).astype(bool)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        n = len(u)
        starts = np.concatenate(([0], np.flatnonzero(u[1:] != u[:-1]) + 1))
        ends = np.concatenate((starts[1:], [n]))
        out_id, out_touch, out_credit = [], [], []
        for s, e in zip(starts, ends):
            seg_p = isp[s:e]
            c_ts, c_id = us[s:e][~seg_p], eid[s:e][~seg_p]
            p_ts, p_cents = us[s:e][seg_p], cents[s:e][seg_p]
            if len(c_ts) == 0 or len(p_ts) == 0:
                continue
            lo = np.searchsorted(c_ts, p_ts - _ATTR_WINDOW_US, side="right")
            hi = np.searchsorted(c_ts, p_ts, side="right")
            k = hi - lo
            m = k > 0
            if not m.any():
                continue
            pc_m = p_cents[m]
            # DuckDB BIGINT // truncates toward zero; numpy // floors
            credit = np.sign(pc_m) * (np.abs(pc_m) * _ATTR_SCALE // k[m])
            d = np.zeros(len(c_ts) + 1, np.int64)
            dt = np.zeros(len(c_ts) + 1, np.int64)
            np.add.at(d, lo[m], credit)
            np.add.at(d, hi[m], -credit)
            np.add.at(dt, lo[m], 1)
            np.add.at(dt, hi[m], -1)
            cr = np.cumsum(d[:-1])
            tc = np.cumsum(dt[:-1])
            sel = tc > 0
            if sel.any():
                out_id.append(c_id[sel])
                out_touch.append(tc[sel])
                out_credit.append(cr[sel])
        if not out_id:
            return _empty
        return pa.table(
            {
                "event_id": pa.array(np.concatenate(out_id), pa.int64()),
                "touches": pa.array(np.concatenate(out_touch), pa.int64()),
                "credit_e6": pa.array(np.concatenate(out_credit), pa.int64()),
            }
        )

    return grouped_scan(pre, "user_id", attribute, batch_format="pyarrow")


PURCHASE_LINEAR_ATTRIBUTION_SQL = f"""
WITH p AS (
  SELECT event_id AS pid, user_id AS u, ts AS pts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
  WHERE event_type = 'purchase' AND event_id IS NOT NULL
    AND user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
),
c AS (
  SELECT event_id AS cid, user_id AS u, ts AS cts FROM events
  WHERE event_type = 'click' AND event_id IS NOT NULL
    AND user_id IS NOT NULL AND ts IS NOT NULL
),
pairs AS (
  SELECT c.cid, p.pid, p.cents,
         count(*) OVER (PARTITION BY p.pid) AS k
  FROM p JOIN c ON c.u = p.u
   AND c.cts <= p.pts AND c.cts > p.pts - INTERVAL 1 HOUR
)
SELECT cid AS event_id,
       CAST(count(*) AS BIGINT) AS touches,
       CAST(sum(cents * {_ATTR_SCALE} // k) AS BIGINT) AS credit_e6
FROM pairs GROUP BY cid
"""


# ---------------------------------------------------------------------------
# running-peak / drawdown (cumulative-max window family)
# ---------------------------------------------------------------------------


def user_value_drawdown(sf_dir: str) -> Dataset:
    """Per event: the running PEAK of event value for that user so far
    (ts order) and the drawdown from it — the cumulative-max window shape
    (MAX OVER ROWS UNBOUNDED PRECEDING) the window matrix lacked; the
    same scan powers high-water-mark metering and regression-from-peak
    monitors.

    Plan: one coarse-key ``grouped_scan`` co-locates each user; inside a
    partition one sort on the total order (user, ts, event_id) then a
    C-level segmented cumulative max (pandas groupby cummax — no Python
    per group). Money in half-away-from-zero cents (DuckDB ROUND parity).

    Contract (mirrored): NULL event_id / user_id / ts / value rows are
    excluded (key, order and measure all need them)."""
    from ocr_ray.functions.scalars import to_cents
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(t.column("event_id")), pc.is_valid(t.column("user_id"))),
            pc.and_(pc.is_valid(t.column("ts")), pc.is_valid(t.column("value"))),
        )
        t = t.filter(m)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "cents": to_cents(t.column("value")),
            }
        )

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        peak = df.groupby("user_id", sort=False)["cents"].cummax()
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(dtype=np.int64),
                "user_id": df["user_id"].to_numpy(dtype=np.int64),
                "cents": df["cents"].to_numpy(dtype=np.int64),
                "peak_cents": peak.to_numpy(dtype=np.int64),
                "drawdown_cents": (peak - df["cents"]).to_numpy(dtype=np.int64),
            }
        )

    pre = events.map_batches(prep, batch_format="pyarrow")
    return grouped_scan(pre, "user_id", scan)


USER_VALUE_DRAWDOWN_SQL = """
WITH e AS (
  SELECT event_id, user_id, ts,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
  WHERE event_id IS NOT NULL AND user_id IS NOT NULL
    AND ts IS NOT NULL AND value IS NOT NULL
),
w AS (
  SELECT *, MAX(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak_cents
  FROM e
)
SELECT event_id, user_id, cents, peak_cents,
       CAST(peak_cents - cents AS BIGINT) AS drawdown_cents
FROM w
"""


def daily_new_vs_returning(sf_dir: str) -> Dataset:
    """Per-day active-user census split into NEW (first-ever-seen that day)
    vs returning — the growth-accounting rollup every event corpus reports.

    Plan: per-batch distinct (user, day) partials (np.unique on the packed
    pair) feed ONE keys-only groupby that makes the pairs globally distinct;
    per-user first days come from a ``groupby(user).Min(day)`` over the same
    pairs; the final day census joins first-day flags back via a broadcast/
    hash auto-join on the user key. Only (user, day) int pairs ever shuffle.
    Days are positive-epoch floor buckets (``epoch_us // day``, same
    precondition as the gapfill family).

    Contract (mirrored): NULL user_id / ts rows are excluded."""
    from ray.data.aggregate import Count, Min, Sum

    from ocr_ray.functions.joins import auto_join

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts")))
        )
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // _US_PER_DAY
        user = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        packed = np.unique(user * 1_000_000 + day)  # day < 1e6 for epoch-us data
        return pa.table(
            {
                "user_id": pa.array(packed // 1_000_000, pa.int64()),
                "day": pa.array(packed % 1_000_000, pa.int64()),
            }
        )

    distinct = (
        events.map_batches(pairs, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
        .materialize()
    )
    firsts = distinct.groupby("user_id").aggregate(Min("day", alias_name="first_day"))
    joined = auto_join(distinct, firsts, on="user_id")

    def census(t: pa.Table) -> pa.Table:
        new = pc.cast(pc.equal(t.column("day"), t.column("first_day")), pa.int64())
        g = (
            pa.table(
                {
                    "day": t.column("day"),
                    "n_active": pa.array([1] * t.num_rows, pa.int64()),
                    "n_new": new,
                }
            )
            .group_by(["day"])
            .aggregate([("n_active", "sum"), ("n_new", "sum")])
        )
        return g.rename_columns(["day", "n_active", "n_new"])

    return (
        joined.map_batches(census, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n_active", alias_name="n_active"), Sum("n_new", alias_name="n_new"))
    )


DAILY_NEW_VS_RETURNING_SQL = f"""
WITH p AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_US_PER_DAY} AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
f AS (SELECT user_id, min(day) AS first_day FROM p GROUP BY user_id)
SELECT CAST(p.day AS BIGINT) AS day,
       CAST(count(*) AS BIGINT) AS n_active,
       CAST(count(*) FILTER (WHERE p.day = f.first_day) AS BIGINT) AS n_new
FROM p JOIN f USING (user_id)
GROUP BY p.day
"""


# ---------------------------------------------------------------------------
# watermark / late-arrival census (out-of-order ingest audit)
# ---------------------------------------------------------------------------

_LATE_US = 300_000_000  # allowed lateness: 5 min, in microseconds


def events_late_arrivals(sf_dir: str) -> Dataset:
    """Per-user out-of-order-ingest audit under a 5-minute watermark.

    Streaming engines admit an event only if its timestamp is newer than
    ``watermark = max(ts seen so far) - allowed_lateness``; this census
    reports, per user, how many events arrived out of order at all
    (``ts < running max over PRIOR arrivals``), how many a 5-minute
    watermark would DROP, and the worst disorder in microseconds — the
    audit that sizes ``allowed_lateness`` before turning on windowed
    aggregation over an ingest log. Arrival order is ``event_id`` (the
    monotone ingest sequence; FIXTURES.md events contract).

    Plan: one coarse-key ``grouped_scan`` co-locates each user's arrivals;
    inside a partition one sort on (user_id, event_id), a C-level segmented
    cumulative max of int64 microseconds, shifted one arrival so each event
    sees only PRIOR arrivals, then a per-user aggregation — all within the
    partition, so the exchange carries (user_id, event_id, ts_us) in and
    four int64s per user out. No global sort, no window shuffle.

    Contract (mirrored in SQL): NULL event_id / user_id / ts rows are
    excluded (arrival order, key and measure all require them); a user's
    first arrival is never disordered (no prior watermark).
    """
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "ts"]
    )

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(t.column("event_id")), pc.is_valid(t.column("user_id"))),
            pc.is_valid(t.column("ts")),
        )
        t = t.filter(m)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
            }
        )

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_id"])
        uid = df["user_id"].to_numpy(dtype=np.int64)
        ts = df["ts_us"].to_numpy(dtype=np.int64)
        peak = df.groupby("user_id", sort=False)["ts_us"].cummax().to_numpy(dtype=np.int64)
        # watermark basis = peak over PRIOR arrivals: shift within group
        first = np.empty(len(uid), dtype=bool)
        first[:1] = True
        first[1:] = uid[1:] != uid[:-1]
        wm = np.empty_like(peak)
        wm[1:] = peak[:-1]
        disorder = np.where(first, 0, np.maximum(wm - ts, 0))
        out = pd.DataFrame(
            {
                "user_id": uid,
                "disordered": (disorder > 0).astype(np.int64),
                "late": (disorder > _LATE_US).astype(np.int64),
                "disorder_us": disorder,
            }
        )
        g = out.groupby("user_id", sort=False)
        res = g.agg(
            n_events=("disordered", "size"),
            n_disordered=("disordered", "sum"),
            n_late=("late", "sum"),
            max_disorder_us=("disorder_us", "max"),
        ).reset_index()
        for c in ("n_events", "n_disordered", "n_late", "max_disorder_us"):
            res[c] = res[c].astype(np.int64)
        return res

    pre = events.map_batches(prep, batch_format="pyarrow")
    return grouped_scan(pre, "user_id", scan)


EVENTS_LATE_ARRIVALS_SQL = f"""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events
  WHERE event_id IS NOT NULL AND user_id IS NOT NULL AND ts IS NOT NULL
),
w AS (
  SELECT user_id, ts_us,
         MAX(ts_us) OVER (PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM e
),
d AS (
  SELECT user_id,
         CASE WHEN wm IS NULL OR wm - ts_us < 0 THEN 0 ELSE wm - ts_us END AS disorder_us
  FROM w
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (WHERE disorder_us > 0) AS BIGINT) AS n_disordered,
       CAST(count(*) FILTER (WHERE disorder_us > {_LATE_US}) AS BIGINT) AS n_late,
       CAST(max(disorder_us) AS BIGINT) AS max_disorder_us
FROM d GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# exact-integer trailing EWMA (weighted sliding window / convolution shape)
# ---------------------------------------------------------------------------

_EWMA_TAPS = 16  # trailing frame length; weight of lag j is 2^(TAPS-1-j)


def user_value_ewma(sf_dir: str) -> Dataset:
    """Per event: the user's exponentially-weighted trailing spend as an
    EXACT integer rational — numerator ``sum(v[i-j] * 2^(15-j))`` and
    denominator ``sum(2^(15-j))`` over the trailing 16-row frame (ordered
    by ts then event_id). Power-of-two weights with a capped frame make the
    classic smoothing window exactly representable in int64 on BOTH
    engines, so the gate hashes integers, not float EWMA drift.

    Plan: the frame-window family's coarse-key ``grouped_scan``; inside a
    partition one sort, then ONE int64 ``np.convolve`` per user segment
    (the weighted-sliding-window generalization of the prefix-sum plan the
    ROWS/RANGE frames use). The exchange carries (event_id, user_id, us, v)
    in and two int64s per row out; no global sort.

    Contract (mirrored in SQL): NULL ts / user_id / event_id rows are
    excluded (event_id is both the output key — SQL's GROUP BY would fuse
    NULL ids into one row — and the deterministic tie-break); NULL values
    contribute 0 to the numerator but still occupy a frame slot
    (COALESCE before the window, exactly like user_centered_spend).
    Overflow audit: |cents| < 2^34 (hostile negation included), x 2^15
    x 16 taps < 2^53 — int64-safe in numpy and DuckDB alike."""
    from ocr_ray.functions.scalars import to_cents
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.and_(pc.is_valid(t.column("ts")), pc.is_valid(t.column("user_id"))),
                pc.is_valid(t.column("event_id")),
            )
        )
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "us": t.column("ts").cast(pa.int64()),
                "v": pc.coalesce(to_cents(t.column("value")), pa.scalar(0, pa.int64())),
            }
        )

    pre = events.map_batches(prep, batch_format="pyarrow")
    # kernel[j] = weight of lag j (most-recent row heaviest)
    kernel = (1 << (_EWMA_TAPS - 1 - np.arange(_EWMA_TAPS, dtype=np.int64))).astype(
        np.int64
    )

    def ewma(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "ewma_num": pa.array([], pa.int64()),
                    "ewma_den": pa.array([], pa.int64()),
                }
            )
        t = t.sort_by(
            [("user_id", "ascending"), ("us", "ascending"), ("event_id", "ascending")]
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(u)
        starts = np.concatenate(([0], np.flatnonzero(u[1:] != u[:-1]) + 1))
        ends = np.concatenate((starts[1:], [n]))
        num = np.empty(n, dtype=np.int64)
        den = np.empty(n, dtype=np.int64)
        top = 1 << (_EWMA_TAPS - 1)
        for a, b in zip(starts, ends):
            seg = v[a:b]
            num[a:b] = np.convolve(seg, kernel)[: b - a]
            # den[i] = sum_{j=0..min(i,15)} 2^(15-j) = 2^16 - 2^(15-min(i,15))
            i = np.minimum(np.arange(b - a), _EWMA_TAPS - 1)
            den[a:b] = (top << 1) - (top >> i)
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "ewma_num": pa.array(num),
                "ewma_den": pa.array(den),
            }
        )

    return grouped_scan(pre, "user_id", ewma, batch_format="pyarrow").select_columns(
        ["event_id", "ewma_num", "ewma_den"]
    )


USER_VALUE_EWMA_SQL = f"""
WITH p AS (
  SELECT event_id, user_id,
         COALESCE(CAST(ROUND(value*100) AS BIGINT), 0) AS v,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_id IS NOT NULL
)
SELECT a.event_id,
       CAST(SUM(b.v * (CAST(1 AS BIGINT) << ({_EWMA_TAPS - 1} - (a.rn - b.rn)))) AS BIGINT) AS ewma_num,
       CAST(SUM(CAST(1 AS BIGINT) << ({_EWMA_TAPS - 1} - (a.rn - b.rn))) AS BIGINT) AS ewma_den
FROM p a JOIN p b
  ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - {_EWMA_TAPS - 1} AND a.rn
GROUP BY a.event_id
"""


# ---------------------------------------------------------------------------
# nearest-either-direction time join (completes the as-of direction matrix)
# ---------------------------------------------------------------------------


def purchase_nearest_click(sf_dir: str) -> Dataset:
    """For each purchase: the user's NEAREST click in time, either
    direction — min(gap to last click at-or-before, gap to first click
    strictly-after), in microseconds. ``purchase_attribution`` is the
    backward as-of, ``purchase_next_click`` the forward; this is the
    nearest-neighbor variant (the shape feature pipelines use for
    "closest context event"). Purchases whose user never clicks drop
    (inner semantics, mirrored).

    Plan: coarse-key grouped scan by user; per partition ONE sort of the
    click timestamps and two vectorized ``searchsorted`` probes — the
    backward neighbor is ``clicks[idx-1]`` (side='right' makes it
    at-or-before) and the forward neighbor ``clicks[idx]`` (strictly
    after), so tie rules are encoded in the probe side, not data order.
    NULL user/ts/event_id rows are excluded in both engines."""
    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "ts"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.and_(
                    pc.is_in(
                        t.column("event_type"), value_set=pa.array(["click", "purchase"])
                    ),
                    pc.is_valid(t.column("event_id")),
                ),
                pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts"))),
            )
        ),
        batch_format="pyarrow",
    )

    from ocr_ray.pipelines.conversation import grouped_scan

    _I64MAX = np.iinfo(np.int64).max

    def nearest(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "nearest_us": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending")])
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        kind = pc.equal(t.column("event_type"), "click").to_numpy(zero_copy_only=False)
        ids = t.column("event_id").to_numpy(zero_copy_only=False)
        out_id, out_gap = [], []
        starts = np.concatenate(([0], np.flatnonzero(u[1:] != u[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(u)]))
        for a, b in zip(starts, ends):
            k = kind[a:b]
            clicks = us[a:b][k]
            pmask = ~k
            if clicks.size == 0 or not pmask.any():
                continue
            p = us[a:b][pmask]
            idx = np.searchsorted(clicks, p, side="right")
            prev_gap = np.where(idx > 0, p - clicks[np.maximum(idx - 1, 0)], _I64MAX)
            nxt_gap = np.where(
                idx < clicks.size, clicks[np.minimum(idx, clicks.size - 1)] - p, _I64MAX
            )
            out_id.append(ids[a:b][pmask])
            out_gap.append(np.minimum(prev_gap, nxt_gap))
        if not out_id:
            return empty
        return pa.table(
            {
                "event_id": pa.array(np.concatenate(out_id), pa.int64()),
                "nearest_us": pa.array(np.concatenate(out_gap), pa.int64()),
            }
        )

    return grouped_scan(events, "user_id", nearest, batch_format="pyarrow")


PURCHASE_NEAREST_CLICK_SQL = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
           AND ts IS NOT NULL AND user_id IS NOT NULL AND event_id IS NOT NULL),
     c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'
           AND ts IS NOT NULL AND user_id IS NOT NULL AND event_id IS NOT NULL),
fwd AS (
  SELECT p.event_id, MIN(epoch_us(c.ts) - epoch_us(p.ts)) AS w
  FROM p JOIN c ON p.user_id = c.user_id AND c.ts > p.ts GROUP BY p.event_id
),
bwd AS (
  SELECT p.event_id, MIN(epoch_us(p.ts) - epoch_us(c.ts)) AS w
  FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts GROUP BY p.event_id
)
SELECT COALESCE(f.event_id, b.event_id) AS event_id,
       CAST(LEAST(COALESCE(f.w, b.w), COALESCE(b.w, f.w)) AS BIGINT) AS nearest_us
FROM fwd f FULL OUTER JOIN bwd b ON f.event_id = b.event_id
"""


# ---------------------------------------------------------------------------
# windowed anti-join: clicks with no conversion inside the following hour
# ---------------------------------------------------------------------------

_CONVERT_US = 3_600_000_000  # 1 h


def clicks_unconverted(sf_dir: str) -> Dataset:
    """Clicks with NO purchase by the same user within the following hour —
    the windowed ANTI-join (NOT EXISTS over a time range), the abandonment
    signal attribution pipelines compute. Completes the time-join matrix:
    as-of (backward/forward/nearest), interval overlap, concurrent-window,
    and now range NOT EXISTS.

    Plan: coarse-key grouped scan by user; per partition ONE sort of the
    purchase timestamps and one ``searchsorted`` probe per click side —
    ``idx = searchsorted(purchases, ts, 'right')`` is the first purchase
    STRICTLY after the click; the click converts iff that purchase is
    within +1 h. No pair expansion anywhere: the anti-join is two
    vectorized probes regardless of fan-out.

    Contract (mirrored in SQL): NULL user/ts/event_id click rows are
    excluded (a NULL can satisfy neither predicate and the id is the
    output key); a purchase needs only (user, ts) to convert a click —
    its id is never projected, so a NULL-id purchase still counts."""
    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "ts"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.and_(
                    pc.is_in(
                        t.column("event_type"), value_set=pa.array(["click", "purchase"])
                    ),
                    pc.or_(
                        pc.is_valid(t.column("event_id")),
                        pc.equal(t.column("event_type"), "purchase"),
                    ),
                ),
                pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts"))),
            )
        ),
        batch_format="pyarrow",
    )

    from ocr_ray.pipelines.conversation import grouped_scan

    def anti(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_id": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending")])
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        is_click = pc.equal(t.column("event_type"), "click").to_numpy(zero_copy_only=False)
        # NULL-id purchases ride along (valid converters), so the id column
        # may be float64-with-NaN here; click ids are all valid ints
        ids = t.column("event_id").to_numpy(zero_copy_only=False)
        out = []
        starts = np.concatenate(([0], np.flatnonzero(u[1:] != u[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(u)]))
        for a, b in zip(starts, ends):
            k = is_click[a:b]
            clicks = us[a:b][k]
            if clicks.size == 0:
                continue
            purch = us[a:b][~k]
            if purch.size == 0:
                out.append(ids[a:b][k].astype(np.int64))
                continue
            idx = np.searchsorted(purch, clicks, side="right")
            nxt = purch[np.minimum(idx, purch.size - 1)]
            converted = (idx < purch.size) & (nxt <= clicks + _CONVERT_US)
            out.append(ids[a:b][k][~converted].astype(np.int64))
        if not out:
            return empty
        return pa.table({"event_id": pa.array(np.concatenate(out), pa.int64())})

    return grouped_scan(events, "user_id", anti, batch_format="pyarrow")


CLICKS_UNCONVERTED_SQL = f"""
WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
           WHERE event_type = 'click'
           AND ts IS NOT NULL AND user_id IS NOT NULL AND event_id IS NOT NULL),
     p AS (SELECT user_id, epoch_us(ts) AS us FROM events
           WHERE event_type = 'purchase' AND ts IS NOT NULL AND user_id IS NOT NULL)
SELECT c.event_id FROM c
WHERE NOT EXISTS (
  SELECT 1 FROM p WHERE p.user_id = c.user_id
  AND p.us > c.us AND p.us <= c.us + {_CONVERT_US}
)
"""


# ---------------------------------------------------------------------------
# TIMED funnel: each stage must land within a window of the previous one
# ---------------------------------------------------------------------------

_FUNNEL_WINDOW_US = 3_600_000_000  # 1 h per hop


def session_funnel_timed(sf_dir: str) -> pd.DataFrame:
    """``session_funnel`` with a CONVERSION WINDOW: a click counts only
    within 1 h of the user's first view, a purchase only within 1 h of the
    first qualifying click — the bounded-attention funnel real conversion
    reporting uses (an unbounded funnel credits a purchase months later).
    Same grouped-scan plan, 3 counters per partition to the driver; the
    window bound is one extra vectorized compare per stage."""
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "ts", "event_type"]
    )

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.and_(
                pc.is_in(
                    t.column("event_type"), pa.array(["view", "click", "purchase"])
                ),
                pc.is_valid(t.column("user_id")),
            )
        )

    pre = events.map_batches(keep, batch_format="pyarrow")
    w = pd.Timedelta(_FUNNEL_WINDOW_US, unit="us")

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        fv = g[g["event_type"] == "view"].groupby("user_id")["ts"].min()
        c = g[g["event_type"] == "click"]
        base = c["user_id"].map(fv)
        ok = (c["ts"] > base) & (c["ts"] <= base + w)  # NaT compares -> False
        fc = c[ok].groupby("user_id")["ts"].min()
        p = g[g["event_type"] == "purchase"]
        base = p["user_id"].map(fc)
        ok = (p["ts"] > base) & (p["ts"] <= base + w)
        fp = p[ok].groupby("user_id")["ts"].min()
        return pd.DataFrame(
            {"n_view": [len(fv)], "n_click": [len(fc)], "n_purchase": [len(fp)]}
        )

    parts = grouped_scan(pre, "user_id", scan)
    tot = np.zeros(3, dtype=np.int64)
    for b in parts.iter_batches(batch_format="pandas"):
        tot += b[["n_view", "n_click", "n_purchase"]].to_numpy(np.int64).sum(axis=0)
    return pd.DataFrame({"stage": list(_FUNNEL_STAGES), "users": tot})


SESSION_FUNNEL_TIMED_SQL = f"""
WITH fv AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY 1
),
fc AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN fv ON e.user_id = fv.user_id
  WHERE e.event_type = 'click' AND e.ts > fv.t
    AND epoch_us(e.ts) <= epoch_us(fv.t) + {_FUNNEL_WINDOW_US} GROUP BY 1
),
fp AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN fc ON e.user_id = fc.user_id
  WHERE e.event_type = 'purchase' AND e.ts > fc.t
    AND epoch_us(e.ts) <= epoch_us(fc.t) + {_FUNNEL_WINDOW_US} GROUP BY 1
)
SELECT stage, users FROM (VALUES
  ('view', (SELECT count(*) FROM fv)),
  ('view_click', (SELECT count(*) FROM fc)),
  ('view_click_purchase', (SELECT count(*) FROM fp))
) AS t(stage, users)
"""


# ---------------------------------------------------------------------------
# linear interpolation of missing values (time-series imputation)
# ---------------------------------------------------------------------------


def user_value_interpolated(sf_dir: str) -> Dataset:
    """Linear time-interpolation of NULL event values per user — the
    imputation sibling of LOCF (``user_days_locf`` carries the last
    observation forward; this weights the two nearest observations by
    time) — emitted as EXACT integer rationals so the gate never touches
    float division: for a NULL-value event at time t between neighbors
    (t_p, v_p) and (t_n, v_n),
        interp_num = v_p·(t_n − t) + v_n·(t − t_p),  interp_den = t_n − t_p
    (the consumer divides; den = 0 ⟺ both neighbors share t, mirrored).
    Observed rows pass through as the trivial rational (v, 1) with
    imputed = 0 — the output is the SERIES WITH IMPUTATION APPLIED, so
    the gate hashes every row even on a fixture with no missing values;
    edge NULLs with no neighbor on either side drop (mirrored — standard
    interpolation leaves edges to LOCF).

    Plan: one coarse-key grouped scan by user; per segment the previous /
    next non-null observation indices come from two C-level
    ``maximum.accumulate`` passes (forward and reversed) — no per-row
    Python, no window shuffle.

    Contract (mirrored in SQL): NULL user/ts/event_id rows are excluded;
    ordering is (ts, event_id). Overflow: |num| ≤ |v|·Δt — cents ≤ 2^20
    and a month-wide gap ≈ 2^41.3 µs give ≤ 2^62; a domain with larger
    values or multi-year gaps should bucket ts to seconds first
    (documented trade; both engines would overflow together otherwise,
    but int64-wrap is silent in numpy)."""
    from ocr_ray.functions.scalars import to_cents
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.and_(pc.is_valid(t.column("ts")), pc.is_valid(t.column("user_id"))),
                pc.is_valid(t.column("event_id")),
            )
        )
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "us": t.column("ts").cast(pa.int64()),
                "v": to_cents(t.column("value")),  # NULLs preserved
            }
        )

    pre = events.map_batches(prep, batch_format="pyarrow")
    empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "interp_num": pa.array([], pa.int64()),
            "interp_den": pa.array([], pa.int64()),
            "imputed": pa.array([], pa.int64()),
        }
    )

    def interp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        t = t.sort_by(
            [("user_id", "ascending"), ("us", "ascending"), ("event_id", "ascending")]
        )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        us = t.column("us").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)  # float64 w/ NaN
        ids = t.column("event_id").to_numpy(zero_copy_only=False)
        n = len(u)
        valid = ~np.isnan(v.astype(np.float64))
        idx = np.arange(n)
        # segment starts reset the accumulations
        seg_start = np.zeros(n, dtype=bool)
        seg_start[0] = True
        seg_start[1:] = u[1:] != u[:-1]
        seg_id = np.cumsum(seg_start) - 1
        # previous non-null observation index STRICTLY before row i
        tmp = np.where(valid, idx, -1)
        run = np.maximum.accumulate(tmp)
        prev = np.concatenate(([-1], run[:-1]))
        prev = np.where((prev >= 0) & (seg_id[np.maximum(prev, 0)] == seg_id), prev, -1)
        # next non-null strictly after (same trick on the reversed array)
        tmp_r = np.where(valid[::-1], idx[::-1], n)
        run_r = np.minimum.accumulate(tmp_r)
        nxt = np.concatenate(([n], run_r[:-1]))[::-1]
        nxt = np.where((nxt < n) & (seg_id[np.minimum(nxt, n - 1)] == seg_id), nxt, n)
        sel = np.flatnonzero(~valid & (prev >= 0) & (nxt < n))
        vp = v[prev[sel]].astype(np.int64)
        vn = v[nxt[sel]].astype(np.int64)
        tp, tn, tt = us[prev[sel]], us[nxt[sel]], us[sel]
        num = vp * (tn - tt) + vn * (tt - tp)
        den = tn - tp
        obs = np.flatnonzero(valid)
        out_ids = np.concatenate((ids[obs], ids[sel]))
        out_num = np.concatenate((v[obs].astype(np.int64), num))
        out_den = np.concatenate((np.ones(len(obs), np.int64), den))
        out_imp = np.concatenate(
            (np.zeros(len(obs), np.int64), np.ones(len(sel), np.int64))
        )
        return pa.table(
            {
                "event_id": pa.array(out_ids, pa.int64()),
                "interp_num": pa.array(out_num, pa.int64()),
                "interp_den": pa.array(out_den, pa.int64()),
                "imputed": pa.array(out_imp, pa.int64()),
            }
        )

    return grouped_scan(pre, "user_id", interp, batch_format="pyarrow")


USER_VALUE_INTERPOLATED_SQL = """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS us,
         CAST(ROUND(value * 100) AS BIGINT) AS v
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_id IS NOT NULL
),
w AS (
  SELECT event_id, us, v,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN us END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pus,
         first_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN us END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nus
  FROM e
)
SELECT event_id,
       CAST(CASE WHEN v IS NOT NULL THEN v
            ELSE pv * (nus - us) + nv * (us - pus) END AS BIGINT) AS interp_num,
       CAST(CASE WHEN v IS NOT NULL THEN 1 ELSE nus - pus END AS BIGINT) AS interp_den,
       CAST(CASE WHEN v IS NOT NULL THEN 0 ELSE 1 END AS BIGINT) AS imputed
FROM w
WHERE v IS NOT NULL OR (pv IS NOT NULL AND nv IS NOT NULL)
"""


# ---------------------------------------------------------------------------
# streaming window dedup: first event per (user, type, hour)
# ---------------------------------------------------------------------------


def events_window_dedup(sf_dir: str) -> Dataset:
    """Streaming-shaped dedup: keep only the FIRST event per (user, type,
    tumbling hour) — the at-most-once-per-window compaction a streaming
    ingest applies before fan-out (the keep-first mirror of
    ``latest_event_per_user``'s keep-last, with the window in the key).

    Scale plan: per-BATCH vectorized argmin first (one sort + run-boundary
    mask), so the shuffle moves at most one row per (user, type, hour) per
    batch; a coarse-key grouped scan on user finishes the pick. Ties break
    by event_id (unique ⇒ deterministic).

    Contract (mirrored in SQL): NULL user/type/ts/event_id rows are
    excluded (window key parts + output key)."""
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "ts"]
    )

    def first_per_window(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("event_type"))),
                pc.and_(pc.is_valid(t.column("ts")), pc.is_valid(t.column("event_id"))),
            )
        )
        if "hour" not in t.column_names:
            us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
            t = t.append_column(
                "hour", pa.array((us // 3_600_000_000).astype(np.int64), pa.int64())
            )
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("user_id", "ascending"),
                ("event_type", "ascending"),
                ("hour", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        t = t.take(idx)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        h = t.column("hour").to_numpy(zero_copy_only=False)
        first = np.empty(t.num_rows, dtype=bool)
        if t.num_rows:
            first[0] = True
            first[1:] = (u[1:] != u[:-1]) | (et[1:] != et[:-1]) | (h[1:] != h[:-1])
        return t.filter(pa.array(first)).select(
            ["event_id", "user_id", "event_type", "hour", "ts"]
        )

    cand = events.map_batches(first_per_window, batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        return first_per_window(t).drop_columns(["ts"])

    return grouped_scan(cand, "user_id", finish, batch_format="pyarrow").select_columns(
        ["event_id", "user_id", "event_type", "hour"]
    )


EVENTS_WINDOW_DEDUP_SQL = """
SELECT event_id, user_id, event_type,
       CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour
FROM events
WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  AND ts IS NOT NULL AND event_id IS NOT NULL
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY user_id, event_type, epoch_us(ts) // 3600000000
  ORDER BY ts, event_id
) = 1
"""


# ---------------------------------------------------------------------------
# daily churn census (label builder over distinct activity days)
# ---------------------------------------------------------------------------


def daily_churn_census(sf_dir: str) -> Dataset:
    """Per activity day: active users, how many CHURN (no activity the
    next day), and how many are NEW (no activity the previous day) — the
    day-grain label builder behind retention/churn models
    (``daily_new_vs_returning`` computes first-day-based novelty; this
    adds the forward-looking churn signal, adjacency-based on BOTH sides).

    Plan: distinct (user, day) pairs via per-batch dedup + one pair-keyed
    groupby; then a coarse-key grouped scan per user where sorted unique
    days make both adjacency tests one vectorized compare; per-partition
    (day → n_active, n_churned, n_new) census partials feed a tiny final
    groupby. Keys-only shuffles throughout.

    Contract (mirrored in SQL): NULL user/ts rows are excluded; day uses
    FLOOR division (fixture ts ≥ epoch)."""
    from ray.data.aggregate import Sum
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts")))
        )
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        p = pa.table(
            {
                "user_id": t.column("user_id"),
                "day": pa.array((us // 86_400_000_000).astype(np.int64), pa.int64()),
            }
        )
        return p.group_by(["user_id", "day"]).aggregate([])

    distinct = (
        events.map_batches(pairs, batch_format="pyarrow").groupby(["user_id", "day"]).count()
    )

    def scan(t: pa.Table) -> pa.Table:
        t = t.sort_by([("user_id", "ascending"), ("day", "ascending")])
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        d = t.column("day").to_numpy(zero_copy_only=False)
        n = len(u)
        if n == 0:
            return pa.table(
                {
                    "day": pa.array([], pa.int64()),
                    "n_active": pa.array([], pa.int64()),
                    "n_churned": pa.array([], pa.int64()),
                    "n_new": pa.array([], pa.int64()),
                }
            )
        same_next = np.zeros(n, dtype=bool)
        same_next[:-1] = (u[:-1] == u[1:]) & (d[1:] == d[:-1] + 1)
        same_prev = np.zeros(n, dtype=bool)
        same_prev[1:] = (u[1:] == u[:-1]) & (d[1:] == d[:-1] + 1)
        g = pa.table(
            {
                "day": pa.array(d, pa.int64()),
                "n_active": pa.array(np.ones(n, np.int64)),
                "n_churned": pa.array((~same_next).astype(np.int64)),
                "n_new": pa.array((~same_prev).astype(np.int64)),
            }
        )
        return g.group_by("day").aggregate(
            [("n_active", "sum"), ("n_churned", "sum"), ("n_new", "sum")]
        ).rename_columns(["day", "n_active", "n_churned", "n_new"])

    return (
        grouped_scan(distinct, "user_id", scan, batch_format="pyarrow")
        .groupby("day")
        .aggregate(
            Sum("n_active", alias_name="n_active"),
            Sum("n_churned", alias_name="n_churned"),
            Sum("n_new", alias_name="n_new"),
        )
    )


DAILY_CHURN_CENSUS_SQL = """
WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
)
SELECT CAST(day AS BIGINT) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(COUNT(*) FILTER (WHERE NOT EXISTS (
         SELECT 1 FROM d d2 WHERE d2.user_id = d.user_id AND d2.day = d.day + 1
       )) AS BIGINT) AS n_churned,
       CAST(COUNT(*) FILTER (WHERE NOT EXISTS (
         SELECT 1 FROM d d0 WHERE d0.user_id = d.user_id AND d0.day = d.day - 1
       )) AS BIGINT) AS n_new
FROM d GROUP BY day
"""


# ---------------------------------------------------------------------------
# cumulative distinct users by day (audience-growth curve)
# ---------------------------------------------------------------------------


def cumulative_distinct_users(sf_dir: str) -> pa.Table:
    """Audience growth: for every active day, how many users were seen for
    the FIRST time that day and the running total of distinct users to
    date — the cumulative-COUNT-DISTINCT curve product dashboards plot,
    which naive engines compute with a quadratic day×user window.

    Plan: first-occurrence census. Per-batch arrow ``group_by(user).min(day)``
    partials shrink each block to its distinct users, ONE user-keyed
    groupby ``Min`` lands the exact first day per user (keys + one int64
    through the shuffle, never event rows), then a per-batch day census of
    first-days folds on the driver (O(distinct days)) where the prefix sum
    is a single cumsum. The set of ACTIVE days (for zero-new days) comes
    from per-batch day dedup folded the same way — a map-side census, no
    extra shuffle.

    Contract (mirrored in SQL): NULL user_id / ts rows are excluded; day =
    floor(epoch_us / 86_400_000_000); one output row per active day."""
    import pandas as pd
    from ray.data.aggregate import Min

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts")))
        )
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        p = pa.table(
            {
                "user_id": t.column("user_id"),
                "day": pa.array((us // 86_400_000_000).astype(np.int64), pa.int64()),
            }
        )
        return p.group_by("user_id").aggregate([("day", "min")]).rename_columns(
            ["user_id", "day"]
        )

    pre = events.map_batches(partial, batch_format="pyarrow").materialize()

    # active-day set: map-side dedup census folded on the driver (the
    # per-user MIN partials preserve every day a user was active on only
    # if it was that user's batch-min — so the day set must come from its
    # own dedup, run over the same partials' INPUT; cheapest correct
    # source is a second tiny column census over raw events)
    def day_census(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts")))
        )
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        days = np.unique(us // 86_400_000_000)
        return pa.table({"day": pa.array(days.astype(np.int64), pa.int64())})

    active_days: set[int] = set()
    for b in events.map_batches(day_census, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        active_days.update(b.column("day").to_pylist())

    first_day = pre.groupby("user_id").aggregate(Min("day", alias_name="fday"))

    frames = [
        f
        for f in first_day.map_batches(
            lambda t: pa.table({"fday": t.column("fday")})
            .group_by("fday")
            .aggregate([([], "count_all")])
            .rename_columns(["fday", "c"]),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pandas", batch_size=None)
    ]
    new_by_day = (
        pd.concat(frames).groupby("fday", sort=True)["c"].sum()
        if frames
        else pd.Series(dtype=np.int64)
    )
    days = np.array(sorted(active_days), dtype=np.int64)
    new = np.array([int(new_by_day.get(d, 0)) for d in days], dtype=np.int64)
    return pa.table(
        {
            "day": pa.array(days, pa.int64()),
            "new_users": pa.array(new, pa.int64()),
            "cum_users": pa.array(np.cumsum(new), pa.int64()),
        }
    )


CUMULATIVE_DISTINCT_USERS_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
f AS (SELECT user_id, MIN(day) AS fday FROM e GROUP BY user_id),
days AS (SELECT DISTINCT day FROM e),
nu AS (SELECT fday AS day, CAST(COUNT(*) AS BIGINT) AS new_users FROM f GROUP BY fday)
SELECT CAST(d.day AS BIGINT) AS day,
       CAST(COALESCE(nu.new_users, 0) AS BIGINT) AS new_users,
       CAST((SELECT COUNT(*) FROM f WHERE f.fday <= d.day) AS BIGINT) AS cum_users
FROM days d LEFT JOIN nu ON nu.day = d.day
"""


# ---------------------------------------------------------------------------
# top-k session paths (ordered event-sequence census)
# ---------------------------------------------------------------------------

_PATH_PREFIX_LEN = 5
_PATH_TOPK = 10


def session_paths_topk(sf_dir: str) -> pa.Table:
    """Top-10 most common (user, day)-session event-type PATHS — the first
    five event types in time order joined with ``>`` — the ordered-
    sequence census behind funnel discovery and UX path analysis (the
    Markov ``event_type_transitions`` sees only bigrams; this ranks whole
    prefixes).

    Plan: ``grouped_scan`` co-locates each user's rows (coarse crc32 key
    exchange); inside a partition one lexsort orders (user, day, ts,
    event_id, type), run boundaries mark the per-(user, day) groups, a
    position-in-group mask keeps the first five rows, and paths emerge
    from zero-copy ``ListArray`` wrap + ``binary_join`` — no Python loop
    over groups. Per-partition path value_counts fold on the driver
    (bounded by distinct paths, k-capped at the end).

    Contract (mirrored in SQL): NULL user/ts rows excluded; NULL
    event_type renders as ''; ties inside (ts) break by (event_id NULLS
    LAST, type) so concurrent rows order deterministically; top-10 by
    (count DESC, path ASC)."""
    import pandas as pd
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"]
    )

    _NULL_EID = np.iinfo(np.int64).max

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts")))
        )
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "day": pa.array((us // 86_400_000_000).astype(np.int64), pa.int64()),
                "us": pa.array(us, pa.int64()),
                "eid": pc.fill_null(t.column("event_id"), _NULL_EID),
                "et": pc.fill_null(t.column("event_type"), ""),
            }
        )

    pre = events.map_batches(prep, batch_format="pyarrow")

    def paths(t: pa.Table) -> pa.Table:
        t = t.sort_by(
            [
                ("user_id", "ascending"),
                ("day", "ascending"),
                ("us", "ascending"),
                ("eid", "ascending"),
                ("et", "ascending"),
            ]
        )
        n = t.num_rows
        if n == 0:
            return pa.table(
                {"path": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        d = t.column("day").to_numpy(zero_copy_only=False)
        new_grp = np.empty(n, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1])
        grp = np.cumsum(new_grp) - 1
        starts = np.flatnonzero(new_grp)
        pos = np.arange(n) - starts[grp]
        keep = pos < _PATH_PREFIX_LEN
        ets = t.column("et").filter(pa.array(keep)).combine_chunks()
        sizes = np.minimum(np.diff(np.append(starts, n)), _PATH_PREFIX_LEN)
        offsets = np.concatenate(([0], np.cumsum(sizes))).astype(np.int32)
        la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), ets)
        joined = pc.binary_join(la, ">")
        census = (
            pa.table({"path": joined})
            .group_by("path")
            .aggregate([([], "count_all")])
            .rename_columns(["path", "n"])
        )
        return census

    per_part = grouped_scan(pre, "user_id", paths, batch_format="pyarrow")
    frames = [
        f for f in per_part.iter_batches(batch_format="pandas", batch_size=None)
    ]
    if not frames:
        return pa.table(
            {"path": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    tot = pd.concat(frames).groupby("path", sort=False)["n"].sum().reset_index()
    tot = tot.sort_values(["n", "path"], ascending=[False, True]).head(_PATH_TOPK)
    return pa.table(
        {
            "path": pa.array(tot["path"].tolist(), pa.string()),
            "n": pa.array(tot["n"].astype(np.int64).tolist(), pa.int64()),
        }
    )


SESSION_PATHS_TOPK_SQL = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day, ts, event_id,
         COALESCE(event_type, '') AS et
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
p AS (
  SELECT array_to_string(
           (array_agg(et ORDER BY ts, event_id NULLS LAST, et))[1:{_PATH_PREFIX_LEN}],
           '>') AS path
  FROM e GROUP BY user_id, day
),
c AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY path)
SELECT path, n FROM c ORDER BY n DESC, path LIMIT {_PATH_TOPK}
"""


# ---------------------------------------------------------------------------
# OHLC bars: grouped first/last/min/max value matrix per (user, hour)
# ---------------------------------------------------------------------------


def user_hour_ohlc(sf_dir: str) -> Dataset:
    """OHLC bars per (user, hour): open = value at the bar's first tick,
    close = at its last, plus high/low/count — the downsampling shape that
    turns a raw tick stream into fixed-rate features (the financial
    candlestick, but equally the "first/last reading per sensor-hour"
    compaction). FIRST_VALUE/LAST_VALUE is the aggregate family the window
    matrix lacked: unlike min/max it needs the ARG at an extreme, with a
    deterministic tie rule.

    Tie rule (mirrored in SQL): open = MIN(value) among min-ts rows,
    close = MAX(value) among max-ts rows — i.e. the lexicographic
    min/max of (ts, value), fully determined by the data with no
    dependence on row ids.

    Plan: per-BATCH vectorized bar partials first (one sort + run-boundary
    reduceat per batch — the shuffle carries at most one row per (user,
    hour) per batch, never ticks), then a coarse-key ``grouped_scan``
    merges partials: n sums, low/high fold, open/close re-apply the same
    lexicographic rule over partial endpoints (mergeability is why the
    rule is lexmin/lexmax rather than "first by id").

    Contract (mirrored in SQL): NULL user_id / ts / value rows are
    excluded (the entity-series contract of this module)."""
    from ocr_ray.functions.scalars import epoch_hours, to_cents
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts"))),
                pc.is_valid(t.column("value")),
            )
        )
        g = pa.table(
            {
                "user_id": t.column("user_id"),
                "hour": epoch_hours(t.column("ts")),
                "us": t.column("ts").cast(pa.int64()),
                "c": to_cents(t.column("value")),
            }
        )
        g = g.take(
            pc.sort_indices(
                g,
                sort_keys=[
                    ("user_id", "ascending"),
                    ("hour", "ascending"),
                    ("us", "ascending"),
                    ("c", "ascending"),
                ],
            )
        )
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        h = g.column("hour").to_numpy(zero_copy_only=False)
        us = g.column("us").to_numpy(zero_copy_only=False)
        c = g.column("c").to_numpy(zero_copy_only=False)
        n = len(u)
        if n == 0:
            e = np.array([], np.int64)
            return pa.table(
                {k: pa.array(e) for k in (
                    "user_id", "hour", "n", "low", "high",
                    "first_us", "open_c", "last_us", "close_c",
                )}
            )
        new = np.empty(n, dtype=bool)
        new[0] = True
        np.not_equal(u[1:], u[:-1], out=new[1:])
        new[1:] |= h[1:] != h[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        return pa.table(
            {
                "user_id": pa.array(u[starts]),
                "hour": pa.array(h[starts]),
                "n": pa.array((ends - starts).astype(np.int64)),
                "low": pa.array(np.minimum.reduceat(c, starts)),
                "high": pa.array(np.maximum.reduceat(c, starts)),
                "first_us": pa.array(us[starts]),
                "open_c": pa.array(c[starts]),
                "last_us": pa.array(us[ends - 1]),
                "close_c": pa.array(c[ends - 1]),
            }
        )

    pre = events.map_batches(partial, batch_format="pyarrow")

    def merge(df: "pd.DataFrame") -> "pd.DataFrame":
        keys = ["user_id", "hour"]
        agg = df.groupby(keys, sort=False).agg(
            n=("n", "sum"), low=("low", "min"), high=("high", "max")
        )
        opens = (
            df.sort_values(keys + ["first_us", "open_c"])
            .drop_duplicates(keys, keep="first")
            .set_index(keys)[["first_us", "open_c"]]
        )
        closes = (
            df.sort_values(keys + ["last_us", "close_c"])
            .drop_duplicates(keys, keep="last")
            .set_index(keys)[["last_us", "close_c"]]
        )
        out = agg.join(opens).join(closes).reset_index()
        return out.drop(columns=["__part"], errors="ignore")

    merged = grouped_scan(pre, "user_id", merge)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(t.column("user_id"), pa.int64()),
                "hour": pc.cast(t.column("hour"), pa.int64()),
                "n": pc.cast(t.column("n"), pa.int64()),
                "first_ts": pc.cast(t.column("first_us"), pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "last_ts": pc.cast(t.column("last_us"), pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "open_cents": pc.cast(t.column("open_c"), pa.int64()),
                "high_cents": pc.cast(t.column("high"), pa.int64()),
                "low_cents": pc.cast(t.column("low"), pa.int64()),
                "close_cents": pc.cast(t.column("close_c"), pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


USER_HOUR_OHLC_SQL = """
WITH v AS (
  SELECT user_id, epoch_us(ts) // 3600000000 AS hour, ts,
         CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
),
g AS (
  SELECT user_id, hour, CAST(COUNT(*) AS BIGINT) AS n,
         MIN(ts) AS first_ts, MAX(ts) AS last_ts,
         MIN(c) AS low_cents, MAX(c) AS high_cents
  FROM v GROUP BY 1, 2
)
SELECT g.user_id, g.hour, g.n, g.first_ts, g.last_ts,
       o.open_cents, g.high_cents, g.low_cents, cl.close_cents
FROM g
JOIN (SELECT user_id, hour, ts, MIN(c) AS open_cents FROM v GROUP BY 1, 2, 3) o
  ON o.user_id = g.user_id AND o.hour = g.hour AND o.ts = g.first_ts
JOIN (SELECT user_id, hour, ts, MAX(c) AS close_cents FROM v GROUP BY 1, 2, 3) cl
  ON cl.user_id = g.user_id AND cl.hour = g.hour AND cl.ts = g.last_ts
"""


# ---------------------------------------------------------------------------
# CUSUM change detection (clamped running sum via its closed window form)
# ---------------------------------------------------------------------------

_CUSUM_DRIFT_CENTS = 500  # k: allowance subtracted per observation
_CUSUM_ALARM_CENTS = 10_000  # h: alarm threshold on the statistic


def user_value_cusum(sf_dir: str) -> Dataset:
    """One-sided CUSUM change-detection statistic per user event:
    ``S_i = max(0, S_{i-1} + value_i - k)`` with alarm at ``S_i > h`` —
    the sequential drift detector (Page 1954) that flags a sustained
    upward shift in a user's value stream long before a mean test would.

    The clamp recursion is NOT a plain window aggregate, but it has the
    exact closed form ``S_i = P_i - least(0, running_min(P_i))`` with
    ``P_i`` the running sum of ``(value - k)`` — both engines compute THAT,
    so the gate is exact-integer over a genuinely stateful operator (same
    trick family as the drawdown/cummax scan, inverted).

    Plan: per-batch projection to (user, ts, event_id, d) cents, one
    coarse-key ``grouped_scan``; inside a partition each user segment is a
    vectorized cumsum + running-min (Python per segment, not per row).

    Contract (mirrored in SQL): NULL user_id / ts / value / event_id rows
    are excluded (event_id breaks ts ties so the order — and therefore
    every prefix sum — is fully determined)."""
    from ocr_ray.functions.scalars import to_cents
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        m = pc.is_valid(t.column("user_id"))
        for c in ("ts", "value", "event_id"):
            m = pc.and_(m, pc.is_valid(t.column(c)))
        t = t.filter(m)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "us": t.column("ts").cast(pa.int64()),
                "d": pc.subtract(
                    to_cents(t.column("value")), pa.scalar(_CUSUM_DRIFT_CENTS, pa.int64())
                ),
            }
        )

    pre = events.map_batches(prep, batch_format="pyarrow")

    def scan(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["user_id", "us", "event_id"])
        u = df["user_id"].to_numpy(np.int64)
        d = df["d"].to_numpy(np.int64)
        n = len(u)
        s = np.empty(n, dtype=np.int64)
        starts = np.concatenate(([0], np.flatnonzero(u[1:] != u[:-1]) + 1)) if n else np.array([], np.int64)
        ends = np.concatenate((starts[1:], [n])) if n else starts
        for a, b in zip(starts, ends):
            p = np.cumsum(d[a:b])
            s[a:b] = p - np.minimum(np.minimum.accumulate(p), 0)
        out = df[["user_id", "event_id"]].copy()
        out["cusum_cents"] = s
        out["alarm"] = s > _CUSUM_ALARM_CENTS
        return out

    return grouped_scan(pre, "user_id", scan)


USER_VALUE_CUSUM_SQL = f"""
WITH v AS (
  SELECT user_id, event_id, ts,
         CAST(ROUND(value * 100) AS BIGINT) - {_CUSUM_DRIFT_CENTS} AS d
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND value IS NOT NULL AND event_id IS NOT NULL
),
p AS (
  SELECT user_id, event_id, ts,
         SUM(d) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS p
  FROM v
),
r AS (
  SELECT user_id, event_id,
         p,
         MIN(p) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS run_min
  FROM p
)
SELECT user_id, event_id,
       CAST(p - LEAST(run_min, 0) AS BIGINT) AS cusum_cents,
       (p - LEAST(run_min, 0)) > {_CUSUM_ALARM_CENTS} AS alarm
FROM r
"""


# ---------------------------------------------------------------------------
# business-day calendar arithmetic: order -> ship fulfillment latency census
# ---------------------------------------------------------------------------

_US_PER_DAY_BD = 86_400_000_000
# weekdays among epoch days [0..k) for k = 0..6; epoch day 0 (1970-01-01)
# is a THURSDAY, so the 7-day pattern is Thu Fri Sat Sun Mon Tue Wed
_BD_PREFIX = (0, 1, 2, 2, 2, 3, 4)


def ship_delay_business_days(sf_dir: str) -> Dataset:
    """Fulfillment-latency census in BUSINESS days: for every lineitem, the
    count of weekdays in ``(o_orderdate, l_shipdate]`` — calendar-aware
    interval arithmetic (weekends don't count against an SLA), the shape
    plain timestamp subtraction can't express. Output is the tiny
    ``(business_days, n_lineitems)`` distribution.

    The weekday count uses the closed form ``g(d) = 5*(d/7) + P[d%7]``
    (weekdays among epoch days ``[0, d)``; epoch day zero is a Thursday,
    P its 7-day prefix table) so both engines compute identical integers —
    no per-day loop, no calendar table.

    Plan: orders project to (key, order-day) and join lineitem via the
    cost-based ``auto_join`` (broadcast under threshold, hash-partitioned
    above); the census partial runs per batch so the final shuffle carries
    at most |distinct delays| rows per batch.

    Contract (mirrored in SQL): NULL order/ship dates excluded; inner join
    drops orphan lineitems; a ship date before the order date yields a
    negative count (the audit signal, not an error)."""
    from ocr_ray.functions.joins import auto_join

    orders = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate"])
    li = rd.read_parquet(_pq(sf_dir, "lineitem"), columns=["l_orderkey", "l_shipdate"])

    def days(t: pa.Table, col: str, out: str) -> pa.Table:
        t = t.filter(pc.is_valid(t.column(col)))
        us = t.column(col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        d = np.floor_divide(us, _US_PER_DAY_BD)
        return t.drop_columns([col]).append_column(out, pa.array(d, pa.int64()))

    o = orders.map_batches(lambda t: days(t, "o_orderdate", "od"), batch_format="pyarrow")
    l = li.map_batches(lambda t: days(t, "l_shipdate", "sd"), batch_format="pyarrow")
    joined = auto_join(l, o, on="l_orderkey", right_on="o_orderkey")

    def _g(d: np.ndarray) -> np.ndarray:
        p = np.array(_BD_PREFIX, dtype=np.int64)
        return 5 * np.floor_divide(d, 7) + p[np.mod(d, 7)]

    def census(t: pa.Table) -> pa.Table:
        sd = t.column("sd").to_numpy(zero_copy_only=False).astype(np.int64)
        od = t.column("od").to_numpy(zero_copy_only=False).astype(np.int64)
        bd = _g(sd + 1) - _g(od + 1)
        u, c = np.unique(bd, return_counts=True)
        return pa.table(
            {"business_days": pa.array(u, pa.int64()), "n": pa.array(c.astype(np.int64))}
        )

    from ray.data.aggregate import Sum

    return (
        joined.map_batches(census, batch_format="pyarrow")
        .groupby("business_days")
        .aggregate(Sum("n", alias_name="n_lineitems"))
    )


SHIP_DELAY_BUSINESS_DAYS_SQL = """
WITH j AS (
  SELECT epoch_us(o.o_orderdate) // 86400000000 AS od,
         epoch_us(l.l_shipdate) // 86400000000 AS sd
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
),
g AS (
  SELECT (5 * ((sd + 1) // 7) + [0, 1, 2, 2, 2, 3, 4][((sd + 1) % 7) + 1])
       - (5 * ((od + 1) // 7) + [0, 1, 2, 2, 2, 3, 4][((od + 1) % 7) + 1])
         AS business_days
  FROM j
)
SELECT CAST(business_days AS BIGINT) AS business_days,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM g GROUP BY 1
"""


# ---------------------------------------------------------------------------
# moving median: windowed robust statistic (trailing 3-row discrete median)
# ---------------------------------------------------------------------------


def user_value_moving_median(sf_dir: str) -> Dataset:
    """Trailing 3-row MOVING MEDIAN of each user's value stream — the
    robust smoother (one wild tick perturbs a moving average by its full
    magnitude; the moving median ignores it entirely), and the windowed
    face of the median/MAD family. Discrete lower-median rule, so every
    output is an actual data value and the gate is integer-exact.

    The window is ROWS 2 PRECEDING..CURRENT over (ts, event_id) order.
    Partial windows at a segment's head use the same rule over what
    exists (n=1 → the value; n=2 → the lower of the two).

    Plan: one coarse-key ``grouped_scan``; inside a partition the median
    of each 3-window is branch-free integer arithmetic (med3 = a+b+c −
    max − min) over two intra-segment shifts — no per-row Python, no
    sorting beyond the segment sort.

    Contract (mirrored in SQL): NULL user_id / ts / value / event_id rows
    are excluded."""
    from ocr_ray.functions.scalars import to_cents
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        m = pc.is_valid(t.column("user_id"))
        for c in ("ts", "value", "event_id"):
            m = pc.and_(m, pc.is_valid(t.column(c)))
        t = t.filter(m)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "us": t.column("ts").cast(pa.int64()),
                "v": to_cents(t.column("value")),
            }
        )

    pre = events.map_batches(prep, batch_format="pyarrow")

    def scan(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["user_id", "us", "event_id"])
        u = df["user_id"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.int64)
        n = len(u)
        out = np.empty(n, dtype=np.int64)
        if n:
            starts = np.concatenate(([0], np.flatnonzero(u[1:] != u[:-1]) + 1))
            # position within segment (0-based)
            seg_of = np.repeat(np.arange(len(starts)), np.diff(np.append(starts, n)))
            pos = np.arange(n) - starts[seg_of]
            p1 = np.where(pos >= 1, np.roll(v, 1), 0)
            p2 = np.where(pos >= 2, np.roll(v, 2), 0)
            # full window: med3 = a+b+c - max - min (branch-free, exact)
            m3 = (
                v + p1 + p2
                - np.maximum(np.maximum(v, p1), p2)
                - np.minimum(np.minimum(v, p1), p2)
            )
            out = np.where(pos == 0, v, np.where(pos == 1, np.minimum(v, p1), m3))
        res = df[["user_id", "event_id"]].copy()
        res["med3_cents"] = out
        return res

    return grouped_scan(pre, "user_id", scan)


USER_VALUE_MOVING_MEDIAN_SQL = """
WITH v AS (
  SELECT user_id, event_id, ts, CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND value IS NOT NULL AND event_id IS NOT NULL
)
SELECT user_id, event_id,
       CAST(quantile_disc(c, 0.5) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS med3_cents
FROM v
"""


# ---------------------------------------------------------------------------
# per-key point-in-interval join: purchases inside derived session windows
# ---------------------------------------------------------------------------

_SESS_GAP_US = 1_800_000_000  # 30-minute session gap


def purchases_in_sessions(sf_dir: str) -> Dataset:
    """Point-in-interval join against DERIVED intervals: sessionize each
    user's non-purchase activity (30-min gap rule), then place every
    purchase inside its covering session — "did this purchase happen
    during an active browsing session, and which one?". Two-sided shape
    the matrix lacked: the intervals are computed, not stored, and the
    probe stream joins per entity (``events_value_banded`` is a global
    value-range join; ``purchases_concurrent_events`` is keyless).

    Gap sessions are disjoint per user, so each purchase has AT MOST one
    covering session — the join is one searchsorted per user segment, no
    pair expansion.

    Plan: ONE coarse-key ``grouped_scan`` co-locates both roles of a user
    (tagged in the same stream — no self-join of the events table);
    session building and interval placement are vectorized per segment.

    Contract (mirrored in SQL): NULL user_id / ts rows are excluded from
    both roles; purchases additionally need a non-NULL event_id; a NULL
    event_type row belongs to the session stream (IS DISTINCT FROM)."""
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts")))
        )
        is_p = pc.equal(
            pc.fill_null(t.column("event_type"), ""), pa.scalar("purchase")
        )
        keep = pc.or_(pc.invert(is_p), pc.is_valid(t.column("event_id")))
        t = t.filter(keep)
        is_p = pc.equal(pc.fill_null(t.column("event_type"), ""), pa.scalar("purchase"))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "us": t.column("ts").cast(pa.int64()),
                "is_p": pc.cast(is_p, pa.int8()),
            }
        )

    pre = events.map_batches(prep, batch_format="pyarrow")

    def scan(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["user_id", "us"])
        out_eid, out_uid, out_st, out_cov = [], [], [], []
        for uid, g in df.groupby("user_id", sort=False):
            us = g["us"].to_numpy(np.int64)
            isp = g["is_p"].to_numpy(np.int8).astype(bool)
            e = us[~isp]
            p_us = us[isp]
            p_eid = g["event_id"].to_numpy()[isp]
            if len(p_us) == 0:
                continue
            if len(e) == 0:
                starts = np.array([], np.int64)
                ends = np.array([], np.int64)
            else:
                new = np.empty(len(e), dtype=bool)
                new[0] = True
                new[1:] = (e[1:] - e[:-1]) > _SESS_GAP_US
                sidx = np.flatnonzero(new)
                starts = e[sidx]
                ends = e[np.append(sidx[1:], len(e)) - 1]
            if len(starts):
                k = np.searchsorted(starts, p_us, side="right") - 1
                cov = (k >= 0) & (p_us <= ends[np.maximum(k, 0)])
                st = np.where(cov, starts[np.maximum(k, 0)], 0)
            else:
                cov = np.zeros(len(p_us), bool)
                st = np.zeros(len(p_us), np.int64)
            out_eid.extend(int(x) for x in p_eid)
            out_uid.extend([int(uid)] * len(p_us))
            out_st.extend(int(s) if c else None for s, c in zip(st, cov))
            out_cov.extend(bool(c) for c in cov)
        import pandas as pd

        return pd.DataFrame(
            {
                "event_id": pd.array(out_eid, dtype="int64"),
                "user_id": pd.array(out_uid, dtype="int64"),
                "session_start_us": pd.array(out_st, dtype="Int64"),
                "covered": pd.array(out_cov, dtype="bool"),
            }
        )

    out = grouped_scan(pre, "user_id", scan)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": pc.cast(t.column("event_id"), pa.int64()),
                "user_id": pc.cast(t.column("user_id"), pa.int64()),
                "session_start": pc.cast(t.column("session_start_us"), pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "covered": t.column("covered"),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


PURCHASES_IN_SESSIONS_SQL = f"""
WITH e AS (
  SELECT user_id, ts FROM events
  WHERE event_type IS DISTINCT FROM 'purchase'
    AND user_id IS NOT NULL AND ts IS NOT NULL
),
p AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type = 'purchase'
    AND user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL
),
s0 AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_SESS_GAP_US}
              THEN 1 ELSE 0 END AS new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s1 AS (
  SELECT user_id, ts,
         SUM(new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM s0
),
sess AS (SELECT user_id, sid, MIN(ts) AS st, MAX(ts) AS en FROM s1 GROUP BY 1, 2)
SELECT p.event_id, p.user_id, sess.st AS session_start,
       sess.st IS NOT NULL AS covered
FROM p LEFT JOIN sess
  ON sess.user_id = p.user_id AND p.ts >= sess.st AND p.ts <= sess.en
"""


# ---------------------------------------------------------------------------
# survival analysis: Kaplan-Meier risk table for click -> purchase conversion
# ---------------------------------------------------------------------------


def user_conversion_survival(sf_dir: str) -> Dataset:
    """Kaplan–Meier risk table for time-to-conversion: each user enters at
    their first click; the event is their first purchase at-or-after it;
    users who never convert are RIGHT-CENSORED at their last observed
    activity. Output per distinct duration t (whole hours): the number
    still at risk, conversions at t, and censorings at t — the exact
    integer ingredients of the KM curve (the estimator itself is a product
    of these rationals; shipping the table keeps the gate float-free).
    Survival analysis is the churn/conversion shape none of the funnel
    ops cover: funnels count WHO converted, KM says WHEN, correctly
    handling users still "alive".

    Plan: ONE coarse-key ``grouped_scan`` computes the 3 per-user
    timestamps (first click, first purchase ≥ it, last activity); the
    duration census is tiny (distinct hours) and the at-risk column is a
    reverse cumulative sum over it on the driver.

    Contract (mirrored in SQL): NULL user_id / ts rows are excluded;
    durations floor to whole hours (non-negative, so SQL ``//`` agrees);
    users with no click never enter the risk set."""
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["user_id", "ts", "event_type"]
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts")))
        )
        ty = pc.fill_null(t.column("event_type"), "")
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "us": t.column("ts").cast(pa.int64()),
                "is_click": pc.cast(pc.equal(ty, pa.scalar("click")), pa.int8()),
                "is_purchase": pc.cast(pc.equal(ty, pa.scalar("purchase")), pa.int8()),
            }
        )

    pre = events.map_batches(prep, batch_format="pyarrow")

    def scan(df: "pd.DataFrame") -> "pd.DataFrame":
        recs = []
        for uid, g in df.groupby("user_id", sort=False):
            us = g["us"].to_numpy(np.int64)
            clicks = us[g["is_click"].to_numpy(np.int8) == 1]
            if len(clicks) == 0:
                continue
            t0 = clicks.min()
            buys = us[(g["is_purchase"].to_numpy(np.int8) == 1) & (us >= t0)]
            if len(buys):
                t = (int(buys.min()) - int(t0)) // 3_600_000_000
                censored = False
            else:
                t = (int(us.max()) - int(t0)) // 3_600_000_000
                censored = True
            recs.append((t, censored))
        import pandas as pd

        out = pd.DataFrame(recs, columns=["t", "censored"])
        if out.empty:
            return pd.DataFrame(
                {"t": pd.array([], dtype="int64"),
                 "d": pd.array([], dtype="int64"),
                 "c": pd.array([], dtype="int64")}
            )
        g = out.groupby("t")
        return pd.DataFrame(
            {
                "t": g.size().index.to_numpy(np.int64),
                "d": g.apply(lambda x: int((~x["censored"]).sum())).to_numpy(np.int64),
                "c": g.apply(lambda x: int(x["censored"].sum())).to_numpy(np.int64),
            }
        )

    census: dict = {}
    for b in grouped_scan(pre, "user_id", scan).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for t, d, c in zip(
            b.column("t").to_pylist(), b.column("d").to_pylist(), b.column("c").to_pylist()
        ):
            cur = census.get(t, (0, 0))
            census[t] = (cur[0] + d, cur[1] + c)

    ts_sorted = sorted(census, reverse=True)
    risk = 0
    rows = []
    for t in ts_sorted:
        d, c = census[t]
        risk += d + c
        rows.append((t, risk, d, c))
    rows.reverse()
    return rd.from_arrow(
        pa.table(
            {
                "t_hours": pa.array([r[0] for r in rows], pa.int64()),
                "n_risk": pa.array([r[1] for r in rows], pa.int64()),
                "n_events": pa.array([r[2] for r in rows], pa.int64()),
                "n_censored": pa.array([r[3] for r in rows], pa.int64()),
            }
        )
    )


USER_CONVERSION_SURVIVAL_SQL = """
WITH c AS (
  SELECT user_id, MIN(ts) AS t0 FROM events
  WHERE event_type = 'click' AND user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS tp
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts IS NOT NULL AND e.ts >= c.t0
  GROUP BY 1
),
l AS (
  SELECT e.user_id, MAX(e.ts) AS tl
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.ts IS NOT NULL GROUP BY 1
),
d AS (
  SELECT c.user_id,
         CASE WHEN p.tp IS NOT NULL
              THEN (epoch_us(p.tp) - epoch_us(c.t0)) // 3600000000
              ELSE (epoch_us(l.tl) - epoch_us(c.t0)) // 3600000000 END AS t,
         p.tp IS NULL AS censored
  FROM c LEFT JOIN p ON p.user_id = c.user_id JOIN l ON l.user_id = c.user_id
),
cen AS (
  SELECT t,
         CAST(COUNT(*) FILTER (WHERE NOT censored) AS BIGINT) AS d,
         CAST(COUNT(*) FILTER (WHERE censored) AS BIGINT) AS c
  FROM d GROUP BY t
)
SELECT t AS t_hours,
       CAST(SUM(d + c) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk,
       d AS n_events, c AS n_censored
FROM cen
"""


# ---------------------------------------------------------------------------
# sequence pattern matching (MATCH_RECOGNIZE shape): click -> view* -> purchase
# ---------------------------------------------------------------------------

_SEQ_PATTERN = rb"cv*p"  # click, any views, purchase — non-overlapping matches
_SEQ_SYMBOLS = {"click": ord("c"), "view": ord("v"), "purchase": ord("p")}
_SEQ_OTHER = ord("o")


def user_event_pattern(sf_dir: str) -> Dataset:
    """Complex-event-processing / MATCH_RECOGNIZE shape: per user, count
    NON-OVERLAPPING occurrences of the symbolic pattern ``click view*
    purchase`` in the time-ordered event stream — regex over a sequence of
    ROWS, not characters of a text column. Funnels count stage reachability;
    this recognizes the exact motif (a purchase directly fed by a click
    through any number of views), the CEP primitive none of the window ops
    express.

    Both engines run the SAME regex on the SAME symbol string: the Ray side
    builds each user's symbol bytes in one vectorized translate + slice,
    the oracle builds it with ``string_agg(... ORDER BY ts, event_id)`` —
    leftmost non-overlapping semantics agree between RE2 and Python ``re``
    for this pattern family (no lookaround, no alternation overlap).

    Plan: ONE coarse-key ``grouped_scan``; symbol translation is an
    ``index_in`` gather per batch; per user segment one compiled-regex
    ``findall`` over a bytes slice (Python per USER, not per event).

    Contract (mirrored in SQL): NULL user_id / ts / event_id rows excluded;
    unknown and NULL event types map to the neutral symbol 'o'."""
    import re as _re

    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )
    type_arr = pa.array(list(_SEQ_SYMBOLS), pa.string())
    code_arr = np.array(list(_SEQ_SYMBOLS.values()) + [_SEQ_OTHER], np.uint8)

    def prep(t: pa.Table) -> pa.Table:
        m = pc.is_valid(t.column("user_id"))
        for c in ("ts", "event_id"):
            m = pc.and_(m, pc.is_valid(t.column(c)))
        t = t.filter(m)
        idx = pc.index_in(t.column("event_type"), value_set=type_arr)
        idx = pc.fill_null(idx, len(_SEQ_SYMBOLS)).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "us": t.column("ts").cast(pa.int64()),
                "sym": pa.array(code_arr[idx], pa.uint8()),
            }
        )

    pre = events.map_batches(prep, batch_format="pyarrow")
    pat = _re.compile(_SEQ_PATTERN)

    def scan(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        df = df.sort_values(["user_id", "us", "event_id"])
        u = df["user_id"].to_numpy(np.int64)
        sym = df["sym"].to_numpy(np.uint8)
        n = len(u)
        if n == 0:
            return pd.DataFrame(
                {"user_id": pd.array([], dtype="int64"),
                 "seq_len": pd.array([], dtype="int64"),
                 "n_matches": pd.array([], dtype="int64")}
            )
        starts = np.concatenate(([0], np.flatnonzero(u[1:] != u[:-1]) + 1))
        ends = np.append(starts[1:], n)
        buf = sym.tobytes()
        uids, lens, hits = [], [], []
        for a, b in zip(starts, ends):
            uids.append(int(u[a]))
            lens.append(b - a)
            hits.append(len(pat.findall(buf[a:b])))
        return pd.DataFrame(
            {
                "user_id": pd.array(uids, dtype="int64"),
                "seq_len": pd.array(lens, dtype="int64"),
                "n_matches": pd.array(hits, dtype="int64"),
            }
        )

    return grouped_scan(pre, "user_id", scan)


USER_EVENT_PATTERN_SQL = """
WITH v AS (
  SELECT user_id, ts, event_id,
         CASE event_type WHEN 'click' THEN 'c' WHEN 'view' THEN 'v'
                         WHEN 'purchase' THEN 'p' ELSE 'o' END AS sym
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL
),
s AS (
  SELECT user_id, string_agg(sym, '' ORDER BY ts, event_id) AS seq
  FROM v GROUP BY 1
)
SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
       CAST(len(regexp_extract_all(seq, 'cv*p')) AS BIGINT) AS n_matches
FROM s
"""


# ---------------------------------------------------------------------------
# stream enrichment: trailing-window aggregate of ANOTHER stream at event time
# ---------------------------------------------------------------------------

_ENRICH_WINDOW_US = 3_600_000_000  # trailing hour


def purchase_click_pressure(sf_dir: str) -> Dataset:
    """Stream enrichment with windowed state: every purchase annotated with
    the user's CLICK count in the trailing hour ending at the purchase —
    the feature-at-event-time join of online feature stores ("how hot was
    this user when they bought"). Differs from the RANGE-frame window
    (``user_trailing_hour_spend``) in that the aggregate is over a
    DIFFERENT stream than the one being annotated — an interval-join +
    aggregate, not a self-window.

    Plan: ONE coarse-key ``grouped_scan`` co-locates both streams of a
    user; per segment the trailing count is TWO searchsorted probes into
    the user's sorted click timestamps (count ≤ t minus count < t − W) —
    no pair expansion, no per-row Python.

    Contract (mirrored in SQL): NULL user_id / ts rows excluded from both
    roles; purchases need a non-NULL event_id; the window is half-open
    ``(t−W, t]``."""
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(
        _pq(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("user_id")), pc.is_valid(t.column("ts")))
        )
        ty = pc.fill_null(t.column("event_type"), "")
        is_p = pc.equal(ty, pa.scalar("purchase"))
        is_c = pc.equal(ty, pa.scalar("click"))
        t = t.filter(pc.or_(is_c, pc.and_(is_p, pc.is_valid(t.column("event_id")))))
        ty = pc.fill_null(t.column("event_type"), "")
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "us": t.column("ts").cast(pa.int64()),
                "is_p": pc.cast(pc.equal(ty, pa.scalar("purchase")), pa.int8()),
            }
        )

    pre = events.map_batches(prep, batch_format="pyarrow")

    def scan(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        out_eid, out_uid, out_us, out_n = [], [], [], []
        for uid, g in df.groupby("user_id", sort=False):
            us = g["us"].to_numpy(np.int64)
            isp = g["is_p"].to_numpy(np.int8) == 1
            clicks = np.sort(us[~isp])
            p_us = us[isp]
            if len(p_us) == 0:
                continue
            p_eid = g["event_id"].to_numpy()[isp]
            hi = np.searchsorted(clicks, p_us, side="right")
            lo = np.searchsorted(clicks, p_us - _ENRICH_WINDOW_US, side="right")
            n = (hi - lo).astype(np.int64)
            out_eid.extend(int(x) for x in p_eid)
            out_uid.extend([int(uid)] * len(p_us))
            out_us.extend(int(x) for x in p_us)
            out_n.extend(int(x) for x in n)
        return pd.DataFrame(
            {
                "event_id": pd.array(out_eid, dtype="int64"),
                "user_id": pd.array(out_uid, dtype="int64"),
                "us": pd.array(out_us, dtype="int64"),
                "clicks_1h": pd.array(out_n, dtype="int64"),
            }
        )

    out = grouped_scan(pre, "user_id", scan)
    return out.map_batches(
        lambda t: pa.table(
            {
                "event_id": pc.cast(t.column("event_id"), pa.int64()),
                "user_id": pc.cast(t.column("user_id"), pa.int64()),
                "ts": pc.cast(t.column("us"), pa.int64()).cast(pa.timestamp("us")),
                "clicks_1h": pc.cast(t.column("clicks_1h"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


PURCHASE_CLICK_PRESSURE_SQL = f"""
WITH c AS (
  SELECT user_id, ts FROM events
  WHERE event_type = 'click' AND user_id IS NOT NULL AND ts IS NOT NULL
),
p AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type = 'purchase'
    AND user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL
)
SELECT p.event_id, p.user_id, p.ts,
       CAST(COUNT(c.ts) AS BIGINT) AS clicks_1h
FROM p LEFT JOIN c
  ON c.user_id = p.user_id
 AND c.ts <= p.ts
 AND epoch_us(c.ts) > epoch_us(p.ts) - {_ENRICH_WINDOW_US}
GROUP BY p.event_id, p.user_id, p.ts
"""


# ---------------------------------------------------------------------------
# per-user hourly burst profile (stream anomaly census)
# ---------------------------------------------------------------------------

_US_PER_HOUR_B = 3_600_000_000


def user_burst_profile(sf_dir: str) -> Dataset:
    """Per-user burst census over hourly rate cells — the bot / runaway-
    client screen a stream-ingest pipeline runs before per-user rates feed
    downstream features. One row per user (zeros included, so the gate can
    never be vacuously empty): total events, active hours, the hottest
    hour, and how many hours were BURSTS — at least 2 events AND at least
    2x the user's own average per-active-hour rate, evaluated as the exact
    integer cross-product ``n_cell * m_user >= 2 * n_user`` (no division).

    Plan: per-batch (user, hour) count partials (Arrow group_by), ONE
    coarse-key exchange co-locating each user (16 B per observed cell — a
    direct (user, hour) hash aggregate is the measured ~170k rows/s Ray
    hash-Aggregate census wall, BASELINE.md), then one vectorized
    per-partition pass merges cross-block partials and reduces the
    profile. NULL user_id / ts rows are excluded (mirrored in SQL)."""
    from ocr_ray.pipelines.conversation import grouped_scan

    events = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t.column("ts")), pc.is_valid(t.column("user_id")))
        )
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = us // _US_PER_HOUR_B
        g = (
            pa.table({"user_id": t.column("user_id"), "hour": pa.array(hour)})
            .group_by(["user_id", "hour"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["user_id", "hour", "n"])

    pre = events.map_batches(partial, batch_format="pyarrow")

    def profile(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "n_active_hours": pa.array([], pa.int64()),
                "max_hour_events": pa.array([], pa.int64()),
                "n_burst_hours": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        g = (
            t.group_by(["user_id", "hour"])
            .aggregate([("n", "sum")])
            .sort_by([("user_id", "ascending"), ("hour", "ascending")])
        )
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        n = g.column("n_sum").to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(u)
        starts = np.concatenate(([0], np.flatnonzero(u[1:] != u[:-1]) + 1))
        ends = np.concatenate((starts[1:], [m]))
        seg = np.repeat(np.arange(len(starts)), ends - starts)
        m_user = (ends - starts)[seg]
        n_user = np.add.reduceat(n, starts)[seg]
        burst = ((n >= 2) & (n * m_user >= 2 * n_user)).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(u[starts]),
                "n_events": pa.array(np.add.reduceat(n, starts)),
                "n_active_hours": pa.array((ends - starts).astype(np.int64)),
                "max_hour_events": pa.array(np.maximum.reduceat(n, starts)),
                "n_burst_hours": pa.array(np.add.reduceat(burst, starts)),
            }
        )

    return grouped_scan(pre, "user_id", profile, batch_format="pyarrow")


USER_BURST_PROFILE_SQL = f"""
WITH cells AS (
  SELECT user_id, epoch_us(ts) // {_US_PER_HOUR_B} AS hour, COUNT(*) AS n
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1, 2
),
base AS (
  SELECT user_id, COUNT(*) AS m_user, SUM(n) AS n_user FROM cells GROUP BY 1
)
SELECT c.user_id,
       CAST(SUM(c.n) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_active_hours,
       CAST(MAX(c.n) AS BIGINT) AS max_hour_events,
       CAST(COUNT(*) FILTER (
         WHERE c.n >= 2 AND c.n * b.m_user >= 2 * b.n_user
       ) AS BIGINT) AS n_burst_hours
FROM cells c JOIN base b USING (user_id)
GROUP BY 1
"""
