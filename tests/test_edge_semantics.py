"""Dirty-input parity: operators must match their DuckDB oracles on NULLs,
negatives and duplicate keys — the cases the clean fixtures never hit
(found by review; each was a silent divergence before the fix)."""

import datetime as dt
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd


def _dirty_events_dir(tmp_path) -> str:
    ts = dt.datetime(2024, 1, 1)
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "ts": pa.array([ts, ts, None, ts, ts]),
            "user_id": pa.array([1, 2, None, 2, 1], pa.int64()),
            "event_type": pa.array(["click", "purchase", "click", "view", "click"]),
            "value": pa.array([12.5, -1.0, None, 0.0, 499.99], pa.float64()),
            "props": pa.array(["{}"] * 5),
        }
    )
    d = tmp_path / "sf_dirty"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


def _compare(got, sql, sf_dir):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = con.sql(sql).df()
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    # convert_dtypes: a NULL in a DuckDB BIGINT result arrives as float64
    # (51249.0/NaN) while the engine emits nullable Int64 — normalize both
    g = got.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True).convert_dtypes()
    w = want.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True).convert_dtypes()
    assert g.astype(str).values.tolist() == w.astype(str).values.tolist()


def test_events_value_banded_drops_negative_and_null(tmp_path):
    """Range-join semantics: NULL value and cents below the lowest band
    edge match no interval and are dropped, like the SQL inner join."""
    from ocr_ray.pipelines.relational import EVENTS_VALUE_BANDED_SQL, events_value_banded

    d = _dirty_events_dir(tmp_path)
    got = events_value_banded(d).to_pandas()
    assert got["n"].sum() == 3  # -1.00 and NULL dropped
    _compare(got, EVENTS_VALUE_BANDED_SQL, d)


def test_profile_events_nulls(tmp_path):
    """n_distinct excludes NULL (COUNT DISTINCT semantics) while n_null
    reports it; min/max skip NULLs."""
    from ocr_ray.pipelines.relational import PROFILE_EVENTS_SQL, profile_events

    d = _dirty_events_dir(tmp_path)
    got = profile_events(d).to_pandas()
    row = got.set_index("col").loc["user_id"]
    assert row["n_null"] == 1 and row["n_distinct"] == 2
    _compare(got, PROFILE_EVENTS_SQL, d)


def test_conv_texts_null_text_is_empty_position():
    """A NULL turn joins as '' (position preserved), not a NULL document."""
    from ocr_ray.pipelines.conversation import conv_texts

    t = pa.table(
        {
            "conv_id": ["c", "c", "c"],
            "turn_idx": pa.array([0, 1, 2], pa.int32()),
            "text": pa.array(["a", None, "b"], pa.string()),
        }
    )
    rows = conv_texts(rd.from_arrow(t)).take_all()
    assert rows[0]["conv_text"] == "a\n\nb"
    assert rows[0]["n_turns"] == 3


def test_pagerank_self_loops_identical_across_tiers():
    """Self-loops are dropped by spec in every tier."""
    from ocr_ray.ops.graph import pagerank

    edges = pa.table(
        {"src": pa.array([0, 1], pa.int64()), "dst": pa.array([0, 0], pa.int64())}
    )
    tiers = [
        {},
        {"local_edges_max": 0},
        {"local_edges_max": 0, "broadcast_nodes_max": 0},
    ]
    results = [
        {r["node"]: r["pr"] for r in pagerank(rd.from_arrow(edges), iters=1, **kw).take_all()}
        for kw in tiers
    ]
    assert results[0] == results[1] == results[2]
    assert results[0][0] == 150_000_000 + 85 * 1_000_000_000 // 100  # only 1->0 votes


def test_upsert_refuses_duplicate_delta_keys(tmp_path):
    from ocr_ray.state.sink import upsert_partitioned, write_partitioned

    base = pa.table(
        {
            "conv_id": pa.array(["a"], pa.string()),
            "turn_idx": pa.array([0], pa.int32()),
            "text": pa.array(["x"], pa.string()),
        }
    )
    out = str(tmp_path / "t")
    write_partitioned(rd.from_arrow(base), out, num_partitions=2)
    dup = pa.table(
        {
            "conv_id": pa.array(["a", "a"], pa.string()),
            "turn_idx": pa.array([0, 0], pa.int32()),
            "text": pa.array(["v1", "v2"], pa.string()),
        }
    )
    with pytest.raises(Exception, match="duplicate"):
        upsert_partitioned(rd.from_arrow(dup), out)


def test_user_rolling_spend_dirty_matches_sql(tmp_path):
    """NULL user_id is one window partition, NULL cents is skipped by the
    frame SUM, NULL ts sorts last — pandas and DuckDB agree row for row
    (this crashed outright before the dropna=False fix)."""
    from ocr_ray.pipelines.relational import USER_ROLLING_SPEND_SQL, user_rolling_spend

    d = _dirty_events_dir(tmp_path)
    got = user_rolling_spend(d)
    got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    _compare(got, USER_ROLLING_SPEND_SQL, d)


def test_distinct_users_excludes_null(tmp_path):
    from ocr_ray.pipelines.relational import DISTINCT_USERS_SQL, distinct_users

    d = _dirty_events_dir(tmp_path)
    got = distinct_users(d).to_pandas()
    assert got["n_users"][0] == 2  # NULL excluded: users {1, 2}
    _compare(got, DISTINCT_USERS_SQL, d)


def test_event_props_stats_null_key_total(tmp_path):
    """A NULL event_type must not crash the shuffle; the engine groups it
    under '' (documented divergence: SQL keeps a NULL group — Ray's
    sort-based groupby cannot order None against str). Totals match."""
    from ocr_ray.pipelines.relational import event_props_stats

    d = _dirty_events_dir(tmp_path)
    got = event_props_stats(d).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    want = con.sql(
        "SELECT CAST(COUNT(TRY_CAST(json_extract_string(props,'$.k') AS BIGINT)) AS BIGINT) FROM events"
    ).fetchone()[0]
    assert got["n_with_k"].sum() == want


def test_latest_event_null_ts_not_preferred(tmp_path):
    """A NULL ts must never win keep-last (SQL ORDER BY ts DESC is NULLS
    LAST) — and the batch partial must not discard the true latest row."""
    from ocr_ray.pipelines.relational import LATEST_EVENT_PER_USER_SQL, latest_event_per_user

    d = _dirty_events_dir(tmp_path)
    got = latest_event_per_user(d)
    got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    _compare(got, LATEST_EVENT_PER_USER_SQL, d)


def test_auto_join_empty_small_side_with_schema(ray_session):
    """A legitimately-empty small side (HAVING killed every group) must
    broadcast a TYPED empty frame, not crash the join (Ray 2.49 drops
    0-row blocks at materialize, so the schema must come from the caller)."""
    from ocr_ray.functions.joins import auto_join

    big = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()), "v": pa.array([10, 20, 30], pa.int64())})
    )
    empty_small = rd.from_arrow(
        pa.table({"rk": pa.array([9], pa.int64()), "w": pa.array([9], pa.int64())})
    ).filter(expr="rk < 0")
    out = auto_join(
        big,
        empty_small,
        on="k",
        right_on="rk",
        right_schema=pa.schema([("rk", pa.int64()), ("w", pa.int64())]),
    )
    assert out.count() == 0  # inner join vs empty -> empty, no crash


def test_sum_partials_gated_paths(ray_session):
    """Both sides of the census gate: the driver combine sums partials
    exactly, and crossing the row gate returns None (distributed path)."""
    from ocr_ray.ops.corpus import _sum_partials_gated

    t = pa.table(
        {"h": pa.array([1, 2, 1, 3, 2, 1], pa.int64()), "n": pa.array([1] * 6, pa.int64())}
    )
    local = _sum_partials_gated(rd.from_arrow(t), "h")
    got = dict(zip(local["h"], local["n"]))
    assert got == {1: 3, 2: 2, 3: 1}
    assert _sum_partials_gated(rd.from_arrow(t), "h", gate_rows=3) is None
