"""Hostile-input sweep over EVERY statically-SQL-gated query.

The driver's gate runs on clean synthetic data; this sweep derives a
nasty copy of all ten tables from sf0.001 (NULLs injected into every
column on a deterministic stride, a stripe of numerics negated) and
asserts each Ray plan still matches its DuckDB oracle EXACTLY — the
three-valued-logic regression net for the whole surface.

Queries whose oracle SQL is built per-sf against side fixtures are
exercised by their own tests, not here.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

_SRC = "/root/testdata/sf0.001"
_N_ROWS = 240  # per table cap — keeps the sweep fast


def _perturb(t: pa.Table, tname: str) -> pa.Table:
    """Deterministic hostility: for column j, rows where (i + 3*j) % 7 == 0
    go NULL; numeric rows where (i + j) % 11 == 0 negate."""
    t = t.slice(0, _N_ROWS)
    n = t.num_rows
    idx = np.arange(n)
    cols = {}
    for j, name in enumerate(t.column_names):
        col = t.column(name).combine_chunks()
        null_mask = pa.array((idx + 3 * j) % 7 == 0)
        if pa.types.is_floating(col.type) or pa.types.is_integer(col.type):
            neg = pa.array((idx + j) % 11 == 0)
            col = pc.if_else(neg, pc.negate_checked(pc.cast(col, col.type)), col)
        col = pc.if_else(null_mask, pa.scalar(None, col.type), col)
        cols[name] = col
    return pa.table(cols)


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("hostile_sf")
    for name in _TABLES:
        t = pq.read_table(f"{_SRC}/{name}.parquet")
        pq.write_table(_perturb(t, name), str(d / f"{name}.parquet"))
    return str(d)


def _static_gated():
    """(name, fn, sql) for every query whose oracle is a static string."""
    from ocr_ray.ops import REGISTRY as OPS
    from ocr_ray.pipelines.relational import REGISTRY as REL

    out = []
    for reg in (REL, OPS):
        for name, (fn, sql) in reg.items():
            if sql:
                out.append((name, fn, sql))
    return out

_CASES = _static_gated()


@pytest.mark.parametrize("name,fn,sql", _CASES, ids=[c[0] for c in _CASES])
def test_hostile_parity(name, fn, sql, hostile_dir):
    con = duckdb.connect()
    for tname in _TABLES:
        con.sql(
            f"CREATE VIEW {tname} AS SELECT * FROM "
            f"read_parquet('{hostile_dir}/{tname}.parquet')"
        )
    want = con.sql(sql).df()
    got = fn(hostile_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    cols = sorted(want.columns)
    if len(want) == 0 and len(got) == 0:
        return  # both empty: Ray's zero-block results legitimately lose dtypes
    assert sorted(got.columns) == cols, f"{name}: columns {sorted(got.columns)} != {cols}"
    g = got.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True).convert_dtypes()
    w = want.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True).convert_dtypes()
    assert len(g) == len(w), f"{name}: rows {len(g)} != {len(w)}"
    assert g.astype(str).values.tolist() == w.astype(str).values.tolist(), f"{name}: values differ"


def _rows_only():
    from ocr_ray.ops import REGISTRY as OPS
    from ocr_ray.pipelines.relational import REGISTRY as REL

    out = []
    for reg in (REL, OPS):
        for name, (fn, sql) in reg.items():
            if not sql:
                out.append((name, fn))
    return out

_ROWS_ONLY = _rows_only()


@pytest.mark.parametrize("name,fn", _ROWS_ONLY, ids=[c[0] for c in _ROWS_ONLY])
def test_hostile_totality(name, fn, hostile_dir):
    """Rows-only queries (no SQL oracle) must still be TOTAL on hostile
    input: run to completion, no crash. (Several read side fixtures keyed
    by sf_dir — those regenerate against the hostile dir and just need to
    not explode.)"""
    got = fn(hostile_dir)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    assert got is not None
