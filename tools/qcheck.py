"""Compare Ray queries vs DuckDB oracle, mimicking the driver's check."""
import os, sys, ray, duckdb
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
only = sys.argv[2:] if len(sys.argv) > 2 else None
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
import __ray_entry__ as entry
qs, sqls = entry.queries(), entry.oracle_sql()
fails = 0
for name, fn in qs.items():
    if only and name not in only: continue
    try:
        res = fn(sf_dir)
        got = res.to_pandas() if hasattr(res, "to_pandas") else res
        if not hasattr(got, "columns"):
            got = got.to_pandas()
    except Exception as e:
        print(f"{name}: RAY ERROR {type(e).__name__}: {e}"); fails += 1; continue
    if name not in sqls:
        print(f"{name}: rows-only, rows={len(got)}"); continue
    want = con.sql(sqls[name]).df()
    g = got.reindex(sorted(got.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)
    ok_schema = list(g.columns) == list(w.columns) and all(str(g[c].dtype)==str(w[c].dtype) for c in g.columns)
    g = g.sort_values(list(g.columns)).reset_index(drop=True)
    w = w.sort_values(list(w.columns)).reset_index(drop=True)
    # astype(str) comparison is NaN-aware (NaN == NaN under ==, never True,
    # would false-fail NULL-bearing float columns like rolled-up ROLLUP keys)
    ok = ok_schema and len(g)==len(w) and g.astype(str).values.tolist() == w.astype(str).values.tolist()
    print(f"{name}: {'OK' if ok else 'MISMATCH'} rows={len(g)}/{len(w)} schema_ok={ok_schema}")
    if not ok:
        fails += 1
        print("  got:", dict(g.dtypes.astype(str))); print("  want:", dict(w.dtypes.astype(str)))
        print(g.head(3)); print(w.head(3))
ray.shutdown()
sys.exit(1 if fails else 0)
