"""Mirror of the driver's correctness gate: every queries() entry with an
oracle_sql() runs on sf0.001 and must match DuckDB on row count, schema
(sorted column names) and sorted values."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


_SQLS = entry.oracle_sql()
_QUERIES = entry.queries()


@pytest.fixture(scope="module", autouse=True)
def _rebind_extract_oracles():
    """entry.oracle_sql() binds the extract-family fixture paths to the
    driver's sf (0.01); rebind them to this test's SF."""
    from ocr_ray.ops.multimodal import media_inventory_sql
    from ocr_ray.ops.simjoin import dedup_cosine_exact_sql
    from ocr_ray.pipelines.extract_oracle import oracle_sqls

    _SQLS.update(oracle_sqls(SF))
    _SQLS["media_inventory"] = media_inventory_sql(SF)
    from ocr_ray.ops.multimodal import media_dedup_exact_sql

    _SQLS["media_dedup_exact"] = media_dedup_exact_sql(SF)
    from ocr_ray.ops.multimodal import media_image_stats_sql

    _SQLS["media_image_stats"] = media_image_stats_sql(SF)
    from ocr_ray.ops.multimodal import media_jpeg_stats_sql

    _SQLS["media_jpeg_stats"] = media_jpeg_stats_sql(SF)
    from ocr_ray.ops.multimodal import media_png_stats_sql

    _SQLS["media_png_stats"] = media_png_stats_sql(SF)
    from ocr_ray.ops.multimodal import media_audio_stats_sql, media_video_frames_sql

    _SQLS["media_audio_stats"] = media_audio_stats_sql(SF)
    _SQLS["media_video_frames"] = media_video_frames_sql(SF)
    _SQLS["dedup_cosine_exact"] = dedup_cosine_exact_sql(SF)
    from ocr_ray.ops.ann import embedding_cluster_assign_sql

    _SQLS["embedding_cluster_assign"] = embedding_cluster_assign_sql(SF)
    from ocr_ray.ops.scrub import scrub_docs_sql

    _SQLS["scrub_docs"] = scrub_docs_sql(SF)
    from ocr_ray.ops.corpus import strip_common_lines_sql

    _SQLS["strip_common_lines"] = strip_common_lines_sql(SF)
    from ocr_ray.ops.markdown import extract_markdown_sql

    _SQLS["extract_markdown"] = extract_markdown_sql(SF)
    from ocr_ray.sources.evolving import orders_evolved_rollup_sql

    _SQLS["orders_evolved_rollup"] = orders_evolved_rollup_sql(SF)
    from ocr_ray.sources.evolving import orders_bitemporal_asof_sql

    _SQLS["orders_bitemporal_asof"] = orders_bitemporal_asof_sql(SF)
    from ocr_ray.sources.readers import csv_events_rollup_sql, jsonl_events_rollup_sql

    _SQLS["jsonl_events_rollup"] = jsonl_events_rollup_sql(SF)
    _SQLS["csv_events_rollup"] = csv_events_rollup_sql(SF)
    from ocr_ray.sources.readers import docs_schema_union_sql

    _SQLS["docs_schema_union"] = docs_schema_union_sql(SF)
    from ocr_ray.sources.readers import docs_lineage_census_sql

    _SQLS["docs_lineage_census"] = docs_lineage_census_sql(SF)
    from ocr_ray.ops.graph import (
        bfs_hops_graph_sql,
        connected_components_graph_sql,
        pagerank_graph_sql,
        triangle_count_graph_sql,
    )

    _SQLS["pagerank_graph"] = pagerank_graph_sql(SF)
    from ocr_ray.ops.graph import graph_kcore_graph_sql

    _SQLS["graph_kcore_graph"] = graph_kcore_graph_sql(SF)
    _SQLS["connected_components_graph"] = connected_components_graph_sql(SF)
    _SQLS["triangle_count_graph"] = triangle_count_graph_sql(SF)
    _SQLS["bfs_hops_graph"] = bfs_hops_graph_sql(SF)
    from ocr_ray.ops.graph import sssp_weighted_graph_sql

    _SQLS["sssp_weighted_graph"] = sssp_weighted_graph_sql(SF)
    from ocr_ray.ops.graph import graph_reciprocity_graph_sql

    _SQLS["graph_reciprocity_graph"] = graph_reciprocity_graph_sql(SF)
    from ocr_ray.ops.fuzzy import fuzzy_name_clusters_sql, fuzzy_name_pairs_sql

    _SQLS["fuzzy_name_pairs"] = fuzzy_name_pairs_sql(SF)
    _SQLS["fuzzy_name_clusters"] = fuzzy_name_clusters_sql(SF)
    from ocr_ray.pipelines.binpdf_gate import binpdf_oracle_sqls

    _SQLS.update(binpdf_oracle_sqls(SF))
    from ocr_ray.pipelines.extract_oracle import ctx_oracle_sqls

    _SQLS.update(ctx_oracle_sqls(SF))


@pytest.mark.parametrize("name", sorted(_SQLS))
def test_query_matches_oracle(name, con):
    res = _QUERIES[name](SF)
    got = res.to_pandas() if hasattr(res, "to_pandas") else res
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.sql(_SQLS[name]).df()

    g = got.reindex(sorted(got.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)
    assert list(g.columns) == list(w.columns), (list(g.columns), list(w.columns))
    assert len(g) == len(w)
    g = g.sort_values(list(g.columns)).reset_index(drop=True)
    w = w.sort_values(list(w.columns)).reset_index(drop=True)
    for c in g.columns:
        assert str(g[c].dtype) == str(w[c].dtype), (c, g[c].dtype, w[c].dtype)
        # astype(str) is NaN-aware: == would false-fail NULL-bearing float
        # columns (e.g. rolled-up ROLLUP keys), since NaN != NaN
        assert (g[c].astype(str).values == w[c].astype(str).values).all(), c


def test_rows_only_queries_run():
    for name, fn in _QUERIES.items():
        if name in _SQLS or name.startswith("extract"):
            continue
        res = fn(SF)
        if hasattr(res, "num_rows"):  # pyarrow.Table
            n = res.num_rows
        elif isinstance(res, pd.DataFrame):
            n = len(res)
        else:  # ray.data.Dataset
            n = res.count()
        assert n >= 0
