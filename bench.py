"""Benchmark harness. Prints ONE JSON line:

  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>, "num_cpus": N, ...}

Headline = the flagship per-turn extraction pipeline (read transcripts ->
actor-pool extraction -> partitioned resumable sink), timed end to end on a
fresh output dir. ``--scaling`` runs the headline twice in FRESH processes
at num_cpus=8 and num_cpus=32 on the same input (the sandbox evidence for
the north rule's two-cluster-size criterion) and reports both throughputs
plus scaling efficiency.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

QUERY_NAMES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q6_revenue_delta",
    "orders_by_nation",
    "top_spenders",
    "events_hourly",
    "events_sessions",
    "purchase_attribution",
    "doc_token_counts",
    "dedup_exact_docs",
    "dedup_minhash_docs",
    "ann_topk",
    "clean_corpus",
    "scrub_docs",
    "chunk_docs",
    "strip_common_lines",
    "latest_event_per_user",
    "events_value_banded",
    "user_rolling_spend",
    "conv_texts",
    "extract_links",
    "pagerank_graph",
    "user_days_gapfilled",
    "events_ntile",
    "session_funnel",
    "orders_snapshot_diff",
    "dq_orphans",
    "inverted_index",
    "bm25_topk",
    "events_global_rank",
    "user_days_locf",
    "nation_orders_incremental",
    "explode_doc_words",
    "weighted_sample_orders",
    "embedding_cluster_assign",
    "events_zorder",
    "user_retention_cohorts",
    "q5_supplier_volume",
    "user_top_event_type",
    "overlapping_order_windows",
    "user_trailing_hour_spend",
    "events_value_dense_rank",
    "user_twap",
    "doc_bpe_token_counts",
    "purchases_concurrent_events",
    "training_data_full",
    "part_pair_counts",
    "fuzzy_name_pairs",
    "event_type_transitions",
    "cust_order_intervals",
    "active_users_trailing_7d",
    "user_longest_streak",
    "pareto_orders",
    "orderkey_islands",
    "order_share_of_cust",
    "triangle_count_graph",
    "bfs_hops_graph",
    "q18_large_orders",
    "q10_returned_revenue",
    "q14_promo_share",
    "q19_bracket_revenue",
    "dup_ngram_spans",
    "anonymize_customers",
    "purchase_next_click",
    "q4_order_priority",
    "q7_nation_volume",
    "q21_late_sole_supplier",
    "user_event_gap_census",
    "event_type_user_overlap",
    "user_golden_record",
    "key_skew_report",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_profit_by_nation",
    "q11_important_parts",
    "q12_ship_priority",
    "q16_supplier_counts",
    "q20_excess_suppliers",
    "events_exact_k_sample",
    "dedup_incremental_docs",
    "order_percentile_cont",
    "user_value_trend",
    "user_value_autocorr",
    "user_burst_profile",
    "orders_events_join_size",
    "events_ab_lift",
    "orders_naive_forecast_error",
    "events_props_k_stats",
    "orders_partition_checksums",
    "event_value_percentile_cont",
    "cust_merged_windows",
    "orders_price_reconciliation",
    "events_time_rollup",
    "fuzzy_name_clusters",
    "lm_score_docs",
    "purchase_linear_attribution",
    "collocations_pmi",
    "event_value_outliers_mad",
    "embedding_gram",
    "user_type_gini",
    "user_value_drawdown",
    "doc_line_repetition",
    "conv_response_latency",
    "embedding_pca_project",
    "conv_tool_transitions",
    "dq_role_alternation",
    "system_prompt_census",
    "conv_dedup_exact",
    "sft_examples",
    "tool_latency_stats",
    "hybrid_rrf_topk",
    "orders_benford_audit",
    "events_value_winsorized",
    "media_dedup_exact",
    "sft_dataset_full",
    "user_rfm",
    "doc_prefix_dedup",
    "daily_new_vs_returning",
    "embedding_knn_self",
    "lang_confusion_matrix",
    "props_schema_infer",
    "doc_oov_rates",
    "events_late_arrivals",
    "bpe_pair_census",
    "embedding_kmeans_train",
    "user_value_ewma",
    "purchase_nearest_click",
    "clicks_unconverted",
    "events_exact_k_per_user",
    "distinct_user_overlap",
    "events_key_skew",
    "click_view_users_bag",
    "events_selfjoin_size",
    "user_activity_bitmask",
    "analyze_orders",
    "embedding_jl_project",
    "events_type_dow_chi2",
    "orders_column_drift",
    "session_funnel_timed",
    "cust_spend_lorenz",
    "geo_revenue_rollup",
    "orders_monthly_mom",
    "user_value_interpolated",
    "order_revenue_bootstrap",
    "events_window_dedup",
    "daily_churn_census",
    "orders_fd_audit",
    "embedding_argmax_dim",
    "lineitem_weighted_quantiles",
    "value_drift_ks",
    "conv_assistant_echo",
    "conv_token_novelty",
    "conv_token_novelty_exact",
    "extract_html_turns",
    "extract_html_blocks",
    "extract_pdf_turns",
    "extract_pdf_blocks",
    "extract_spans",
    "extract_records",
    "turn_markup_stats",
    "conv_lang_profile",
    "activity_spend_corr",
    "doc_casefold_collisions",
    "order_price_mad",
    "cumulative_distinct_users",
    "session_paths_topk",
    "events_systematic_sample",
    "click_minus_view_users_bag",
    "doc_compression_ratio",
    "custs_ldiversity_audit",
    "doc_ttr",
    "cust_target_encoding",
    "cust_balance_imputed",
    "part_pair_lift",
    "user_hour_ohlc",
    "user_value_cusum",
    "ship_delay_business_days",
    "events_value_histogram",
    "docs_lineage_census",
    "order_price_runs",
    "user_value_moving_median",
    "user_value_scaled",
    "sssp_weighted_graph",
    "type_dow_matrix",
    "orders_cust_join_incremental",
    "purchases_in_sessions",
    "orders_bitemporal_asof",
    "nation_supplier_hhi",
    "orders_rule_violations",
    "user_conversion_survival",
    "user_event_pattern",
    "orders_cust_join_salted",
    "purchase_click_pressure",
    "embedding_quantize_int8",
    "doc_kfold_stratified",
    "graph_reciprocity_graph",
    "graph_kcore_graph",
    "docs_proportional_sample",
    "stump_train_events",
    "cust_abc_classes",
    "media_image_stats",
    "media_jpeg_stats",
    "extract_binpdf_turns",
    "extract_binpdf_blocks",
    "extract_context_turns_echo",
    "events_sample",
]


def _cpu_probe_mops(seconds: float = 1.0) -> float:
    """Single-core integer-spin rate (Mops/s). The sandbox's CPU is
    burst-credit throttled under sustained load (measured 12.4 Mops/s fresh
    vs 6-8 drained), so every recorded wall time carries this calibration —
    it makes bench rows comparable across rounds run at different credit
    levels."""
    t0 = time.monotonic()
    x = n = 0
    while time.monotonic() - t0 < seconds:
        for _ in range(100_000):
            x = (x * 1664525 + 1013904223) & 0xFFFFFFFF
        n += 100_000
    return round(n / (time.monotonic() - t0) / 1e6, 2)


def _folded_events(src_dir: str, mod: float) -> str:
    """Cached copy of an events fixture with |value| folded mod ``mod``
    (nulls preserved) — volume rows for ops whose exact-int64 contract
    bounds the value domain (user_value_autocorr) measure the PLAN on
    in-domain data instead of tripping the op's loud overflow refusal."""
    out = os.path.join(src_dir, f"folded_{int(mod)}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    def fold(t: pa.Table) -> pa.Table:
        col = t.column("value")
        nulls = pc.is_null(col)
        folded = pa.array(
            np.mod(np.abs(col.to_numpy(zero_copy_only=False)), mod), pa.float64()
        )
        folded = pc.if_else(nulls, pa.scalar(None, pa.float64()), folded)
        return t.set_column(t.schema.get_field_index("value"), "value", folded)

    dest = os.path.join(out, "events.parquet")
    os.makedirs(dest, exist_ok=True)
    rd.read_parquet(os.path.join(src_dir, "events.parquet")).map_batches(
        fold, batch_format="pyarrow"
    ).write_parquet(dest)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def _consume(res) -> int:
    if hasattr(res, "iter_batches"):  # Dataset: stream it through
        return sum(b.num_rows for b in res.iter_batches(batch_format="pyarrow", batch_size=65536))
    return res.num_rows if hasattr(res, "num_rows") else len(res)


def _sf_of(path: str) -> float:
    base = os.path.basename(os.path.normpath(path))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_bench() -> dict:
    probe_before = _cpu_probe_mops()
    import ray

    ray.init(
        address="local",
        num_cpus=NCPU,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from ocr_ray.pipelines.extract_pipeline import extract_and_commit, extract_from_path
    from ocr_ray.sources.transcripts import ensure_transcripts, n_convs_for_sf

    n_convs = n_convs_for_sf(SF_DIR)
    inp = ensure_transcripts(
        n_convs, seed=42, root="/dev/shm/ocr_ray_fixtures"
    )  # cached in tmpfs; untimed (removes virtual-disk read variance)

    # Untimed warm-up: (a) page cache for the input, (b) Ray worker processes
    # + module imports via a mini extraction run — so the timed section
    # measures steady-state compute+shuffle, not cluster boot (the north
    # rule's efficiency criterion concerns the job, not process startup).
    import ray.data as rd

    _ = sum(b.num_rows for b in rd.read_parquet(inp).iter_batches(batch_format="pyarrow", batch_size=None))
    import glob as _glob

    warm_file = sorted(_glob.glob(os.path.join(inp, "*.parquet")))[0]
    _ = extract_from_path(warm_file).materialize()

    # warm the WHOLE worker pool (the single-file warm-up above spawns only
    # a few workers; without this the first timed run pays worker spawn +
    # per-process imports for the remaining ~NCPU workers inside the timed
    # section — process boot, which the north rule's criterion excludes)
    def _warm(b):
        import ocr_ray.core.extract  # noqa: F401  (per-process import cost)
        return b

    _ = (
        rd.range(NCPU * 4, override_num_blocks=NCPU * 4)
        .map_batches(_warm, batch_format="pyarrow", num_cpus=1)
        .materialize()
    )

    out_dir = f"/dev/shm/ocr_ray_bench/out_c{NCPU}"  # tmpfs: the bench measures compute+shuffle, not the sandbox's burst-throttled virtual disk (a real deployment writes to S3/NVMe that scales with nodes)
    shutil.rmtree(out_dir, ignore_errors=True)
    # partition count follows DATA SIZE, not cluster size: output files stay
    # ~20k-turn/~100MB-uncompressed sized at every sf, and the scaling pair
    # runs the IDENTICAL job at both parallelism levels (with cpu-derived
    # partitioning the two legs would do different work)
    import pyarrow.parquet as pq_mod

    n_rows_in = sum(
        pq_mod.ParquetFile(f).metadata.num_rows
        for f in sorted(_glob.glob(os.path.join(inp, "*.parquet")))
    )
    num_partitions = max(8, min(256, n_rows_in // 20_000))
    t0 = time.monotonic()
    manifest = extract_and_commit(
        inp,
        out_dir,
        num_partitions=num_partitions,
        resume=False,
        finalize_num_cpus=1,  # tmpfs output: writers scale, no disk cap needed
    )
    headline = time.monotonic() - t0
    rows = sum(manifest.column("rows_out").to_pylist())
    bytes_in = sum(manifest.column("bytes_in").to_pylist())

    qtimes = {}
    recalls: dict = {}
    if not os.environ.get("BENCH_SKIP_QUERIES"):
        import __ray_entry__ as entry

        qfns = entry.queries()
        for name in QUERY_NAMES:
            t0 = time.monotonic()
            _consume(qfns[name](SF_DIR))
            qtimes[name] = round(time.monotonic() - t0, 3)

    if not os.environ.get("BENCH_SKIP_VOLUME"):
        # volume rows (VERDICT r1 #9): the shared documents table is 500
        # rows even at sf0.1, so the dedup/ANN scale claims get measured on
        # synthetic 100k/200k fixtures (cached in tmpfs, untimed generation)
        from ocr_ray.ops.ann import ann_topk_over
        from ocr_ray.ops.dedup import near_dup_survivors
        from ocr_ray.sources.bigdocs import ensure_bigdocs, ensure_bigvecs
        from ocr_ray.sources.readers import scaled_read_parquet

        # media codec volume (r4): REAL decode throughput — 2k PPM/BMP
        # images through the ImageStats actor pool (decode + exact sums)
        from ocr_ray.ops.multimodal import ImageStats, ensure_image_fixture

        img2k = ensure_image_fixture(2_000)
        t0 = time.monotonic()
        import ray.data as _rd

        _ = _rd.read_parquet(img2k + "/images.parquet").map_batches(
            ImageStats, batch_format="pyarrow", batch_size=64,
            concurrency=(1, 16), num_cpus=1,
        ).count()
        qtimes["media_decode_2k"] = round(time.monotonic() - t0, 3)

        docs100k = ensure_bigdocs(100_000, seed=7)
        t0 = time.monotonic()
        n_surv = near_dup_survivors(
            scaled_read_parquet(docs100k, columns=["doc_id", "text"])
        ).count()
        qtimes["dedup_minhash_100k"] = round(time.monotonic() - t0, 3)
        # the 64-perm lever (VERDICT r2 #7): same pipeline, half-width
        # signatures (8 bands @ ~0.77 LSH threshold) — the documented
        # recall/throughput tradeoff, measured at the same volume
        t0 = time.monotonic()
        n_surv64 = near_dup_survivors(
            scaled_read_parquet(docs100k, columns=["doc_id", "text"]), n_perms=64
        ).count()
        qtimes["dedup_minhash_100k_p64"] = round(time.monotonic() - t0, 3)
        recalls["minhash_p64_survivor_delta"] = int(n_surv64 - n_surv)
        # weighted-Jaccard (ICWS) sketch at the same volume — the heavier
        # per-token signature (5 uniforms x 128 perms) measured honestly
        from ocr_ray.ops.wjaccard import weighted_near_dup_survivors

        t0 = time.monotonic()
        _ = weighted_near_dup_survivors(
            scaled_read_parquet(docs100k, columns=["doc_id", "text"])
        ).count()
        qtimes["dedup_wjaccard_100k"] = round(time.monotonic() - t0, 3)
        from ocr_ray.ops.dedup import dedup_incremental_over

        t0 = time.monotonic()
        _ = dedup_incremental_over(
            scaled_read_parquet(docs100k, columns=["doc_id", "text"])
        ).count()
        qtimes["dedup_incremental_100k"] = round(time.monotonic() - t0, 3)
        vecs200k = ensure_bigvecs(200_000, dim=64, seed=11)
        vec_ds = scaled_read_parquet(vecs200k)
        t0 = time.monotonic()
        brute_rows = ann_topk_over(vec_ds, n_queries=64, k=10).take_all()
        qtimes["ann_brute_200k"] = round(time.monotonic() - t0, 3)

        # approx siblings at volume + recall@10 vs the brute result (the
        # quantified evidence for the approximate family each round)
        from ocr_ray.ops.ann import ann_ivf_over, ann_lsh_over, recall_at_k

        t0 = time.monotonic()
        lsh_rows = ann_lsh_over(vec_ds, n_queries=64, k=10).take_all()
        qtimes["ann_lsh_200k"] = round(time.monotonic() - t0, 3)
        recalls["ann_lsh_recall_200k"] = round(recall_at_k(lsh_rows, brute_rows), 4)
        t0 = time.monotonic()
        ivf_rows = ann_ivf_over(vec_ds, n_queries=64, k=10).take_all()
        qtimes["ann_ivf_200k"] = round(time.monotonic() - t0, 3)
        recalls["ann_ivf_recall_200k"] = round(recall_at_k(ivf_rows, brute_rows), 4)

        # exact-recall similarity join at volume (prefix-filter plan)
        from ocr_ray.ops.simjoin import jaccard_dup_pairs

        docs20k = ensure_bigdocs(20_000, seed=7)
        t0 = time.monotonic()
        n_jpairs = jaccard_dup_pairs(
            scaled_read_parquet(docs20k, columns=["doc_id", "text"]).materialize()
        ).count()
        qtimes["jaccard_exact_20k"] = round(time.monotonic() - t0, 3)

        # graph ops at volume (1M nodes / ~7M distinct edges): PageRank via
        # the size-gated local tier (collect+dedup dominates; the distributed
        # tier at this size measured 233 s — pure Ray shuffle-op fixed cost,
        # see BASELINE.md), components via the local union-find gate
        from ocr_ray.ops.dedup import propagate_min_labels
        from ocr_ray.ops.graph import ensure_cc_graph, ensure_graph, pagerank

        g1m = ensure_graph(1_000_000, avg_deg=6, seed=5)
        t0 = time.monotonic()
        _ = pagerank(scaled_read_parquet(g1m), iters=3).count()
        qtimes["pagerank_1m_nodes"] = round(time.monotonic() - t0, 3)
        cc1m = ensure_cc_graph(1_000_000)
        t0 = time.monotonic()
        _ = propagate_min_labels(
            scaled_read_parquet(cc1m).rename_columns({"src": "a", "dst": "b"})
        ).count()
        qtimes["connected_components_1m"] = round(time.monotonic() - t0, 3)

        # corpus-prep ops at volume (vocab partial-agg + two-level scan)
        from ocr_ray.ops.corpus import pack_sequences_over, vocab_topk_over

        big = scaled_read_parquet(docs100k, columns=["doc_id", "text"])
        t0 = time.monotonic()
        _consume(vocab_topk_over(big))
        qtimes["vocab_topk_100k"] = round(time.monotonic() - t0, 3)
        from ocr_ray.ops.corpus import vocab_topk_mg_over

        t0 = time.monotonic()
        vocab_topk_mg_over(big)
        qtimes["vocab_topk_mg_100k"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        _consume(pack_sequences_over(big))
        qtimes["pack_sequences_100k"] = round(time.monotonic() - t0, 3)

        # cross-doc duplicated-span census at volume (the planted near-dup
        # clusters in bigdocs make the candidate set genuinely non-trivial)
        from ocr_ray.ops.corpus import dup_ngram_spans_over

        t0 = time.monotonic()
        _consume(
            dup_ngram_spans_over(scaled_read_parquet(docs100k, columns=["doc_id", "text"]))
        )
        qtimes["dup_ngram_100k"] = round(time.monotonic() - t0, 3)

        # timeseries family at volume (1M events, 5k users + one hot user):
        # one coarse-key shuffle each; the gapfill output is the DENSE series
        from ocr_ray.ops.timeseries import user_days_gapfilled, user_retention_cohorts
        from ocr_ray.sources.bigdocs import ensure_bigevents

        ev1m = ensure_bigevents(1_000_000, seed=7)
        t0 = time.monotonic()
        _consume(user_days_gapfilled(ev1m))
        qtimes["gapfill_1m_events"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        _consume(user_retention_cohorts(ev1m))
        qtimes["retention_1m_events"] = round(time.monotonic() - t0, 3)
        from ocr_ray.ops.timeseries import user_trailing_hour_spend, user_twap

        t0 = time.monotonic()
        _consume(user_trailing_hour_spend(ev1m))
        qtimes["trailing_hour_1m_events"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        _consume(user_twap(ev1m))
        qtimes["twap_1m_events"] = round(time.monotonic() - t0, 3)
        from ocr_ray.ops.timeseries import purchases_concurrent_events

        t0 = time.monotonic()
        _consume(purchases_concurrent_events(ev1m))
        qtimes["concurrent_1m_events"] = round(time.monotonic() - t0, 3)

        # session-10 diagnostics family at volume (keys-only claims measured
        # under the fixture's hot-user skew)
        from ocr_ray.ops.dq import events_key_skew
        from ocr_ray.ops.stats import events_selfjoin_size
        from ocr_ray.ops.timeseries import (
            daily_churn_census,
            events_window_dedup,
            user_value_ewma,
        )

        from ocr_ray.ops.mlprep import user_value_scaled
        from ocr_ray.ops.stats import user_value_autocorr
        from ocr_ray.ops.timeseries import user_burst_profile
        from ocr_ray.ops.timeseries import (
            purchase_click_pressure,
            purchases_in_sessions,
            user_conversion_survival,
            user_event_pattern,
            user_hour_ohlc,
            user_value_cusum,
            user_value_moving_median,
        )

        for label, fn in (
            ("key_skew_1m_events", events_key_skew),
            ("selfjoin_size_1m_events", events_selfjoin_size),
            ("ewma_1m_events", user_value_ewma),
            ("churn_census_1m_events", daily_churn_census),
            ("window_dedup_1m_events", events_window_dedup),
            # session-11 window/scan family at volume
            ("cusum_1m_events", user_value_cusum),
            ("moving_median_1m_events", user_value_moving_median),
            ("ohlc_1m_events", user_hour_ohlc),
            ("minmax_scaled_1m_events", user_value_scaled),
            ("purch_in_sessions_1m_events", purchases_in_sessions),
            ("survival_1m_events", user_conversion_survival),
            ("event_pattern_1m_events", user_event_pattern),
            ("click_pressure_1m_events", purchase_click_pressure),
            # autocorr: values folded into the op's documented int64 domain
            # (n_pairs x |cents| <= ~6e9 per user; the fixture's hot user
            # carries ~2e5 pairs, so raw values would overflow the final
            # int64 — which the op now REFUSES loudly instead of silently
            # wrapping; the row measures the plan on in-domain data)
            ("autocorr_1m_events", lambda d: user_value_autocorr(_folded_events(d, 250.0))),
            ("burst_profile_1m_events", user_burst_profile),
        ):
            t0 = time.monotonic()
            _consume(fn(ev1m))
            qtimes[label] = round(time.monotonic() - t0, 3)

        # graph analytics at volume (same 1M-node fixture): degree-ordered
        # wedge triangle count and 6-hop BFS, both via the local tier gate
        from ocr_ray.ops.graph import bfs_hops, triangle_count

        t0 = time.monotonic()
        _ = triangle_count(scaled_read_parquet(g1m)).take_all()
        qtimes["triangles_1m_nodes"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        _ = bfs_hops(scaled_read_parquet(g1m)).count()
        qtimes["bfs_1m_nodes"] = round(time.monotonic() - t0, 3)
        from ocr_ray.ops.graph import graph_kcore

        t0 = time.monotonic()
        _ = graph_kcore(scaled_read_parquet(g1m)).count()
        qtimes["kcore_1m_nodes"] = round(time.monotonic() - t0, 3)

        # rolling windowed distinct at volume (7x cover expansion of the
        # distinct (user, day) pairs through one dedup shuffle)
        from ocr_ray.ops.timeseries import active_users_trailing_7d

        t0 = time.monotonic()
        _consume(active_users_trailing_7d(ev1m))
        qtimes["active7d_1m_events"] = round(time.monotonic() - t0, 3)

    ray.shutdown()
    return {
        "metric": "extraction pipeline wall time (transcripts -> extracted, partitioned sink)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": _sf_of(SF_DIR),
        "num_cpus": NCPU,
        "rows": rows,
        "turns_per_sec": round(rows / headline, 1),
        "mb_in_per_sec": round(bytes_in / headline / 1e6, 1),
        "cpu_probe_mops_before": probe_before,
        "cpu_probe_mops_after": _cpu_probe_mops(),
        **recalls,
    }


def run_scaling() -> dict:
    """Fresh process per level (clean ray.init) on the same input.

    Two N->4N pairs are measured: (4,16) and (8,32). On this 32-core box,
    num_cpus=32 saturates every core, so Ray's own driver/raylet/object-
    store processes compete with the workers — an artifact a real 4N-node
    cluster does not have (each node keeps OS headroom). The (4,16) pair is
    therefore the cleaner cluster-size analogy; both are reported.
    """

    # Compute-dominated input for the scaling pair (VERDICT r1 #4): 200k
    # convs (~1.4M turns, ~1.3 GB) so both legs sit far above the ~10 s
    # fixed floor that drowned the signal at sf0.1. "sf1" maps to 200k
    # convs in n_convs_for_sf; the fixture is generated once and cached.
    scaling_sf = os.environ.get("GRAFT_SCALING_SF", "/root/testdata/sf1")

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            BENCH_SKIP_QUERIES="1",
            BENCH_SKIP_VOLUME="1",
            GRAFT_SF_DIR=scaling_sf,
        )
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def pair(
        lo_n: int,
        hi_n: int,
        repeats: int = int(os.environ.get("GRAFT_SCALING_REPEATS", "2")),
        cooldown_s: int = 45,
    ) -> dict:
        # Throttle-aware protocol: the box's CPU is burst-credit throttled
        # under sustained load (measured: -35% after minutes of all-core
        # work), so (a) interleave hi/lo legs, (b) cool down between runs,
        # (c) take the per-leg MINIMUM across repeats — the robust
        # estimator under multiplicative slowdowns.
        lo_runs, hi_runs = [], []
        for i in range(repeats):
            hi_runs.append(run(hi_n))
            time.sleep(cooldown_s)
            lo_runs.append(run(lo_n))
            if i + 1 < repeats:
                time.sleep(cooldown_s)
        lo_sec = min(r["value"] for r in lo_runs)
        hi_sec = min(r["value"] for r in hi_runs)
        eff = (lo_sec / hi_sec) / (hi_n / lo_n)
        return {
            "num_cpus_lo": lo_n,
            "num_cpus_hi": hi_n,
            "sec_lo": lo_sec,
            "sec_hi": hi_sec,
            "sec_lo_all": [r["value"] for r in lo_runs],
            "sec_hi_all": [r["value"] for r in hi_runs],
            "turns_per_sec_lo": round(lo_runs[0]["rows"] / lo_sec, 1),
            "turns_per_sec_hi": round(hi_runs[0]["rows"] / hi_sec, 1),
            "scaling_efficiency": round(eff, 3),
            "rows": lo_runs[0]["rows"],
            "sf": lo_runs[0]["sf"],
        }

    # (4,16) is the cluster-size analogy pair: at 32 the box is fully
    # saturated and Ray's own system processes contend (an artifact a real
    # 4N-node cluster does not have). GRAFT_SCALING_PAIR="8,32" selects the
    # saturated pair instead.
    lo, hi = (
        int(x) for x in os.environ.get("GRAFT_SCALING_PAIR", "4,16").split(",")
    )
    p = pair(lo, hi)
    return {
        "metric": (
            f"scaling efficiency N->4N (headline pipeline, fresh ray.init per "
            f"level, min-of-k interleaved legs with cooldown, compute-dominated "
            f"1.4M-turn input, pair {lo}->{hi})"
        ),
        f"pair_{lo}_{hi}": p,
        "scaling_efficiency": p["scaling_efficiency"],
        "sf": p["sf"],
        "rows": p["rows"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
