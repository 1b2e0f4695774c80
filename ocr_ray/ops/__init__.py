"""Large-scale training-data operations (first-class components):

dedup      exact, MinHash+LSH near-dup, SimHash, embedding-cosine near-dup
simjoin    exact prefix-filter Jaccard + exact cosine similarity self-joins
ann        brute-force cosine top-k + LSH-bucketed approximate variant
textstats  language-ID, quality scoring, token counts, winnowing fingerprints
corpus     decontamination, vocabulary, tf/df terms, sequence packing,
           mixture sampling, distributed exact quantiles
multimodal binary media columns: decode/feature plumbing (stubbed kernels)
olap       cube/grouping sets, pivot, per-group exact quantiles, intersect
mlprep     train/val/test split, stratified sample, Bloom-pruned semi-join,
           distributed global rank
search     inverted index, integer fixed-point BM25 top-k
timeseries gap-filled resample, LOCF forward fill, ordered funnel, NTILE
dq         FK orphan audit, snapshot diff (CDC), keyset pagination
incremental mergeable aggregate states: O(delta) refresh == full recompute
stats      mergeable moments (variance/covariance integer numerators),
           exact integer histogram, market-basket pair co-occurrence

``REGISTRY`` maps query name -> (callable(sf_dir), oracle_sql_or_None) and is
merged into ``__ray_entry__.queries()``.
"""

from ocr_ray.ops.ann import (
    EMBEDDING_KNN_SELF_SQL,
    embedding_knn_self,
    ANN_TOPK_SQL,
    ann_ivf_topk,
    ann_lsh_topk,
    ann_topk,
    embedding_cluster_assign,
    embedding_cluster_assign_sql,
)
from ocr_ray.ops.dedup import (
    DEDUP_EXACT_SQL,
    DOC_PREFIX_DEDUP_SQL,
    dedup_exact_docs,
    doc_prefix_dedup,
    dedup_jaccard_docs,
    dedup_minhash_docs,
    dedup_simhash_docs,
    embedding_near_dups,
)
from ocr_ray.ops.corpus import (
    CAP_PER_SOURCE_SQL,
    CHUNK_DOCS_SQL,
    DECONTAMINATE_SQL,
    EXPLODE_DOC_WORDS_SQL,
    explode_doc_words,
    order_quantiles_sketch,
    DOC_TOP_TERMS_SQL,
    MIXTURE_SAMPLE_SQL,
    ORDER_QUANTILES_SQL,
    PACK_SEQUENCES_SQL,
    DOC_OOV_RATES_SQL,
    VOCAB_TOPK_SQL,
    cap_per_source,
    chunk_docs,
    decontaminate_docs,
    doc_top_terms,
    mixture_sample,
    order_quantiles,
    _quality_gated_sql,
    pack_sequences,
    quality_gated_docs,
    strip_common_lines,
    strip_common_lines_sql,
    doc_oov_rates,
    vocab_topk,
    vocab_topk_cms,
    vocab_topk_mg,
)
from ocr_ray.ops.graph import (
    connected_components_graph,
    connected_components_graph_sql,
    pagerank_graph,
    pagerank_graph_sql,
    graph_kcore_graph,
    graph_kcore_graph_sql,
)
from ocr_ray.ops.markdown import extract_markdown, extract_markdown_sql
from ocr_ray.ops.mlprep import (
    BLOOM_SEMI_EVENTS_SQL,
    EVENTS_GLOBAL_RANK_SQL,
    EVENTS_VALUE_DENSE_RANK_SQL,
    SPLIT_TRAIN_TEST_SQL,
    STRATIFIED_SAMPLE_SQL,
    WEIGHTED_SAMPLE_ORDERS_SQL,
    bloom_semi_events,
    events_global_rank,
    events_value_dense_rank,
    split_train_test,
    stratified_sample_docs,
    weighted_sample_orders,
)
from ocr_ray.ops.ann import EMBEDDING_NORM_STATS_SQL, embedding_norm_stats
from ocr_ray.ops.multimodal import (
    media_dedup_exact,
    media_dedup_exact_sql,
    media_features,
    media_audio_stats,
    media_audio_stats_sql,
    media_image_stats,
    media_image_stats_sql,
    media_jpeg_stats,
    media_jpeg_stats_sql,
    media_png_stats,
    media_png_stats_sql,
    media_phash_real,
    media_video_frames,
    media_video_frames_sql,
    media_inventory,
    media_inventory_sql,
)
from ocr_ray.ops.scrub import scrub_docs, scrub_docs_sql
from ocr_ray.ops.search import (
    BM25_TOPK_SQL,
    HYBRID_RRF_SQL,
    INVERTED_INDEX_SQL,
    bm25_topk,
    hybrid_rrf_topk,
    inverted_index,
)
from ocr_ray.ops.simjoin import (
    DEDUP_JACCARD_EXACT_SQL,
    dedup_cosine_exact,
    dedup_cosine_exact_sql,
    dedup_jaccard_exact,
)
from ocr_ray.ops.wjaccard import (
    DEDUP_WJACCARD_EXACT_SQL,
    dedup_wjaccard_docs,
    dedup_wjaccard_exact,
)
from ocr_ray.ops.dq import (
    DQ_ORPHANS_SQL,
    ORDERS_BENFORD_SQL,
    EVENTS_ZORDER_SQL,
    ORDERS_KEYSET_PAGE_SQL,
    ORDERS_SNAPSHOT_DIFF_SQL,
    dq_orphans,
    orders_benford_audit,
    events_zorder,
    orders_keyset_page,
    orders_snapshot_diff,
)
from ocr_ray.ops.incremental import (
    NATION_ORDERS_INCREMENTAL_SQL,
    nation_orders_incremental,
)
from ocr_ray.ops.timeseries import (
    EVENTS_NTILE_SQL,
    SESSION_FUNNEL_SQL,
    DAILY_NEW_VS_RETURNING_SQL,
    USER_DAYS_GAPFILLED_SQL,
    USER_DAYS_LOCF_SQL,
    USER_RETENTION_COHORTS_SQL,
    USER_TRAILING_HOUR_SPEND_SQL,
    OVERLAPPING_ORDER_WINDOWS_SQL,
    USER_TWAP_SQL,
    PURCHASES_CONCURRENT_EVENTS_SQL,
    USER_CENTERED_SPEND_SQL,
    overlapping_order_windows,
    purchases_concurrent_events,
    user_centered_spend,
    user_twap,
    EVENTS_NTILE_BY_TYPE_SQL,
    events_ntile,
    events_ntile_by_type,
    user_trailing_hour_spend,
    session_funnel,
    daily_new_vs_returning,
    user_days_gapfilled,
    user_days_locf,
    user_retention_cohorts,
)
from ocr_ray.sources.evolving import orders_evolved_rollup
from ocr_ray.state.sink import ORDERS_RANGE_LAYOUT_SQL, orders_range_layout
from ocr_ray.ops.textstats import (
    DOC_BPE_TOKEN_COUNTS_SQL,
    DOC_FINGERPRINTS_SQL,
    DOC_QUALITY_SQL,
    LANG_CONFUSION_SQL,
    LANG_ID_SQL,
    REPETITION_STATS_SQL,
    doc_bpe_token_counts,
    doc_fingerprints,
    doc_quality,
    lang_confusion_matrix,
    lang_id_docs,
    repetition_stats,
)

REGISTRY: dict[str, tuple] = {
    "dedup_exact_docs": (dedup_exact_docs, DEDUP_EXACT_SQL),
    "doc_prefix_dedup": (doc_prefix_dedup, DOC_PREFIX_DEDUP_SQL),
    "dedup_minhash_docs": (dedup_minhash_docs, None),
    "dedup_simhash_docs": (dedup_simhash_docs, None),
    "dedup_jaccard_docs": (dedup_jaccard_docs, None),
    "embedding_near_dups": (embedding_near_dups, None),
    "dedup_jaccard_exact": (dedup_jaccard_exact, DEDUP_JACCARD_EXACT_SQL),
    "dedup_wjaccard_exact": (dedup_wjaccard_exact, DEDUP_WJACCARD_EXACT_SQL),
    "dedup_wjaccard_docs": (dedup_wjaccard_docs, None),
    "dedup_cosine_exact": (dedup_cosine_exact, None),  # SQL built per-sf: dedup_cosine_exact_sql
    "ann_topk": (ann_topk, ANN_TOPK_SQL),
    "embedding_knn_self": (embedding_knn_self, EMBEDDING_KNN_SELF_SQL),
    "embedding_cluster_assign": (embedding_cluster_assign, None),  # SQL built per-sf

    "ann_lsh_topk": (ann_lsh_topk, None),
    "ann_ivf_topk": (ann_ivf_topk, None),
    "lang_id_docs": (lang_id_docs, LANG_ID_SQL),
    "lang_confusion_matrix": (lang_confusion_matrix, LANG_CONFUSION_SQL),
    "doc_quality": (doc_quality, DOC_QUALITY_SQL),
    "doc_fingerprints": (doc_fingerprints, DOC_FINGERPRINTS_SQL),
    "repetition_stats": (repetition_stats, REPETITION_STATS_SQL),
    "media_features": (media_features, None),
    "media_image_stats": (media_image_stats, None),  # SQL built per-sf: media_image_stats_sql
    "media_jpeg_stats": (media_jpeg_stats, None),  # SQL built per-sf: media_jpeg_stats_sql
    "media_png_stats": (media_png_stats, None),  # SQL built per-sf: media_png_stats_sql
    "media_audio_stats": (media_audio_stats, None),  # SQL built per-sf: media_audio_stats_sql
    "media_video_frames": (media_video_frames, None),  # SQL built per-sf: media_video_frames_sql
    "media_phash_real": (media_phash_real, None),  # planted-pair recall pytest-pinned
    "media_inventory": (media_inventory, None),  # SQL built per-sf: media_inventory_sql
    "media_dedup_exact": (media_dedup_exact, None),  # SQL built per-sf: media_dedup_exact_sql
    "scrub_docs": (scrub_docs, None),  # SQL built per-sf: scrub_docs_sql
    "extract_markdown": (extract_markdown, None),  # SQL built per-sf
    "pagerank_graph": (pagerank_graph, None),  # SQL built per-sf: pagerank_graph_sql
    "graph_kcore_graph": (graph_kcore_graph, None),  # SQL built per-sf
    "connected_components_graph": (connected_components_graph, None),  # SQL built per-sf
    "decontaminate_docs": (decontaminate_docs, DECONTAMINATE_SQL),
    "chunk_docs": (chunk_docs, CHUNK_DOCS_SQL),
    "cap_per_source": (cap_per_source, CAP_PER_SOURCE_SQL),
    "vocab_topk": (vocab_topk, VOCAB_TOPK_SQL),
    "doc_oov_rates": (doc_oov_rates, DOC_OOV_RATES_SQL),
    "vocab_topk_cms": (vocab_topk_cms, None),  # approximate; exact sibling gated
    "vocab_topk_mg": (vocab_topk_mg, None),  # approximate (down-biased); exact sibling gated
    "strip_common_lines": (strip_common_lines, None),  # SQL built per-sf
    "quality_gated_docs": (quality_gated_docs, _quality_gated_sql()),
    "doc_top_terms": (doc_top_terms, DOC_TOP_TERMS_SQL),
    "pack_sequences": (pack_sequences, PACK_SEQUENCES_SQL),
    "mixture_sample": (mixture_sample, MIXTURE_SAMPLE_SQL),
    "order_quantiles": (order_quantiles, ORDER_QUANTILES_SQL),
    "order_quantiles_sketch": (order_quantiles_sketch, None),  # approx; exact sibling gated
    "explode_doc_words": (explode_doc_words, EXPLODE_DOC_WORDS_SQL),
    "weighted_sample_orders": (weighted_sample_orders, WEIGHTED_SAMPLE_ORDERS_SQL),
    "split_train_test": (split_train_test, SPLIT_TRAIN_TEST_SQL),
    "stratified_sample_docs": (stratified_sample_docs, STRATIFIED_SAMPLE_SQL),
    "bloom_semi_events": (bloom_semi_events, BLOOM_SEMI_EVENTS_SQL),
    "events_global_rank": (events_global_rank, EVENTS_GLOBAL_RANK_SQL),
    "events_value_dense_rank": (events_value_dense_rank, EVENTS_VALUE_DENSE_RANK_SQL),
    "doc_bpe_token_counts": (doc_bpe_token_counts, DOC_BPE_TOKEN_COUNTS_SQL),
    "inverted_index": (inverted_index, INVERTED_INDEX_SQL),
    "bm25_topk": (bm25_topk, BM25_TOPK_SQL),
    "hybrid_rrf_topk": (hybrid_rrf_topk, HYBRID_RRF_SQL),
    "user_days_gapfilled": (user_days_gapfilled, USER_DAYS_GAPFILLED_SQL),
    "daily_new_vs_returning": (daily_new_vs_returning, DAILY_NEW_VS_RETURNING_SQL),
    "user_days_locf": (user_days_locf, USER_DAYS_LOCF_SQL),
    "user_retention_cohorts": (user_retention_cohorts, USER_RETENTION_COHORTS_SQL),
    "nation_orders_incremental": (nation_orders_incremental, NATION_ORDERS_INCREMENTAL_SQL),
    "session_funnel": (session_funnel, SESSION_FUNNEL_SQL),
    "events_ntile": (events_ntile, EVENTS_NTILE_SQL),
    "events_ntile_by_type": (events_ntile_by_type, EVENTS_NTILE_BY_TYPE_SQL),
    "user_trailing_hour_spend": (user_trailing_hour_spend, USER_TRAILING_HOUR_SPEND_SQL),
    "overlapping_order_windows": (overlapping_order_windows, OVERLAPPING_ORDER_WINDOWS_SQL),
    "user_twap": (user_twap, USER_TWAP_SQL),
    "purchases_concurrent_events": (purchases_concurrent_events, PURCHASES_CONCURRENT_EVENTS_SQL),
    "user_centered_spend": (user_centered_spend, USER_CENTERED_SPEND_SQL),
    "dq_orphans": (dq_orphans, DQ_ORPHANS_SQL),
    "orders_benford_audit": (orders_benford_audit, ORDERS_BENFORD_SQL),
    "orders_snapshot_diff": (orders_snapshot_diff, ORDERS_SNAPSHOT_DIFF_SQL),
    "events_zorder": (events_zorder, EVENTS_ZORDER_SQL),
    "orders_keyset_page": (orders_keyset_page, ORDERS_KEYSET_PAGE_SQL),
    "orders_evolved_rollup": (orders_evolved_rollup, None),  # SQL built per-sf
    "embedding_norm_stats": (embedding_norm_stats, EMBEDDING_NORM_STATS_SQL),
    "orders_range_layout": (orders_range_layout, ORDERS_RANGE_LAYOUT_SQL),
}

from ocr_ray.ops.olap import REGISTRY as _OLAP_REGISTRY

REGISTRY.update(_OLAP_REGISTRY)

from ocr_ray.ops.fuzzy import fuzzy_name_pairs, fuzzy_name_pairs_sql

REGISTRY["fuzzy_name_pairs"] = (fuzzy_name_pairs, None)  # SQL built per-sf

from ocr_ray.ops.stats import (
    EVENT_VALUE_MOMENTS_SQL,
    EVENT_VALUE_OUTLIERS_SQL,
    EVENTS_VALUE_HISTOGRAM_SQL,
    PART_PAIR_COUNTS_SQL,
    PRICE_QTY_MOMENTS_SQL,
    EVENTS_VALUE_WINSORIZED_SQL,
    event_value_moments,
    event_value_outliers,
    events_value_histogram,
    events_value_winsorized,
    part_pair_counts,
    price_qty_moments,
)

REGISTRY.update(
    {
        "event_value_moments": (event_value_moments, EVENT_VALUE_MOMENTS_SQL),
        "events_value_histogram": (events_value_histogram, EVENTS_VALUE_HISTOGRAM_SQL),
        "price_qty_moments": (price_qty_moments, PRICE_QTY_MOMENTS_SQL),
        "part_pair_counts": (part_pair_counts, PART_PAIR_COUNTS_SQL),
        "event_value_outliers": (event_value_outliers, EVENT_VALUE_OUTLIERS_SQL),
        "events_value_winsorized": (events_value_winsorized, EVENTS_VALUE_WINSORIZED_SQL),
    }
)

from ocr_ray.ops.graph import bfs_hops_graph, triangle_count_graph

REGISTRY.update(
    {
        "triangle_count_graph": (triangle_count_graph, None),  # SQL built per-sf
        "bfs_hops_graph": (bfs_hops_graph, None),  # SQL built per-sf
    }
)

from ocr_ray.ops.timeseries import (
    CUST_ORDER_INTERVALS_SQL,
    EVENT_TYPE_TRANSITIONS_SQL,
    cust_order_intervals,
    event_type_transitions,
)

REGISTRY.update(
    {
        "event_type_transitions": (event_type_transitions, EVENT_TYPE_TRANSITIONS_SQL),
        "cust_order_intervals": (cust_order_intervals, CUST_ORDER_INTERVALS_SQL),
    }
)

from ocr_ray.ops.timeseries import (
    ACTIVE_USERS_TRAILING_7D_SQL,
    active_users_trailing_7d,
)

REGISTRY["active_users_trailing_7d"] = (
    active_users_trailing_7d,
    ACTIVE_USERS_TRAILING_7D_SQL,
)

from ocr_ray.ops.dq import ORDERKEY_ISLANDS_SQL, orderkey_islands

REGISTRY["orderkey_islands"] = (orderkey_islands, ORDERKEY_ISLANDS_SQL)

from ocr_ray.ops.timeseries import USER_LONGEST_STREAK_SQL, user_longest_streak

REGISTRY["user_longest_streak"] = (user_longest_streak, USER_LONGEST_STREAK_SQL)

from ocr_ray.ops.ann import EMBEDDING_QUANTIZE_SQL, embedding_quantize

REGISTRY["embedding_quantize"] = (embedding_quantize, EMBEDDING_QUANTIZE_SQL)

from ocr_ray.ops.ann import LABEL_CENTROIDS_SQL, label_centroids

REGISTRY["label_centroids"] = (label_centroids, LABEL_CENTROIDS_SQL)

from ocr_ray.ops.dq import PROFILE_ORDERS_SQL, profile_orders

REGISTRY["profile_orders"] = (profile_orders, PROFILE_ORDERS_SQL)

from ocr_ray.ops.timeseries import (
    EVENTS_DEBOUNCE_SQL,
    USER_ROLLING_MEDIAN_SPEND_SQL,
    events_debounce,
    user_rolling_median_spend,
)

REGISTRY["user_rolling_median_spend"] = (
    user_rolling_median_spend,
    USER_ROLLING_MEDIAN_SPEND_SQL,
)
REGISTRY["events_debounce"] = (events_debounce, EVENTS_DEBOUNCE_SQL)

from ocr_ray.ops.timeseries import SESSION_PATHS_SQL, session_paths

REGISTRY["session_paths"] = (session_paths, SESSION_PATHS_SQL)

from ocr_ray.ops.corpus import DUP_NGRAM_SPANS_SQL, dup_ngram_spans

REGISTRY["dup_ngram_spans"] = (dup_ngram_spans, DUP_NGRAM_SPANS_SQL)

from ocr_ray.ops.scrub import ANONYMIZE_CUSTOMERS_SQL, anonymize_customers

REGISTRY["anonymize_customers"] = (anonymize_customers, ANONYMIZE_CUSTOMERS_SQL)

from ocr_ray.ops.mlprep import EVENTS_EXACT_K_SAMPLE_SQL, events_exact_k_sample
from ocr_ray.ops.dedup import DEDUP_INCREMENTAL_SQL, dedup_incremental_docs
from ocr_ray.ops.corpus import ORDER_PERCENTILE_CONT_SQL, order_percentile_cont

REGISTRY.update(
    {
        "events_exact_k_sample": (events_exact_k_sample, EVENTS_EXACT_K_SAMPLE_SQL),
        "dedup_incremental_docs": (dedup_incremental_docs, DEDUP_INCREMENTAL_SQL),
        "order_percentile_cont": (order_percentile_cont, ORDER_PERCENTILE_CONT_SQL),
    }
)

from ocr_ray.ops.stats import (
    EVENTS_PROPS_K_STATS_SQL,
    USER_VALUE_TREND_SQL,
    events_props_k_stats,
    user_value_trend,
)

REGISTRY.update(
    {
        "user_value_trend": (user_value_trend, USER_VALUE_TREND_SQL),
        "events_props_k_stats": (events_props_k_stats, EVENTS_PROPS_K_STATS_SQL),
    }
)

from ocr_ray.ops.dq import ORDERS_PARTITION_CHECKSUMS_SQL, orders_partition_checksums

REGISTRY["orders_partition_checksums"] = (
    orders_partition_checksums,
    ORDERS_PARTITION_CHECKSUMS_SQL,
)

from ocr_ray.ops.timeseries import CUST_MERGED_WINDOWS_SQL, cust_merged_windows

REGISTRY["cust_merged_windows"] = (cust_merged_windows, CUST_MERGED_WINDOWS_SQL)

from ocr_ray.ops.dq import (
    ORDERS_PRICE_RECONCILIATION_SQL,
    orders_price_reconciliation,
)

REGISTRY["orders_price_reconciliation"] = (
    orders_price_reconciliation,
    ORDERS_PRICE_RECONCILIATION_SQL,
)

from ocr_ray.ops.fuzzy import fuzzy_name_clusters

REGISTRY["fuzzy_name_clusters"] = (fuzzy_name_clusters, None)  # SQL built per-sf

from ocr_ray.ops.corpus import LM_SCORE_DOCS_SQL, lm_score_docs

REGISTRY["lm_score_docs"] = (lm_score_docs, LM_SCORE_DOCS_SQL)

from ocr_ray.ops.timeseries import (
    PURCHASE_LINEAR_ATTRIBUTION_SQL,
    purchase_linear_attribution,
)

REGISTRY["purchase_linear_attribution"] = (
    purchase_linear_attribution,
    PURCHASE_LINEAR_ATTRIBUTION_SQL,
)

from ocr_ray.ops.corpus import COLLOCATIONS_PMI_SQL, collocations_pmi

REGISTRY["collocations_pmi"] = (collocations_pmi, COLLOCATIONS_PMI_SQL)

from ocr_ray.ops.stats import (
    EVENT_VALUE_OUTLIERS_MAD_SQL,
    event_value_outliers_mad,
)

REGISTRY["event_value_outliers_mad"] = (
    event_value_outliers_mad,
    EVENT_VALUE_OUTLIERS_MAD_SQL,
)

from ocr_ray.ops.ann import EMBEDDING_GRAM_SQL, embedding_gram

REGISTRY["embedding_gram"] = (embedding_gram, EMBEDDING_GRAM_SQL)

from ocr_ray.ops.stats import USER_TYPE_GINI_SQL, user_type_gini

REGISTRY["user_type_gini"] = (user_type_gini, USER_TYPE_GINI_SQL)

from ocr_ray.ops.timeseries import USER_VALUE_DRAWDOWN_SQL, user_value_drawdown

REGISTRY["user_value_drawdown"] = (user_value_drawdown, USER_VALUE_DRAWDOWN_SQL)

from ocr_ray.ops.textstats import DOC_LINE_REPETITION_SQL, doc_line_repetition

REGISTRY["doc_line_repetition"] = (doc_line_repetition, DOC_LINE_REPETITION_SQL)

from ocr_ray.ops.ann import embedding_pca_project

# rows-only: eigendecomposition is not SQL-expressible; pytest-gated vs a
# numpy PCA reference (gated exact sibling: embedding_gram)
REGISTRY["embedding_pca_project"] = (embedding_pca_project, None)

from ocr_ray.ops.timeseries import EVENTS_LATE_ARRIVALS_SQL, events_late_arrivals

REGISTRY["events_late_arrivals"] = (events_late_arrivals, EVENTS_LATE_ARRIVALS_SQL)

from ocr_ray.ops.bpe import BPE_PAIR_CENSUS_SQL, bpe_pair_census, bpe_train_merges

REGISTRY["bpe_pair_census"] = (bpe_pair_census, BPE_PAIR_CENSUS_SQL)
# rows-only: the iterative argmax trainer is not SQL-expressible; pytest
# gates it against an independent pure-Python reference (tests/ref_bpe.py)
REGISTRY["bpe_train_merges"] = (bpe_train_merges, None)

from ocr_ray.ops.ann import embedding_kmeans_train

# rows-only: iterative Lloyd's rounds are not SQL-expressible; pytest gates
# the quantized spec against an independent numpy reference (tests/ref_kmeans.py)
REGISTRY["embedding_kmeans_train"] = (embedding_kmeans_train, None)

from ocr_ray.ops.multimodal import media_phash_near_dup

# rows-only: DCT perceptual hashing is not SQL-expressible; planted-grid
# pytest covers cluster/no-cluster behavior (exact sibling: media_dedup_exact)
REGISTRY["media_phash_near_dup"] = (media_phash_near_dup, None)

from ocr_ray.ops.timeseries import (
    PURCHASE_NEAREST_CLICK_SQL,
    USER_VALUE_EWMA_SQL,
    purchase_nearest_click,
    user_value_ewma,
)
from ocr_ray.ops.mlprep import EVENTS_EXACT_K_PER_USER_SQL, events_exact_k_per_user
from ocr_ray.ops.stats import (
    DISTINCT_USER_OVERLAP_SQL,
    distinct_user_overlap,
    distinct_user_overlap_kmv,
)
from ocr_ray.ops.dq import EVENTS_KEY_SKEW_SQL, events_key_skew

REGISTRY.update(
    {
        "user_value_ewma": (user_value_ewma, USER_VALUE_EWMA_SQL),
        "purchase_nearest_click": (purchase_nearest_click, PURCHASE_NEAREST_CLICK_SQL),
        "events_exact_k_per_user": (events_exact_k_per_user, EVENTS_EXACT_K_PER_USER_SQL),
        "distinct_user_overlap": (distinct_user_overlap, DISTINCT_USER_OVERLAP_SQL),
        # approximate: KMV/theta sketch; exact sibling above carries the gate
        "distinct_user_overlap_kmv": (distinct_user_overlap_kmv, None),
        "events_key_skew": (events_key_skew, EVENTS_KEY_SKEW_SQL),
    }
)

from ocr_ray.ops.stats import (
    EVENTS_SELFJOIN_SIZE_SQL,
    events_selfjoin_size,
    events_selfjoin_size_ams,
)
from ocr_ray.ops.dq import ANALYZE_ORDERS_SQL, analyze_orders

REGISTRY.update(
    {
        "events_selfjoin_size": (events_selfjoin_size, EVENTS_SELFJOIN_SIZE_SQL),
        # approximate: AMS linear sketch; exact sibling above carries the gate
        "events_selfjoin_size_ams": (events_selfjoin_size_ams, None),
        "analyze_orders": (analyze_orders, ANALYZE_ORDERS_SQL),
    }
)

from ocr_ray.ops.timeseries import CLICKS_UNCONVERTED_SQL, clicks_unconverted
from ocr_ray.ops.ann import EMBEDDING_JL_PROJECT_SQL, embedding_jl_project
from ocr_ray.ops.stats import EVENTS_TYPE_DOW_CHI2_SQL, events_type_dow_chi2
from ocr_ray.ops.dq import ORDERS_COLUMN_DRIFT_SQL, orders_column_drift

REGISTRY.update(
    {
        "clicks_unconverted": (clicks_unconverted, CLICKS_UNCONVERTED_SQL),
        "embedding_jl_project": (embedding_jl_project, EMBEDDING_JL_PROJECT_SQL),
        "events_type_dow_chi2": (events_type_dow_chi2, EVENTS_TYPE_DOW_CHI2_SQL),
        "orders_column_drift": (orders_column_drift, ORDERS_COLUMN_DRIFT_SQL),
    }
)

from ocr_ray.ops.timeseries import SESSION_FUNNEL_TIMED_SQL, session_funnel_timed
from ocr_ray.ops.stats import CUST_SPEND_LORENZ_SQL, cust_spend_lorenz

REGISTRY.update(
    {
        "session_funnel_timed": (session_funnel_timed, SESSION_FUNNEL_TIMED_SQL),
        "cust_spend_lorenz": (cust_spend_lorenz, CUST_SPEND_LORENZ_SQL),
    }
)

from ocr_ray.ops.timeseries import USER_VALUE_INTERPOLATED_SQL, user_value_interpolated
from ocr_ray.ops.stats import ORDER_REVENUE_BOOTSTRAP_SQL, order_revenue_bootstrap

REGISTRY.update(
    {
        "user_value_interpolated": (user_value_interpolated, USER_VALUE_INTERPOLATED_SQL),
        "order_revenue_bootstrap": (order_revenue_bootstrap, ORDER_REVENUE_BOOTSTRAP_SQL),
    }
)

from ocr_ray.ops.timeseries import (
    DAILY_CHURN_CENSUS_SQL,
    EVENTS_WINDOW_DEDUP_SQL,
    daily_churn_census,
    events_window_dedup,
)
from ocr_ray.ops.dq import ORDERS_FD_AUDIT_SQL, orders_fd_audit
from ocr_ray.ops.ann import EMBEDDING_ARGMAX_DIM_SQL, embedding_argmax_dim

REGISTRY.update(
    {
        "events_window_dedup": (events_window_dedup, EVENTS_WINDOW_DEDUP_SQL),
        "daily_churn_census": (daily_churn_census, DAILY_CHURN_CENSUS_SQL),
        "orders_fd_audit": (orders_fd_audit, ORDERS_FD_AUDIT_SQL),
        "embedding_argmax_dim": (embedding_argmax_dim, EMBEDDING_ARGMAX_DIM_SQL),
    }
)

from ocr_ray.ops.stats import (
    LINEITEM_WEIGHTED_QUANTILES_SQL,
    VALUE_DRIFT_KS_SQL,
    lineitem_weighted_quantiles,
    value_drift_ks,
)

REGISTRY.update(
    {
        "lineitem_weighted_quantiles": (
            lineitem_weighted_quantiles,
            LINEITEM_WEIGHTED_QUANTILES_SQL,
        ),
        "value_drift_ks": (value_drift_ks, VALUE_DRIFT_KS_SQL),
    }
)

from ocr_ray.ops.stats import ACTIVITY_SPEND_CORR_SQL, activity_spend_corr
from ocr_ray.ops.dedup import DOC_CASEFOLD_COLLISIONS_SQL, doc_casefold_collisions

REGISTRY.update(
    {
        "activity_spend_corr": (activity_spend_corr, ACTIVITY_SPEND_CORR_SQL),
        "doc_casefold_collisions": (doc_casefold_collisions, DOC_CASEFOLD_COLLISIONS_SQL),
    }
)

from ocr_ray.ops.stats import ORDER_PRICE_MAD_SQL, order_price_mad
from ocr_ray.ops.timeseries import (
    CUMULATIVE_DISTINCT_USERS_SQL,
    SESSION_PATHS_TOPK_SQL,
    cumulative_distinct_users,
    session_paths_topk,
)
from ocr_ray.ops.mlprep import EVENTS_SYSTEMATIC_SAMPLE_SQL, events_systematic_sample
from ocr_ray.ops.textstats import doc_compression_ratio

REGISTRY.update(
    {
        "order_price_mad": (order_price_mad, ORDER_PRICE_MAD_SQL),
        "cumulative_distinct_users": (cumulative_distinct_users, CUMULATIVE_DISTINCT_USERS_SQL),
        "session_paths_topk": (session_paths_topk, SESSION_PATHS_TOPK_SQL),
        "events_systematic_sample": (events_systematic_sample, EVENTS_SYSTEMATIC_SAMPLE_SQL),
        # deterministic but not SQL-expressible (no deflate in DuckDB);
        # pinned by the pytest recompute oracle
        "doc_compression_ratio": (doc_compression_ratio, None),
    }
)

from ocr_ray.ops.scrub import CUSTS_LDIVERSITY_AUDIT_SQL, custs_ldiversity_audit

REGISTRY["custs_ldiversity_audit"] = (custs_ldiversity_audit, CUSTS_LDIVERSITY_AUDIT_SQL)

from ocr_ray.ops.textstats import DOC_TTR_SQL, doc_ttr

REGISTRY["doc_ttr"] = (doc_ttr, DOC_TTR_SQL)

from ocr_ray.ops.mlprep import CUST_TARGET_ENCODING_SQL, cust_target_encoding

REGISTRY["cust_target_encoding"] = (cust_target_encoding, CUST_TARGET_ENCODING_SQL)

from ocr_ray.ops.mlprep import CUST_BALANCE_IMPUTED_SQL, cust_balance_imputed

REGISTRY["cust_balance_imputed"] = (cust_balance_imputed, CUST_BALANCE_IMPUTED_SQL)

from ocr_ray.ops.stats import PART_PAIR_LIFT_SQL, part_pair_lift

REGISTRY["part_pair_lift"] = (part_pair_lift, PART_PAIR_LIFT_SQL)

from ocr_ray.ops.timeseries import USER_HOUR_OHLC_SQL, user_hour_ohlc

REGISTRY["user_hour_ohlc"] = (user_hour_ohlc, USER_HOUR_OHLC_SQL)

from ocr_ray.ops.timeseries import USER_VALUE_CUSUM_SQL, user_value_cusum

REGISTRY["user_value_cusum"] = (user_value_cusum, USER_VALUE_CUSUM_SQL)

from ocr_ray.ops.timeseries import (
    SHIP_DELAY_BUSINESS_DAYS_SQL,
    ship_delay_business_days,
)

REGISTRY["ship_delay_business_days"] = (
    ship_delay_business_days,
    SHIP_DELAY_BUSINESS_DAYS_SQL,
)

from ocr_ray.ops.stats import EVENTS_VALUE_HISTOGRAM_SQL, events_value_histogram

REGISTRY["events_value_histogram"] = (events_value_histogram, EVENTS_VALUE_HISTOGRAM_SQL)

from ocr_ray.ops.stats import ORDER_PRICE_RUNS_SQL, order_price_runs

REGISTRY["order_price_runs"] = (order_price_runs, ORDER_PRICE_RUNS_SQL)

from ocr_ray.ops.timeseries import (
    USER_VALUE_MOVING_MEDIAN_SQL,
    user_value_moving_median,
)

REGISTRY["user_value_moving_median"] = (
    user_value_moving_median,
    USER_VALUE_MOVING_MEDIAN_SQL,
)

from ocr_ray.ops.mlprep import USER_VALUE_SCALED_SQL, user_value_scaled

REGISTRY["user_value_scaled"] = (user_value_scaled, USER_VALUE_SCALED_SQL)

from ocr_ray.ops.graph import sssp_weighted_graph

REGISTRY["sssp_weighted_graph"] = (sssp_weighted_graph, None)  # SQL built per-sf

from ocr_ray.ops.olap import TYPE_DOW_MATRIX_SQL, type_dow_matrix

REGISTRY["type_dow_matrix"] = (type_dow_matrix, TYPE_DOW_MATRIX_SQL)

from ocr_ray.ops.incremental import (
    ORDERS_CUST_JOIN_INCREMENTAL_SQL,
    orders_cust_join_incremental,
)

REGISTRY["orders_cust_join_incremental"] = (
    orders_cust_join_incremental,
    ORDERS_CUST_JOIN_INCREMENTAL_SQL,
)

from ocr_ray.ops.timeseries import PURCHASES_IN_SESSIONS_SQL, purchases_in_sessions

REGISTRY["purchases_in_sessions"] = (purchases_in_sessions, PURCHASES_IN_SESSIONS_SQL)

from ocr_ray.sources.evolving import orders_bitemporal_asof

REGISTRY["orders_bitemporal_asof"] = (orders_bitemporal_asof, None)  # SQL built per-sf

from ocr_ray.ops.stats import NATION_SUPPLIER_HHI_SQL, nation_supplier_hhi

REGISTRY["nation_supplier_hhi"] = (nation_supplier_hhi, NATION_SUPPLIER_HHI_SQL)

from ocr_ray.ops.dq import ORDERS_RULE_VIOLATIONS_SQL, orders_rule_violations

REGISTRY["orders_rule_violations"] = (orders_rule_violations, ORDERS_RULE_VIOLATIONS_SQL)

from ocr_ray.ops.timeseries import (
    USER_CONVERSION_SURVIVAL_SQL,
    user_conversion_survival,
)

REGISTRY["user_conversion_survival"] = (
    user_conversion_survival,
    USER_CONVERSION_SURVIVAL_SQL,
)

from ocr_ray.ops.timeseries import USER_EVENT_PATTERN_SQL, user_event_pattern

REGISTRY["user_event_pattern"] = (user_event_pattern, USER_EVENT_PATTERN_SQL)

from ocr_ray.ops.incremental import (
    ORDERS_CUST_JOIN_SALTED_SQL,
    orders_cust_join_salted,
)

REGISTRY["orders_cust_join_salted"] = (
    orders_cust_join_salted,
    ORDERS_CUST_JOIN_SALTED_SQL,
)

from ocr_ray.ops.timeseries import PURCHASE_CLICK_PRESSURE_SQL, purchase_click_pressure

REGISTRY["purchase_click_pressure"] = (purchase_click_pressure, PURCHASE_CLICK_PRESSURE_SQL)

from ocr_ray.ops.ann import EMBEDDING_QUANTIZE_INT8_SQL, embedding_quantize_int8

REGISTRY["embedding_quantize_int8"] = (embedding_quantize_int8, EMBEDDING_QUANTIZE_INT8_SQL)

from ocr_ray.ops.mlprep import DOC_KFOLD_STRATIFIED_SQL, doc_kfold_stratified

REGISTRY["doc_kfold_stratified"] = (doc_kfold_stratified, DOC_KFOLD_STRATIFIED_SQL)

from ocr_ray.ops.graph import graph_reciprocity_graph

REGISTRY["graph_reciprocity_graph"] = (graph_reciprocity_graph, None)  # SQL built per-sf

from ocr_ray.ops.mlprep import DOCS_PROPORTIONAL_SAMPLE_SQL, docs_proportional_sample

REGISTRY["docs_proportional_sample"] = (
    docs_proportional_sample,
    DOCS_PROPORTIONAL_SAMPLE_SQL,
)

from ocr_ray.ops.mlprep import STUMP_TRAIN_EVENTS_SQL, stump_train_events

REGISTRY["stump_train_events"] = (stump_train_events, STUMP_TRAIN_EVENTS_SQL)

from ocr_ray.ops.olap import CUST_ABC_CLASSES_SQL, cust_abc_classes

REGISTRY["cust_abc_classes"] = (cust_abc_classes, CUST_ABC_CLASSES_SQL)

from ocr_ray.ops.stats import (
    EVENTS_AB_LIFT_SQL,
    ORDERS_EVENTS_JOIN_SIZE_SQL,
    USER_VALUE_AUTOCORR_SQL,
    events_ab_lift,
    orders_events_join_size,
    orders_events_join_size_ams,
    user_value_autocorr,
)

REGISTRY.update(
    {
        "user_value_autocorr": (user_value_autocorr, USER_VALUE_AUTOCORR_SQL),
        "orders_events_join_size": (
            orders_events_join_size,
            ORDERS_EVENTS_JOIN_SIZE_SQL,
        ),
        "orders_events_join_size_ams": (orders_events_join_size_ams, None),
        "events_ab_lift": (events_ab_lift, EVENTS_AB_LIFT_SQL),
    }
)

from ocr_ray.ops.timeseries import USER_BURST_PROFILE_SQL, user_burst_profile

REGISTRY.update(
    {"user_burst_profile": (user_burst_profile, USER_BURST_PROFILE_SQL)}
)
