"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in the library) calls ``ray.init`` / ``ray.shutdown``.

* ``entry()`` — flagship per-turn extraction pipeline at sf0.001 scale.
* ``queries()`` — one callable per implemented operator/pipeline
  (SURVEY.md §2 + the large-scale training-data ops).
* ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query
  (column names match exactly; money is exact integer cents so value hashes
  are reduction-order independent).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any


def _transcripts_for(sf_dir: str) -> str:
    """Deterministic synthetic transcripts input scaled to the sf dir
    (no transcript table ships in testdata; FIXTURES.md §1)."""
    from ocr_ray.sources.transcripts import ensure_transcripts, n_convs_for_sf

    return ensure_transcripts(n_convs_for_sf(sf_dir), seed=42)


def _extract_turns(sf_dir: str):
    """Flagship: per-turn main-content extraction (scalar columns only;
    the nested ``blocks`` column is exercised by extract_blocks + pytest)."""
    from ocr_ray.pipelines.extract_pipeline import extract_from_path

    ds = extract_from_path(_transcripts_for(sf_dir))
    return ds.select_columns(
        ["conv_id", "turn_idx", "role", "payload_kind", "main_text", "n_blocks", "error", "bytes_in"]
    )


def _extract_records(sf_dir: str):
    """Canonical typed record per turn (the reference's zod-record output
    with M4 defaults; stages/records.py) over the FULL corpus; the
    driver-verifiable sibling is extract_records_gated."""
    from ocr_ray.pipelines.extract_pipeline import extract_from_path
    from ocr_ray.stages.records import records_from_extracted

    return extract_from_path(_transcripts_for(sf_dir)).map_batches(
        records_from_extracted, batch_format="pyarrow"
    )


def _extract_spans(sf_dir: str):
    """Per-block source spans over the FULL corpus (north rule "extracted
    text/spans"); self-checking against the kernel's block stream and
    driver-gated (r4) against the INDEPENDENT golden span oracle
    (ocr_ray/oracle_spans.py, read back via DuckDB). Gated siblings:
    extract_plain_spans / extract_pdf_spans (pure-SQL mirrors),
    extract_html_spans (golden-oracle gated)."""
    from ocr_ray.stages.spans import extract_spans_from_path

    return extract_spans_from_path(_transcripts_for(sf_dir))


def _extract_blocks(sf_dir: str):
    """Exploded one-row-per-block view (sheet-sink explode analog,
    save-to-google-sheet.ts:199-215)."""
    from ocr_ray.pipelines.extract_pipeline import exploded_blocks, extract_from_path

    return exploded_blocks(extract_from_path(_transcripts_for(sf_dir)))


def _extract_summaries(sf_dir: str):
    """Per-turn digest column (summarize-pdf-data.ts analog, deterministic)."""
    from ocr_ray.pipelines.extract_pipeline import extract_from_path
    from ocr_ray.stages.summarize import summarize_dataset

    ds = summarize_dataset(extract_from_path(_transcripts_for(sf_dir)))
    return ds.select_columns(["conv_id", "turn_idx", "payload_kind", "summary"])


def _extract_metrics(sf_dir: str):
    """Per-payload-kind QC rollup of the extraction run (lineage sidecar)."""
    from ocr_ray.pipelines.extract_pipeline import extract_from_path
    from ocr_ray.state.metrics import extraction_metrics

    return extraction_metrics(extract_from_path(_transcripts_for(sf_dir)))


def _clean_corpus(sf_dir: str):
    """Composed training-data pipeline: extract -> quality gate -> lang-ID +
    token counts -> exact turn dedup (the end-to-end 100 TB use case)."""
    import ray.data as rd

    from ocr_ray.pipelines.training_data import clean_corpus

    ds = clean_corpus(rd.read_parquet(_transcripts_for(sf_dir)))
    return ds.select_columns(["conv_id", "turn_idx", "payload_kind", "lang_pred", "n_tokens"])


def _pipeline_out_dir(kind: str, sf_dir: str) -> str:
    """Deterministic committed-output dir for a composed pipeline at this
    scale — the ORACLE reads the same parquet back with DuckDB and
    recomputes the mixture report, so the corpus must outlive the query
    call (the driver runs the Ray query before its SQL, like qcheck)."""
    from ocr_ray.pipelines.training_data import pipeline_out_dir
    from ocr_ray.sources.transcripts import n_convs_for_sf

    return pipeline_out_dir(kind, n_convs_for_sf(sf_dir))


def _training_data_full(sf_dir: str):
    """The COMPLETE composed pipeline incl. near-dup, split assignment and
    the resumable sink; returns the per-(split, lang) mixture report.
    SQL-gated: the oracle recounts the committed corpus per (split, lang)
    with DuckDB — report/corpus reconciliation as a driver-green row."""
    import ray.data as rd

    from ocr_ray.pipelines.training_data import training_data_full

    out = _pipeline_out_dir("tdf", sf_dir)
    return training_data_full(rd.read_parquet(_transcripts_for(sf_dir)), out)


def _sft_dataset_full(sf_dir: str):
    """Composed SFT-dataset pipeline (conv dedup -> pair assembly -> gate ->
    split -> resumable sink); returns the per-split mixture report. Parts
    individually gated (conv_dedup_exact, sft_examples); the composition is
    SQL-gated via a DuckDB recount of the committed corpus."""
    import ray.data as rd

    from ocr_ray.pipelines.training_data import sft_dataset_full

    out = _pipeline_out_dir("sft", sf_dir)
    return sft_dataset_full(rd.read_parquet(_transcripts_for(sf_dir)), out)


def _conversation_stats(sf_dir: str):
    """Per-conversation rollup (partial pre-agg + tiny groupby)."""
    import ray.data as rd

    from ocr_ray.pipelines.conversation import conversation_stats

    return conversation_stats(rd.read_parquet(_transcripts_for(sf_dir)))


def _dialogue_pairs(sf_dir: str):
    """Cross-turn context view (groupby(conv_id) co-located scan)."""
    import ray.data as rd

    from ocr_ray.pipelines.conversation import dialogue_pairs
    from ocr_ray.pipelines.extract_pipeline import extract_dataset

    return dialogue_pairs(
        extract_dataset(rd.read_parquet(_transcripts_for(sf_dir)))
    )


def _turn_context_stats(sf_dir: str):
    """Cross-turn lag scan (prev role / gap / reply-echo), SQL-gated via a
    lag() window oracle; co-located by conv_id through grouped_scan."""
    import ray.data as rd

    from ocr_ray.pipelines.conversation import turn_context_stats

    return turn_context_stats(rd.read_parquet(_transcripts_for(sf_dir)))


def _jsonl_events_rollup(sf_dir: str):
    """JSONL source path (format interchange, S1 generalization)."""
    from ocr_ray.sources.readers import jsonl_events_rollup

    return jsonl_events_rollup(sf_dir)


def _csv_events_rollup(sf_dir: str):
    """CSV source path (format interchange, S1 generalization)."""
    from ocr_ray.sources.readers import csv_events_rollup

    return csv_events_rollup(sf_dir)


def _docs_schema_union(sf_dir: str):
    """Schema-evolution read: union-by-name over heterogeneous Parquet
    shard generations (missing columns null-filled per batch)."""
    from ocr_ray.sources.readers import docs_schema_union

    return docs_schema_union(sf_dir)


def _docs_lineage_census(sf_dir: str):
    """Provenance-column read: per-source-shard census via include_paths
    (row-level lineage; DuckDB mirror via filename=true)."""
    from ocr_ray.sources.readers import docs_lineage_census

    return docs_lineage_census(sf_dir)


def _conv_texts(sf_dir: str):
    """Conversation flattening: ordered per-conversation text concat (the
    training-document assembly step), SQL-gated via string_agg ORDER BY."""
    import ray.data as rd

    from ocr_ray.pipelines.conversation import conv_texts

    return conv_texts(rd.read_parquet(_transcripts_for(sf_dir)))


def _extract_links(sf_dir: str):
    """Per-target href census (link-graph building), vectorized Arrow
    split-on-literal; oracle applies identical split semantics."""
    import ray.data as rd

    from ocr_ray.pipelines.conversation import extract_links

    return extract_links(rd.read_parquet(_transcripts_for(sf_dir)))


def _tool_usage_stats(sf_dir: str):
    """Per-tool invocation rollup (exact distinct-conversation counts via
    groupby dedup — no driver sets); exercises the ``tool`` input column."""
    import ray.data as rd

    from ocr_ray.pipelines.conversation import tool_usage_stats

    return tool_usage_stats(rd.read_parquet(_transcripts_for(sf_dir)))


def _conv_response_latency(sf_dir: str):
    """Adjacent user->assistant response latency per conversation (window
    lag over the raw transcript table), SQL-gated."""
    import ray.data as rd

    from ocr_ray.pipelines.conversation import conv_response_latency

    return conv_response_latency(rd.read_parquet(_transcripts_for(sf_dir)))


def _conv_tool_transitions(sf_dir: str):
    """First-order Markov census over per-conversation tool-call sequences
    (the ``tool`` column beyond the per-tool rollup), SQL-gated."""
    import ray.data as rd

    from ocr_ray.pipelines.conversation import conv_tool_transitions

    return conv_tool_transitions(rd.read_parquet(_transcripts_for(sf_dir)))


def _dq_role_alternation(sf_dir: str):
    """Transcript-structure DQ audit: per-conv stutter count (adjacent
    same-role turns) + opens-with-user flag, SQL-gated."""
    import ray.data as rd

    from ocr_ray.pipelines.conversation import dq_role_alternation

    return dq_role_alternation(rd.read_parquet(_transcripts_for(sf_dir)))


def _system_prompt_census(sf_dir: str):
    """Top-k dominant system-prompt texts (digest-only count shuffle,
    boundary-tie text fetch), SQL-gated."""
    import ray.data as rd

    from ocr_ray.pipelines.conversation import system_prompt_census

    return system_prompt_census(rd.read_parquet(_transcripts_for(sf_dir)))


def _conv_dedup_exact(sf_dir: str):
    """Conversation-level exact dedup census (digest over each dialogue's
    ordered role+text sequence; digests, never text, through the shuffle)."""
    import ray.data as rd

    from ocr_ray.pipelines.conversation import conv_dedup_exact

    return conv_dedup_exact(rd.read_parquet(_transcripts_for(sf_dir)))


def _conv_assistant_echo(sf_dir: str):
    """Within-conversation assistant self-repetition census (loop
    detection): per conv, assistant turns and exact-echo count."""
    import ray.data as rd

    from ocr_ray.pipelines.conversation import conv_assistant_echo

    return conv_assistant_echo(rd.read_parquet(_transcripts_for(sf_dir)))


def _sft_examples(sf_dir: str):
    """SFT training-pair assembly: per-assistant-turn capped context tail
    (windowed string_agg oracle)."""
    import ray.data as rd

    from ocr_ray.pipelines.conversation import sft_examples

    return sft_examples(rd.read_parquet(_transcripts_for(sf_dir)))


def _tool_latency_stats(sf_dir: str):
    """Per-tool execution-latency rollup (wait to the immediate successor
    turn), SQL-gated via a lead() window oracle."""
    import ray.data as rd

    from ocr_ray.pipelines.conversation import tool_latency_stats

    return tool_latency_stats(rd.read_parquet(_transcripts_for(sf_dir)))


def _extract_context_turns(sf_dir: str):
    """Context-aware engine: reply-echo prefixes stripped before extraction
    (pytest-gated; extraction itself is not SQL-expressible)."""
    import ray.data as rd

    from ocr_ray.pipelines.conversation import extract_context_turns

    return extract_context_turns(rd.read_parquet(_transcripts_for(sf_dir)))


def _clean_corpus_neardup(sf_dir: str):
    """clean_corpus with the MinHash-LSH near-dup stage chained after exact
    dedup (distributed min-label components; VERDICT r1 next-step #3)."""
    import ray.data as rd

    from ocr_ray.pipelines.training_data import clean_corpus

    ds = clean_corpus(rd.read_parquet(_transcripts_for(sf_dir)), near_dedup=True)
    return ds.select_columns(["conv_id", "turn_idx", "payload_kind", "lang_pred", "n_tokens"])



def _conv_token_novelty(sf_dir: str):
    """Per-turn token-novelty curve (first-appearance census per
    conversation), SQL-gated via a distinct-token MIN(turn) mirror."""
    import ray.data as rd

    from ocr_ray.pipelines.conversation import conv_token_novelty

    return conv_token_novelty(rd.read_parquet(_transcripts_for(sf_dir)))


def _conv_token_novelty_exact(sf_dir: str):
    """Collision-free text-exchange sibling of conv_token_novelty — same
    output, same SQL mirror; gates the hashed default by construction."""
    import ray.data as rd

    from ocr_ray.pipelines.conversation import conv_token_novelty_exact

    return conv_token_novelty_exact(rd.read_parquet(_transcripts_for(sf_dir)))


def _turn_markup_stats(sf_dir: str):
    """Per-turn markup-density census (tag-ratio ingredients of the HTML
    boilerplate heuristics), SQL-gated via replace-arithmetic mirrors."""
    import ray.data as rd

    from ocr_ray.pipelines.conversation import turn_markup_stats

    return turn_markup_stats(rd.read_parquet(_transcripts_for(sf_dir)))



def _conv_lang_profile(sf_dir: str):
    """Per-conversation language-mixture census; the oracle composes the
    same generated stopword-profile SQL as the Ray scorer."""
    import ray.data as rd

    from ocr_ray.pipelines.conversation import conv_lang_profile

    return conv_lang_profile(rd.read_parquet(_transcripts_for(sf_dir)))


def entry() -> Any:
    """Flagship pipeline at sf0.001 scale; driver smoke-checks rows>=0."""
    return _extract_turns("/root/testdata/sf0.001")


# sf the DRIVER runs queries/oracles at; the extract-family oracle SQL reads
# the deterministic transcripts fixture for this sf (regenerated on demand
# at oracle_sql() build time so the embedded path exists when DuckDB runs).
_DRIVER_SF = os.environ.get("GRAFT_DRIVER_SF", "/root/testdata/sf0.01")


def queries() -> dict[str, Callable[[str], Any]]:
    from ocr_ray.pipelines.extract_oracle import (
        clean_corpus_html,
        clean_corpus_plain,
        engine_dispatch_counts,
        extract_datauri_turns,
        extract_html_blocks,
        extract_html_spans,
        extract_metrics_gated,
        extract_records_gated,
        extract_html_summaries,
        extract_html_turns,
        extract_pdf_blocks,
        extract_pdf_spans,
        extract_pdf_summaries,
        extract_pdf_turns,
        extract_plain_blocks,
        extract_plain_spans,
        extract_plain_summaries,
        extract_plain_turns,
        extract_turn_counts,
        html_dialogue_pairs,
        plain_dialogue_pairs,
    )
    from ocr_ray.pipelines.relational import REGISTRY

    out: dict[str, Callable[[str], Any]] = {
        "extract_turns": _extract_turns,
        "extract_blocks": _extract_blocks,
        "extract_summaries": _extract_summaries,
        "extract_metrics": _extract_metrics,
        "extract_plain_turns": extract_plain_turns,
        "extract_html_turns": extract_html_turns,
        "extract_html_blocks": extract_html_blocks,
        "extract_html_spans": extract_html_spans,
        "extract_spans": _extract_spans,
        "extract_datauri_turns": extract_datauri_turns,
        "extract_pdf_turns": extract_pdf_turns,
        "extract_pdf_blocks": extract_pdf_blocks,
        "extract_pdf_spans": extract_pdf_spans,
        "extract_plain_blocks": extract_plain_blocks,
        "extract_plain_spans": extract_plain_spans,
        "extract_plain_summaries": extract_plain_summaries,
        "extract_html_summaries": extract_html_summaries,
        "extract_pdf_summaries": extract_pdf_summaries,
        "engine_dispatch_counts": engine_dispatch_counts,
        "extract_turn_counts": extract_turn_counts,
        "extract_metrics_gated": extract_metrics_gated,
        "extract_records": _extract_records,
        "extract_records_gated": extract_records_gated,
        "clean_corpus": _clean_corpus,
        "clean_corpus_neardup": _clean_corpus_neardup,
        "training_data_full": _training_data_full,
        "sft_dataset_full": _sft_dataset_full,
        "clean_corpus_plain": clean_corpus_plain,
        "clean_corpus_html": clean_corpus_html,
        "conversation_stats": _conversation_stats,
        "dialogue_pairs": _dialogue_pairs,
        "plain_dialogue_pairs": plain_dialogue_pairs,
        "html_dialogue_pairs": html_dialogue_pairs,
        "turn_context_stats": _turn_context_stats,
        "tool_usage_stats": _tool_usage_stats,
        "conv_texts": _conv_texts,
        "conv_response_latency": _conv_response_latency,
        "conv_tool_transitions": _conv_tool_transitions,
        "dq_role_alternation": _dq_role_alternation,
        "system_prompt_census": _system_prompt_census,
        "conv_dedup_exact": _conv_dedup_exact,
        "sft_examples": _sft_examples,
        "conv_assistant_echo": _conv_assistant_echo,
        "conv_token_novelty": _conv_token_novelty,
        "conv_token_novelty_exact": _conv_token_novelty_exact,
        "turn_markup_stats": _turn_markup_stats,
        "conv_lang_profile": _conv_lang_profile,
        "tool_latency_stats": _tool_latency_stats,
        "extract_links": _extract_links,
        "jsonl_events_rollup": _jsonl_events_rollup,
        "csv_events_rollup": _csv_events_rollup,
        "docs_schema_union": _docs_schema_union,
        "docs_lineage_census": _docs_lineage_census,
        "extract_context_turns": _extract_context_turns,
    }
    from ocr_ray.pipelines.binpdf_gate import extract_binpdf_blocks, extract_binpdf_turns

    out["extract_binpdf_turns"] = extract_binpdf_turns
    out["extract_binpdf_blocks"] = extract_binpdf_blocks
    from ocr_ray.pipelines.extract_oracle import extract_context_turns_echo

    out["extract_context_turns_echo"] = extract_context_turns_echo
    for name, (fn, _sql) in REGISTRY.items():
        out[name] = fn
    try:
        from ocr_ray.ops import REGISTRY as OPS_REGISTRY

        for name, (fn, _sql) in OPS_REGISTRY.items():
            out[name] = fn
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from ocr_ray.pipelines.extract_oracle import oracle_sqls
    from ocr_ray.pipelines.relational import REGISTRY

    out = {name: sql for name, (fn, sql) in REGISTRY.items() if sql}
    out.update(oracle_sqls(_DRIVER_SF))
    from ocr_ray.pipelines.binpdf_gate import binpdf_oracle_sqls

    out.update(binpdf_oracle_sqls(_DRIVER_SF))
    from ocr_ray.pipelines.extract_oracle import ctx_oracle_sqls

    out.update(ctx_oracle_sqls(_DRIVER_SF))
    try:
        from ocr_ray.ops import REGISTRY as OPS_REGISTRY
        from ocr_ray.ops.multimodal import media_inventory_sql

        out.update({name: sql for name, (fn, sql) in OPS_REGISTRY.items() if sql})
        # per-sf SQL: reads the deterministic fixture parquet directly
        out["media_inventory"] = media_inventory_sql(_DRIVER_SF)
        from ocr_ray.ops.multimodal import media_dedup_exact_sql

        out["media_dedup_exact"] = media_dedup_exact_sql(_DRIVER_SF)
        from ocr_ray.ops.multimodal import media_image_stats_sql

        out["media_image_stats"] = media_image_stats_sql(_DRIVER_SF)
        from ocr_ray.ops.multimodal import media_jpeg_stats_sql

        out["media_jpeg_stats"] = media_jpeg_stats_sql(_DRIVER_SF)
        from ocr_ray.ops.multimodal import media_png_stats_sql

        out["media_png_stats"] = media_png_stats_sql(_DRIVER_SF)
        from ocr_ray.ops.multimodal import media_audio_stats_sql, media_video_frames_sql

        out["media_audio_stats"] = media_audio_stats_sql(_DRIVER_SF)
        out["media_video_frames"] = media_video_frames_sql(_DRIVER_SF)
        from ocr_ray.ops.simjoin import dedup_cosine_exact_sql

        out["dedup_cosine_exact"] = dedup_cosine_exact_sql(_DRIVER_SF)
        from ocr_ray.ops.ann import embedding_cluster_assign_sql

        out["embedding_cluster_assign"] = embedding_cluster_assign_sql(_DRIVER_SF)
        from ocr_ray.ops.scrub import scrub_docs_sql

        out["scrub_docs"] = scrub_docs_sql(_DRIVER_SF)
        from ocr_ray.sources.evolving import orders_evolved_rollup_sql

        out["orders_evolved_rollup"] = orders_evolved_rollup_sql(_DRIVER_SF)
        from ocr_ray.sources.evolving import orders_bitemporal_asof_sql

        out["orders_bitemporal_asof"] = orders_bitemporal_asof_sql(_DRIVER_SF)
        from ocr_ray.ops.corpus import strip_common_lines_sql

        out["strip_common_lines"] = strip_common_lines_sql(_DRIVER_SF)
        from ocr_ray.ops.markdown import extract_markdown_sql

        out["extract_markdown"] = extract_markdown_sql(_DRIVER_SF)
        from ocr_ray.sources.readers import csv_events_rollup_sql, jsonl_events_rollup_sql

        out["jsonl_events_rollup"] = jsonl_events_rollup_sql(_DRIVER_SF)
        out["csv_events_rollup"] = csv_events_rollup_sql(_DRIVER_SF)
        from ocr_ray.sources.readers import docs_schema_union_sql

        out["docs_schema_union"] = docs_schema_union_sql(_DRIVER_SF)
        from ocr_ray.sources.readers import docs_lineage_census_sql

        out["docs_lineage_census"] = docs_lineage_census_sql(_DRIVER_SF)
        from ocr_ray.ops.graph import (
            bfs_hops_graph_sql,
            connected_components_graph_sql,
            pagerank_graph_sql,
            triangle_count_graph_sql,
        )

        out["pagerank_graph"] = pagerank_graph_sql(_DRIVER_SF)
        from ocr_ray.ops.graph import graph_kcore_graph_sql

        out["graph_kcore_graph"] = graph_kcore_graph_sql(_DRIVER_SF)
        out["connected_components_graph"] = connected_components_graph_sql(_DRIVER_SF)
        out["triangle_count_graph"] = triangle_count_graph_sql(_DRIVER_SF)
        out["bfs_hops_graph"] = bfs_hops_graph_sql(_DRIVER_SF)
        from ocr_ray.ops.graph import sssp_weighted_graph_sql

        out["sssp_weighted_graph"] = sssp_weighted_graph_sql(_DRIVER_SF)
        from ocr_ray.ops.graph import graph_reciprocity_graph_sql

        out["graph_reciprocity_graph"] = graph_reciprocity_graph_sql(_DRIVER_SF)
        from ocr_ray.ops.fuzzy import fuzzy_name_pairs_sql

        out["fuzzy_name_pairs"] = fuzzy_name_pairs_sql(_DRIVER_SF)
        from ocr_ray.ops.fuzzy import fuzzy_name_clusters_sql

        out["fuzzy_name_clusters"] = fuzzy_name_clusters_sql(_DRIVER_SF)
    except ImportError:
        pass
    return out
