"""Composed training-data pipeline: the end-to-end 100 TB use case.

    transcripts
      -> per-turn main-content extraction        (stages/extract kernel)
      -> quality gate (error-free, min length)   (vectorized filter)
      -> language ID + token counts              (ops/textstats kernels)
      -> exact near-dup removal on main_text     (hash groupby, min uid wins)
      -> clean corpus (Dataset / partitioned sink)

Every stage streams; the only shuffle is the dedup groupby on the content
hash (high-cardinality key — the good case for Ray's sort-based shuffle;
contrast the low-cardinality partition-commit key, which uses the fragment
exchange in state/sink instead).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ocr_ray.functions.scalars import count_tokens
from ocr_ray.pipelines.extract_pipeline import extract_dataset

MIN_CHARS = 50


def _uid_col(t: pa.Table) -> pa.Array:
    """uid = conv_id#turn_idx with the index zero-padded to 10 digits so
    the LEXICOGRAPHIC min equals the (conv_id, turn_idx) numeric min —
    the survivor contract of both dedup passes."""
    padded = pc.utf8_lpad(pc.cast(t.column("turn_idx"), pa.string()), 10, "0")
    return pc.binary_join_element_wise(t.column("conv_id"), padded, "#")


def quality_gate(extracted: Dataset, min_chars: int = MIN_CHARS) -> Dataset:
    """Keep error-free turns with enough extracted content (vectorized)."""

    def fn(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(t.column("error"), ""),
            pc.greater_equal(
                pc.utf8_length(t.column("main_text")), pa.scalar(min_chars)
            ),
        )
        return t.filter(keep)

    return extracted.map_batches(fn, batch_format="pyarrow")


def annotate(clean: Dataset) -> Dataset:
    """Add lang_pred + n_tokens over the extracted main_text."""
    from ocr_ray.ops.textstats import lang_of

    def fn(t: pa.Table) -> pa.Table:
        langs = [lang_of(x)[0] for x in t.column("main_text").to_pylist()]
        return t.append_column("lang_pred", pa.array(langs, pa.string())).append_column(
            "n_tokens", count_tokens(t.column("main_text"))
        )

    return clean.map_batches(fn, batch_format="pyarrow", batch_size=None)


def dedup_exact_turns(ds: Dataset) -> Dataset:
    """Drop exact-duplicate main_texts; the (conv_id, turn_idx)-smallest
    turn survives.

    Shuffle-minimal plan: only tiny ``(text_sha, uid)`` pairs go through
    the winner groupby — the text payload never transits a shuffle. The
    winner uid set is then applied as a broadcast semi-join filter
    (sized ~40 B/row; for corpora where even that outgrows the driver,
    swap the filter for ``functions.joins.hash_join`` on uid — same plan
    with a co-partitioning exchange instead of a broadcast)."""

    def add_keys(t: pa.Table) -> pa.Table:
        hs = [
            hashlib.sha256(x.encode("utf-8")).hexdigest()
            for x in t.column("main_text").to_pylist()
        ]
        return t.append_column("text_sha", pa.array(hs, pa.string())).append_column(
            "uid", _uid_col(t)
        )

    # Materialize once: both the winner computation and the final filter
    # consume this dataset; without pinning, Ray would re-execute the whole
    # upstream (including extraction) for each branch. At corpus scales
    # beyond object-store memory, checkpoint the gated corpus to storage
    # instead and dedup over the checkpoint (same plan, disk-backed).
    keyed = ds.map_batches(add_keys, batch_format="pyarrow").materialize()

    from ray.data.aggregate import Min

    def batch_partial(t: pa.Table) -> pa.Table:
        # per-batch combiner: one (sha, min uid) row per distinct sha per
        # batch BEFORE the shuffle (and an aggregate, not map_groups —
        # per-group Python calls cost ~0.4 ms x n_groups)
        g = t.select(["text_sha", "uid"]).group_by(["text_sha"]).aggregate([("uid", "min")])
        return g.rename_columns(["text_sha", "uid"])

    winners = (
        keyed.map_batches(batch_partial, batch_format="pyarrow")
        .groupby("text_sha")
        .aggregate(Min("uid", alias_name="uid"))
    )
    winner_uids = [r["uid"] for r in winners.take_all()]
    from ocr_ray.functions.joins import semi_join_filter

    return semi_join_filter(keyed, "uid", winner_uids).drop_columns(
        ["text_sha", "uid"]
    )


def dedup_near_turns(ds: Dataset) -> Dataset:
    """MinHash-LSH near-dup pass over ``main_text`` (run after exact dedup):
    signatures over ``uid = conv_id#turn_idx``, banded buckets, signature-
    agreement verify, min-uid survivor per component. The banded rows
    shuffled are tiny (band_hash, uid) pairs — text never transits the
    exchange; survivors are selected with a broadcast semi-join filter."""
    from ocr_ray.functions.joins import semi_join_filter
    from ocr_ray.ops.dedup import minhash_candidate_pairs, minhash_signatures, _components_survivors

    def add_uid(t: pa.Table) -> pa.Table:
        return t.append_column("uid", _uid_col(t))

    with_uid = ds.map_batches(add_uid, batch_format="pyarrow")
    sigs = minhash_signatures(
        with_uid.select_columns(["uid", "main_text"]), text_col="main_text", id_col="uid"
    ).materialize()
    pairs_t = minhash_candidate_pairs(sigs)
    pairs = list(zip(pairs_t.column("a").to_pylist(), pairs_t.column("b").to_pylist()))
    all_ids = [r["doc_id"] for r in sigs.select_columns(["doc_id"]).take_all()]
    survivors = _components_survivors(all_ids, pairs).column("doc_id").to_pylist()
    return semi_join_filter(with_uid, "uid", survivors).drop_columns(["uid"])


def clean_corpus(transcripts: Dataset, *, min_chars: int = MIN_CHARS) -> Dataset:
    """transcripts -> deduplicated, quality-gated, annotated corpus.

    Project to scalar columns BEFORE the dedup groupby: (a) the nested
    ``blocks`` column doesn't round-trip through the pandas group batches,
    (b) never ship payload you don't need through a shuffle. For near-dup
    removal on top of exact dedup, chain ``dedup_near_turns``."""
    annotated = annotate(quality_gate(extract_dataset(transcripts), min_chars))
    slim = annotated.select_columns(
        ["conv_id", "turn_idx", "payload_kind", "lang_pred", "n_tokens", "main_text"]
    )
    return dedup_exact_turns(slim)
