"""Distributed BPE (byte-pair-encoding) tokenizer training over ``documents``.

The op a training-data pipeline runs to derive a tokenizer from the corpus
it just cleaned. Two entries:

* ``bpe_pair_census`` — the first-round adjacent-symbol-pair census
  (characters, before any merge), SQL-gated: DuckDB reproduces it with a
  lateral ``generate_series`` over codepoint positions.
* ``bpe_train_merges`` — the iterative trainer. The expensive, corpus-sized
  work (word census) happens ONCE as a distributed groupby; every merge
  round then operates on the *vocabulary* (distinct words + counts), which
  is orders of magnitude smaller than the corpus and stays a Dataset
  throughout. Per round the exchange carries (pair, partial-count) rows —
  bounded by distinct adjacent pairs, not corpus size — and the driver sees
  only one best-pair row per block plus the final merge list (``n_merges``
  rows). Spec (shared with the independent pytest reference,
  tests/ref_bpe.py, written against this paragraph, not this code):

  - word census over lowercased whitespace tokens;
  - pair census counts EVERY adjacent symbol position (overlaps included),
    weighted by word count;
  - winner = max count, ties broken by (left, right) ascending;
  - the merge applies left-to-right non-overlapping within each word.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Sum

from ocr_ray.ops.corpus import _pq, _token_lists

_CENSUS_TOP = 100


def _word_counts_batch(t: pa.Table) -> pa.Table:
    """Per-batch partial word census: Arrow lower+split+value_counts (no
    Python per token)."""
    toks = _token_lists(t).combine_chunks()
    flat = toks.flatten()
    flat = flat.filter(pc.not_equal(flat, pa.scalar("")))
    vc = flat.value_counts()
    return pa.table(
        {"word": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())}
    )


def _pair_census_from_words(words, counts) -> dict[str, int]:
    """Adjacent-codepoint-pair census over DISTINCT words (weighted): the
    Python loop is vocabulary-bounded, not occurrence-bounded."""
    census: dict[str, int] = {}
    for w, c in zip(words, counts):
        for i in range(len(w) - 1):
            p = w[i : i + 2]
            census[p] = census.get(p, 0) + int(c)
    return census


def bpe_pair_census(sf_dir: str, top: int = _CENSUS_TOP) -> Dataset:
    """Top adjacent-character pairs by (count desc, pair asc) over the
    lowercased word census — BPE round 0, driver-verifiable.

    Plan: per-batch Arrow word value_counts -> a Python fold over the
    batch's DISTINCT words (vocab-bounded) -> (pair, n) partials ->
    ``groupby(pair).sum`` -> sort+limit over distinct pairs only."""
    docs = rd.read_parquet(_pq(sf_dir, "documents"), columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        wc = _word_counts_batch(t)
        census = _pair_census_from_words(
            wc.column("word").to_pylist(), wc.column("n").to_pylist()
        )
        return pa.table(
            {
                "pair": pa.array(list(census.keys()), pa.string()),
                "n": pa.array(list(census.values()), pa.int64()),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "pair"], descending=[True, False])
        .limit(top)
    )


# substr/length are codepoint-based in DuckDB, matching Python slicing;
# generate_series(1, 0) is empty, so 1-char words contribute no pairs.
BPE_PAIR_CENSUS_SQL = f"""
WITH words AS (
  SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '\\S+')) AS w
  FROM documents
),
pos AS (
  SELECT w, unnest(generate_series(1, length(w) - 1)) AS i
  FROM words WHERE length(w) >= 2
)
SELECT substr(w, CAST(i AS INT), 2) AS pair, CAST(count(*) AS BIGINT) AS n
FROM pos
GROUP BY pair
ORDER BY n DESC, pair ASC
LIMIT {_CENSUS_TOP}
"""


def _seg_rows(t: pa.Table) -> pa.Table:
    """word -> initial segmentation (list of codepoint symbols)."""
    words = t.column("word").to_pylist()
    return pa.table(
        {
            "seg": pa.array([list(w) for w in words], pa.list_(pa.string())),
            "n": pc.cast(t.column("n"), pa.int64()),
        }
    )


def _pair_partial(t: pa.Table) -> pa.Table:
    """(seg, n) rows -> (pair_key, n) partials. The pair is packed as
    ``left\\x00right`` for a single-key groupby (symbols never contain NUL
    on real text; a collision could only merge two census keys, never
    crash, and the trainer's exactness contract is pytest-scoped)."""
    segs = t.column("seg").to_pylist()
    ns = t.column("n").to_pylist()
    census: dict[str, int] = {}
    for s, c in zip(segs, ns):
        for i in range(len(s) - 1):
            k = s[i] + "\x00" + s[i + 1]
            census[k] = census.get(k, 0) + int(c)
    return pa.table(
        {
            "pk": pa.array(list(census.keys()), pa.string()),
            "n": pa.array(list(census.values()), pa.int64()),
        }
    )


def _block_best(t: pa.Table) -> pa.Table:
    """Post-groupby block (disjoint, fully aggregated keys) -> its single
    best row under (n desc, pair asc), so the driver folds one row/block."""
    if t.num_rows == 0:
        return t
    n = t.column("n").to_numpy(zero_copy_only=False)
    best = int(n.max())
    cand = t.filter(pc.equal(t.column("n"), pa.scalar(best, pa.int64())))
    keys = cand.column("pk").to_pylist()
    k = min(keys)
    return pa.table({"pk": pa.array([k]), "n": pa.array([best], pa.int64())})


def bpe_train_merges(sf_dir: str, n_merges: int = 8) -> Dataset:
    """Train ``n_merges`` BPE merges; returns (merge_idx, left, right, n)
    in merge order. rows-only entry: the iterative argmax is not
    SQL-expressible; pytest gates it against an independent pure-Python
    reference (tests/ref_bpe.py).

    Scale shape: corpus -> word census is ONE corpus-sized pass + one
    (word, count) exchange; the per-round state is the vocabulary
    segmentation Dataset (distinct words), re-materialized each round so
    lineage stays flat. Per round: one vocab-sized streaming pass for the
    pair census, one (pair, n) exchange, one vocab-sized merge map. The
    driver holds one row per block (block bests) and the merge table."""
    docs = rd.read_parquet(_pq(sf_dir, "documents"), columns=["text"])
    vocab = (
        docs.map_batches(_word_counts_batch, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )
    segs = vocab.map_batches(_seg_rows, batch_format="pyarrow").materialize()

    merges: list[tuple[str, str, int]] = []
    out_schema = pa.schema(
        [
            ("merge_idx", pa.int64()),
            ("left", pa.string()),
            ("right", pa.string()),
            ("n", pa.int64()),
        ]
    )
    for _ in range(n_merges):
        census = (
            segs.map_batches(_pair_partial, batch_format="pyarrow")
            .groupby("pk")
            .aggregate(Sum("n", alias_name="n"))
        )
        bests = census.map_batches(_block_best, batch_format="pyarrow").take_all()
        if not bests:
            break
        best_n = max(r["n"] for r in bests)
        pk = min(r["pk"] for r in bests if r["n"] == best_n)
        left, right = pk.split("\x00", 1)
        merges.append((left, right, best_n))

        def apply(t: pa.Table, left=left, right=right) -> pa.Table:
            z = left + right
            segs_in = t.column("seg").to_pylist()
            out = []
            for s in segs_in:
                res, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                        res.append(z)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                out.append(res)
            return pa.table(
                {"seg": pa.array(out, pa.list_(pa.string())), "n": t.column("n")}
            )

        segs = segs.map_batches(apply, batch_format="pyarrow").materialize()

    tbl = pa.table(
        {
            "merge_idx": pa.array(range(len(merges)), pa.int64()),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
            "n": pa.array([m[2] for m in merges], pa.int64()),
        },
        schema=out_schema,
    )
    return rd.from_arrow(tbl)
