"""Per-turn digest stage — deterministic analog of the reference's
summarization flow (``summarize-pdf-data.ts:28-45``: record -> one summary
string via an LLM prompt). Here: first sentence + top-k salient terms,
computed from the extracted ``main_text`` (no model, exact reproducibility).
"""

from __future__ import annotations

import re

import pyarrow as pa
from ray.data import Dataset

_SENT_END = re.compile(r"(?<=[.!?])\s+")
_WORD = re.compile(r"[^\W\d_]{3,}", re.U)
# tiny english-ish stoplist; deterministic frozen set
_STOP = frozenset(
    "the and of to a in is it that for on with as was at this are be from "
    "les des une dans est que pour der die das und mit von the".split()
)

_TOP_K = 5
_MAX_FIRST = 160


def summarize_text(text: str) -> str:
    """First sentence (truncated) + top-k frequent non-stopword terms.

    Term ranking is (count desc, term asc) — fully deterministic."""
    if not text:
        return ""
    first = _SENT_END.split(text, maxsplit=1)[0].strip()
    if len(first) > _MAX_FIRST:
        first = first[: _MAX_FIRST - 1].rstrip() + "…"
    counts: dict[str, int] = {}
    for w in _WORD.findall(text.lower()):
        if w not in _STOP:
            counts[w] = counts.get(w, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:_TOP_K]
    terms = ", ".join(w for w, _ in top)
    return f"{first} [{terms}]" if terms else first


class Summarizer:
    """Actor-pool stage: adds a ``summary`` column from ``main_text``."""

    def __init__(self) -> None:
        summarize_text("warm up the compiled patterns.")

    def __call__(self, batch: pa.Table) -> pa.Table:
        sums = [summarize_text(t) for t in batch.column("main_text").to_pylist()]
        return batch.append_column("summary", pa.array(sums, pa.string()))


def summarize_dataset(extracted: Dataset, **kw) -> Dataset:
    return extracted.map_batches(
        Summarizer,
        batch_format="pyarrow",
        batch_size=kw.pop("batch_size", 256),
        concurrency=kw.pop("concurrency", (1, 16)),
        num_cpus=1,
    )
