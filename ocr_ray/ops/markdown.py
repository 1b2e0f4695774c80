"""Markdown main-content extraction engine.

The fourth markup family next to the flagship's html/pdf/plain engines
(SURVEY §2.10's strategy axis): strip markdown syntax down to the running
text, counting structural elements on the way. Like ``ops/scrub``, the
kernel is a fixed ordered sequence of RE2 count+replace passes run fully
vectorized through Arrow — and DuckDB runs the same RE2 patterns (inline
``(?m)`` flags, identical replacement strings), so the extracted text is
driver-verifiable byte for byte over a deterministic markdown fixture.

Reference analog: engine dispatch + per-engine extraction
(extract-data-from-pdf.ts:96-154); the markdown rules generalize the
HTML engine's tag-strip to markdown markup.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset

# Ordered RE2 rules: (count_column_or_None, pattern, replacement).
# Order matters and is part of the contract: images before links (the
# image syntax embeds the link syntax), list markers before emphasis
# (a leading "* " is a bullet, not an italic opener).
MD_RULES: list[tuple[str | None, str, str]] = [
    ("n_images", r"!\[([^\]]*)\]\(([^)]*)\)", r"\1"),
    ("n_links", r"\[([^\]]*)\]\(([^)]*)\)", r"\1"),
    ("n_headers", r"(?m)^#{1,6}[ \t]+", ""),
    (None, r"(?m)^[-*+][ \t]+", ""),  # bullet markers
    (None, r"(?m)^>[ \t]?", ""),  # blockquote markers
    (None, r"\*\*([^*]+)\*\*", r"\1"),  # bold
    (None, r"\*([^*]+)\*", r"\1"),  # italic
    (None, r"`([^`]+)`", r"\1"),  # inline code
]


def extract_markdown_batch(
    batch: pa.Table, *, text_col: str = "md", id_col: str = "doc_id"
) -> pa.Table:
    """Vectorized markdown strip of one Arrow batch: sequential
    count+replace per rule (counts observe the text state after the
    preceding rules, mirrored exactly in the SQL)."""
    t = pc.coalesce(batch.column(text_col), pa.scalar("", pa.string()))
    counts: dict[str, pa.Array] = {}
    for name, pat, repl in MD_RULES:
        if name is not None:
            counts[name] = pc.cast(pc.count_substring_regex(t, pat), pa.int64())
        t = pc.replace_substring_regex(t, pat, repl)
    cols: dict = {id_col: batch.column(id_col), "main_text": t}
    cols.update(counts)
    return pa.table(cols)


# deterministic markdown fixture ---------------------------------------------

_MD_WORDS = "alpha beta gamma delta epsilon zeta eta theta".split()


def synth_markdown_table(n: int, seed: int = 42) -> pa.Table:
    ids, texts = [], []
    for i in range(n):
        x = (seed << 16) ^ i
        w = lambda j: _MD_WORDS[(x + j) % len(_MD_WORDS)]  # noqa: E731
        lines = [f"# {w(0)} report {i}"]
        if i % 2 == 0:
            lines.append(f"Intro **{w(1)}** and *{w(2)}* text.")
        if i % 3 == 0:
            lines.append(f"See [the {w(3)} doc](https://example.com/{i}) now.")
        if i % 4 == 0:
            lines.append(f"![diagram {i}](img/{i}.png)")
        if i % 5 == 0:
            lines.append(f"> quoted {w(4)} line")
        lines.append(f"- item {w(5)}")
        lines.append(f"Plain `{w(6)}` closing line {i}.")
        if i % 7 == 0:
            lines.append(f"## sub {w(7)}")
        ids.append(i)
        texts.append("\n".join(lines))
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "md": pa.array(texts, pa.string())})


def ensure_markdown_fixture(n: int, seed: int = 42, root: str = "/tmp/ocr_ray_fixtures") -> str:
    import shutil

    import pyarrow.parquet as pq

    out = os.path.join(root, f"markdown_s{seed}_n{n}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(synth_markdown_table(n, seed), os.path.join(tmp, "part-0.parquet"))
    shutil.rmtree(out, ignore_errors=True)
    os.replace(tmp, out)
    open(marker, "w").close()
    return out


def markdown_rows_for_sf(sf_dir: str) -> int:
    from ocr_ray.sources.transcripts import n_convs_for_sf

    return max(60, n_convs_for_sf(sf_dir) // 5)


def extract_markdown(sf_dir: str) -> Dataset:
    """queries() entry: markdown fixture -> stripped main text + element
    counts. The extracted text is an output column — the driver's value
    hash gates every stripped byte."""
    path = ensure_markdown_fixture(markdown_rows_for_sf(sf_dir))
    ds = rd.read_parquet(path, columns=["doc_id", "md"])
    return ds.map_batches(extract_markdown_batch, batch_format="pyarrow", batch_size=2048)


def extract_markdown_sql(sf_dir: str) -> str:
    """Independent DuckDB mirror: same RE2 rules in the same order over the
    same fixture parquet (counts taken on the pre-rule text state)."""
    path = ensure_markdown_fixture(markdown_rows_for_sf(sf_dir))
    sql = f"SELECT doc_id, coalesce(md, '') AS t FROM read_parquet('{path}/*.parquet')"
    carried: list[str] = []
    for name, pat, repl in MD_RULES:
        pat_sql = pat.replace("'", "''").replace("\\", "\\")
        repl_sql = repl
        keep = (", " + ", ".join(carried)) if carried else ""
        count_expr = (
            f"CAST(len(regexp_extract_all(t, '{pat_sql}')) AS BIGINT) AS {name}, "
            if name is not None
            else ""
        )
        sql = (
            f"SELECT doc_id{keep}, {count_expr}"
            f"regexp_replace(t, '{pat_sql}', '{repl_sql}', 'g') AS t FROM ({sql})"
        )
        if name is not None:
            carried.append(name)
    return f"SELECT doc_id, t AS main_text, {', '.join(carried)} FROM ({sql})"
