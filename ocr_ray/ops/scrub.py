"""PII scrub / redaction over text corpora.

A large-scale training-data pipeline redacts contact-like substrings
(emails, IPv4 addresses, phone numbers) before anything else sees the text.
The kernel is fully vectorized — one `pc.count_substring_regex` +
`pc.replace_substring_regex` pass per pattern, zero Python per-row work —
and both Arrow and DuckDB run RE2 with identical leftmost-non-overlapping
global-replace semantics, so the op is driver-verifiable end to end
(counts, and the scrubbed text itself, hash-gated).

The shared ``documents`` table is digit-free word salad, so the gate runs
over a deterministic contact-rich fixture (same pattern as the media
fixture: generated once per sf, the oracle SQL reads the same parquet).

Reference analog: the credential normalizer's regex rewrite
(extract-data-from-pdf.ts:103-112) is the reference's only
regex-replace-over-payload op; this generalizes it to a data-plane stage.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset

# RE2-safe patterns (no lookaround/backrefs), written identically for Arrow
# and DuckDB — parity by construction. Applied IN ORDER; each pattern's
# count is taken on the text state it sees (after the previous replaces).
SCRUB_RULES: list[tuple[str, str, str]] = [
    ("n_emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("n_ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("n_phones", r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
]


def scrub_batch(batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Vectorized scrub of one Arrow batch: sequential count+replace per
    rule. Stateless — regexes are RE2-compiled once per process by Arrow's
    kernel cache, so no actor pool is needed."""
    t = pc.coalesce(batch.column(text_col), pa.scalar("", pa.string()))
    cols: dict = {id_col: batch.column(id_col)}
    counts: dict[str, pa.Array] = {}
    for name, pat, repl in SCRUB_RULES:
        counts[name] = pc.cast(pc.count_substring_regex(t, pat), pa.int64())
        t = pc.replace_substring_regex(t, pat, repl)
    cols["clean_text"] = t
    cols.update(counts)
    return pa.table(cols)


def scrub_dataset(ds: Dataset, *, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    import functools

    return ds.map_batches(
        functools.partial(scrub_batch, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        batch_size=2048,
    )


# ---------------------------------------------------------------------------
# deterministic contact-rich fixture (no external data; scaled per sf)
# ---------------------------------------------------------------------------

_FILLER = (
    "meeting notes follow up with the team about the quarterly report and "
    "the deployment schedule please reach out if anything is unclear"
).split()


def synth_contacts_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic rows mixing filler words with planted emails / IPv4s /
    phone numbers (counts per row derived from the row index, so the
    expected totals are closed-form checkable in tests)."""
    ids, texts = [], []
    for i in range(n):
        x = (seed << 16) ^ i
        words = [_FILLER[(x + j) % len(_FILLER)] for j in range(8 + i % 9)]
        if i % 2 == 0:
            words.insert(1, f"user{i}@example{i % 7}.com")
        if i % 3 == 0:
            words.insert(3, f"10.{i % 256}.{(i * 7) % 256}.{(i * 13) % 256}")
        if i % 5 == 0:
            words.append(f"+{1 + i % 99}-{100 + i % 900:03d}-{200 + i % 800:03d}-{1000 + i % 9000:04d}")
        ids.append(i)
        texts.append(" ".join(words))
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())})


def contacts_rows_for_sf(sf_dir: str) -> int:
    from ocr_ray.sources.transcripts import n_convs_for_sf

    return max(50, n_convs_for_sf(sf_dir) // 5)


def ensure_contacts_fixture(n: int, seed: int = 42, root: str = "/tmp/ocr_ray_fixtures") -> str:
    """Write (once, cached) the contact fixture as parquet so the SQL oracle
    and the Ray query read the same bytes."""
    import shutil

    import pyarrow.parquet as pq

    out = os.path.join(root, f"contacts_s{seed}_n{n}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(synth_contacts_table(n, seed), os.path.join(tmp, "part-0.parquet"))
    shutil.rmtree(out, ignore_errors=True)
    os.replace(tmp, out)
    open(marker, "w").close()
    return out


def scrub_docs(sf_dir: str) -> Dataset:
    """queries() entry: contact fixture -> vectorized scrub. The scrubbed
    text is an output column, so the driver's value hash gates every byte of
    every redaction, not just the counts."""
    path = ensure_contacts_fixture(contacts_rows_for_sf(sf_dir))
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    return scrub_dataset(ds)


def scrub_docs_sql(sf_dir: str) -> str:
    """Independent DuckDB mirror: same RE2 patterns, same sequential
    count-then-replace order, over the same fixture parquet."""
    path = ensure_contacts_fixture(contacts_rows_for_sf(sf_dir))
    sql = f"SELECT doc_id, coalesce(text, '') AS t FROM read_parquet('{path}/*.parquet')"
    carried: list[str] = []
    for name, pat, repl in SCRUB_RULES:
        pat_sql = pat.replace("'", "''")
        keep = (", " + ", ".join(carried)) if carried else ""
        sql = (
            f"SELECT doc_id{keep}, "
            f"CAST(len(regexp_extract_all(t, '{pat_sql}')) AS BIGINT) AS {name}, "
            f"regexp_replace(t, '{pat_sql}', '{repl}', 'g') AS t FROM ({sql})"
        )
        carried.append(name)
    return (
        f"SELECT doc_id, t AS clean_text, {', '.join(carried)} FROM ({sql})"
    )


# ---------------------------------------------------------------------------
# k-anonymity suppression over quasi-identifiers
# ---------------------------------------------------------------------------

_K_ANON = 5


def _pq(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def anonymize_customers(sf_dir: str, *, k: int = _K_ANON) -> Dataset:
    """k-anonymity pass over the customer quasi-identifiers
    (c_nationkey, c_mktsegment): rows whose QI group has fewer than ``k``
    members get BOTH identifiers suppressed to NULL — the standard
    re-identification guard a privacy-preserving corpus release runs after
    PII scrubbing (generalize-or-suppress; this op is the suppress leg).

    Scale plan: the QI census is bounded by the QI DOMAIN (|nations| x
    |segments| + null combos), not the row count — per-batch partial
    counts on null-ENCODED keys shrink each batch to <= domain rows, the
    global groupby output is tiny, and the (group -> count) table is
    broadcast once via ``ray.put`` and pandas-merged per batch (no NaN-key
    ambiguity: keys are (value-filled, is-null) pairs). A NULL QI value is
    a real partition, exactly like SQL's ``COUNT(*) OVER (PARTITION BY)``.
    """
    import numpy as np
    import pandas as pd
    import ray

    cust = rd.read_parquet(
        _pq(sf_dir, "customer"), columns=["c_custkey", "c_nationkey", "c_mktsegment"]
    )

    def encode(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_nationkey": t.column("c_nationkey"),
                "c_mktsegment": t.column("c_mktsegment"),
                "k_nat": pc.fill_null(pc.cast(t.column("c_nationkey"), pa.int64()), 0),
                "n_nat": pc.cast(pc.is_null(t.column("c_nationkey")), pa.int8()),
                "k_seg": pc.fill_null(t.column("c_mktsegment"), ""),
                "n_seg": pc.cast(pc.is_null(t.column("c_mktsegment")), pa.int8()),
            }
        )

    enc = cust.map_batches(encode, batch_format="pyarrow")
    keys = ["k_nat", "n_nat", "k_seg", "n_seg"]

    def partial(t: pa.Table) -> pa.Table:
        t = t.append_column("__one", pa.array(np.ones(t.num_rows, np.int64)))
        g = t.select(keys + ["__one"]).group_by(keys).aggregate([("__one", "sum")])
        return g.rename_columns(keys + ["cnt"])

    from ray.data.aggregate import Sum as _Sum

    census_rows = (
        enc.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(_Sum("cnt", alias_name="cnt"))
        .take_all()
    )
    census = pd.DataFrame(census_rows) if census_rows else pd.DataFrame(
        {c: [] for c in keys + ["cnt"]}
    )
    ref = ray.put(census)

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        cen = ray.get(ref)
        out = df.merge(cen, how="left", on=keys)
        ok = out["cnt"].to_numpy() >= k
        res = pd.DataFrame(
            {
                "c_custkey": out["c_custkey"],
                "suppressed": ~ok,
                # numeric QI suppresses to a typed SENTINEL (-1), not NULL:
                # the gate's value compare is NaN-hostile, and a sentinel
                # keeps the column int32 end to end (CASE ... ELSE -1)
                "c_nationkey_anon": out["c_nationkey"].where(ok, other=-1),
                "c_mktsegment_anon": out["c_mktsegment"].where(ok, other=None),
            }
        )
        return res

    def restore_types(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "suppressed": pc.cast(t.column("suppressed"), pa.bool_()),
                "c_nationkey_anon": pc.cast(t.column("c_nationkey_anon"), pa.int32()),
                "c_mktsegment_anon": t.column("c_mktsegment_anon"),
            }
        )

    return enc.map_batches(apply, batch_format="pandas").map_batches(
        restore_types, batch_format="pyarrow"
    )


ANONYMIZE_CUSTOMERS_SQL = """
SELECT c_custkey,
       cnt < 5 AS suppressed,
       CASE WHEN cnt >= 5 THEN c_nationkey ELSE -1 END AS c_nationkey_anon,
       CASE WHEN cnt >= 5 THEN c_mktsegment END AS c_mktsegment_anon
FROM (SELECT c_custkey, c_nationkey, c_mktsegment,
             COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS cnt
      FROM customer) t
"""


# ---------------------------------------------------------------------------
# l-diversity audit over the k-anonymity quasi-identifier groups
# ---------------------------------------------------------------------------

_L_DIVERSITY = 3


def custs_ldiversity_audit(sf_dir: str, *, l_min: int = _L_DIVERSITY) -> Dataset:
    """l-diversity audit: per quasi-identifier group (c_nationkey,
    c_mktsegment), the group size and the count of DISTINCT sensitive
    values (account balance, in exact cents) — flagging groups where the
    sensitive attribute has fewer than ``l`` distinct values. k-anonymity
    alone (``anonymize_customers``) stops re-identification but not
    attribute disclosure: a group of 50 records that all share one salary
    leaks it to anyone who can place a person in the group; this audit is
    the standard follow-up check (Machanavajjhala et al. 2007).

    Plan: per-batch DISTINCT (QI, sensitive) triples with group-size
    partials (arrow ``group_by``), ONE null-safe keyed groupby summing
    sizes and a second tiny QI-keyed reduce counting surviving distinct
    triples — the shuffle carries at most |QI domain × distinct balances|
    rows per batch, never customers.

    Contract (mirrored in SQL): NULL QI values form real groups
    (null-safe keys); COUNT(DISTINCT sensitive) skips NULL balances;
    ``diverse`` = n_sensitive >= l."""
    import numpy as np
    from ray.data.aggregate import Sum

    from ocr_ray.functions.nullsafe import decode_null_keys, encode_null_keys
    from ocr_ray.functions.scalars import to_cents

    cust = rd.read_parquet(
        _pq(sf_dir, "customer"), columns=["c_nationkey", "c_mktsegment", "c_acctbal"]
    )
    keys = ["c_nationkey", "c_mktsegment"]

    def partial(t: pa.Table) -> pa.Table:
        sens = to_cents(t.column("c_acctbal"))
        # sentinel for NULL sensitive: carried as its own triple so group
        # sizes stay exact, excluded from the distinct count downstream
        g = pa.table(
            {
                "c_nationkey": t.column("c_nationkey"),
                "c_mktsegment": t.column("c_mktsegment"),
                "sens": pc.fill_null(sens, pa.scalar(np.iinfo(np.int64).min, pa.int64())),
            }
        )
        g = encode_null_keys(g, keys)
        enc_keys = [c for c in g.column_names if c != "sens"]
        out = g.group_by(enc_keys + ["sens"]).aggregate([([], "count_all")])
        return out.rename_columns(enc_keys + ["sens", "cnt"])

    enc_keys = keys + [f"__n_{k}" for k in keys]
    triples = (
        cust.map_batches(partial, batch_format="pyarrow")
        .groupby(enc_keys + ["sens"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    _SENT = np.iinfo(np.int64).min

    def reduce_partial(t: pa.Table) -> pa.Table:
        real = pc.cast(
            pc.not_equal(t.column("sens"), pa.scalar(_SENT, pa.int64())), pa.int64()
        )
        g = pa.table(
            {
                **{k: t.column(k) for k in enc_keys},
                "group_n": t.column("cnt"),
                "n_sensitive": real,
            }
        )
        return (
            g.group_by(enc_keys)
            .aggregate([("group_n", "sum"), ("n_sensitive", "sum")])
            .rename_columns(enc_keys + ["group_n", "n_sensitive"])
        )

    per_group = (
        triples.map_batches(reduce_partial, batch_format="pyarrow")
        .groupby(enc_keys)
        .aggregate(
            Sum("group_n", alias_name="group_n"),
            Sum("n_sensitive", alias_name="n_sensitive"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        t = decode_null_keys(t, keys)
        return pa.table(
            {
                # source column is int32; Ray's shuffle widened it
                "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int32()),
                "c_mktsegment": t.column("c_mktsegment"),
                "group_n": pc.cast(t.column("group_n"), pa.int64()),
                "n_sensitive": pc.cast(t.column("n_sensitive"), pa.int64()),
                "diverse": pc.greater_equal(
                    t.column("n_sensitive"), pa.scalar(l_min, pa.int64())
                ),
            }
        )

    return per_group.map_batches(finish, batch_format="pyarrow")


CUSTS_LDIVERSITY_AUDIT_SQL = f"""
SELECT c_nationkey, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS group_n,
       CAST(COUNT(DISTINCT CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS n_sensitive,
       COUNT(DISTINCT CAST(ROUND(c_acctbal * 100) AS BIGINT)) >= {_L_DIVERSITY}
         AS diverse
FROM customer
GROUP BY c_nationkey, c_mktsegment
"""
