"""Join strategies for Ray Data, chosen by side size (SURVEY.md §2.4).

* ``broadcast_join`` — the small side (dimension table / key set) is put in
  the object store ONCE with ``ray.put`` and read by each actor in
  ``__init__`` (never re-shipped per batch); the join is a per-batch pandas
  merge. No shuffle. This is the right plan whenever one side fits in a
  worker's heap (reference analog: the sheet key-match scan M9,
  save-to-google-sheet.ts:155-170, is a semi-join against a single key).
* ``semi_join_filter`` / ``anti_join_filter`` — broadcast key set +
  vectorized ``pc.is_in`` inside map_batches.
* Large × large — use ``Dataset.join`` (hash-partitioned shuffle join,
  available in this Ray version); pick ``num_partitions`` ≈ total rows /
  (a few M) and co-partition on the same key across stages.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset


# per-worker-process cache of deserialized broadcast tables (keyed by the
# ObjectRef hex; bounded). Task-mode broadcast: an actor pool here pays a
# multi-second pool spin-up per join and reserves CPU slots while idle
# (round-1 measurement); stateless tasks hit the plasma-local object after
# the first fetch and the deserialized frame is memoized per process.
_BCAST_CACHE: dict = {}
_BCAST_CACHE_MAX = 4


def broadcast_join(
    ds: Dataset,
    small: pd.DataFrame | pa.Table,
    *,
    left_on: str,
    right_on: str | None = None,
    how: str = "inner",
    concurrency: tuple[int, int] | int | None = None,  # kept for API compat
    batch_size: int = 65536,
) -> Dataset:
    """Join ``ds`` against a driver-side small table without a shuffle.

    The small side is put in the object store ONCE; each worker process
    fetches it once (plasma-local thereafter) and memoizes the deserialized
    frame — no actor pool, no per-batch re-ship."""
    if isinstance(small, pa.Table):
        small = small.to_pandas()
    r_on = right_on or left_on
    # SQL join semantics: NULL never matches NULL — but pandas merge treats
    # NaN keys as EQUAL. Dropping null keys from the small side restores
    # three-valued behavior for every `how` (a null-key big-side row then
    # matches nothing, and still survives a left join).
    small = small[small[r_on].notna()]
    ref = ray.put(small)

    def merge(batch: pd.DataFrame, _ref=ref, _l=left_on, _r=r_on, _how=how) -> pd.DataFrame:
        key = _ref.hex()
        sm = _BCAST_CACHE.get(key)
        if sm is None:
            if len(_BCAST_CACHE) >= _BCAST_CACHE_MAX:
                _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
            sm = ray.get(_ref)
            _BCAST_CACHE[key] = sm
        out = batch.merge(sm, how=_how, left_on=_l, right_on=_r, suffixes=("", "_r"))
        if _r != _l and _r in out.columns:
            out = out.drop(columns=[_r])
        return out

    return ds.map_batches(merge, batch_format="pandas", batch_size=batch_size)


def semi_join_filter(ds: Dataset, col: str, keys) -> Dataset:
    """Keep rows whose ``col`` is in the broadcast key set (no shuffle).

    A NULL in ``keys`` is dropped: x IN (..., NULL) can never be TRUE via
    the NULL member, and a NULL left key never matches (pc.is_in mirrors)."""
    value_set = pa.array(sorted(k for k in set(keys) if k is not None))

    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column(col), value_set=value_set))

    return ds.map_batches(fn, batch_format="pyarrow")


def anti_join_filter(ds: Dataset, col: str, keys) -> Dataset:
    """Drop rows whose ``col`` is in the broadcast key set (resume-manifest
    anti-join pattern, SURVEY.md §2.4)."""
    # NULL members dropped; SQL NOT-IN-with-NULL-subquery (empty result) is
    # the CALLER's branch to take (see users_no_purchase)
    value_set = pa.array(sorted(k for k in set(keys) if k is not None))

    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.invert(pc.is_in(batch.column(col), value_set=value_set))
        )

    return ds.map_batches(fn, batch_format="pyarrow")


_BROADCAST_JOIN_MAX_BYTES = 64 * 1024 * 1024


def auto_join(
    big: Dataset,
    small: Dataset,
    *,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    broadcast_max_bytes: int = _BROADCAST_JOIN_MAX_BYTES,
    right_schema: pa.Schema | None = None,
) -> Dataset:
    """Cost-based join: broadcast the right side when it fits, else shuffle.

    The right side is pinned and sized; under the threshold it is collected
    and shipped via ``ray.put`` (no shuffle — the dominant cost of a
    hash-partitioned join at dimension-table sizes is spinning up its
    aggregator pool, ~3-5 s on this box for a join that then takes
    milliseconds), otherwise both sides go through ``hash_join``. At real
    scale a planner would use catalog stats instead of a materialize; the
    switch point is what matters.

    ``right_schema``: Ray 2.49 drops 0-row blocks at materialize, so a
    LEGITIMATELY empty small side arrives with no schema at all and the
    pandas merge would KeyError on the join key. Callers whose small side
    can be empty (e.g. a HAVING filter that kills every group) pass the
    expected schema; the empty broadcast frame is then typed and the join
    degrades to the correct empty (inner) / pass-through (left) result."""
    small = small.materialize()
    size = small.size_bytes()
    if size is None:  # unknown -> assume big; 0 (legitimately empty) broadcasts
        size = broadcast_max_bytes + 1
    if size <= broadcast_max_bytes:
        df = small.to_pandas()
        if df.shape[1] == 0 and right_schema is not None:
            df = right_schema.empty_table().to_pandas()
        return broadcast_join(big, df, left_on=on, right_on=right_on, how=how)
    return hash_join(big, small, on=on, right_on=right_on, how=how)


def semi_join_ds(
    ds: Dataset, keys: Dataset, *, on: str, right_on: str | None = None,
    num_partitions: int | None = None,
) -> Dataset:
    """Distributed semi-join: keep ``ds`` rows whose ``on`` appears in the
    ``keys`` dataset — a ``left_semi`` hash join, for key sets too large to
    broadcast (the 10^12-row sibling of ``semi_join_filter``)."""
    return hash_join(
        ds, keys, on=on, right_on=right_on, how="left_semi",
        num_partitions=num_partitions,
    )


def anti_join_ds(
    ds: Dataset, keys: Dataset, *, on: str, right_on: str | None = None,
    num_partitions: int | None = None,
) -> Dataset:
    """Distributed anti-join: drop ``ds`` rows whose ``on`` appears in the
    ``keys`` dataset (``left_anti`` hash join; no driver key set)."""
    return hash_join(
        ds, keys, on=on, right_on=right_on, how="left_anti",
        num_partitions=num_partitions,
    )


_TARGET_JOIN_PARTITION_BYTES = 256 * 1024 * 1024


def hash_join(
    left: Dataset,
    right: Dataset,
    *,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    num_partitions: int | None = None,
) -> Dataset:
    """Large × large: hash-partitioned shuffle join via ``Dataset.join``.

    Both sides are repartitioned on the key. ``num_partitions`` defaults to
    a size-based estimate (bigger side's in-memory bytes / 256 MB, floored
    at the cluster CPU count) so each join partition fits a worker's heap
    and every core has work. Skewed keys should be salted before calling
    (append a salt column to both sides).
    """
    if num_partitions is None:
        try:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        # size estimates are free when known (metadata); fall back to cpus
        try:
            big = max(left.size_bytes() or 0, right.size_bytes() or 0)
        except Exception:
            big = 0
        num_partitions = max(
            min(cpus, 64), (big + _TARGET_JOIN_PARTITION_BYTES - 1) // _TARGET_JOIN_PARTITION_BYTES
        )
    return left.join(
        right,
        join_type=how,
        num_partitions=int(num_partitions),
        on=(on,),
        right_on=(right_on or on,),
    )


def salted_hash_join(
    left: Dataset,
    right: Dataset,
    *,
    on: str,
    right_on: str | None = None,
    salts: int = 8,
    num_partitions: int | None = None,
) -> Dataset:
    """Skew-resistant hash join: a hot key would land its entire row mass in
    ONE join partition of ``hash_join`` (the straggler that burns a node at
    10^8 rows per key). Salting splits every left key across ``salts``
    sub-partitions (a per-batch round-robin salt column — any assignment is
    correct, the join result never depends on which salt a row gets) and
    REPLICATES the right side once per salt, so the join key becomes
    (key, salt) and the hot key's mass spreads ~uniformly over ``salts``
    partitions. Cost: right-side traffic × ``salts`` — use when the left is
    skewed and the right is the smaller side (the classic fact × dimension
    skew shape).

    Inner/left joins only (a right/full join would multiply unmatched
    right rows once per salt)."""
    import numpy as np

    if right_on is None:
        right_on = on

    def add_salt(t: pa.Table) -> pa.Table:
        s = np.arange(t.num_rows, dtype=np.int64) % salts
        return t.append_column("__salt", pa.array(s, pa.int64()))

    def replicate(t: pa.Table) -> pa.Table:
        parts = []
        for i in range(salts):
            parts.append(
                t.append_column(
                    "__salt", pa.array(np.full(t.num_rows, i, np.int64), pa.int64())
                )
            )
        return pa.concat_tables(parts)

    lsalted = left.map_batches(add_salt, batch_format="pyarrow")
    rsalted = right.map_batches(replicate, batch_format="pyarrow")
    if num_partitions is None:
        # size-based like hash_join, but floored at ``salts`` rather than
        # the CPU count: each join partition costs ~100s of ms of
        # aggregator setup, so a dimension-scale demo join at 32
        # partitions pays ~2x the wall of an 8-partition plan (measured
        # 5.7->2.7 s at sf0.1); at real scale the byte term dominates
        try:
            big = max(left.size_bytes() or 0, right.size_bytes() or 0)
        except Exception:
            big = 0
        num_partitions = max(
            salts, (big + _TARGET_JOIN_PARTITION_BYTES - 1) // _TARGET_JOIN_PARTITION_BYTES
        )
    joined = lsalted.join(
        rsalted,
        join_type="inner",
        num_partitions=int(num_partitions),
        on=(on, "__salt"),
        right_on=(right_on, "__salt"),
    )
    return joined.map_batches(
        lambda t: t.drop_columns([c for c in t.column_names if c.startswith("__salt")]),
        batch_format="pyarrow",
    )
