"""Conversation-level (cross-turn) operators.

The per-turn engines are deliberately turn-local (the v1 equality
contract); these operators add the conversation dimension via
``groupby(conv_id)`` co-location — the pattern SURVEY §2.4 prescribes for
heuristics that need neighboring turns (a co-location shuffle, not a join).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset


def conversation_stats(transcripts: Dataset) -> Dataset:
    """Per-conversation rollup: turn counts by role, byte totals, wall span.

    Pre-aggregates per batch (conversations never straddle... they MAY
    straddle batches — the partials are merged by the final groupby, so
    correctness does not depend on co-location; only the final groupby
    moves one small row per (batch, conv)."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "conv_id": t.column("conv_id"),
                "n_turns": pa.array([1] * t.num_rows, pa.int64()),
                "n_user_turns": pc.cast(pc.equal(t.column("role"), "user"), pa.int64()),
                "bytes_total": pc.cast(
                    pc.binary_length(t.column("text").cast(pa.binary())), pa.int64()
                ),
                "ts_min": pc.cast(t.column("ts"), pa.int64()),
                "ts_max": pc.cast(t.column("ts"), pa.int64()),
            }
        )
        g = out.group_by(["conv_id"]).aggregate(
            [
                ("n_turns", "sum"),
                ("n_user_turns", "sum"),
                ("bytes_total", "sum"),
                ("ts_min", "min"),
                ("ts_max", "max"),
            ]
        )
        return g.rename_columns(
            ["conv_id", "n_turns", "n_user_turns", "bytes_total", "ts_min", "ts_max"]
        )

    from ray.data.aggregate import Max, Min, Sum

    agg = (
        transcripts.map_batches(partial, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(
            Sum("n_turns", alias_name="n_turns"),
            Sum("n_user_turns", alias_name="n_user_turns"),
            Sum("bytes_total", alias_name="bytes_total"),
            Min("ts_min", alias_name="ts_min"),
            Max("ts_max", alias_name="ts_max"),
        )
    )

    def span(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "span_us", pc.subtract(t.column("ts_max"), t.column("ts_min"))
        ).drop_columns(["ts_min", "ts_max"])

    return agg.map_batches(span, batch_format="pyarrow")


def dialogue_pairs(extracted: Dataset) -> Dataset:
    """Cross-turn context view: each turn paired with the previous turn's
    role and extracted text head — a ``groupby(conv_id)`` co-located scan
    in turn order (the conversation-context pattern for engines that need
    neighbors)."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("turn_idx")
        prev_role = np.roll(g["role"].to_numpy(), 1)
        prev_head = np.roll(
            g["main_text"].str.slice(0, 80).to_numpy(), 1
        )
        prev_role[0] = ""
        prev_head[0] = ""
        return pd.DataFrame(
            {
                "conv_id": g["conv_id"].to_numpy(),
                "turn_idx": g["turn_idx"].to_numpy(),
                "role": g["role"].to_numpy(),
                "prev_role": prev_role,
                "prev_text_head": prev_head,
            }
        )

    slim = extracted.select_columns(["conv_id", "turn_idx", "role", "main_text"])
    return slim.groupby("conv_id").map_groups(pairs, batch_format="pandas")
