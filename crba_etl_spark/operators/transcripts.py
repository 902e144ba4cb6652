"""Transcript-native operators over reduced conversation state.

The CDC engine's final table IS a conversation transcript —
(conv_id, turn_idx, role, text, tool, ts) — and a training pipeline
over transcripts needs per-conversation shapes the row-level operators
don't give: corpus statistics keyed by conversation, and structural QA
(role alternation, turn-index gaps) before packing/export. The
reference computes its per-entity roll-ups with pandas groupbys one
process at a time (etl/transformation/scaler.py — per-indicator stats;
validation/ — per-file completeness reports); these are the distributed
forms over the conversation key.

Plan shape (both operators): the input is the already-reduced final
state (one row per (conv_id, turn_idx)); everything here keys by
conv_id only, so the whole module costs ONE exchange on conv_id —
`conversation_stats` is a partial+final hash agg, and
`turn_alternation_audit`'s window sort and its follow-up groupBy reuse
the same hashpartitioning(conv_id) (Catalyst inserts no second
exchange: the agg's ClusteredDistribution(conv_id) is satisfied by the
window's required child distribution). No windows without PARTITION BY,
no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def conversation_stats(final: DataFrame) -> DataFrame:
    """Per-conversation corpus statistics: turn counts by role, tool-call
    count, character volume, and the time span. Input is reduced final
    state with columns (conv_id, turn_idx, role, text, tool, ts_s)."""

    def _n(cond):
        return F.count(F.when(cond, F.lit(1))).cast("long")

    return final.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        _n(F.col("role") == "user").alias("n_user"),
        _n(F.col("role") == "assistant").alias("n_assistant"),
        _n(F.col("tool").isNotNull()).alias("n_tool_calls"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.min("ts_s").cast("long").alias("first_ts_s"),
        F.max("ts_s").cast("long").alias("last_ts_s"),
        (F.max("ts_s") - F.min("ts_s")).cast("long").alias("duration_s"),
    )


def turn_alternation_audit(final: DataFrame) -> DataFrame:
    """Structural QA per conversation: how many adjacent turns repeat a
    role (an alternating transcript never has two consecutive turns from
    the same speaker), how many turn-index gaps the reduced state has
    (dropped/tombstoned turns), and whether the transcript is
    ``well_formed`` (starts at turn 0, no gaps, no repeated roles) —
    the gate a packing/export stage filters on. Ordering inside a
    conversation is by turn_idx, which is unique after the CDC reduce,
    so lag() is deterministic."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    stepped = final.select(
        "conv_id",
        "turn_idx",
        "role",
        F.lag("role").over(w).alias("prev_role"),
        F.lag("turn_idx").over(w).alias("prev_idx"),
    )
    n_repeat = F.count(
        F.when(F.col("role") == F.col("prev_role"), F.lit(1))
    ).cast("long")
    n_gaps = F.count(
        F.when(
            F.col("prev_idx").isNotNull()
            & (F.col("turn_idx") != F.col("prev_idx") + 1),
            F.lit(1),
        )
    ).cast("long")
    return stepped.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        n_repeat.alias("n_repeat_role"),
        n_gaps.alias("n_gaps"),
        (
            (n_repeat == 0) & (n_gaps == 0) & (F.min("turn_idx") == 0)
        ).alias("well_formed"),
    )
