"""Custom stateful streaming operator: per-conversation running state via
``applyInPandasWithState`` (Arrow-batched, GroupState-backed).

Demonstrates the Structured Streaming custom-operator surface the engine
standardizes on for logic that outgrows built-in windowed aggregates:
here, a per-conversation accumulator that tracks (turns seen, max lsn,
last role, last event time) across micro-batches, emitting one row per
conversation per batch. Processing-time timeouts close idle
conversations (state eviction — mandatory at 10^10-key scale; without
eviction state grows unboundedly).

The exactly-once table path intentionally does NOT use this operator
(batch-reduce + icelite epoch markers are simpler to prove idempotent —
SURVEY.md §2.9); this exists for *derived* running aggregates where
at-least-once emission downstream is acceptable or deduped by key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("turns", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("last_role", T.StringType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turns", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("last_role", T.StringType()),
        T.StructField("closed", T.BooleanType()),
    ]
)


def _update_conversation(key, pdf_iter, state: GroupState):
    import pandas as pd

    (conv_id,) = key
    if state.hasTimedOut:
        turns, max_lsn, last_role, _ = state.get
        state.remove()
        yield pd.DataFrame(
            [{"conv_id": conv_id, "turns": turns, "max_lsn": max_lsn,
              "last_role": last_role, "closed": True}]
        )
        return

    turns, max_lsn, last_role, last_ts = (
        state.get if state.exists else (0, -1, None, None)
    )
    for pdf in pdf_iter:
        pdf = pdf.sort_values("lsn")
        turns += len(pdf)
        if len(pdf):
            max_lsn = max(max_lsn, int(pdf["lsn"].max()))
            last_role = pdf.iloc[-1]["role"]
            last_ts = pdf.iloc[-1]["ts"]
    state.update((turns, max_lsn, last_role, last_ts))
    state.setTimeoutDuration(60_000)  # close after 60s idle (processing time)
    yield __import__("pandas").DataFrame(
        [{"conv_id": conv_id, "turns": turns, "max_lsn": max_lsn,
          "last_role": last_role, "closed": False}]
    )


def conversation_progress(tail: DataFrame) -> DataFrame:
    """Streaming per-conversation running aggregate over the change tail."""
    return (
        tail.groupBy("conv_id")
        .applyInPandasWithState(
            _update_conversation,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


# --- event-time variant: watermark-driven session close ---------------------

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("start_ts", T.TimestampType()),
        T.StructField("end_ts", T.TimestampType()),
    ]
)

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_ts", T.TimestampType()),
        T.StructField("end_ts", T.TimestampType()),
        T.StructField("closed", T.BooleanType()),
    ]
)


def _make_session_update(gap_s: int):
    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        (conv_id,) = key
        if state.hasTimedOut:
            n, start_ts, end_ts = state.get
            state.remove()
            yield pd.DataFrame(
                [{"conv_id": conv_id, "n_events": n, "start_ts": start_ts,
                  "end_ts": end_ts, "closed": True}]
            )
            return
        n, start_ts, end_ts = state.get if state.exists else (0, None, None)
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            n += len(pdf)
            lo, hi = pdf["ingest_ts"].min(), pdf["ingest_ts"].max()
            start_ts = lo if start_ts is None else min(start_ts, lo)
            end_ts = hi if end_ts is None else max(end_ts, hi)
        state.update((n, start_ts, end_ts))
        # the session closes when the EVENT-TIME watermark passes
        # last-event + gap — late events inside the gap still extend it
        state.setTimeoutTimestamp(
            int(end_ts.timestamp() * 1000) + gap_s * 1000
        )
        yield pd.DataFrame(
            [{"conv_id": conv_id, "n_events": n, "start_ts": start_ts,
              "end_ts": end_ts, "closed": False}]
        )

    return update


def conversation_sessions(
    tail: DataFrame, gap_s: int = 60, watermark: str = "0 seconds"
) -> DataFrame:
    """Event-time sessionization with WATERMARK-driven state eviction
    (the event-time twin of :func:`conversation_progress`'s processing-
    time timeout): a conversation's session closes when the watermark on
    ``ingest_ts`` passes its last event + ``gap_s``. Late events within
    the allowed lateness extend the session; events older than the
    watermark are dropped upstream by Spark — the standard watermark
    contract (the engine's key-exact LSN quarantine remains the
    lossless late-data path for the TABLE; this operator serves derived
    session views)."""
    return (
        tail.withWatermark("ingest_ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_session_update(gap_s),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
