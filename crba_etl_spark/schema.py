"""Canonical schemas for the CDC engine.

The target-table shape is fixed by the product definition (BASELINE.json
``input_hint``): an Iceberg-style table of multi-turn conversation /
agent transcripts. The change-event envelope wraps that payload with
binlog bookkeeping (op, lsn, epoch, ingest_ts).

Reference analog: the reference pins a fixed canonical staging/final
schema and lets the raw edge drift per provider/edition
(``/root/reference/etl/methology/column_mapping.py:1-3``); here the fixed
core is TRANSCRIPT and the drifting edge is the event payload (the
``tool`` column arrives mid-stream via schema evolution).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- target table ---------------------------------------------------------

KEY_COLS = ["conv_id", "turn_idx"]

#: transcripts(conv_id, turn_idx, role, text, tool, ts)
TRANSCRIPT = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

#: payload columns carried by change events (everything but the key)
PAYLOAD_COLS = ["role", "text", "tool", "ts"]

# --- change-event envelope -------------------------------------------------

OPS = ("I", "U", "D", "UPSERT")

#: change_events(lsn, epoch, op, conv_id, turn_idx, role, text, tool, ts, ingest_ts)
CHANGE_EVENT = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("epoch", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("ingest_ts", T.TimestampType(), True),
    ]
)

#: pre-evolution envelope: the ``tool`` column does not exist yet
CHANGE_EVENT_V0 = T.StructType(
    [f for f in CHANGE_EVENT.fields if f.name != "tool"]
)

# --- internal bookkeeping columns stored in the icelite table ---------------

#: highest LSN ever applied to the key (per-key high watermark)
LSN_COL = "__lsn"
#: tombstone flag: true if the latest applied op for the key was a delete.
#: Tombstones stay in-table (filtered on read) so a late, lower-LSN update
#: can never resurrect a deleted key.
DELETED_COL = "__deleted"
#: epoch that committed the row — lets compaction classify late/low-LSN
#: arrivals (a row that loses resolution to a row committed in an EARLIER
#: epoch was stale on arrival → quarantine), without any per-epoch
#: table re-scan.
EPOCH_COL = "__epoch"

INTERNAL_COLS = [LSN_COL, DELETED_COL, EPOCH_COL]


def stored_schema(payload: T.StructType) -> T.StructType:
    """Schema of rows as physically stored: payload + internal columns."""
    return T.StructType(
        list(payload.fields)
        + [
            T.StructField(LSN_COL, T.LongType(), False),
            T.StructField(DELETED_COL, T.BooleanType(), False),
            T.StructField(EPOCH_COL, T.LongType(), True),
        ]
    )
