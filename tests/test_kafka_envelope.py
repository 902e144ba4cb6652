"""Kafka-shaped change source: the envelope contract is tested against
batch DataFrames with the connector's exact output shape (key/value
binary, topic/partition/offset/timestamp) — transport-independent; the
connector itself is absent in this sandbox and must fail with an
actionable message, not a bare DATA_SOURCE_NOT_FOUND."""

import datetime as dt
import json

import pytest

from pyspark.sql import functions as F, types as T

from crba_etl_spark.streaming.kafka import (
    KAFKA_SOURCE_COLS,
    kafka_tail,
    parse_change_envelope,
)

KAFKA_SHAPE = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)


def _rec(conv, part, off, **env):
    payload = {
        "lsn": 1, "epoch": 0, "op": "I", "conv_id": conv, "turn_idx": 0,
        "role": "user", "text": "hi", "tool": None,
        "ts": "2025-01-01T00:00:00", "ingest_ts": "2025-01-01T00:00:01",
    }
    payload.update(env)
    return (
        conv.encode(), json.dumps(payload).encode(), "changes", part, off,
        dt.datetime(2025, 1, 1),
    )


def test_envelope_parses_and_keeps_lineage(spark):
    raw = spark.createDataFrame(
        [
            _rec("c1", 0, 10),
            _rec("c2", 1, 11, op="D", text=None, role=None),
        ],
        KAFKA_SHAPE,
    )
    assert set(KAFKA_SOURCE_COLS) <= set(raw.columns)
    out = parse_change_envelope(raw)
    rows = {r.conv_id: r for r in out.collect()}
    assert not rows["c1"]._corrupt and not rows["c2"]._corrupt
    assert rows["c1"].lsn == 1 and rows["c1"].text == "hi"
    assert rows["c1"].ts == dt.datetime(2025, 1, 1, 0, 0, 0)
    assert rows["c2"].op == "D" and rows["c2"].text is None
    # transport lineage rides along
    assert (rows["c1"]._src_partition, rows["c1"]._src_offset) == (0, 10)
    assert (rows["c2"]._src_partition, rows["c2"]._src_offset) == (1, 11)


def test_corrupt_values_flagged_never_dropped(spark):
    bad_json = (b"k", b"{not json", "changes", 0, 1, dt.datetime(2025, 1, 1))
    missing_req = (
        b"k",
        json.dumps({"conv_id": "c9", "turn_idx": 0}).encode(),  # no lsn/epoch/op
        "changes", 0, 2, dt.datetime(2025, 1, 1),
    )
    raw = spark.createDataFrame([_rec("c1", 0, 0), bad_json, missing_req], KAFKA_SHAPE)
    out = parse_change_envelope(raw)
    assert out.count() == 3  # nothing silently lost
    corrupt = out.filter("_corrupt").collect()
    assert len(corrupt) == 2
    # the raw value is retained for quarantine/audit
    assert any("not json" in (r._raw_value or "") for r in corrupt)
    # and the drop_corrupt form yields exactly the good rows with
    # exactly the envelope columns — no _-prefixed audit/lineage cols
    # that would pollute the table via additive schema evolution
    good = parse_change_envelope(raw, drop_corrupt=True)
    assert [r.conv_id for r in good.collect()] == ["c1"]
    from crba_etl_spark.schema import CHANGE_EVENT
    assert good.columns == [f.name for f in CHANGE_EVENT.fields]


def test_missing_connector_fails_actionably(spark):
    with pytest.raises(RuntimeError, match="--packages"):
        kafka_tail(spark, "localhost:9092", "changes")
