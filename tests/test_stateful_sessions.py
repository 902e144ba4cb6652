"""Event-time stateful sessionization (applyInPandasWithState +
EventTimeTimeout): a conversation's session closes when the watermark
passes its last event + gap; conversations still inside the gap stay
open. File mtimes order the two micro-batches deterministically."""

import datetime as dt
import os
import time

import pandas as pd
from pyspark.sql import types as T

from crba_etl_spark.streaming.stateful import conversation_sessions

BASE = dt.datetime(2025, 1, 1)
SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("role", T.StringType()),
        T.StructField("ingest_ts", T.TimestampType()),
    ]
)


def _write(spark, d, name, rows, mtime):
    pdf = pd.DataFrame(rows, columns=["conv_id", "lsn", "role", "ingest_ts"])
    df = spark.createDataFrame(pdf, SCHEMA)
    tmp = os.path.join(d, "_tmp_" + name)
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.rename(os.path.join(tmp, part), os.path.join(d, name))
    os.utime(os.path.join(d, name), (mtime, mtime))


def ts(s):
    return BASE + dt.timedelta(seconds=s)


def test_event_time_session_close(spark, tmpdir_):
    src = os.path.join(tmpdir_, "src")
    os.makedirs(src)
    now = time.time()
    # batch 1: conv A (events at t=0..10) and conv B's first event at
    # t=5000 — the watermark after this batch is ~5000, far past A+gap
    _write(spark, src, "00.parquet", [
        ("A", 1, "user", ts(0)),
        ("A", 2, "assistant", ts(10)),
        ("B", 3, "user", ts(5000)),
    ], now - 60)
    # batch 2: B continues — processing it fires A's event-time timeout
    _write(spark, src, "01.parquet", [
        ("B", 4, "assistant", ts(5005)),
    ], now)

    tail = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = conversation_sessions(tail, gap_s=60, watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    rows = spark.sql("SELECT * FROM sessions_test").collect()
    closed = {r.conv_id: r for r in rows if r.closed}
    opened = {r.conv_id for r in rows if not r.closed}

    assert set(closed) == {"A"}  # A idle past gap once watermark advanced
    assert closed["A"].n_events == 2
    assert closed["A"].start_ts == ts(0) and closed["A"].end_ts == ts(10)
    assert "B" in opened and "B" not in closed  # still inside its gap
