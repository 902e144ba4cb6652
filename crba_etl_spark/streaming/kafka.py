"""Kafka-shaped change tail: the keyed-topic form of the binlog/WAL
source (SURVEY §2.9; the file tail in tail.py is its deterministic,
offline stand-in — both feed the identical envelope contract below).

Deployment shape: one topic keyed by ``conv_id`` with partitions =
table buckets, value = a JSON change envelope. Keying by conv_id gives
per-key ordering within a partition (Kafka's guarantee), which is what
the LSN monotonic-apply semantics assume of the transport; partitions =
buckets additionally makes the stream arrive bucket-clustered (the
``source_aligned`` story in engine.apply_epoch — note that Spark's
Kafka scan does not EXPOSE that partitioning to Catalyst, so the
exchange-free plan applies to bucket-staged batches, not directly to
the socket read).

This sandbox has neither the spark-sql-kafka connector jar nor a
broker, so :func:`kafka_tail` raises a clear actionable error when the
connector is absent; everything after ``load()`` —
:func:`parse_change_envelope` — is transport-independent and fully
tested against batch DataFrames with the connector's exact output
shape (key/value binary, topic/partition/offset/timestamp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..schema import CHANGE_EVENT

#: columns the Kafka connector emits — the envelope parser's input contract
KAFKA_SOURCE_COLS = (
    "key", "value", "topic", "partition", "offset", "timestamp",
)


def parse_change_envelope(
    raw: DataFrame,
    schema: T.StructType = CHANGE_EVENT,
    drop_corrupt: bool = False,
) -> DataFrame:
    """Kafka records → typed change events.

    ``value`` is a JSON envelope parsed against ``schema`` (timestamps
    accept ISO-8601 strings); rows whose value fails to parse or whose
    REQUIRED envelope fields (lsn/epoch/op/key columns) come back null
    are never silently lost: they are flagged ``_corrupt`` with the
    raw value retained for audit (``drop_corrupt=True`` filters them
    after the caller routes them to quarantine). Kafka's own
    ``partition``/``offset`` ride along as ``_src_partition`` /
    ``_src_offset`` — the transport lineage the metrics layer records.

    ``drop_corrupt=True`` returns EXACTLY the envelope schema's columns
    (no ``_``-prefixed audit/lineage columns): the apply path treats
    unknown payload columns as additive schema evolution, so leaking
    ``_src_partition`` into ``apply_epoch`` would silently evolve the
    table with transport bookkeeping. Audit + lineage live only on the
    default (flagged) form.
    """
    required = [f.name for f in schema.fields if not f.nullable]
    parsed = raw.select(
        F.from_json(
            F.col("value").cast("string"),
            schema,
            {"mode": "PERMISSIVE", "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss[.SSS][XXX]"},
        ).alias("_ev"),
        F.col("value").cast("string").alias("_raw_value"),
        F.col("partition").alias("_src_partition"),
        F.col("offset").alias("_src_offset"),
    )
    corrupt = F.col("_ev").isNull()
    for c in required:
        corrupt = corrupt | F.col(f"_ev.{c}").isNull()
    out = parsed.select(
        *[F.col(f"_ev.{f.name}").alias(f.name) for f in schema.fields],
        corrupt.alias("_corrupt"),
        "_raw_value",
        "_src_partition",
        "_src_offset",
    )
    if drop_corrupt:
        out = out.filter(~F.col("_corrupt")).select(
            *[f.name for f in schema.fields]
        )
    return out


def kafka_tail(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    schema: T.StructType = CHANGE_EVENT,
    starting_offsets: str = "earliest",
    options: dict | None = None,
) -> DataFrame:
    """Open the topic as a streaming change tail (envelope-parsed).

    Requires the ``spark-sql-kafka-0-10`` connector on the classpath
    (``spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``);
    without it, fails at PLAN time with an actionable message instead
    of a bare DATA_SOURCE_NOT_FOUND deep in a stream start."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    try:
        raw = reader.load()
    except Exception as e:  # AnalysisException: kafka source not found
        if "kafka" in str(e).lower() or "DATA_SOURCE" in str(e):
            raise RuntimeError(
                "the Kafka connector is not on the classpath — launch with "
                "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
                "(the file tail in streaming/tail.py is the offline stand-in)"
            ) from e
        raise
    return parse_change_envelope(raw, schema)
