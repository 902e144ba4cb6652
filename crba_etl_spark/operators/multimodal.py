"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-preserving
``mapInPandas`` (Arrow-batched, bounded batch size), deterministic
fan-out — while the codec step itself is STUBBED: the image/audio
libraries are not installed in this environment, so ``decode_image``
raises ``NotImplementedError`` unless the deterministic fake codec is
requested. Swapping the fake for Pillow/librosa/pyav changes ONE inner
function; the distributed plan is identical.

Scale notes (100 TB of media):
- media bytes stay in executor-side Arrow batches end-to-end: never
  collected, never in Python row objects;
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory
  (set it to ~(budget / avg_blob_size));
- derived features (small fixed-width vectors) are the only thing that
  shuffles; the binary column is pruned away before any wide operation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

#: media table shape: opaque payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthesize_media(spark, n: int = 64, blob_bytes: int = 4096) -> DataFrame:
    """Deterministic fake media table (seeded by media_id) for tests —
    payload bytes are a pure function of the id."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3).cast("int") + 1,
        ).alias("kind"),
        # deterministic pseudo-payload: repeated sha2 of the id
        F.repeat(F.sha2(F.col("id").cast("string"), 256), blob_bytes // 64)
        .cast("binary")
        .alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.when(F.col("id") % 3 != 0, (F.col("id") % 1000).cast("int") * 100)
        .alias("duration_ms"),
    )
    return df


def decode_image(payload: bytes, fake: bool = False):
    """The codec seam. Real implementation requires Pillow:

        from PIL import Image
        import io
        return np.asarray(Image.open(io.BytesIO(payload)))

    Pillow is not available in this environment; the deterministic fake
    derives a small array from the payload hash so the full distributed
    path is exercised end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "pass fake=True (tests) or install Pillow and replace this seam"
        )
    import hashlib

    import numpy as np

    h = hashlib.sha256(payload or b"").digest()
    return np.frombuffer(h, dtype=np.uint8).astype(np.float32)


def extract_features(
    media: DataFrame, feature_dim: int = 8, fake_codec: bool = True
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches).

    The per-batch loop is vectorized where it matters (one Python call
    per *batch*, numpy within); only the tiny feature vector leaves the
    worker.
    """

    def per_batch(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = decode_image(payload, fake=fake_codec)
                # fixed-width pooled feature: mean over equal chunks
                chunks = np.array_split(arr.astype(np.float32), feature_dim)
                feats.append(np.array([c.mean() for c in chunks], dtype=np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else None
                    ),
                    "feature": [f.tolist() for f in feats],
                }
            )

    pruned = media.select("media_id", "kind", "payload")
    return pruned.mapInPandas(per_batch, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (pure Catalyst — sequence+explode; the actual frame decode
    plugs into extract_features' codec seam)."""
    vids = media.filter(F.col("kind") == "video").select(
        "media_id", "duration_ms"
    )
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
