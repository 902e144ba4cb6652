#!/usr/bin/env python
"""Extra benchmarks for optimization round 7 (guide §1.4 noop-sink
isolation). NOT part of the frozen driver contract — bench.py is the
measured artifact; this file exists to attribute time within the hot
queries and to record before/after evidence for OPTIMIZATION_r07.md.

Usage:
  python bench_extra.py minhash [sf_dir]   # isolate minhash stages
  python bench_extra.py queries [sf_dir]   # noop-time every headline query
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count()))


def get_spark():
    from crba_etl_spark.session import get_spark as gs

    return gs(
        app_name="bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * int(CPUS),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "16m",
            **(
                {"spark.local.dir": "/dev/shm/crba_spark_local_extra"}
                if os.path.isdir("/dev/shm")
                else {}
            ),
        },
    )


def noop_time(spark, df, label: str, reps: int = 3) -> list[float]:
    from crba_etl_spark.cache import release_caches

    out = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        out.append(round(time.monotonic() - t0, 3))
        release_caches()
    spark.sparkContext.setJobDescription(None)
    print(f"{label:50s} {out}")
    return out


def minhash_isolation(sf_dir: str) -> None:
    from crba_etl_spark import queries as Q
    from crba_etl_spark.operators import text_dedup as td
    from crba_etl_spark.cache import persist_tracked, release_caches

    spark = get_spark()
    docs = Q.load(spark, sf_dir, "documents")
    n = docs.count()
    print(f"documents: {n} rows at {sf_dir}")

    # 1. scan + shingle arrays only (no distinct)
    raw_shingles = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.expr(
            "transform(sequence(1, greatest(length(text)-4, 1)),"
            " i -> substr(text, i, 5))"
        ).alias("sh"),
    )
    noop_time(spark, raw_shingles, "shingle arrays (no distinct)")

    # 2. + array_distinct
    dist = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", td.shingle_array().alias("sh")
    )
    noop_time(spark, dist, "shingle arrays + array_distinct")

    # 3. + per-shingle h32 (md5+conv)
    hashed = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.transform(td.shingle_array(), lambda s: td.h32(s)).alias("__h"),
    )
    noop_time(spark, hashed, "+ h32 (md5) per shingle")

    # 4. full signatures (16 affine array_min transforms)
    noop_time(spark, td.minhash_signatures(docs), "full minhash signatures")

    # 5. bands from persisted signatures
    sig = persist_tracked(td.minhash_signatures(docs))
    sig.count()
    noop_time(spark, td._band_rows(sig), "band rows (sig persisted)", reps=3)
    release_caches()

    # 6. full candidates query (the bench shape, count like bench.py)
    for _ in range(3):
        t0 = time.monotonic()
        td.minhash_lsh_candidates(docs).count()
        dt = round(time.monotonic() - t0, 3)
        release_caches()
        print(f"{'full minhash_lsh_candidates (count)':50s} {dt}")
    spark.stop()


def headline_noop(sf_dir: str) -> None:
    from crba_etl_spark import queries as Q
    from crba_etl_spark.cache import release_caches

    spark = get_spark()
    reg = Q.registry()
    names = [
        "cdc_replay_reduce",
        "cdc_latest_per_key",
        "sessionize",
        "pricing_summary",
        "revenue_by_nation",
        "minhash_lsh_candidates",
        "cosine_topk",
    ]
    for name in names:
        fn = reg[name][0]
        noop_time(spark, fn(spark, sf_dir), name)
        release_caches()
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "minhash"
    d = sys.argv[2] if len(sys.argv) > 2 else SF_DIR
    if mode == "minhash":
        minhash_isolation(d)
    elif mode == "queries":
        headline_noop(d)
