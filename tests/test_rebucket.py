"""Bucket-count evolution (icelite.rebucket): rewrite the table under a
new bucket count without losing resolution state — the operational move
when a table outgrows its bucket count (bucket count caps apply
parallelism; the apply path's single-exchange alignment requires ONE
bucket function table-wide)."""

import os

import pandas as pd

from conftest import make_events
from crba_etl_spark.engine import CDCEngine
from crba_etl_spark.gen import StreamSpec, generate_stream, oracle_final
from crba_etl_spark.icelite import bucket_expr

from pyspark.sql import functions as F


def test_rebucket_preserves_state_and_serves_new_applies(spark, tmpdir_):
    stream = os.path.join(tmpdir_, "s")
    generate_stream(
        stream, StreamSpec(seed=13, n_events=4000, n_epochs=4, evolve_epoch=2)
    )
    eng = CDCEngine(spark, os.path.join(tmpdir_, "t"), n_buckets=4, mode="mor")
    eng.replay(stream, epochs=[0, 1])
    assert eng.table.deltas()  # MOR deltas exist pre-rebucket

    snap = eng.table.rebucket(spark, 16)
    assert snap["n_buckets"] == 16
    assert not any(snap["deltas"].values())  # rebucket folds deltas
    assert set(snap["committed_epochs"]) == {0, 1}  # markers carry over

    # layout really is the new bucket function: every stored row sits in
    # the file set of its computed 16-bucket id
    stored = eng.table.read_stored(spark)
    mism = stored.withColumn("_b", bucket_expr(16)).select("conv_id", "_b").distinct()
    for b in [r._b for r in mism.select("_b").distinct().collect()]:
        in_bucket = {
            r.conv_id
            for r in eng.table.read_stored(spark, buckets={int(b)})
            .select("conv_id").distinct().collect()
        }
        expect = {r.conv_id for r in mism.filter(F.col("_b") == b).collect()}
        assert expect <= in_bucket

    # epochs 2-3 (schema evolution included) apply against the new count
    eng2 = CDCEngine(spark, os.path.join(tmpdir_, "t"), n_buckets=16, mode="mor")
    eng2.replay(stream)
    got = (
        eng2.read_final().orderBy("conv_id", "turn_idx", "ts")
        .toPandas().reset_index(drop=True)
    )
    exp = oracle_final(stream).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_rebucket_keeps_tombstones_blocking_resurrection(spark, tmpdir_):
    eng = CDCEngine(spark, os.path.join(tmpdir_, "t"), n_buckets=2, mode="mor")
    eng.apply_epoch(make_events(spark, [
        (5, 0, "I", "c1", 0, "user", "hello", None, 0, 0),
        (6, 0, "D", "c1", 0, None, None, None, 0, 1),
    ]), 0)
    eng.table.rebucket(spark, 8)
    # a straggling lower-LSN insert must still lose to the tombstone
    eng.apply_epoch(make_events(spark, [
        (3, 1, "I", "c1", 0, "user", "zombie", None, 0, 2),
    ]), 1)
    assert eng.read_final().count() == 0
