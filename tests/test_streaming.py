"""Structured Streaming tail: drain the change stream with availableNow,
assert identical final state to the batch oracle, and that a second run
of the stream (fresh streaming checkpoint, same table) is a no-op."""

import os

import pandas as pd
import pytest

from crba_etl_spark.engine import CDCEngine
from crba_etl_spark.gen import StreamSpec, generate_stream, oracle_final
from crba_etl_spark.streaming.tail import stream_apply


@pytest.fixture(scope="module")
def stream(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream"))
    generate_stream(d, StreamSpec(seed=5, n_events=4000, n_epochs=4, evolve_epoch=None))
    return d


def test_stream_apply_matches_oracle(spark, stream, tmpdir_):
    eng = CDCEngine(spark, os.path.join(tmpdir_, "t"), n_buckets=8, mode="mor")
    q = stream_apply(
        spark, eng, stream, checkpoint_dir=os.path.join(tmpdir_, "ckpt")
    )
    q.awaitTermination(timeout=300)
    assert eng.table.committed_epochs() == {0, 1, 2, 3}
    got = (
        eng.read_final().orderBy("conv_id", "turn_idx", "ts").toPandas().reset_index(drop=True)
    )
    exp = oracle_final(stream).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    # redeliver the whole tail with a FRESH streaming checkpoint: the
    # engine's epoch markers (not Spark's offsets) provide exactly-once
    q2 = stream_apply(
        spark, eng, stream, checkpoint_dir=os.path.join(tmpdir_, "ckpt2")
    )
    q2.awaitTermination(timeout=300)
    got2 = (
        eng.read_final().orderBy("conv_id", "turn_idx", "ts").toPandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got2, exp, check_dtype=False)
