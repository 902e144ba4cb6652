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


def test_late_arriving_file_completes_epoch_via_done_marker(spark, tmpdir_):
    """VERDICT r2 #3: epoch completeness is the producer's _DONE
    declaration (a strongly-consistent GET), never a directory listing.
    A file of a declared epoch that arrives AFTER the first slices were
    applied must (a) keep the epoch un-marked until it lands, (b) flow
    through a later micro-batch, (c) complete the epoch, with final
    state equal to the batch-replay oracle."""
    import shutil

    from crba_etl_spark.streaming import tail as tail_mod

    # the contract: no listing-based completeness inference anywhere
    with open(tail_mod.__file__) as f:
        assert "listdir" not in f.read()

    d = os.path.join(tmpdir_, "stream")
    generate_stream(
        d,
        StreamSpec(seed=11, n_events=2000, n_epochs=2, evolve_epoch=None,
                   rows_per_file=200),
    )
    # hold back one declared file of epoch 1 — the producer already
    # wrote _DONE, but this object hasn't "landed" for the consumer yet
    held = os.path.join(d, "epoch=1", "part-001.parquet")
    parked = os.path.join(tmpdir_, "parked.parquet")
    shutil.move(held, parked)

    eng = CDCEngine(spark, os.path.join(tmpdir_, "t"), n_buckets=4, mode="mor")
    ckpt = os.path.join(tmpdir_, "ckpt")
    q = stream_apply(spark, eng, d, checkpoint_dir=ckpt, max_files_per_trigger=1)
    q.awaitTermination(timeout=300)

    # epoch 0 fully covered its declaration; epoch 1 is still open and
    # its cumulative applied-file set is persisted in the snapshot
    assert 0 in eng.table.committed_epochs()
    assert 1 not in eng.table.committed_epochs()
    assert "part-001.parquet" not in set(eng.table.epoch_files().get("1", []))

    # the late file lands; the SAME checkpoint picks up only the new file
    shutil.move(parked, held)
    q2 = stream_apply(spark, eng, d, checkpoint_dir=ckpt, max_files_per_trigger=1)
    q2.awaitTermination(timeout=300)

    assert eng.table.committed_epochs() == {0, 1}
    assert eng.table.epoch_files() == {}
    got = (
        eng.read_final().orderBy("conv_id", "turn_idx", "ts")
        .toPandas().reset_index(drop=True)
    )
    exp = oracle_final(d).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # and a batch replay now skips both epochs
    r = eng.replay(d)
    assert r["epochs_applied"] == []
