"""Engine-maintained LSH band index (band_index.py, round-4 VERDICT #3).

Contract under test:
1. candidate generation from the PERSISTED index equals fresh recompute
   (the index holds exactly the bands the text yields);
2. the index commit is atomic with the data commit (same snapshot
   version; a crashed index write changes nothing; redelivery adds no
   duplicate index files);
3. the candidates plan re-shingles ONLY the new batch — the existing
   corpus side is a parquet scan of the index files;
4. maintenance ops (marker promotion, compaction, expiry) carry the aux
   section forward, and expiry sweeps orphaned index dirs;
5. the CDC engine path (lsh_index=True) maintains the index across
   epochs including document updates.
"""

import os
import re

from conftest import make_events

from pyspark.sql import functions as F

from crba_etl_spark.band_index import AUX_NAME, LshBandIndex, ingest_documents
from crba_etl_spark.engine import CDCEngine
from crba_etl_spark.operators import text_dedup

SF_DIR = "/root/testdata/sf0.001"


def _split(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(100),
    )
    return docs.filter(bucket < 80), docs.filter(bucket >= 80)


def _pairs(df):
    return sorted(
        (str(r["new_id"]), str(r["existing_id"]), int(r["n_shared_bands"]))
        for r in df.collect()
    )


def test_index_candidates_equal_fresh_recompute(spark, tmpdir_):
    existing, new = _split(spark)
    _table, index = ingest_documents(spark, os.path.join(tmpdir_, "t"), existing)
    got = _pairs(index.candidates(spark, new))
    want = _pairs(
        text_dedup.incremental_lsh_candidates(new, existing)
        .withColumnsRenamed({"n_shared_bands": "n_shared_bands"})
    )
    assert got == want and len(got) > 0


def test_commit_atomic_with_data(spark, tmpdir_):
    existing, new = _split(spark)
    table, index = ingest_documents(spark, os.path.join(tmpdir_, "t"), existing)
    snap = table.snapshot()
    files = snap["aux"][AUX_NAME]["files"]
    assert files and all(p.startswith("index/lsh/") for p in files)
    # ONE commit holds both the data and the index: the epoch marker,
    # delta files and aux files appear at the same version
    assert snap["committed_epochs"] == [0]
    assert any(snap["deltas"].values())
    # a crashed index write (files on disk, no commit) changes nothing
    v0 = snap["version"]
    orphan = index.write_epoch(
        index.rows_for(existing.limit(5).withColumn("op", F.lit("U")), epoch=9),
        "e000009-crashed",
    )
    assert orphan and table.snapshot()["version"] == v0
    assert table.snapshot()["aux"][AUX_NAME]["files"] == files
    # redelivery of the committed epoch adds no index rows
    from crba_etl_spark.operators.merge import apply_delta_epoch

    batch = existing.select("doc_id", "text").withColumns(
        {"op": F.lit("U"), "lsn": F.lit(0).cast("long")}
    )
    stats = apply_delta_epoch(
        spark, table, batch, epoch=0, aux_add={AUX_NAME: ["index/lsh/bogus/x.parquet"]}
    )
    assert stats["skipped"]
    assert table.snapshot()["aux"][AUX_NAME]["files"] == files


def test_plan_reads_index_not_corpus(spark, tmpdir_):
    """The scale contract: per-batch cost is O(batch). The executed plan
    must contain exactly ONE shingle subtree (the new batch's) and a
    parquet scan of the index files for the existing side."""
    existing, new = _split(spark)
    _table, index = ingest_documents(spark, os.path.join(tmpdir_, "t"), existing)
    plan = index.candidates(spark, new)._jdf.queryExecution().executedPlan().toString()
    # ONE cached signature relation, scanned once = one shingle subtree
    # executed (the r7 partition-pruning collect materializes the cache
    # before plan capture, and a MATERIALIZED InMemoryRelation prints
    # its definition twice per scan node — so count scan NODES, not
    # occurrences of the shingle expression string)
    assert plan.count("InMemoryTableScan") == 1
    assert len(re.findall(r"sequence\(1,", plan)) >= 1
    assert "index/lsh" in plan
    # the existing side comes from the index files only: its scan reads
    # the band columns, never the corpus text (no second shingle pass)
    assert "ReadSchema: struct<doc_id:string,band_idx:int,band_hash:string>" in plan


def test_maintenance_carries_aux_and_expiry_sweeps(spark, tmpdir_):
    existing, _new = _split(spark)
    root = os.path.join(tmpdir_, "t")
    table, index = ingest_documents(spark, root, existing)
    files = table.aux()[AUX_NAME]["files"]
    # marker promotion and compaction both carry the aux section
    table.mark_epoch_committed(7)
    assert table.aux()[AUX_NAME]["files"] == files
    table.compact(spark)
    assert table.aux()[AUX_NAME]["files"] == files
    # an orphaned index dir (crashed attempt) is swept; committed files survive
    index.write_epoch(
        index.rows_for(existing.limit(3).withColumn("op", F.lit("U")), epoch=8),
        "e000008-orphan",
    )
    assert os.path.isdir(os.path.join(root, "index/lsh/e000008-orphan"))
    # default age threshold protects a just-written (possibly in-flight
    # pre-commit) dir from a concurrent sweep (round-5 ADVICE)
    res_young = table.expire_snapshots(keep_last=1)
    assert "index/lsh/e000008-orphan" not in res_young["removed_data_dirs"]
    assert os.path.isdir(os.path.join(root, "index/lsh/e000008-orphan"))
    # single-writer maintenance window: sweep regardless of age
    res = table.expire_snapshots(keep_last=1, aux_min_age_s=0.0)
    assert "index/lsh/e000008-orphan" in res["removed_data_dirs"]
    for p in files:
        assert os.path.exists(os.path.join(root, p))
    got = index.read(spark).count()
    assert got > 0


def test_streaming_tail_maintains_index_exactly_once(spark, tmpdir_):
    """The streaming tail reaches the index through the same
    engine.apply_epoch path: every committed slice's winners are indexed
    in the same commit, and a full redelivery under a FRESH streaming
    checkpoint appends zero index files (slice skips never reach the aux
    merge). Completeness: every final-table row's bands are present
    (each final winner won its slice, so its text was indexed then)."""
    from crba_etl_spark.gen import StreamSpec, generate_stream
    from crba_etl_spark.operators.text_dedup import _band_rows, minhash_signatures
    from crba_etl_spark.streaming.tail import stream_apply

    sdir = os.path.join(tmpdir_, "stream")
    generate_stream(
        sdir, StreamSpec(seed=11, n_events=3000, n_epochs=3, evolve_epoch=None)
    )
    eng = CDCEngine(
        spark, os.path.join(tmpdir_, "t"), n_buckets=8, mode="mor", lsh_index=True
    )
    q = stream_apply(
        spark,
        eng,
        sdir,
        checkpoint_dir=os.path.join(tmpdir_, "ckpt"),
        max_files_per_trigger=1,  # force multi-slice epochs
    )
    q.awaitTermination(timeout=300)
    assert eng.table.committed_epochs() == {0, 1, 2}
    files = set(eng.table.aux()[AUX_NAME]["files"])
    assert files
    index = LshBandIndex(eng.table)
    indexed = {
        (r["doc_id"], r["band_idx"], r["band_hash"])
        for r in index.read(spark).collect()
    }
    final_docs = eng.read_final().select(
        F.concat_ws("#", "conv_id", "turn_idx").alias("doc_id"), "text"
    )
    expected = {
        (r["doc_id"], r["band_idx"], r["band_hash"])
        for r in _band_rows(minhash_signatures(final_docs)).collect()
    }
    assert expected <= indexed  # stale rows from superseded slices allowed
    # fresh-checkpoint redelivery: zero new index files, zero new versions
    v0 = max(eng.table.versions())
    q2 = stream_apply(
        spark, eng, sdir, checkpoint_dir=os.path.join(tmpdir_, "ckpt2")
    )
    q2.awaitTermination(timeout=300)
    assert set(eng.table.aux()[AUX_NAME]["files"]) == files
    assert max(eng.table.versions()) == v0


def test_engine_dedup_labels_incremental_state(spark, tmpdir_):
    """dedup_labels=True: the full incremental dedup pipeline runs inside
    the commit loop. Epoch 0 groups the in-batch near-dups; epoch 1's
    batch bridges two existing groups through a new doc — the persisted
    labeling must equal a full recompute over the final corpus, the
    epoch-1 delta must contain only changed/new rows, and redelivery
    must append nothing."""
    from crba_etl_spark.band_index import LABELS_AUX, DedupLabels
    from crba_etl_spark.operators.graph import connected_components_star

    t1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    t2 = "kilo lima mike november oscar papa quebec romeo sierra tango"
    root = os.path.join(tmpdir_, "tbl")
    eng = CDCEngine(spark, root, n_buckets=8, mode="mor", dedup_labels=True)
    e0 = make_events(
        spark,
        [
            (1, 0, "I", "a", 0, "user", t1, None, 0, 0),
            (2, 0, "I", "b", 0, "user", t1 + " x", None, 1, 1),  # ~a#0
            (3, 0, "I", "c", 0, "user", t2, None, 2, 2),
            (4, 0, "I", "d", 0, "user", t2 + " y", None, 3, 3),  # ~c#0
        ],
    )
    eng.apply_epoch(e0, 0)
    labels = DedupLabels(eng.table, eng.lsh_index)
    l0 = {r["node"]: r["label"] for r in labels.read(spark).collect()}
    assert l0["b#0"] == l0["a#0"] and l0["d#0"] == l0["c#0"]
    assert l0["a#0"] != l0["c#0"]
    files0 = set(eng.table.aux()[LABELS_AUX]["files"])
    # epoch 1: a new doc similar to BOTH texts would be unnatural; use
    # two new docs, each near one group, plus an edge between them via a
    # shared near-identical text — simplest bridge: one new doc whose
    # text is near t1 and one near-dup pair inside the batch chaining to
    # a doc near t2 won't bridge; instead UPDATE b#0's text to ~t2: the
    # update adds edges b~c/b~d while b keeps its a-group membership
    # (monotone groups), merging both groups at the union minimum.
    e1 = make_events(spark, [(5, 1, "U", "b", 0, "user", t2 + " z", None, 4, 4)])
    eng.apply_epoch(e1, 1)
    l1 = {r["node"]: r["label"] for r in labels.read(spark).collect()}
    assert len({l1[k] for k in ("a#0", "b#0", "c#0", "d#0")}) == 1
    # delta files for epoch 1 carry only the rows whose label changed
    new_files = set(eng.table.aux()[LABELS_AUX]["files"]) - files0
    assert new_files
    delta_rows = spark.read.parquet(
        *[os.path.join(root, p) for p in new_files]
    ).count()
    changed = sum(1 for k in l1 if l0.get(k) != l1[k])
    assert delta_rows == changed < len(l1)
    # grouping equals a full recompute over FINAL text (with b's edges to
    # its ORIGINAL group kept — monotone): union of old+new edge sets
    final_docs = eng.read_final().select(
        F.concat_ws("#", "conv_id", "turn_idx").alias("doc_id"), "text"
    )
    cur_pairs = text_dedup.jaccard_verify_pairs(
        final_docs, text_dedup.minhash_lsh_candidates(final_docs)
    ).select("id_a", "id_b")
    old_pairs = spark.createDataFrame([("a#0", "b#0")], ["id_a", "id_b"])
    # star variant: its convergence checksum hashes labels, so it is
    # safe on STRING node ids (the min-label twin sums them numerically)
    cc = connected_components_star(
        cur_pairs.union(old_pairs),
        nodes=final_docs.select(F.col("doc_id").alias("node")),
    )
    want = {r["node"]: r["label"] for r in cc.collect()}
    assert {k: l1[k] for k in want} == want
    # redelivery appends nothing
    eng.apply_epoch(e1, 1)
    assert set(eng.table.aux()[LABELS_AUX]["files"]) - files0 == new_files


def test_streaming_dedup_labels_slicewise(spark, tmpdir_):
    """dedup_labels under the streaming tail (multi-slice epochs): every
    final-table doc is labeled exactly once, any verified near-dup pair
    over FINAL text shares a label (completeness — slices can only
    COARSEN grouping, since intermediate winners' texts add edges under
    the documented monotone semantics, never remove them), and a
    fresh-checkpoint redelivery appends neither label nor band files.

    The engine runs in EXACT mode (dedup_max_bucket=None) because the
    strict every-verified-pair property is exact mode's contract: this
    corpus has band buckets of up to ~170 members, and the capped
    default trades a small probabilistic pair recall inside oversized
    buckets (measured 37/22053 pairs here) for the O(n²) bound — that
    weaker default contract is pinned separately in
    test_round6_fixes.py::test_capped_default_residual_is_bounded."""
    from crba_etl_spark.band_index import LABELS_AUX, DedupLabels
    from crba_etl_spark.gen import StreamSpec, generate_stream
    from crba_etl_spark.streaming.tail import stream_apply

    sdir = os.path.join(tmpdir_, "stream")
    generate_stream(
        sdir, StreamSpec(seed=13, n_events=2000, n_epochs=2, evolve_epoch=None)
    )
    eng = CDCEngine(
        spark, os.path.join(tmpdir_, "t"), n_buckets=8, mode="mor",
        dedup_labels=True, dedup_max_bucket=None,
    )
    q = stream_apply(
        spark, eng, sdir,
        checkpoint_dir=os.path.join(tmpdir_, "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(timeout=300)
    assert eng.table.committed_epochs() == {0, 1}
    labels = DedupLabels(eng.table, eng.lsh_index)
    lab = {r["node"]: r["label"] for r in labels.read(spark).collect()}
    final_docs = eng.read_final().select(
        F.concat_ws("#", "conv_id", "turn_idx").alias("doc_id"), "text"
    )
    doc_ids = {r["doc_id"] for r in final_docs.select("doc_id").collect()}
    assert doc_ids <= set(lab)  # every live doc labeled (tombstones may linger)
    pairs = text_dedup.jaccard_verify_pairs(
        final_docs, text_dedup.minhash_lsh_candidates(final_docs)
    ).collect()
    for r in pairs:
        assert lab[r["id_a"]] == lab[r["id_b"]]
    aux0 = {
        k: set(v["files"]) for k, v in eng.table.aux().items()
    }
    q2 = stream_apply(
        spark, eng, sdir, checkpoint_dir=os.path.join(tmpdir_, "ckpt2")
    )
    q2.awaitTermination(timeout=300)
    assert {
        k: set(v["files"]) for k, v in eng.table.aux().items()
    } == aux0
    assert LABELS_AUX in aux0 and aux0[LABELS_AUX]


def test_index_rebuild_drops_stale_rows(spark, tmpdir_):
    """After updates, rebuild() leaves exactly the bands of CURRENT text
    (no stale rows), candidates stay correct, and the swap is
    lost-update-safe: a commit landing between the rebuild's base read
    and the swap raises CommitConflict instead of dropping its rows."""
    import pytest

    from crba_etl_spark.icelite import CommitConflict
    from crba_etl_spark.operators.text_dedup import _band_rows, minhash_signatures

    t1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    root = os.path.join(tmpdir_, "tbl")
    eng = CDCEngine(spark, root, n_buckets=8, mode="mor", lsh_index=True)
    eng.apply_epoch(
        make_events(spark, [(1, 0, "I", "a", 0, "user", t1, None, 0, 0)]), 0
    )
    t1b = t1.replace("alpha", "zulu")
    eng.apply_epoch(
        make_events(spark, [(2, 1, "U", "a", 0, "user", t1b, None, 1, 1)]), 1
    )
    index = LshBandIndex(eng.table)
    assert index.read(spark).count() > 4  # stale rows from both texts
    eng.compact(rebuild_indexes=True)
    indexed = {
        (r["doc_id"], r["band_idx"], r["band_hash"])
        for r in index.read(spark).collect()
    }
    final_docs = eng.read_final().select(
        F.concat_ws("#", "conv_id", "turn_idx").alias("doc_id"), "text"
    )
    want = {
        (r["doc_id"], r["band_idx"], r["band_hash"])
        for r in _band_rows(minhash_signatures(final_docs)).collect()
    }
    assert indexed == want  # stale rows gone, nothing current missing
    # lost-update protection: compute a rebuild against a stale base
    stale_base = index.files()
    eng.apply_epoch(
        make_events(spark, [(3, 2, "I", "b", 0, "user", t1, None, 2, 2)]), 2
    )
    with pytest.raises(CommitConflict):
        eng.table.set_aux("lsh_bands", ["index/lsh/bogus/x.parquet"], stale_base)
    # and a valid rebuild from the CURRENT base still succeeds
    index.rebuild(spark)
    assert index.read(spark).filter(F.col("doc_id") == "b#0").count() > 0


def test_labels_compact_preserves_resolution(spark, tmpdir_):
    from crba_etl_spark.band_index import LABELS_AUX, DedupLabels

    t1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    root = os.path.join(tmpdir_, "tbl")
    eng = CDCEngine(spark, root, n_buckets=8, mode="mor", dedup_labels=True)
    eng.apply_epoch(
        make_events(
            spark,
            [
                (1, 0, "I", "a", 0, "user", t1, None, 0, 0),
                (2, 0, "I", "b", 0, "user", t1 + " x", None, 1, 1),
            ],
        ),
        0,
    )
    eng.apply_epoch(
        make_events(spark, [(3, 1, "I", "c", 0, "user", t1 + " y", None, 2, 2)]), 1
    )
    labels = DedupLabels(eng.table, eng.lsh_index)
    before = {r["node"]: r["label"] for r in labels.read(spark).collect()}
    n_files_before = len(eng.table.aux()[LABELS_AUX]["files"])
    labels.compact(spark)
    after = {r["node"]: r["label"] for r in labels.read(spark).collect()}
    assert after == before
    assert len(eng.table.aux()[LABELS_AUX]["files"]) <= n_files_before


def test_engine_maintains_index_across_epochs(spark, tmpdir_):
    """CDC path: two epochs (insert + update), index committed with each
    epoch; candidates against the index equal fresh recompute over the
    table's FINAL text — the stale rows an update leaves behind may only
    ever add candidates that exact verification would drop, never lose
    one (here the probe matches the updated text, exercising exactly
    that)."""
    root = os.path.join(tmpdir_, "tbl")
    eng = CDCEngine(spark, root, n_buckets=8, mode="mor", lsh_index=True)
    base = "the quick brown fox jumps over the lazy dog again and again"
    e0 = make_events(
        spark,
        [
            (1, 0, "I", "c1", 0, "user", base, None, 0, 0),
            (2, 0, "I", "c2", 0, "user", "completely unrelated text about spark", None, 1, 1),
        ],
    )
    eng.apply_epoch(e0, 0)
    v1_files = set(eng.table.aux()[AUX_NAME]["files"])
    assert v1_files
    updated = base.replace("dog", "cat")
    e1 = make_events(spark, [(3, 1, "U", "c1", 0, "user", updated, None, 2, 2)])
    eng.apply_epoch(e1, 1)
    v2_files = set(eng.table.aux()[AUX_NAME]["files"])
    assert v1_files < v2_files  # epoch 1's band files appended
    # probe: a near-copy of the UPDATED text must hit c1#0 via the index
    probe = spark.createDataFrame(
        [("p1", updated + " tail")], ["doc_id", "text"]
    )
    index = LshBandIndex(eng.table)
    got = {
        (r["new_id"], r["existing_id"]) for r in index.candidates(spark, probe).collect()
    }
    assert ("p1", "c1#0") in got
    # fresh recompute over final table text finds no pair the index missed
    final_docs = eng.read_final().select(
        F.concat_ws("#", "conv_id", "turn_idx").alias("doc_id"), "text"
    )
    fresh = {
        (r["new_id"], r["existing_id"])
        for r in text_dedup.incremental_lsh_candidates(probe, final_docs).collect()
    }
    assert fresh <= got
