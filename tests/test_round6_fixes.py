"""Round-5 ADVICE closures (see ADVICE.md, all six items).

1. medium — DedupLabels.read resolves by min(label), not
   max_by(label, __epoch): two slices of the SAME epoch re-labeling one
   node tied on the epoch stamp and picked an arbitrary label.
2. low — ingest_documents is redelivery-safe: a re-invoked epoch skips
   both the data apply and the aux write instead of rmtree'ing the
   committed index dir under a colliding deterministic tag.
3. low — expire_snapshots keeps unreferenced-but-young index dirs (an
   in-flight commit's pre-CAS write); covered in test_band_index.py.
4. low — compact(rebuild_indexes=True) rebuilds with the config the
   index was BUILT with (recorded in the aux entry), not defaults.
5. low — minhash_signatures drops NULL-text docs (the grouped form's
   semantics); all-NULL signatures banded identically and emitted
   all-pairs candidates among null-text docs.
"""

import os

from pyspark.sql import functions as F, types as T

from crba_etl_spark.band_index import (
    AUX_NAME,
    LABELS_AUX,
    DedupLabels,
    LshBandIndex,
    ingest_documents,
)
from crba_etl_spark.engine import CDCEngine
from crba_etl_spark.operators import text_dedup


def _docs(spark, rows):
    return spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("doc_id", T.StringType()),
                T.StructField("text", T.StringType()),
            ]
        ),
    )


def test_labels_same_epoch_slice_tie_resolves_min(spark, tmpdir_):
    """Two label deltas stamped with the SAME __epoch (two slices of one
    streaming epoch): the later slice re-labels n1 from 'b' down to 'a'.
    Resolution must pick 'a' deterministically — labels are monotone
    non-increasing, so min(label) IS the latest (ADVICE medium)."""
    docs = _docs(spark, [("x", "alpha bravo charlie delta echo")])
    table, index = ingest_documents(spark, os.path.join(tmpdir_, "t"), docs)
    labels = DedupLabels(table, index)
    d1 = spark.createDataFrame(
        [("n1", "b", 5), ("b", "b", 5)], ["node", "label", "__epoch"]
    ).withColumn("__epoch", F.col("__epoch").cast("long"))
    d2 = spark.createDataFrame(
        [("n1", "a", 5), ("a", "a", 5)], ["node", "label", "__epoch"]
    ).withColumn("__epoch", F.col("__epoch").cast("long"))
    base = labels.files()
    f1 = labels.write_epoch(d1, "slice1")
    table.set_aux(LABELS_AUX, base + f1, base_files=base)
    f2 = labels.write_epoch(d2, "slice2")
    table.set_aux(LABELS_AUX, base + f1 + f2, base_files=base + f1)
    lab = {r["node"]: r["label"] for r in labels.read(spark).collect()}
    assert lab["n1"] == "a"


def test_ingest_documents_redelivery_noop(spark, tmpdir_):
    """Re-invoking ingest_documents with an already-committed epoch must
    change nothing — in particular it must NOT rewrite the committed
    index dir (the old deterministic e{epoch} tag rmtree'd it, leaving
    the snapshot referencing deleted files — ADVICE low)."""
    docs = _docs(
        spark,
        [
            ("a", "alpha bravo charlie delta echo foxtrot golf hotel"),
            ("b", "alpha bravo charlie delta echo foxtrot golf hotel x"),
            ("c", "kilo lima mike november oscar papa quebec romeo"),
        ],
    )
    root = os.path.join(tmpdir_, "t")
    table, index = ingest_documents(spark, root, docs)
    v0 = table.snapshot()["version"]
    files0 = list(table.aux()[AUX_NAME]["files"])
    assert files0
    table2, index2 = ingest_documents(spark, root, docs, table=table)
    assert table2.snapshot()["version"] == v0
    assert list(table2.aux()[AUX_NAME]["files"]) == files0
    for p in files0:
        assert os.path.exists(os.path.join(root, p))
    probe = _docs(spark, [("p", "alpha bravo charlie delta echo foxtrot golf hotel y")])
    got = {r["existing_id"] for r in index2.candidates(spark, probe).collect()}
    assert "a" in got


def test_rebuild_uses_recorded_config(spark, tmpdir_):
    """A maintenance engine constructed WITHOUT lsh flags (the CLI
    `compact --rebuild-indexes` shape) must rebuild the index over the
    text column it was BUILT with — recorded in the aux entry's config —
    not the default 'text' (ADVICE low: a non-default lsh_text_col table
    was silently re-indexed over the wrong column)."""
    docs = spark.createDataFrame(
        [
            ("a", "alpha bravo charlie delta echo foxtrot golf hotel"),
            ("b", "kilo lima mike november oscar papa quebec romeo"),
        ],
        ["doc_id", "body"],
    )
    root = os.path.join(tmpdir_, "t")
    table, index = ingest_documents(spark, root, docs, text_col="body")
    assert table.aux()[AUX_NAME]["config"] == {"text_col": "body"}
    want = {
        (r["doc_id"], r["band_idx"], r["band_hash"])
        for r in index.read(spark).collect()
    }
    # maintenance CLI shape: engine without lsh flags on the existing table
    eng = CDCEngine(spark, root)
    eng.compact(rebuild_indexes=True)
    got = {
        (r["doc_id"], r["band_idx"], r["band_hash"])
        for r in LshBandIndex(table, text_col="body").read(spark).collect()
    }
    assert got == want  # rebuilt over 'body', content unchanged (no updates)


def test_engine_records_index_config(spark, tmpdir_):
    from conftest import make_events

    eng = CDCEngine(
        spark, os.path.join(tmpdir_, "t"), n_buckets=8, mode="mor",
        dedup_labels=True,
    )
    t1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    eng.apply_epoch(
        make_events(spark, [(1, 0, "I", "a", 0, "user", t1, None, 0, 0)]), 0
    )
    aux = eng.table.aux()
    assert aux[AUX_NAME]["config"]["text_col"] == "text"
    assert aux[LABELS_AUX]["config"]["threshold"] == eng.dedup_labels.threshold
    assert aux[LABELS_AUX]["config"]["max_bucket"] == eng.dedup_labels.max_bucket


def test_minhash_null_text_dropped(spark):
    docs = _docs(
        spark,
        [
            ("a", None),
            ("b", None),
            ("c", None),
            ("d", "some real text content here today now"),
            ("e", "other unrelated different words entirely elsewhere"),
        ],
    )
    sig = text_dedup.minhash_signatures(docs)
    assert {r["doc_id"] for r in sig.collect()} == {"d", "e"}
    pairs = text_dedup.minhash_lsh_candidates(docs).collect()
    nulls = {"a", "b", "c"}
    assert all(r["id_a"] not in nulls and r["id_b"] not in nulls for r in pairs)
