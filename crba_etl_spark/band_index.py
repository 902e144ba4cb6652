"""Engine-maintained LSH band index — incremental dedup at O(batch).

Round-4 VERDICT #3: ``incremental_lsh_candidates`` (operators/
text_dedup.py) has the right JOIN shape for production dedup — a
new×existing banded equi-join, never a self-join — but recomputed the
existing side's signatures per call, making each batch O(corpus). This
module closes that gap: the MinHash **band table** is an engine artifact
maintained at epoch commit and recorded in the SAME icelite snapshot CAS
swap as the data (``IceliteTable.commit*``'s ``aux_add`` →
``snap["aux"]["lsh_bands"]``), so

- the index can never reference rows the table doesn't hold, nor miss
  rows it does (atomic with the data commit — a crash between the index
  write and the commit leaves only an unreferenced orphan dir, swept by
  ``expire_snapshots``);
- a redelivered epoch adds no index rows (the commit skip path never
  reaches the aux merge) — exactly-once for the index too;
- per-batch candidate generation reads ONLY the persisted band files for
  the existing side: one shingle pass over the NEW batch, an equi-join
  on (band_idx, band_hash), and nothing touches the corpus text again
  (plan-asserted in tests/test_band_index.py).

Scale notes (100 TB): band files are written clustered by ``band_hash``
(uniform md5 keys — no skew), so on a real cluster the candidates join
is a co-located hash join on a small uniform key space and the index
scan prunes to two narrow columns. The index is append-only; a document
UPDATE appends the new text's band rows while the old rows remain.
Stale rows only ever produce EXTRA candidates — candidates are verified
against current text downstream (``jaccard_verify_pairs``), so
correctness is unaffected; table compaction is the natural place to
rewrite the index when the stale fraction grows (same rewrite protocol
as data buckets, not yet wired).

Reference analog: the reference dedupes/combines per edition by full
recompute over all sources (SURVEY.md §2 AGG-DISTINCT;
``/root/reference/etl/`` full-refresh design); this is the incremental
form a standing 10^10-event ingest needs.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .cache import persist_tracked, release_caches
from .icelite import IceliteTable
from .operators.text_dedup import _band_rows, minhash_signatures

#: name of this artifact in the snapshot's aux section
AUX_NAME = "lsh_bands"

#: directory-partition segment of a band file path: ``__bpart=<K>-<part>``
#: (K = writer's partition count — self-describing so mixed-K file sets
#: prune correctly; see LshBandIndex.write_epoch)
import re as _re

_BPART_RE = _re.compile(r"__bpart=(\d+)-(\d+)/")


def _parquet_rows(
    root: str, relpaths: list[str], failures: list[str] | None = None
) -> int:
    """Exact row count of parquet files from their FOOTERS — driver-side
    metadata reads, zero Spark jobs (the same precedent as the MOR
    compaction byte threshold). Feeds the index's ``rows_total``
    bookkeeping: the append-only write path leaves one stale row set per
    superseded document version, and total-vs-live is the staleness
    signal maintenance triggers on.

    Unreadable footers are SKIPPED (undercount). Whether that is
    conservative depends on the caller's side of the staleness ratio —
    for the LIVE bound it inflates the stale estimate (round-6 ADVICE
    low) — so callers that must not act on an undercount pass
    ``failures`` to learn which paths were skipped."""
    import pyarrow.parquet as pq

    total = 0
    for p in relpaths:
        try:
            total += pq.ParquetFile(os.path.join(root, p)).metadata.num_rows
        except Exception:
            if failures is not None:
                failures.append(p)
    return total

BAND_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("band_idx", T.IntegerType()),
        T.StructField("band_hash", T.StringType()),
        T.StructField("__epoch", T.LongType()),
    ]
)


class LshBandIndex:
    """The persisted band table of an :class:`IceliteTable`.

    ``doc_id`` is the table key columns joined with ``#`` (for the
    transcript table: ``conv_id#turn_idx``), so index rows are stable
    across bucket-count evolution and compaction.
    """

    def __init__(self, table: IceliteTable, text_col: str = "text"):
        self.table = table
        self.text_col = text_col

    # --- write path (engine side) -------------------------------------

    def rows_for(self, batch: DataFrame, epoch: int) -> DataFrame:
        """Band rows for a reduced batch's LIVE rows (tombstones carry no
        text to index). One shingle→MinHash→band pass over the batch —
        O(batch), independent of table size."""
        if "op" in batch.columns:
            batch = batch.filter(F.col("op") != "D")
        docs = batch.select(
            F.concat_ws("#", *self.table.key_cols()).alias("doc_id"),
            F.col(self.text_col).alias("text"),
        ).filter(F.col("text").isNotNull())
        return _band_rows(minhash_signatures(docs), "doc_id").withColumn(
            "__epoch", F.lit(epoch).cast("long")
        )

    def write_epoch(self, rows: DataFrame, tag: str) -> list[str]:
        """Write one commit's band rows under ``index/lsh/<tag>``,
        DIRECTORY-PARTITIONED by ``__bpart = "<K>-<pmod(hash(band_hash),
        K)>"`` (K = the table's bucket count at write time) and clustered
        by ``band_hash`` within each partition, so per-epoch candidate
        generation can read ONLY the partitions the batch's band hashes
        hit instead of streaming the whole persisted index (round-6
        VERDICT #1 — the one remaining O(corpus)-per-epoch scan). The
        ``repartition(K, band_hash)`` partition id is the identical
        murmur3 ``pmod(hash(·), K)`` as the ``__bpart`` value (the same
        alignment trick as icelite.bucket_expr), so the partitioned
        write emits one file per hit directory with no extra exchange.

        K rides IN the partition value, making every file self-
        describing: epochs written under different bucket counts (a
        rebucket mid-corpus) prune correctly side by side, and files
        from the pre-partitioned layout (no ``__bpart=`` segment) are
        simply never pruned — read-compatible, conservatively.

        The files join the snapshot only when the caller's commit CAS
        succeeds; until then the dir is an unreferenced orphan
        (``expire_snapshots`` sweeps those). Callers must pick tags that
        can never collide with a COMMITTED dir — the engine uses a
        per-attempt unique suffix — because a pre-existing tag dir is
        removed before rewrite."""
        rel = f"index/lsh/{tag}"
        out = os.path.join(self.table.root, rel)
        if os.path.exists(out):
            shutil.rmtree(out)
        k = self.table.n_buckets()
        (
            rows.withColumn(
                "__bpart",
                F.concat_ws(
                    "-",
                    F.lit(k),
                    F.pmod(F.hash(F.col("band_hash")), F.lit(k)).cast("string"),
                ),
            )
            .repartition(k, F.col("band_hash"))
            .write.partitionBy("__bpart")
            .mode("overwrite")
            .parquet(out)
        )
        files = []
        for root_, _dirs, fnames in os.walk(out):
            for f in fnames:
                if f.endswith(".parquet"):
                    files.append(
                        os.path.relpath(os.path.join(root_, f), self.table.root)
                    )
        return sorted(files)

    # --- read path (query side) ---------------------------------------

    def files(self) -> list[str]:
        return list(
            self.table.snapshot().get("aux", {}).get(AUX_NAME, {}).get("files", [])
        )

    @staticmethod
    def _file_part(relpath: str) -> tuple[int, int] | None:
        """(K, part) parsed from a ``__bpart=<K>-<part>/`` path segment;
        None for pre-partitioned-layout files (never pruned)."""
        m = _BPART_RE.search(relpath)
        return (int(m.group(1)), int(m.group(2))) if m else None

    def _pruned_files(
        self, spark: SparkSession, batch_bands: DataFrame
    ) -> list[str]:
        """The subset of index files that can hold buckets the batch's
        band rows hit: for each writer partition count K present in the
        file set, ONE tiny agg over the (already materialized) batch
        bands collects its ≤K distinct ``pmod(hash(band_hash), K)``
        values, and files in other partitions are provably match-free
        for the equi-join. Legacy files without a ``__bpart`` segment
        are always kept (conservative, read-compatible)."""
        allf = self.files()
        ks = {p[0] for p in map(self._file_part, allf) if p is not None}
        if not ks:
            return allf
        hit: dict[int, set[int]] = {}
        for k in sorted(ks):
            hit[k] = {
                r[0]
                for r in batch_bands.select(
                    F.pmod(F.hash(F.col("band_hash")), F.lit(k)).alias("p")
                )
                .distinct()
                .collect()
            }
        out = []
        for f in allf:
            fp = self._file_part(f)
            if fp is None or fp[1] in hit.get(fp[0], set()):
                out.append(f)
        return out

    def read(
        self, spark: SparkSession, files: list[str] | None = None
    ) -> DataFrame:
        """The persisted band relation; ``files`` restricts to a pruned
        subset (see :meth:`_pruned_files`)."""
        rel = self.files() if files is None else files
        paths = [os.path.join(self.table.root, p) for p in rel]
        if not paths:
            return spark.createDataFrame([], BAND_SCHEMA)
        return spark.read.schema(BAND_SCHEMA).parquet(*paths)

    def candidates(
        self,
        spark: SparkSession,
        new_docs: DataFrame,
        id_col: str = "doc_id",
        max_bucket: int | None = None,
        return_oversized: bool = False,
    ):
        """Near-dup candidates of an incoming batch against the indexed
        corpus: bands of ``new_docs`` (the ONLY shingle pass in the plan)
        equi-joined to the persisted band files. Output (new_id,
        existing_id, n_shared_bands). ``countDistinct(band_idx)`` rather
        than ``count(*)``: an updated document holds band rows from both
        text versions, and a band index must count once even if both
        match.

        ``max_bucket`` caps the EXISTING side per (band_idx, band_hash)
        bucket — the same boilerplate/skew defense as
        ``minhash_lsh_candidates``: an indexed bucket larger than the cap
        (shared template text across the corpus) is represented by its
        min doc_id only, so a batch doc matching it emits ONE candidate
        per band instead of |bucket| — O(batch) output even when the
        whole corpus shares a band. Members of such a bucket are already
        transitively connected through past epochs' labeling, so group
        connectivity is preserved via the representative; pair recall
        inside oversized buckets is the documented trade-off — and is
        RECOVERED adaptively when the caller re-probes failed star
        edges (``return_oversized=True`` +
        ``text_dedup.reprobe_star_failures``, the DedupLabels default).
        ``None`` keeps exact semantics.

        ``return_oversized=True`` returns ``(pairs, mem, star)``: ``mem``
        = (bkey, doc_id, rep) membership of oversized EXISTING buckets
        (re-probe targets, read from the index files only); ``star`` =
        (bkey, member, rep) with member = the NEW doc whose candidate
        edge was capped to the bucket representative."""
        from .operators.text_dedup import _bkey

        nb_rel = _band_rows(
            persist_tracked(minhash_signatures(new_docs, id_col)), id_col
        )
        nb = nb_rel.alias("n")
        # partition pruning (round-6 VERDICT #1): read ONLY the index
        # files whose directory partition the batch's band hashes hit —
        # the sizes aggregation and the candidates equi-join below then
        # scan O(batch-hit partitions), not the whole corpus index. A
        # bucket's rows all live in one partition per writer-K, so hit
        # buckets' sizes stay complete and the join output is identical
        # (non-hit buckets could never match the batch anyway).
        eb_all = self.read(spark, files=self._pruned_files(spark, nb_rel))
        mem = star = None
        eb = eb_all
        if max_bucket is not None:
            sizes = eb_all.groupBy("band_idx", "band_hash").agg(
                F.count(F.lit(1)).alias("__n"), F.min("doc_id").alias("__rep")
            )
            if return_oversized:
                # sizes feeds the cap filter AND the star/mem relations:
                # persisting it (one small row per bucket) keeps the
                # O(index) scan+agg to a single execution per epoch —
                # re-probe bookkeeping must never add a second index scan
                sizes = persist_tracked(sizes)
            big = sizes.filter(F.col("__n") > max_bucket)
            eb = (
                eb_all.join(sizes, ["band_idx", "band_hash"])
                .filter(
                    (F.col("__n") <= max_bucket)
                    | (F.col("doc_id") == F.col("__rep"))
                )
                .select("doc_id", "band_idx", "band_hash")
            )
            if return_oversized:
                # membership restricted to oversized buckets the BATCH
                # actually hits: only those can produce failed star
                # edges, and without the semi-join mem would be
                # O(all oversized index rows) per epoch instead of
                # O(buckets touched by the batch)
                hit = nb.select("band_idx", "band_hash").distinct()
                mem = eb_all.join(
                    big.join(hit, ["band_idx", "band_hash"], "leftsemi"),
                    ["band_idx", "band_hash"],
                ).select(
                    _bkey().alias("bkey"),
                    "doc_id",
                    F.col("__rep").alias("rep"),
                )
                # member != rep: an UPDATED batch doc that equals its
                # oversized existing bucket's min doc_id would otherwise
                # emit a self star edge — unverifiable by construction,
                # so failed.count()>0 tripped the whole re-probe pipeline
                # (panel agg + second verify pass) on every such epoch,
                # silently defeating the "zero extra jobs on genuine
                # cliques" property (round-6 ADVICE medium). Output was
                # always correct; this is purely the cost trigger.
                star = nb.join(
                    big.select("band_idx", "band_hash", "__rep"),
                    ["band_idx", "band_hash"],
                ).filter(F.col(f"n.{id_col}") != F.col("__rep")).select(
                    _bkey().alias("bkey"),
                    F.col(f"n.{id_col}").alias("member"),
                    F.col("__rep").alias("rep"),
                )
        eb = eb.alias("e")
        pairs = (
            nb.join(eb, on=["band_idx", "band_hash"])
            .groupBy(
                F.col(f"n.{id_col}").alias("new_id"),
                F.col("e.doc_id").alias("existing_id"),
            )
            .agg(F.countDistinct("band_idx").alias("n_shared_bands"))
        )
        return (pairs, mem, star) if return_oversized else pairs


    # --- maintenance ---------------------------------------------------

    def rebuild(self, spark: SparkSession, tag: str = "rebuild") -> dict:
        """Rewrite the index from the table's CURRENT visible rows,
        dropping the stale band rows document updates leave behind (the
        append-only write path's documented trade-off) — the index
        analog of table compaction, and the natural time to run it.
        Lost-update-safe: the swap validates the aux file list against
        the base the rebuild read (``IceliteTable.set_aux``) and raises
        ``CommitConflict`` if an epoch landed meanwhile — re-run then.
        Old index dirs become unreferenced; ``expire_snapshots`` sweeps
        them once no retained snapshot lists them. The artifact's
        ``rows_total`` counter resets to the rebuilt (all-live) count,
        so the stale-fraction trigger re-arms from zero."""
        base = self.files()
        snap = self.table.snapshot()
        docs = self.table.read(spark)
        epoch = max(snap["committed_epochs"], default=0)
        files = self.write_epoch(
            self.rows_for(docs, epoch), f"{tag}-v{snap['version'] + 1:06d}"
        )
        return self.table.set_aux(
            AUX_NAME,
            files,
            base_files=base,
            extra={"rows_total": _parquet_rows(self.table.root, files)},
        )


#: aux-section name of the incremental near-dup group labels
LABELS_AUX = "dedup_labels"

#: default oversized-band-bucket cap for the maintained labeling — safe
#: by default since round 6 (failed star edges are re-probed, see
#: DedupLabels.__init__); bounds any shared-boilerplate bucket to O(k)
#: star edges instead of k²/2 pairs
DEFAULT_MAX_BUCKET = 64

LABELS_SCHEMA = T.StructType(
    [
        T.StructField("node", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("__epoch", T.LongType()),
    ]
)


class DedupLabels:
    """Near-duplicate GROUP LABELS maintained incrementally at epoch
    commit — the full dedup pipeline inside the exactly-once ingest
    loop: batch → candidates from the persisted band index (new×existing)
    plus an in-batch LSH self-join (new×new) → exact-Jaccard verification
    against current text → ``merge_components_delta`` fold into the
    persisted labeling.

    Storage is icelite-MOR-shaped: per-epoch parquet deltas of ONLY the
    rows whose label is new or changed, recorded in the snapshot aux
    section (same atomic CAS as the data and the band index); reads
    resolve latest-per-node by ``__epoch``. Per-batch cost: the corpus
    appears only as (a) the band-file equi-join (no re-shingling), (b) a
    bucket-PRUNED text scan of just the candidate partners for
    verification, and (c) streamed broadcast probes of the labels
    relation inside ``merge_components_delta`` — no corpus shuffle, no
    corpus rewrite.

    Semantics: labels are the canonical min-labeling; groups are
    MONOTONE (an update to a member's text can add edges, never remove
    them — splitting groups requires a full recompute, the standard
    incremental-dedup trade-off). Tombstoned docs keep their last label;
    downstream keeper-selection joins drop them naturally.
    """

    def __init__(
        self,
        table: IceliteTable,
        index: LshBandIndex,
        threshold: float = 0.35,
        max_bucket: int | None = DEFAULT_MAX_BUCKET,
        reprobe: int = 8,
        reliable_checkpoint: str | None = None,
    ):
        self.table = table
        self.index = index
        self.threshold = threshold
        #: checkpoint dir for the (rare) distributed components fallback
        #: — makes mid-loop executor loss survivable on a real cluster;
        #: None = fast localCheckpoint (see operators.graph._materialize)
        self.reliable_checkpoint = reliable_checkpoint
        #: oversized-band-bucket cap (see LshBandIndex.candidates /
        #: minhash_lsh_candidates) — ON BY DEFAULT since round 6. The
        #: cap bounds batches of near-identical texts (templated turns,
        #: shared boilerplate) to O(batch) candidates via representative
        #: star edges — the defense against the measured O(n²) clique
        #: blow-up (a 256-char shared suffix turned a 200k-doc batch
        #: into ~2×10¹⁰ candidate pairs). The historical footgun — a
        #: member of a FALSE-POSITIVE-dominated bucket whose rep edge
        #: failed verification lost its would-have-verified edges to
        #: other members, fragmenting groups — is closed (mostly) by the
        #: verification-aware re-probe: failed members re-pair with a
        #: per-bucket pseudo-random panel, so a member of a genuine
        #: subgroup occupying fraction q of its bucket reconnects with
        #: probability 1-(1-q)^reprobe. The residual is SMALL but real
        #: (measured 37/22053 verified pairs on the streaming-generator
        #: corpus, pinned <1% in tests) and confined to pairs whose ONLY
        #: shared buckets are oversized; pairs sharing any small bucket
        #: stay exact. ``None`` restores exact all-pairs closure
        #: semantics at O(n²)-per-bucket risk.
        self.max_bucket = max_bucket
        #: probe-panel size for failed star edges; 0 disables re-probe
        #: (restoring the pre-round-6 capped semantics)
        self.reprobe = reprobe

    def files(self) -> list[str]:
        return list(
            self.table.snapshot().get("aux", {}).get(LABELS_AUX, {}).get("files", [])
        )

    def read(self, spark: SparkSession) -> DataFrame:
        """Resolved labeling: smallest label per node across epoch deltas.

        Labels are MONOTONE NON-INCREASING per node — every delta row
        either introduces a node (label ≤ its own id) or remaps its
        current label to a condensed component's minimum (strictly
        smaller), so ``min(label)`` IS the latest label. The previous
        ``max_by(label, __epoch)`` resolution additionally depended on
        the epoch stamp, and several SLICES of one epoch (streaming tail
        with ``max_files_per_trigger``, open-epoch batch replay) all
        stamp the same ``__epoch`` — a node re-labeled by a later slice
        tied with the earlier slice's row and max_by picked an arbitrary
        one, nondeterministically splitting groups (round-5 ADVICE
        medium). ``min`` is order- and stamp-independent."""
        paths = [os.path.join(self.table.root, p) for p in self.files()]
        if not paths:
            return spark.createDataFrame([], LABELS_SCHEMA).select("node", "label")
        return (
            spark.read.schema(LABELS_SCHEMA)
            .parquet(*paths)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )

    def _batch_docs(self, batch: DataFrame) -> DataFrame:
        if "op" in batch.columns:
            batch = batch.filter(F.col("op") != "D")
        return batch.select(
            F.concat_ws("#", *self.table.key_cols()).alias("doc_id"),
            F.col(self.index.text_col).alias("text"),
        ).filter(F.col("text").isNotNull())

    def delta_for_epoch(
        self, spark: SparkSession, batch: DataFrame, epoch: int
    ) -> DataFrame:
        """Label-delta rows (node, label, __epoch) this batch causes.
        Must run against the PRE-commit snapshot (the index/labels as of
        the previous epoch — the batch's own band rows join the snapshot
        only with this epoch's commit).

        Per-epoch cost (round-5 VERDICT #1, the ~57 s/epoch fixed floor,
        now cut): the persisted labels are read+resolved ONCE per epoch
        (tracked persist — they feed the probe and the relabel join);
        the components fold runs DRIVER-SIDE over the collected verified
        edge set (O(batch) rows) instead of the ~10-job distributed star
        loop — see graph.merge_components_delta's driver fast path; and
        re-probe verification rides the same plan as the primary
        verification, costing zero extra jobs when no star edge fails."""
        from .operators.graph import merge_components_delta
        from .operators.text_dedup import (
            jaccard_verify_pairs,
            minhash_lsh_candidates,
            probe_panel,
        )

        bd_all = self._batch_docs(batch)
        prev = persist_tracked(self.read(spark))
        # EXACT-dup collapse before LSH (the standard pipeline order, and
        # a scale requirement): k identical texts in one batch would band
        # into a k-clique — k² candidate pairs through verification —
        # while contributing one node of information. One representative
        # per distinct text runs the LSH/verify path; the other members
        # join its component through trivial exact edges.
        dg = persist_tracked(bd_all.withColumn("__d", F.md5("text")))
        reps = dg.groupBy("__d").agg(F.min("doc_id").alias("__rep"))
        with_rep = dg.join(F.broadcast(reps), "__d")
        bd = with_rep.filter(F.col("doc_id") == F.col("__rep")).select(
            "doc_id", "text"
        )
        exact_edges = with_rep.filter(F.col("doc_id") != F.col("__rep")).select(
            F.col("__rep").alias("id_a"), F.col("doc_id").alias("id_b")
        )
        reprobing = self.max_bucket is not None and self.reprobe > 0
        nx_out = self.index.candidates(
            spark, bd, max_bucket=self.max_bucket, return_oversized=reprobing
        )
        nn_out = minhash_lsh_candidates(
            bd, max_bucket=self.max_bucket, return_oversized=reprobing
        )
        mem = star = None
        if reprobing:
            nx_pairs, mem_x, star_x = nx_out
            nn_pairs, mem_n, star_n = nn_out
            # oversized buckets can coincide across the two sides (same
            # band key in the batch and the index): the star edges and
            # (lazily, only on failure) the probe membership merge
            star = star_x.unionByName(star_n)
            mem = mem_x.unionByName(mem_n).select("bkey", "doc_id")
        else:
            nx_pairs, nn_pairs = nx_out, nn_out
        from .operators.graph import _materialize

        nx = nx_pairs.filter(F.col("new_id") != F.col("existing_id")).select(
            F.col("new_id").alias("id_a"), F.col("existing_id").alias("id_b")
        )
        nn = nn_pairs.select("id_a", "id_b")
        from .operators.graph import _no_constraint_propagation

        # cand and docs_v are TRUNCATION points (checkpoint, not persist):
        # each feeds several downstream consumers, and a persisted
        # relation only dedupes EXECUTION — Catalyst re-analyzes its full
        # logical subtree in every consumer, and those subtrees multiply
        # through the verify/re-probe join levels (observed 3×10⁷-char
        # plans per epoch with persist-only). Both are materialized at
        # this point of the epoch anyway. The guard covers the Spark
        # Union-over-cached-relation constraint-rewrite crash (see
        # operators.graph._no_constraint_propagation) — both are unions
        # whose branches reuse tracked-persisted relations.
        with _no_constraint_propagation(spark):
            cand = _materialize(
                nx.union(nn).distinct(), self.reliable_checkpoint
            )
        ids = (
            cand.select(F.col("id_a").alias("doc_id"))
            .union(cand.select(F.col("id_b").alias("doc_id")))
            .distinct()
        )
        # verification corpus: batch text (an updated doc verifies
        # against its CURRENT text) + candidate partners' stored text,
        # scanned only in the buckets the partners live in (distinct
        # bucket ids are <= n_buckets — a tiny driver collect, same
        # precedent as the COW merge's affected-bucket pruning)
        kc = self.table.key_cols()
        ftype = self.table.schema()[kc[0]].dataType
        conv = (
            F.substring_index(F.col("doc_id"), "#", 1)
            if len(kc) > 1
            else F.col("doc_id")
        ).cast(ftype)
        buckets = {
            r[0]
            for r in ids.select(
                F.pmod(F.hash(conv), F.lit(self.table.n_buckets()))
                .cast("int")
                .alias("b")
            )
            .distinct()
            .collect()
        }
        batch_ids = bd_all.select("doc_id")
        ex_docs = (
            self.table.read_resolved(spark, buckets=buckets)
            .filter(~F.col("__deleted"))
            .select(
                F.concat_ws("#", *kc).alias("doc_id"),
                F.col(self.index.text_col).alias("text"),
            )
            .join(F.broadcast(batch_ids), "doc_id", "left_anti")
        )
        with _no_constraint_propagation(spark):
            docs_v = _materialize(
                bd.union(ex_docs).join(F.broadcast(ids), "doc_id"),
                self.reliable_checkpoint,
            )
        # the verify pipeline (shingle joins over candidate partners) is
        # the expensive subtree; merge_components_delta materializes its
        # edge-set input exactly once (driver collect or checkpoint)
        verified = persist_tracked(
            jaccard_verify_pairs(docs_v, cand, threshold=self.threshold)
        )
        pairs = verified.select("id_a", "id_b")
        if star is not None:
            # materialize the verification ONCE (it feeds the pairs union
            # and the failed-star anti-join), then check for failures.
            # The check runs ONLY over cached relations (star derives
            # from the persisted signatures/bands/sizes — no index scan,
            # no shingle pass), so on a genuine-clique corpus — where
            # every rep edge verifies — the safe default costs one cheap
            # anti-join job and nothing else. Probe membership, panel
            # and partner text are built ONLY when a failure exists.
            verified.count()
            vnorm = verified.select(
                F.least("id_a", "id_b").alias("na"),
                F.greatest("id_a", "id_b").alias("nb"),
            ).distinct()
            # failed and probes are TRUNCATION points, not mere persists:
            # the failure path nests verified/star/panel subtrees through
            # several join levels, and every level doubles the subtree's
            # occurrences in downstream plans — caching dedupes execution
            # but Catalyst still ANALYZES the full tree (observed: a
            # 7×10⁸-char plan string on the bench corpus). Checkpointing
            # these two small relations keeps every downstream plan
            # shallow; both are materialized here anyway (the count / the
            # probe-bucket collect).
            failed = _materialize(
                star.select(
                    "bkey",
                    "member",
                    F.least("member", "rep").alias("na"),
                    F.greatest("member", "rep").alias("nb"),
                )
                .join(vnorm, ["na", "nb"], "left_anti")
                .select("bkey", "member"),
                self.reliable_checkpoint,
            )
            if failed.count() > 0:
                fmem = mem.join(
                    F.broadcast(failed.select("bkey").distinct()), "bkey"
                )
                panel = probe_panel(fmem, panel_size=self.reprobe)
                probes = _materialize(
                    failed.join(panel, "bkey")
                    .filter(F.col("probe_id") != F.col("member"))
                    .select(
                        F.least("member", "probe_id").alias("id_a"),
                        F.greatest("member", "probe_id").alias("id_b"),
                    )
                    .distinct(),
                    self.reliable_checkpoint,
                )
                ids2 = (
                    probes.select(F.col("id_a").alias("doc_id"))
                    .union(probes.select(F.col("id_b").alias("doc_id")))
                    .distinct()
                )
                buckets2 = {
                    r[0]
                    for r in ids2.select(
                        F.pmod(F.hash(conv), F.lit(self.table.n_buckets()))
                        .cast("int")
                        .alias("b")
                    )
                    .distinct()
                    .collect()
                }
                ex2 = (
                    self.table.read_resolved(spark, buckets=buckets2)
                    .filter(~F.col("__deleted"))
                    .select(
                        F.concat_ws("#", *kc).alias("doc_id"),
                        F.col(self.index.text_col).alias("text"),
                    )
                    .join(F.broadcast(batch_ids), "doc_id", "left_anti")
                )
                docs_v2 = bd.union(ex2).join(F.broadcast(ids2), "doc_id")
                pairs = pairs.union(
                    jaccard_verify_pairs(
                        docs_v2, probes, threshold=self.threshold
                    ).select("id_a", "id_b")
                )
        pairs = pairs.union(exact_edges)
        delta = merge_components_delta(
            prev,
            pairs,
            new_nodes=bd_all.select(F.col("doc_id").alias("node")),
            reliable_checkpoint=self.reliable_checkpoint,
        )
        return delta.withColumn("__epoch", F.lit(epoch).cast("long"))

    def write_epoch(self, rows: DataFrame, tag: str) -> list[str]:
        """Same write/orphan protocol as :meth:`LshBandIndex.write_epoch`
        under ``index/dedup_labels/<tag>``."""
        rel = f"index/dedup_labels/{tag}"
        out = os.path.join(self.table.root, rel)
        if os.path.exists(out):
            shutil.rmtree(out)
        (
            rows.repartition(self.table.n_buckets(), F.col("node"))
            .write.mode("overwrite")
            .parquet(out)
        )
        return sorted(
            f"{rel}/{f}" for f in os.listdir(out) if f.endswith(".parquet")
        )

    def compact(self, spark: SparkSession, tag: str = "compact") -> dict:
        """Fold the per-epoch label deltas into one resolved file set
        (latest-per-node) — read-amplification maintenance, exactly the
        table's MOR compaction for the labels artifact. Content is
        IDENTICAL before/after by construction; lost-update-safe via
        ``IceliteTable.set_aux``."""
        base = self.files()
        snap = self.table.snapshot()
        epoch = max(snap["committed_epochs"], default=0)
        resolved = self.read(spark).withColumn(
            "__epoch", F.lit(epoch).cast("long")
        )
        files = self.write_epoch(resolved, f"{tag}-v{snap['version'] + 1:06d}")
        return self.table.set_aux(LABELS_AUX, files, base_files=base)


def ingest_documents(
    spark: SparkSession,
    root: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8,
    dedup_labels: bool = False,
    epoch: int = 0,
    table: IceliteTable | None = None,
    max_bucket: int | None | str = "auto",
) -> tuple[IceliteTable, LshBandIndex]:
    """Create an icelite table keyed by ``id_col`` from a documents
    relation and ingest it as one epoch with the band index (and, with
    ``dedup_labels=True``, the incremental group labeling) maintained in
    the same atomic commit — the corpus-bootstrap path (and the fixture
    for the ``lsh_index_candidates`` / ``engine_dedup_labels`` registry
    queries). Pass the returned ``table`` back in to apply FURTHER
    epochs incrementally. Idempotent under redelivery: an epoch already
    in ``committed_epochs`` skips BOTH the data apply and the aux write
    (round-5 ADVICE: the old deterministic ``e{epoch}`` tag rmtree'd the
    COMMITTED index dir on re-invocation, leaving the snapshot pointing
    at deleted files while the data apply skipped; tags are now unique
    per attempt, same as the engine's)."""
    import uuid

    from .operators.merge import apply_delta_epoch

    if table is None:
        payload = T.StructType(
            [f for f in docs.schema.fields if f.name in (id_col, text_col)]
        )
        table = IceliteTable.create(
            root, payload, n_buckets=n_buckets, key_cols=[id_col], overwrite=True
        )
    index = LshBandIndex(table, text_col=text_col)
    if epoch in table.committed_epochs():
        return table, index  # redelivered epoch: data AND aux already committed
    # deterministic lsn: documents are unique per id, any constant works
    batch = docs.select(id_col, text_col).withColumns(
        {"op": F.lit("U"), "lsn": F.lit(epoch).cast("long")}
    )
    tag = f"e{epoch:06d}-{uuid.uuid4().hex[:8]}"
    band_files = index.write_epoch(index.rows_for(batch, epoch), tag)
    aux_add = {
        AUX_NAME: {
            "files": band_files,
            "config": {"text_col": text_col},
            "rows_add": _parquet_rows(table.root, band_files),
        }
    }
    if dedup_labels:
        mb = DEFAULT_MAX_BUCKET if max_bucket == "auto" else max_bucket
        labels = DedupLabels(table, index, max_bucket=mb)
        aux_add[LABELS_AUX] = {
            "files": labels.write_epoch(
                labels.delta_for_epoch(spark, batch, epoch), tag
            ),
            "config": {"threshold": labels.threshold, "max_bucket": mb},
        }
    apply_delta_epoch(spark, table, batch, epoch=epoch, aux_add=aux_add)
    release_caches()
    return table, index
