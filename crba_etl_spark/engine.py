"""CDC engine orchestrator: epoch-at-a-time apply with exactly-once commit.

The lifecycle (SURVEY.md §3.1 graft mapping): change tail → per epoch:
LSN dedup → latest-per-key reduce → partition-pruned MERGE → atomic
commit (data + schema + epoch marker in one rename) → metrics row.
Re-delivered epochs are detected from the snapshot's committed-epoch set
and skipped (idempotent). Resume = replay; committed epochs no-op, so a
kill at any point between epochs (or between data write and pointer
rename) converges to the identical final state.

Reference analog: the orchestrator loop over selected sources with
per-source failure isolation (``/root/reference/etl/run.py:1-3``) and
whole-pipeline re-run idempotence.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import time

from pyspark.sql import DataFrame, Observation, SparkSession, types as T

from .icelite import IceliteTable
from .metrics import write_epoch_metrics
from .operators.dedup import reduce_batch
from .operators.merge import apply_delta_epoch, merge_epoch
from .schema import TRANSCRIPT

_EPOCH_DIR = re.compile(r"^epoch=(\d+)$")


def _footer_schema(path: str):
    """Spark schema of a parquet file from its FOOTER, read driver-side
    with pyarrow (~1 ms) so ``spark.read`` can skip its own inference
    pass — measured r7: schema-provided reads plan ~0.1-0.15 s faster
    per epoch, a fixed cost the replay loop pays once per epoch (guide
    §1.2 step 2: per-task/driver fixed work after the algorithm is
    right). Naive arrow timestamps are mapped to TimestampType, matching
    the session's ``inferTimestampNTZ=false`` so the provided schema is
    bit-identical to what inference would return. Returns None on any
    surprise (caller falls back to inference)."""
    try:
        import pyarrow.parquet as pq
        from pyspark.sql import types as T
        from pyspark.sql.pandas.types import from_arrow_schema

        st = from_arrow_schema(pq.ParquetFile(path).schema_arrow)
        fields = []
        for f in st.fields:
            dt = f.dataType
            if isinstance(dt, T.TimestampNTZType):
                dt = T.TimestampType()
            elif not isinstance(
                dt,
                (
                    T.AtomicType,
                    T.NumericType,
                ),
            ):
                return None  # nested/exotic types: let Spark infer
            fields.append(T.StructField(f.name, dt, f.nullable))
        return T.StructType(fields)
    except Exception:
        return None


def _declared_files(events_dir: str, k: int) -> set[str] | None:
    """The producer's epoch-complete declaration (``_DONE`` marker) — a
    GET of a known key, never an eventually-consistent LIST. ``None``
    means the epoch is still open (see streaming/tail.py, which shares
    this contract)."""
    try:
        with open(os.path.join(events_dir, f"epoch={k}", "_DONE")) as f:
            return set(json.load(f)["files"])
    except FileNotFoundError:
        return None


def list_epochs(events_dir: str) -> list[int]:
    out = []
    for d in os.listdir(events_dir):
        m = _EPOCH_DIR.match(d)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


class CDCEngine:
    def __init__(
        self,
        spark: SparkSession,
        table_root: str,
        payload_schema: T.StructType = TRANSCRIPT,
        n_buckets: int = 32,
        quarantine: str | bool = "lazy",
        mode: str = "mor",
        compact_every: int | None = None,
        max_deltas_per_bucket: int = 16,
        max_delta_bytes_per_bucket: int | None = None,
        lsh_index: bool = False,
        lsh_text_col: str = "text",
        dedup_labels: bool = False,
        dedup_max_bucket: int | None | str = "auto",
        stale_rebuild_threshold: float = 0.5,
        reliable_cc_checkpoints: bool = False,
        labels_compact_epochs: int = 16,
    ):
        """``mode`` picks the apply strategy (both yield identical final
        state; both are tested against the same oracle):

        - ``"mor"`` (merge-on-read, default): each epoch appends per-bucket
          delta files — apply cost O(batch) regardless of table size; reads
          resolve max-LSN per key; compaction folds deltas into the base
          when a bucket accumulates ``max_deltas_per_bucket`` delta files,
          ``max_delta_bytes_per_bucket`` delta bytes (size-tiered — epochs
          vary in size, so a byte threshold tracks actual read
          amplification where a file count cannot), or every
          ``compact_every`` epochs if set. All three are driver-local
          metadata checks (manifest + file sizes), zero Spark jobs.
        - ``"cow"`` (copy-on-write): each epoch eagerly merges and rewrites
          the affected buckets — reads are pure scans, but apply cost grows
          with table size. Right when batches are huge relative to the
          table or reads vastly outnumber writes.

        ``quarantine`` controls stale/low-LSN event auditing:

        - ``"lazy"`` (default): stale rows are extracted during compaction
          from the stored ``__epoch``/``__lsn`` columns — zero per-epoch
          cost (measured: eager auditing costs ~3x apply throughput,
          because it re-scans the table every epoch → O(table²) total).
        - ``"eager"``: per-epoch audit; the quarantine table for epoch k is
          complete the moment k commits (COW mode audits eagerly for free —
          the merge join already sees both sides).
        - ``False``: off.

        ``lsh_index=True`` maintains the persisted MinHash band index
        (band_index.py) over ``lsh_text_col``: each epoch's band rows are
        written alongside the delta files and recorded in the SAME
        snapshot commit, so incremental near-dup candidate generation
        against the ingested corpus reads only the index — O(batch) per
        batch, independent of corpus size. Costs one extra shingle pass
        over the batch per epoch.

        ``dedup_labels=True`` (implies ``lsh_index``) additionally folds
        each batch into the persisted near-dup GROUP labeling
        (band_index.DedupLabels): index candidates → exact-Jaccard
        verify → incremental components delta — the complete dedup
        pipeline inside the exactly-once commit loop, O(changed) label
        rows written per epoch.

        ``dedup_max_bucket`` caps oversized LSH band buckets with
        representative star edges — O(batch) candidates under
        shared-boilerplate corpora. ON BY DEFAULT (``"auto"`` →
        band_index.DEFAULT_MAX_BUCKET) since round 6: failed star edges
        are re-probed against a per-bucket alternate panel, closing MOST
        of the group-fragmentation footgun that used to make the cap
        opt-in (see band_index.DedupLabels — pairs sharing any small
        bucket stay exact; pairs confined to oversized buckets keep a
        small probabilistic residual, pinned <1% in tests). Pass
        ``None`` for exact all-pairs closure semantics (O(n²)-per-bucket
        risk on shared-boilerplate corpora).

        ``stale_rebuild_threshold``: the index write path is append-only
        (a document UPDATE appends new band rows; the old ones stay and
        inflate candidate generation), so every commit accumulates the
        epoch's band-row count into the artifact's ``rows_total`` and
        :meth:`compact` estimates the stale fraction — 1 − live/total,
        live bounded by N_BANDS × stored table rows, both from parquet
        FOOTERS (driver-side, no jobs). When the estimate crosses this
        threshold, compaction rebuilds the indexes automatically (the
        CAS-safe ``rebuild`` path), so a standing ingest with updates
        can no longer grow candidate inflation unboundedly waiting for
        an operator to remember ``--rebuild-indexes`` (round-5 VERDICT
        #3). The estimate UNDERSTATES staleness (tombstones and
        null-text rows count as live), so it only ever triggers late,
        never spuriously. Set >1.0 to disable.

        ``reliable_cc_checkpoints=True`` routes the dedup-labels
        components loops' lineage truncation to durable ``checkpoint()``
        files under ``<table_root>/checkpoints/cc`` (executor loss
        mid-loop is then survivable on a real cluster — with the default
        ``localCheckpoint`` it kills the job); off locally, where there
        are no executors to lose.

        ``labels_compact_epochs``: the labels artifact is MOR-shaped —
        every epoch appends a delta file set and the per-epoch
        resolution scan (``DedupLabels.read``) grows with the delta
        count between compactions (the second residual-floor component
        in BENCH/INDEX_OVERHEAD.md, round-6 VERDICT #2). When the
        number of per-epoch delta sets reaches this threshold,
        :meth:`compact` folds them into one resolved set automatically
        (lost-update-safe CAS, content identical by construction) —
        read-amplification maintenance as a property of the table's
        state, exactly like the data table's ``max_deltas_per_bucket``.
        Set ≤0 to disable.
        """
        assert mode in ("mor", "cow")
        if quarantine is True:
            quarantine = "lazy"
        assert quarantine in ("lazy", "eager", False, None)
        self.spark = spark
        self.mode = mode
        self.quarantine = quarantine or None
        self.compact_every = compact_every
        self.max_deltas_per_bucket = max_deltas_per_bucket
        self.max_delta_bytes_per_bucket = max_delta_bytes_per_bucket
        self.stale_rebuild_threshold = stale_rebuild_threshold
        self.labels_compact_epochs = labels_compact_epochs
        self.table = IceliteTable.create(table_root, payload_schema, n_buckets)
        self.quarantine_dir = (
            os.path.join(table_root, "quarantine") if quarantine else None
        )
        self.metrics_dir = os.path.join(table_root, "metrics")
        self._applied_since_compact = 0
        if lsh_index or dedup_labels:
            from .band_index import DEFAULT_MAX_BUCKET, DedupLabels, LshBandIndex

            self.lsh_index = LshBandIndex(self.table, text_col=lsh_text_col)
            if dedup_max_bucket == "auto":
                dedup_max_bucket = DEFAULT_MAX_BUCKET
            self.dedup_labels = (
                DedupLabels(
                    self.table,
                    self.lsh_index,
                    max_bucket=dedup_max_bucket,
                    reliable_checkpoint=(
                        os.path.join(table_root, "checkpoints", "cc")
                        if reliable_cc_checkpoints
                        else None
                    ),
                )
                if dedup_labels
                else None
            )
        else:
            self.lsh_index = None
            self.dedup_labels = None

    # --- single-epoch apply --------------------------------------------------

    def apply_epoch(
        self,
        events: DataFrame,
        epoch: int,
        slice_marker: str | None = None,
        mark_epoch: bool = True,
        slice_files: list[str] | None = None,
        source_aligned: bool = False,
    ) -> dict:
        """Dedup + reduce + merge + commit one epoch. No-op if the epoch
        is already committed (exactly-once under redelivery).

        ``slice_marker`` (streaming): the events are one micro-batch
        slice of the epoch — idempotence keys on the marker, not the
        epoch id, so an epoch whose files span micro-batches is applied
        fully (each slice exactly once). ``mark_epoch=False`` keeps the
        epoch id out of ``committed_epochs`` when the slice is not known
        to complete the epoch; ``slice_files`` records the slice's source
        file names in the snapshot so completeness can be decided from
        the cumulative union across slices (see streaming/tail.py).

        ``source_aligned=True`` (MOR mode): the caller guarantees the
        events are ALREADY clustered by the table's bucket function —
        a Spark table bucketed by (n_buckets, conv_id), or a keyed
        Kafka topic with partitions = buckets (icelite.bucket_expr is
        deliberately identical to Spark's repartition/bucketBy murmur3
        hash so such producers align without re-hashing). The apply
        then runs EXCHANGE-FREE end to end: the reduce needs no
        shuffle (bucket partitioning satisfies the group clustering)
        and the bucketed write none either — measured, this removes
        the per-epoch exchange (~45% of epoch cost locally; the only
        network shuffle on a cluster; BENCH/EPOCH_PROFILE.md). Safe on
        misaligned input: Catalyst inserts the missing exchange for
        the reduce and the write assigns buckets by VALUE, so the
        penalty is extra files per bucket — never wrong rows."""
        if slice_marker is not None:
            if slice_marker in self.table.committed_slices():
                if mark_epoch and epoch not in self.table.committed_epochs():
                    # a retried slice can be the FIRST to know the epoch
                    # is complete (late _DONE marker): the data skip must
                    # still land the exactly-once epoch marker, or it is
                    # permanently missed (round-3 ADVICE)
                    self.table.mark_epoch_committed(epoch)
                    return {
                        "epoch": epoch,
                        "skipped": True,
                        "reason": "slice committed; epoch marker promoted",
                    }
                return {"epoch": epoch, "skipped": True, "reason": "slice committed"}
            if epoch in self.table.committed_epochs():
                # a committed epoch's declared file set is fully covered,
                # so every slice of it — even under a fresh checkpoint's
                # renumbered markers — is redundant by the _DONE contract
                return {"epoch": epoch, "skipped": True, "reason": "already committed"}
        elif epoch in self.table.committed_epochs():
            return {"epoch": epoch, "skipped": True, "reason": "already committed"}

        obs = Observation(f"events-in-{epoch}")
        events = events.observe(obs, *_count_alias())
        from pyspark.sql import functions as F

        pre_partitioned = self.mode == "mor"
        if pre_partitioned and source_aligned:
            # producer already clustered rows by the bucket function —
            # skip THE one exchange of the epoch entirely
            pass
        elif pre_partitioned:
            # THE one exchange of the epoch: repartition(N, conv_id) with
            # N = table bucket count and bucket = pmod(hash(conv_id), N)
            # (see icelite.bucket_expr) both clusters rows for the
            # latest-per-key reduce (conv_id ⊆ group key ⇒ no agg
            # exchange) and lands each row in its bucket's partition
            # (⇒ the bucketed delta write shuffles nothing)
            events = events.repartition(
                self.table.n_buckets(), F.col("conv_id")
            )
        reduced = reduce_batch(events)
        # MOR + lazy: per-epoch audit skipped; compaction extracts stale
        # rows from __epoch/__lsn (COW audits in the merge join anyway)
        eager_dir = (
            self.quarantine_dir
            if (self.quarantine == "eager" or self.mode == "cow")
            else None
        )
        aux_add = None
        persisted = None
        if self.lsh_index is not None:
            # the batch feeds two consumers now (band rows + apply), so
            # pin it once instead of recomputing the reduce shuffle;
            # index files hit disk BEFORE the commit that references them
            # (a failed commit leaves an orphan dir, swept by expiry)
            persisted = reduced.persist()
            import uuid

            # unique per attempt: a deterministic tag could collide with
            # a COMMITTED dir on raced redelivery and rmtree files the
            # snapshot references; an abandoned attempt's dir is just an
            # unreferenced orphan (expire_snapshots sweeps it)
            tag = f"e{epoch:06d}-{uuid.uuid4().hex[:8]}"
            from .band_index import AUX_NAME

            from .band_index import _parquet_rows

            band_files = self.lsh_index.write_epoch(
                self.lsh_index.rows_for(persisted, epoch), tag
            )
            # config rides the aux entry (first write wins) so a later
            # maintenance run — possibly a CLI engine constructed with
            # defaults — rebuilds with the parameters the index was
            # BUILT with, not silently different ones (round-5 ADVICE);
            # rows_add feeds the stale-fraction maintenance trigger
            # (footer metadata, no job)
            aux_add = {
                AUX_NAME: {
                    "files": band_files,
                    "config": {"text_col": self.lsh_index.text_col},
                    "rows_add": _parquet_rows(self.table.root, band_files),
                }
            }
            if self.dedup_labels is not None:
                # computed against the PRE-commit snapshot (index/labels
                # as of the previous epoch) and written before the data
                # commit references it; intermediates (signatures,
                # candidate set) are scoped to this block
                from .band_index import LABELS_AUX
                from .cache import tracked_caches

                with tracked_caches():
                    aux_add[LABELS_AUX] = {
                        "files": self.dedup_labels.write_epoch(
                            self.dedup_labels.delta_for_epoch(
                                self.spark, persisted, epoch
                            ),
                            tag,
                        ),
                        "config": {
                            "threshold": self.dedup_labels.threshold,
                            "max_bucket": self.dedup_labels.max_bucket,
                        },
                    }
            reduced = persisted
        try:
            if self.mode == "mor":
                stats = apply_delta_epoch(
                    self.spark,
                    self.table,
                    reduced,
                    epoch,
                    quarantine_dir=eager_dir,
                    pre_partitioned=True,
                    slice_marker=slice_marker,
                    mark_epoch=mark_epoch,
                    slice_files=slice_files,
                    aux_add=aux_add,
                )
            else:
                stats = merge_epoch(
                    self.spark,
                    self.table,
                    reduced,
                    epoch,
                    quarantine_dir=eager_dir,
                    slice_marker=slice_marker,
                    mark_epoch=mark_epoch,
                    slice_files=slice_files,
                    aux_add=aux_add,
                )
        finally:
            if persisted is not None:
                persisted.unpersist()
        if not stats.get("skipped"):
            stats["events_in"] = int(obs.get["events_in"])
            if slice_marker is not None:
                stats["slice"] = slice_marker
            write_epoch_metrics(self.table, self.metrics_dir, stats)
            self._applied_since_compact += 1
            self._maybe_compact()
        return stats

    def _maybe_compact(self) -> None:
        if self.mode != "mor":
            return
        due = (
            self.compact_every is not None
            and self._applied_since_compact >= self.compact_every
        )
        if not due:
            deltas = self.table.deltas()
            due = any(
                len(v) >= self.max_deltas_per_bucket for v in deltas.values()
            )
            if not due and self.max_delta_bytes_per_bucket is not None:
                due = any(
                    sum(
                        os.path.getsize(os.path.join(self.table.root, f))
                        for f in v
                    )
                    >= self.max_delta_bytes_per_bucket
                    for v in deltas.values()
                )
        if due:
            self.compact()

    def index_stale_frac(self) -> float:
        """Estimated stale fraction of the persisted band index:
        1 − (N_BANDS × stored table rows) / rows_total, every term from
        parquet footers / snapshot bookkeeping — no Spark jobs. An
        UNDER-estimate (tombstones and null-text rows inflate the live
        bound), so the auto-rebuild trigger fires late, never
        spuriously. 0.0 when no index (or no counter) exists."""
        from .band_index import AUX_NAME, _parquet_rows
        from .operators.text_dedup import N_BANDS

        ent = self.table.snapshot().get("aux", {}).get(AUX_NAME, {})
        total = int(ent.get("rows_total", 0))
        if total <= 0:
            return 0.0
        # data_files() returns absolute paths; os.path.join with an
        # absolute second arg is a no-op, so the helper is reusable here.
        # An unreadable DATA footer shrinks the live bound — which would
        # INFLATE the stale estimate and could fire a spurious (CAS-safe
        # but expensive) auto-rebuild, contradicting the "fires late,
        # never spuriously" contract (round-6 ADVICE low) — so footer
        # failures on the stored side disable the trigger for this call.
        failures: list[str] = []
        stored = _parquet_rows(
            self.table.root, self.table.data_files(), failures=failures
        )
        if failures:
            import logging

            logging.getLogger(__name__).warning(
                "index_stale_frac: %d unreadable data footers (e.g. %s); "
                "returning 0.0 so the auto-rebuild cannot trigger on an "
                "undercounted live bound",
                len(failures),
                failures[0],
            )
            return 0.0
        return max(0.0, 1.0 - (N_BANDS * stored) / total)

    def compact(
        self, drop_tombstones: bool = False, rebuild_indexes: bool = False
    ) -> None:
        """Fold MOR deltas into the base; in lazy-quarantine mode this is
        also where stale/low-LSN rows are extracted for audit.
        ``rebuild_indexes=True`` additionally rewrites the maintained aux
        artifacts: the band index from current text (dropping the stale
        rows updates left behind) and the labels to one resolved file
        set — each a lost-update-safe CAS swap (band_index.py). Even
        without the flag, the rebuild runs AUTOMATICALLY when the
        recorded stale fraction crosses ``stale_rebuild_threshold`` —
        maintenance is a property of the table's measured state, not of
        an operator remembering a flag (round-5 VERDICT #3)."""
        self.table.compact(
            self.spark,
            drop_tombstones=drop_tombstones,
            quarantine_dir=(
                self.quarantine_dir if self.quarantine == "lazy" else None
            ),
        )
        self._applied_since_compact = 0
        if not rebuild_indexes:
            rebuild_indexes = (
                self.index_stale_frac() >= self.stale_rebuild_threshold
            )
        if rebuild_indexes:
            # rebuild whatever artifacts the TABLE records, not just what
            # this engine instance was constructed with — a maintenance
            # CLI run (`compact --rebuild-indexes`) must not silently
            # no-op on a table whose ingest engine maintains the index —
            # and with the CONFIG the artifact was built with (recorded
            # in the aux entry at write time; a CLI engine constructed
            # without lsh flags would otherwise re-index a non-default
            # lsh_text_col table over the wrong column, round-5 ADVICE)
            from .band_index import (
                AUX_NAME,
                DEFAULT_MAX_BUCKET,
                LABELS_AUX,
                DedupLabels,
                LshBandIndex,
            )

            aux = self.table.aux()
            if AUX_NAME in aux or self.lsh_index is not None:
                icfg = aux.get(AUX_NAME, {}).get("config", {})
                index = self.lsh_index or LshBandIndex(
                    self.table, text_col=icfg.get("text_col", "text")
                )
                index.rebuild(self.spark)
                if LABELS_AUX in aux or self.dedup_labels is not None:
                    lcfg = aux.get(LABELS_AUX, {}).get("config", {})
                    # a MISSING max_bucket key (pre-round-6 aux entry)
                    # means the engine default, not None-exact — an
                    # explicit None (exact semantics) is preserved
                    # (round-6 VERDICT #5)
                    labels = self.dedup_labels or DedupLabels(
                        self.table,
                        index,
                        threshold=lcfg.get("threshold", 0.35),
                        max_bucket=lcfg.get("max_bucket", DEFAULT_MAX_BUCKET),
                    )
                    labels.compact(self.spark)
            return
        # labels-delta auto-compaction (round-6 VERDICT #2): even without
        # an index rebuild, fold the per-epoch label delta sets once
        # their count reaches the threshold — the per-epoch labels
        # resolution (DedupLabels.read: groupBy-min over every delta
        # file) otherwise grows without bound between manual compacts.
        # One tag dir per epoch write; compaction leaves exactly one.
        if self.labels_compact_epochs and self.labels_compact_epochs > 0:
            from .band_index import (
                DEFAULT_MAX_BUCKET,
                LABELS_AUX,
                DedupLabels,
                LshBandIndex,
            )

            aux = self.table.aux()
            ent = aux.get(LABELS_AUX)
            if ent:
                tags = {p.split("/")[2] for p in ent.get("files", []) if "/" in p}
                if len(tags) >= self.labels_compact_epochs:
                    lcfg = ent.get("config", {})
                    labels = self.dedup_labels or DedupLabels(
                        self.table,
                        self.lsh_index
                        or LshBandIndex(
                            self.table,
                            text_col=aux.get("lsh_bands", {})
                            .get("config", {})
                            .get("text_col", "text"),
                        ),
                        threshold=lcfg.get("threshold", 0.35),
                        max_bucket=lcfg.get("max_bucket", DEFAULT_MAX_BUCKET),
                    )
                    labels.compact(self.spark)

    # --- batch replay / resume -------------------------------------------------

    def replay(
        self, events_dir: str, epochs: list[int] | None = None, verbose: bool = False
    ) -> dict:
        """Apply every epoch under ``events_dir/epoch=*`` in order,
        skipping already-committed ones (checkpoint resume). Returns a
        replay summary with sustained apply throughput.

        Epoch completeness is the producer's ``_DONE`` declaration, the
        same contract the streaming tail honors (round-4 ADVICE): an
        epoch enters ``committed_epochs`` — which makes every future
        slice of it redundant by contract — only when the files applied
        cover the declared set. An epoch directory with no ``_DONE``
        (producer still writing) is applied as a content-addressed
        SLICE with the epoch left open, so files landing later still
        apply (by a later replay or the streaming tail) instead of
        being permanently dropped. Files already applied by earlier
        slices of an open epoch are not re-read."""
        epochs = epochs if epochs is not None else list_epochs(events_dir)
        t0 = time.monotonic()
        total_events = 0
        applied, skipped = [], []
        for k in epochs:
            d = os.path.join(events_dir, f"epoch={k}")
            if k in self.table.committed_epochs():
                skipped.append(k)
                continue
            listed = sorted(
                f for f in os.listdir(d) if f.endswith(".parquet")
            )
            declared = _declared_files(events_dir, k)
            prior = set(self.table.epoch_files().get(str(k), []))
            todo = [f for f in listed if f not in prior]
            complete = declared is not None and set(listed) | prior >= declared
            if not todo:
                if complete:
                    # every declared file already landed via slices; only
                    # the exactly-once marker is missing (late _DONE)
                    self.table.mark_epoch_committed(k)
                skipped.append(k)
                continue
            paths = [os.path.join(d, f) for f in todo]
            reader = self.spark.read
            fs = _footer_schema(paths[0])
            if fs is not None:
                reader = reader.schema(fs)
            df = reader.parquet(*paths)
            if complete:
                st = self.apply_epoch(df, k, slice_files=todo)
            else:
                marker = "e%d:batch:%s" % (
                    k,
                    hashlib.sha1("\n".join(todo).encode()).hexdigest()[:16],
                )
                st = self.apply_epoch(
                    df, k, slice_marker=marker, mark_epoch=False, slice_files=todo
                )
            if st.get("skipped"):
                skipped.append(k)
            else:
                applied.append(st)
                total_events += st["events_in"]
            if verbose:
                print(st)
        wall = time.monotonic() - t0
        return {
            "epochs_applied": [s["epoch"] for s in applied],
            "epochs_skipped": skipped,
            "events_applied": total_events,
            "wall_s": round(wall, 3),
            "events_per_sec": round(total_events / wall, 1) if wall > 0 else None,
            "per_epoch": applied,
        }

    def read_final(self) -> DataFrame:
        return self.table.read(self.spark)


def _count_alias():
    from pyspark.sql import functions as F

    return [F.count(F.lit(1)).alias("events_in")]
