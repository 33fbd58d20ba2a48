"""Streaming UPSERT sink: fold a keyed changelog stream into a
versioned Dataset.

Flink parity: the reference ecosystem's `upsert-kafka` / retract-sink
model — a stream whose rows are keyed +upsert / -delete changes, where
the SINK owns materializing "latest state per key". Here each
micro-batch folds through one deletion-vector MERGE
(Dataset.merge_when, WHEN-clause semantics) with the batch id as an
idempotency tag recorded atomically inside the manifest commit:

- exactly-once: a replayed batch (post-crash, rewound checkpoint)
  finds its tag and is a no-op — same contract as
  ExactlyOnceDatasetSink (streaming/sink.py), extended from
  append-only to keyed changelogs;
- deletes tombstone positions (deletion files), updates tombstone +
  append the new copy, inserts append — no data file is ever
  rewritten, so per-batch cost ∝ batch size, not table size;
- out-of-order tolerance: with ``seq_cols`` the merge clauses are
  SEQUENCE-GUARDED (apply only if the incoming row is not older than
  the stored row — lexicographic over the sequence columns), the
  event-time last-writer-wins that Flink's deduplicate-then-upsert
  pipelines implement. Without ``seq_cols`` the stream must be
  per-key ordered (the upsert-kafka contract);
- delete tombstone MEMORY: a delete physically removes the row, so a
  stale change arriving in a LATER batch would otherwise resurrect it
  through the NOT-MATCHED insert path. With ``seq_cols`` the sink
  keeps a retraction log (its own tiny Dataset beside the state
  table: one (key, seq) row per applied delete, idempotent per batch
  tag) and drops incoming changes older than the key's last
  retraction before merging — delete-then-stale-update converges to
  "deleted" regardless of arrival order. The log is delete-sized and
  broadcast into the filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lance_flink_spark.sources.dataset import Dataset


def _seq_guard(seq_cols: list[str]) -> str:
    """SQL for "source row is at least as new as the target row" —
    lexicographic over the sequence columns, the standard
    last-writer-wins guard."""
    terms = []
    for i, c in enumerate(seq_cols):
        eqs = " AND ".join(f"s.`{p}` = t.`{p}`" for p in seq_cols[:i])
        cmp_ = ">=" if i == len(seq_cols) - 1 else ">"
        terms.append(f"({eqs + ' AND ' if eqs else ''}s.`{c}` {cmp_} t.`{c}`)")
    return "(" + " OR ".join(terms) + ")"


class UpsertDatasetSink:
    """foreachBatch sink folding a keyed changelog into a Dataset.

    ``op_col`` names the change-kind column of the stream (projected
    away before landing); any value in ``delete_ops`` is a retraction,
    everything else an upsert. ``seq_cols`` (optional) order changes
    per key — needed whenever micro-batches are not per-key ordered
    (file replays, late data): within a batch the newest change per
    key wins, across batches the merge clauses are sequence-guarded.
    """

    def __init__(
        self,
        path: str,
        key: str,
        op_col: str = "_op",
        seq_cols: list[str] | None = None,
        delete_ops: tuple[str, ...] = ("D", "-D", "delete"),
        files_per_batch: int = 8,
    ):
        self.dataset = Dataset(path)
        self.key = key
        self.op_col = op_col
        self.seq_cols = list(seq_cols or [])
        self.delete_ops = tuple(delete_ops)
        # appended-fragment fan-out per micro-batch: a broadcast-joined
        # merge keeps the scan's partitioning, so without this a small
        # batch sheds dozens of near-empty files per commit (the
        # small-files tax). Raise it for genuinely large micro-batches.
        self.files_per_batch = int(files_per_batch)
        # tombstone memory for out-of-order changelogs (see module
        # docstring); lives beside the state table, NOT under data/
        # (invisible to the state table's fragment globs and vacuum)
        self.retractions = Dataset(path.rstrip("/") + "_retractions")

    def _fold_batch(self, df: DataFrame) -> DataFrame:
        """Newest change per key within the batch (by seq_cols); with
        no seq_cols the batch must already be one-change-per-key
        (merge_when's duplicate-key probe enforces it loudly)."""
        if not self.seq_cols:
            return df
        w = Window.partitionBy(self.key).orderBy(
            *[F.col(c).desc() for c in self.seq_cols]
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter("__rn = 1")
            .drop("__rn")
        )

    def _log_retractions(self, folded: DataFrame, tag: str) -> None:
        """Remember this batch's deletes (key, seq) in the retraction
        log BEFORE merging — tagged, so replays no-op. Log-then-merge
        ordering is the crash-safe direction: a crash in between
        replays into a no-op log write + a fresh merge, while the
        reverse order could commit the merge and lose the memory."""
        if not self.seq_cols:
            return
        dels = folded.filter(
            F.col(self.op_col).isin(list(self.delete_ops))
        ).select(self.key, *self.seq_cols)
        # skip_empty folds the "any deletes this batch?" probe into the
        # write job itself (one job, one commit-or-nothing) — the
        # separate take(1) previously cost a full extra job per batch
        self.retractions.write(
            dels.coalesce(1), mode="append", tag=tag, skip_empty=True
        )

    def _drop_pre_retraction(self, spark, folded: DataFrame) -> DataFrame:
        """Drop changes STRICTLY older than the key's last logged
        retraction: a stale update arriving after a newer delete must
        not resurrect the row through the NOT-MATCHED insert path.
        Strict (<) so a replayed delete (seq == its own log entry)
        still reaches the merge. The log is delete-sized — broadcast."""
        if not self.seq_cols or not self.retractions.versions():
            return folded
        r = (
            self.retractions.read(spark)
            .groupBy(self.key)
            .agg(F.max(F.struct(*self.seq_cols)).alias("__rseq"))
        )
        return (
            folded.join(F.broadcast(r), self.key, "left")
            .filter(
                F.col("__rseq").isNull()
                | (F.struct(*self.seq_cols) >= F.col("__rseq"))
            )
            .drop("__rseq")
        )

    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook — idempotent via the manifest tag."""
        spark = df.sparkSession
        tag = f"upsert-{int(batch_id)}"
        if self.dataset.find_tag(tag) is not None:
            return  # replayed batch: already folded, exactly-once no-op
        # the folded batch feeds THREE consumers (retraction log, the
        # staleness filter, the merge) — persist it so the per-batch
        # window shuffle runs once, not three times
        folded = self._fold_batch(df).persist()
        try:
            self._write_folded(spark, folded, tag)
        finally:
            folded.unpersist()

    def _write_folded(self, spark, folded: DataFrame, tag: str) -> None:
        # the staleness filter depends only on PRIOR batches' log
        # entries (folded keeps one row per key — a key retracted THIS
        # batch has its delete row as that one row, which the strict-<
        # filter keeps regardless), so the filter reads the log BEFORE
        # this batch's write and the write itself can overlap the
        # merge's write jobs; the merge's pre_commit barrier joins it
        # before the manifest swap, preserving log-before-visible-merge
        # crash safety exactly.
        filtered = self._drop_pre_retraction(spark, folded)
        dels = "', '".join(self.delete_ops)
        is_del = f"s.`{self.op_col}` IN ('{dels}')"
        if not self.dataset.versions():
            self._log_retractions(folded, tag)
            folded = filtered
            # first batch bootstraps the table: no state to merge into,
            # surviving upserts land as the initial fragment (deletes
            # of never-seen keys leave only their retraction-log entry)
            first = folded.filter(
                ~F.col(self.op_col).isin(list(self.delete_ops))
            ).drop(self.op_col)
            if not self.seq_cols:
                # same strictness as the merge path (merge_when's dup
                # probe): without a sequence there is no defined winner
                dup = (
                    first.groupBy(self.key)
                    .count()
                    .filter("count > 1")
                    .limit(1)
                    .collect()
                )
                if dup:
                    raise ValueError(
                        f"bootstrap batch has multiple rows for key "
                        f"{dup[0][0]!r} and no seq_cols to pick a winner"
                    )
            self.dataset.write(
                first.coalesce(self.files_per_batch), mode="append", tag=tag
            )
            return
        guard = _seq_guard(self.seq_cols) if self.seq_cols else None
        data_cols = [
            c for c in self.dataset.read(spark).columns if c != self.key
        ]
        clauses = [
            {
                "matched": True,
                "cond": f"{is_del}{' AND ' + guard if guard else ''}",
                "action": "delete",
            },
            {
                "matched": True,
                "cond": guard,
                "action": "update",
                "sets": {c: f"s.`{c}`" for c in data_cols},
            },
            {"matched": False, "cond": f"NOT ({is_del})", "action": "insert"},
        ]
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(1) as pool:
            log_fut = pool.submit(self._log_retractions, folded, tag)
            self.dataset.merge_when(
                spark,
                filtered,
                on=self.key,
                clauses=clauses,
                dv=True,
                tag=tag,
                # _fold_batch already kept exactly the newest row per key,
                # so the merge's duplicate-key probe (one shuffle + driver
                # round-trip per micro-batch) is structurally redundant
                assume_unique_keys=bool(self.seq_cols),
                new_fragment_partitions=self.files_per_batch,
                # the log write overlaps the merge's write jobs but must
                # be durable before the merge commits (crash safety)
                pre_commit=log_fut.result,
            )

    def compact_log(self, spark) -> int | None:
        """Fold the retraction log to ONE row per key (its newest
        retraction) in a single overwrite version — the log is the
        sink's only growth axis (a row per applied delete), and only
        the per-key maximum ever matters to the staleness filter. Run
        like any table maintenance when deletes dominate; returns the
        new log version (None when there is no log). CAS-protected
        (snapshot-derived overwrite), so a concurrent batch's append
        cannot be silently erased."""
        if not self.seq_cols or not self.retractions.versions():
            return None
        base = len(self.retractions.versions())
        folded = (
            self.retractions.read(spark)
            .groupBy(self.key)
            .agg(F.max(F.struct(*self.seq_cols)).alias("__s"))
            .select(self.key, "__s.*")
        )
        return self.retractions.write(
            folded, mode="overwrite", expected_version=base
        )

    def attach(self, sdf: DataFrame, checkpoint: str):
        """Wire onto a streaming DataFrame: returns the DataStreamWriter."""
        return sdf.writeStream.foreachBatch(self.write_batch).option(
            "checkpointLocation", checkpoint
        )

    def run_available(self, sdf: DataFrame, checkpoint: str) -> None:
        """Drain everything currently available (availableNow trigger)
        and block until done — the bounded-replay entry point."""
        q = self.attach(sdf, checkpoint).trigger(availableNow=True).start()
        q.awaitTermination()


class UpsertNativeSink:
    """foreachBatch sink folding a keyed changelog into a NATIVE Lance
    dataset — :class:`UpsertDatasetSink`'s contract on the native
    format (round 14): each micro-batch lands as ONE manifest commit
    through ``lance_native.mutate_rows_distributed`` (deletion files
    written INSIDE per-fragment executor tasks tombstone replaced/
    retracted rows, executor-written fragments carry the new images —
    no driver row gate on the batch). With the changelog-mode native stream
    source on the other side this closes the FULLY-native replication
    loop: native table → readChanges stream → keyed upsert → native
    replica.

    Same semantics as the parquet sink: ``seq_cols`` makes the fold
    and the cross-batch guards last-writer-wins (stale updates after a
    newer delete are dropped through the same parquet-backed
    retraction log); without them the stream must be one-change-per-
    key per batch (probed, loud). Idempotency: a batchId marker under
    ``_stream_commits/`` (the native streaming sink's scheme) makes
    replayed batches no-ops; the crash window between manifest commit
    and marker write is CONTENT-idempotent — a replayed upsert
    re-matches its key and rewrites the same image, a replayed delete
    re-deletes — so state converges with at most a duplicated
    version."""

    def __init__(
        self,
        root: str,
        key: str,
        op_col: str = "_op",
        seq_cols: list[str] | None = None,
        delete_ops: tuple[str, ...] = ("D", "-D", "delete"),
        files_per_batch: int = 8,
    ):
        self.root = root.rstrip("/")
        self.key = key
        self.op_col = op_col
        self.seq_cols = list(seq_cols or [])
        self.delete_ops = tuple(delete_ops)
        self.files_per_batch = int(files_per_batch)
        self.retractions = Dataset(self.root + "_retractions")

    # -- the fold / retraction-memory trio mirrors UpsertDatasetSink --

    def _fold_batch(self, df: DataFrame) -> DataFrame:
        if not self.seq_cols:
            return df
        w = Window.partitionBy(self.key).orderBy(
            *[F.col(c).desc() for c in self.seq_cols]
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter("__rn = 1")
            .drop("__rn")
        )

    def _log_retractions(self, folded: DataFrame, tag: str) -> None:
        if not self.seq_cols:
            return
        dels = folded.filter(
            F.col(self.op_col).isin(list(self.delete_ops))
        ).select(self.key, *self.seq_cols)
        self.retractions.write(
            dels.coalesce(1), mode="append", tag=tag, skip_empty=True
        )

    def _drop_pre_retraction(self, spark, folded: DataFrame) -> DataFrame:
        if not self.seq_cols or not self.retractions.versions():
            return folded
        r = (
            self.retractions.read(spark)
            .groupBy(self.key)
            .agg(F.max(F.struct(*self.seq_cols)).alias("__rseq"))
        )
        return (
            folded.join(F.broadcast(r), self.key, "left")
            .filter(
                F.col("__rseq").isNull()
                | (F.struct(*self.seq_cols) >= F.col("__rseq"))
            )
            .drop("__rseq")
        )

    def _probe_unique(self, df: DataFrame, what: str) -> None:
        if self.seq_cols:
            return  # the fold already kept exactly one row per key
        dup = df.groupBy(self.key).count().filter("count > 1").limit(1).collect()
        if dup:
            raise ValueError(
                f"{what} has multiple rows for key {dup[0][0]!r} and no "
                "seq_cols to pick a winner"
            )

    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook — idempotent via the batchId marker."""
        import os
        from concurrent.futures import ThreadPoolExecutor

        spark = df.sparkSession
        tag = f"upsert-{int(batch_id)}"
        marker = os.path.join(self.root, "_stream_commits", tag)
        if os.path.exists(marker):
            return  # replayed batch
        folded = self._fold_batch(df).persist()
        try:
            # the staleness filter depends only on PRIOR batches' log
            # entries (folded keeps one row per key — a key retracted
            # THIS batch has its delete row as that one row, which the
            # >= filter keeps regardless), so the filter reads the log
            # BEFORE this batch's write and the log write overlaps the
            # mutation's Spark jobs; the pre_commit barrier joins it
            # before the manifest swap, preserving log-before-visible-
            # mutation crash safety exactly (the parquet sink's shape)
            filtered = self._drop_pre_retraction(spark, folded)
            self._probe_unique(filtered, "micro-batch")
            with ThreadPoolExecutor(1) as pool:
                log_fut = pool.submit(self._log_retractions, folded, tag)
                v = self._apply(spark, filtered, pre_commit=log_fut.result)
        finally:
            folded.unpersist()
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        with open(marker, "w") as f:
            f.write(str(v))

    def _apply(self, spark, filtered: DataFrame, pre_commit=None) -> int:
        import os

        from lance_flink_spark.sources.lance_native import (
            LanceNativeDataset,
            mutate_rows_distributed,
            read_distributed,
            spark_read_schema,
            write_dataset_distributed,
        )

        is_del = F.col(self.op_col).isin(list(self.delete_ops))
        if not os.path.isdir(os.path.join(self.root, "_versions")):
            # bootstrap: surviving upserts become the initial fragments
            # (log durability first — this path has no pre-manifest hook).
            # coalesce to files_per_batch: a micro-batch inherits the
            # shuffle-partition count, and one FRAGMENT per partition
            # explodes the table into row-count-~30 fragments that every
            # later read/delete-resolve pays one task each for
            # (guide §6 small-files; the parquet sink's knob)
            if pre_commit is not None:
                pre_commit()
            write_dataset_distributed(
                self.root,
                filtered.filter(~is_del)
                .drop(self.op_col)
                .coalesce(self.files_per_batch),
            )
            return 1
        nds = LanceNativeDataset(self.root)
        # matched rows from an INNER join (broadcast-able: a micro-
        # batch is small next to the table — a full_outer would
        # shuffle the whole replica every batch); unmatched target
        # rows are untouched by definition. The table schema comes
        # straight from the manifest (spark_read_schema) — building a
        # full distributed-read plan per micro-batch just for
        # ``.schema`` paid a task frame + broadcast + plan analysis of
        # driver time; the join decodes just key + seq_cols (+ __phys):
        # updated images come from the SOURCE side, so the other
        # target pages are never read (projection into the
        # per-fragment decode, guide §4/§6)
        tfields, _tfr, _tv = nds._manifest()
        tschema = spark_read_schema(spark, tfields)
        cols = [f.name for f in tschema.fields]
        tsch = {f.name: f.dataType for f in tschema.fields}
        need = [self.key] + [c for c in self.seq_cols if c != self.key]
        t = read_distributed(
            nds, spark, with_offsets=True, columns=need
        ).alias("t")
        s = filtered.alias("s")
        # persist the matched frame (bounded by the micro-batch's key
        # matches): its three consumers — tombstone offsets, updated
        # images, matched-key anti-join build side — would otherwise
        # each re-decode the whole replica
        # broadcast the BATCH side explicitly: both join inputs are
        # opaque to the optimizer (mapInPandas decode vs a stream
        # micro-batch), so without the hint this falls to a
        # sort-merge join that shuffles the whole replica decode; a
        # micro-batch is trigger-size-bounded, so the broadcast is
        # the same contract as the F.broadcast(mk) below (guide §3)
        # localCheckpoint, not persist (r16): the consumers run in
        # concurrent jobs (fragment write ∥ deletion resolve, plus the
        # matched-key broadcast build), and concurrent first touches
        # of an unmaterialized cache were re-running the full replica
        # key decode 3-4x per micro-batch. The eager checkpoint pays
        # the decode exactly once AND truncates the lineage, so the
        # downstream jobs neither re-analyze the mapInArrow decode
        # plan nor ship it in their task binaries.
        m = t.join(
            F.broadcast(s),
            F.col(f"t.`{self.key}`") == F.col(f"s.`{self.key}`"),
            "inner",
        ).localCheckpoint(eager=True)
        try:
            guard = (
                F.expr(_seq_guard(self.seq_cols))
                if self.seq_cols
                else F.lit(True)
            )
            sdel = F.col(f"s.`{self.op_col}`").isin(list(self.delete_ops))
            # every matched row whose change wins its guard is
            # tombstoned — replaced (upsert) or gone (delete); losers
            # keep the old row. Offsets stay a DataFrame: deletion
            # files are written inside per-fragment tasks
            # (mutate_rows_distributed), so there is NO driver row
            # gate on the batch size (r15 — the old path collected
            # offsets under a 4M gate)
            winners = m.filter(guard)
            offs_df = winners.select(F.col("t.`__phys`").alias("__phys"))
            updates = winners.filter(~sdel).select(
                *[F.col(f"s.`{c}`").cast(tsch[c]).alias(c) for c in cols]
            )
            mk = m.select(
                F.col(f"s.`{self.key}`").alias(self.key)
            ).distinct()
            inserts = (
                filtered.join(F.broadcast(mk), self.key, "left_anti")
                .filter(~F.col(self.op_col).isin(list(self.delete_ops)))
                .select(
                    *[F.col(f"`{c}`").cast(tsch[c]).alias(c) for c in cols]
                )
            )
            return mutate_rows_distributed(
                self.root,
                offs_df,
                # same small-files guard as the bootstrap: the
                # replacement/insert images of one micro-batch belong
                # in files_per_batch fragments, not one per shuffle
                # partition
                updates.unionByName(inserts).coalesce(self.files_per_batch),
                expected_version=nds._manifests[-1],
                pre_commit=pre_commit,
                # offs_df = per-fragment read -> broadcast join ->
                # filter -> select: narrow ops only, so partition i
                # still holds exactly fragment i's offsets — the
                # deletion resolve skips its shuffle
                offsets_aligned=True,
            )
        finally:
            m.unpersist()

    def attach(self, sdf: DataFrame, checkpoint: str):
        """``stream.writeStream.foreachBatch(sink.write_batch)`` with
        the checkpoint set — the parquet sink's convenience shape."""
        return (
            sdf.writeStream.foreachBatch(self.write_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
        )
