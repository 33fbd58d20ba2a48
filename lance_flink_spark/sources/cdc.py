"""Checkpointed change-feed consumption — the Flink-CDC subscription
loop over a Dataset's change data feed.

Structured Streaming's file source cannot express per-commit row
lineage (supersession), so the changelog consumer is the same shape
Spark itself uses for arbitrary sinks: a bounded micro-batch loop with
a durable cursor, exactly ``foreachBatch``'s contract —

- each call processes the change rows of a bounded version range
  (``max_versions_per_batch`` caps plan size the same way
  ``read_changes``'s localCheckpoint cap does),
- the cursor (last fully processed version) is committed AFTER the
  callback returns, so a crash replays at most the in-flight batch:
  at-least-once for free, exactly-once when the callback is idempotent
  (e.g. tagged Dataset writes or MaterializedAggregate folds — both
  provided here and both idempotent by construction).

An overwrite in the feed raises, as everywhere in the CDF: consumers
restart from the post-overwrite snapshot (``reset_to_latest``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lance_flink_spark.sources import fsio
from lance_flink_spark.sources.dataset import Dataset


class ChangeFeedConsumer:
    """Incremental CDF subscription with a durable version cursor."""

    def __init__(
        self,
        source: Dataset,
        checkpoint_path: str,
        key: str,
        update_preimages: bool = False,
    ):
        self.source = source
        self.checkpoint_path = checkpoint_path
        self.key = key
        self.update_preimages = update_preimages

    def _cursor_file(self) -> str:
        return fsio.join(self.checkpoint_path, "CDC_CURSOR.json")

    def position(self) -> int:
        """Last fully processed source version (0 = nothing yet)."""
        if not fsio.exists(self._cursor_file()):
            return 0
        return int(fsio.read_json(self._cursor_file())["version"])

    def _commit_cursor(self, version: int) -> None:
        fsio.makedirs(self.checkpoint_path)
        fsio.write_json_atomic(self._cursor_file(), {"version": version})

    def reset_to(self, version: int) -> int:
        """Position the cursor at ``version`` without processing —
        start consuming AFTER it (e.g. an index built at v_n subscribes
        from v_n, folding only later commits)."""
        self._commit_cursor(int(version))
        return int(version)

    def reset_to_latest(self) -> int:
        """Skip the backlog (e.g. after an overwrite broke lineage):
        position the cursor at the current head without processing."""
        head = (self.source.versions() or [0])[-1]
        self._commit_cursor(head)
        return head

    def process_available(
        self,
        spark: SparkSession,
        callback: Callable[[DataFrame, int, int], None],
        max_versions_per_batch: int = 16,
    ) -> int:
        """Drain every committed version past the cursor in bounded
        batches; returns the number of batches processed. ``callback``
        receives (changes_df, from_version_exclusive, to_version) —
        commit-ordered, at-least-once on crash (idempotent callbacks
        make it exactly-once, the foreachBatch contract)."""
        if max_versions_per_batch < 1:
            raise ValueError("max_versions_per_batch must be >= 1")
        versions = self.source.versions()
        head = versions[-1] if versions else 0
        batches = 0
        pos = self.position()
        while pos < head:
            hi = min(pos + max_versions_per_batch, head)
            changes = self.source.read_changes(
                spark,
                key=self.key,
                since_version=pos,
                version=hi,
                update_preimages=self.update_preimages,
            )
            callback(changes, pos, hi)
            self._commit_cursor(hi)
            pos = hi
            batches += 1
        return batches


class ChangeFeedStream:
    """Bridge a Dataset's change data feed into Structured Streaming —
    the Flink ``upsert-kafka``-as-SOURCE shape (a keyed changelog
    consumed AS a stream), closing the CDC loop: source table →
    change feed → stream → keyed upsert sink → replica.

    Structured Streaming's file source cannot compute per-commit row
    lineage, so the feed is SPOOLED: :meth:`pump` drains committed
    versions past the durable cursor and stages each bounded version
    range as one parquet directory carrying the changelog columns the
    upsert sink consumes —

    - ``_op``: 'D' for deletes, 'U' for inserts/updates (post-images);
    - ``_seq``: the commit version — the changelog's total order;
    - ``_seq2``: 0 for deletes, 1 for upserts — within ONE commit a
      mutated key emits its delete pre-image AND its new copy, and the
      new copy must win the sink's last-writer-wins fold.

    Spool writes are per-version-range directories written with
    OVERWRITE and the cursor commits after the write: a crash replays
    at most the in-flight range into the same directory (idempotent),
    the exactly-once recipe every sink in this repo uses.
    :meth:`read_stream` exposes the spool as an mtime-ordered file
    stream (``maxFilesPerTrigger`` per spool file) ready for
    ``UpsertDatasetSink`` with ``seq_cols=['_seq', '_seq2']`` (append
    finer tiebreakers, e.g. an event-time column, when one commit can
    carry several upserts per key)."""

    def __init__(
        self,
        source: Dataset,
        spool_dir: str,
        key: str,
        max_versions_per_batch: int = 16,
    ):
        self.source = source
        self.spool_dir = spool_dir
        self.key = key
        self.max_versions_per_batch = int(max_versions_per_batch)
        self.consumer = ChangeFeedConsumer(
            source, fsio.join(spool_dir, "_cursor"), key
        )

    def pump(self, spark: SparkSession) -> int:
        """Drain newly committed versions into the spool; returns the
        number of spool files written. Call per poll tick (or after
        known commits) — the stream picks new files up on its next
        micro-batch."""
        from pyspark.sql import functions as F

        data = fsio.join(self.spool_dir, "data")
        fsio.makedirs(data)

        def _stage(changes: DataFrame, lo: int, hi: int) -> None:
            out = changes.select(
                *[c for c in changes.columns if not c.startswith("_change")],
                F.when(F.col("_change_type") == "delete", F.lit("D"))
                .otherwise(F.lit("U"))
                .alias("_op"),
                F.col("_version").alias("_seq"),
                F.when(F.col("_change_type") == "delete", F.lit(0))
                .otherwise(F.lit(1))
                .cast("long")
                .alias("_seq2"),
            ).drop("_version")
            # deterministic dir per version range + overwrite = a
            # replayed range after a crash rewrites the same files
            out.coalesce(1).write.mode("overwrite").parquet(
                fsio.join(data, f"v{lo + 1:06d}-{hi:06d}")
            )

        return self.consumer.process_available(
            spark, _stage, max_versions_per_batch=self.max_versions_per_batch
        )

    def read_stream(self, spark: SparkSession) -> DataFrame:
        """The spooled changelog as a streaming DataFrame (schema from
        the spool itself — pump at least once first)."""
        data = fsio.join(self.spool_dir, "data")
        schema = spark.read.parquet(data + "/*").schema
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(data + "/*")
        )
