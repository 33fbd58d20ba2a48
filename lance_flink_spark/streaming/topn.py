"""Streaming Top-N — Flink SQL's Top-N pattern (ROW_NUMBER() OVER
(PARTITION BY cat ORDER BY metric DESC) <= N over a continuously
updated aggregate) re-expressed on Structured Streaming.

Structured Streaming cannot rank an update stream directly (no ranking
windows over aggregate output), so the operator splits the Flink query
at exactly the seam Flink's own planner does — an upstream
GroupAggFunction feeding a downstream rank node:

1. each micro-batch reduces to per-(partition, key) partial sums
   (map-side combine — the shuffle carries groups, not events), and
2. ``foreachBatch`` folds them into a versioned-Dataset state table
   via an idempotent overwrite (batch-id tag inside the atomic
   manifest swap — a replayed batch is a no-op, the same exactly-once
   contract as ExactlyOnceDatasetSink), then
3. ``results()`` ranks the state table with the plain batch window —
   the state is GROUP-cardinality-sized, so the rank shuffle is tiny
   no matter how many events streamed through.

State growth is the distinct-key count (Flink's Top-N keeps the same
per-key aggregate state); every version of the state table is
time-travelable like any Dataset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lance_flink_spark.sources.dataset import Dataset


class StreamingTopN:
    def __init__(
        self,
        state_path: str,
        part_cols: list[str],
        key_cols: list[str],
        value_col: str,
        n: int,
    ):
        self.state = Dataset(state_path)
        self.part_cols = list(part_cols)
        self.key_cols = list(key_cols)
        self.value_col = value_col
        self.n = n

    def _current(self, spark: SparkSession) -> DataFrame | None:
        try:
            return self.state.read(spark)
        except FileNotFoundError:
            return None

    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook: fold the batch's partial sums into the
        state table, idempotently (replays find their tag and no-op)."""
        tag = f"batch-{int(batch_id)}"
        if self.state.find_tag(tag) is not None:
            return
        groups = self.part_cols + self.key_cols
        partial = df.groupBy(*groups).agg(
            F.sum(self.value_col).alias("v"), F.count(F.lit(1)).alias("c")
        )
        cur = self._current(df.sparkSession)
        if cur is None:
            merged = partial
        else:
            merged = (
                cur.withColumnsRenamed({"v": "v0", "c": "c0"})
                .join(partial, groups, "full_outer")
                .select(
                    *groups,
                    (F.coalesce("v0", F.lit(0)) + F.coalesce("v", F.lit(0))).alias("v"),
                    (F.coalesce("c0", F.lit(0)) + F.coalesce("c", F.lit(0))).alias("c"),
                )
            )
        self.state.write(merged, mode="overwrite", tag=tag)

    def attach(self, sdf: DataFrame, checkpoint: str):
        return sdf.writeStream.foreachBatch(self.write_batch).option(
            "checkpointLocation", checkpoint
        )

    def results(self, spark: SparkSession) -> DataFrame:
        """The Top-N view of the current state: rank N per partition,
        ties broken on the key columns (Flink Top-N determinism
        requires the same explicit tie-break)."""
        cur = self._current(spark)
        if cur is None:
            raise FileNotFoundError("no batches have been committed yet")
        w = Window.partitionBy(*self.part_cols).orderBy(
            F.desc("v"), *[F.asc(k) for k in self.key_cols]
        )
        return cur.withColumn(
            "rn", F.row_number().over(w).cast("long")
        ).filter(F.col("rn") <= self.n)
