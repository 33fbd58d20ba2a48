"""Exactly-once streaming sink into a versioned Dataset.

Parity with LanceSink.java's checkpoint-based exactly-once: Flink
commits Lance fragments on checkpoint; here ``foreachBatch`` writes a
fragment per micro-batch with the batch id as an idempotency tag
recorded *inside* the dataset's atomic manifest commit. A replayed
batch (post-crash) finds its tag and becomes a no-op; data files
written before a crashed commit stay invisible because only the
manifest swap makes fragments live. That is end-to-end exactly-once
with any deterministic-replay source (checkpointed file/Kafka).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from lance_flink_spark.sources.dataset import Dataset


class ExactlyOnceDatasetSink:
    def __init__(self, path: str):
        self.dataset = Dataset(path)

    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        """foreachBatch hook — idempotent via the manifest tag."""
        self.dataset.write(df, mode="append", tag=f"batch-{int(batch_id)}")

    def attach(self, sdf: DataFrame, checkpoint: str):
        """Wire onto a streaming DataFrame: returns the DataStreamWriter."""
        return (
            sdf.writeStream.foreachBatch(self.write_batch)
            .option("checkpointLocation", checkpoint)
        )
