"""Structured Streaming pipelines: readStream → watermark → window →
sink, with availableNow used to run a bounded stream to completion.

Flink-parity: the reference's streaming source/sink
(LanceSource.java streaming mode, LanceSink.java checkpointing) maps
to readStream + checkpointed writeStream. Event-time + watermark
replaces Flink's watermark generators; the window plans are shared
with batch (streaming/windows.py).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from lance_flink_spark.registry import scratch_dir
from lance_flink_spark.streaming.windows import tumbling_agg


def stream_events(
    spark: SparkSession,
    sf_dir: str,
    watermark: str | None = "1 hour",
    ts_col: str = "ts",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based streaming read of the events table (schema inferred
    from a batch peek — file streams require an explicit schema).
    ``watermark=None`` skips the withWatermark call for operators that
    attach their own (e.g. streaming/over_agg.py's shifted
    watermark)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    import os

    src = f"{sf_dir}/events.parquet"
    # the file stream source requires a directory: stage a symlink dir
    d = scratch_dir("stream_src" + sf_dir.rstrip("/").replace("/", "_"))
    link = os.path.join(d, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    path = d
    # nanos timestamps: read as long, convert to µs (see registry.table)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    sdf = reader.parquet(path)
    if isinstance(schema[ts_col].dataType, T.LongType):
        sdf = sdf.withColumn(ts_col, F.expr(f"timestamp_micros({ts_col} div 1000)"))
    elif isinstance(schema[ts_col].dataType, T.TimestampNTZType):
        # NTZ (parquet timestamp[us] w/o tz) is rejected by withWatermark;
        # interpret wall clock as UTC — session-tz independent (registry.ntz_as_utc)
        from lance_flink_spark.registry import ntz_as_utc

        sdf = sdf.withColumn(ts_col, ntz_as_utc(F.col(ts_col)))
    if watermark is None:
        return sdf
    return sdf.withWatermark(ts_col, watermark)


STATE_STORE_PROVIDERS = {
    "hdfs": "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    "rocksdb": "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
}


def run_to_memory(
    result: DataFrame,
    name: str | None = None,
    mode: str = "complete",
    state_partitions: int | None = None,
    state_store: str | None = None,
) -> str:
    """Run a (bounded) streaming DataFrame to completion with the
    availableNow trigger into an in-memory table; returns the table
    name. Checkpointed like a production run, so restarts resume.

    ``state_partitions`` sizes the stateful-operator shard count (the
    Flink operator-parallelism knob): every micro-batch commits one
    state-store delta per shard per stateful operator, so shards should
    track key cardinality / throughput, NOT inherit the batch shuffle
    default — a stream-stream join at 32 shards pays 4×32 store commits
    per batch even for a handful of keys. The count is pinned into the
    checkpoint at first run; at 100 TB you raise it and start a fresh
    checkpoint, exactly like re-scaling a Flink job.

    ``state_store`` selects the state backend, mirroring Flink's
    heap-vs-RocksDB choice: the default (None) keeps Spark's
    HDFS-backed in-memory provider — right for windowed aggs whose
    state fits the executor heap — while ``"rocksdb"`` spills state to
    local RocksDB with changelog (incremental) checkpointing, the
    large-state path for stream-stream joins / wide dedup state that
    would otherwise OOM an executor. The provider is pinned into the
    query at start; like the shard count, changing it means a fresh
    checkpoint."""
    table = name or f"stream_out_{uuid.uuid4().hex[:8]}"
    spark = result.sparkSession
    old = spark.conf.get("spark.sql.shuffle.partitions")
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    chlog_key = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    old_prov = spark.conf.get(prov_key, None)
    old_chlog = spark.conf.get(chlog_key, None)
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    if state_store is not None:
        if state_store not in STATE_STORE_PROVIDERS:
            raise ValueError(
                f"unknown state_store {state_store!r}; "
                f"valid backends: {sorted(STATE_STORE_PROVIDERS)}"
            )
        spark.conf.set(prov_key, STATE_STORE_PROVIDERS[state_store])
        if state_store == "rocksdb":
            spark.conf.set(chlog_key, "true")
    try:
        q = (
            result.writeStream.format("memory")
            .queryName(table)
            .outputMode(mode)
            .option("checkpointLocation", scratch_dir("ckpt", table))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        if state_store is not None:
            for k, v in ((prov_key, old_prov), (chlog_key, old_chlog)):
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
    return table


def streaming_tumbling_agg(spark: SparkSession, sf_dir: str, window: str = "1 hour") -> DataFrame:
    """End-to-end streaming pipeline whose final state equals the batch
    tumbling aggregate (unified-engine check: one batch oracle serves
    both)."""
    events = stream_events(spark, sf_dir, watermark="1 hour")
    table = run_to_memory(tumbling_agg(events, window=window), state_partitions=8)
    return spark.table(table)
