"""Watermark late-data semantics and AQE skew-join activation.

Two scale-critical behaviors pinned at test size:

- Watermarks DROP rows whose window is entirely below the
  checkpoint-recovered watermark (state eviction is what bounds
  streaming state at 100 TB/day), and append mode withholds still-open
  windows. Pinned across a RESTART because that is where the guarantee
  is load-bearing: within one availableNow run Spark 4 evaluates the
  late-events watermark from the run start, so in-run late files are
  admitted — after a restart the committed watermark applies and the
  drop is observable (numRowsDroppedByWatermark).
- AQE splits skewed shuffle partitions at join time (the runtime
  defense SCALE.md leans on for hot keys, complementing the explicit
  salting operator).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F


def test_watermark_drops_late_rows_after_restart(spark, tmp_path_str):
    src = os.path.join(tmp_path_str, "src")
    out = os.path.join(tmp_path_str, "out")
    ckpt = os.path.join(tmp_path_str, "ckpt")
    os.makedirs(src)

    def write_file(name: str, stamps: list[str], mtime: float) -> None:
        df = (
            spark.createDataFrame([(s,) for s in stamps], "ts string")
            .select(F.col("ts").cast("timestamp").alias("ts"))
            .coalesce(1)
        )
        tmp = os.path.join(tmp_path_str, "stage_" + name)
        df.write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(src, name)
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))  # FileStreamSource orders by mtime

    def run():
        sdf = (
            spark.readStream.schema("ts timestamp")
            .parquet(src)
            .withWatermark("ts", "10 minutes")
        )
        agg = (
            sdf.groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w").start.alias("ws"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return q

    now = time.time()
    # run 1: 10:00..10:59 → committed watermark 10:49; window [10,11)
    # end 11:00 > wm, so append mode emits NOTHING yet
    write_file(
        "b1.parquet", [f"2024-01-01 10:{m:02d}:00" for m in range(60)], now - 100
    )
    run()
    assert spark.read.parquet(out).count() == 0

    # run 2 (restart from checkpoint, wm 10:49): 8:30/9:30 fall in
    # windows closed below the watermark → DROPPED; 10:30 is within
    # watermark → merges into [10,11), which then closes (wm → 11:20)
    # and emits with 61 rows; 11:30's window [11,12) stays open.
    write_file(
        "b2.parquet",
        [
            "2024-01-01 08:30:00",
            "2024-01-01 09:30:00",
            "2024-01-01 10:30:00",
            "2024-01-01 11:30:00",
        ],
        now - 50,
    )
    q2 = run()
    rows = {r["ws"].hour: r["n"] for r in spark.read.parquet(out).collect()}
    assert rows == {10: 61}
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q2.recentProgress
        for op in p.get("stateOperators", [])
    )
    assert dropped == 2


def test_aqe_splits_skewed_join_partitions(spark, tmp_path_str):
    conf = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        # hot key 0 carries 100k rows; the rest are uniform
        skewed = spark.range(120_000).select(
            F.when(F.col("id") < 100_000, 0).otherwise(F.col("id")).alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        dim = spark.range(5_000).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        # aggregate after the join so collect() returns few rows but
        # the join executes inside THIS DataFrame's query execution
        # (count() would plan a separate query and leave the inspected
        # plan un-finalized). The agg key is UNRELATED to the join key:
        # grouping on k would require the join's output distribution to
        # be preserved, which disables the skew split.
        joined = (
            skewed.join(dim, "k")
            .groupBy(F.substring("payload", 1, 1).alias("g"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert len(joined.collect()) > 0  # materialize so AQE finalizes
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
