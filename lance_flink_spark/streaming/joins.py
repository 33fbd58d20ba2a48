"""Streaming joins — Flink-parity via Structured Streaming.

- stream-static: enrich a stream with a (broadcastable) dimension
  DataFrame; Spark re-plans the static side per micro-batch.
- stream-stream: inner join of two watermarked streams with an
  event-time range condition (Flink interval join on streams). State
  for unmatched rows is bounded by the watermark + range bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream ⋈ static dim (inner), re-planned per micro-batch.

    The broadcast is SIZE-GATED (`registry.bcast`): an explicit
    `F.broadcast` hint forces the broadcast regardless of
    `autoBroadcastJoinThreshold`, which plans in an OOM when the dim
    is an SF-scaling table (customer at TPC-H 100 TB). The dim side is
    static, so Catalyst's own size estimate is available — hint only
    when it fits, else leave the strategy to the planner/AQE (a big
    dim becomes a shuffled hash join, which is the right answer)."""
    from lance_flink_spark.registry import bcast

    return stream.join(bcast(dim), on)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    upper: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join:
    right_ts ∈ [left_ts, left_ts + upper] for the same key. Both
    inputs must already carry watermarks; the range bound lets Spark
    evict join state past watermark + upper."""
    l = left.select(F.col(on).alias("l_key"), F.col(left_ts).alias("l_ts"))
    r = right.select(F.col(on).alias("r_key"), F.col(right_ts).alias("r_ts"))
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond)


def stream_window_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    window: str = "1 hour",
    ts_col: str = "ts",
    how: str = "inner",
) -> DataFrame:
    """Flink SQL WINDOW JOIN (1.14 windowing-TVF join): rows of two
    streams pair when they share a key AND the same tumbling window.
    Spark's native shape: derive the window struct on BOTH watermarked
    sides and equi-join on (key, window) — the planner scopes join
    state to the window and evicts it once the watermark passes the
    window end, exactly Flink's window-join state story. Output keeps
    both sides' payloads with ``l_``/``r_`` prefixes plus the shared
    key and window.

    ``how`` covers Flink's window-join type list: inner / left / right
    / full outer (unmatched side nulls emit once the window closes —
    the watermark proves no partner can still arrive) and left_semi /
    left_anti. Spark has no native stream-stream anti join, so
    left_anti lowers to the supported left-outer + null-partner filter
    — same result, same watermark-driven state story."""
    from pyspark.sql import functions as F

    # the window struct inherits the event-time tag; the raw ts column
    # must NOT ride along (Spark allows one event-time column per
    # stream — the window IS the join's time dimension)
    lw = left.withColumn("w", F.window(ts_col, window)).select(
        F.col(on).alias("__k"),
        "w",
        *[
            F.col(c).alias(f"l_{c}")
            for c in left.columns
            if c not in (on, ts_col)
        ],
    )
    rw = right.withColumn("w", F.window(ts_col, window)).select(
        F.col(on).alias("__k"),
        "w",
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in (on, ts_col)
        ],
    )
    if how == "left_anti":
        # probe a non-nullable marker, not a payload column (a matched
        # row with a null payload must not read as unmatched)
        out = (
            lw.join(rw.withColumn("__r_exists", F.lit(True)), ["__k", "w"], "left")
            .filter(F.col("__r_exists").isNull())
            .drop("__r_exists", *[c for c in rw.columns if c.startswith("r_")])
        )
    else:
        out = lw.join(rw, ["__k", "w"], how)
    return out.withColumnRenamed("__k", on)
