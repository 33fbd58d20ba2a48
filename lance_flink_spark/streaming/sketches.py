"""Streaming percentile monitoring — windowed DDSketch bin counts.

The batch quantile sketch (operators/sketches.py) folds into Structured
Streaming for free because its STATE is a plain additive aggregate:
(window, key, sign, bin) → count. That is a native streaming groupBy
(watermark-evicted, map-side partial, no applyInPandasWithState, no
custom state), so the stream side stays entirely inside Spark's
built-in incremental aggregation; the estimate step runs batch-side
over the emitted sketch rows. Flink analogue: a window aggregate whose
accumulator is the sketch — same composition, same ≤a relative-error
read guarantee, state per window O(bins) not O(events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_quantile_sketch(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    relative_accuracy: float = 0.01,
) -> DataFrame:
    """(window_start_s, key, __sign, __bin, __cnt) sketch rows per
    tumbling window — appendable to a sink once the watermark closes
    the window; identical bucketing to the batch sketch (shared
    value_bins), so stream output merges with batch state
    bit-for-bit."""
    from lance_flink_spark.operators.sketches import value_bins

    sign, binc = value_bins(value_col, relative_accuracy)
    return (
        events.groupBy(
            F.window(ts_col, window).alias("w"),
            key_col,
            sign.alias("__sign"),
            binc.alias("__bin"),
        )
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .select(
            F.col("w.start").cast("long").alias("window_start_s"),
            key_col,
            "__sign",
            "__bin",
            "__cnt",
        )
    )


def estimate_windowed_quantiles(
    sketch_rows: DataFrame,
    qs: list[float],
    key_cols: list[str] = ("window_start_s", "event_type"),
    relative_accuracy: float = 0.01,
) -> DataFrame:
    """Batch-side read of the streamed sketch rows: per-(window, key)
    quantile estimates — sketch-state-sized work."""
    from pyspark.sql import Window as W

    from lance_flink_spark.operators.sketches import (
        estimate_quantiles_from_bins,
    )

    keys = list(key_cols)
    with_n = sketch_rows.withColumn(
        "n", F.sum("__cnt").over(W.partitionBy(*keys))
    )
    return estimate_quantiles_from_bins(with_n, keys, qs, relative_accuracy)
