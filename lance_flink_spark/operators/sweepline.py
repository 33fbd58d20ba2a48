"""Interval analytics via a DISTRIBUTED sweep line.

"How many sessions were open at once?" is a running sum of +1/−1
boundary events in global time order — the textbook sweep line. The
naive Spark translation is `SUM(delta) OVER (PARTITION BY key ORDER BY
t)`, which for low-cardinality keys (a handful of event types) pushes
an event-count-sized frame through one task per key.

This module decomposes the prefix sum exactly like
``operators/quantiles.py`` decomposes rank: deterministic uniform time
buckets (a pure function of t — no sampling, no re-evaluation hazard),
per-(key, bucket) local running sums in parallel, per-bucket totals to
the driver (≤ keys × buckets rows by construction), cumulative offsets
broadcast back. The global running value at any row is offset + local
running — exact, with task state bounded by a bucket's boundary count.

Tie policy: boundaries sort by (t, delta) with −1 first, so an
interval ending exactly when another starts never overlaps it —
half-open [t, t+duration) semantics, identical in the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


# NULL keys ride internally as this sentinel (an offsets equi-join on
# ["k", "__b"] never matches NULL) and are restored to NULL on output.
_NULL_KEY = "\x00__sweepline_null__"

# Above this many distinct keys the bucketed form's driver collect
# (keys × buckets rows) stops being "bounded by construction"; the
# plain per-key window is already parallel there (one task per key,
# many keys), so we route to it instead of surprising the driver.
MAX_BUCKETED_KEYS = 2048


def max_concurrency(
    events: DataFrame,
    duration_seconds: int,
    key_col: str = "event_type",
    ts_col: str = "ts",
    buckets: int = 64,
) -> DataFrame:
    """Peak number of simultaneously-open intervals per key, where
    each event opens [ts, ts + duration). Returns (key, max_concurrent)
    — exact integers.

    Two bounded driver round-trips: the global [tmin, tmax] (1 row)
    and the per-(key, bucket) totals (≤ keys × buckets rows). The key
    rides as a string internally (the offsets frame needs one concrete
    type); the output column restores the input key values via the
    final groupBy, so string keys round-trip exactly — non-string keys
    come back as their canonical string form. NULL keys form their own
    group, as the SQL window-function oracle would.

    When the key cardinality exceeds ``MAX_BUCKETED_KEYS`` (probed with
    one approx_count_distinct agg), the bucketed decomposition would
    collect keys × buckets rows to the driver — so the operator routes
    to the per-key running-sum window instead, which at high key
    cardinality is already parallel (skew lives in keys, not time)."""
    spark = events.sparkSession
    us = F.unix_micros(F.col(ts_col))
    dur_us = int(duration_seconds) * 1_000_000
    key = F.coalesce(F.col(key_col).cast("string"), F.lit(_NULL_KEY))

    n_keys = events.agg(
        F.approx_count_distinct(key).alias("n")
    ).first()["n"]
    if n_keys > MAX_BUCKETED_KEYS:
        return _max_concurrency_per_key_window(
            events, dur_us, key_col, ts_col
        )
    b = (
        events.select(key.alias("k"), us.alias("t"), F.lit(1).alias("d"))
        .unionByName(
            events.select(
                key.alias("k"),
                (us + F.lit(dur_us)).alias("t"),
                F.lit(-1).alias("d"),
            )
        )
    )
    lo, hi = b.agg(F.min("t"), F.max("t")).first()
    if lo is None:  # empty input: empty result, correct schema
        return (
            events.select(F.col(key_col).cast("string").alias(key_col))
            .limit(0)
            .withColumn("max_concurrent", F.lit(0).cast("long"))
        )
    width = max((int(hi) - int(lo)) // buckets + 1, 1)
    b = b.withColumn("__b", ((F.col("t") - F.lit(int(lo))) / width).cast("int"))

    totals = (
        b.groupBy("k", "__b").agg(F.sum("d").alias("s")).collect()
    )  # ≤ keys × buckets rows — bounded driver work by construction
    offsets, acc = [], {}
    for r in sorted(totals, key=lambda r: (str(r["k"]), r["__b"])):
        offsets.append((r["k"], r["__b"], int(acc.get(r["k"], 0))))
        acc[r["k"]] = acc.get(r["k"], 0) + int(r["s"])
    off_df = F.broadcast(
        spark.createDataFrame(offsets, "k string, __b int, __off long")
    )

    w_in = Window.partitionBy("k", "__b").orderBy("t", "d")
    run = (
        b.withColumn("__run_in", F.sum("d").over(w_in))
        .join(off_df, ["k", "__b"])
        .withColumn("__run", F.col("__off") + F.col("__run_in"))
    )
    return (
        run.groupBy("k")
        .agg(F.max("__run").cast("long").alias("max_concurrent"))
        .select(_restore_null("k").alias(key_col), "max_concurrent")
    )


def _restore_null(col: str):
    return F.when(F.col(col) == _NULL_KEY, F.lit(None)).otherwise(F.col(col))


def _max_concurrency_per_key_window(
    events: DataFrame, dur_us: int, key_col: str, ts_col: str
) -> DataFrame:
    """High-cardinality fallback: the plain per-key running sum —
    `SUM(d) OVER (PARTITION BY k ORDER BY t, d)` — which shuffles once
    on the key and runs one frame per key. With many keys that IS the
    parallel plan (the bucketed decomposition exists for the opposite
    regime: few keys, huge frames). Same half-open tie policy."""
    us = F.unix_micros(F.col(ts_col))
    key = F.coalesce(F.col(key_col).cast("string"), F.lit(_NULL_KEY))
    b = (
        events.select(key.alias("k"), us.alias("t"), F.lit(1).alias("d"))
        .unionByName(
            events.select(
                key.alias("k"),
                (us + F.lit(dur_us)).alias("t"),
                F.lit(-1).alias("d"),
            )
        )
    )
    w = Window.partitionBy("k").orderBy("t", "d")
    return (
        b.withColumn("__run", F.sum("d").over(w))
        .groupBy("k")
        .agg(F.max("__run").cast("long").alias("max_concurrent"))
        .select(_restore_null("k").alias(key_col), "max_concurrent")
    )
