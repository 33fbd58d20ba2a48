"""Distributed sweep-line (operators/sweepline.py): hand-built
interval cases, half-open boundary policy, and parity with the naive
single-window formulation on random data."""

import datetime as dt
import random

from pyspark.sql import Row, Window, functions as F

from lance_flink_spark.operators.sweepline import max_concurrency

T0 = dt.datetime(2024, 1, 1)


def _ev(spark, rows):  # rows: (key, offset_seconds)
    return spark.createDataFrame(
        [
            Row(event_type=k, ts=T0 + dt.timedelta(seconds=s))
            for k, s in rows
        ]
    )


def test_hand_built_overlap(spark):
    e = _ev(spark, [("a", 0), ("a", 10), ("a", 25), ("a", 100)])
    out = {r["event_type"]: r["max_concurrent"] for r in
           max_concurrency(e, duration_seconds=30).collect()}
    assert out == {"a": 3}  # [0,30) [10,40) [25,55) all open at t=25


def test_half_open_touching_intervals_do_not_overlap(spark):
    e = _ev(spark, [("a", 0), ("a", 30), ("a", 60)])
    out = max_concurrency(e, duration_seconds=30).collect()
    assert out[0]["max_concurrent"] == 1


def test_keys_are_independent(spark):
    e = _ev(spark, [("a", 0), ("a", 1), ("b", 0)])
    out = {r["event_type"]: r["max_concurrent"] for r in
           max_concurrency(e, duration_seconds=10).collect()}
    assert out == {"a": 2, "b": 1}


def test_parity_with_naive_window(spark):
    rng = random.Random(7)
    rows = [
        (k, rng.randrange(0, 100_000))
        for k in ("x", "y", "z")
        for _ in range(400)
    ]
    e = _ev(spark, rows)
    got = {r["event_type"]: r["max_concurrent"] for r in
           max_concurrency(e, duration_seconds=1800, buckets=16).collect()}

    us = F.unix_micros(F.col("ts"))
    b = e.select(F.col("event_type").alias("k"), us.alias("t"), F.lit(1).alias("d")).unionByName(
        e.select(F.col("event_type").alias("k"),
                 (us + 1800 * 1_000_000).alias("t"), F.lit(-1).alias("d"))
    )
    w = Window.partitionBy("k").orderBy("t", "d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = {
        r["k"]: r["m"]
        for r in b.withColumn("run", F.sum("d").over(w))
        .groupBy("k")
        .agg(F.max("run").alias("m"))
        .collect()
    }
    assert got == want


def test_local_windows_are_bucket_partitioned(spark):
    """The running-sum window partitions by (key, bucket) — the plan
    never sorts a whole key's boundaries in one task (and certainly
    not globally)."""
    e = _ev(spark, [("a", i) for i in range(100)])
    plan = (
        max_concurrency(e, duration_seconds=60, buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
    assert "windowspecdefinition(k" in plan and "__b" in plan


def test_empty_input_returns_empty_frame(spark):
    e = spark.createDataFrame([], "event_type string, ts timestamp")
    out = max_concurrency(e, duration_seconds=60)
    assert out.count() == 0
    assert out.columns == ["event_type", "max_concurrent"]


def test_null_keys_form_their_own_group(spark):
    """A NULL key must come back as its own row (the SQL window oracle
    would produce one) — the offsets equi-join must not drop it."""
    e = _ev(spark, [("a", 0), ("a", 1)]).unionByName(
        spark.createDataFrame(
            [Row(event_type=None, ts=T0), Row(event_type=None, ts=T0 + dt.timedelta(seconds=1))],
            "event_type string, ts timestamp",
        )
    )
    out = {r["event_type"]: r["max_concurrent"] for r in
           max_concurrency(e, duration_seconds=10).collect()}
    assert out == {"a": 2, None: 2}


def test_high_cardinality_routes_to_per_key_window(spark, monkeypatch):
    """Above MAX_BUCKETED_KEYS the operator must NOT collect
    keys x buckets rows to the driver — it routes to the per-key
    window plan (partitioned by k alone, no __b column)."""
    import lance_flink_spark.operators.sweepline as sl

    monkeypatch.setattr(sl, "MAX_BUCKETED_KEYS", 4)
    e = _ev(spark, [(f"k{i}", j) for i in range(20) for j in (0, 5)])
    df = sl.max_concurrency(e, duration_seconds=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__b" not in plan  # bucketed/offsets path not taken
    out = {r["event_type"]: r["max_concurrent"] for r in df.collect()}
    assert out == {f"k{i}": 2 for i in range(20)}
    # and the answers agree with the bucketed form
    monkeypatch.setattr(sl, "MAX_BUCKETED_KEYS", 2048)
    bucketed = {r["event_type"]: r["max_concurrent"] for r in
                sl.max_concurrency(e, duration_seconds=10).collect()}
    assert out == bucketed
