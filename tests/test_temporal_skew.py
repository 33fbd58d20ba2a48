"""Temporal joins, salted distinct, approximate aggregates."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from lance_flink_spark.operators.skew import salted_count_distinct
from lance_flink_spark.operators.temporal import asof_join, interval_join
from lance_flink_spark.registry import table

from conftest import SF_DIR


def _ts_df(spark, rows):
    return spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))


def test_asof_join_picks_latest_at_or_before(spark):
    left = _ts_df(
        spark,
        [
            Row(id=1, user=1, ts="2024-01-01 00:10:00"),
            Row(id=2, user=1, ts="2024-01-01 00:20:00"),
            Row(id=3, user=2, ts="2024-01-01 00:05:00"),  # no earlier right row
        ],
    )
    right = _ts_df(
        spark,
        [
            Row(user=1, ts="2024-01-01 00:05:00", tag="r1"),
            Row(user=1, ts="2024-01-01 00:20:00", tag="r2"),  # equal ts → matches
            Row(user=2, ts="2024-01-01 00:30:00", tag="r3"),
        ],
    )
    out = {
        r["id"]: r["tag"]
        for r in asof_join(left, right, on="user", right_payload=["tag"]).collect()
    }
    assert out == {1: "r1", 2: "r2", 3: None}


def test_asof_join_tolerance(spark):
    left = _ts_df(spark, [Row(id=1, user=1, ts="2024-01-01 01:00:00")])
    right = _ts_df(spark, [Row(user=1, ts="2024-01-01 00:00:00", tag="old")])
    strict = asof_join(left, right, on="user", right_payload=["tag"], tolerance_seconds=60)
    loose = asof_join(left, right, on="user", right_payload=["tag"], tolerance_seconds=7200)
    assert strict.first()["tag"] is None
    assert loose.first()["tag"] == "old"


def test_interval_join_bounds(spark):
    left = _ts_df(spark, [Row(user=1, ts="2024-01-01 00:00:00")])
    right = _ts_df(
        spark,
        [
            Row(user=1, ts="2023-12-31 23:59:00"),  # before → excluded
            Row(user=1, ts="2024-01-01 00:05:00"),  # inside
            Row(user=1, ts="2024-01-01 00:10:00"),  # boundary → inside
            Row(user=1, ts="2024-01-01 00:11:00"),  # after → excluded
            Row(user=2, ts="2024-01-01 00:05:00"),  # other key
        ],
    )
    assert interval_join(left, right, on="user", upper="10 minutes").count() == 2


def test_salted_count_distinct_exact(spark):
    e = table(spark, SF_DIR, "events")
    got = {
        r["event_type"]: r["n"]
        for r in salted_count_distinct(e, ["event_type"], "user_id", salt=8, alias="n").collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    assert got == want


def test_approx_aggs_error_envelope(spark):
    l = table(spark, SF_DIR, "lineitem")
    approx = l.agg(F.approx_count_distinct("l_partkey", rsd=0.02).alias("a")).first()["a"]
    exact = l.agg(F.count_distinct("l_partkey").alias("e")).first()["e"]
    assert abs(approx - exact) / exact < 0.1


def test_range_lookup_join_left_and_guard(spark):
    from pyspark.sql import Row

    from lance_flink_spark.operators.ranges import range_lookup_join

    fact = spark.createDataFrame(
        [Row(id=i, v=float(i)) for i in (1, 5, 15, 99)]
    )
    ranges = spark.createDataFrame(
        [Row(band="a", lo=0.0, hi=9.0), Row(band="b", lo=10.0, hi=20.0)]
    )
    out = {
        r["id"]: r["band"]
        for r in range_lookup_join(fact, ranges, "v", how="left").collect()
    }
    assert out == {1: "a", 5: "a", 15: "b", 99: None}
    # overlapping ranges emit multiple matches, like the raw join
    overlapping = spark.createDataFrame(
        [Row(band="x", lo=0.0, hi=6.0), Row(band="y", lo=4.0, hi=9.0)]
    )
    rows = range_lookup_join(fact, overlapping, "v").collect()
    assert sorted((r["id"], r["band"]) for r in rows) == [
        (1, "x"), (5, "x"), (5, "y")
    ]
    # the open-ended-range memory bomb fails fast instead of exploding
    import pytest as _pytest

    bomb = spark.createDataFrame([Row(band="inf", lo=0.0, hi=1e12)])
    with _pytest.raises(Exception, match="grid cells"):
        range_lookup_join(fact, bomb, "v", cell=1.0).collect()
