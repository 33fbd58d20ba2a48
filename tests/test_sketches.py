"""Mergeable HLL sketch state (operators/sketches.py): fine-grained
sketches roll up to coarser groupings without rescanning facts, and
the union estimate equals the directly-computed estimate."""

from pyspark.sql import functions as F

from lance_flink_spark.operators.sketches import distinct_sketches, rollup_sketches

SF_DIR = "/root/testdata/sf0.001"


def test_rollup_equals_direct_and_tracks_exact(spark):
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    fine = distinct_sketches(e, ["event_type", "user_id"], "event_id").persist()

    # union to per-type from the persisted state (facts untouched)
    per_type = {
        r["event_type"]: r["estimate"]
        for r in rollup_sketches(fine, ["event_type"]).collect()
    }
    # the same sketch computed directly from facts — must agree EXACTLY
    # (the union of partials is the definition of the full sketch)
    direct = {
        r["event_type"]: r["estimate"]
        for r in distinct_sketches(e, ["event_type"], "event_id").collect()
    }
    assert per_type == direct

    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("event_id").alias("n"))
        .collect()
    }
    for t, est in per_type.items():
        assert abs(est - exact[t]) / exact[t] < 0.05  # HLL error bound

    # global rollup from the SAME state
    total = rollup_sketches(fine, []).first()["estimate"]
    exact_total = e.select("event_id").distinct().count()
    assert abs(total - exact_total) / exact_total < 0.05
    fine.unpersist()


def test_sketch_bytes_are_bounded(spark):
    big = spark.range(200_000).selectExpr("id % 2 AS g", "id AS u")
    rows = distinct_sketches(big, ["g"], "u", lg_k=12).collect()
    for r in rows:
        assert len(r["sketch"]) < 64 * 1024  # O(2^lg_k), not O(n)
