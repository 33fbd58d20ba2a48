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


# ---------- DDSketch-style mergeable quantile sketch ----------


def test_quantile_sketch_relative_error_bound(spark):
    """Every estimated quantile is within the declared RELATIVE
    accuracy of the exact quantile — the DDSketch guarantee."""
    import numpy as np

    from lance_flink_spark.operators.sketches import (
        estimate_quantiles,
        quantile_sketches,
    )

    rng = np.random.default_rng(3)
    vals = np.concatenate(
        [rng.lognormal(3, 1.5, 4000), -rng.lognormal(1, 1, 1000), [0.0] * 50]
    )
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    a = 0.02
    sk = quantile_sketches(df, [], "v", relative_accuracy=a)
    qs = [0.01, 0.1, 0.5, 0.9, 0.99]
    est = {r["q"]: r["estimate"] for r in
           estimate_quantiles(sk, [], qs, relative_accuracy=a).collect()}
    srt = np.sort(vals)
    for q in qs:
        exact = srt[min(max(int(np.ceil(q * len(srt))) - 1, 0), len(srt) - 1)]
        if exact == 0:
            assert abs(est[q]) <= 1e-9
        else:
            assert abs(est[q] - exact) <= a * abs(exact) + 1e-9, (q, est[q], exact)


def test_quantile_sketch_merge_is_exact(spark):
    """merge(sketch(A), sketch(B)) equals sketch(A ∪ B) bin-for-bin —
    the exact-mergeability property (bin-wise count addition), and the
    merged estimates match the direct ones exactly."""
    import numpy as np

    from lance_flink_spark.operators.sketches import (
        estimate_quantiles,
        quantile_sketches,
        rollup_quantile_sketches,
    )

    rng = np.random.default_rng(7)
    a_vals = rng.lognormal(2, 1, 2000)
    b_vals = rng.lognormal(4, 0.5, 1500)
    rows = [("a", float(v)) for v in a_vals] + [("b", float(v)) for v in b_vals]
    df = spark.createDataFrame(rows, "grp string, v double")

    fine = quantile_sketches(df, ["grp"], "v")
    merged = rollup_quantile_sketches(fine, [])
    direct = quantile_sketches(df, [], "v")

    m, d = merged.first(), direct.first()
    assert m["n"] == d["n"] and m["zeros"] == d["zeros"]
    assert dict(m["pos"]) == dict(d["pos"]) and dict(m["neg"]) == dict(d["neg"])

    qs = [0.1, 0.5, 0.95]
    em = {r["q"]: r["estimate"] for r in estimate_quantiles(merged, [], qs).collect()}
    ed = {r["q"]: r["estimate"] for r in estimate_quantiles(direct, [], qs).collect()}
    assert em == ed


def test_quantile_sketch_grouped_rollup(spark):
    """Keyed rollup: per-(g1,g2) sketches merge up to per-g1 without
    touching facts; estimates carry keys through."""
    from lance_flink_spark.operators.sketches import (
        estimate_quantiles,
        quantile_sketches,
        rollup_quantile_sketches,
    )

    rows = [("x", i % 3, float(i + 1)) for i in range(300)] + [
        ("y", i % 2, float(1000 + i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "g1 string, g2 int, v double")
    fine = quantile_sketches(df, ["g1", "g2"], "v")
    assert fine.count() == 5  # 3 x-cells + 2 y-cells
    coarse = rollup_quantile_sketches(fine, ["g1"])
    got = {r["g1"]: r["n"] for r in coarse.collect()}
    assert got == {"x": 300, "y": 100}
    est = {
        (r["g1"], r["q"]): r["estimate"]
        for r in estimate_quantiles(coarse, ["g1"], [0.5]).collect()
    }
    # medians land in the right ballpark per group (exact: 150, 1050)
    assert abs(est[("x", 0.5)] - 150) / 150 < 0.05
    assert abs(est[("y", 0.5)] - 1050) / 1050 < 0.05


def test_quantile_sketch_plan_is_jvm_only(spark):
    """No Python evaluation anywhere in the sketch pipeline — build,
    merge, and estimate are pure built-in-function plans."""
    from lance_flink_spark.operators.sketches import (
        estimate_quantiles,
        quantile_sketches,
        rollup_quantile_sketches,
    )

    df = spark.range(1000).selectExpr("id % 4 AS g", "CAST(id AS DOUBLE) AS v")
    sk = quantile_sketches(df, ["g"], "v")
    est = estimate_quantiles(rollup_quantile_sketches(sk, []), [], [0.5])
    for frame in (sk, est):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_streaming_windowed_sketch_equals_batch(spark, tmp_path_str):
    """The windowed sketch over a STREAM (native streaming groupBy —
    no custom state operator) lands the same bin counts as the batch
    bucketing, and the estimates read correctly per window."""
    import datetime as dt

    from pyspark.sql import Row

    from lance_flink_spark.streaming.sketches import (
        estimate_windowed_quantiles,
        windowed_quantile_sketch,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        Row(
            ts=t0 + dt.timedelta(minutes=7 * i % 170),
            event_type="a" if i % 2 else "b",
            value=float((i % 13) + 0.5),
        )
        for i in range(600)
    ]
    src = tmp_path_str + "/sk_src"
    spark.createDataFrame(rows).write.parquet(src)

    sdf = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
    )
    out = windowed_quantile_sketch(sdf, window="1 hour")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("wsk")
        .outputMode("complete")
        .option("checkpointLocation", tmp_path_str + "/ckpt_wsk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["window_start_s"], r["event_type"], r["__sign"], r["__bin"]): r["__cnt"]
        for r in spark.table("wsk").collect()
    }
    batch = {
        (r["window_start_s"], r["event_type"], r["__sign"], r["__bin"]): r["__cnt"]
        for r in windowed_quantile_sketch(
            spark.createDataFrame(rows), window="1 hour"
        ).collect()
    }
    assert streamed == batch and streamed

    est = estimate_windowed_quantiles(spark.table("wsk"), [0.5])
    got = {
        (r["window_start_s"], r["event_type"]): r["estimate"]
        for r in est.collect()
    }
    assert got  # and each estimate is a plausible value (within range)
    assert all(0 < v < 14 for v in got.values())
