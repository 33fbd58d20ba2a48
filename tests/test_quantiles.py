"""Distributed exact NTILE (operators/quantiles.py): parity with the
unpartitioned-window ntile, and the scale pin — no SinglePartition
exchange anywhere in the physical plan."""

import pytest
from pyspark.sql import Window, functions as F

from lance_flink_spark.operators.quantiles import with_distributed_ntile

SF_DIR = "/root/testdata/sf0.001"


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _has_global_window_sort(plan: str) -> bool:
    """True if an `Exchange SinglePartition` feeds a Sort/Window — the
    physical signature of an unpartitioned ordered window. A scalar
    global aggregate (HashAggregate over SinglePartition, 1 row) is
    NOT flagged: that's how any engine computes MAX(x) and is fine."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            above = " ".join(lines[max(0, i - 3) : i])
            if "Sort [" in above or "Window [" in above:
                return True
    return False


@pytest.fixture(scope="module")
def spend(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5))
            .cast("long")
            .alias("cents")
        )
        .persist()
    )


@pytest.mark.parametrize("n,descending", [(4, True), (4, False), (7, True), (10, False)])
def test_matches_window_ntile(spark, spend, n, descending):
    """Bit-exact parity with ntile().over(global window) for several
    tile counts and both directions (incl. n that doesn't divide N)."""
    key = F.col("cents").desc() if descending else F.col("cents").asc()
    w = Window.orderBy(key, F.col("o_custkey").asc())
    expect = {
        (r["o_custkey"], r["t"])
        for r in spend.withColumn("t", F.ntile(n).over(w)).collect()
    }
    got = {
        (r["o_custkey"], r["t"])
        for r in with_distributed_ntile(
            spend, n, "cents", "o_custkey", "t", descending=descending
        ).collect()
    }
    assert got == expect


def test_fewer_rows_than_tiles(spark):
    df = spark.createDataFrame(
        [(i, float(i * 10)) for i in range(3)], "id long, v double"
    )
    out = with_distributed_ntile(df, 8, "v", "id", "t").collect()
    assert {(r["id"], r["t"]) for r in out} == {(0, 1), (1, 2), (2, 3)}


def test_ties_share_bucket_deterministically(spark):
    """All-equal keys: order falls entirely to the tiebreak; output
    must equal the window ntile and be stable across runs."""
    df = spark.createDataFrame(
        [(i, 5.0) for i in range(10)], "id long, v double"
    )
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    expect = {(r["id"], r["t"]) for r in df.withColumn("t", F.ntile(4).over(w)).collect()}
    got = {
        (r["id"], r["t"])
        for r in with_distributed_ntile(df, 4, "v", "id", "t").collect()
    }
    assert got == expect


def test_no_single_partition_exchange(spark, spend):
    """The scale pin: the distributed path never plans an
    `Exchange SinglePartition` (the signature of an unpartitioned
    ordered window), while the naive window ntile does."""
    dist = with_distributed_ntile(spend, 4, "cents", "o_custkey", "t", descending=True)
    assert "SinglePartition" not in _plan(dist)

    naive = spend.withColumn(
        "t", F.ntile(4).over(Window.orderBy(F.desc("cents"), "o_custkey"))
    )
    assert _has_global_window_sort(_plan(naive))


def test_registry_queries_have_no_global_window_sort(spark):
    """customer_spend_ntile / customer_rfm end-to-end plans never sort
    the entity frame on a single partition (the 1-row MAX(o_orderdate)
    anchor aggregate in rfm is exempt by the detector's design)."""
    from lance_flink_spark.plans.analytics import customer_rfm
    from lance_flink_spark.plans.quality import customer_spend_ntile

    for fn in (customer_spend_ntile, customer_rfm):
        assert not _has_global_window_sort(_plan(fn(spark, SF_DIR))), fn.__name__


def test_multi_axis_matches_single_axis(spark, spend):
    """with_distributed_ntiles (batched driver round-trips) is
    value-identical to three single-axis calls."""
    from lance_flink_spark.operators.quantiles import with_distributed_ntiles

    df = spend.withColumn("neg", -F.col("cents"))
    multi = with_distributed_ntiles(
        df, 4,
        [("cents", True, "a"), ("neg", False, "b"), ("cents", False, "c")],
        tiebreak_col="o_custkey",
    )
    got = {
        (r["o_custkey"], r["a"], r["b"], r["c"]) for r in multi.collect()
    }
    one = with_distributed_ntile(df, 4, "cents", "o_custkey", "a", descending=True)
    one = with_distributed_ntile(one, 4, "neg", "o_custkey", "b")
    one = with_distributed_ntile(one, 4, "cents", "o_custkey", "c")
    want = {(r["o_custkey"], r["a"], r["b"], r["c"]) for r in one.collect()}
    assert got == want
    # cents-desc and neg-asc are the same total order modulo tiebreak
    # direction interplay is identical here (same tiebreak asc)
    assert all(a == b for _, a, b, _ in got)


def test_null_keys_match_window_ntile(spark):
    """NULL keys: asc buckets them first (bucket 0, Spark NULLS FIRST),
    desc buckets them last — in both directions the distributed result
    equals the window ntile bit-for-bit."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(id=i, v=None if i % 5 == 0 else float(i)) for i in range(40)]
    )
    for desc in (False, True):
        key = F.col("v").desc() if desc else F.col("v").asc()
        w = Window.orderBy(key, F.col("id").asc())
        want = {
            (r["id"], r["t"])
            for r in df.withColumn("t", F.ntile(4).over(w)).collect()
        }
        got = {
            (r["id"], r["t"])
            for r in with_distributed_ntile(
                df, 4, "v", "id", "t", descending=desc, buckets=5
            ).collect()
        }
        assert got == want, f"descending={desc}"


def test_empty_frame(spark):
    df = spark.createDataFrame([], "id long, v double")
    out = with_distributed_ntile(df, 4, "v", "id", "t")
    assert out.count() == 0
    assert "t" in out.columns


# ---------- grouped_percentiles: rank-exact interpolated percentiles ----------

from lance_flink_spark.operators.quantiles import grouped_percentiles  # noqa: E402


def test_grouped_percentiles_matches_exact_aggregate(spark):
    """Parity with Spark's exact percentile aggregate on grouped data
    (which is itself pinned against DuckDB quantile_cont elsewhere) —
    bit-for-bit, including the interpolated positions."""
    df = spark.range(0, 5000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 37 % 1009).cast("double").alias("v"),
    )
    want = {
        (r["g"], r["p25"], r["p50"], r["p99"])
        for r in df.groupBy("g")
        .agg(
            F.expr("percentile(v, 0.25)").alias("p25"),
            F.expr("percentile(v, 0.5)").alias("p50"),
            F.expr("percentile(v, 0.99)").alias("p99"),
        )
        .collect()
    }
    got = {
        (r["g"], r["p25"], r["p50"], r["p99"])
        for r in grouped_percentiles(
            df, "v", {"p25": 0.25, "p50": 0.5, "p99": 0.99}, group_cols=["g"]
        ).collect()
    }
    assert got == want


def test_grouped_percentiles_ungrouped_nulls_ties(spark):
    """Ungrouped mode, null values ignored (SQL percentile semantics),
    heavy ties — still exact."""
    from pyspark.sql import Row

    rows = [Row(v=None if i % 7 == 0 else float(i % 5)) for i in range(200)]
    df = spark.createDataFrame(rows)
    want = df.agg(F.expr("percentile(v, 0.5)").alias("m")).collect()[0]["m"]
    got = grouped_percentiles(df, "v", {"m": 0.5}).collect()[0]["m"]
    assert got == want


def test_grouped_percentiles_small_groups_and_empty(spark):
    """1-row and 2-row groups exercise the lo==hi and interpolation
    edges; empty input returns an empty frame with the right schema."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(g="a", v=10.0), Row(g="b", v=1.0), Row(g="b", v=2.0)]
    )
    got = {
        (r["g"], r["p50"])
        for r in grouped_percentiles(df, "v", {"p50": 0.5}, group_cols=["g"]).collect()
    }
    assert got == {("a", 10.0), ("b", 1.5)}

    empty = grouped_percentiles(
        spark.createDataFrame([], "g string, v double"),
        "v",
        {"p50": 0.5},
        group_cols=["g"],
    )
    assert empty.count() == 0 and set(empty.columns) == {"g", "p50"}


def test_grouped_percentiles_no_exact_percentile_aggregate(spark):
    """The scale pin: the physical plan carries NO exact Percentile
    aggregate (single-buffer O(NDV) per-group state) and no
    SinglePartition sort — the whole point of the operator."""
    df = spark.range(0, 1000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").cast("double").alias("v"),
    )
    plan = _plan(grouped_percentiles(df, "v", {"p50": 0.5}, group_cols=["g"]))
    assert "percentile(" not in plan
    assert not _has_global_window_sort(plan)


def test_no_exact_percentile_anywhere_in_package():
    """Source-level ban (the r10 verdict's single-buffer hazard): no
    query or operator in the package may call Spark's exact
    `percentile` aggregate — rank-exact grouped_percentiles or the
    sketch surfaces are the sanctioned paths. percentile_approx stays
    allowed (bounded GK state)."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1] / "lance_flink_spark"
    offenders = []
    for p in root.rglob("*.py"):
        src = p.read_text()
        for i, line in enumerate(src.splitlines(), 1):
            code = line.split("#", 1)[0]
            if "percentile(" in code and not any(
                ok in code
                for ok in (
                    "percentile_approx",
                    "approx_percentile",
                    "grouped_percentiles",
                    "def percentile",
                )
            ):
                offenders.append(f"{p.name}:{i}: {line.strip()}")
    assert not offenders, offenders


def test_rewritten_registry_plans_carry_no_exact_percentile(spark):
    """End-to-end plan pin for the four surfaces the r10 verdict
    flagged (order_value_percentiles, funnel_latency,
    events_value_outliers, agg_approx_exactness): their physical plans
    contain no exact Percentile aggregate."""
    import lance_flink_spark.plans.all  # noqa: F401
    from lance_flink_spark.registry import EXTRA_QUERIES, QUERIES

    reg = {**QUERIES, **EXTRA_QUERIES}
    for name in (
        "order_value_percentiles",
        "funnel_latency",
        "events_value_outliers",
        "agg_approx_exactness",
    ):
        plan = _plan(reg[name](spark, SF_DIR))
        assert "percentile(" not in plan, name


def test_property_random_grouped_percentiles_match_spark_exact(spark):
    """Seeded random value distributions (ties, negatives, skewed
    group sizes, singleton groups) — grouped_percentiles must equal
    Spark's exact percentile() aggregate bit-for-bit at the ROUND
    boundary. The aggregate is BANNED in package code (single-buffer
    O(NDV) state); tests are exactly where it belongs, as ground
    truth."""
    import random

    from pyspark.sql import Row

    from lance_flink_spark.operators.quantiles import grouped_percentiles

    for seed in (3, 41):
        rng = random.Random(seed)
        rows = []
        for g in range(rng.randint(2, 5)):
            n = rng.choice([1, 2, 7, rng.randint(20, 120)])
            vals = [
                float(rng.choice([rng.randint(-40, 40), rng.uniform(-40, 40)]))
                for _ in range(n)
            ]
            if n > 3 and rng.random() < 0.7:
                vals[1] = vals[0]  # plant ties
                vals[2] = vals[0]
            rows += [Row(g=f"g{g}", v=v) for v in vals]
        df = spark.createDataFrame(rows, "g string, v double")
        ps = sorted(rng.sample([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99], 3))
        spec = {f"p{int(p * 100):02d}": p for p in ps}
        out = grouped_percentiles(df, "v", spec, group_cols=["g"]).collect()
        got = {
            (r["g"], name): round(r[name], 6)
            for r in out
            for name in spec
        }
        import pyspark.sql.functions as F

        want = {}
        for name, p in spec.items():
            for r in df.groupBy("g").agg(
                F.expr(f"percentile(v, {p})").alias("x")
            ).collect():
                want[(r["g"], name)] = round(r["x"], 6)
        assert got == want, f"seed {seed}"
