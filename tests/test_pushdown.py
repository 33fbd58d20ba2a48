"""Plan-shape assertions: pushdown/pruning/broadcast actually happen.

The reference hand-implements these (LanceReadOptimizationsTest,
LanceAggregatePushDownTest); here we assert Catalyst produced them —
this is the 100TB-scale contract (scans read only what the query
needs; small dims broadcast instead of shuffling the fact table).
"""

from pyspark.sql import functions as F

from lance_flink_spark.registry import table

from conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_filter_pushdown_reaches_parquet(spark):
    l = table(spark, SF_DIR, "lineitem")
    df = l.filter((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R")).select(
        "l_orderkey", "l_quantity"
    )
    plan = _formatted(df)
    assert "PushedFilters" in plan
    assert "l_quantity" in plan.split("PushedFilters")[1][:200]


def test_column_pruning_reaches_parquet(spark):
    l = table(spark, SF_DIR, "lineitem")
    df = l.select("l_orderkey", "l_quantity")
    plan = _formatted(df)
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema  # unused column not read


def test_small_dim_join_is_broadcast(spark):
    o = table(spark, SF_DIR, "orders")
    c = table(spark, SF_DIR, "customer")
    df = o.join(c, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").count()
    assert "BroadcastHashJoin" in _plan(df)


def test_topn_is_take_ordered(spark):
    o = table(spark, SF_DIR, "orders")
    df = o.orderBy(F.desc("o_totalprice")).limit(5)
    assert "TakeOrderedAndProject" in _plan(df)


def test_agg_is_partial_then_final(spark):
    l = table(spark, SF_DIR, "lineitem")
    df = l.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    plan = _plan(df)
    # two HashAggregate levels = map-side partial + reduce-side final
    assert plan.count("HashAggregate") >= 2


def test_whole_stage_codegen_covers_scan_filter_agg(spark):
    l = table(spark, SF_DIR, "lineitem")
    df = l.filter("l_quantity > 10").groupBy("l_returnflag").agg(F.sum("l_quantity"))
    df.collect()  # AQE finalizes the physical plan only on execution
    # '*(n)' prefixes mark WholeStageCodegen stages in the plan string
    plan = _plan(df)
    assert "*(1)" in plan and "*(2)" in plan


def test_ivf_partition_pruning(spark, tmp_path_str):
    """Probing an IVF list must prune non-probed partitions at scan."""
    from lance_flink_spark.index.ivf import IVFIndex

    e = table(spark, SF_DIR, "embeddings")
    idx = IVFIndex.build(spark, e, tmp_path_str + "/ivf", nlist=4, sample_size=500)
    q = [float(x) for x in e.select("embedding").first()[0]]
    cand = idx._probe_lists(spark, q, nprobes=1)
    plan = _formatted(cand)
    assert "centroid_id" in plan  # partition filter present
    # only 1 of 4 list-directories should survive pruning
    n_parts = cand.select("centroid_id").distinct().count()
    assert n_parts == 1
