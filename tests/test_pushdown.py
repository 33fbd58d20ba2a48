"""Plan-shape assertions: pushdown/pruning/broadcast actually happen.

The reference hand-implements these (LanceReadOptimizationsTest,
LanceAggregatePushDownTest); here we assert Catalyst produced them —
this is the 100TB-scale contract (scans read only what the query
needs; small dims broadcast instead of shuffling the fact table).
"""

import pytest
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


def test_bcast_hints_small_dim(spark):
    """registry.bcast: Catalyst's estimate for sf0.001 customer is far
    under the 64 MB threshold, so the hint fires and the join plans as
    BroadcastHashJoin with customer on the build side."""
    from lance_flink_spark.registry import bcast

    o = table(spark, SF_DIR, "orders")
    c = table(spark, SF_DIR, "customer")
    df = o.join(bcast(c), o.o_custkey == c.c_custkey).groupBy("c_mktsegment").count()
    assert "BroadcastHashJoin" in _plan(df)


def test_bcast_withholds_hint_over_threshold(spark):
    """With the threshold below the dim's size estimate the hint must
    NOT be applied: the planned join falls back to a shuffle strategy
    (sort-merge / shuffled-hash) instead of a forced broadcast — this
    is the 100 TB contract (no planned-in OOM on SF-scaling dims)."""
    from lance_flink_spark.registry import bcast

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
        o = table(spark, SF_DIR, "orders")
        c = table(spark, SF_DIR, "customer")
        hinted = bcast(c)
        df = o.join(hinted, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").count()
        plan = _plan(df)
        assert "BroadcastHashJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_enrich_stream_does_not_force_broadcast_on_large_dim(spark):
    """streaming/joins.enrich_stream: the dim broadcast is size-gated,
    not forced. With the threshold below the dim's estimate the join
    must plan a shuffle strategy — a forced F.broadcast here was the
    one unconditional-hint site the r5 sweep missed (an OOM by plan
    for an SF-scaling dim at 100 TB). Plan-level contract, so a batch
    frame stands in for the stream side (join planning is identical;
    the static side is re-planned per micro-batch either way)."""
    from lance_flink_spark.streaming.joins import enrich_stream

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
        o = table(spark, SF_DIR, "orders").withColumnRenamed("o_custkey", "c_custkey")
        c = table(spark, SF_DIR, "customer")
        plan = _plan(enrich_stream(o, c, "c_custkey"))
        assert "BroadcastHashJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_enrich_stream_broadcasts_small_dim(spark):
    """...and with the default threshold a genuinely small dim still
    broadcasts (the fast path users expect from a lookup join)."""
    from lance_flink_spark.streaming.joins import enrich_stream

    o = table(spark, SF_DIR, "orders").withColumnRenamed("o_custkey", "c_custkey")
    c = table(spark, SF_DIR, "customer")
    assert "BroadcastHashJoin" in _plan(enrich_stream(o, c, "c_custkey"))


def test_bcast_disabled_threshold_never_hints(spark):
    """autoBroadcastJoinThreshold=-1 disables broadcasting entirely;
    bcast must respect that and return the frame unhinted."""
    from lance_flink_spark.registry import bcast

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        c = table(spark, SF_DIR, "customer")
        assert bcast(c) is c
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_q3_keeps_broadcast_plan_at_small_sf(spark):
    """End-to-end: the size-gated hint still yields the broadcast plan
    for the real q3 at test SF (the gate must not cost the good plan
    where broadcasting is right)."""
    from lance_flink_spark.plans.tpch import q3_shipping_priority

    assert "BroadcastHashJoin" in _plan(q3_shipping_priority(spark, SF_DIR))


class TestLikePrefixIndexPruning:
    """LIKE 'prefix%' routes through the scalar-index range sidecar
    (reference pushes LIKE to the Lance scan,
    LanceDynamicTableSource.java:260): file pruning on the literal
    prefix as a lexicographic range, exact LIKE re-applied to rows."""

    @pytest.fixture(scope="class")
    def likeds(self, spark, tmp_path_factory):
        from lance_flink_spark.sources.dataset import Dataset

        root = str(tmp_path_factory.mktemp("likeidx") / "ds")
        df = spark.range(3000).selectExpr(
            "id",
            "CONCAT(CASE WHEN id < 1000 THEN 'alpha-' WHEN id < 2000 "
            "THEN 'beta-' ELSE 'gamma-' END, LPAD(CAST(id AS STRING), 6, '0')) AS name",
        )
        d = Dataset(root)
        # sort on name -> per-file name spans are disjoint prefixes
        d.write(
            df.repartitionByRange(6, "name"),
            sort_by=["name"],
            max_rows_per_file=500,
        )
        d.build_scalar_index(spark, "name")
        return d

    def test_like_conjunct_translation(self):
        from lance_flink_spark.sources.dataset import Dataset

        assert Dataset._like_conjuncts("abc%") == [(">=", "abc"), ("<", "abd")]
        assert Dataset._like_conjuncts("abc") == [("=", "abc")]
        assert Dataset._like_conjuncts("ab%c%") == [(">=", "ab"), ("<", "ac")]
        assert Dataset._like_conjuncts("a_c") == [(">=", "a"), ("<", "b")]
        assert Dataset._like_conjuncts("%abc") is None
        assert Dataset._like_conjuncts("_bc") is None

    def test_like_prefix_prunes_files(self, likeds, spark):
        full = likeds.read(spark)
        routed = likeds.read(spark, filter="name LIKE 'beta-%'")
        assert len(routed.inputFiles()) < len(full.inputFiles())
        assert routed.count() == 1000
        # parity with the unrouted plain filter
        plain = full.filter("name LIKE 'beta-%'")
        assert sorted(r.id for r in routed.collect()) == sorted(
            r.id for r in plain.collect()
        )

    def test_like_interior_wildcard_prunes_on_prefix(self, likeds, spark):
        routed = likeds.read(spark, filter="name LIKE 'alpha-0005%'")
        assert len(routed.inputFiles()) < len(likeds.read(spark).inputFiles())
        assert routed.count() == 100  # 000500..000599
        assert all(
            r.name.startswith("alpha-0005") for r in routed.collect()
        )

    def test_like_no_prefix_falls_through(self, likeds, spark):
        # '%x' shapes can't range-prune: full file list, still correct
        df = likeds.read(spark, filter="name LIKE '%-000042'")
        assert df.count() == 1


class TestMultiColumnIndexIntersection:
    """AND-chains over MULTIPLE indexed columns intersect each
    column's candidate file set: a conjunction can only match a file
    every conjunct's index admits, so the routed read must scan
    strictly fewer files than either single-column route."""

    @pytest.fixture(scope="class")
    def mcds(self, spark, tmp_path_factory):
        from lance_flink_spark.sources.dataset import Dataset

        root = str(tmp_path_factory.mktemp("mcidx") / "ds")
        # 8 files sorted by (grp, ts): grp 'a' files span ts quarters
        # [0,500)...[1500,2000), grp 'b' repeats the same ts spans —
        # so a grp-only prune keeps 4 files, a ts-only prune keeps 4,
        # and the conjunction keeps exactly 2.
        df = spark.range(4000).selectExpr(
            "id",
            "CASE WHEN id < 2000 THEN 'a' ELSE 'b' END AS grp",
            "CAST(id % 2000 AS BIGINT) AS ts",
        )
        d = Dataset(root)
        d.write(
            df.repartitionByRange(8, "grp", "ts"),
            sort_by=["grp", "ts"],
            max_rows_per_file=500,
        )
        d.build_scalar_index(spark, "grp")
        d.build_scalar_index(spark, "ts")
        return d

    def test_intersection_beats_either_single_column_route(self, mcds, spark):
        both = mcds.read(spark, filter="grp = 'a' AND ts >= 1000")
        by_grp = mcds.read(spark, filter="grp = 'a'")
        by_ts = mcds.read(spark, filter="ts >= 1000")
        assert len(both.inputFiles()) < len(by_grp.inputFiles())
        assert len(both.inputFiles()) < len(by_ts.inputFiles())
        assert both.count() == 1000
        # parity with the unrouted plain filter
        plain = mcds.read(spark).filter("grp = 'a' AND ts >= 1000")
        assert sorted(r.id for r in both.collect()) == sorted(
            r.id for r in plain.collect()
        )

    def test_unindexed_conjunct_does_not_block_pruning(self, mcds, spark):
        # id has no index: its conjunct can't prune, but grp's still
        # must (over-approximation is safe — exact filter reapplies)
        routed = mcds.read(spark, filter="grp = 'a' AND id >= 0")
        assert len(routed.inputFiles()) < len(mcds.read(spark).inputFiles())
        assert routed.count() == 2000

    def test_range_chain_on_one_column_still_routes(self, mcds, spark):
        # the pre-existing single-column time-range shape must be
        # unaffected by the multi-column generalization
        routed = mcds.read(spark, filter="ts >= 500 AND ts < 1000")
        assert len(routed.inputFiles()) < len(mcds.read(spark).inputFiles())
        assert routed.count() == 1000
