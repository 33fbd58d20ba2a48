"""Physical-layout guarantees: bucketed joins are shuffle-free, and
partitioned reads prune directories.

These pin the PLAN, not just the answer — the whole point of the
layout is what it removes from the physical plan.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def storage(spark):
    import lance_flink_spark.plans.storage as st

    return st


def test_bucketed_join_has_no_shuffle(spark, storage):
    lt = storage._bucketed_table(spark, SF_DIR, "lineitem", "l_orderkey")
    ot = storage._bucketed_table(spark, SF_DIR, "orders", "o_orderkey")
    l = spark.table(lt)  # noqa: E741
    o = spark.table(ot)
    joined = l.hint("merge").join(o.hint("merge"), l.l_orderkey == o.o_orderkey)
    plan = _physical_plan(joined)
    assert "SortMergeJoin" in plan
    # bucketed+sorted on the join key: no exchange, no per-task sort
    assert "Exchange" not in plan, plan
    # the same join on plain parquet DOES shuffle — proves the layout,
    # not the optimizer, removed the exchange
    from lance_flink_spark.registry import table

    lp = table(spark, SF_DIR, "lineitem")
    op = table(spark, SF_DIR, "orders")
    plain = lp.hint("merge").join(op.hint("merge"), lp.l_orderkey == op.o_orderkey)
    assert "Exchange" in _physical_plan(plain)


def test_bucketed_join_matches_plain(spark, storage):
    from lance_flink_spark.registry import EXTRA_QUERIES

    got = {
        r["o_orderstatus"]: (r["n"], r["revenue"])
        for r in EXTRA_QUERIES["bucketed_join"](spark, SF_DIR).collect()
    }
    from lance_flink_spark.registry import table
    from pyspark.sql import functions as F

    l = table(spark, SF_DIR, "lineitem")  # noqa: E741
    o = table(spark, SF_DIR, "orders")
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5)
    want = {
        r["o_orderstatus"]: (r["n"], r["revenue"])
        for r in (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum(cents) / 100.0, 2).alias("revenue"),
            )
        ).collect()
    }
    assert got == want


def test_partition_pruning_reads_fewer_files(spark, storage):
    path = storage.partitioned_events_path(spark, SF_DIR)
    from pyspark.sql import functions as F

    pruned = (
        spark.read.parquet(path)
        .filter(F.col("event_day") == F.lit("2024-01-05").cast("date"))
    )
    # the predicate must land in PartitionFilters (directory pruning),
    # NOT in PushedFilters/DataFilters (which would open every file).
    # inputFiles() can't verify this — it lists the unpruned relation.
    plan = _physical_plan(pruned)
    scan = plan[plan.index("FileScan") :]
    pf = scan[scan.index("PartitionFilters: [") : scan.index("]", scan.index("PartitionFilters: ["))]
    assert "event_day" in pf, plan
    # functional proof: same rows as reading ONLY that partition dir
    direct = spark.read.parquet(f"{path}/event_day=2024-01-05").count()
    assert pruned.count() == direct > 0
