"""ANALYZE statistics feeding the size-gated broadcast hint
(registry.bcast + Dataset.stats, round 13): Catalyst sizes tables from
FILE bytes, which deletion-vector DELETEs never shrink — the analyzed
live-byte estimate must flip the hint as soon as stats are fresh, and
stale stats (commits since ANALYZE) must be ignored."""

import pytest
from pyspark.sql import functions as F

from lance_flink_spark.registry import bcast
from lance_flink_spark.sources.catalog import Catalog
from lance_flink_spark.sources.dataset import Dataset
from lance_flink_spark.sources.ddl import SqlEngine


@pytest.fixture()
def dim(spark, tmp_path_str):
    """A dim whose FILE size sits above the test threshold until a dv
    DELETE removes ~97% of its rows."""
    eng = SqlEngine(spark, Catalog(tmp_path_str + "/wh"))
    eng.execute(
        """CREATE TABLE dim (k BIGINT, pad STRING)
           WITH ('connector' = 'lance', 'delete.mode' = 'deletion-vector')"""
    )
    spark.range(20_000).selectExpr(
        "id AS k", "repeat(uuid(), 4) AS pad"
    ).createOrReplaceTempView("dim_src")
    eng.execute("INSERT INTO dim SELECT * FROM dim_src")
    return eng


def _hinted(df, ds=None) -> bool:
    # bcast() returns the SAME object when it declines to hint (the dv
    # read plan contains its own internal tombstone-broadcast hint, so
    # plan-string probes would false-positive)
    return bcast(df, dataset=ds) is not df


def test_live_bytes_flip_hint_after_dv_delete(spark, dim, tmp_path_str):
    ds: Dataset = dim.catalog.load_table("default", "dim")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # threshold well under the table's file size but far above the
        # post-delete live footprint
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "200kb")
        assert not _hinted(ds.read(spark), ds)  # too big, Catalyst gate
        # dv DELETE keeps file bytes: Catalyst still refuses...
        dim.execute("DELETE FROM dim WHERE k % 32 <> 0")
        assert not _hinted(ds.read(spark))  # Catalyst can't see it
        assert ds.stats() is None  # no ANALYZE since the delete
        assert not _hinted(ds.read(spark), ds)  # stale-safe
        # ...until fresh ANALYZE stats scale bytes by the live fraction
        dim.execute("ANALYZE TABLE dim COMPUTE STATISTICS")
        st = ds.stats()
        assert st is not None and st["rows"] == 625
        assert st["live_bytes"] < st["bytes"] // 16
        assert _hinted(ds.read(spark), ds)
        # a new commit invalidates the stats again (stale would mis-gate)
        dim.execute("INSERT INTO dim SELECT k + 100000, pad FROM dim_src")
        assert ds.stats() is None
        assert not _hinted(ds.read(spark), ds)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_hinted_join_plans_broadcast_end_to_end(spark, dim, tmp_path_str):
    """The flipped hint reaches the physical plan: post-delete +
    ANALYZE, a fact⋈dim join through bcast() plans a
    BroadcastHashJoin where the unhinted join does not."""
    ds: Dataset = dim.catalog.load_table("default", "dim")
    dim.execute("DELETE FROM dim WHERE k % 32 <> 0")
    dim.execute("ANALYZE TABLE dim COMPUTE STATISTICS")
    fact = spark.range(200_000).select(
        (F.col("id") % 20_000).alias("k"), F.col("id").alias("m")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "200kb")
        hinted = fact.join(bcast(ds.read(spark), dataset=ds), "k")
        plain = fact.join(ds.read(spark), "k")
        # the dv read contains its own internal tombstone broadcast, so
        # probe the FACT join's node type: hinted plans it broadcast,
        # the unhinted control sort-merges (Catalyst's file-byte gate)
        hp = hinted._jdf.queryExecution().executedPlan().toString()
        pp = plain._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in hp
        assert "SortMergeJoin" in pp
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_native_table_broadcast_hint(spark, tmp_path_str):
    """A NATIVE table view carries a size-gated broadcast hint from
    the manifest's own byte accounting (round 14): Catalyst can't size
    a mapInPandas source, so without the hint a small native dim never
    auto-broadcasts. Under a tiny threshold the hint must vanish."""
    import os

    import pyarrow as pa

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import write_dataset

    root = os.path.join(tmp_path_str, "dim")
    write_dataset(
        root,
        pa.table(
            {
                "k": pa.array(range(10), pa.int64()),
                "name": pa.array([f"d{i}" for i in range(10)], pa.large_utf8()),
            }
        ),
    )
    eng = SqlEngine(spark, Catalog(os.path.join(tmp_path_str, "whw")))
    eng.execute(
        f"CREATE TABLE dim (k BIGINT, name STRING) "
        f"WITH ('connector'='lance', 'path'='{root}')"
    )
    spark.range(0, 10_000).selectExpr("id % 10 AS k", "id AS x") \
        .createOrReplaceTempView("fact")
    plan = eng.execute(
        "SELECT f.k, COUNT(*) AS n FROM fact f JOIN dim d ON f.k = d.k "
        "GROUP BY f.k"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the HINT itself must be present (AQE could broadcast a small
    # local relation on its own — that would mask a dead hint)
    logical = (
        eng.execute("SELECT * FROM dim")
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "ResolvedHint" in logical
    # a threshold below the file size must drop the hint
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "16")
    try:
        eng2 = SqlEngine(spark, Catalog(os.path.join(tmp_path_str, "whw2")))
        eng2.execute(
            f"CREATE TABLE dim2 (k BIGINT, name STRING) "
            f"WITH ('connector'='lance', 'path'='{root}')"
        )
        plan2 = eng2.execute(
            "SELECT f.k, COUNT(*) AS n FROM fact f JOIN dim2 d ON f.k = d.k "
            "GROUP BY f.k"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
