"""Registry entries exercising the AggregateInfo spec (SURVEY §2 #3-5)
and the catalog-backed SQL surface (#6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lance_flink_spark.operators.aggregate import AggregateInfo
from lance_flink_spark.registry import query, scratch_dir, table


@query(
    "agg_global",
    extra=True,  # gate budget; covered by agg_groupby/tpch_scalars family
    oracle="""
    SELECT COUNT(*) AS cnt,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(AVG(l_extendedprice), 6) AS avg_price,
           ROUND(MIN(l_extendedprice), 2) AS min_price,
           ROUND(MAX(l_extendedprice), 2) AS max_price
    FROM lineitem
    """,
)
def agg_global(spark, sf_dir):
    """Global COUNT/SUM/AVG/MIN/MAX via the AggregateInfo spec
    (AggregateExecutor.java:99-176 semantics). No group by → single-row
    result; Spark computes partials per partition, merges one row."""
    spec = (
        AggregateInfo()
        .count_star("cnt")
        .add("sum", "l_quantity", "sum_qty")
        .add("avg", "l_extendedprice", "avg_price")
        .add("min", "l_extendedprice", "min_price")
        .add("max", "l_extendedprice", "max_price")
    )
    out = spec.apply(table(spark, sf_dir, "lineitem"))
    return out.select(
        "cnt",
        F.round("sum_qty", 2).alias("sum_qty"),
        F.round("avg_price", 6).alias("avg_price"),
        F.round("min_price", 2).alias("min_price"),
        F.round("max_price", 2).alias("max_price"),
    )


@query(
    "agg_groupby",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS cnt,
           ROUND(SUM(o_totalprice), 2) AS sum_price,
           ROUND(MAX(o_totalprice), 2) AS max_price,
           COUNT(DISTINCT o_custkey) AS n_custs
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
)
def agg_groupby(spark, sf_dir):
    """GROUP BY aggregate via the spec (AggregateInfo.groupBy), with a
    per-group COUNT(DISTINCT) column — covering both the GROUP BY and
    COUNT DISTINCT pushdown rows (SURVEY §2 #4/#5) in one gate entry.
    The lineitem-side two-column variant stays as the agg_count_distinct
    extra."""
    spec = (
        AggregateInfo()
        .count_star("cnt")
        .add("sum", "o_totalprice", "sum_price")
        .add("max", "o_totalprice", "max_price")
        .add("count_distinct", "o_custkey", "n_custs")
        .grouped_by("o_orderstatus", "o_orderpriority")
    )
    out = spec.apply(table(spark, sf_dir, "orders"))
    return out.select(
        "o_orderstatus",
        "o_orderpriority",
        "cnt",
        F.round("sum_price", 2).alias("sum_price"),
        F.round("max_price", 2).alias("max_price"),
        "n_custs",
    )


@query(
    "agg_count_distinct",
    extra=True,
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark, sf_dir):
    """COUNT(DISTINCT) — the expand+two-phase plan Spark generates is
    the scalable version of AggregateExecutor's per-key HashSet
    (AggregateExecutor.java:115-124)."""
    spec = (
        AggregateInfo()
        .add("count_distinct", "l_suppkey", "n_suppliers")
        .add("count_distinct", "l_partkey", "n_parts")
        .count_star("cnt")
        .grouped_by("l_returnflag")
    )
    return spec.apply(table(spark, sf_dir, "lineitem"))


@query(
    "sql_join_agg",
    oracle="""
    SELECT r_name, COUNT(*) AS n_customers, ROUND(AVG(c_acctbal), 6) AS avg_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def sql_join_agg(spark, sf_dir):
    """End-to-end Table/SQL + catalog parity (LanceCatalog +
    LanceDynamicTableFactory): copy tables into a warehouse catalog,
    register them, and run spark.sql against the registered views."""
    from lance_flink_spark.sources.catalog import Catalog

    wh = scratch_dir("warehouse_sql_join_agg")
    cat = Catalog(wh)
    for t in ("customer", "nation", "region"):
        df = table(spark, sf_dir, t)
        cat.create_table("default", t, df, mode="overwrite")
        cat.register(spark, "default", t, view=f"cat_{t}")
    return spark.sql(
        """
        SELECT r_name, COUNT(*) AS n_customers, ROUND(AVG(c_acctbal), 6) AS avg_bal
        FROM cat_customer
        JOIN cat_nation ON c_nationkey = n_nationkey
        JOIN cat_region ON n_regionkey = r_regionkey
        GROUP BY r_name
        """
    )


@query(
    "sql_ddl_pipeline",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS total
    FROM customer WHERE c_acctbal > 0 GROUP BY c_mktsegment
    """,
)
def sql_ddl_pipeline(spark, sf_dir):
    """Flink-dialect DDL/DML end-to-end (LanceDynamicTableFactory +
    flink-sql-demo.sql parity): CREATE TABLE WITH(...), INSERT
    OVERWRITE ... SELECT, then a SELECT aggregate over the table."""
    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine

    eng = SqlEngine(spark, Catalog(scratch_dir("warehouse_ddl")))
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_src")
    eng.execute(
        """CREATE TABLE IF NOT EXISTS cust_ddl (c_custkey BIGINT, c_acctbal DOUBLE,
           c_mktsegment STRING)
           WITH ('connector' = 'lance', 'path' = '',
                 'write.max-rows-per-file' = '100000')"""
    )
    eng.execute(
        "INSERT OVERWRITE cust_ddl SELECT c_custkey, c_acctbal, c_mktsegment FROM customer_src"
    )
    return eng.execute(
        """SELECT c_mktsegment, COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS total
           FROM cust_ddl WHERE c_acctbal > 0 GROUP BY c_mktsegment"""
    )
