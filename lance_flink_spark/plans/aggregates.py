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
    extra=True,  # r15 rotation: demoted, full oracle still checked in extras
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


@query(
    "dv_mutation_pipeline",
    # r11 rotation: the #221 deletion-vector flagship gets driver-grade evidence
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, o_orderpriority AS grp,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders),
    d AS (SELECT * FROM base WHERE k % 7 <> 3),
    u AS (SELECT k, grp,
                 CASE WHEN k % 5 = 1 THEN cents + 100 ELSE cents END AS cents
          FROM d),
    m_src AS (SELECT k, grp, cents * 3 AS cents FROM base WHERE k % 11 = 0),
    final AS (
      SELECT k, grp, cents FROM u WHERE k NOT IN (SELECT k FROM m_src)
      UNION ALL
      SELECT k, grp, cents FROM m_src)
    SELECT grp, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM final GROUP BY grp
    """,
)
def dv_mutation_pipeline(spark, sf_dir):
    """Deletion-vector mutations hash-graded end-to-end: a dv-mode
    table takes a DELETE (tombstones), an UPDATE (tombstones + new
    fragment), and a dv MERGE whose source re-inserts keys the DELETE
    tombstoned — the final aggregate reads through the stacked
    sidecars. The oracle replays the whole history relationally, so a
    resurrected row, a double tombstone, a missed update copy, or a
    merge that failed to supersede anywhere in the DV machinery
    breaks the hash."""
    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine

    tag = sf_dir.rstrip("/").replace("/", "_")
    eng = SqlEngine(spark, Catalog(scratch_dir("warehouse_dv" + tag)))
    table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey AS k",
        "o_orderpriority AS grp",
        "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
    ).createOrReplaceTempView("orders_dv_src")
    eng.execute(
        """CREATE TABLE IF NOT EXISTS odv (k BIGINT, grp STRING, cents BIGINT)
           WITH ('connector' = 'lance', 'delete.mode' = 'deletion-vector')"""
    )
    # OVERWRITE resets files AND deletion vectors: reruns replay the
    # identical history
    eng.execute("INSERT OVERWRITE odv SELECT * FROM orders_dv_src")
    eng.execute("DELETE FROM odv WHERE k % 7 = 3")
    eng.execute("UPDATE odv SET cents = cents + 100 WHERE k % 5 = 1")
    ds = eng.catalog.load_table("default", "odv")
    src = spark.table("orders_dv_src").filter("k % 11 = 0").selectExpr(
        "k", "grp", "cents * 3 AS cents"
    )
    ds.merge_insert(spark, src, on="k", dv=True)
    eng._register("odv")
    return eng.execute(
        "SELECT grp, COUNT(*) AS n, SUM(cents) AS total_cents FROM odv GROUP BY grp"
    )


@query(
    "sql_upsert_table",
    # r12 rotation: the #229 PRIMARY KEY SQL upsert gets driver-grade evidence
    oracle="""
    SELECT user_id, event_type, ts_us, event_id, value_cents FROM (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
    WHERE rn = 1
    """,
)
def sql_upsert_table(spark, sf_dir):
    """PRIMARY KEY upsert table through the SQL surface (Flink
    upsert-sink semantics: INSERT INTO materializes latest state per
    key; the composite 'sequence-field' makes loads last-writer-wins
    guarded, so ARBITRARY batch order converges). Events split into
    two overlapping halves by event_id parity — each half carries
    rows both newer and older than the other per user — and two
    INSERT INTO statements must land exactly the batch keep-last
    oracle. A lost update, a stale clobber, an unguarded insert, or a
    broken intra-batch fold breaks the hash."""
    import shutil

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine

    tag = sf_dir.rstrip("/").replace("/", "_")
    wh = scratch_dir("upsert_sql" + tag)
    shutil.rmtree(wh, ignore_errors=True)
    eng = SqlEngine(spark, Catalog(wh))
    table(spark, sf_dir, "events").selectExpr(
        "user_id",
        "event_type",
        "unix_micros(ts) AS ts_us",
        "event_id",
        "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_cents",
    ).createOrReplaceTempView("__ups_events")
    eng.execute(
        """CREATE TABLE latest (user_id BIGINT, event_type STRING,
                                ts_us BIGINT, event_id BIGINT,
                                value_cents BIGINT,
                                PRIMARY KEY (user_id) NOT ENFORCED)
           WITH ('connector' = 'lance',
                 'delete.mode' = 'deletion-vector',
                 'sequence-field' = 'ts_us,event_id')"""
    )
    eng.execute(
        "INSERT INTO latest SELECT * FROM __ups_events WHERE event_id % 2 = 0"
    )
    eng.execute(
        "INSERT INTO latest SELECT * FROM __ups_events WHERE event_id % 2 = 1"
    )
    return eng.execute(
        "SELECT user_id, event_type, ts_us, event_id, value_cents FROM latest"
    )
