"""Relational/analytical query suite over the TPC-H-ish tables.

These exercise the engine end-to-end the way the reference's SQL ITCase
(test/.../LanceSqlITCase.java, FlinkSqlDemo.java) exercises the Flink
SQL surface: scans with pushdown, joins, aggregates, window functions,
top-n.

Scale notes (100 TB):
- dim joins go through registry.bcast, a SIZE-GATED broadcast hint:
  Catalyst's own estimate under autoBroadcastJoinThreshold → hint
  fires (no shuffle of the fact side); over it → no hint, AQE picks
  the strategy at runtime. Unconditional F.broadcast is reserved for
  frames bounded by construction (single-row scalar aggregates) —
  customer/part/supplier scale with SF, so forcing their broadcast
  would be a planned-in OOM at TPC-H 100× scale.
- groupBy aggregates are partial (map-side combine) before the shuffle.
- top-n uses orderBy().limit(), which Spark executes as
  TakeOrderedAndProject: per-partition heap, driver merge of k rows —
  no global sort shuffle.

Float discipline: every float aggregate is rounded (2dp money, 6dp
ratios) in BOTH the Spark plan and the oracle so cross-engine
summation-order differences (1e-9 relative) can't flip the
driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lance_flink_spark.registry import bcast, query, table


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_extendedprice), 6) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: filter → groupBy → multi-agg. Single shuffle on
    a 6-value grouping key; partial aggregation makes the shuffle tiny
    regardless of fact size."""
    l = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15'
      AND l_shipdate > TIMESTAMP '1997-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter broadcast into two fact
    joins, then grouped top-n. customer(filtered) is broadcast; the
    orders⋈lineitem join shuffles on orderkey (AQE handles skew)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(bcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier",
    extra=True,  # r14 rotation: banked; Q1/Q3 keep the TPC-H primary slots
    oracle="""
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier(spark, sf_dir):
    """TPC-H Q5 shape: snowflake join. region→nation→supplier collapses
    into one broadcast dim; only orders⋈lineitem shuffles."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    dim = (
        table(spark, sf_dir, "supplier")
        .join(table(spark, sf_dir, "nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(table(spark, sf_dir, "region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("s_suppkey", "n_name")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(bcast(dim), l.l_suppkey == dim.s_suppkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q6_revenue_delta",
    extra=True,  # gate-covered by tpch_scalars / pytest extras oracle
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_delta(spark, sf_dir):
    """TPC-H Q6 shape: pure scan+filter+agg. All four predicates reach
    the parquet reader (PushedFilters); no shuffle at all (global agg
    = partial per partition + single-row merge)."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "tpch_scalars",
    extra=True,  # r13 rotation: banked (driver hash-green r12); Q1/Q3/Q5 stay primary
    oracle="""
    SELECT q6.q6_revenue, q6.q6_n, q15.q15_suppkey, q15.q15_total,
           q17.q17_avg_yearly, q17.q17_n, q19.q19_revenue, q19.q19_n
    FROM (
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS q6_revenue,
               COUNT(*) AS q6_n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24) q6,
    (
        WITH rev AS (
            SELECT l_suppkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey)
        SELECT s_suppkey AS q15_suppkey, total AS q15_total
        FROM supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total = (SELECT MAX(total) FROM rev)) q15,
    (
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS q17_avg_yearly,
               COUNT(*) AS q17_n
        FROM lineitem l
        JOIN (SELECT l_partkey AS pk, 0.2 * AVG(l_quantity) AS lim
              FROM lineitem GROUP BY l_partkey) t
          ON l.l_partkey = t.pk
        WHERE l.l_quantity < t.lim) q17,
    (
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS q19_revenue,
               COUNT(*) AS q19_n
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 25 AND l_quantity BETWEEN 10 AND 30)) q19
    """,
)
def tpch_scalars(spark, sf_dir):
    """Scalar TPC-H suite in one gate entry (SURVEY §2 #21/#73/#74/#75):
    Q6 selective filter agg, Q15 scalar-subquery max, Q17 decorrelated
    per-group threshold, Q19 disjunctive join predicates. Each produces
    a single row; the cross join of four 1-row results is free (all
    broadcast). Standalone shapes stay as extras for per-query bench."""
    q6 = q6_revenue_delta(spark, sf_dir).select(
        F.col("revenue").alias("q6_revenue"), F.col("n_items").alias("q6_n")
    )
    q15 = q15_top_supplier(spark, sf_dir).select(
        F.col("s_suppkey").alias("q15_suppkey"), F.col("total").alias("q15_total")
    )
    q17 = q17_small_quantity_revenue(spark, sf_dir).select(
        F.col("avg_yearly").alias("q17_avg_yearly"), F.col("n").alias("q17_n")
    )
    q19 = q19_disjunctive_revenue(spark, sf_dir).select(
        F.col("revenue").alias("q19_revenue"), F.col("n").alias("q19_n")
    )
    return q6.crossJoin(q15).crossJoin(q17).crossJoin(q19)


@query(
    "mktsegment_rollup",
    extra=True,  # gate budget: broadcast dim join also exercised by q3/q5/streaming_enrich
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_revenue,
           ROUND(AVG(o_totalprice), 6) AS avg_order_value
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def mktsegment_rollup(spark, sf_dir):
    """Broadcast dim join + rollup: customer broadcast to the orders
    scan, aggregate shuffles only 5 grouped rows per partition."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(bcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_order_value"),
        )
    )


@query(
    "top_parts_per_brand",
    extra=True,  # r12 rotation: window-rank evidence banked over many driver rounds
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rn FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               ROW_NUMBER() OVER (
                   PARTITION BY p_brand
                   ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part) t
    WHERE rn <= 3
    """,
)
def top_parts_per_brand(spark, sf_dir):
    """Window-function top-n per group; single shuffle on the partition
    key. At scale, per-group top-n via window beats a global sort."""
    from pyspark.sql import Window

    p = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.select("p_brand", "p_partkey", "p_retailprice", F.row_number().over(w).cast("long").alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "topn_orders",
    extra=True,  # gate budget: TakeOrderedAndProject also exercised by q3/top_parts_per_brand
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topn_orders(spark, sf_dir):
    """Limit/order pushdown parity (LanceOptions READ_LIMIT): Spark
    plans orderBy+limit as TakeOrderedAndProject — per-partition heap of
    10, no global sort."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


@query(
    "q7_volume_shipping",
    extra=True,  # gate-covered by tpch_scalars / pytest extras oracle
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           ROUND(SUM(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(year FROM l_shipdate) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume by year. Both nation
    joins broadcast; one fact-fact shuffle."""
    l, o = table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "orders")
    c, s = table(spark, sf_dir, "customer"), table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(bcast(c), o.o_custkey == c.c_custkey)
        .join(bcast(s), l.l_suppkey == s.s_suppkey)
        .join(bcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(bcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q13_customer_distribution",
    extra=True,  # gate-covered by tpch_scalars / pytest extras oracle
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: order-count distribution via outer join with a
    join-condition filter (COUNT(col) skips the null-extended rows)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q18_large_orders",
    extra=True,  # gate-covered by tpch_scalars / pytest extras oracle
    oracle="""
    SELECT c_name, o_orderkey, o_orderdate, ROUND(o_totalprice, 2) AS o_totalprice,
           ROUND(SUM(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    HAVING SUM(l_quantity) > 150
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: HAVING over a grouped join, top-n.

    Aggregate-BEFORE-join: the per-orderkey quantity sum and its
    HAVING filter run on lineitem alone (map-side partial agg, one
    shuffle on orderkey), so only the few qualifying orderkeys ever
    join orders — at 100 TB that is the difference between joining the
    whole fact table and joining a filtered aggregate. The orderkey
    grain makes this exactly equivalent to the grouped-join form (each
    order has one customer/date/price)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    qty = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 150)
    )
    return (
        o.join(qty, o.o_orderkey == qty.l_orderkey)
        .join(bcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@query(
    "q16_supplier_variety",
    extra=True,  # gate-covered by tpch_scalars / pytest extras oracle
    oracle="""
    SELECT p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size >= 5
    GROUP BY p_type, p_size
    """,
)
def q16_supplier_variety(spark, sf_dir):
    """TPC-H Q16 shape (adapted to lineitem as the part-supplier
    bridge): distinct supplier variety per part type/size."""
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size") >= 5)
    )
    l = table(spark, sf_dir, "lineitem")
    return (
        l.join(bcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q15_top_supplier",
    extra=True,  # gate-covered by tpch_scalars / pytest extras oracle
    oracle="""
    WITH rev AS (
        SELECT l_suppkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total = (SELECT MAX(total) FROM rev)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: scalar-subquery max against a derived revenue
    view (the rounded total is the equality key on both sides)."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = l.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total")
    )
    mx = rev.agg(F.max("total").alias("mx"))
    s = table(spark, sf_dir, "supplier")
    return (
        # mx is a single-row global aggregate — bounded by construction,
        # so the unconditional hint is safe at any SF
        rev.join(F.broadcast(mx), rev.total == mx.mx)
        .join(bcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total")
    )


@query(
    "q17_small_quantity_revenue",
    extra=True,  # gate-covered by tpch_scalars / pytest extras oracle
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly, COUNT(*) AS n
    FROM lineitem l
    JOIN (SELECT l_partkey AS pk, 0.2 * AVG(l_quantity) AS lim
          FROM lineitem GROUP BY l_partkey) t
      ON l.l_partkey = t.pk
    WHERE l.l_quantity < t.lim
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated per-group average threshold,
    decorrelated into a grouped self-join."""
    l = table(spark, sf_dir, "lineitem")
    lim = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("lim")
    )
    return (
        l.join(lim, l.l_partkey == lim.pk)
        .filter(F.col("l_quantity") < F.col("lim"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q19_disjunctive_revenue",
    extra=True,  # gate-covered by tpch_scalars / pytest extras oracle
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue, COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 25 AND l_quantity BETWEEN 10 AND 30)
    """,
)
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: disjunctive multi-branch predicates across the
    join (tests OR-pushdown planning)."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    cond2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(5, 25)
        & F.col("l_quantity").between(10, 30)
    )
    return (
        l.join(bcast(p), l.l_partkey == p.p_partkey)
        .filter(cond1 | cond2)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q22_idle_customers",
    extra=True,  # r12 rotation: TPC-H family keeps Q1/Q3/Q5 driver-gated
    oracle="""
    SELECT cntrycode, COUNT(*) AS numcust, ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM (
        SELECT c_nationkey % 5 AS cntrycode, c_acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')) t
    GROUP BY cntrycode
    """,
)
def q22_idle_customers(spark, sf_dir):
    """TPC-H Q22 shape: scalar-average threshold + anti join (no
    urgent orders — the plain no-orders variant is vacuously empty on
    this data, which the gate would 'match' without testing anything)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    avg_bal = c.filter("c_acctbal > 0").agg(F.avg("c_acctbal").alias("ab"))
    return (
        # avg_bal is a single-row global aggregate — bounded by
        # construction, safe to broadcast unconditionally
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 5).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "running_revenue",
    extra=True,  # gate budget: cumulative frame shape also exercised by pack_sequences
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev
    FROM orders
    """,
)
def running_revenue(spark, sf_dir):
    """Cumulative window frame (running per-customer revenue) — the
    ROWS UNBOUNDED PRECEDING frame; identical ordering keys make the
    cross-engine float sums bit-stable per prefix."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_rev"),
    )


@query(
    "scan_pushdown",
    extra=True,  # r14 rotation: banked; pushdown stays plan-pinned in pytest
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity > 45 AND l_returnflag = 'R'
    """,
)
def scan_pushdown(spark, sf_dir):
    """Source parity (LanceSource read.columns/read.filter): projection
    + predicates declared on the scan; Catalyst pushes both into the
    parquet reader (verified in tests/test_pushdown.py)."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "q4_order_priority",
    extra=True,  # gate budget; EXISTS-semi-join shape with correlated condition
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """Q4 shape: per-priority count of orders with at least one line
    shipped after the order date (the commit/receipt condition adapted
    to the slimmed schema). LEFT SEMI join with the correlated
    l_shipdate > o_orderdate condition INSIDE the join predicate —
    one shuffle on orderkey, then a tiny 5-key aggregate."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q12_priority_by_returnflag",
    extra=True,  # gate budget; dual conditional-agg (CASE-sum) shape
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_returnflag
    """,
)
def q12_priority_by_returnflag(spark, sf_dir):
    """Q12 shape (shipmode → returnflag on the slimmed schema): one
    fact-fact join on orderkey, then CASE-sum conditional counters —
    both counters partial-aggregate in the same map-side pass."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue",
    extra=True,  # gate budget; conditional-ratio global agg shape
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """Q14 shape: promo revenue share over a date window. part
    broadcasts (dim-sized), lineitem's date filter pushes to the
    parquet scan, and the ratio is one global conditional aggregate."""
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    l = table(spark, sf_dir, "lineitem").filter(  # noqa: E741
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(bcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )
