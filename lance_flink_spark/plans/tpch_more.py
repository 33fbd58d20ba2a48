"""Remaining TPC-H query shapes, adapted to the available columns.

The testdata has no ``partsupp`` table and no commit/receipt dates on
``lineitem`` (TESTDATA.md), so Q2/Q9/Q11/Q20/Q21 are re-expressed over
the columns that exist while keeping each query's *defining plan shape*
(the thing the reference's SQL surface — test/.../LanceSqlITCase.java —
actually exercises):

- Q2  → correlated per-group MIN (window-min + tie-keeping filter)
- Q8  → two-role dimension (nation joined twice) + conditional share
- Q9  → multi-way snowflake profit rollup by (nation, year)
- Q10 → fact-side pre-aggregation THEN dim join, grouped top-n
- Q11 → HAVING against a global scalar subquery (share threshold)
- Q20 → windowed share-of-part threshold feeding a semi join
- Q21 → per-order supplier stats joined back (EXISTS/NOT-EXISTS
        collapsed to one aggregate + filter, the distributed form)

All are ``extra=True``: the driver-facing primary registry is capped at
50 entries; these are oracle-checked by tests/test_extras_oracle.py and
``tools/check_oracle.py --extras`` exactly like the primaries.

Scale notes (100 TB): every query aggregates or filters the fact table
BEFORE joining SF-scaling dims, dim joins go through the size-gated
``bcast`` (never a forced broadcast of customer/part/supplier), and
top-n is orderBy().limit() → TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lance_flink_spark.registry import bcast, query, table


@query(
    "q10_returned_items",
    extra=True,  # gate budget: agg-then-dim-join + top-n also in q3/q18
    oracle="""
    SELECT c_custkey, c_name, revenue, c_acctbal, n_name
    FROM (
      SELECT o_custkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-10-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY o_custkey
    ) r
    JOIN customer ON c_custkey = o_custkey
    JOIN nation ON c_nationkey = n_nationkey
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: returned-item revenue by customer, top 20.

    The fact side (lineitem⋈orders) is aggregated down to one row per
    customer BEFORE customer/nation join — at 100 TB the dim join input
    is |customers with returns in the quarter|, not |lineitems|. The
    returnflag + date filters push to the parquet scans."""
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")  # noqa: E741
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    rev = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        rev.join(bcast(c), rev.o_custkey == c.c_custkey)
        .join(bcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q8_market_share",
    extra=True,  # gate budget: two-role dim + conditional share
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND p_type = 'STANDARD'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
    ) t
    GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: national market share within a region.

    nation plays TWO roles (supplier's nation feeds the share numerator,
    customer's nation restricts to the region) — the classic alias-join
    the reference's SQL surface supports. Both dim stacks collapse to
    size-gated broadcasts; the only big shuffle is lineitem⋈orders."""
    n = table(spark, sf_dir, "nation")
    supp_dim = (
        table(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_dim = (
        table(spark, sf_dir, "customer")
        .join(n.alias("n1"), F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(
            table(spark, sf_dir, "region"),
            F.col("n1.n_regionkey") == F.col("r_regionkey"),
        )
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        l.join(bcast(p), l.l_partkey == p.p_partkey)
        .join(bcast(supp_dim), l.l_suppkey == supp_dim.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(bcast(cust_dim), o.o_custkey == cust_dim.c_custkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    return joined.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(
                    0.0
                )
            )
            / F.sum("volume"),
            6,
        ).alias("mkt_share")
    )


@query(
    "q9_profit_by_nation",
    extra=True,  # gate budget: snowflake profit rollup
    oracle="""
    SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
           ROUND(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                          AS BIGINT)) / 100.0, 2) AS profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, o_year
    ORDER BY n_name, o_year DESC
    """,
)
def q9_profit_by_nation(spark, sf_dir):
    """TPC-H Q9 shape (profit proxy — testdata has no partsupp, so no
    supplycost term): revenue by supplier nation × order year for parts
    matching a name pattern. part(filtered) and supplier⋈nation are
    size-gated broadcasts; lineitem⋈orders is the one big shuffle, and
    the final rollup groups on a (nation, year) key of bounded
    cardinality."""
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey")
    )
    sn = (
        table(spark, sf_dir, "supplier")
        .join(
            table(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    return (
        l.join(bcast(p), l.l_partkey == p.p_partkey)
        .join(bcast(sn), l.l_suppkey == sn.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            # revenue is quantized to integer cents PER ROW via
            # floor(v*100 + 0.5) — pure IEEE double ops that every
            # engine evaluates bit-identically — then summed as BIGINT.
            # A plain double SUM rounded to 2dp flipped on a half-cent
            # boundary between Spark and DuckDB at sf0.01; exact
            # integer arithmetic cannot.
            F.round(
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                        + 0.5
                    )
                )
                / 100.0,
                2,
            ).alias("profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "q2_min_cost_supplier",
    extra=True,  # gate budget: correlated-min (window) + tie keeping
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), best AS (
      SELECT *, MIN(unit_cost) OVER (PARTITION BY l_partkey) AS best_cost
      FROM cost
    )
    SELECT p_partkey, p_brand, s_name, n_name,
           ROUND(unit_cost, 4) AS unit_cost
    FROM best
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE unit_cost = best_cost AND p_size <= 5 AND r_name = 'EUROPE'
    ORDER BY unit_cost, p_partkey, s_name
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (partsupp-free adaptation): for each small part,
    the EUROPE supplier(s) offering the minimum observed unit price.

    The correlated scalar subquery (min cost per part) is expressed as
    a window MIN over the per-(part,supplier) aggregate — the
    decorrelated form that scales: one shuffle to build the aggregate,
    a window over the already-reduced frame (|parts|×|suppliers| rows,
    not |lineitems|), ties kept exactly like Q2's join-back."""
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    cost = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("best_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("best_cost")
    )
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 5)
        .select("p_partkey", "p_brand")
    )
    sn = (
        table(spark, sf_dir, "supplier")
        .join(
            table(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            table(spark, sf_dir, "region"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "n_name")
    )
    return (
        best.join(bcast(p), best.l_partkey == p.p_partkey)
        .join(bcast(sn), best.l_suppkey == sn.s_suppkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "n_name",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy("unit_cost", "p_partkey", "s_name")
        .limit(100)
    )


@query(
    "q11_value_concentration",
    extra=True,  # gate budget: HAVING vs global scalar subquery
    oracle="""
    WITH supp_value AS (
      SELECT l_suppkey,
             SUM(l_extendedprice * (1 - l_discount)) AS raw_value
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY l_suppkey
    )
    SELECT l_suppkey, ROUND(raw_value, 2) AS value
    FROM supp_value
    WHERE raw_value > (SELECT SUM(raw_value) * 0.04 FROM supp_value)
    ORDER BY value DESC, l_suppkey
    """,
)
def q11_value_concentration(spark, sf_dir):
    """TPC-H Q11 shape: suppliers holding an outsized share of regional
    shipment value — per-group sum HAVING > fraction of the GLOBAL sum.

    The global threshold is a single-row aggregate cross-joined in
    (unconditionally broadcast — bounded by construction). The per-
    supplier aggregate is computed once and reused for both sides, so
    the fact table is scanned once."""
    sd = (
        table(spark, sf_dir, "supplier")
        .join(
            table(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            table(spark, sf_dir, "region"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter(F.col("r_name") == "ASIA")
        .select("s_suppkey")
    )
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    supp_value = (
        l.join(bcast(sd), l.l_suppkey == sd.s_suppkey)
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "raw_value"
            )
        )
    )
    threshold = supp_value.agg(
        (F.sum("raw_value") * F.lit(0.04)).alias("threshold")
    )
    return (
        supp_value.crossJoin(F.broadcast(threshold))
        .filter(F.col("raw_value") > F.col("threshold"))
        .select("l_suppkey", F.round("raw_value", 2).alias("value"))
        .orderBy(F.desc("value"), "l_suppkey")
    )


@query(
    "q20_part_share_suppliers",
    extra=True,  # gate budget: windowed share threshold → semi join
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey
    ), dominant AS (
      SELECT DISTINCT l_suppkey FROM (
        SELECT l_suppkey, qty,
               SUM(qty) OVER (PARTITION BY l_partkey) AS part_qty
        FROM shipped
      ) WHERE qty > 0.5 * part_qty
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
    ORDER BY s_suppkey
    """,
)
def q20_part_share_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (adapted): suppliers who shipped >50% of some
    PROMO part's 1997 volume — a correlated share threshold feeding an
    IN-subquery (semi join).

    The correlated total-per-part is a window SUM over the already
    aggregated (part, supplier) frame; the IN becomes a left-semi join
    on the distinct dominant-supplier set (tiny → broadcast-gated)."""
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    l = table(spark, sf_dir, "lineitem").filter(  # noqa: E741
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = (
        l.join(bcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        shipped.withColumn("part_qty", F.sum("qty").over(w))
        .filter(F.col("qty") > 0.5 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        s.join(bcast(dominant), s.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(bcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


@query(
    "q21_sole_return_supplier",
    extra=True,  # gate budget: EXISTS/NOT-EXISTS via per-order stats
    oracle="""
    WITH order_stats AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN l_returnflag = 'R'
                                 THEN l_suppkey END) AS n_ret_supp
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT s_name, numwait
    FROM (
      SELECT l_suppkey, COUNT(DISTINCT l.l_orderkey) AS numwait
      FROM lineitem l
      JOIN order_stats os ON l.l_orderkey = os.l_orderkey
      WHERE l.l_returnflag = 'R' AND os.n_supp > 1 AND os.n_ret_supp = 1
      GROUP BY l_suppkey
    ) w
    JOIN supplier ON l_suppkey = s_suppkey
    ORDER BY numwait DESC, s_name
    LIMIT 25
    """,
)
def q21_sole_return_supplier(spark, sf_dir):
    """TPC-H Q21 shape (adapted — testdata lacks commit/receipt dates):
    suppliers who were the ONLY supplier with a returned line on a
    multi-supplier order.

    Q21's EXISTS (another supplier on the order) + NOT EXISTS (another
    supplier also late) pair decorrelates into ONE per-order aggregate
    (distinct-supplier count, distinct-returning-supplier count) joined
    back to the fact — two shuffles on l_orderkey total, instead of two
    correlated re-scans of lineitem. At 100 TB both shuffles co-locate
    on the same key, so AQE can reuse the exchange."""
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    stats = l.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    faulted = (
        l.filter(F.col("l_returnflag") == "R")
        .join(
            stats.filter((F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1)),
            "l_orderkey",
        )
        .groupBy("l_suppkey")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )
    s = table(spark, sf_dir, "supplier")
    return (
        faulted.join(bcast(s), faulted.l_suppkey == s.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(25)
    )


@query(
    "orders_cube",
    extra=True,  # gate budget: CUBE / grouping-sets (ROLLUP is primary)
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
           COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
           ROUND(SUM(o_totalprice), 2) AS total, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus, o_orderpriority
    """,
)
def orders_cube(spark, sf_dir):
    """CUBE over (status, priority): all four grouping sets in one pass.

    Spark expands the cube map-side (each row feeds every grouping
    set's partial aggregate), so it is still a single shuffle whose
    width is the sum of the grouping-set cardinalities — bounded here,
    and the NULL indicator columns are coalesced to 'ALL' to keep the
    output oracle-comparable."""
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "total",
            "n",
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@query(
    "q16_supplier_relationship",
    extra=True,  # gate budget: distinct-count + NOT IN anti-join
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_relationship(spark, sf_dir):
    """Q16 parts/supplier relationship, adapted: the part-supplier
    pairs come from lineitem (the testdata has no partsupp table), the
    excluded-supplier subquery keys on negative acctbal (the
    complaints-comment stand-in). Defining shape intact: dim filters +
    NOT IN anti-join against a subquery + per-group COUNT(DISTINCT).
    100 TB: the anti-join side is supplier-bounded (size-gated
    broadcast); distinct-count uses Spark's two-phase expand on
    (group, suppkey)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad = (
        table(spark, sf_dir, "supplier")
        .filter("s_acctbal < 0")
        .select("s_suppkey")
    )
    return (
        li.join(bcast(p), li.l_partkey == p.p_partkey)
        .join(bcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )
