"""Data-quality validation, time-series gap-fill, and cohort retention.

The remaining "would a 100 TB training-data pipeline need this" gaps:

- ``dq_checks`` — a Deequ-style constraint report (completeness,
  uniqueness, bounds, set membership, referential integrity) computed
  in one fact-table aggregate pass plus one anti-join, emitted as a
  (check_name, column_name, metric, passed) frame a pipeline can gate
  deploys on.
- ``events_gapfill`` — per-key calendar densification + forward fill,
  the canonical time-series repair before feature extraction. The
  window partitions by user, so state is per-key and the operator
  scales horizontally (no global ordered window).
- ``retention_cohorts`` — first-touch weekly cohorts × weeks-since
  activity matrix, the standard product-analytics rollup (and a
  two-level distinct aggregation exercise).

All ``extra=True``: oracle-checked by tests/test_extras_oracle.py and
``tools/check_oracle.py --extras`` exactly like the primary registry.

Float discipline: money/value sums are quantized to integer cents per
row (``floor(v*100 + 0.5)`` — IEEE-deterministic in every engine) and
summed as BIGINT, so no cross-engine summation-order boundary can flip
the driver's value hash (see plans/tpch_more.py q9 for the incident).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lance_flink_spark.registry import bcast, query, table


@query(
    "dq_checks",
    extra=True,  # gate budget: single-pass multi-constraint validation
    oracle="""
    WITH m AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nulls,
             COUNT(DISTINCT o_orderkey) AS nd,
             MIN(o_totalprice) AS minp,
             SUM(CASE WHEN o_orderstatus IN ('F','O','P') THEN 0 ELSE 1 END) AS bad
      FROM orders
    ), r AS (
      SELECT COUNT(*) AS orphans
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      WHERE c_custkey IS NULL
    )
    SELECT 'completeness' AS check_name, 'o_custkey' AS column_name,
           ROUND(1.0 - nulls * 1.0 / n, 6) AS metric, nulls = 0 AS passed FROM m
    UNION ALL
    SELECT 'uniqueness', 'o_orderkey', ROUND(nd * 1.0 / n, 6), nd = n FROM m
    UNION ALL
    SELECT 'min_bound', 'o_totalprice', ROUND(minp, 6), minp >= 0 FROM m
    UNION ALL
    SELECT 'set_membership', 'o_orderstatus',
           ROUND(1.0 - bad * 1.0 / n, 6), bad = 0 FROM m
    UNION ALL
    SELECT 'referential', 'o_custkey', orphans * 1.0, orphans = 0 FROM r
    """,
)
def dq_checks(spark, sf_dir):
    """Constraint-validation report over orders (Deequ-style).

    Every single-table metric (null counts, key distinctness, value
    bounds, domain membership) comes out of ONE aggregate pass over the
    fact — adding a constraint adds a column to the agg, not a scan.
    Referential integrity is the only second job: a left-anti count
    against the customer keys (shuffle on the join key; AQE broadcasts
    the dim side when it fits). The report is 5 rows regardless of
    fact size, so the driver collect is O(constraints)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey")
    m = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("nulls"),
        F.count_distinct("o_orderkey").alias("nd"),
        F.min("o_totalprice").alias("minp"),
        F.sum(
            F.when(F.col("o_orderstatus").isin("F", "O", "P"), 0).otherwise(1)
        )
        .cast("long")
        .alias("bad"),
    )
    orphans = (
        o.join(bcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphans"))
    )
    joined = m.crossJoin(F.broadcast(orphans))  # both single-row by construction
    # every metric is cast to double: Spark types the decimal-literal
    # arithmetic per branch (decimal(30,6) vs decimal(29,6)) and stack()
    # requires identical column types across rows
    report = joined.selectExpr(
        """stack(5,
           'completeness', 'o_custkey',
               cast(round(1.0 - nulls * 1.0 / n, 6) as double), nulls = 0,
           'uniqueness', 'o_orderkey',
               cast(round(nd * 1.0 / n, 6) as double), nd = n,
           'min_bound', 'o_totalprice',
               cast(round(minp, 6) as double), minp >= 0,
           'set_membership', 'o_orderstatus',
               cast(round(1.0 - bad * 1.0 / n, 6) as double), bad = 0,
           'referential', 'o_custkey',
               cast(orphans as double), orphans = 0
        ) AS (check_name, column_name, metric, passed)"""
    )
    return report


@query(
    "events_gapfill",
    extra=True,  # gate budget: calendar densification + forward fill
    oracle="""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS d,
             SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS vc
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, date_trunc('day', ts)
    ), spans AS (
      SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY user_id
    ), grid AS (
      SELECT user_id, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS d
      FROM spans
    )
    SELECT g.user_id, g.d AS day,
           ROUND(COALESCE(
             last_value(vc IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0
           ) / 100.0, 2) AS v_filled
    FROM grid g
    LEFT JOIN daily ON g.user_id = daily.user_id AND g.d = daily.d
    """,
)
def events_gapfill(spark, sf_dir):
    """Per-user daily purchase series, densified and forward-filled.

    Each user's calendar is generated from their own [first, last] day
    (sequence + explode — no cross join against a global calendar), and
    the fill window partitions by user: state is one row per key, never
    a global sort. At 100 TB this is shuffle-on-user_id once, then
    embarrassingly parallel per key — the Flink keyed-stream shape, in
    batch. Values ride as integer cents (exact) until the final
    display division."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5)).cast("long").alias("vc")
    )
    spans = daily.groupBy("user_id").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("interval 1 day"))
        ).alias("d"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, ["user_id", "d"], "left")
        .select(
            "user_id",
            F.col("d").alias("day"),
            F.round(
                F.coalesce(
                    F.last("vc", ignorenulls=True).over(w), F.lit(0)
                )
                / 100.0,
                2,
            ).alias("v_filled"),
        )
    )


@query(
    "retention_cohorts",
    extra=True,  # gate budget: first-touch cohort × activity matrix
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ), acts AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    )
    SELECT cohort_week,
           CAST(FLOOR(date_diff('day', cohort_week, wk) / 7.0) AS BIGINT)
             AS weeks_since,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM acts a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY cohort_week, weeks_since
    ORDER BY cohort_week, weeks_since
    """,
)
def retention_cohorts(spark, sf_dir):
    """Weekly retention triangle: users grouped by first-touch week,
    counted in each subsequent week they were active.

    Two aggregations, both keyed on user_id, so the second reuses the
    first's partitioning (no extra shuffle under AQE exchange reuse);
    the cohort join is a self-join on the already-reduced per-user
    frame. weeks_since is computed from day arithmetic on week-
    truncated timestamps (always a multiple of 7 — exact in both
    engines, unlike engine-specific week-diff semantics)."""
    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    acts = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    return (
        acts.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(F.datediff("wk", "cohort_week") / 7.0)
            .cast("long")
            .alias("weeks_since"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "weeks_since")
    )
