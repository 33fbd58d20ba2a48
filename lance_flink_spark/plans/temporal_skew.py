"""Registry entries: temporal joins (Flink parity), skew-resilient
aggregation, approximate aggregates."""

from __future__ import annotations

from pyspark.sql import functions as F

from lance_flink_spark.operators.quantiles import grouped_percentiles
from lance_flink_spark.operators.skew import salted_count_distinct
from lance_flink_spark.operators.temporal import asof_join, interval_join
from lance_flink_spark.registry import query, table


@query(
    "events_asof_join",
    extra=True,  # r15 rotation: demoted, full oracle still checked in extras
    oracle="""
    WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
         p AS (SELECT event_id AS p_id, user_id, ts, value FROM events
               WHERE event_type = 'purchase')
    SELECT c.event_id, p.p_id, ROUND(p.value, 2) AS p_value
    FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def events_asof_join(spark, sf_dir):
    """ASOF join (Flink temporal-join parity): each click matched to
    the user's most recent purchase at-or-before it. Union+window
    implementation — one shuffle on user_id, no range explosion
    (operators/temporal.py)."""
    e = table(spark, sf_dir, "events")
    clicks = e.filter("event_type = 'click'").select("event_id", "user_id", "ts")
    purchases = e.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("p_id"), "user_id", "ts", "value"
    )
    out = asof_join(clicks, purchases, on="user_id", right_payload=["p_id", "value"])
    return out.select("event_id", "p_id", F.round("value", 2).alias("p_value"))


@query(
    "events_interval_join",
    extra=True,  # r13 rotation: banked (driver hash-green r12); asof join stays primary
    oracle="""
    SELECT c.user_id, COUNT(*) AS n_pairs
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
    GROUP BY c.user_id
    """,
)
def events_interval_join(spark, sf_dir):
    """Interval join (Flink interval-join parity): click→purchase
    conversions within 10 minutes, counted per user."""
    e = table(spark, sf_dir, "events")
    clicks = e.filter("event_type = 'click'").select("user_id", "ts")
    purchases = e.filter("event_type = 'purchase'").select("user_id", "ts")
    pairs = interval_join(clicks, purchases, on="user_id", upper="10 minutes")
    return pairs.groupBy(F.col("l.user_id").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


@query(
    "skew_salted_count_distinct",
    extra=True,  # r12 rotation: salting plan-pinned + hash-banked since r2
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def skew_salted_count_distinct(spark, sf_dir):
    """Two-phase salted COUNT(DISTINCT) — exact result, hot keys split
    across 16 reducers (operators/skew.py). The oracle is the plain
    one-phase SQL: salting must not change the answer."""
    return salted_count_distinct(
        table(spark, sf_dir, "events"), keys=["event_type"], value_col="user_id",
        salt=16, alias="n_users",
    )


@query("agg_approx", extra=True)  # rows-only: approximate by construction
def agg_approx(spark, sf_dir):
    """Approximate aggregates (HLL++ count-distinct, quantile sketch) —
    the sketch-based path for 100TB interactive profiling. Rows-only in
    the gate; tests pin the error envelope vs exact values, and the
    `agg_approx_exactness` twin hash-gates the sketch invariants
    (merge determinism + error envelopes) under a full oracle.
    Quantiles are emitted as flat scalar columns (q50/q95/q99), not an
    array — the gate canonicalizer sorts rows and can't hash list
    cells."""
    l = table(spark, sf_dir, "lineitem")
    q = F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000)
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            q.alias("qs"),
        )
        .select(
            "l_returnflag",
            "approx_parts",
            F.element_at("qs", 1).alias("q50"),
            F.element_at("qs", 2).alias("q95"),
            F.element_at("qs", 3).alias("q99"),
        )
    )


@query(
    "agg_approx_exactness",
    # primary (r11 rotation): full-oracle sketch-invariant gate rides the
    # driver artifact; the raw-estimate agg_approx stays a rows-only extra.
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           CAST(1 AS BIGINT) AS hll_rollup_in_envelope,
           CAST(1 AS BIGINT) AS hll_merge_invariant,
           CAST(1 AS BIGINT) AS quantile_in_envelope
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_exactness(spark, sf_dir):
    """Hash-graded invariants of the approximate-aggregate machinery.

    The estimates themselves cannot have a SQL oracle, but the
    properties that make sketches usable at 100 TB CAN be hash-gated:

    - ``hll_merge_invariant``: rolling per-(returnflag, linestatus)
      HLL sketches up to returnflag must give bit-identical estimates
      to rolling per-(returnflag, suppkey%7) sketches — HLL registers
      are max-merges, so the union is partitioning-independent; any
      drift in sketch bytes, lgK plumbing, or the union path flips
      this flag and breaks the hash (operators/sketches.py).
    - ``hll_rollup_in_envelope``: the rolled-up estimate is within 5%
      of the exact COUNT DISTINCT (standard error at lgK=12 is ~1.6%).
    - ``quantile_in_envelope``: percentile_approx's p50 (accuracy
      10000) lands between the exact p45 and p55 — far looser than
      the GK rank-error guarantee of n/accuracy.

    The oracle states the exact distinct counts and all-flags-true;
    any sketch regression hash-mismatches."""
    from lance_flink_spark.operators.sketches import (
        distinct_sketches,
        rollup_sketches,
    )

    l = table(spark, sf_dir, "lineitem")
    est_a = (
        rollup_sketches(
            distinct_sketches(l, ["l_returnflag", "l_linestatus"], "l_partkey"),
            ["l_returnflag"],
        ).select("l_returnflag", F.col("estimate").alias("est_a"))
    )
    est_b = (
        rollup_sketches(
            distinct_sketches(
                l.withColumn("__cell", F.col("l_suppkey") % 7),
                ["l_returnflag", "__cell"],
                "l_partkey",
            ),
            ["l_returnflag"],
        ).select("l_returnflag", F.col("estimate").alias("est_b"))
    )
    # countDistinct and percentile_approx must NOT share one agg:
    # COUNT DISTINCT plans an Expand (2x rows) and the TypedImperative
    # percentile state then rides a SortAggregate over the expanded
    # rows — ~10s vs ~1s for the two aggs separately (3-row join)
    cd = l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )
    aq = l.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("aq50")
    )
    exact = cd.join(F.broadcast(aq), "l_returnflag").join(
        # exact p45/p55 envelope bounds via the rank construction —
        # never Spark's exact `percentile` aggregate, whose per-group
        # value→count map is the single-buffer hazard this repo bans
        # (plan-pinned in tests/test_quantiles.py)
        F.broadcast(
            grouped_percentiles(
                l,
                "l_extendedprice",
                {"p45": 0.45, "p55": 0.55},
                group_cols=["l_returnflag"],
            )
        ),
        "l_returnflag",
    )
    flag = lambda c: F.when(c, F.lit(1)).otherwise(F.lit(0)).cast("long")  # noqa: E731
    return (
        exact.join(est_a, "l_returnflag").join(est_b, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_parts",
            flag(
                F.abs(F.col("est_a") - F.col("exact_parts"))
                <= 0.05 * F.col("exact_parts")
            ).alias("hll_rollup_in_envelope"),
            flag(F.col("est_a") == F.col("est_b")).alias("hll_merge_invariant"),
            flag(
                (F.col("aq50") >= F.col("p45")) & (F.col("aq50") <= F.col("p55"))
            ).alias("quantile_in_envelope"),
        )
    )
