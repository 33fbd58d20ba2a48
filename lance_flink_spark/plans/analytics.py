"""Time-series downsampling, heavy hitters, robust outliers, and
Johnson-Lindenstrauss embedding projection.

Four shapes a 100 TB training/analytics pipeline reaches for that the
inventory did not yet cover:

- ``events_ohlc`` — per (event_type, day) open/high/low/close/volume
  downsample, the canonical time-series compaction before charting or
  feature extraction. First/last are tie-broken on (ts, event_id) so
  the result is a total function of the input (no "first row Spark
  happened to see").
- ``token_heavy_hitters`` — per-source frequent tokens above a share
  threshold (Misra-Gries exact-above-threshold semantics via the
  two-phase count: any token with share ≥ φ within its source is
  reported exactly; nothing below can sneak in).
- ``events_value_outliers`` — robust per-group anomaly report
  (median/MAD, the estimator that doesn't melt when the outliers it
  is hunting contaminate the mean/stddev).
- ``embeddings_jl_project`` — deterministic ±1 (Rademacher)
  Johnson-Lindenstrauss projection 64→8 dims, the cheap
  dimensionality reduction used before coarse clustering/blocking.
  Same md5-seeded plane family as the embedding near-dup blocking, so
  the DuckDB oracle embeds the identical literals.

Float discipline follows plans/quality.py: money/value aggregates ride
as integer cents (``floor(v*100 + 0.5)``); medians/MADs of BIGINT
cents interpolate to exact x.0/x.5 doubles in both engines.

Scale notes (100 TB): OHLC is one partial-agg shuffle on the
(group, day) key. Heavy hitters is two chained aggregates on token
keys with a broadcast of the per-source totals (source count is
bounded). The outlier report's exact per-group median is the pinned
small-group semantics; the 100 TB path swaps ``percentile`` for
``approx_percentile`` with identical plan shape (see
``customer_spend_ntile`` for the same pin pattern). The JL projection
is a stateless map — zero shuffles, whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lance_flink_spark.registry import bcast, query, table
from lance_flink_spark.operators.dedup import rademacher_planes

_CENTS = "CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)"


@query(
    "events_ohlc",
    extra=True,  # gate budget: windowed first/last + minmax downsample
    oracle=f"""
    WITH e AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             {_CENTS} AS vc, ts, event_id
      FROM events
    ), w AS (
      SELECT event_type, day, vc,
             ROW_NUMBER() OVER (PARTITION BY event_type, day
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, day
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM e
    )
    SELECT event_type, day,
           MAX(CASE WHEN rn_a = 1 THEN vc END) AS open_c,
           MAX(vc) AS high_c, MIN(vc) AS low_c,
           MAX(CASE WHEN rn_d = 1 THEN vc END) AS close_c,
           CAST(SUM(vc) AS BIGINT) AS volume_c, COUNT(*) AS n
    FROM w GROUP BY event_type, day
    """,
)
def events_ohlc(spark, sf_dir):
    """OHLC downsample per (event_type, day): open/close tie-broken on
    (ts, event_id) — a deterministic total order, unlike FIRST()'s
    partition-arrival order — plus high/low/volume/count in cents.

    Plan: one scan → two row_number windows over the SAME
    (event_type, day) partitioning (Spark reuses one Exchange; the
    second window only re-sorts) → final hash aggregate on the window
    key, partial-agg map-side. At 100 TB this is the standard rollup
    shuffle on a well-distributed composite key; no skew (days ×
    types)."""
    e = table(spark, sf_dir, "events").select(
        "event_type",
        # date_trunc timestamp, not a DATE cast: both engines agree on
        # the timestamp dtype through the pandas compare (gapfill pin)
        F.date_trunc("day", "ts").alias("day"),
        F.expr(_CENTS).alias("vc"),
        "ts",
        "event_id",
    )
    part = Window.partitionBy("event_type", "day")
    w = e.select(
        "event_type",
        "day",
        "vc",
        F.row_number()
        .over(part.orderBy(F.col("ts").asc(), F.col("event_id").asc()))
        .alias("rn_a"),
        F.row_number()
        .over(part.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
        .alias("rn_d"),
    )
    return w.groupBy("event_type", "day").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("vc"))).alias("open_c"),
        F.max("vc").alias("high_c"),
        F.min("vc").alias("low_c"),
        F.max(F.when(F.col("rn_d") == 1, F.col("vc"))).alias("close_c"),
        F.sum("vc").alias("volume_c"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "token_heavy_hitters",
    extra=True,  # gate budget: threshold heavy hitters, scalar-share join
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
      FROM documents
    ), tc AS (
      SELECT source, token, COUNT(*) AS cnt FROM tok
      WHERE token <> '' GROUP BY source, token
    ), tot AS (
      SELECT source, SUM(cnt) AS total FROM tc GROUP BY source
    )
    SELECT tc.source, tc.token, tc.cnt,
           ROUND(tc.cnt * 1.0 / tot.total, 6) AS share
    FROM tc JOIN tot ON tc.source = tot.source
    WHERE tc.cnt * 1.0 / tot.total >= 0.02
    """,
)
def token_heavy_hitters(spark, sf_dir):
    """Per-source heavy hitters: tokens whose within-source share is
    ≥ φ=2%. Exactness: the two-phase count reports EVERY token at or
    above the threshold with its true count (the guarantee sketches
    like Misra-Gries/count-min only approximate) — affordable because
    phase one reduces the corpus to (source, token) partial counts
    map-side before any shuffle.

    Plan: explode → partial-agg shuffle on (source, token) → per-source
    totals (a second tiny aggregate, broadcast back) → filter. The only
    corpus-sized shuffle carries distinct (source, token) pairs, not
    token instances. At 100 TB the vocabulary-bounded second agg is
    kilobytes regardless of corpus size."""
    tok = (
        table(spark, sf_dir, "documents")
        .select(
            "source",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    tc = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("cnt"))
    tot = tc.groupBy("source").agg(F.sum("cnt").alias("total"))
    return (
        tc.join(bcast(tot), "source")
        .filter(F.col("cnt") * 1.0 / F.col("total") >= 0.02)
        .select(
            "source",
            "token",
            "cnt",
            F.round(F.col("cnt") * 1.0 / F.col("total"), 6).alias("share"),
        )
    )


@query(
    "events_value_outliers",
    extra=True,  # gate budget: median/MAD robust anomaly report
    oracle=f"""
    WITH e AS (
      SELECT event_type, {_CENTS} AS vc FROM events
    ), med AS (
      SELECT event_type, quantile_cont(vc, 0.5) AS med_c FROM e GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, e.vc, med.med_c,
             quantile_cont(ABS(e.vc - med.med_c), 0.5)
               OVER (PARTITION BY e.event_type) AS mad_c
      FROM e JOIN med ON e.event_type = med.event_type
    )
    SELECT event_type, COUNT(*) AS n,
           ROUND(ANY_VALUE(med_c), 1) AS med_c,
           ROUND(ANY_VALUE(mad_c), 1) AS mad_c,
           CAST(SUM(CASE WHEN ABS(vc - med_c) > 5 * mad_c THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev GROUP BY event_type
    """,
)
def events_value_outliers(spark, sf_dir):
    """Robust per-group outlier report: exact median and MAD (median
    absolute deviation) of the cents value per event_type, plus the
    count of rows beyond 5 MADs. Median/MAD instead of mean/stddev
    because the contamination being hunted would drag the mean toward
    itself (breakdown point 0 vs 50%).

    Medians/MADs over BIGINT cents interpolate to x.0/x.5 —
    bit-identical across engines. Both medians ride the rank-exact
    grouped_percentiles construction (operators/quantiles.py): groups
    are FEW here (a handful of event types), which is precisely when
    Spark's exact ``percentile`` is dangerous at scale — each group's
    whole value→count map (cents NDV can reach 10⁷–10⁸ at 100 TB)
    merges in one task; the rank path sorts ~group_rows/64 per task
    and never builds a per-group map."""
    from lance_flink_spark.operators.quantiles import grouped_percentiles

    # persist the cents projection: the med/mad rank passes and the
    # final outlier aggregate drive ~7 actions over this frame — one
    # cached scan instead of seven parquet re-reads (same pattern as
    # plans/quality.py's span grid)
    e = table(spark, sf_dir, "events").select(
        "event_type", F.expr(_CENTS).alias("vc")
    ).persist()
    med = grouped_percentiles(e, "vc", {"med_c": 0.5}, group_cols=["event_type"])
    dev = e.join(bcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("vc") - F.col("med_c"))
    )
    mad = grouped_percentiles(
        dev, "adev", {"mad_c": 0.5}, group_cols=["event_type"]
    )
    return (
        dev.join(bcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.first("med_c"), 1).alias("med_c"),
            F.round(F.first("mad_c"), 1).alias("mad_c"),
            F.sum(
                F.when(
                    F.abs(F.col("vc") - F.col("med_c")) > 5 * F.col("mad_c"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
        )
    )


_JL_PLANES = rademacher_planes(64, 8, salt="jl")


def _jl_cols():
    """8 projection columns as Catalyst HOF dot products against ±1
    literal arrays — JVM-side, codegen'd, no Python in the path."""
    cols = []
    for j, p in enumerate(_JL_PLANES):
        plane = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(F.col("v"), plane, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append(F.round(dot, 6).alias(f"p{j}"))
    return cols


@query(
    "embeddings_jl_project",
    extra=True,  # gate budget: deterministic JL dim reduction
    oracle="""
    SELECT vec_id, {projs}
    FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    """.format(
        projs=", ".join(
            "ROUND(list_inner_product(v, [{lits}]), 6) AS p{j}".format(
                lits=", ".join(f"{float(x)}" for x in p), j=j
            )
            for j, p in enumerate(_JL_PLANES)
        )
    ),
)
def embeddings_jl_project(spark, sf_dir):
    """Johnson-Lindenstrauss projection 64→8 dims with the md5-seeded
    Rademacher (±1) plane family (salt "jl" — disjoint from the
    near-dup blocking planes). Distances are preserved within
    (1±ε) w.h.p. (Achlioptas 2003 shows ±1 entries suffice), which is
    all coarse clustering/blocking needs.

    Deterministic and engine-independent: both engines evaluate the
    identical literal planes, so the oracle is a full value match (the
    dot product is a 64-term sequential fold in both — float error
    ~1e-15 vs the 1e-6 rounding grain). Stateless map, zero shuffles;
    at 100 TB this is a pure scan-transform-write pass."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return e.select("vec_id", *_jl_cols())


@query(
    "events_decay_weighted",
    extra=True,  # gate budget; recency-weighted engagement rollup
    oracle="""
    WITH anchor AS (SELECT MAX(epoch_us(ts)) AS t1 FROM events)
    SELECT user_id,
           COUNT(*) AS n,
           ROUND(SUM(value * EXP(-(t1 - epoch_us(ts)) / 86400000000.0 / 7.0)), 4)
             AS decayed_value
    FROM events, anchor
    GROUP BY user_id, t1
    HAVING SUM(value * EXP(-(t1 - epoch_us(ts)) / 86400000000.0 / 7.0)) >= 50
    """,
)
def events_decay_weighted(spark, sf_dir):
    """Exponential recency decay (half-life-style weighting, 7-day
    time constant anchored at the stream's max event time): the
    engagement/recency score every ranking pipeline computes, as one
    scan + one aggregate — the decay factor folds into the SUM's map
    side, so the shuffle carries one partial per (user, partition).
    The anchor comes from a min/max metadata-friendly aggregate and is
    broadcast as a scalar."""
    ev = table(spark, sf_dir, "events")
    t1 = ev.agg(F.max(F.unix_micros("ts")).alias("t1"))
    w = F.exp(
        -(F.col("t1") - F.unix_micros(F.col("ts"))) / 86400000000.0 / 7.0
    )
    return (
        ev.crossJoin(bcast(t1))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value") * w).alias("__d"),
        )
        .filter(F.col("__d") >= 50)
        .select("user_id", "n", F.round("__d", 4).alias("decayed_value"))
    )


@query(
    "events_rolling_zscore",
    extra=True,  # gate budget; rolling standardization window frame
    oracle="""
    WITH w AS (
      SELECT event_id, user_id, value, ts,
             AVG(value) OVER win AS mu,
             STDDEV_SAMP(value) OVER win AS sd,
             COUNT(*) OVER win AS m
      FROM events
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 9 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id,
           ROUND((value - mu) / sd, 4) AS z
    FROM w
    WHERE m >= 5 AND sd > 1e-9 AND ABS((value - mu) / sd) > 2.5
    """,
)
def events_rolling_zscore(spark, sf_dir):
    """Rolling standardization (per-user z-score of each event against
    its own trailing 9-event window, flagged beyond 2.5σ) — the online
    anomaly-feature every monitoring pipeline derives. The frame ends
    at 1 PRECEDING so the scored value never contaminates its own
    baseline. One shuffle on user_id; the frame is row-bounded so
    window state is O(frame), not O(history)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-9, -1)
    )
    scored = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("m"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        scored.filter(
            (F.col("m") >= 5) & (F.col("sd") > 1e-9) & (F.abs(z) > 2.5)
        )
        .select("event_id", "user_id", F.round(z, 4).alias("z"))
    )


@query(
    "funnel_latency",
    extra=True,  # gate budget; stage-to-stage latency distribution
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_buy
      FROM events GROUP BY user_id
    ), lat AS (
      SELECT user_id, (t_buy - t_view) AS us
      FROM firsts WHERE t_view IS NOT NULL AND t_buy IS NOT NULL
                    AND t_buy >= t_view
    )
    SELECT COUNT(*) AS n_converted,
           CAST(MIN(us) AS BIGINT) AS min_us,
           quantile_cont(us, 0.5) AS p50_us,
           quantile_cont(us, 0.9) AS p90_us,
           CAST(MAX(us) AS BIGINT) AS max_us
    FROM lat
    """,
)
def funnel_latency(spark, sf_dir):
    """Stage-to-stage conversion latency (first view → first purchase
    per user, exact p50/p90 over integer microseconds) — the timing
    half of funnel analytics (#88 counts conversions; this measures
    them). One conditional-MIN aggregate per user (map-side partials),
    then rank-exact global percentiles via grouped_percentiles
    (operators/quantiles.py): microsecond deltas are near-unique, so
    Spark's exact ``percentile`` value→count map would hold ~every
    converted user in ONE final-merge buffer at 100 TB; the rank
    construction sorts ~N/64 per task and reads back only the two
    straddling ranks per percentile."""
    from lance_flink_spark.operators.quantiles import grouped_percentiles

    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.unix_micros("ts"))
        ).alias("t_view"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("t_buy"),
    )
    lat = firsts.filter(
        F.col("t_view").isNotNull()
        & F.col("t_buy").isNotNull()
        & (F.col("t_buy") >= F.col("t_view"))
    ).select((F.col("t_buy") - F.col("t_view")).alias("us"))
    stats = lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("us").cast("long").alias("min_us"),
        F.max("us").cast("long").alias("max_us"),
    )
    pct = grouped_percentiles(lat, "us", {"p50_us": 0.5, "p90_us": 0.9})
    # both sides are exactly one row — the cross join is 1×1
    return stats.crossJoin(pct).select(
        "n_converted", "min_us", "p50_us", "p90_us", "max_us"
    )


@query(
    "events_seasonality",
    extra=True,  # gate budget; hour-of-day activity profile
    oracle="""
    SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS hour_of_day,
           COUNT(*) AS n,
           ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY event_type), 6)
             AS share
    FROM events GROUP BY event_type, EXTRACT(hour FROM ts)
    """,
)
def events_seasonality(spark, sf_dir):
    """Hour-of-day seasonality profile per event type (count + share
    of the type's daily cycle) — the load-shaping/anomaly-baseline
    rollup. One partial-agg shuffle on a 24×types key; the share
    window runs over the tiny aggregate, not the facts."""
    from pyspark.sql import Window as W

    agg = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.hour("ts").cast("int").alias("hour_of_day")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    share = F.col("n") / F.sum("n").over(W.partitionBy("event_type"))
    return agg.select(
        "event_type", "hour_of_day", "n", F.round(share, 6).alias("share")
    )


@query(
    "customer_rfm",
    extra=True,  # gate budget; RFM segmentation
    oracle="""
    WITH anchor AS (SELECT MAX(o_orderdate) AS t1 FROM orders),
    base AS (
      SELECT o_custkey AS c,
             CAST(date_diff('day', MAX(o_orderdate), ANY_VALUE(t1)) AS BIGINT)
               AS recency_days,
             COUNT(*) AS frequency,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS monetary_c
      FROM orders, anchor GROUP BY o_custkey
    ), scored AS (
      SELECT *, NTILE(4) OVER (ORDER BY recency_days, c) AS r_q,
                NTILE(4) OVER (ORDER BY frequency DESC, c) AS f_q,
                NTILE(4) OVER (ORDER BY monetary_c DESC, c) AS m_q
      FROM base)
    SELECT r_q, f_q, m_q, COUNT(*) AS n_customers,
           CAST(SUM(monetary_c) AS BIGINT) AS segment_value_c
    FROM scored GROUP BY r_q, f_q, m_q
    """,
)
def customer_rfm(spark, sf_dir):
    """RFM segmentation (recency / frequency / monetary quartiles,
    anchored at the newest order date): the canonical customer-value
    rollup. Per-customer stats are one partial-agg shuffle; the three
    exact quartiles run through `with_distributed_ntiles`
    (operators/quantiles.py — range buckets + local row_number +
    bounded prefix offsets, with ONE shared multi-column quantile
    action and ONE exploded bucket-histogram action for all three
    axes), so no axis ever forces the customer frame through a
    single-partition sort. The base frame is persisted: cuts, counts,
    and the main job all reread it.
    Money rides as integer cents; ties break on the customer key so
    the quartile boundaries are deterministic."""
    o = table(spark, sf_dir, "orders")
    t1 = o.agg(F.max("o_orderdate").alias("t1"))
    base = (
        o.crossJoin(bcast(t1))
        .groupBy(F.col("o_custkey").alias("c"))
        .agg(
            F.datediff(F.max(F.col("t1")), F.max("o_orderdate"))
            .cast("long")
            .alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5))
            .cast("long")
            .alias("monetary_c"),
        )
    )
    from lance_flink_spark.operators.quantiles import with_distributed_ntiles

    base = base.persist()
    scored = with_distributed_ntiles(
        base,
        4,
        [("recency_days", False, "r_q"), ("frequency", True, "f_q"),
         ("monetary_c", True, "m_q")],
        tiebreak_col="c",
    )
    return scored.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("monetary_c").alias("segment_value_c"),
    )


@query(
    "events_concurrency",
    oracle="""
    WITH b AS (
      SELECT event_type AS k, epoch_us(ts) AS t, 1 AS d FROM events
      UNION ALL
      SELECT event_type, epoch_us(ts) + 1800 * 1000000, -1 FROM events)
    SELECT k AS event_type,
           CAST(MAX(run) AS BIGINT) AS max_concurrent
    FROM (SELECT k, SUM(d) OVER (PARTITION BY k ORDER BY t, d
                                 ROWS UNBOUNDED PRECEDING) AS run
          FROM b)
    GROUP BY k
    """,
)
def events_concurrency(spark, sf_dir):
    """Peak concurrent 30-minute sessions per event type — the
    sweep-line running sum, decomposed into bucketed prefix sums
    (operators/sweepline.py) so no task ever sorts a key's full
    boundary list. The oracle is the single-node window-function
    formulation of the same half-open [ts, ts+30min) semantics."""
    from lance_flink_spark.operators.sweepline import max_concurrency

    return max_concurrency(
        table(spark, sf_dir, "events"), duration_seconds=1800
    )


@query(
    "events_time_weighted",
    extra=True,  # gate budget; TWAP-style interval-weighted aggregates
    oracle=f"""
    WITH iv AS (
      SELECT user_id, {_CENTS} AS vc,
             LEAST((LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                    - epoch_us(ts)) // 1000000, 3600) AS dur_s
      FROM events)
    SELECT user_id, COUNT(*) AS n_intervals,
           CAST(SUM(dur_s) AS BIGINT) AS sum_dur_s,
           CAST(SUM(vc * dur_s) AS BIGINT) AS sum_value_dur
    FROM iv WHERE dur_s IS NOT NULL
    GROUP BY user_id
    """,
)
def events_time_weighted(spark, sf_dir):
    """Time-weighted value aggregates (TWAP shape): each reading holds
    until the user's next event, capped at 1h (the standard gap guard
    so idle periods don't dominate). Hashed surface is exact integers
    (Σ duration seconds, Σ cents·seconds) — consumers divide, the
    comparison never does. One keyed window (lead) + one partial-agg
    shuffle, both on user_id — Catalyst reuses the exchange."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    iv = e.select(
        "user_id",
        F.expr(_CENTS).alias("vc"),
        F.least(
            F.expr(
                "(lead(unix_micros(ts)) OVER (PARTITION BY user_id "
                "ORDER BY ts, event_id) - unix_micros(ts)) div 1000000"
            ),
            F.lit(3600),
        ).alias("dur_s"),
    ).filter(F.col("dur_s").isNotNull())
    return iv.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dur_s").alias("sum_dur_s"),
        F.sum(F.col("vc") * F.col("dur_s")).alias("sum_value_dur"),
    )


@query(
    "orders_mom_growth",
    extra=True,  # gate budget; month-over-month deltas (lag over rollup)
    oracle="""
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             COUNT(*) AS n,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders GROUP BY 1)
    SELECT CAST(month AS TIMESTAMP) AS month, n, rev_c,
           n - LAG(n) OVER (ORDER BY month) AS n_delta,
           rev_c - LAG(rev_c) OVER (ORDER BY month) AS rev_delta_c
    FROM m
    """,
)
def orders_mom_growth(spark, sf_dir):
    """Month-over-month growth (the business-reporting staple): lag
    deltas over the MONTHLY rollup — the unpartitioned window runs on
    the month-count frame (dozens of rows at ANY data scale; the facts
    were already reduced by the rollup shuffle), so the global
    ordering is driver-trivial, unlike the entity-frame ntile case.
    All-integer deltas; growth RATIOS are consumer-side."""
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    m = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)).cast("long").alias("rev_c"),
    )
    w = W.orderBy("month")
    return m.select(
        "month",
        "n",
        "rev_c",
        (F.col("n") - F.lag("n").over(w)).alias("n_delta"),
        (F.col("rev_c") - F.lag("rev_c").over(w)).alias("rev_delta_c"),
    )


@query(
    "events_bursts",
    extra=True,  # gate budget; burst detection vs trailing baseline
    oracle="""
    WITH b AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS bucket_s,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    w AS (
      SELECT event_type, bucket_s, n,
             SUM(n) OVER (PARTITION BY event_type ORDER BY bucket_s
                          ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS base6,
             COUNT(*) OVER (PARTITION BY event_type ORDER BY bucket_s
                            ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS k
      FROM b)
    SELECT event_type, bucket_s, n, base6, k,
           (k = 6 AND 2 * n * 6 > 3 * base6) AS is_burst
    FROM w
    """,
)
def events_bursts(spark, sf_dir):
    """Burst detection: a 5-minute bucket is a burst when its count
    exceeds 1.5× the trailing 6-bucket average — expressed as the
    ALL-INTEGER inequality 2·n·6 > 3·Σprev6 (no division anywhere on
    the hashed surface; buckets with an incomplete baseline are never
    flagged). One rollup shuffle on (type, bucket), then a per-type
    trailing frame over the BUCKET series (bounded rows per key, the
    reduced frame — never the facts)."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    b = e.groupBy(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 300) * 300).cast("long").alias("bucket_s"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("event_type").orderBy("bucket_s").rowsBetween(-6, -1)
    return b.select(
        "event_type",
        "bucket_s",
        "n",
        F.sum("n").over(w).alias("base6"),
        F.count(F.lit(1)).over(w).alias("k"),
    ).withColumn(
        "is_burst",
        (F.col("k") == 6) & (2 * F.col("n") * 6 > 3 * F.col("base6")),
    )


@query(
    "events_attribution",
    extra=True,  # gate budget; first/last-touch conversion attribution
    oracle="""
    WITH s AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS tu,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                      (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  THEN 1 ELSE 0 END AS brk
      FROM events),
    g AS (
      SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY tu, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM s),
    w AS (
      SELECT *,
             MAX(CASE WHEN event_type = 'view' THEN tu END) OVER (
               PARTITION BY user_id ORDER BY tu, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_us,
             MIN(CASE WHEN event_type = 'view' THEN tu END) OVER (
               PARTITION BY user_id, sid) AS sess_first_view_us
      FROM g)
    SELECT user_id, event_id, tu AS purchase_us,
           CASE WHEN last_view_us IS NOT NULL
                 AND tu - last_view_us <= 3600000000
                THEN last_view_us END AS last_touch_us,
           sess_first_view_us AS first_touch_us
    FROM w WHERE event_type = 'purchase'
    """,
)
def events_attribution(spark, sf_dir):
    """Per-conversion attribution: for every purchase, the LAST view
    within 1h (last-touch) and the FIRST view of the same 30-min-gap
    session (first-touch) — the marketing-analytics dual of the funnel
    rows (per-conversion attribution rows, not per-user flags). Two
    window passes over ONE user_id exchange (running last-view, then
    session-partitioned first-view); exact integer micros, NULL when
    no qualifying touch exists."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("tu"),
    )
    wo = W.partitionBy("user_id").orderBy("tu", "event_id")
    brk = F.when(
        F.col("tu") - F.lag("tu").over(wo) > 1_800_000_000, 1
    ).otherwise(0)
    g = e.withColumn(
        "sid", F.sum(brk).over(wo.rowsBetween(W.unboundedPreceding, 0))
    )
    view_tu = F.when(F.col("event_type") == "view", F.col("tu"))
    w2 = g.select(
        "*",
        F.max(view_tu)
        .over(wo.rowsBetween(W.unboundedPreceding, -1))
        .alias("last_view_us"),
        F.min(view_tu)
        .over(W.partitionBy("user_id", "sid"))
        .alias("sess_first_view_us"),
    )
    return w2.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        F.col("tu").alias("purchase_us"),
        F.when(
            F.col("last_view_us").isNotNull()
            & (F.col("tu") - F.col("last_view_us") <= 3_600_000_000),
            F.col("last_view_us"),
        ).alias("last_touch_us"),
        F.col("sess_first_view_us").alias("first_touch_us"),
    )


def _ddsketch_literals(relative_accuracy: float = 0.01) -> tuple[str, str, str]:
    """(gamma, ln gamma, gamma+1) as repr'd Python doubles — the exact
    literals quantile_sketches folds into its Spark plan, so a DuckDB
    oracle binning with the same literals replays the sketch
    deterministically (ceil(ln v / ln γ) and 2·γ^i/(γ+1) are pure
    double arithmetic on both engines)."""
    from lance_flink_spark.operators.sketches import _gamma

    g = _gamma(relative_accuracy)
    import math

    return repr(g), repr(math.log(g)), repr(g + 1.0)


_DD_G, _DD_LG, _DD_G1 = _ddsketch_literals(0.01)


@query(
    "events_quantile_sketch",
    extra=True,  # oracle replays the deterministic DDSketch arithmetic
    oracle=f"""
    WITH v AS (
      SELECT event_type, value FROM events
      UNION ALL
      SELECT '__all__' AS event_type, value FROM events
    ), b AS (
      SELECT event_type,
        CASE WHEN value > 0 THEN 1 WHEN value < 0 THEN -1 ELSE 0 END AS s,
        CASE WHEN value > 0 THEN CAST(CEIL(LN(value) / {_DD_LG}) AS INT)
             WHEN value < 0 THEN CAST(CEIL(LN(-value) / {_DD_LG}) AS INT)
             ELSE 0 END AS bin
      FROM v
    ), c AS (
      SELECT event_type, s, bin, COUNT(*) AS cnt FROM b GROUP BY 1, 2, 3
    ), cum AS (
      SELECT event_type, s, bin, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY s, s * bin
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM c
    )
    SELECT event_type, q,
           ROUND(CASE WHEN s = 0 THEN 0.0
                      WHEN s = 1 THEN 2.0 * POWER({_DD_G}, bin) / {_DD_G1}
                      ELSE -(2.0 * POWER({_DD_G}, bin) / {_DD_G1}) END,
                 6) AS estimate
    FROM cum, (VALUES (0.5), (0.95), (0.99)) qs(q)
    WHERE cum >= GREATEST(CEIL(q * n), 1)
      AND cum - cnt < GREATEST(CEIL(q * n), 1)
    """,
)
def events_quantile_sketch(spark, sf_dir):
    """Mergeable DDSketch percentile state over event values: build
    per-event_type sketches, merge them WITHOUT rescanning facts, and
    read p50/p95/p99 per type plus the global rollup — the incremental
    percentile-monitoring shape (operators/sketches.py). All built-in
    functions; state per group is O(log value-range / log gamma).

    FULL oracle: DDSketch is deterministic end to end — bin index
    ceil(ln v / ln γ), exact bin-count merge, rank ceil(q·n), midpoint
    2·γ^i/(γ+1) — so DuckDB replays the whole sketch from the same γ
    literals and the hash gates binning, merge, rank walk, and readout
    (estimates rounded to 6dp on both sides; the ≤a relative-error
    contract stays pytest-pinned in test_sketches.py)."""
    from lance_flink_spark.operators.sketches import (
        estimate_quantiles,
        quantile_sketches,
        rollup_quantile_sketches,
    )

    ev = table(spark, sf_dir, "events")
    fine = quantile_sketches(ev, ["event_type"], "value")
    per_type = estimate_quantiles(fine, ["event_type"], [0.5, 0.95, 0.99])
    global_sk = rollup_quantile_sketches(fine, [])
    global_est = estimate_quantiles(global_sk, [], [0.5, 0.95, 0.99]).select(
        F.lit("__all__").alias("event_type"), "q", "estimate"
    )
    return per_type.unionByName(global_est).withColumn(
        "estimate", F.round("estimate", 6)
    )
