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
    ).persist()  # feeds both the span grid and the fill join — one
    # scan+agg instead of two (caller releases via unpersist_all)
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


@query(
    "events_json_extract",
    extra=True,  # gate budget: semi-structured (JSON) column extraction
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 10
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_json_extract(spark, sf_dir):
    """Semi-structured extraction: parse the JSON props column with a
    declared schema and aggregate a typed field.

    from_json with an explicit schema stays entirely in Tungsten
    (no Python, no schema inference pass — at 100 TB an inference
    pre-scan would double the read). The extracted field then filters
    and aggregates like any other column; integer payloads keep the
    aggregate exact across engines."""
    ev = table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k BIGINT")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k") >= 10)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "events_lag_delta",
    extra=True,  # gate budget: lag/lead inter-event gap analysis
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             CAST(date_diff('second',
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
               ts) AS BIGINT) AS gap_s
      FROM events
    )
    SELECT user_id,
           COUNT(gap_s) AS n_gaps,
           CAST(FLOOR(AVG(gap_s)) AS BIGINT) AS avg_gap_s,
           MAX(gap_s) AS max_gap_s
    FROM gaps WHERE gap_s IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_lag_delta(spark, sf_dir):
    """Inter-event gap statistics per user via lag().

    The window partitions by user_id (ordered by ts with event_id as a
    total-order tie-break — REQUIRED for determinism when two events
    share a timestamp), so at scale this is one shuffle on user_id and
    per-key local sorts, never a global sort. avg is floored to whole
    seconds: an exact integer in both engines, immune to fp division
    display differences."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    ).alias("gap_s")
    return (
        ev.select("user_id", gap)
        .filter(F.col("gap_s").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("gap_s").alias("n_gaps"),
            F.floor(F.avg("gap_s")).cast("long").alias("avg_gap_s"),
            F.max("gap_s").alias("max_gap_s"),
        )
        .orderBy("user_id")
    )


@query(
    "hybrid_retrieval_rrf",
    extra=True,  # gate budget: lexical+vector fusion (RAG retrieval)
    oracle="""
    WITH tok AS (
        SELECT doc_id, u.token FROM (
            SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS arr
            FROM documents) t, unnest(arr) AS u(token)
        WHERE u.token <> ''),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT AVG(dl) AS avgdl, COUNT(*) AS n FROM dl),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
           WHERE token IN ('vector', 'spark', 'customer')
           GROUP BY doc_id, token),
    dfreq AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY token),
    scored AS (
        SELECT tf.doc_id,
               SUM(ln((n - df + 0.5) / (df + 0.5) + 1.0)
                   * tf * (1.2 + 1.0)
                   / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))) AS s
        FROM tf JOIN dfreq USING (token)
        JOIN dl ON tf.doc_id = dl.doc_id, stats
        GROUP BY tf.doc_id),
    lex AS (SELECT doc_id, r FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY ROUND(s, 6) DESC, doc_id) AS r
        FROM scored) WHERE r <= 10),
    vecd AS (
        SELECT e.vec_id AS doc_id,
               ROUND(1 - list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6)
                 AS dist
        FROM embeddings e,
             (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0) q),
    vec AS (SELECT doc_id, r FROM (
        SELECT doc_id, row_number() OVER (ORDER BY dist, doc_id) AS r
        FROM vecd) WHERE r <= 10)
    SELECT doc_id, rrf FROM (
      SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
             ROUND(COALESCE(1.0 / (60 + l.r), 0) + COALESCE(1.0 / (60 + v.r), 0), 6)
               AS rrf
      FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id)
    ORDER BY rrf DESC, doc_id LIMIT 10
    """,
)
def hybrid_retrieval_rrf(spark, sf_dir):
    """Hybrid retrieval: BM25 lexical arm + cosine vector arm fused by
    reciprocal-rank fusion (rrf = Σ 1/(60+rank)) — the standard RAG
    first-stage retriever.

    Both arms are the already-oracle-checked registry queries
    (text_bm25_search / knn_cosine); ranks come from row_number over
    each arm's ROUNDED score (6dp) with an id tie-break, so the fusion
    input is deterministic across engines. The rank windows order
    10-row post-top-k frames — single-partition is fine there; the
    heavy lifting (corpus scan, ANN) happened inside the arms, which
    scale independently."""
    from lance_flink_spark.plans.text_dedup import text_bm25_search
    from lance_flink_spark.plans.vectors import knn_cosine

    lex = text_bm25_search(spark, sf_dir)
    wl = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    lexr = lex.select("doc_id", F.row_number().over(wl).alias("lr"))
    vec = knn_cosine(spark, sf_dir)
    wv = Window.orderBy(F.asc("distance"), F.asc("vec_id"))
    vecr = vec.select(
        F.col("vec_id").alias("doc_id"), F.row_number().over(wv).alias("vr")
    )
    one = F.lit(1.0)
    return (
        lexr.join(vecr, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(one / (F.lit(60) + F.col("lr")), F.lit(0.0))
                + F.coalesce(one / (F.lit(60) + F.col("vr")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
        .orderBy(F.desc("rrf"), "doc_id")
        .limit(10)
    )


@query(
    "customer_spend_ntile",
    extra=True,  # gate budget: ntile quantile bucketing
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey
    ), tiled AS (
      SELECT o_custkey, cents,
             ntile(4) OVER (ORDER BY cents DESC, o_custkey) AS quartile
      FROM spend
    )
    SELECT quartile, COUNT(*) AS n_customers,
           ROUND(SUM(cents) / 100.0, 2) AS total_spend,
           ROUND(MIN(cents) / 100.0, 2) AS min_spend
    FROM tiled GROUP BY quartile ORDER BY quartile
    """,
)
def customer_spend_ntile(spark, sf_dir):
    """Customer spend quartiles — exact NTILE(4), distributed.

    The per-customer aggregate shuffles once on custkey; the quartile
    then needs a global total order over the REDUCED frame. A plain
    `ntile().over(Window.orderBy(...))` is a single-partition sort of
    every customer — a non-starter at billions of entities — so this
    uses `with_distributed_ntile` (operators/quantiles.py): approx
    cut-point range buckets + per-bucket row_number + bounded prefix
    offsets, which reproduces SQL NTILE bit-exactly with ~N/buckets
    rows per task. Same oracle, no SinglePartition exchange (pinned by
    tests/test_quantiles.py). Ties broken by custkey."""
    from lance_flink_spark.operators.quantiles import with_distributed_ntile

    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)).cast("long").alias("cents")
    )
    tiled = with_distributed_ntile(
        spend, 4, "cents", "o_custkey", "quartile", descending=True
    )
    return (
        tiled.groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("cents") / 100.0, 2).alias("total_spend"),
            F.round(F.min("cents") / 100.0, 2).alias("min_spend"),
        )
        .orderBy("quartile")
    )


@query(
    "drift_psi",
    extra=True,  # gate budget; population-stability drift report
    oracle="""
    WITH binned AS (
      SELECT CASE WHEN value < 20 THEN 0 WHEN value < 40 THEN 1
                  WHEN value < 60 THEN 2 WHEN value < 80 THEN 3 ELSE 4 END AS bin,
             CASE WHEN epoch_us(ts) < (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 FROM events)
                  THEN 'ref' ELSE 'cur' END AS split
      FROM events
    ), c AS (
      SELECT bin, split, COUNT(*) AS n FROM binned GROUP BY bin, split
    ), tot AS (
      SELECT split, SUM(n) AS t FROM c GROUP BY split
    ), frac AS (
      SELECT bin,
             MAX(CASE WHEN split = 'ref' THEN n * 1.0 / t END) AS p,
             MAX(CASE WHEN split = 'cur' THEN n * 1.0 / t END) AS q
      FROM c JOIN tot USING (split) GROUP BY bin
    )
    SELECT bin, ROUND(p, 6) AS p, ROUND(q, 6) AS q,
           ROUND((p - q) * LN(p / q), 6) AS psi_term
    FROM frac
    """,
)
def drift_psi(spark, sf_dir):
    """Population Stability Index between the first and second half of
    the event stream's time range — the standard drift gate a training
    pipeline runs before trusting a new data batch (PSI > 0.2 =
    investigate). Fixed bin edges (no quantile pre-scan at score
    time), per-bin (p, q, (p-q)·ln(p/q)) terms; consumers SUM the
    column for the headline PSI.

    100 TB: one scan, one (bin, split) aggregate (10 groups), totals
    broadcast back — the report is bin-count-sized regardless of
    volume. The midpoint scalar comes from a min/max metadata-friendly
    aggregate."""
    ev = table(spark, sf_dir, "events")
    mid = ev.agg(
        F.expr("(unix_micros(min(ts)) + unix_micros(max(ts))) div 2").alias("mid")
    )
    binned = ev.crossJoin(bcast(mid)).select(
        F.when(F.col("value") < 20, 0)
        .when(F.col("value") < 40, 1)
        .when(F.col("value") < 60, 2)
        .when(F.col("value") < 80, 3)
        .otherwise(4)
        .alias("bin"),
        F.when(F.unix_micros(F.col("ts")) < F.col("mid"), "ref")
        .otherwise("cur")
        .alias("split"),
    )
    c = binned.groupBy("bin", "split").agg(F.count(F.lit(1)).alias("n"))
    tot = c.groupBy("split").agg(F.sum("n").alias("t"))
    frac = (
        c.join(bcast(tot), "split")
        .groupBy("bin")
        .agg(
            F.max(F.when(F.col("split") == "ref", F.col("n") / F.col("t"))).alias("p"),
            F.max(F.when(F.col("split") == "cur", F.col("n") / F.col("t"))).alias("q"),
        )
    )
    return frac.select(
        "bin",
        F.round("p", 6).alias("p"),
        F.round("q", 6).alias("q"),
        F.round((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")), 6).alias(
            "psi_term"
        ),
    )


@query(
    "source_gini",
    extra=True,  # gate budget; corpus-balance inequality diagnostic
    oracle="""
    WITH ranked AS (
      SELECT source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS i
      FROM documents
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(2.0 * SUM(CAST(i AS BIGINT) * n_chars) / (COUNT(*) * SUM(n_chars))
                 - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
    FROM ranked GROUP BY source
    """,
)
def source_gini(spark, sf_dir):
    """Per-source Gini coefficient of document sizes — the corpus-mix
    diagnostic that catches a source whose token mass is concentrated
    in a few giant documents before it skews a training mixture
    (0 = uniform, →1 = one doc dominates). Computed via the sorted-
    rank identity G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n: one rank window per
    source + one aggregate — no pairwise |xᵢ−xⱼ| blowup, so it scales
    to any corpus (the naive mean-absolute-difference form is O(n²)).
    Deterministic rank ties on doc_id."""
    ranked = table(spark, sf_dir, "documents").select(
        "source",
        "n_chars",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.asc("n_chars"), F.asc("doc_id")
            )
        )
        .alias("i"),
    )
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(
            2.0
            * F.sum(F.col("i").cast("long") * F.col("n_chars"))
            / (F.count(F.lit(1)) * F.sum("n_chars"))
            - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


@query(
    "range_lookup",
    extra=True,  # gate budget; grid-bucketed BETWEEN join
    oracle="""
    WITH bands AS (
      SELECT * FROM (VALUES
        ('tiny',   0.0,  9.99),
        ('small', 10.0, 24.99),
        ('mid',   25.0, 49.99),
        ('large', 50.0, 79.99),
        ('huge',  80.0, 999.99)
      ) AS t(band, lo, hi)
    )
    SELECT band, COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS vc
    FROM events JOIN bands ON value >= lo AND value <= hi
    GROUP BY band
    """,
)
def range_lookup(spark, sf_dir):
    """Range-lookup join (operators/ranges.py): classify event values
    into value bands via the grid-bucketed BETWEEN join instead of the
    BroadcastNestedLoop Spark would otherwise plan — then roll up per
    band. The oracle runs the plain BETWEEN join, so a cell boundary
    off by one grid step loses/dupes rows and breaks the hash."""
    from pyspark.sql import Row

    from lance_flink_spark.operators.ranges import range_lookup_join

    ev = table(spark, sf_dir, "events").select("event_id", "value")
    bands = spark.createDataFrame(
        [
            Row(band="tiny", lo=0.0, hi=9.99),
            Row(band="small", lo=10.0, hi=24.99),
            Row(band="mid", lo=25.0, hi=49.99),
            Row(band="large", lo=50.0, hi=79.99),
            Row(band="huge", lo=80.0, hi=999.99),
        ]
    )
    joined = range_lookup_join(ev, bands, "value", cell=10.0)
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100 + 0.5)).cast("long").alias("vc"),
    )


@query(
    "orders_price_deciles",
    extra=True,  # r14-ext2 rotation out: hash-green r8-r13; the NTILE
    # machinery keeps its property tests + this full-oracle extra
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             NTILE(10) OVER (ORDER BY CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT),
                             o_orderkey) AS decile
      FROM orders)
    SELECT decile, COUNT(*) AS n,
           MIN(cents) AS lo_c, MAX(cents) AS hi_c,
           CAST(SUM(cents) AS BIGINT) AS sum_c
    FROM t GROUP BY decile
    """,
)
def orders_price_deciles(spark, sf_dir):
    """Price deciles over the FACT table (every order row, not a
    reduced entity frame) — the distributed exact NTILE
    (operators/quantiles.py) at n=10 on the shape where a naive
    global-window ntile hurts most. Same bit-exact-NTILE contract as
    customer_spend_ntile, bigger frame, exact-integer surface."""
    from lance_flink_spark.operators.quantiles import with_distributed_ntile

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    tiled = with_distributed_ntile(
        o, 10, "cents", "o_orderkey", "decile", buckets=64
    )
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("cents").alias("lo_c"),
        F.max("cents").alias("hi_c"),
        F.sum("cents").alias("sum_c"),
    )


@query(
    "classifier_quality_filter",
    extra=True,  # r15 rotation: demoted, full oracle still checked in extras
    # r12 rotation: the #234 classifier flagship gets driver-grade evidence
    oracle="""
    WITH tok AS (
        SELECT doc_id, u.token FROM (
            SELECT doc_id,
                   regexp_split_to_array(trim(lower(text)), '\\s+') AS arr
            FROM documents) t, unnest(arr) AS u(token)
        WHERE u.token <> ''),
    feat AS (
        SELECT doc_id,
               ('0x' || substr(md5(token), 1, 8))::BIGINT % 64 AS bucket,
               COUNT(*) AS cnt
        FROM tok GROUP BY doc_id, bucket),
    lab AS (
        SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
        FROM documents),
    tagged AS (
        SELECT f.bucket, f.cnt, l.label
        FROM feat f JOIN lab l USING (doc_id) WHERE f.doc_id % 2 = 0),
    pb AS (
        SELECT bucket,
               SUM(CASE WHEN label = 1 THEN cnt ELSE 0 END) AS c1,
               SUM(CASE WHEN label = 0 THEN cnt ELSE 0 END) AS c0
        FROM tagged GROUP BY bucket),
    tot AS (SELECT SUM(c1) AS n1, SUM(c0) AS n0 FROM pb),
    w AS (
        SELECT bucket,
               ln((c1 + 1.0) / (n1 + 64.0)) - ln((c0 + 1.0) / (n0 + 64.0)) AS w
        FROM pb, tot),
    bias AS (
        SELECT ln((SUM(label) + 1.0) / (SUM(1 - label) + 1.0)) AS bias
        FROM lab WHERE doc_id % 2 = 0),
    raw AS (
        SELECT f.doc_id, SUM(f.cnt * w.w) AS s
        FROM feat f JOIN w USING (bucket)
        WHERE f.doc_id % 2 = 1 GROUP BY f.doc_id),
    scored AS (
        SELECT r.doc_id, ROUND(r.s + b.bias, 6) AS score FROM raw r, bias b)
    SELECT s.doc_id, s.score, l.label
    FROM scored s JOIN lab l USING (doc_id) WHERE s.score > 0
    """,
)
def classifier_quality_filter(spark, sf_dir):
    """Distributed quality-classifier train + filter e2e
    (operators/classifier.py — the fastText-style linear filter
    DataComp/Dolma pipelines apply after heuristic rules): hashed
    token features over documents, closed-form multinomial-NB log-odds
    weights trained on the even-doc_id half against a planted
    lang='en' target, class-prior bias, then the odd half scored
    through the broadcast-coefficients dot-product join and FILTERED
    to score > 0. Every stage is relational — featurize, train, and
    score replay exactly in the oracle, so a wrong count, a weight off
    by one smoothing term, or a mis-joined bucket breaks the hash.
    The pyspark.ml LogisticRegression twin of the trainer is pytest-
    gated (tests/test_classifier.py) — LBFGS float order isn't
    oracle-stable, closed-form NB is."""
    from lance_flink_spark.operators.classifier import (
        class_prior_bias,
        hashed_token_features,
        log_odds_weights,
    )

    d = table(spark, sf_dir, "documents")
    labels = d.select(
        "doc_id", (F.col("lang") == "en").cast("int").alias("label")
    )
    train_labels = labels.filter("doc_id % 2 = 0")
    feats = hashed_token_features(d, n_buckets=64)
    w = log_odds_weights(feats, train_labels, n_buckets=64)
    bias_f = class_prior_bias(train_labels)
    scored = (
        feats.filter("doc_id % 2 = 1")
        .join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("w")).alias("s"))
        .crossJoin(F.broadcast(bias_f))
        .select("doc_id", F.round(F.col("s") + F.col("bias"), 6).alias("score"))
        .filter("score > 0")
    )
    return scored.join(labels, "doc_id").select("doc_id", "score", "label")
