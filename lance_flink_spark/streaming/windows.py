"""Event-time windowing — batch and streaming share these plans.

Flink-parity surface (the reference is a Flink connector; windowed
aggregation over event streams is the core Flink capability its users
run): tumbling, sliding (hopping), and gap-based session windows with
event-time semantics.

Batch and Structured Streaming use the *same* F.window expressions —
the functions below take any DataFrame (static or streaming), which is
exactly Spark's unified-engine model. Window starts are emitted as
epoch seconds (long) so results hash identically across engines.

Scale: windowed aggs pre-aggregate map-side per (key, window) before
the shuffle; sliding windows replicate each row size/slide times —
keep that ratio small (2 here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tumbling_agg(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """COUNT + SUM(value) per (window, key). Output window_start_s as
    epoch seconds."""
    return (
        events.groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start_s"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hopping windows: each event lands in window/slide windows.

    The hashed output is ALL-INTEGER: count + SUM(cents). History of
    this surface: ROUND(AVG(double), 6) flipped between Spark and
    DuckDB at sf0.1 — first from summation order, then, with exact
    cents numerators, from ROUND tie policy (Spark HALF_UP vs DuckDB
    HALF_EVEN) on the exact .5 boundaries that power-of-two window
    counts produce. An integer-DIV micros quotient removed the ties
    but still carried division semantics (truncate vs floor differs on
    negative sums between engines). Emitting the raw exact integers
    (n, Σcents) leaves NOTHING derived on the hashed surface — any
    consumer can form the average; the comparison can't."""
    cents = F.floor(F.col(value_col) * 100 + 0.5).cast("long")
    return (
        events.groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("sum_value_cents"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start_s"),
            "n_events",
            "sum_value_cents",
        )
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Native session windows (F.session_window — works on both batch
    and streaming inputs; Flink session-window parity). One row per
    (user, merged session window) with its event count."""
    return (
        events.groupBy(F.session_window(ts_col, gap).alias("w"), user_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            user_col,
            F.col("w.start").cast("long").alias("session_start_s"),
            "n",
        )
    )


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Batch gap-based sessionization via window functions (the SQL
    dual of Flink session windows / F.session_window): a session break
    is a gap > gap_seconds; session id = running sum of breaks.

    Returns per-user (n_sessions, n_events, max_session_events).
    One shuffle on user_id serves both window functions and the final
    aggregate (same partitioning)."""
    from pyspark.sql import Window as W

    w = W.partitionBy(user_col).orderBy(ts_col, id_col)
    t = F.col(ts_col).cast("double")
    brk = F.when(t - F.lag(t).over(w) > float(gap_seconds), 1).otherwise(0)
    sess = events.select(
        user_col,
        F.sum(brk).over(w.rowsBetween(W.unboundedPreceding, 0)).alias("sess_id"),
    )
    per_sess = sess.groupBy(user_col, "sess_id").agg(F.count(F.lit(1)).alias("n"))
    return per_sess.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n").alias("n_events"),
        F.max("n").alias("max_session_events"),
    )


def windowed_distinct_users(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    user_col: str = "user_id",
) -> DataFrame:
    """EXACT distinct users per (window, key) on a stream — the Flink
    streaming COUNT(DISTINCT ...) pattern. Structured Streaming
    rejects count_distinct in streaming aggregates, and Flink's own
    operator splits it the same way this does: a keyed DEDUP state
    upstream (one entry per (window, key, user) within the watermark)
    feeding a plain COUNT downstream. State is bounded by distinct
    users per live window — exactly the split-distinct state Flink
    keeps — while the approximate alternative
    (approx_count_distinct) trades that state for sketch error.

    Works identically on a batch frame (unified engine): dedup is
    dropDuplicates there."""
    w = F.window(ts_col, window).alias("w")
    # dedup keys keep the WINDOW STRUCT (not split start/end columns):
    # the struct carries the event-time watermark tag, so both the
    # dedup state and the downstream aggregate state expire when the
    # watermark passes the window — splitting first would strip the
    # tag and leave the dedup state growing with every window ever
    deduped = events.select(w, F.col(key_col), F.col(user_col)).dropDuplicates(
        ["w", key_col, user_col]
    )
    return (
        deduped.groupBy("w", key_col)
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.col("w.start").cast("long").alias("window_start_s"),
            key_col,
            "n_users",
        )
    )


def cumulate_agg(
    events: DataFrame,
    step: str = "6 hours",
    size: str = "1 day",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Flink CUMULATE windows (1.13 windowing TVF), which Spark has no
    native operator for: within each ``size`` span, emit cumulative
    windows [start, start + i·step] — the "running daily total updated
    every 6 hours" dashboards are built on.

    Expressed as a stateless fan-out + plain windowed aggregate: each
    event belongs to the cumulative windows whose end it precedes
    (≤ size/step rows per event — bounded amplification, exactly the
    multiplicity Flink's slice operator assigns), then one (start,
    end, key) aggregate with map-side partials. Works identically on a
    batch frame or a watermarked stream (unified engine)."""
    step_s = _interval_seconds(step)
    size_s = _interval_seconds(size)
    if size_s % step_s:
        raise ValueError("size must be a multiple of step")
    k = size_s // step_s
    sec = F.unix_timestamp(F.col(ts_col))
    base = F.floor(sec / size_s) * size_s
    ends = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.lit(k)),
            lambda i: base + i * step_s,
        ),
        lambda e: sec < e,
    )
    return (
        events.select(
            base.alias("window_start_s"),
            F.explode(ends).alias("window_end_s"),
            F.col(key_col),
            F.col(value_col),
        )
        .groupBy("window_start_s", "window_end_s", key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
    )


def _interval_seconds(s: str) -> int:
    """'6 hours' / '1 day' / '30 minutes' → seconds (exact units only)."""
    n, unit = s.split()
    mult = {
        "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    }[unit.lower()]
    return int(n) * mult
