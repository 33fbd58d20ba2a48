"""Temporal joins — Flink-parity operators Spark lacks as builtins.

Flink SQL (the reference's engine) offers temporal/ASOF joins and
interval joins; Spark has neither as a named operator. Both are
expressed here as compositions of existing DataFrame ops (SURVEY
"custom operators" rule (a) — no UDF needed):

- ``asof_join``: for each left row, the latest right row with
  right_ts <= left_ts for the same key. Implemented as a union +
  window last_value(ignorenulls) sweep: ONE shuffle on the key,
  no range-explosion, O(n log n) per key — the scalable plan for
  100 TB time series (a naive range join would be O(left×right)
  per key).
- ``interval_join``: pairs within [0, upper_bound] time distance,
  equi-join on key + range predicate (Flink interval join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left-asof-join: every left row + the most recent right row at or
    before its timestamp (per ``on`` key). Right payload columns come
    back null when no earlier right row exists (or it is older than
    ``tolerance_seconds``).

    Matches DuckDB's ``ASOF LEFT JOIN`` semantics (>= includes equal
    timestamps)."""
    payload = right_payload or [c for c in right.columns if c not in (on, right_ts)]
    l_cols = left.columns
    l = left.withColumn("_t", F.col(left_ts)).withColumn("_is_left", F.lit(1))
    r = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("_t"),
            F.lit(0).alias("_is_left"),
            F.col(right_ts).alias("_r_ts"),
            *[F.col(c).alias(f"_r_{c}") for c in payload],
        )
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before left rows at equal _t (asof >= semantics)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.select(
        *l_cols,
        "_is_left",
        "_t",
        F.last("_r_ts", ignorenulls=True).over(w).alias("_m_ts"),
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}") for c in payload],
    ).filter(F.col("_is_left") == 1)
    if tolerance_seconds is not None:
        in_tol = (
            F.col("_t").cast("double") - F.col("_m_ts").cast("double")
        ) <= float(tolerance_seconds)
        matched = matched.select(
            *l_cols,
            *[
                F.when(in_tol, F.col(f"_m_{c}")).alias(c) for c in payload
            ],
        )
    else:
        matched = matched.select(*l_cols, *[F.col(f"_m_{c}").alias(c) for c in payload])
    return matched


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
) -> DataFrame:
    """Pairs (l, r) with the same key and
    l_ts + lower <= r_ts <= l_ts + upper (Flink interval join).
    Equi-join on the key carries the shuffle; the range predicate
    filters pairs within each key group."""
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (rts >= lts + F.expr(f"INTERVAL {lower}"))
        & (rts <= lts + F.expr(f"INTERVAL {upper}"))
    )
    return left.alias("l").join(right.alias("r"), cond)
