"""Changelog compaction — the Flink SQL "deduplication" query.

``SELECT ... FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY key
ORDER BY ts DESC) AS rn ...) WHERE rn = 1`` is the canonical Flink
pattern for materializing the latest row per key from an append/upsert
stream (upsert-kafka semantics, Flink docs "Deduplication"). Spark's
batch dual is the identical partitioned window — one shuffle on the
key, state bounded per key group, no global ordering anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def latest_by_key(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Latest row per key group: ordered by ``order_col`` DESC with
    ``tiebreak_col`` DESC making the winner total and deterministic
    (Flink keeps the last row in stream order; a batch engine needs an
    explicit total order to mean the same thing)."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), F.col(tiebreak_col).desc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def earliest_by_key(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """First row per key group (the ORDER BY ... ASC twin — Flink's
    "keep first row" deduplication mode)."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).asc(), F.col(tiebreak_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
