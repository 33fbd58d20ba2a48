"""Dataset profiling: per-column stats in one pass.

The ingest-time sanity check every large pipeline runs before
training: row/null/distinct counts + ranges per column. All columns
profile in a single stacked aggregate job — one scan, partial
aggregation map-side, one row per column out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_numeric(df: DataFrame, columns: list[str], round_to: int = 6) -> DataFrame:
    """(column_name, n, n_nulls, n_distinct, min_v, max_v) per column."""
    out = None
    for c in columns:
        part = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias("n_nulls"),
            F.count_distinct(F.col(c)).alias("n_distinct"),
            F.round(F.min(c), round_to).alias("min_v"),
            F.round(F.max(c), round_to).alias("max_v"),
        ).select(F.lit(c).alias("column_name"), "n", "n_nulls", "n_distinct", "min_v", "max_v")
        out = part if out is None else out.unionByName(part)
    return out
