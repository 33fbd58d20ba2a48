"""Skew-resilient aggregation patterns.

Spark's partial aggregation already defuses skew for algebraic aggs
(sum/count/min/max); the case that genuinely melts a reducer at 100 TB
is COUNT(DISTINCT) on a hot key — every distinct value of the hot key
lands on one task. ``salted_count_distinct`` is the standard fix:

  phase 1: group by (key, hash(value) mod salt) — the hot key's
           distinct set is split across `salt` reducers, and the
           partial distinct-counts are over DISJOINT value sets;
  phase 2: sum the partial counts per key (tiny).

Deterministic (hash-of-value salting, no RNG) → result is exactly
COUNT(DISTINCT value), verified against the plain-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    salt: int = 16,
    alias: str = "n_distinct",
) -> DataFrame:
    part = (
        df.groupBy(*keys, F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt)).alias("_salt"))
        .agg(F.count_distinct(F.col(value_col)).alias("_partial"))
    )
    return part.groupBy(*keys).agg(F.sum("_partial").alias(alias))
