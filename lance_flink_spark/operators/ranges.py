"""Range-lookup join: fact value ∈ dim [lo, hi] without a cross join.

The classic engine gap: Spark plans ``f JOIN r ON f.v BETWEEN r.lo AND
r.hi`` as BroadcastNestedLoop (fact × ranges comparisons) — fine for
tiny dims, quadratic pain at scale. Databricks ships a range-join
optimization for exactly this; open-source Spark's standard workaround
is GRID BUCKETING, implemented here:

- each range explodes to the grid cells it overlaps (fan-out =
  span/cell per range — bounded by how wide ranges are, chosen via
  ``cell``),
- each fact row computes its single cell (stateless),
- an EQUI-join on the cell (hash join, broadcastable, AQE-eligible)
  followed by the exact BETWEEN filter.

Every fact row meets only the ranges sharing its cell — at 100 TB the
comparison count is fact × (ranges overlapping its cell), not fact ×
all ranges. Results are exactly the BETWEEN join's (the filter is
still applied); overlapping ranges simply emit multiple matches, like
the raw join would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lance_flink_spark.registry import bcast


def range_lookup_join(
    fact: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    cell: float = 10.0,
    how: str = "inner",
    max_cells_per_range: int = 100_000,
) -> DataFrame:
    """Join ``fact`` rows to every ``ranges`` row with
    ``lo <= value <= hi`` via grid cells. ``how`` supports ``inner``
    and ``left`` (unmatched fact rows keep null range columns).

    ``max_cells_per_range`` fails FAST on the classic footgun: an
    open-ended range (hi = 1e9) at a small cell width fans out to
    millions of cells — a silent memory bomb. Clamp such sentinels to
    the value domain (or raise ``cell``) instead."""
    if how not in ("inner", "left"):
        raise ValueError("how must be inner|left")
    lo_cell = F.floor(F.col(lo_col) / cell).cast("long")
    hi_cell = F.floor(F.col(hi_col) / cell).cast("long")
    guard = F.when(
        hi_cell - lo_cell >= max_cells_per_range,
        F.raise_error(
            F.concat(
                F.lit(
                    f"range [{lo_col}, {hi_col}] spans more than "
                    f"{max_cells_per_range} grid cells at cell={cell} — "
                    "clamp open-ended bounds or raise cell: "
                ),
                F.col(lo_col).cast("string"),
                F.lit(".."),
                F.col(hi_col).cast("string"),
            )
        ).cast("long"),
    ).otherwise(hi_cell)
    cells = F.sequence(lo_cell, guard)
    r = ranges.withColumn("__cell", F.explode(cells))
    f = fact.withColumn(
        "__cell", F.floor(F.col(value_col) / cell).cast("long")
    )
    cond = (
        (f["__cell"] == r["__cell"])
        & (F.col(value_col) >= F.col(lo_col))
        & (F.col(value_col) <= F.col(hi_col))
    )
    joined = f.join(bcast(r), cond, "inner").drop("__cell")
    if how == "inner":
        return joined
    # left: add back fact rows that matched no range
    matched = joined.select(*fact.columns)
    missing = fact.join(matched, fact.columns, "left_anti")
    for c in ranges.columns:
        missing = missing.withColumn(
            c, F.lit(None).cast(dict(ranges.dtypes)[c])
        )
    return joined.select(*fact.columns, *ranges.columns).unionByName(
        missing.select(*fact.columns, *ranges.columns)
    )
