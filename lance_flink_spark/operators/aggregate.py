"""Declarative aggregate spec → DataFrame plan.

Parity with the reference's aggregate pushdown
(aggregate/AggregateInfo.java:39-51 — COUNT, COUNT_DISTINCT, SUM, AVG,
MIN, MAX with optional GROUP BY — and aggregate/AggregateExecutor.java,
LanceAggregateSource.java).

The reference hand-executes these next to the scan; in Spark the same
spec compiles to a groupBy().agg() plan and Catalyst/Tungsten provide
the "pushdown": partial (map-side) aggregation before the shuffle,
whole-stage codegen, and for bare COUNT(*)/MIN/MAX even parquet
footer-metadata answers (spark.sql.parquet.aggregatePushdown).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SUPPORTED = ("count", "count_distinct", "sum", "avg", "min", "max")


@dataclass
class AggregateCall:
    """One aggregate: function + column (None = COUNT(*)) + result alias."""

    function: str
    column: str | None
    alias: str

    def __post_init__(self):
        if self.function not in SUPPORTED:
            raise ValueError(f"unsupported aggregate {self.function!r}; supported: {SUPPORTED}")
        if self.column is None and self.function != "count":
            raise ValueError(f"{self.function} requires a column")

    @property
    def is_count_star(self) -> bool:
        return self.function == "count" and self.column is None

    def to_column(self) -> Column:
        if self.is_count_star:
            return F.count(F.lit(1)).alias(self.alias)
        fn = {
            "count": F.count,
            "count_distinct": F.count_distinct,
            "sum": F.sum,
            "avg": F.avg,
            "min": F.min,
            "max": F.max,
        }[self.function]
        return fn(self.column).alias(self.alias)


@dataclass
class AggregateInfo:
    calls: list[AggregateCall] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)

    # builder surface mirroring AggregateInfo.Builder
    def add(self, function: str, column: str | None, alias: str) -> "AggregateInfo":
        self.calls.append(AggregateCall(function, column, alias))
        return self

    def count_star(self, alias: str) -> "AggregateInfo":
        return self.add("count", None, alias)

    def grouped_by(self, *columns: str) -> "AggregateInfo":
        self.group_by.extend(columns)
        return self

    @property
    def required_columns(self) -> list[str]:
        cols = list(self.group_by)
        for c in self.calls:
            if c.column and c.column not in cols:
                cols.append(c.column)
        return cols

    def apply(self, df: DataFrame) -> DataFrame:
        """Compile the spec onto ``df``. Projects required columns first
        so column pruning reaches the scan even through complex inputs."""
        if not self.calls:
            raise ValueError("at least one aggregate call is required")
        if self.required_columns:
            df = df.select(*self.required_columns)
        agg_cols = [c.to_column() for c in self.calls]
        if self.group_by:
            return df.groupBy(*self.group_by).agg(*agg_cols)
        return df.agg(*agg_cols)
