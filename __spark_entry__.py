"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``lance_flink_spark``; this module only
exposes the registry (see SURVEY.md §2 for the inventory).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _load() -> None:
    import lance_flink_spark.plans.all  # noqa: F401  (registers everything)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    _load()
    from lance_flink_spark.registry import QUERIES

    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    from lance_flink_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    _load()
    from lance_flink_spark.registry import ORACLES, QUERIES

    # ORACLES also covers the EXTRA_QUERIES (pytest-gated); the driver
    # only needs oracles for the primary registry it runs.
    return {k: v for k, v in ORACLES.items() if k in QUERIES}
