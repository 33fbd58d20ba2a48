"""Central registry mapping query names → (Spark callable, DuckDB oracle SQL).

Every operator in SURVEY.md §2 registers here; ``__spark_entry__``
exposes the registry to the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable, optionally with
    an equivalent ANSI-SQL oracle for DuckDB. Rows-only checks omit the
    oracle (non-SQL-expressible ops)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a benchmark table. The events table carries TIMESTAMP(NANOS)
    which Spark refuses by default — read nanos as long (runtime conf)
    and convert to a microsecond timestamp (exact integer div, no fp)."""
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def scratch_dir(*parts: str) -> str:
    """Gitignored scratch space inside the repo (warehouses, indexes,
    streaming checkpoints)."""
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = os.path.join(root, ".scratch", *parts)
    os.makedirs(p, exist_ok=True)
    return p
