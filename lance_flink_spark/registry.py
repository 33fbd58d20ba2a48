"""Central registry mapping query names → (Spark callable, DuckDB oracle SQL).

Every operator in SURVEY.md §2 registers here; ``__spark_entry__``
exposes the registry to the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# Secondary registry: fully-implemented queries whose oracle coverage is
# provided by a *merged* primary entry (e.g. the knn_l2/cosine/dot trio
# is gate-checked through ``knn_metrics``) or by pytest. The driver's
# correctness artifact records at most 50 entries, so the primary
# registry is kept to exactly the 50 highest-value shapes; extras stay
# runnable and are oracle-checked in tests/test_extras_oracle.py and by
# ``tools/check_oracle.py --extras``.
EXTRA_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}


def query(name: str, oracle: str | None = None, extra: bool = False):
    """Register a (spark, sf_dir) -> DataFrame callable, optionally with
    an equivalent ANSI-SQL oracle for DuckDB. Rows-only checks omit the
    oracle (non-SQL-expressible ops). ``extra=True`` keeps the query out
    of the driver-facing primary registry (50-entry artifact budget)
    while remaining oracle-checked in pytest."""

    def deco(fn):
        if name in QUERIES or name in EXTRA_QUERIES:
            # silent last-wins would swap a query out from under its
            # oracle (a duplicate q18 registration once did exactly
            # that) — fail loudly at import time instead
            raise ValueError(f"duplicate registry entry {name!r}")
        (EXTRA_QUERIES if extra else QUERIES)[name] = fn
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
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            # parquet timestamp[us] without tz → Spark 4 infers NTZ, which
            # watermarks/windows reject; interpret the wall clock as UTC
            # (session-tz independent, matches the DuckDB oracle's epoch())
            df = df.withColumn("ts", F.to_utc_timestamp(F.col("ts"), "UTC"))
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
