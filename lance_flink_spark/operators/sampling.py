"""Deterministic sampling / dataset splitting for training pipelines.

Hash-based (md5-derived) bucketing instead of RNG sampling: the split
of a given row never changes across runs, engines, or cluster sizes —
the property training pipelines actually need (and what makes the
DuckDB oracle reproduce it exactly). No shuffle: the bucket is a
row-local expression, so splits are a free filter at scan time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lance_flink_spark.functions.text import md5i


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from the md5 of the key's string
    form."""
    return F.pmod(md5i(key.cast("string")), F.lit(buckets))


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    split_col: str = "split",
) -> DataFrame:
    """Adds a 'train'/'val'/'test' column by stable hash bucket."""
    b = hash_bucket(F.col(key_col))
    return df.withColumn(
        split_col,
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def deterministic_sample(df: DataFrame, key_col: str, pct: int) -> DataFrame:
    """Stable pct% sample (same rows every run/engine)."""
    return df.filter(hash_bucket(F.col(key_col)) < pct)


def mixture_sample(
    df: DataFrame,
    rates: dict[str, int],
    source_col: str = "source",
    key_col: str = "doc_id",
    default_pct: int = 0,
) -> DataFrame:
    """Data mixing (the training-mix step: per-source sampling rates à
    la published pretraining mixtures): keep ``rates[source]`` percent
    of each source's rows, deterministically by key hash — the same
    rows survive on every run, engine, and cluster size, so a mixture
    is reproducible end-to-end. Sources absent from ``rates`` keep
    ``default_pct`` percent.

    Row-local predicate (hash + CASE): no shuffle, evaluated at scan
    time, and at 100 TB the dropped rows never leave the scan."""
    b = hash_bucket(F.col(key_col).cast("string"))
    pct = F.lit(default_pct)
    for src, p in sorted(rates.items()):
        pct = F.when(F.col(source_col) == src, F.lit(p)).otherwise(pct)
    return df.filter(b < pct)
