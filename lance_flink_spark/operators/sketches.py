"""Mergeable sketch state — re-aggregatable distinct counts.

At 100 TB the thing you cannot afford is RESCANNING facts to answer a
coarser rollup. Datasketches HLL (Spark's `hll_sketch_agg` family,
Apache DataSketches binary layout) makes distinct counts MERGEABLE:
persist one sketch per fine-grained cell once, then answer any
coarser GROUP BY — or the global total — by unioning sketch bytes,
never touching the facts again. This is also exactly the shape of
Flink incremental/OLAP aggregate state (partial aggregates that
compose), which is why it lives here as a first-class operator.

Estimates are approximate (standard HLL error ~1.6% at lgK=12, and
tunable); the exact COUNT DISTINCT entries remain the semantics pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def distinct_sketches(
    df: DataFrame,
    keys: list[str],
    col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch (binary) + its estimate per key group — the
    persistable fine-grained state. One partial-agg shuffle on the
    keys; sketch bytes are O(2^lg_k) per group regardless of
    cardinality."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(col, F.lit(lg_k)).alias("sketch"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(col, F.lit(lg_k))
        ).alias("estimate"),
    )


def rollup_sketches(
    sketches: DataFrame,
    keys: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Re-aggregate persisted sketches to a coarser grouping (possibly
    `keys=[]` for the global total) WITHOUT touching the facts: union
    the sketch bytes, estimate. The input is group-cardinality-sized;
    the shuffle carries sketch bytes only."""
    agg = [
        F.hll_union_agg(sketch_col).alias("sketch"),
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias("estimate"),
    ]
    return sketches.groupBy(*keys).agg(*agg) if keys else sketches.agg(*agg)
