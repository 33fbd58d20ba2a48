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


# ---------- Mergeable QUANTILE sketch (DDSketch-style log bins) ----------
#
# Same motivation as the HLL state above, for percentiles: persist one
# sketch per fine cell, answer any coarser rollup's p50/p95/p99 by
# MERGING sketch state — never rescanning facts. The structure is the
# DDSketch family (Masson et al., VLDB 2019): values bucket into
# exponential bins i = ceil(log_gamma |x|) with gamma = (1+a)/(1-a),
# which guarantees RELATIVE error ≤ a on every quantile estimate, and
# merge is exact bin-wise count addition (fully associative /
# commutative, unlike KLL's randomized compaction). Negative values
# ride a mirrored store; zeros a scalar count. Everything below is
# built-in-function Spark (two-level aggregation, map columns) — no
# UDFs, map-side partial aggregation applies, per-group state is
# O(bins) = O(log(value range) / log gamma).

import math as _math


def _gamma(relative_accuracy: float) -> float:
    if not 0 < relative_accuracy < 1:
        raise ValueError("relative_accuracy must be in (0, 1)")
    return (1 + relative_accuracy) / (1 - relative_accuracy)


def quantile_sketches(
    df: DataFrame,
    keys: list[str],
    col: str,
    relative_accuracy: float = 0.01,
) -> DataFrame:
    """Per-group DDSketch state: (keys..., n, zeros, pos map<int,long>,
    neg map<int,long>). Two aggregation levels — (keys, bin) counts,
    then bins folded into a map per group — both shuffles carry
    bin-granular rows, never raw values."""
    g = _gamma(relative_accuracy)
    lg = _math.log(g)
    v = F.col(col).cast("double")
    binc = F.when(
        v > 0, F.ceil(F.log(v) / F.lit(lg)).cast("int")
    ).when(v < 0, F.ceil(F.log(-v) / F.lit(lg)).cast("int"))
    sign = F.when(v > 0, F.lit(1)).when(v < 0, F.lit(-1)).otherwise(F.lit(0))
    per_bin = (
        df.select(*keys, binc.alias("__bin"), sign.alias("__sign"))
        .groupBy(*keys, "__sign", "__bin")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    ent = F.struct(F.col("__bin"), F.col("__cnt"))
    return (
        per_bin.groupBy(*keys)
        .agg(
            F.sum("__cnt").alias("n"),
            F.coalesce(
                F.sum(F.when(F.col("__sign") == 0, F.col("__cnt"))), F.lit(0)
            ).alias("zeros"),
            F.map_from_entries(
                F.sort_array(
                    F.collect_list(F.when(F.col("__sign") == 1, ent))
                )
            ).alias("pos"),
            F.map_from_entries(
                F.sort_array(
                    F.collect_list(F.when(F.col("__sign") == -1, ent))
                )
            ).alias("neg"),
        )
    )


def rollup_quantile_sketches(
    sketches: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Merge persisted sketches to a coarser grouping (keys=[] for the
    global sketch) by EXACT bin-wise addition — input and shuffle are
    sketch-state-sized. merge(sketch(A), sketch(B)) == sketch(A ∪ B)
    bit-for-bit (pinned in tests), the property KLL-style randomized
    sketches cannot offer."""
    # two explode passes (pos, neg) union'd with a sign tag
    pos = sketches.select(
        *keys, F.explode(F.col("pos")).alias("__bin", "__cnt")
    ).withColumn("__sign", F.lit(1))
    neg = sketches.select(
        *keys, F.explode(F.col("neg")).alias("__bin", "__cnt")
    ).withColumn("__sign", F.lit(-1))
    merged_bins = (
        pos.unionByName(neg)
        .groupBy(*keys, "__sign", "__bin")
        .agg(F.sum("__cnt").alias("__cnt"))
    )
    scalars_src = sketches.groupBy(*keys) if keys else sketches.groupBy()
    scalars = scalars_src.agg(
        F.sum("n").alias("n"), F.sum("zeros").alias("zeros")
    )
    ent = F.struct(F.col("__bin"), F.col("__cnt"))
    maps_src = merged_bins.groupBy(*keys) if keys else merged_bins.groupBy()
    maps = maps_src.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.when(F.col("__sign") == 1, ent)))
        ).alias("pos"),
        F.map_from_entries(
            F.sort_array(F.collect_list(F.when(F.col("__sign") == -1, ent)))
        ).alias("neg"),
    )
    if keys:
        return scalars.join(maps, keys, "left").select(
            *keys, "n", "zeros",
            F.coalesce(F.col("pos"), F.expr("map()").cast("map<int,long>")).alias("pos"),
            F.coalesce(F.col("neg"), F.expr("map()").cast("map<int,long>")).alias("neg"),
        )
    return scalars.crossJoin(maps)


def estimate_quantiles(
    sketches: DataFrame,
    keys: list[str],
    qs: list[float],
    relative_accuracy: float = 0.01,
) -> DataFrame:
    """(keys..., q, estimate) for each requested quantile — the read
    side of the sketch. Bins explode to (sign, bin, cnt) rows in value
    order (negatives by descending magnitude, zeros, positives by
    ascending bin); a per-group cumulative sum finds the bin holding
    rank ceil(q·n); the estimate is the bin midpoint 2·γ^i/(γ+1)
    (sign-mirrored), which carries the ≤ relative_accuracy guarantee.
    Work is sketch-state-sized × |qs| — facts are never touched."""
    from pyspark.sql import Window as W

    g = _gamma(relative_accuracy)
    spark = sketches.sparkSession
    pos = sketches.select(
        *keys, "n", F.explode(F.col("pos")).alias("__bin", "__cnt")
    ).withColumn("__sign", F.lit(1))
    neg = sketches.select(
        *keys, "n", F.explode(F.col("neg")).alias("__bin", "__cnt")
    ).withColumn("__sign", F.lit(-1))
    zero = sketches.filter(F.col("zeros") > 0).select(
        *keys,
        "n",
        F.lit(0).alias("__bin"),
        F.col("zeros").alias("__cnt"),
        F.lit(0).alias("__sign"),
    )
    rows = pos.unionByName(neg).unionByName(zero)
    return estimate_quantiles_from_bins(
        rows, keys, qs, relative_accuracy=relative_accuracy
    )


def estimate_quantiles_from_bins(
    bins: DataFrame,
    keys: list[str],
    qs: list[float],
    relative_accuracy: float = 0.01,
) -> DataFrame:
    """Quantile estimates from BIN-GRANULAR sketch rows
    (keys..., n, __sign, __bin, __cnt) — the shared read path for the
    map-based sketches above and row-based incremental state (the
    percentile matview). Same guarantee, same plan shape."""
    from pyspark.sql import Window as W

    g = _gamma(relative_accuracy)
    spark = bins.sparkSession
    # global value order: (-1, -bin) < (0, _) < (1, bin)
    order = F.struct(
        F.col("__sign").alias("s"),
        (F.col("__bin") * F.col("__sign")).alias("b"),
    )
    w = W.partitionBy(*keys).orderBy(order) if keys else W.partitionBy().orderBy(order)
    with_cum = bins.withColumn("__cum", F.sum("__cnt").over(w))
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    target = F.greatest(F.ceil(F.col("q") * F.col("n")), F.lit(1))
    mid = F.lit(2.0) * F.pow(F.lit(g), F.col("__bin")) / F.lit(g + 1.0)
    est = (
        F.when(F.col("__sign") == 0, F.lit(0.0))
        .when(F.col("__sign") == 1, mid)
        .otherwise(-mid)
    )
    return (
        with_cum.crossJoin(F.broadcast(qdf))
        .filter(
            (F.col("__cum") >= target)
            & (F.col("__cum") - F.col("__cnt") < target)
        )
        .select(*keys, "q", est.alias("estimate"))
    )


def value_bins(
    col: str,
    relative_accuracy: float = 0.01,
):
    """(sign, bin) expressions for a value column — the shared
    bucketing used by quantile_sketches and the incremental matview
    (both sides MUST bin identically for merge/retraction to line
    up)."""
    g = _gamma(relative_accuracy)
    lg = _math.log(g)
    v = F.col(col).cast("double")
    binc = (
        F.when(v > 0, F.ceil(F.log(v) / F.lit(lg)).cast("int"))
        .when(v < 0, F.ceil(F.log(-v) / F.lit(lg)).cast("int"))
        .otherwise(F.lit(0))
    )
    sign = F.when(v > 0, F.lit(1)).when(v < 0, F.lit(-1)).otherwise(F.lit(0))
    return sign, binc
