"""Distributed exact NTILE — quantile bucketing with no
single-partition sort.

``NTILE(n) OVER (ORDER BY ...)`` as SQL defines it needs a GLOBAL row
number, and Spark's window implementation of an unpartitioned ordered
window forces every row through ONE task (`Exchange SinglePartition` +
a single sort) — fine for 150k customers at sf1, a driver-shaped
bottleneck for billions of entities at TPC-H 100 TB.

This module computes the SAME exact NTILE with bounded parallelism,
the classic distributed-rank construction (the sibling of the bucketed
prefix-sum in ``operators/packing.py:shard_by_token_budget``, which
ranks over a hash order; here the order is a user sort key):

1. **Monotone range buckets** — `approxQuantile` cut points of the
   sort key (one bounded driver round-trip, ``buckets-1`` doubles).
   Bucket id = #cuts below the key, a pure monotone function of the
   key alone, so bucket order == global key order and rows with equal
   keys always share a bucket (ties never straddle a boundary).
2. **Local ranks** — `row_number` per bucket (shuffle on the bucket
   id; each task sorts ~N/buckets rows, never N).
3. **Prefix offsets** — per-bucket counts to the driver (≤ ``buckets``
   rows by construction), cumulative offsets broadcast back.
4. **Exact NTILE arithmetic** — global_rn = offset + local_rn; the SQL
   NTILE bucket formula (first N mod n tiles get ceil(N/n) rows) as a
   closed-form expression over global_rn with N a literal.

Because step 1's cuts are collected ONCE and reused as literals, the
bucketing is deterministic across the counts job and the main job (no
repartitionByRange re-sampling hazard), and the result is bit-exact
NTILE — the DuckDB oracle hash-matches without tolerance.

Skew note: cut points only balance buckets when the key is spread; a
single hot key value collapses into one bucket (monotonicity demands
it — same-key rows must be rankable together). That bucket is then
key-cardinality-skew-sized, the same bound any exact total order pays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _bucket_of(key: Column, cuts: list[float]) -> Column:
    """#cuts strictly below `key` — monotone non-decreasing in key.

    A chain of literal comparisons (plain Catalyst expressions,
    whole-stage codegen; no Python UDF). Deliberately NOT a
    higher-order-function fold: an HOF expression as the LINEAGE OF A
    JOIN KEY trips Spark's constraint propagation when the plan later
    joins on the derived column again — the inferred isnotnull
    constraint keeps the lambda body and fails attribute binding on
    the other side (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND; first hit by
    grouped_percentiles' second join). The chain form is
    constraint-safe and identical in cost (≤ buckets-1 comparisons
    per row, codegen'd)."""
    out: Column = F.lit(0)
    for c in cuts:
        out = out + F.when(key > F.lit(float(c)), F.lit(1)).otherwise(F.lit(0))
    return out


def with_distributed_row_number(
    df: DataFrame,
    key_col: str,
    tiebreak_cols: list[str],
    out_col: str,
    descending: bool = False,
    buckets: int = 64,
) -> tuple[DataFrame, int]:
    """Add ``out_col`` = exact 1-based ROW_NUMBER() OVER (ORDER BY key
    [DESC], *tiebreaks) without an unpartitioned window; returns
    (frame, total row count).

    ``key_col`` must be numeric (the range-bucketing domain);
    ``tiebreak_cols`` make the order total so results are
    deterministic. ``buckets`` bounds both task size (~N/buckets rows
    sorted per task) and driver state (buckets counts + buckets-1
    cuts) — raise it with the cluster, it never touches correctness.
    """
    spark = df.sparkSession
    key = F.col(key_col)

    probs = [i / buckets for i in range(1, buckets)]
    # loose accuracy: cuts only balance buckets; ranks stay exact
    cuts = sorted(set(df.approxQuantile(key_col, probs, 0.01)))

    order_key = key.desc() if descending else key.asc()
    signed_bucket = _bucket_of(key, cuts)
    if descending:
        signed_bucket = F.lit(len(cuts)) - signed_bucket

    b = df.withColumn("__b", signed_bucket)
    counts = sorted(
        (r["__b"], r["cnt"])
        for r in b.groupBy("__b").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )  # ≤ buckets rows — bounded driver work by construction
    total = sum(c for _, c in counts)
    offsets, acc = [], 0
    for bk, c in counts:
        offsets.append((int(bk), int(acc)))
        acc += c
    off_df = F.broadcast(
        spark.createDataFrame(offsets, "__b int, __off long")
    )

    w_local = Window.partitionBy("__b").orderBy(
        order_key, *[F.col(c).asc() for c in tiebreak_cols]
    )
    ranked = (
        b.withColumn("__rn", F.row_number().over(w_local))
        .join(off_df, "__b")
        .withColumn(out_col, (F.col("__off") + F.col("__rn")).cast("long"))
        .drop("__b", "__rn", "__off")
    )
    return ranked, total


def with_distributed_ntile(
    df: DataFrame,
    n: int,
    key_col: str,
    tiebreak_col: str,
    out_col: str,
    descending: bool = False,
    buckets: int = 64,
) -> DataFrame:
    """Add ``out_col`` = exact NTILE(n) OVER (ORDER BY key [DESC],
    tiebreak) without an unpartitioned window — the global-rank
    machinery of with_distributed_row_number plus the closed-form
    tile arithmetic."""
    ranked, total = with_distributed_row_number(
        df,
        key_col,
        [tiebreak_col],
        "__grn",
        descending=descending,
        buckets=buckets,
    )

    # SQL NTILE: q = N div n, rem = N mod n; the first `rem` tiles hold
    # q+1 rows, the rest q. Closed form over the 1-based global rank.
    q, rem = divmod(total, n)
    if q == 0:  # fewer rows than tiles: tile == rank
        tile = F.col("__grn")
    else:
        cutoff = rem * (q + 1)
        tile = (
            F.when(
                F.col("__grn") <= cutoff,
                F.expr(f"(__grn - 1) div {q + 1}"),
            ).otherwise(rem + F.expr(f"(__grn - {cutoff} - 1) div {q}"))
            + 1
        )
    return ranked.withColumn(out_col, tile.cast("int")).drop("__grn")


def with_distributed_ntiles(
    df: DataFrame,
    n: int,
    axes: list[tuple[str, bool, str]],
    tiebreak_col: str,
    buckets: int = 64,
) -> DataFrame:
    """Multi-axis variant: exact NTILE(n) on several (key, descending,
    out_col) axes over the SAME frame with bounded driver work shared
    across axes — ONE multi-column approxQuantile action and ONE
    exploded bucket-count aggregation (axes × buckets rows) instead of
    two actions per axis. The per-axis window/join passes stay (each
    axis needs its own ordering); they chain lazily into one job.

    The single-axis `with_distributed_ntile` is the semantics
    reference; this is the same construction with the driver
    round-trips batched."""
    spark = df.sparkSession
    keys = [k for k, _, _ in axes]
    probs = [i / buckets for i in range(1, buckets)]
    # loose accuracy: cuts only balance buckets; ranks stay exact
    all_cuts = df.approxQuantile(keys, probs, 0.01)
    cuts_by_axis = {k: sorted(set(c)) for k, c in zip(keys, all_cuts)}

    bucket_cols = []
    for k, desc, _ in axes:
        b = _bucket_of(F.col(k), cuts_by_axis[k])
        if desc:
            b = F.lit(len(cuts_by_axis[k])) - b
        bucket_cols.append(b)
    tagged = df.select(
        "*", *[b.alias(f"__b{i}") for i, b in enumerate(bucket_cols)]
    )

    # one pass for every axis' bucket histogram: explode each row to
    # (axis_idx, bucket) pairs, aggregate — axes × buckets rows back
    pairs = tagged.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ax"), F.col(f"__b{i}").alias("b")
                    )
                    for i in range(len(axes))
                ]
            )
        ).alias("p")
    ).select("p.ax", "p.b")
    counts = pairs.groupBy("ax", "b").agg(F.count(F.lit(1)).alias("cnt")).collect()

    out = tagged
    for i, (k, desc, out_col) in enumerate(axes):
        mine = sorted((int(r["b"]), int(r["cnt"])) for r in counts if r["ax"] == i)
        total = sum(c for _, c in mine)
        offsets, acc = [], 0
        for bk, c in mine:
            offsets.append((bk, acc))
            acc += c
        off_df = F.broadcast(
            spark.createDataFrame(offsets, f"__b{i} int, __off{i} long")
        )
        order_key = F.col(k).desc() if desc else F.col(k).asc()
        w_local = Window.partitionBy(f"__b{i}").orderBy(
            order_key, F.col(tiebreak_col).asc()
        )
        out = (
            out.withColumn(f"__rn{i}", F.row_number().over(w_local))
            .join(off_df, f"__b{i}")
            .withColumn(f"__grn{i}", F.col(f"__off{i}") + F.col(f"__rn{i}"))
        )
        q, rem = divmod(total, n)
        if q == 0:
            tile = F.col(f"__grn{i}")
        else:
            cutoff = rem * (q + 1)
            tile = (
                F.when(
                    F.col(f"__grn{i}") <= cutoff,
                    F.expr(f"(__grn{i} - 1) div {q + 1}"),
                ).otherwise(rem + F.expr(f"(__grn{i} - {cutoff} - 1) div {q}"))
                + 1
            )
        out = out.withColumn(out_col, tile.cast("int")).drop(
            f"__b{i}", f"__rn{i}", f"__off{i}", f"__grn{i}"
        )
    return out


def grouped_percentiles(
    df: DataFrame,
    value_col: str,
    percentiles: dict[str, float],
    group_cols: list[str] | None = None,
    buckets: int = 64,
) -> DataFrame:
    """Exact linear-interpolated percentiles per group — Spark
    ``percentile`` / DuckDB ``quantile_cont`` semantics — WITHOUT the
    single-buffer exact aggregate.

    Spark's exact ``Percentile`` keeps a value→count map per group and
    merges each group's full map in ONE task: O(NDV) state that blows
    up exactly when groups are few and values near-unique (latency
    microseconds, prices in cents at 100 TB). This is the rank-exact
    replacement built on the distributed row-number construction
    above:

    1. global ``approxQuantile`` cut points of the value (bounded
       driver round-trip) → monotone bucket id;
    2. ``row_number`` per (group, bucket) — each task sorts
       ~group_rows/buckets rows, never a whole group;
    3. per-(group, bucket) counts to the driver (≤ groups × buckets
       rows — bounded because this operator is FOR the few-groups
       regime; many tiny groups should use a plain per-group window)
       → per-group prefix offsets and row totals;
    4. for each requested percentile p the two straddling global
       ranks of pos = p·(N−1) are computed driver-side per group,
       broadcast, and picked up by a 2-rows-per-(group, p) equi-join;
       the readout evaluates (⌈pos⌉−pos)·v_lo + (pos−⌊pos⌋)·v_hi —
       the exact weighted-sum expression Spark's Percentile and
       DuckDB's quantile_cont evaluate (NOT the algebraically-equal
       lerp form, whose different fp rounding flips ROUND
       boundaries), so hashes match bit-for-bit.

    Returns one row per group with a double column per
    ``percentiles`` alias. Nulls in ``value_col`` are ignored (SQL
    percentile semantics). Empty input → empty result.
    """
    import math

    group_cols = list(group_cols or [])
    spark = df.sparkSession
    df = df.filter(F.col(value_col).isNotNull())

    probs = [i / buckets for i in range(1, buckets)]
    # loose accuracy: cuts only BALANCE buckets (bucket order, not cut
    # precision, carries correctness — ranks are exact either way);
    # 0.01 keeps the GK pass cheap where 0.001 made it the dominant
    # cost of the whole operator
    cuts = sorted(set(df.approxQuantile(value_col, probs, 0.01)))
    b = df.withColumn("__b", _bucket_of(F.col(value_col), cuts))

    # ≤ groups × buckets rows when used as intended (FEW groups); the
    # limit turns a misuse on a high-cardinality group key into a loud
    # error instead of a silent driver OOM — many-tiny-groups
    # percentiles belong on a plain per-group window (each group
    # already fits one task)
    max_groups = 10_000
    cap = max_groups * (len(cuts) + 1) + 1
    counts = (
        b.groupBy(*group_cols, "__b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .limit(cap)
        .collect()
    )
    if len(counts) >= cap:
        raise ValueError(
            f"grouped_percentiles saw more than {max_groups} groups — "
            "this operator targets the few-groups/high-NDV regime; for "
            "many small groups use percentile over a per-group window "
            "(each group fits a task) instead"
        )
    per_group: dict[tuple, list[tuple[int, int]]] = {}
    for r in counts:
        g = tuple(r[c] for c in group_cols)
        per_group.setdefault(g, []).append((int(r["__b"]), int(r["cnt"])))

    offsets, targets = [], []
    for g, lst in per_group.items():
        lst.sort()
        acc = 0
        for bk, c in lst:
            offsets.append((*g, bk, acc))
            acc += c
        n = acc
        for p in percentiles.values():
            # Bit-exact Spark/DuckDB interpolation: both engines
            # evaluate the WEIGHTED-SUM form
            #   (ceil(pos) - pos) * v_lo + (pos - floor(pos)) * v_hi
            # over pos = p * (n - 1) — NOT the algebraically-equal
            # v_lo + (v_hi - v_lo) * frac, whose different rounding
            # error flips ROUND(x, 2) boundaries at real row counts
            # (observed: 448983.14499999996 vs ...500000002 at sf0.1).
            # Both weights are computed driver-side in full precision.
            rank = p * (n - 1)
            lo0, hi0 = math.floor(rank), math.ceil(rank)
            lo, hi = int(lo0) + 1, int(hi0) + 1
            if hi == lo:
                targets.append((*g, float(p), lo, 1.0))
            else:
                targets.append((*g, float(p), lo, float(hi0 - rank)))
                targets.append((*g, float(p), hi, float(rank - lo0)))
    if not targets:
        empty = df.select(*group_cols).limit(0)
        for alias in percentiles:
            empty = empty.withColumn(alias, F.lit(None).cast("double"))
        return empty

    gschema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in group_cols
    )
    sep = ", " if group_cols else ""
    off_df = F.broadcast(
        spark.createDataFrame(offsets, f"{gschema}{sep}__b int, __off long")
    )
    tgt_df = F.broadcast(
        spark.createDataFrame(
            targets,
            f"{gschema}{sep}__p double, __grank long, __w double",
        )
    )

    w_local = Window.partitionBy(*group_cols, "__b").orderBy(
        F.col(value_col).asc()
    )
    ranked = (
        b.withColumn("__rn", F.row_number().over(w_local))
        .join(off_df, [*group_cols, "__b"])
        .withColumn("__grank", (F.col("__off") + F.col("__rn")).cast("long"))
    )
    picked = ranked.join(tgt_df, [*group_cols, "__grank"]).select(
        *group_cols,
        "__p",
        (F.col(value_col).cast("double") * F.col("__w")).alias("__wv"),
    )
    # ≤ 2 rows per (group, percentile) from here on — a tiny weighted
    # sum (IEEE addition is commutative, so the 2-term sum is
    # order-independent and bit-exact vs the engines' w_lo·v + w_hi·v)
    per_p = picked.groupBy(*group_cols, "__p").agg(
        F.sum("__wv").alias("__res")
    )
    return per_p.groupBy(*group_cols).agg(
        *[
            F.max(F.when(F.col("__p") == F.lit(float(p)), F.col("__res"))).alias(
                alias
            )
            for alias, p in percentiles.items()
        ]
    )
