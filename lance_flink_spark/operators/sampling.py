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


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    group_col: str | None = None,
    seed: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis 2006): each row draws priority
    ``u^(1/w)`` with ``u`` uniform from md5(seed:key) — the top-k
    priorities are then a weight-proportional sample, computed as a
    plain per-group rank. Quality-weighted corpus selection ("sample
    50k docs per source ∝ quality score") reduces to exactly this.

    Deterministic and engine-independent: ``u`` is the md5 hex's first
    12 nibbles scaled to (0,1), so the oracle reproduces every
    priority bit-for-bit. Zero/negative weights are excluded (their
    theoretical priority is 0 — never sampled).

    One window shuffle on the group key (or a TakeOrderedAndProject
    when ungrouped); no RNG state, no driver involvement."""
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string"))), 1, 12), 16, 10).cast("double")
        / F.lit(float(16**12))
    )
    # exp(ln(u)/w): the stable spelling of u^(1/w) for tiny u
    pri = F.exp(F.log(u) / F.col(weight_col))
    out = df.filter(F.col(weight_col) > 0).withColumn("__pri", pri)
    if group_col is None:
        return (
            out.orderBy(F.desc("__pri"), F.asc(key_col))
            .limit(k)
            .drop("__pri")
        )
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.desc("__pri"), F.asc(key_col))
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__pri", "__rn")
    )


def seeded_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 42,
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic global shuffle + shard assignment for reproducible
    training-data ordering: every run (any cluster size, any partition
    layout) produces the SAME total order and the same shard files —
    the property a resumable 100 TB training pipeline needs from its
    "shuffle the corpus" step.

    Order = md5(seed:id) ascending (ties impossible past the full
    hash + id tiebreak); rank comes from the distributed row-number
    machinery (range-bucket on a 60-bit numeric prefix of the hash +
    per-bucket window + bounded offsets — never an unpartitioned
    window). Shards round-robin over the rank, so shard sizes differ
    by at most one and every shard is itself a seeded sample of the
    corpus. Adds ``ord`` (1-based global position), ``shard``,
    ``pos_in_shard`` (0-based position within the shard).
    """
    from lance_flink_spark.operators.quantiles import (
        with_distributed_row_number,
    )

    h = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col)))
    keyed = df.withColumn("__h", h).withColumn(
        # 60-bit numeric prefix: monotone in the hex string (lowercase
        # hex → lexicographic == numeric), so range-bucketing on it is
        # consistent with ORDER BY the full hash
        "__hn",
        F.conv(F.substring("__h", 1, 15), 16, 10).cast("long"),
    )
    ranked, _ = with_distributed_row_number(
        keyed, "__hn", ["__h", id_col], "ord"
    )
    return (
        ranked.withColumn(
            "shard", ((F.col("ord") - 1) % n_shards).cast("int")
        )
        .withColumn("pos_in_shard", F.expr(f"(ord - 1) div {n_shards}"))
        .drop("__h", "__hn")
    )


def temperature_mixture_plan(
    df: DataFrame,
    budget: int,
    alpha: float = 0.5,
    domain_col: str = "lang",
    weight_col: str = "n_chars",
) -> DataFrame:
    """TEMPERATURE-scaled data-mixing plan (the multilingual /
    multi-domain α-sampling of Conneau & Lample 2019 — public): each
    domain's share of the ``budget`` tokens is
    ``q_d ∝ tokens_d^alpha`` (alpha < 1 upweights small domains,
    alpha = 1 keeps natural proportions), giving a per-domain REPEAT
    factor ``budget * q_d / tokens_d`` — > 1 means multi-epoch
    upsampling, < 1 downsampling. The repeat is quantized to integer
    PER-MILLE (``r_pm``) so the plan — and everything derived from it
    — is engine-exact: every other column is an integer, and the one
    float boundary downstream (the fractional-epoch hash gate)
    compares exactly-representable doubles.

    One tiny shuffle (groupBy over #domains keys) + a single-row
    broadcast cross join for the normalizer; the plan frame holds one
    row per domain."""
    stats = df.groupBy(domain_col).agg(
        F.sum(weight_col).cast("long").alias("tokens")
    )
    z = stats.agg(
        F.sum(F.pow(F.col("tokens").cast("double"), F.lit(alpha))).alias(
            "__z"
        )
    )
    q = F.pow(F.col("tokens").cast("double"), F.lit(alpha)) / F.col("__z")
    repeat = F.lit(float(budget)) * q / F.col("tokens").cast("double")
    return (
        stats.crossJoin(F.broadcast(z))
        .select(
            domain_col,
            "tokens",
            F.floor(repeat * 1000 + F.lit(0.5)).cast("long").alias("r_pm"),
        )
        .orderBy(domain_col)
    )


def apply_temperature_mixture(
    df: DataFrame,
    plan: DataFrame,
    domain_col: str = "lang",
    key_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Materialize a :func:`temperature_mixture_plan`: every row gains
    ``floor(r_pm/1000)`` full copies (``copy`` = epoch index) plus one
    candidate copy admitted iff the row's md5-uniform falls under the
    fractional per-mille — deterministic by key, no RNG state, so the
    exact multiset reproduces on any engine or cluster size. The plan
    joins by BROADCAST (one row per domain); the explode is row-local
    — at 100 TB this is a map-only pass whose output size is the
    token budget, with no shuffle at all."""
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{seed}:"), F.col(key_col).cast("string")
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**12))
    )
    nfull = (F.col("r_pm") / 1000).cast("long")
    frac_pm = F.col("r_pm") % 1000
    return (
        df.join(F.broadcast(plan.select(domain_col, "r_pm")), domain_col)
        .withColumn(
            "copy", F.explode(F.sequence(F.lit(0).cast("long"), nfull))
        )
        .filter(
            (F.col("copy") < nfull) | (u * 1000 < frac_pm.cast("double"))
        )
        .drop("r_pm")
    )
