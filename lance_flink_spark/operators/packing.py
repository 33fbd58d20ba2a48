"""Sequence packing for LLM pretraining export.

GPT-style packing concatenates a partition's documents into one token
stream and chops it every ``budget`` tokens; a document's placement is
therefore a pure prefix-sum of token counts — which is exactly a Spark
window aggregate, so packing parallelizes as one shuffle on the packing
partition + an in-partition sort, no sequential driver loop.

At 100 TB the packing partition should be a bounded unit (a language, a
source shard, or a hash bucket of the corpus): each partition's window
sorts independently, so skew is controlled by choosing ``part_col``
granularity, not by the algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lance_flink_spark.functions.text import token_count


def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    part_col: str = "lang",
) -> DataFrame:
    """Assign each document its position in the packed token stream of
    its partition: ``seq_id`` = which fixed-``budget`` training
    sequence the document STARTS in, ``seq_offset`` = token offset
    inside that sequence. Deterministic: documents pack in ``id_col``
    order within each ``part_col`` partition.

    Returns (id, part, n_tokens, seq_id, seq_offset)."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = token_count(F.col(text_col)).cast("long")
    start = F.coalesce(F.sum(toks).over(w), F.lit(0))
    return df.select(
        F.col(id_col),
        F.col(part_col),
        toks.alias("n_tokens"),
        F.floor(start / budget).cast("long").alias("seq_id"),
        (start % budget).cast("long").alias("seq_offset"),
    )


def pack_spans(
    df: DataFrame,
    budget: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    part_col: str = "lang",
) -> DataFrame:
    """The loader-facing packing output: one row per (document ×
    training sequence it touches), with the doc-relative token slice
    [tok_from, tok_to) that lands in that sequence. A doc longer than
    ``budget`` or straddling a boundary yields several rows (GPT-style
    concat-and-chop never discards tokens).

    Still a pure window + HOF plan: the prefix-sum start position plus
    an exploded sequence(first_seq, last_seq) per doc — no UDFs, no
    driver loop; row amplification is exactly (total_tokens / budget)
    extra rows. Returns (id, part, seq_id, tok_from, tok_to)."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = token_count(F.col(text_col)).cast("long")
    start = F.coalesce(F.sum(toks).over(w), F.lit(0))
    base = df.select(
        F.col(id_col),
        F.col(part_col),
        toks.alias("__n"),
        start.alias("__start"),
    )
    first = F.floor(F.col("__start") / budget)
    last = F.floor((F.col("__start") + F.col("__n") - 1) / budget)
    spans = F.when(F.col("__n") > 0, F.sequence(first, last)).otherwise(
        F.expr("array()").cast("array<bigint>")
    )
    out = base.select(
        id_col, part_col, "__n", "__start", F.explode(spans).alias("seq_id")
    )
    return out.select(
        F.col(id_col),
        F.col(part_col),
        F.col("seq_id").cast("long"),
        (F.greatest(F.col("__start"), F.col("seq_id") * budget) - F.col("__start"))
        .cast("long")
        .alias("tok_from"),
        (
            F.least(F.col("__start") + F.col("__n"), (F.col("seq_id") + 1) * budget)
            - F.col("__start")
        )
        .cast("long")
        .alias("tok_to"),
    )


def shard_by_token_budget(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tok_col: str = "n_tok",
    seed: str = "shard",
    buckets: int = 256,
) -> DataFrame:
    """Deterministic training-shard assignment: documents in a seeded
    pseudo-random global order, cut into shards of ~``budget`` tokens
    (the file-level sibling of ``pack_sequences`` — shards feed data
    loaders, sequences feed batches).

    The global order is ``md5(seed:id)`` — a seeded permutation every
    engine reproduces — and the cut needs a GLOBAL running token sum,
    which is the classic distributed prefix-sum, NOT a single-partition
    window: rows partition into ``buckets`` rank-prefix buckets
    (lexicographic bucket order == global rank order), each bucket
    computes its within-bucket cumulative sum in parallel, and the
    bucket-total prefix offsets (one row per bucket — bounded, the
    only driver round-trip) are broadcast back. At 100 TB the shuffle
    is one exchange on the bucket key; no stage sees the global order
    serialized.

    Returns (id, n_tok, shard_id); shard_id = floor((cum - 1) /
    budget), so shards are contiguous in the seeded order and each
    holds ~budget tokens (a document never splits — loader-level
    splitting is ``pack_spans``'s job)."""
    ranked = df.select(
        F.col(id_col),
        F.col(tok_col),
        F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))).alias(
            "__rk"
        ),
    ).withColumn("__b", F.substring("__rk", 1, 2))
    w_in = Window.partitionBy("__b").orderBy("__rk", id_col)
    within = ranked.withColumn("__cum_in", F.sum(tok_col).over(w_in))
    totals = sorted(
        (r["__b"], r["t"])
        for r in ranked.groupBy("__b").agg(F.sum(tok_col).alias("t")).collect()
    )  # ≤ `buckets` rows — bounded driver work by construction
    offsets = {}
    acc = 0
    for b, t in totals:
        offsets[b] = acc
        acc += t
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            [(b, int(o)) for b, o in offsets.items()], "__b string, __off long"
        )
    )
    return (
        within.join(off_df, "__b")
        .select(
            F.col(id_col),
            F.col(tok_col),
            F.floor((F.col("__off") + F.col("__cum_in") - 1) / budget)
            .cast("long")
            .alias("shard_id"),
        )
    )
