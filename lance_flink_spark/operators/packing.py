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
