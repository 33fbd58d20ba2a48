"""Keyword retrieval over a document corpus: BM25 scoring and corpus
term statistics.

Reference parity: the Flink connector exposes vector retrieval only
(LanceVectorSearch.java); a training-data engine also needs the lexical
side — benchmark-query mining, corpus audits, hybrid (BM25 + ANN)
retrieval. Implemented Spark-first:

- ``bm25_topk``: per-doc term frequencies are computed with Catalyst
  higher-order functions over the token array (one corpus scan, no
  explode, no shuffle for tf); the global stats the formula needs
  (N, avgdl, per-term document frequency) reduce to ONE row via a
  partially-aggregated global agg, which is broadcast back with a
  1-row cross join. Top-k is orderBy+limit → TakeOrderedAndProject.
  Total cost: two column-pruned scans of (id, text) and a k-row
  result — no corpus shuffle at any width.
- ``top_ngrams``: explode + count, partial-aggregated before the
  single shuffle; deterministic (count DESC, gram ASC) top-k.

Tokenization is the engine-wide convention (functions/text.py): trim,
lowercase, split on whitespace — every shape here has an exact DuckDB
mirror in plans/text_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from lance_flink_spark.functions.text import tokens, word_shingles


def _tf(tok_arr: Column, term: str) -> Column:
    """Occurrences of ``term`` in the token array (HOF, JVM-side)."""
    return F.size(F.filter(tok_arr, lambda t: t == F.lit(term)))


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 score for a bag of query terms.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5))   (Lucene form).

    dl is the raw token count of the document; df(t) counts documents
    with ≥1 occurrence. Only docs matching ≥1 term are scored (the
    per-doc tf columns make the match test a cheap HOF predicate), and
    ties break on ascending id. Scores round to 6dp for cross-engine
    comparison.

    Scale: per-doc tf/dl never leave the row they're computed on; the
    only aggregates are the one-row stats reduction (map-side partial)
    and the final top-k (TakeOrderedAndProject — k rows per partition
    to the driver). The corpus text column is scanned twice (stats +
    score); persist the tokenized projection if the pipeline runs many
    queries against the same snapshot.
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    terms = list(dict.fromkeys(terms))  # dedupe, keep order
    tok_arr = tokens(F.lower(F.col(text_col)))
    per_doc = docs.select(
        F.col(id_col),
        F.size(tok_arr).alias("dl"),
        *[_tf(tok_arr, t).alias(f"tf_{i}") for i, t in enumerate(terms)],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    matched = per_doc.where(
        " or ".join(f"tf_{i} > 0" for i in range(len(terms)))
    ).crossJoin(F.broadcast(stats))
    contrib = [
        F.log(
            1.0
            + (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        )
        * (F.col(f"tf_{i}") * (k1 + 1))
        / (
            F.col(f"tf_{i}")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )
        for i in range(len(terms))
    ]
    score = contrib[0]
    for c in contrib[1:]:
        score = score + c
    return (
        matched.select(F.col(id_col), F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def top_ngrams(
    docs: DataFrame,
    n: int = 1,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    distinct_per_doc: bool = False,
) -> DataFrame:
    """Top-k most frequent n-grams across the corpus → (gram, cnt).

    ``n=1`` counts tokens; ``n≥2`` counts n-word shingles (same shingle
    definition as the dedup operators). ``distinct_per_doc`` switches
    the count to document frequency (each doc contributes a gram once)
    — the df() building block of the inverted-index operators.

    One explode + one partially-aggregated shuffle on gram; the top-k
    is TakeOrderedAndProject, so only k rows per partition reach the
    driver regardless of vocabulary size. Deterministic: ties break on
    ascending gram."""
    # word_shingles lowercases internally (same convention as tokens)
    arr = (
        tokens(F.lower(F.col(text_col)))
        if n == 1
        else word_shingles(F.col(text_col), n)
    )
    g = docs.select(F.col(id_col), F.explode(arr).alias("gram"))
    if distinct_per_doc:
        g = g.distinct()
    return (
        g.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.col("gram"))
        .limit(k)
    )
