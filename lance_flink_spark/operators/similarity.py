"""KNN search operators — brute-force baseline + similarity join.

Parity with LanceVectorSearch.java (search(query,k), search with
filter, metrics L2/COSINE/DOT, SearchResult distance+similarity) and
table/LanceVectorSearchFunction.java (SQL-side KNN over a set of
query vectors).

Scale design:
- ``knn``: the query vector is a literal folded into the plan; the
  top-k is ``orderBy(dist).limit(k)`` which Spark executes as
  TakeOrderedAndProject — per-partition bounded heap, driver merges k
  rows per partition. No shuffle of the corpus, ever.
- ``knn_join``: Q queries × N corpus is a broadcast nested-loop on the
  (small) query side followed by a per-query window top-k. The corpus
  is never shuffled; the rank shuffle moves only Q×N scored rows — at
  scale use ``index.ivf`` to cut the N side first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lance_flink_spark.functions import vector as V


def _query_literal(query_vec: list[float]):
    return F.array(*[F.lit(float(x)) for x in query_vec])


def knn(
    df: DataFrame,
    query_vec: list[float],
    k: int,
    vec_col: str = "embedding",
    metric: str = "cosine",
    filter: str | None = None,  # noqa: A002 - mirrors reference API
    round_to: int | None = 6,
    keep_vector: bool = False,
) -> DataFrame:
    """Top-k rows of ``df`` nearest to ``query_vec``.

    Returns the input columns (minus the vector unless ``keep_vector``
    — rerank pipelines need it) + ``distance`` and ``similarity``
    (reference SearchResult contract). ``filter`` is a SQL predicate
    applied before scoring (pushdown-eligible), matching
    LanceVectorSearch.search(query, k, filter).
    """
    q = _query_literal(query_vec)
    if filter:
        df = df.filter(filter)
    dist = V.distance(metric, F.col(vec_col), q)
    if round_to is not None:
        dist = F.round(dist, round_to)
    out_cols = [c for c in df.columns if keep_vector or c != vec_col]
    scored = df.select(*out_cols, dist.alias("distance"))
    # deterministic tie-break on the first non-vector (id-like) column
    tie = [c for c in out_cols if c != vec_col][:1]
    order = [F.asc("distance")] + [F.asc(c) for c in tie]
    return (
        scored.orderBy(*order)
        .limit(k)
        .withColumn("similarity", F.round(F.lit(1.0) - F.col("distance"), 6))
    )


def knn_join(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec_col: str = "embedding",
    corpus_vec_col: str = "embedding",
    metric: str = "cosine",
    round_to: int = 6,
) -> DataFrame:
    """For each row of ``queries_df``, the top-k nearest corpus rows.

    Output: (query_id, neighbor_id, distance, rn). The query side is
    broadcast; ranking partitions by query_id only.
    """
    q = queries_df.select(
        F.col(query_id).alias("__qid"), F.col(query_vec_col).alias("__qvec")
    )
    c = corpus_df.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec_col).alias("__cvec")
    )
    dist = F.round(V.distance(metric, F.col("__cvec"), F.col("__qvec")), round_to)
    scored = c.crossJoin(F.broadcast(q)).select(
        F.col("__qid").alias(query_id), "neighbor_id", dist.alias("distance")
    )
    return rank_top_k(scored, k, query_id=query_id)


def rank_top_k(scored: DataFrame, k: int, query_id: str = "query_id") -> DataFrame:
    """Per-query top-k ranking tail shared by the brute and the
    index-routed (IVFIndex.knn_join) KNN joins: the (distance,
    neighbor_id) tie-break contract lives in exactly one place so the
    two paths cannot drift apart."""
    w = Window.partitionBy(query_id).orderBy(F.asc("distance"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )


def mmr_rerank(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int,
    shortlist: int = 50,
    lambda_: float = 0.5,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec_col: str = "embedding",
    corpus_vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance rerank (Carbonell & Goldstein '98):
    per query, greedily pick k results maximizing
    ``lambda * sim(q, d) - (1 - lambda) * max_{s in selected} sim(d, s)``
    — the standard diversity pass RAG retrieval runs after ANN.

    Two stages, both distributed:

    1. shortlist — the brute cosine top-``shortlist`` per query (swap
       in ``index.ivf.knn_join`` at scale); corpus vectors ride along
       because stage 2 needs pairwise similarities.
    2. greedy selection — inherently sequential PER QUERY but
       independent ACROSS queries, so it runs as one
       ``applyInPandas`` group per query over the (tiny,
       ``shortlist``-bounded) candidate set: an O(k * shortlist)
       numpy loop per group, never a driver-side collect.

    Deterministic: ties break on (score desc, neighbor_id asc) in
    float64. Output: (query_id, neighbor_id, mmr_score 6dp, rank).
    """
    from lance_flink_spark.session import ship_package

    ship_package(queries_df.sparkSession)
    q = queries_df.select(
        F.col(query_id).alias("query_id"), F.col(query_vec_col).alias("__qvec")
    )
    c = corpus_df.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec_col).alias("__cvec")
    )
    dist = V.distance("cosine", F.col("__cvec"), F.col("__qvec"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "neighbor_id", "__cvec", "__qvec", dist.alias("distance")
    )
    short = rank_top_k(scored, shortlist, query_id="query_id")

    lam = float(lambda_)

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["distance", "neighbor_id"], ignore_index=True)
        vecs = np.stack(pdf["__cvec"].to_numpy()).astype(np.float64)
        qv = np.asarray(pdf["__qvec"].iloc[0], dtype=np.float64)
        norms = np.maximum(np.linalg.norm(vecs, axis=1), 1e-12)
        rel = vecs @ qv / (norms * max(np.linalg.norm(qv), 1e-12))
        pair = (vecs @ vecs.T) / np.outer(norms, norms)
        n = len(pdf)
        ids = pdf["neighbor_id"].to_numpy()
        picked: list[int] = []
        scores: list[float] = []
        free = np.ones(n, dtype=bool)
        max_sim = np.zeros(n)
        for _ in range(min(k, n)):
            mmr = lam * rel - (1 - lam) * max_sim
            # deterministic argmax: score desc, neighbor_id asc
            best, best_key = -1, None
            for i in np.flatnonzero(free):
                key = (-mmr[i], ids[i])
                if best_key is None or key < best_key:
                    best, best_key = int(i), key
            picked.append(best)
            scores.append(float(mmr[best]))
            free[best] = False
            max_sim = np.maximum(max_sim, pair[:, best])
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[0],
                "neighbor_id": ids[picked],
                "mmr_score": np.round(scores, 6),
                "rank": np.arange(1, len(picked) + 1, dtype=np.int64),
            }
        )

    qid_type = dict(short.dtypes)["query_id"]
    nid_type = dict(short.dtypes)["neighbor_id"]
    return short.groupBy("query_id").applyInPandas(
        _mmr,
        schema=(
            f"query_id {qid_type}, neighbor_id {nid_type}, "
            "mmr_score double, rank long"
        ),
    )


def assign_clusters(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    sample_size: int = 262_144,
    seed: int = 42,
    distributed: bool | None = None,
) -> tuple[DataFrame, "object"]:
    """Embedding clustering for topic bucketing / diversity analysis:
    k-means over the corpus, returning (df + ``cluster_id`` column,
    centroid matrix). The same two training regimes as the IVF coarse
    quantizer (bounded driver sample below k=512, pyspark.ml Lloyd
    above — no sample ceiling), and the same Arrow-batched chunked
    argmin for assignment; this is the user-facing face of that
    machinery for pipelines that want cluster labels rather than an
    index (cluster-balanced sampling, per-topic stats, dedup
    stratification).

    Deterministic for a fixed (seed, corpus)."""
    from pyspark.sql.functions import pandas_udf

    from lance_flink_spark.index.ivf import (
        _assign_chunked,
        _kmeans,
        _kmeans_distributed,
    )
    from lance_flink_spark.session import ship_package

    spark = df.sparkSession
    ship_package(spark)
    if distributed is None:
        distributed = k > 512
    if distributed:
        cents = _kmeans_distributed(df, vec_col, k, seed)
    else:
        sample = np.stack(
            [
                np.asarray(r[0], dtype=np.float64)
                for r in df.select(vec_col).limit(sample_size).collect()
            ]
        )
        cents = _kmeans(sample, k, seed=seed)
    cents_b = spark.sparkContext.broadcast(cents)

    @pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        a, _ = _assign_chunked(
            np.stack(v.to_numpy()).astype(np.float64), cents_b.value
        )
        return pd.Series(a.astype(np.int32))

    return df.withColumn("cluster_id", assign(F.col(vec_col))), cents
