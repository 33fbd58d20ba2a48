"""Vector functions + KNN semantics — mirrors LanceVectorSearchTest."""

import math

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from lance_flink_spark.functions import vector as V
from lance_flink_spark.operators.similarity import knn, knn_join


@pytest.fixture(scope="module")
def vec_df(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0], label=0),
        Row(vec_id=1, embedding=[0.0, 1.0, 0.0], label=0),
        Row(vec_id=2, embedding=[1.0, 1.0, 0.0], label=1),
        Row(vec_id=3, embedding=[2.0, 0.0, 0.0], label=1),
        Row(vec_id=4, embedding=[-1.0, 0.0, 0.0], label=0),
    ]
    return spark.createDataFrame(rows)


def test_distance_expressions(spark, vec_df):
    out = vec_df.select(
        "vec_id",
        V.dot(F.col("embedding"), F.array(F.lit(1.0), F.lit(2.0), F.lit(3.0))).alias("d"),
        V.l2_distance(F.col("embedding"), F.array(F.lit(0.0), F.lit(0.0), F.lit(0.0))).alias("l2"),
        V.cosine_similarity(F.col("embedding"), F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0))).alias("cos"),
    ).orderBy("vec_id").collect()
    assert out[0]["d"] == 1.0 and out[1]["d"] == 2.0 and out[2]["d"] == 3.0
    assert out[3]["l2"] == 2.0
    assert abs(out[2]["cos"] - 1 / math.sqrt(2)) < 1e-12
    assert out[4]["cos"] == -1.0


@pytest.mark.parametrize("metric", ["l2", "cosine", "dot"])
def test_knn_matches_numpy(spark, vec_df, metric):
    q = [1.0, 0.5, 0.0]
    got = [r["vec_id"] for r in knn(vec_df, q, k=3, metric=metric).collect()]
    x = np.array([[1, 0, 0], [0, 1, 0], [1, 1, 0], [2, 0, 0], [-1, 0, 0]], dtype=float)
    qv = np.array(q)
    if metric == "l2":
        d = np.linalg.norm(x - qv, axis=1)
    elif metric == "dot":
        d = -(x @ qv)
    else:
        d = 1 - (x @ qv) / (np.linalg.norm(x, axis=1) * np.linalg.norm(qv))
    want = list(np.argsort(np.round(d, 6), kind="stable")[:3])
    assert got == [int(i) for i in want]


def test_knn_filter(spark, vec_df):
    got = knn(vec_df, [1.0, 0.0, 0.0], k=5, metric="l2", filter="label = 1").collect()
    assert {r["vec_id"] for r in got} == {2, 3}


def test_knn_join_per_query_topk(spark, vec_df):
    queries = vec_df.filter("vec_id <= 1").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = vec_df.filter("vec_id > 1")
    out = knn_join(queries, corpus, k=2, query_id="query_id").collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert len(by_q[0]) == 2 and len(by_q[1]) == 2
    # query 0 = [1,0,0]: nearest corpus by cosine are 3 ([2,0,0], cos=1) then 2
    assert by_q[0] == [3, 2]


def test_similarity_column(spark, vec_df):
    row = knn(vec_df, [1.0, 0.0, 0.0], k=1, metric="cosine").first()
    assert row["similarity"] == 1.0 and row["distance"] == 0.0
