"""Reference option-surface → index build/search mapping
(LanceOptions.java:118-238; flink-sql-demo.sql IVF_HNSW demo)."""

import pytest

from lance_flink_spark.index.options import (
    build_args_from_options,
    build_index_from_options,
    search_args_from_options,
    search_index_with_options,
)
from lance_flink_spark.operators.similarity import knn
from lance_flink_spark.registry import table

from conftest import SF_DIR

HNSW_DEMO = {
    "index.type": "IVF_HNSW",
    "index.column": "embedding",
    "index.num-partitions": "8",  # demo uses 256; 8 fits the test corpus
    "index.max-level": "7",
    "index.m": "16",
    "index.ef-construction": "100",
    "vector.metric": "COSINE",
}


def test_build_args_mapping():
    assert build_args_from_options(
        {"index.type": "IVF_FLAT", "index.num-partitions": "32"}
    ) == {"vec_col": "embedding", "nlist": 32}
    pq = build_args_from_options(
        {"index.type": "IVF_PQ", "index.num-sub-vectors": "4", "index.num-bits": "4"}
    )
    assert pq["pq_sub_vectors"] == 4 and pq["pq_bits"] == 4 and pq["nlist"] == 256
    hnsw = build_args_from_options(HNSW_DEMO)
    assert hnsw["nlist"] == 8
    assert hnsw["m"] == 16 and hnsw["ef_construction"] == 100  # real graph knobs
    with pytest.raises(ValueError):
        build_args_from_options({"index.type": "DISKANN"})


def test_search_args_mapping():
    # HNSW: vector.ef drives the layer-0 beam; nprobes defaults to the
    # reference's own 20 (>= nlist probes everything)
    args = search_args_from_options(HNSW_DEMO)
    assert args == {"metric": "cosine", "nprobes": 20, "ef": 100}
    # explicit vector.nprobes / vector.ef / vector.refine-factor win
    args = search_args_from_options(
        {**HNSW_DEMO, "vector.nprobes": "8", "vector.ef": "64"}
    )
    assert args["nprobes"] == 8 and args["ef"] == 64
    args = search_args_from_options(
        {"index.type": "IVF_PQ", "vector.refine-factor": "5"}
    )
    assert args["refine_factor"] == 5 and "ef" not in args


def test_hnsw_demo_options_recall_vs_brute_force(spark, tmp_path_str):
    """The demo config builds REAL per-list graphs; with nprobes(=20)
    >= nlist(=8) and a wide beam, recall@10 under cosine >= 0.9 on the
    real embeddings table."""
    emb = table(spark, SF_DIR, "embeddings")
    idx = build_index_from_options(spark, emb, tmp_path_str + "/hnsw", HNSW_DEMO)
    q = [float(x) for x in emb.filter("vec_id = 3").select("embedding").first()[0]]
    got = [r["vec_id"] for r in search_index_with_options(spark, idx, q, 10, HNSW_DEMO).collect()]
    want = [r["vec_id"] for r in knn(emb, q, k=10, metric="cosine").collect()]
    assert len(set(got) & set(want)) >= 9


def test_hnsw_partial_beam_recall(spark, tmp_path_str):
    """Narrow search (nprobes=3 of 8, ef=32): recall@10 must stay
    useful, mirroring HNSW's ef/recall trade."""
    emb = table(spark, SF_DIR, "embeddings")
    idx = build_index_from_options(spark, emb, tmp_path_str + "/hnsw2", HNSW_DEMO)
    q = [float(x) for x in emb.filter("vec_id = 3").select("embedding").first()[0]]
    opts = {**HNSW_DEMO, "vector.nprobes": "3", "vector.ef": "32"}
    got = {r["vec_id"] for r in search_index_with_options(spark, idx, q, 10, opts).collect()}
    want = {r["vec_id"] for r in knn(emb, q, k=10, metric="cosine").collect()}
    assert len(got & want) >= 6


def test_search_options_accepts_path_for_flat_index(spark, tmp_path_str):
    """A string index path dispatches on the index's OWN metadata:
    flat/PQ paths must not be wrapped as HNSW."""
    emb = table(spark, SF_DIR, "embeddings")
    opts = {"index.type": "IVF_FLAT", "index.num-partitions": "8"}
    build_index_from_options(spark, emb, tmp_path_str + "/flat", opts)
    q = [float(x) for x in emb.filter("vec_id = 3").select("embedding").first()[0]]
    got = [
        r["vec_id"]
        for r in search_index_with_options(
            spark, tmp_path_str + "/flat", q, 10, {**opts, "vector.nprobes": "8"}
        ).collect()
    ]
    want = [r["vec_id"] for r in knn(emb, q, k=10, metric="l2").collect()]
    assert got == want
