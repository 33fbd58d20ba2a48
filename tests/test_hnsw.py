"""IVF_HNSW: per-list HNSW graphs (LanceIndexBuilder.java:141-186,
index.m / index.ef-construction / vector.ef). Recall measured against
brute force on the real embeddings table; determinism pinned on the
serialized blobs."""

import numpy as np
import pytest

from lance_flink_spark.index.hnsw import (
    HNSWIndex,
    build_graph,
    deserialize_graph,
    search_graph,
    serialize_graph,
)
from lance_flink_spark.operators.similarity import knn
from lance_flink_spark.registry import table

from conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def qvec(spark, emb):
    return [float(x) for x in emb.filter("vec_id = 7").select("embedding").first()[0]]


@pytest.fixture(scope="module")
def hnsw_idx(spark, emb, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("hnsw")) + "/idx"
    return HNSWIndex.build(
        spark, emb, p, nlist=4, m=16, ef_construction=64, sample_size=1000
    )


def _ids(df):
    return [r["vec_id"] for r in df.collect()]


def _recall(got, true):
    return len(set(got) & set(true)) / len(true)


def test_hnsw_recall_all_lists(spark, emb, qvec, hnsw_idx):
    """Probing every list isolates pure graph recall: >= 0.9@10."""
    true = _ids(knn(emb, qvec, k=10, metric="l2"))
    got = _ids(hnsw_idx.search(spark, qvec, k=10, nprobes=4, ef=64))
    assert _recall(got, true) >= 0.9


def test_hnsw_distances_exact_on_returned_rows(spark, emb, qvec, hnsw_idx):
    """Approximation only affects WHICH rows surface; every returned
    distance is exact (rescored from the blob's own vectors)."""
    brute = {r["vec_id"]: r["distance"] for r in knn(emb, qvec, k=500, metric="l2").collect()}
    for r in hnsw_idx.search(spark, qvec, k=10, nprobes=4, ef=64).collect():
        assert abs(r["distance"] - brute[r["vec_id"]]) < 1e-5


def test_hnsw_partial_probes_still_k_rows(spark, emb, qvec, hnsw_idx):
    out = hnsw_idx.search(spark, qvec, k=10, nprobes=2, ef=32)
    assert out.count() == 10


def test_hnsw_cosine_recall(spark, emb, qvec, hnsw_idx):
    """L2 navigation + cosine rescoring of the ef beam: recall gate is
    looser than l2 but must stay useful."""
    true = _ids(knn(emb, qvec, k=10, metric="cosine"))
    got = _ids(hnsw_idx.search(spark, qvec, k=10, nprobes=4, ef=128, metric="cosine"))
    assert _recall(got, true) >= 0.7


def test_graph_build_deterministic_and_roundtrips():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((200, 16)).astype(np.float32)
    ids = np.arange(200, dtype=np.int64) * 7 + 1
    b1 = serialize_graph(build_graph(ids, x, m=8, ef_construction=32))
    b2 = serialize_graph(build_graph(ids, x, m=8, ef_construction=32))
    assert b1 == b2
    g = deserialize_graph(b1)
    assert serialize_graph(g) == b1
    q = rng.standard_normal(16)
    beam = search_graph(g, q, ef=32)
    true = np.argsort(((x.astype(np.float64) - q) ** 2).sum(1))[:10]
    got = {nd for _, nd in beam[:10]}
    assert len(got & set(true.tolist())) >= 9


def test_graph_degree_bounded():
    """Shrink keeps layer-0 degree <= 2m, upper layers <= m — the
    memory/IO bound that makes per-list blobs predictable at scale."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((300, 8)).astype(np.float32)
    ids = np.arange(300, dtype=np.int64)
    g = build_graph(ids, x, m=6, ef_construction=24)
    for i in range(300):
        for lc in range(int(g.levels[i]) + 1):
            assert len(g.nbrs[i][lc]) <= (12 if lc == 0 else 6)


def test_hnsw_via_options_surface(spark, emb, qvec, tmp_path_str):
    """index.type=IVF_HNSW builds real graphs and vector.ef drives the
    search beam (LanceOptions.java:169-234 key surface)."""
    from lance_flink_spark.index.options import build_index_from_options, search_index_with_options

    opts = {
        "index.type": "IVF_HNSW",
        "index.num-partitions": "4",
        "index.m": "8",
        "index.ef-construction": "48",
    }
    path = tmp_path_str + "/hidx"
    build_index_from_options(spark, emb, path, opts)
    true = _ids(knn(emb, qvec, k=10, metric="l2"))
    got = _ids(
        search_index_with_options(
            spark, path, qvec, 10, {**opts, "vector.ef": "64", "vector.nprobes": "4"}
        )
    )
    assert _recall(got, true) >= 0.9


def test_hnsw_incremental_add_rebuilds_only_touched_lists(spark, emb, qvec, tmp_path_str):
    """Vectors added after build are findable; only their lists'
    graph partitions are rewritten (untouched blob files survive)."""
    import glob
    import os

    from pyspark.sql import functions as F

    path = tmp_path_str + "/inc"
    base = emb.filter("vec_id < 400")
    idx = HNSWIndex.build(spark, base, path, nlist=4, m=8, ef_construction=32, sample_size=1000)
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(path + "/graphs/centroid_id=*/*.parquet")
    }
    newbies = emb.filter("vec_id >= 400").withColumn(
        "embedding", F.col("embedding")
    )
    n_rebuilt = idx.add(spark, newbies)
    assert 1 <= n_rebuilt <= 4
    # a newly added vector's exact-match query returns it at distance 0
    nv = [float(x) for x in emb.filter("vec_id = 450").select("embedding").first()[0]]
    top = idx.search(spark, nv, k=1, nprobes=4, ef=32).collect()[0]
    assert top["vec_id"] == 450 and top["distance"] < 1e-6
    if n_rebuilt < 4:
        untouched = [p for p in before if os.path.exists(p)]
        assert untouched  # dynamic overwrite left other partitions alone


def test_hnsw_cosine_native_build(spark, emb, qvec, tmp_path_str):
    """metric=cosine stores normalized vectors: navigation order IS
    cosine order, recall gate matches the l2 one (0.9, vs 0.7 for the
    l2-built rescore path); l2 searches on it are refused."""
    path = tmp_path_str + "/cos"
    idx = HNSWIndex.build(
        spark, emb, path, nlist=4, m=16, ef_construction=64,
        metric="cosine", sample_size=1000,
    )
    true = _ids(knn(emb, qvec, k=10, metric="cosine"))
    got = _ids(idx.search(spark, qvec, k=10, nprobes=4, ef=64, metric="cosine"))
    assert _recall(got, true) >= 0.9
    # distances are true cosine distances vs the ORIGINAL vectors
    brute = {r["vec_id"]: r["distance"] for r in knn(emb, qvec, k=500, metric="cosine").collect()}
    for r in idx.search(spark, qvec, k=10, nprobes=4, ef=64, metric="cosine").collect():
        assert abs(r["distance"] - brute[r["vec_id"]]) < 1e-5
    with pytest.raises(ValueError, match="metric=cosine"):
        idx.search(spark, qvec, k=5, metric="l2")


def test_hnsw_knn_join_recall_vs_brute(spark, emb, hnsw_idx):
    """Batch ANN join through the graphs: probing all 4 lists with a
    wide beam recovers >= 0.9 of the brute top-3 per query, and every
    returned distance is exact."""
    from pyspark.sql import functions as F

    from lance_flink_spark.operators.similarity import knn_join

    queries = emb.filter("vec_id < 20").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = hnsw_idx.knn_join(spark, queries, k=3, nprobes=4, ef=64)
    assert got.groupBy("query_id").count().filter("count = 3").count() == 20
    brute = knn_join(queries, emb, k=3, metric="l2")
    g = {(r["query_id"], r["neighbor_id"]): r["distance"] for r in got.collect()}
    b = {(r["query_id"], r["neighbor_id"]): r["distance"] for r in brute.collect()}
    hits = set(g) & set(b)
    assert len(hits) / len(b) >= 0.9
    assert all(abs(g[key] - b[key]) < 1e-5 for key in hits)


def test_hnsw_compact_after_adds_search_unchanged(spark, emb, qvec, tmp_path_str):
    """HNSWIndex.compact defrags the IVF lists side; graph blobs are
    untouched and search returns identical results before/after."""
    path = tmp_path_str + "/cmp"
    idx = HNSWIndex.build(
        spark, emb.filter("vec_id < 400"), path, nlist=4, m=8,
        ef_construction=32, sample_size=1000,
    )
    idx.add(spark, emb.filter("vec_id >= 400"))
    before = _ids(idx.search(spark, qvec, k=10, nprobes=4, ef=64))
    assert idx.compact(spark)  # the added lists were fragmented
    assert _ids(idx.search(spark, qvec, k=10, nprobes=4, ef=64)) == before


def test_hnsw_pending_marker_blocks_search_until_repair(spark, emb, qvec, tmp_path_str):
    """An add() interrupted between the list append and the graph
    rebuild leaves graphs/ stale. The pending marker makes search
    refuse (instead of silently missing the appended vectors), and
    repair() rebuilds exactly the drifted lists and clears the marker."""
    import pytest

    from lance_flink_spark.index.ivf import META
    from lance_flink_spark.sources import fsio

    path = tmp_path_str + "/pend"
    idx = HNSWIndex.build(
        spark, emb.filter("vec_id < 400"), path, nlist=4, m=8,
        ef_construction=32, sample_size=1000,
    )
    # simulate the crash: marker committed + lists appended, graphs stale
    meta = fsio.read_json(fsio.join(path, META))
    meta["hnsw_graphs_pending"] = True
    fsio.write_json_atomic(fsio.join(path, META), meta)
    touched = idx.ivf.add(spark, emb.filter("vec_id >= 400"))

    with pytest.raises(RuntimeError, match="repair"):
        idx.search(spark, qvec, k=5)
    with pytest.raises(RuntimeError, match="repair"):
        idx.knn_join(spark, emb.limit(2).selectExpr("vec_id as query_id", "embedding"), k=2)

    rebuilt = idx.repair(spark)
    assert rebuilt == sorted(touched)  # only the drifted lists
    # marker cleared, appended vector now visible at distance 0
    nv = [float(x) for x in emb.filter("vec_id = 450").select("embedding").first()[0]]
    top = idx.search(spark, nv, k=1, nprobes=4, ef=32).collect()[0]
    assert top["vec_id"] == 450 and top["distance"] < 1e-6
    assert idx.repair(spark) == []  # idempotent: nothing left to fix


def test_max_level_cap_binds_and_search_still_works(spark, tmp_path_str):
    """index.max-level (LanceOptions): capped builds keep every level
    <= cap, search stays exact at full probes on this corpus."""
    from lance_flink_spark.index.hnsw import HNSWIndex, deserialize_graph
    from lance_flink_spark.operators.similarity import knn
    from lance_flink_spark.registry import table

    from conftest import SF_DIR

    emb = table(spark, SF_DIR, "embeddings")
    idx = HNSWIndex.build(
        spark, emb, tmp_path_str + "/hcap", nlist=4, m=4,
        ef_construction=64, max_level=0,
    )
    import glob

    for f in glob.glob(idx.path + "/graphs/*/*.parquet"):
        for row in spark.read.parquet(f).collect():
            g = deserialize_graph(row["graph"])
            assert g.max_level <= 0
    qv = [float(x) for x in emb.filter("vec_id = 7").select("embedding").first()[0]]
    got = [r["vec_id"] for r in idx.search(spark, qv, k=10, nprobes=4, ef=500).collect()]
    want = [r["vec_id"] for r in knn(emb, qv, k=10, metric="l2").collect()]
    assert len(set(got) & set(want)) >= 9
