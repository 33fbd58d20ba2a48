"""IVF_FLAT / IVF_PQ build + search — mirrors LanceIndexBuilderTest.
Recall is measured against brute force on the real embeddings table."""

import numpy as np
import pytest

from lance_flink_spark.index.ivf import IVFIndex, build_hnsw
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
def flat_idx(spark, emb, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ivf")) + "/flat"
    return IVFIndex.build(spark, emb, p, nlist=8, sample_size=1000)


def _ids(df):
    return [r["vec_id"] for r in df.collect()]


def test_ivf_flat_exact_when_probing_all(spark, emb, qvec, flat_idx):
    got = _ids(flat_idx.search(spark, qvec, k=10, nprobes=8, metric="l2"))
    want = _ids(knn(emb, qvec, k=10, metric="l2"))
    assert got == want


def test_ivf_flat_recall_with_partial_probes(spark, emb, qvec, flat_idx):
    got = set(_ids(flat_idx.search(spark, qvec, k=10, nprobes=3, metric="l2")))
    want = set(_ids(knn(emb, qvec, k=10, metric="l2")))
    assert len(got & want) >= 6  # recall@10 ≥ 0.6 probing 3/8 lists


def test_ivf_cosine_and_dot_exact_when_probing_all(spark, emb, qvec, flat_idx):
    """Metric-aware probing: cosine/dot searches rank centroids under
    the same metric, and probing all lists is exact for any metric."""
    for metric in ("cosine", "dot"):
        got = _ids(flat_idx.search(spark, qvec, k=10, nprobes=8, metric=metric))
        want = _ids(knn(emb, qvec, k=10, metric=metric))
        assert got == want, metric


def test_ivf_search_filter(spark, emb, qvec, flat_idx):
    got = flat_idx.search(spark, qvec, k=5, nprobes=8, metric="l2", filter="label = 1")
    assert all(r["label"] == 1 for r in got.collect())


def test_ivf_pq_refine_recall(spark, emb, qvec, tmp_path_str):
    idx = IVFIndex.build(
        spark, emb, tmp_path_str + "/pq", nlist=8, pq_sub_vectors=8, pq_bits=4,
        sample_size=1000,
    )
    got = set(_ids(idx.search_pq(spark, qvec, k=10, nprobes=8, refine_factor=4)))
    want = set(_ids(knn(emb, qvec, k=10, metric="l2")))
    assert len(got & want) >= 7  # ADC shortlist + exact refine


def test_ivf_pq_adc_without_refine(spark, emb, qvec, tmp_path_str):
    idx = IVFIndex.build(
        spark, emb, tmp_path_str + "/pq2", nlist=4, pq_sub_vectors=8, pq_bits=4,
        sample_size=1000,
    )
    out = idx.search_pq(spark, qvec, k=10, nprobes=4, refine_factor=None)
    assert out.count() == 10
    assert "distance" in out.columns


def test_incremental_add_is_searchable(spark, emb, qvec, tmp_path_str):
    """Vectors appended after the build must be findable, with results
    equal to an index built over the full data (same centroids, exact
    search probing all lists)."""
    first = emb.filter("vec_id < 400")
    rest = emb.filter("vec_id >= 400")
    idx = IVFIndex.build(spark, first, tmp_path_str + "/inc", nlist=8, sample_size=1000)
    idx.add(spark, rest)
    got = _ids(idx.search(spark, qvec, k=10, nprobes=8, metric="l2"))
    want = _ids(knn(emb, qvec, k=10, metric="l2"))
    assert got == want


def test_distributed_kmeans_build_searchable(spark, emb, qvec, tmp_path_str):
    """pyspark.ml-trained centroids: same layout, exact search when
    probing all lists."""
    idx = IVFIndex.build(
        spark, emb, tmp_path_str + "/dk", nlist=8, distributed_kmeans=True
    )
    got = _ids(idx.search(spark, qvec, k=10, nprobes=8, metric="l2"))
    want = _ids(knn(emb, qvec, k=10, metric="l2"))
    assert got == want


def test_kmeans_deterministic():
    from lance_flink_spark.index.ivf import _kmeans

    x = np.random.RandomState(0).randn(200, 8)
    assert np.allclose(_kmeans(x, 4), _kmeans(x, 4))


def test_pq_requires_divisible_dim(spark, emb, tmp_path_str):
    with pytest.raises(ValueError):
        IVFIndex.build(spark, emb, tmp_path_str + "/bad", nlist=4, pq_sub_vectors=7)


def test_hnsw_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        build_hnsw()
