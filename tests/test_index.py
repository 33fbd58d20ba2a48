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


def test_distributed_pq_training_searchable(spark, emb, qvec, tmp_path_str):
    """distributed_kmeans=True trains PQ codebooks distributed too
    (_train_pq_distributed); ADC + refine must still find the true
    neighbors. Converged training (the trainer's default iters):
    distributed k-means is input-layout-sensitive (float aggregation
    order, k-means|| sampling), and half-converged codebooks on a
    500-vector sample sit at the recall gate's flake boundary — a
    scan-split change once moved this from 8/10 to 6/10 at 5 iters."""
    idx = IVFIndex.build(
        spark, emb, tmp_path_str + "/dpq", nlist=8, pq_sub_vectors=8,
        pq_bits=4, distributed_kmeans=True, kmeans_iters=15,
    )
    got = set(_ids(idx.search_pq(spark, qvec, k=10, nprobes=8, refine_factor=12)))
    want = set(_ids(knn(emb, qvec, k=10, metric="l2")))
    assert len(got & want) >= 8


def test_kmeans_deterministic():
    from lance_flink_spark.index.ivf import _kmeans

    x = np.random.RandomState(0).randn(200, 8)
    assert np.allclose(_kmeans(x, 4), _kmeans(x, 4))


def test_kmeans_chunked_matches_unchunked():
    """The chunked distance expansion must give the same assignment as
    a direct computation (modulo fp ties)."""
    from lance_flink_spark.index.ivf import _assign_chunked

    rng = np.random.RandomState(1)
    x, c = rng.randn(500, 16), rng.randn(32, 16)
    assign, mind2 = _assign_chunked(x, c, chunk=64)
    d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    assert (assign == d.argmin(1)).all()
    assert np.allclose(mind2, d.min(1))


def test_kmeans_high_nlist_bounded_memory():
    """Driver-side k-means at production-ish nlist: 100k vectors,
    nlist=1024 — the r1 formulation needed an n×k×dim temp (~100 GB
    here in float64); the chunked path peaks at chunk×k (~64 MB).
    Completing under rlimit-enforced 4 GB address-space growth proves
    the bound; centroid count and finiteness prove the math ran."""
    import resource

    from lance_flink_spark.index.ivf import _kmeans

    x = np.random.RandomState(2).randn(100_000, 32)
    soft, hard = resource.getrlimit(resource.RLIMIT_AS)
    vm_size = 0
    with open("/proc/self/status") as f:  # current virtual size (linux)
        for line in f:
            if line.startswith("VmSize:"):
                vm_size = int(line.split()[1]) * 1024
    budget = vm_size + int(4 * 2**30)  # headroom ≪ the ~100 GB naive temp
    try:
        resource.setrlimit(resource.RLIMIT_AS, (budget, hard))
    except (ValueError, OSError):
        budget = None  # can't lower the limit in this environment
    try:
        c = _kmeans(x, 1024, iters=3)
    finally:
        if budget is not None:
            resource.setrlimit(resource.RLIMIT_AS, (soft, hard))
    assert c.shape == (1024, 32)
    assert np.isfinite(c).all()


def test_distributed_build_high_nlist_auto(spark, tmp_path_str):
    """nlist>512 auto-selects the distributed (pyspark.ml) training
    path and the index stays searchable: 100k synthetic vectors,
    nlist=1024 inverted lists, exact match vs brute force when probing
    every list."""
    import pandas as pd

    rng = np.random.RandomState(3)
    vecs = rng.randn(100_000, 16).astype(np.float64)
    pdf = pd.DataFrame({"vec_id": np.arange(len(vecs)), "embedding": list(vecs)})
    df = spark.createDataFrame(pdf).cache()
    idx = IVFIndex.build(
        spark, df, tmp_path_str + "/big", nlist=1024, kmeans_iters=2
    )
    q = [float(v) for v in vecs[123]]
    got = _ids(idx.search(spark, q, k=5, nprobes=1024, metric="l2"))
    want = _ids(knn(df, q, k=5, metric="l2"))
    df.unpersist()
    assert got == want


def test_pq_requires_divisible_dim(spark, emb, tmp_path_str):
    with pytest.raises(ValueError):
        IVFIndex.build(spark, emb, tmp_path_str + "/bad", nlist=4, pq_sub_vectors=7)


def test_build_hnsw_delegates_to_graph_index(spark, emb, qvec, tmp_path_str):
    idx = build_hnsw(spark, emb, tmp_path_str + "/h", nlist=4, m=8, sample_size=1000)
    assert idx.search(spark, qvec, k=5, nprobes=4, ef=32).count() == 5


def test_index_on_hadoop_scheme(spark, emb, qvec, tmp_path_str):
    """Index artifacts (centroids/codebooks/meta npy+json) round-trip
    through the JVM Hadoop FileSystem: build + incremental add + search
    entirely under a viewfs:// root, like datasets and catalogs
    (mirrors test_dataset.py::test_dataset_on_hadoop_scheme)."""
    spark._jsc.hadoopConfiguration().set(
        "fs.viewfs.mounttable.idxcluster.link./idx", "file://" + tmp_path_str
    )
    p = "viewfs://idxcluster/idx/flat_remote"
    idx = IVFIndex.build(spark, emb, p, nlist=8, sample_size=1000)
    got = _ids(idx.search(spark, qvec, k=10, nprobes=8, metric="l2"))
    want = _ids(knn(emb, qvec, k=10, metric="l2"))
    assert got == want

    pq = IVFIndex.build(
        spark, emb, "viewfs://idxcluster/idx/pq_remote",
        nlist=8, pq_sub_vectors=8, sample_size=1000,
    )
    top = _ids(pq.search_pq(spark, qvec, k=5, nprobes=8, refine_factor=8))
    assert qvec is not None and len(top) == 5


def test_ivf_pq_metric_aware_search(spark, emb, qvec, tmp_path_str):
    """IVF_PQ honors vector.metric: cosine/dot ADC + refine recover
    most of the brute-force top-k under the SAME metric, and the three
    metrics rank differently on this corpus (so the plumbing is not a
    silent L2 fallback)."""
    idx = IVFIndex.build(
        spark, emb, tmp_path_str + "/pqm", nlist=8, pq_sub_vectors=8, pq_bits=4,
        sample_size=1000,
    )
    for metric in ("cosine", "dot"):
        got = set(_ids(idx.search_pq(spark, qvec, k=10, nprobes=8,
                                     refine_factor=4, metric=metric)))
        want = set(_ids(knn(emb, qvec, k=10, metric=metric)))
        assert len(got & want) >= 7, metric

    from lance_flink_spark.index.options import search_index_with_options

    via_opts = _ids(search_index_with_options(
        spark, idx, qvec, 10,
        {"index.type": "IVF_PQ", "vector.metric": "cosine", "vector.nprobes": "8"},
    ))
    direct = _ids(idx.search_pq(spark, qvec, k=10, nprobes=8, metric="cosine"))
    assert via_opts == direct


@pytest.fixture(scope="module")
def recall_corpus(spark):
    """Fixed-seed clustered corpus (mixture of 64 Gaussians in 64-d,
    the shape real embedding families have) + 8 held-out queries."""
    rng = np.random.RandomState(0)
    centers = rng.randn(64, 64) * 2.0
    assign = rng.randint(0, 64, size=2000)
    x = centers[assign] + rng.randn(2000, 64) * 0.35
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(2000)],
        "vec_id long, embedding array<double>",
    ).coalesce(4).cache()
    df.count()
    queries = [
        [float(v) for v in (centers[j] + rng.randn(64) * 0.35)] for j in range(8)
    ]
    return df, queries


def _recall_at10(spark, corpus, queries, search_fn):
    hits = total = 0
    for qv in queries:
        want = set(_ids(knn(corpus, qv, k=10, metric="l2")))
        got = set(_ids(search_fn(qv)))
        hits += len(want & got)
        total += 10
    return hits / total


def test_recall_gate_ivf_flat(spark, recall_corpus, tmp_path_str):
    """Quantified recall gate: IVF_FLAT at nprobes=20/nlist=256 must
    reach recall@10 >= 0.9 vs brute force on the fixed-seed corpus."""
    corpus, queries = recall_corpus
    idx = IVFIndex.build(
        spark, corpus, tmp_path_str + "/flat256", nlist=256, sample_size=2000,
        distributed_kmeans=False,
    )
    r = _recall_at10(
        spark, corpus, queries,
        lambda qv: idx.search(spark, qv, k=10, nprobes=20, metric="l2"),
    )
    assert r >= 0.9, f"IVF_FLAT recall@10 {r:.3f} < 0.9"


def test_recall_gate_ivf_pq_and_opq(spark, recall_corpus, tmp_path_str):
    """Quantified recall gate: IVF_PQ (+ exact refine) must reach
    recall@10 >= 0.8; the OPQ-rotated build must be no worse than
    plain PQ minus noise (the knob is neutral-or-better)."""
    corpus, queries = recall_corpus
    plain = IVFIndex.build(
        spark, corpus, tmp_path_str + "/pq256", nlist=64, pq_sub_vectors=8,
        pq_bits=4, sample_size=2000, distributed_kmeans=False,
    )
    opq = IVFIndex.build(
        spark, corpus, tmp_path_str + "/opq256", nlist=64, pq_sub_vectors=8,
        pq_bits=4, sample_size=2000, distributed_kmeans=False, opq=True,
    )
    r_plain = _recall_at10(
        spark, corpus, queries,
        lambda qv: plain.search_pq(spark, qv, k=10, nprobes=16, refine_factor=4),
    )
    r_opq = _recall_at10(
        spark, corpus, queries,
        lambda qv: opq.search_pq(spark, qv, k=10, nprobes=16, refine_factor=4),
    )
    assert r_plain >= 0.8, f"IVF_PQ recall@10 {r_plain:.3f} < 0.8"
    assert r_opq >= 0.8, f"IVF_PQ+OPQ recall@10 {r_opq:.3f} < 0.8"
    assert r_opq >= r_plain - 0.05, (r_opq, r_plain)
    # ADC-only (no exact refine) exposes raw code quality — the
    # sensitive measurement for the rotation knob
    a_plain = _recall_at10(
        spark, corpus, queries,
        lambda qv: plain.search_pq(spark, qv, k=10, nprobes=16, refine_factor=None),
    )
    a_opq = _recall_at10(
        spark, corpus, queries,
        lambda qv: opq.search_pq(spark, qv, k=10, nprobes=16, refine_factor=None),
    )
    assert a_opq >= a_plain - 0.1, (a_opq, a_plain)
    print(f"recall@10 refine: pq={r_plain:.3f} opq={r_opq:.3f}; "
          f"adc-only: pq={a_plain:.3f} opq={a_opq:.3f}")


def test_ivf_knn_join_exact_at_full_probes_and_never_cross(spark, emb, qvec, flat_idx):
    """Index-routed batch KNN join: exact vs brute knn_join at
    nprobes=nlist, and the plan is a hash join on centroid_id — no
    BroadcastNestedLoop/cartesian over the corpus."""
    from pyspark.sql import functions as F

    from lance_flink_spark.operators.similarity import knn_join

    queries = emb.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = flat_idx.knn_join(spark, queries, k=3, nprobes=8, metric="l2")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    brute = knn_join(queries, emb, k=3, metric="l2")
    g = {(r["query_id"], r["rn"]): r["neighbor_id"] for r in got.collect()}
    b = {(r["query_id"], r["rn"]): r["neighbor_id"] for r in brute.collect()}
    assert g == b


def test_ivf_knn_join_partial_probes_recall(spark, emb, flat_idx):
    """nprobes=4 of 8: each query still gets k rows and most true
    neighbors (the query's own list holds its nearest vectors)."""
    from pyspark.sql import functions as F

    from lance_flink_spark.operators.similarity import knn_join

    queries = emb.filter("vec_id < 20").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = flat_idx.knn_join(spark, queries, k=3, nprobes=4, metric="l2")
    assert got.groupBy("query_id").count().filter("count = 3").count() == 20
    brute = knn_join(queries, emb, k=3, metric="l2")
    g = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
    b = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    assert len(g & b) / len(b) >= 0.8


def test_compact_lists_after_incremental_adds(spark, emb, qvec, tmp_path_str):
    """Two adds fragment the touched list partitions (one appended
    file each); compact_lists rewrites exactly those down to one file
    per partition, leaves un-fragmented lists alone, preserves every
    row, and search results are unchanged."""
    import glob
    import os

    from lance_flink_spark.sources import fsio

    p = tmp_path_str + "/cmp"
    idx = IVFIndex.build(
        spark, emb.filter("vec_id < 300"), p, nlist=8, sample_size=1000
    )
    idx.add(spark, emb.filter("vec_id >= 300 and vec_id < 400"))
    idx.add(spark, emb.filter("vec_id >= 400"))

    def files_per_part():
        out = {}
        for d in fsio.listdir(p + "/lists"):
            if d.startswith("centroid_id="):
                out[d] = len(glob.glob(os.path.join(p, "lists", d, "*.parquet")))
        return out

    before = files_per_part()
    assert max(before.values()) >= 3  # build + 2 adds hit some list
    rows_before = spark.read.parquet(p + "/lists").count()

    compacted = idx.compact_lists(spark)
    assert compacted == sorted(
        int(d.split("=")[1]) for d, n in before.items() if n >= 2
    )
    after = files_per_part()
    for d, n in after.items():
        if int(d.split("=")[1]) in compacted:
            assert n == 1
        else:
            assert n == before[d]
    assert spark.read.parquet(p + "/lists").count() == rows_before
    got = _ids(idx.search(spark, qvec, k=10, nprobes=8, metric="l2"))
    want = _ids(knn(emb, qvec, k=10, metric="l2"))
    assert got == want
    # idempotent: nothing left above the threshold
    assert idx.compact_lists(spark) == []


def test_compact_heals_interrupted_swap(spark, emb, qvec, tmp_path_str):
    """Crash-recovery contract of the staged compact swap: a hidden
    .compact-old backup with no live partition (crash between the two
    renames) is restored on the next compact_lists call; one WITH a
    live partition (crash before the backup drop) is discarded."""
    from lance_flink_spark.sources import fsio

    p = tmp_path_str + "/heal"
    idx = IVFIndex.build(spark, emb, p, nlist=8, sample_size=1000)
    base = p + "/lists"
    parts = sorted(d for d in fsio.listdir(base) if d.startswith("centroid_id="))
    rows_before = spark.read.parquet(base).count()

    # crash case 1: live renamed to backup, staged copy never landed
    fsio.rename(fsio.join(base, parts[0]), fsio.join(base, ".compact-old-" + parts[0]))
    # crash case 2: staged copy landed, backup not yet dropped
    fsio.makedirs(fsio.join(base, ".compact-old-" + parts[1]))

    assert spark.read.parquet(base).count() < rows_before  # partition invisible
    idx.compact_lists(spark)  # heal runs first
    assert sorted(
        d for d in fsio.listdir(base) if d.startswith("centroid_id=")
    ) == parts
    assert not any(d.startswith(".compact-old-") for d in fsio.listdir(base))
    assert spark.read.parquet(base).count() == rows_before
    got = _ids(idx.search(spark, qvec, k=10, nprobes=8, metric="l2"))
    assert got == _ids(knn(emb, qvec, k=10, metric="l2"))


def test_ivf_sq_refine_is_exact_at_full_probe(spark, emb, qvec, tmp_path_str):
    """SQ8 + refine at nprobes=nlist: the uniform 8-bit decode is tight
    enough that the refine shortlist always contains the true top-10 on
    the real embeddings, and the exact re-score restores brute order."""
    idx = IVFIndex.build(
        spark, emb, tmp_path_str + "/sq", nlist=8, sq_bits=8, sample_size=1000
    )
    got = _ids(idx.search_sq(spark, qvec, k=10, nprobes=8, refine_factor=4))
    want = _ids(knn(emb, qvec, k=10, metric="l2"))
    assert got == want


def test_ivf_sq_metrics_and_no_refine(spark, emb, qvec, tmp_path_str):
    idx = IVFIndex.build(
        spark, emb, tmp_path_str + "/sq2", nlist=4, sq_bits=8, sample_size=1000
    )
    for metric in ("l2", "cosine", "dot"):
        got = set(
            _ids(idx.search_sq(spark, qvec, k=10, nprobes=4, metric=metric))
        )
        want = set(_ids(knn(emb, qvec, k=10, metric=metric)))
        assert len(got & want) >= 9, metric
    out = idx.search_sq(spark, qvec, k=10, nprobes=4, refine_factor=None)
    assert out.count() == 10
    assert "distance" in out.columns


def test_ivf_sq_incremental_add(spark, emb, qvec, tmp_path_str):
    half = emb.filter("vec_id < 250")
    rest = emb.filter("vec_id >= 250")
    idx = IVFIndex.build(
        spark, half, tmp_path_str + "/sq3", nlist=4, sq_bits=8, sample_size=1000
    )
    idx.add(spark, rest)
    got = _ids(idx.search_sq(spark, qvec, k=10, nprobes=4, refine_factor=4))
    want = _ids(knn(emb, qvec, k=10, metric="l2"))
    assert len(set(got) & set(want)) >= 9


def test_ivf_sq_pq_mutually_exclusive(spark, emb, tmp_path_str):
    with pytest.raises(ValueError, match="mutually exclusive"):
        IVFIndex.build(
            spark, emb, tmp_path_str + "/bad", nlist=4,
            pq_sub_vectors=8, sq_bits=8, sample_size=100,
        )


def test_ivf_sq_options_surface(spark, emb, qvec, tmp_path_str):
    from lance_flink_spark.index.options import (
        build_index_from_options,
        search_index_with_options,
    )

    opts = {
        "index.type": "IVF_SQ",
        "index.num-partitions": "4",
        "index.num-bits": "8",
        "vector.nprobes": "4",
        "vector.refine-factor": "4",
    }
    idx = build_index_from_options(spark, emb, tmp_path_str + "/sqopt", opts)
    out = search_index_with_options(spark, idx, qvec, 10, opts)
    want = set(_ids(knn(emb, qvec, k=10, metric="l2")))
    assert len(set(_ids(out)) & want) >= 9
