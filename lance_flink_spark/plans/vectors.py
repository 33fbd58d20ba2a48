"""Registry entries for the vector suite (SURVEY §2 #10-16).

The query vector is the embedding of vec_id=0 (fetched as a 1-row
lookup, folded into the plan as a literal); oracles reproduce it with
a scalar subquery so both sides score against identical bytes.
Distances are computed in double and rounded to 6dp on both sides —
the ordering key is the *rounded* distance + vec_id, so cross-engine
fp noise can't reorder the top-k.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lance_flink_spark.index.ivf import IVFIndex
from lance_flink_spark.operators.similarity import knn, knn_join
from lance_flink_spark.registry import query, scratch_dir, table


def _query_vec(spark, sf_dir, vec_id: int = 0) -> list[float]:
    row = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row[0]]


_Q0 = "(SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)"


@query(
    "knn_metrics",
    extra=True,  # gate budget; knn_l2/cosine/dot extras + knn_join cover it
    oracle=f"""
    SELECT 'l2' AS metric, vec_id, distance FROM (
        SELECT vec_id, distance FROM (
            SELECT e.vec_id,
                   ROUND(list_distance(e.embedding::DOUBLE[], q.qv), 6) AS distance
            FROM embeddings e, {_Q0} q)
        ORDER BY distance, vec_id LIMIT 10) l2
    UNION ALL
    SELECT 'cosine' AS metric, vec_id, distance FROM (
        SELECT vec_id, distance FROM (
            SELECT e.vec_id,
                   ROUND(1 - list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS distance
            FROM embeddings e, {_Q0} q)
        ORDER BY distance, vec_id LIMIT 10) cos
    UNION ALL
    SELECT 'dot' AS metric, vec_id, distance FROM (
        SELECT vec_id, distance FROM (
            SELECT e.vec_id,
                   ROUND(-list_inner_product(e.embedding::DOUBLE[], q.qv), 6) AS distance
            FROM embeddings e, {_Q0} q)
        ORDER BY distance, vec_id LIMIT 10) dot
    """,
)
def knn_metrics(spark, sf_dir):
    """Brute-force KNN top-10 under all three reference metrics
    (LanceVectorSearch MetricType L2/COSINE/DOT; SURVEY §2 #10-12) in
    one gate entry. Each branch is an independent TakeOrderedAndProject
    over the corpus scan — per-partition heap, no shuffle; the union is
    free. Single-metric entries remain as extras."""
    df = table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    parts = [
        knn(df, qv, k=10, metric=m)
        .select(F.lit(m).alias("metric"), "vec_id", "distance")
        for m in ("l2", "cosine", "dot")
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "knn_l2",
    extra=True,  # gate-covered by the unioned knn_metrics entry
    oracle=f"""
    SELECT vec_id, distance FROM (
        SELECT e.vec_id,
               ROUND(list_distance(e.embedding::DOUBLE[], q.qv), 6) AS distance
        FROM embeddings e, {_Q0} q)
    ORDER BY distance, vec_id LIMIT 10
    """,
)
def knn_l2(spark, sf_dir):
    """Brute-force KNN, L2 (LanceVectorSearch MetricType.L2)."""
    df = table(spark, sf_dir, "embeddings")
    return knn(df, _query_vec(spark, sf_dir), k=10, metric="l2").select("vec_id", "distance")


@query(
    "knn_cosine",
    extra=True,  # gate-covered by the unioned knn_metrics entry
    oracle=f"""
    SELECT vec_id, distance FROM (
        SELECT e.vec_id,
               ROUND(1 - list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS distance
        FROM embeddings e, {_Q0} q)
    ORDER BY distance, vec_id LIMIT 10
    """,
)
def knn_cosine(spark, sf_dir):
    """Brute-force KNN, cosine distance (MetricType.COSINE)."""
    df = table(spark, sf_dir, "embeddings")
    return knn(df, _query_vec(spark, sf_dir), k=10, metric="cosine").select("vec_id", "distance")


@query(
    "knn_dot",
    extra=True,  # gate-covered by the unioned knn_metrics entry
    oracle=f"""
    SELECT vec_id, distance FROM (
        SELECT e.vec_id,
               ROUND(-list_inner_product(e.embedding::DOUBLE[], q.qv), 6) AS distance
        FROM embeddings e, {_Q0} q)
    ORDER BY distance, vec_id LIMIT 10
    """,
)
def knn_dot(spark, sf_dir):
    """Brute-force KNN, dot product (MetricType.DOT; distance = -dot,
    matching 'higher inner product = closer')."""
    df = table(spark, sf_dir, "embeddings")
    return knn(df, _query_vec(spark, sf_dir), k=10, metric="dot").select("vec_id", "distance")


@query(
    "knn_filtered",
    extra=True,  # r8 rotation: demoted (KNN covered by knn_metrics/knn_join primaries); still extras-oracle-checked
    oracle=f"""
    SELECT vec_id, label, distance FROM (
        SELECT e.vec_id, e.label,
               ROUND(1 - list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS distance
        FROM embeddings e, {_Q0} q
        WHERE e.label = 2)
    ORDER BY distance, vec_id LIMIT 5
    """,
)
def knn_filtered(spark, sf_dir):
    """KNN with SQL pre-filter (LanceVectorSearch.search(query, k,
    filter), LanceVectorSearch.java:133). The predicate applies before
    scoring and reaches the scan."""
    df = table(spark, sf_dir, "embeddings")
    return knn(
        df, _query_vec(spark, sf_dir), k=5, metric="cosine", filter="label = 2"
    ).select("vec_id", "label", "distance")


@query(
    "knn_join",
    extra=True,  # r15 rotation: demoted, full oracle still checked in extras
    oracle="""
    SELECT query_id, neighbor_id, distance, rn FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(1 - list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS distance,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND(1 - list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6),
                            c.vec_id) AS rn
        FROM embeddings q CROSS JOIN embeddings c
        WHERE q.vec_id < 5 AND c.vec_id >= 5) t
    WHERE rn <= 3
    """,
)
def knn_join_entry(spark, sf_dir):
    """Batch KNN join: 5 query vectors × corpus, top-3 each
    (table/LanceVectorSearchFunction.java SQL surface)."""
    e = table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = e.filter(F.col("vec_id") >= 5)
    return knn_join(queries, corpus, k=3, query_id="query_id")


def _ivf_flat(spark, sf_dir) -> IVFIndex:
    tag = sf_dir.rstrip("/").replace("/", "_")
    path = scratch_dir("ivf_flat" + tag)
    import os

    if not os.path.exists(os.path.join(path, "_index_meta.json")):
        IVFIndex.build(
            spark, table(spark, sf_dir, "embeddings"), path, nlist=8, sample_size=100_000
        )
    return IVFIndex(path)


@query(
    "ivf_flat_search",
    extra=True,  # r15 rotation: demoted, full oracle still checked in extras
    oracle=f"""
    SELECT vec_id, distance FROM (
        SELECT e.vec_id,
               ROUND(list_distance(e.embedding::DOUBLE[], q.qv), 6) AS distance
        FROM embeddings e, {_Q0} q)
    ORDER BY distance, vec_id LIMIT 10
    """,
)
def ivf_flat_search(spark, sf_dir):
    """IVF_FLAT build + search (LanceIndexBuilder IVF_FLAT). Probing
    all nlist=8 lists makes the result exact, so the brute-force SQL is
    a valid oracle; bench exercises the nprobes<nlist fast path."""
    idx = _ivf_flat(spark, sf_dir)
    return idx.search(
        spark, _query_vec(spark, sf_dir), k=10, nprobes=8, metric="l2"
    ).select("vec_id", "distance")


@query(
    "two_stage_retrieval",
    extra=True,  # r11 rotation out: retrieval stack driver-graded via ivf_flat_search + exactness twins
    oracle=f"""
    SELECT vec_id, cos_distance FROM (
        SELECT vec_id,
               ROUND(1 - list_cosine_similarity(embedding::DOUBLE[], qv), 6) AS cos_distance
        FROM (
            SELECT e.vec_id, e.embedding, q.qv,
                   ROUND(list_distance(e.embedding::DOUBLE[], q.qv), 6) AS l2d
            FROM embeddings e, {_Q0} q
            ORDER BY l2d, e.vec_id LIMIT 50) shortlist)
    ORDER BY cos_distance, vec_id LIMIT 10
    """,
)
def two_stage_retrieval(spark, sf_dir):
    """Two-stage retrieval (the production ANN shape): cheap L2
    shortlist (IVF probing all lists → exact, so the SQL shortlist is
    identical) then exact cosine re-rank of the top-50. At scale stage
    1 is the IVF/PQ scan and stage 2 touches only k·refine rows."""
    from lance_flink_spark.functions import vector as V

    idx = _ivf_flat(spark, sf_dir)
    qv = _query_vec(spark, sf_dir)
    shortlist = idx.search(spark, qv, k=50, nprobes=8, metric="l2", keep_vector=True)
    q = F.array(*[F.lit(float(x)) for x in qv])
    return (
        shortlist.select(
            "vec_id",
            F.round(V.cosine_distance(F.col("embedding"), q), 6).alias("cos_distance"),
        )
        .orderBy("cos_distance", "vec_id")
        .limit(10)
    )


def _ivf_pq(spark, sf_dir) -> IVFIndex:
    tag = sf_dir.rstrip("/").replace("/", "_")
    path = scratch_dir("ivf_pq" + tag)
    import os

    if not os.path.exists(os.path.join(path, "_index_meta.json")):
        IVFIndex.build(
            spark,
            table(spark, sf_dir, "embeddings"),
            path,
            nlist=8,
            pq_sub_vectors=8,
            pq_bits=4,
            sample_size=100_000,
        )
    return IVFIndex(path)


def _ivf_hnsw(spark, sf_dir):
    from lance_flink_spark.index.hnsw import HNSWIndex

    tag = sf_dir.rstrip("/").replace("/", "_")
    path = scratch_dir("ivf_hnsw" + tag)
    import os

    if not os.path.exists(os.path.join(path, "graphs", "_SUCCESS")):
        HNSWIndex.build(
            spark,
            table(spark, sf_dir, "embeddings"),
            path,
            nlist=8,
            m=16,
            ef_construction=64,
            sample_size=100_000,
        )
    return HNSWIndex(path)


@query("ivf_pq_search", extra=True)  # rows-only: ADC error is index-specific
def ivf_pq_search(spark, sf_dir):
    """IVF_PQ build + ADC search with exact refine (LanceIndexBuilder
    IVF_PQ, vector.refine-factor). Rows-only check: PQ results at the
    production nprobes/refine are approximate by construction;
    tests/test_index.py asserts recall against brute force, and the
    full-probe/covering-refine twin `ivf_pq_exactness` hash-gates the
    same code path against the brute-force oracle."""
    return _ivf_pq(spark, sf_dir).search_pq(
        spark, _query_vec(spark, sf_dir), k=10, nprobes=8, refine_factor=4
    ).select("vec_id", "distance")


@query(
    "ivf_pq_exactness",
    # primary (r11 rotation): full-oracle twin hash-grades the PQ path in
    # the driver artifact; the production-parameter ivf_pq_search stays
    # runnable as a rows-only extra.
    oracle=f"""
    SELECT vec_id, distance FROM (
        SELECT e.vec_id,
               ROUND(list_distance(e.embedding::DOUBLE[], q.qv), 6) AS distance
        FROM embeddings e, {_Q0} q)
    ORDER BY distance, vec_id LIMIT 10
    """,
)
def ivf_pq_exactness(spark, sf_dir):
    """IVF_PQ exactness twin (the ivf_sq_search pattern): at
    nprobes=nlist every list is probed, and refine_factor = ceil(N/k)
    makes the exact re-rank cover every ADC candidate — so whatever
    the quantization error, the result MUST equal brute-force top-k.
    The full oracle therefore hash-gates the whole PQ machinery
    (centroid routing, OPQ rotation, LUT gather, refine, tie order);
    only the ADC *ranking quality* stays on the recall pytest."""
    idx = _ivf_pq(spark, sf_dir)
    emb = table(spark, sf_dir, "embeddings")
    n = emb.count()  # bounded driver value: one scalar
    return idx.search_pq(
        spark,
        _query_vec(spark, sf_dir),
        k=10,
        nprobes=8,
        refine_factor=-(-n // 10),  # k*rf >= N: refine covers the corpus
    ).select("vec_id", "distance")


@query("ivf_hnsw_search", extra=True)  # rows-only: graph nav is approximate
def ivf_hnsw_search(spark, sf_dir):
    """IVF_HNSW build + beam search (LanceIndexBuilder.java:141-186):
    a real HNSW graph per IVF list built distributed (applyInPandas,
    one task per list), searched via partition-pruned blob scan +
    mapInPandas beam + global top-k. Rows-only check: graph search at
    the production ef is approximate by construction; tests/test_hnsw.py
    gates recall >= 0.9, and the full-beam twin `ivf_hnsw_exactness`
    hash-gates the same code path against the brute-force oracle."""
    return _ivf_hnsw(spark, sf_dir).search(
        spark, _query_vec(spark, sf_dir), k=10, nprobes=8, ef=64
    )


@query(
    "ivf_hnsw_exactness",
    # primary (r11 rotation): full-oracle twin hash-grades the HNSW path
    # in the driver artifact; the production-parameter ivf_hnsw_search
    # stays runnable as a rows-only extra.
    oracle=f"""
    SELECT vec_id, distance FROM (
        SELECT e.vec_id,
               ROUND(list_distance(e.embedding::DOUBLE[], q.qv), 6) AS distance
        FROM embeddings e, {_Q0} q)
    ORDER BY distance, vec_id LIMIT 10
    """,
)
def ivf_hnsw_exactness(spark, sf_dir):
    """IVF_HNSW exactness twin: at nprobes=nlist with ef = N the layer-0
    beam can never evict, so the search visits every reachable node of
    every list's graph and the exact re-score sees the whole corpus —
    brute-force top-k, or a hash mismatch. Gates graph connectivity
    (an unreachable node = a missing row), the beam bookkeeping, the
    per-list rescore, and the global top-k merge; only navigation
    *pruning quality* at small ef stays on the recall pytest."""
    idx = _ivf_hnsw(spark, sf_dir)
    n = table(spark, sf_dir, "embeddings").count()
    return idx.search(
        spark, _query_vec(spark, sf_dir), k=10, nprobes=8, ef=n
    )


@query(
    "ivf_deleted_exactness",
    # r12 rotation: the #223 DV-masked search gets driver-grade evidence
    # (full oracle: masked full-probe == brute over live rows)
    oracle=f"""
    SELECT vec_id, distance FROM (
        SELECT e.vec_id,
               ROUND(list_distance(e.embedding::DOUBLE[], q.qv), 6) AS distance
        FROM embeddings e, {_Q0} q
        WHERE e.vec_id % 7 <> 3)
    ORDER BY distance, vec_id LIMIT 10
    """,
)
def ivf_deleted_exactness(spark, sf_dir):
    """Delete/DV-aware search hash-graded: embeddings land in a
    Dataset, an IVF index is built BOUND to it (entries carry row
    addresses), then rows are DV-deleted — the index is never touched.
    A full-probe search must equal brute force over the LIVE scan: a
    tombstoned id surfacing (mask missed), a live id vanishing (mask
    over-matched), or a distance drift anywhere in the probe →
    anti-join → top-k path breaks the hash. Lance parity: deletion
    files mask indexed row addresses at query time
    (LanceIndexBuilder/LanceVectorSearch never rewrite an index on
    DELETE). Rebuilt from scratch each run so reruns replay the
    identical mutate-then-search history."""
    import os
    import shutil

    from lance_flink_spark.sources.dataset import Dataset

    tag = sf_dir.rstrip("/").replace("/", "_")
    root = scratch_dir("ivf_dv" + tag)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    ds = Dataset(root + "/ds")
    ds.write(table(spark, sf_dir, "embeddings"))
    idx = IVFIndex.build(
        spark, None, root + "/idx", nlist=8, sample_size=100_000, dataset=ds
    )
    ds.delete_where(spark, "vec_id % 7 = 3", dv=True)
    return idx.search(
        spark, _query_vec(spark, sf_dir), k=10, nprobes=8, metric="l2"
    ).select("vec_id", "distance")


@query(
    "ivf_knn_join",
    extra=True,  # gate budget; exact at nprobes=nlist so full oracle
    oracle="""
    SELECT query_id, neighbor_id, distance, rn FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(list_distance(c.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS distance,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND(list_distance(c.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6),
                            c.vec_id) AS rn
        FROM embeddings q CROSS JOIN embeddings c
        WHERE q.vec_id < 5) t
    WHERE rn <= 3
    """,
)
def ivf_knn_join(spark, sf_dir):
    """Batch ANN join THROUGH the IVF index (IVFIndex.knn_join): the
    scale path for per-row top-k — queries explode to their nprobes
    nearest centroids and hash-join the inverted lists on centroid_id
    (co-partitioned, never queries×corpus). Probing all nlist=8 lists
    makes it exact, so the brute-force SQL is a valid oracle; at scale
    nprobes/nlist bounds the scored fraction."""
    idx = _ivf_flat(spark, sf_dir)
    queries = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return idx.knn_join(spark, queries, k=3, nprobes=8, metric="l2")


@query(
    "label_centroids",
    extra=True,  # gate budget; oracle-checks the class-statistics shape
    oracle="""
    WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
    ex AS (SELECT label, o.ord, v[o.ord] AS val
           FROM e, unnest(range(1, len(v) + 1)) AS o(ord)),
    cent AS (
        SELECT label, list(a ORDER BY ord) AS centroid
        FROM (SELECT label, ord, ROUND(AVG(val), 6) AS a
              FROM ex GROUP BY label, ord) GROUP BY label),
    st AS (
        SELECT label, COUNT(*) AS n,
               ROUND(AVG(sqrt(list_aggregate(
                   list_transform(v, x -> x * x), 'sum'))), 6) AS mean_norm
        FROM e GROUP BY label)
    SELECT st.label, n, mean_norm,
           ROUND(sqrt(list_aggregate(
               list_transform(centroid, x -> x * x), 'sum')), 6) AS centroid_norm,
           ROUND(centroid[1], 6) AS c0
    FROM st JOIN cent USING (label)
    """,
)
def label_centroids(spark, sf_dir):
    """Per-label embedding class statistics (count, mean L2 norm,
    element-wise centroid) — the embedding-space monitoring pass run
    over training corpora (class drift, collapsed clusters).

    Scale shape: the centroid is a posexplode + (label, dim) partial
    aggregate — shuffle rows = labels x dims, independent of corpus
    size — reassembled with an ordered collect per label; the scalar
    stats branch aggregates the same scan without the explode and
    broadcast-joins back (labels are tiny)."""
    from lance_flink_spark.functions.vector import norm

    e = table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    ex = e.select("label", F.posexplode("v").alias("pos", "val"))
    cent = (
        ex.groupBy("label", "pos")
        .agg(F.round(F.avg("val"), 6).alias("a"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "a"))),
                lambda s: s["a"],
            ).alias("centroid")
        )
    )
    st = e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(norm(F.col("v"))), 6).alias("mean_norm"),
    )
    # the full centroid array is the operator's product; the gate
    # compares scalar projections of it (array columns are unhashable
    # in the driver's sort-and-hash compare)
    return st.join(F.broadcast(cent), "label").select(
        "label",
        "n",
        "mean_norm",
        F.round(norm(F.col("centroid")), 6).alias("centroid_norm"),
        F.round(F.element_at("centroid", 1), 6).alias("c0"),
    )


@query(
    "semantic_decontaminate",
    # r13 rotation: embedding-space decontamination gets driver-grade evidence
    oracle="""
    WITH ev AS (
        SELECT vec_id AS ev_id, embedding::DOUBLE[] AS ev FROM embeddings
        WHERE vec_id % 97 = 0),
    corpus AS (
        SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        WHERE vec_id % 97 <> 0),
    hits AS (
        SELECT c.vec_id, e.ev_id,
               ROUND(list_cosine_similarity(c.emb, e.ev), 6) AS sim
        FROM corpus c, ev e
        WHERE ROUND(list_cosine_similarity(c.emb, e.ev), 6) >= 0.37)
    SELECT vec_id, COUNT(*) AS n_matches,
           MAX(sim) AS best_sim,
           MIN(ev_id) AS first_eval_id
    FROM hits GROUP BY vec_id
    """,
)
def semantic_decontaminate(spark, sf_dir):
    """Embedding-space benchmark decontamination — the semantic twin
    of the 3-gram `decontaminate_corpus` entry (eval-set leakage that
    paraphrasing hides from n-gram overlap still collides in embedding
    space; the filter modern pretraining pipelines run alongside the
    lexical one). The ~1% vec_id % 97 == 0 slice stands in for an eval
    benchmark; its embeddings BROADCAST against one corpus scan and a
    Catalyst HOF cosine flags corpus rows within 0.37 similarity of
    ANY eval row. Cost: |corpus| × |eval| vectorized JVM ops with the
    eval side broadcast — never a corpus×corpus product; at a larger
    eval set, route through the IVF knn_join instead (same output
    contract). The 0.37 threshold sits at ~p99 of the synthetic
    corpus's best-eval similarity (these embeddings are near-random,
    max ≈ 0.47), so the gate exercises REAL boundary decisions — a
    production filter against paraphrase leakage runs ≥0.95 on
    semantically trained embeddings. Rounded similarity on BOTH sides
    of the threshold so the oracle's boundary decisions match
    bit-for-bit."""
    from lance_flink_spark.functions import vector as V

    emb = table(spark, sf_dir, "embeddings")
    ev = emb.filter("vec_id % 97 = 0").select(
        F.col("vec_id").alias("ev_id"),
        F.col("embedding").cast("array<double>").alias("ev"),
    )
    corpus = emb.filter("vec_id % 97 <> 0").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    sim = F.round(V.cosine_similarity(F.col("emb"), F.col("ev")), 6)
    hits = (
        corpus.crossJoin(F.broadcast(ev))
        .withColumn("sim", sim)
        .filter(F.col("sim") >= 0.37)
    )
    return hits.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.max("sim").alias("best_sim"),
        F.min("ev_id").alias("first_eval_id"),
    )


@query(
    "native_index_exactness",
    extra=True,  # r14: the native sidecar index's exactness twin
    oracle=f"""
    SELECT vec_id, distance FROM (
        SELECT e.vec_id,
               ROUND(list_distance(e.embedding::DOUBLE[], q.qv), 6) AS distance
        FROM embeddings e, {_Q0} q
        WHERE e.vec_id % 17 <> 3)
    ORDER BY distance, vec_id LIMIT 10
    """,
)
def native_index_exactness(spark, sf_dir):
    """Exactness twin for CREATE INDEX on NATIVE tables (§2 #270):
    embeddings land as a native Lance dataset, the sidecar IVF_FLAT
    index builds over the distributed read (entries addressed by
    global physical offset), a SQL DELETE grows a deletion file
    WITHOUT rebuilding, and vector_search serves from the index with
    nprobes ≥ nlist (exact) — the current deletion masks anti-joined
    at query time. The DuckDB oracle is brute force over the
    undeleted rows: a mis-based offset in the mask, a deleted row
    resurfacing as a neighbor, or a list dropped by the index build
    breaks the hash. Reference parity: LanceIndexBuilder indexes row
    ids, scans apply deletes (the address+mask model)."""
    import os
    import shutil

    from lance_flink_spark.registry import scratch_dir
    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import (
        write_dataset_distributed,
    )

    from lance_flink_spark.registry import cached_native_fixture

    tag = sf_dir.rstrip("/").replace("/", "_")
    base = scratch_dir("native_idx" + tag)
    root = os.path.join(base, "emb")
    cached_native_fixture(
        "native_idx_emb" + tag,
        root,
        lambda t: write_dataset_distributed(
            t,
            table(spark, sf_dir, "embeddings")
            .select("vec_id", "embedding")
            .repartition(4),
        ),
    )
    eng = SqlEngine(spark, Catalog(os.path.join(base, "whw")))
    eng.execute(
        f"CREATE TABLE nidx_emb (vec_id BIGINT, embedding ARRAY<FLOAT>) "
        f"WITH ('connector'='lance', 'path'='{root}')"
    )
    eng.execute(
        "CREATE INDEX ON nidx_emb (embedding) USING IVF_FLAT "
        "WITH ('index.num-partitions'='8')"
    )
    # delete-only drift: masks apply at query time, no rebuild
    eng.execute("DELETE FROM nidx_emb WHERE vec_id % 17 = 3")
    qv = _query_vec(spark, sf_dir)
    qsql = "ARRAY[" + ",".join(repr(float(x)) for x in qv) + "]"
    return eng.execute(
        f"SELECT * FROM vector_search('nidx_emb', 'embedding', {qsql}, 10, 'L2')"
    ).select("vec_id", F.round("distance", 6).alias("distance"))


@query(
    "native_ivf_payload_exactness",
    oracle=f"""
    SELECT vec_id, distance FROM (
        SELECT e.vec_id,
               ROUND(list_distance(e.embedding::DOUBLE[], q.qv), 6) AS distance
        FROM embeddings e, {_Q0} q
        WHERE e.vec_id % 13 <> 5)
    ORDER BY distance, vec_id LIMIT 10
    """,
)
def native_ivf_payload_exactness(spark, sf_dir):
    """Exactness twin for the `_indices` IVF_FLAT payload (§2 r15):
    embeddings land as a native Lance dataset, build_ivf_flat_index
    trains centroids, writes one payload file per inverted list under
    ``_indices/{uuid}/`` plus the index.proto IVF message, and
    REGISTERS the index in a new manifest version (the IndexSection
    the reference's LanceIndexBuilder persists through the Lance
    library). A SQL DELETE then grows deletion files WITHOUT a
    rebuild; vector_search serves from the registered payload at
    nprobes == num_partitions (IVF_FLAT is exact at full probes) with
    the current deletion masks applied. The DuckDB oracle is brute
    force over the live rows: a partition dropped by the build, a
    mis-addressed row id, or a deleted row resurfacing breaks the
    hash. Cite: LanceIndexBuilder.java:40-95; LanceVectorSearch.java
    serves from the same registered index."""
    import os
    import shutil

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import (
        write_dataset_distributed,
    )
    from lance_flink_spark.sources.native_index import (
        build_ivf_flat_index,
    )

    from lance_flink_spark.registry import cached_native_fixture

    tag = sf_dir.rstrip("/").replace("/", "_")
    base = scratch_dir("native_ivfp" + tag)
    root = os.path.join(base, "emb")

    def _build(t):
        write_dataset_distributed(
            t,
            table(spark, sf_dir, "embeddings")
            .select("vec_id", "embedding")
            .repartition(4),
        )
        build_ivf_flat_index(t, "embedding", spark, num_partitions=8)

    cached_native_fixture("native_ivfp_emb" + tag, root, _build)
    eng = SqlEngine(spark, Catalog(os.path.join(base, "whw")))
    eng.execute(
        f"CREATE TABLE nivf_emb (vec_id BIGINT, embedding ARRAY<FLOAT>) "
        f"WITH ('connector'='lance', 'path'='{root}', "
        f"'vector.nprobes'='8')"
    )
    eng.execute("DELETE FROM nivf_emb WHERE vec_id % 13 = 5")
    qv = _query_vec(spark, sf_dir)
    qsql = "ARRAY[" + ",".join(repr(float(x)) for x in qv) + "]"
    return eng.execute(
        f"SELECT * FROM vector_search('nivf_emb', 'embedding', {qsql}, 10, 'L2')"
    ).select("vec_id", F.round("distance", 6).alias("distance"))
