"""IVF vector indexes: IVF_FLAT and IVF_PQ, Spark-native.

Parity with LanceIndexBuilder.java:1-436 (IVF_FLAT / IVF_PQ with
num-partitions, num-sub-vectors, num-bits) and the nprobes /
refine-factor search surface of LanceVectorSearch.java.

Spark-first mapping of the IVF idea:
- *inverted lists* = a parquet dataset ``partitionBy("centroid_id")`` —
  probing nprobes lists is a partition-pruned scan (Catalyst prunes
  non-probed directories; at 100 TB only nprobes/nlist of the data is
  read).
- *centroid training* = Lloyd's k-means on a bounded driver-side
  sample (≤ ``sample_size`` rows — the only collect in the pipeline,
  same approach Lance itself takes with sampled training).
- *assignment / PQ encoding* = Arrow-vectorized pandas UDFs over the
  full distributed dataset (numpy matrix math per batch, no per-row
  Python).
- *PQ ADC search* = per-query lookup table broadcast into a pandas
  UDF; optional exact re-scoring of ``refine_factor * k`` candidates
  (reference's vector.refine-factor).

IVF_HNSW lives in index/hnsw.py: a single GLOBAL graph build is
sequential and driver-bound, but the reference's IVF_HNSW is an HNSW
per inverted list — per-list builds are independent executor tasks
(the Lucene/ES segment model), so the graph variant is Spark-shaped
after all. ``build_hnsw`` here delegates for API parity.
"""

from __future__ import annotations

import io

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from lance_flink_spark.operators.similarity import knn as _brute_knn
from lance_flink_spark.sources import fsio

META = "_index_meta.json"


def _save_npy(path: str, arr: np.ndarray) -> None:
    """npy bytes through fsio — index artifacts live on any Hadoop
    scheme (s3a://, viewfs://, ...) exactly like datasets/catalogs."""
    buf = io.BytesIO()
    np.save(buf, arr)
    fsio.write_bytes_atomic(path, buf.getvalue())


def _load_npy(path: str) -> np.ndarray:
    return np.load(io.BytesIO(fsio.read_bytes(path)))


def _opq_rotation(dim: int, seed: int) -> np.ndarray:
    """Deterministic orthogonal rotation (OPQ-style, md5-seeded): QR of
    a seeded Gaussian, columns sign-fixed so the result is unique. A
    random rotation spreads residual energy evenly across sub-vectors —
    the cheap, training-free variant of OPQ (Ge et al. CVPR'13; the
    full method alternates rotation and codebook optimization)."""
    import hashlib

    s = int.from_bytes(hashlib.md5(f"opq:{seed}".encode()).digest()[:4], "big")
    g = np.random.RandomState(s).randn(dim, dim)
    qm, r = np.linalg.qr(g)
    return qm * np.sign(np.diag(r))[None, :]


# ---------- k-means (driver-side, bounded sample) ----------

# Row-chunk size for driver-side distance computation: peak temp memory
# is CHUNK × k doubles (e.g. 8192 × 4096 × 8B = 256 MB at nlist=4096),
# never the n × k × dim broadcast temp that the naive formulation
# materializes (≈6 TB at sample=256k, nlist=4096, dim=768).
_KM_CHUNK = 8192


def _assign_chunked(x: np.ndarray, c: np.ndarray, chunk: int = _KM_CHUNK):
    """(argmin, min-squared-distance) of each row of ``x`` against the
    centroid matrix ``c`` via the ||x||² + ||c||² - 2x·cᵀ expansion,
    row-chunked so memory is O(chunk·k) regardless of n."""
    c2 = (c * c).sum(1)
    assign = np.empty(len(x), dtype=np.int64)
    mind2 = np.empty(len(x))
    for s in range(0, len(x), chunk):
        xs = x[s : s + chunk]
        d = (xs * xs).sum(1)[:, None] - 2.0 * xs @ c.T + c2[None, :]
        assign[s : s + chunk] = d.argmin(1)
        mind2[s : s + chunk] = d.min(1)
    return assign, mind2


def _kmeans(x: np.ndarray, k: int, seed: int = 42, iters: int = 25) -> np.ndarray:
    """Lloyd's k-means with k-means++ seeding.

    Seeding keeps a RUNNING min-distance array updated per new centroid
    (O(n·k·dim) total — one Lloyd-iteration's work) instead of
    re-scoring all chosen centroids each round (O(n·k²·dim)); both
    seeding and iteration use the chunked expansion, so a 256k-sample,
    nlist=4096, dim=768 build stays in a few hundred MB of driver RAM."""
    rng = np.random.RandomState(seed)
    n = len(x)
    idx = [int(rng.randint(n))]
    d2 = ((x - x[idx[0]]) ** 2).sum(1)
    for _ in range(1, k):
        probs = d2 / max(d2.sum(), 1e-12)
        i = int(rng.choice(n, p=probs))
        idx.append(i)
        np.minimum(d2, ((x - x[i]) ** 2).sum(1), out=d2)
    c = x[np.array(idx)].copy()
    for _ in range(iters):
        assign, _ = _assign_chunked(x, c)
        sums = np.zeros_like(c)
        np.add.at(sums, assign, x)
        counts = np.bincount(assign, minlength=k).astype(np.float64)
        nonempty = counts > 0
        c[nonempty] = sums[nonempty] / counts[nonempty, None]
    return c


def _kmeans_distributed(
    df: DataFrame, vec_col: str, k: int, seed: int, iters: int = 25
) -> np.ndarray:
    """Distributed Lloyd via pyspark.ml over the full dataset — the
    path for training sets beyond any single-node sample."""
    from pyspark.ml.clustering import KMeans as MLKMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = MLKMeans(k=k, seed=seed, maxIter=iters).fit(feats)
    # clusterCenters() yields numpy arrays (newer pyspark) or ml Vectors
    return np.stack(
        [np.asarray(c if isinstance(c, np.ndarray) else c.toArray()) for c in model.clusterCenters()]
    )


def _train_pq_distributed(
    spark: SparkSession,
    df: DataFrame,
    vec_col: str,
    cents: np.ndarray,
    m: int,
    ncodes: int,
    seed: int,
    iters: int = 15,
    rot: np.ndarray | None = None,
) -> np.ndarray:
    """PQ codebooks trained DISTRIBUTED: residuals to the coarse
    centroid are computed executor-side (Arrow-batched, chunked argmin),
    then each sub-vector's codebook is a pyspark.ml k-means over the
    full residual slice — no driver-sample ceiling on PQ quality."""
    from pyspark.ml.clustering import KMeans as MLKMeans
    from pyspark.ml.functions import array_to_vector

    cents_b = spark.sparkContext.broadcast(cents)
    rot_b = spark.sparkContext.broadcast(rot)

    @pandas_udf("array<double>")
    def residual(v: pd.Series) -> pd.Series:
        x = _stack(v)
        assign, _ = _assign_chunked(x, cents_b.value)
        r = x - cents_b.value[assign]
        if rot_b.value is not None:
            r = r @ rot_b.value.T
        return pd.Series(list(r))

    resid = df.select(residual(F.col(vec_col)).alias("r")).cache()
    dim = cents.shape[1]
    sub = dim // m
    books = []
    try:
        for j in range(m):
            feats = resid.select(
                array_to_vector(F.slice(F.col("r"), j * sub + 1, sub)).alias("features")
            )
            model = MLKMeans(k=ncodes, seed=seed + 1 + j, maxIter=iters).fit(feats)
            cb = np.stack(
                [
                    np.asarray(c if isinstance(c, np.ndarray) else c.toArray())
                    for c in model.clusterCenters()
                ]
            )
            if len(cb) < ncodes:  # degenerate data: pad by repeating
                cb = np.vstack([cb, np.repeat(cb[-1:], ncodes - len(cb), axis=0)])
            books.append(cb)
    finally:
        resid.unpersist()
    return np.stack(books)  # (m, ncodes, sub)


def _stack(series: pd.Series) -> np.ndarray:
    return np.stack(series.to_numpy()).astype(np.float64)


def _sq_encode_udf(bounds_b, bits: int):
    """Arrow-batched scalar quantizer: per-dim uniform codes in
    [0, 2^bits - 1] against broadcast global bounds."""
    levels = (1 << bits) - 1

    @pandas_udf("array<int>")
    def sq_encode(v: pd.Series) -> pd.Series:
        x = _stack(v)
        lo, hi = bounds_b.value
        codes = np.clip(
            np.rint((x - lo) / (hi - lo) * levels), 0, levels
        ).astype(np.int32)
        return pd.Series(list(codes))

    return sq_encode


class IndexStale(RuntimeError):
    """A dataset rewrite (compact / restore / overwrite) relocated live
    rows after this index's last sync: their old addresses left the
    live file set, so the query-time mask hides them and search would
    SILENTLY return a thinned top-k. Call ``resync()`` — or open the
    index with ``on_stale='resync'`` to self-heal at search time."""


#: manifest commit modes that RELOCATE live rows (Lance's index-remap
#: cases). Mutation rewrites (delete/update/merge) keep the documented
#: conservative mask instead: their default path is a DV commit (which
#: masks exactly, no relocation), and the non-DV rewrite is pinned as
#: mask-only in tests/test_index_dv.py.
_REWRITE_MODES = ("compact", "restore", "overwrite")


class IVFIndex:
    """An IVF index rooted at ``path``; see module docstring for layout.

    ``on_stale`` controls the post-rewrite staleness window of
    dataset-bound indexes (see :class:`IndexStale`): ``"error"``
    (default) raises at search entry, ``"resync"`` self-heals (cost ∝
    fragments written since the last sync, never index size),
    ``"ignore"`` keeps the bare conservative mask for callers that
    schedule ``resync()`` themselves."""

    def __init__(self, path: str, on_stale: str = "error"):
        if on_stale not in ("error", "resync", "ignore"):
            raise ValueError(f"on_stale must be error|resync|ignore, got {on_stale!r}")
        self.path = path
        self.on_stale = on_stale

    # ---------- build ----------

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        df: DataFrame,
        path: str,
        vec_col: str = "embedding",
        nlist: int = 256,
        pq_sub_vectors: int | None = None,
        pq_bits: int = 8,
        sq_bits: int | None = None,
        sample_size: int = 262_144,
        seed: int = 42,
        distributed_kmeans: bool | None = None,
        kmeans_iters: int = 25,
        opq: bool = False,
        dataset=None,
    ) -> "IVFIndex":
        """Build IVF_FLAT (pq_sub_vectors=None), IVF_PQ, or IVF_SQ
        (``sq_bits`` — Lance's scalar-quantization variant: per-dim
        uniform codes against global [min, max] bounds; 4× smaller scan
        at 8 bits with far cheaper decode than PQ's LUT walk, the usual
        pick when memory—not disk—is the constraint; quantizer bit
        width rides the reference's index.num-bits option —
        config/LanceOptions.java:159-166, LanceIndexBuilder.java:540).

        ``distributed_kmeans`` defaults to AUTO: above nlist=512 the
        centroids (and PQ codebooks) are trained with pyspark.ml's
        distributed Lloyd over the FULL dataset — no driver-sample
        ceiling, no driver-RAM dependence on nlist (the 100 TB path).
        At small nlist the bounded driver-side sample (like Lance's own
        sampled training) is faster; its distance math is row-chunked
        (_assign_chunked) so even the sample path never materializes an
        n×k×dim temp. Index layout and search are identical either way.

        ``opq`` applies a deterministic orthogonal rotation to the
        residuals before the sub-vector split (OPQ-lite): codebooks
        quantize R·(x - c) and search rotates the query side, so all
        distances are preserved exactly while per-sub-vector variance
        evens out.

        ``dataset`` binds the index to a :class:`Dataset` (Lance
        parity: indexes store row addresses, deletion files mask them
        at query time — LanceIndexBuilder.java indexes row ids, scans
        apply deletes). When given, ``df`` defaults to the dataset's
        ``keyed_read`` (live rows + ``_row_file``/``_row_pos`` address
        columns, stored alongside each vector in the lists), and every
        search path anti-joins candidates against the dataset's
        CURRENT tombstones plus the files removed since indexing —
        rows DV-deleted or rewritten after the build never come back
        as neighbors, without touching the index."""
        from lance_flink_spark.session import ship_package

        ship_package(spark)
        if dataset is not None:
            if df is None:
                df = dataset.keyed_read(spark)
            elif "_row_file" not in df.columns or "_row_pos" not in df.columns:
                raise ValueError(
                    "dataset-bound build must index a keyed_read frame "
                    "(carrying _row_file/_row_pos row addresses); pass "
                    "df=None to index the whole dataset, or a filtered "
                    "dataset.keyed_read(spark)"
                )
        if pq_sub_vectors is not None and sq_bits is not None:
            raise ValueError("pq_sub_vectors and sq_bits are mutually exclusive")
        if distributed_kmeans is None:
            distributed_kmeans = nlist > 512
        ncodes = 2**pq_bits
        if distributed_kmeans:
            cents = _kmeans_distributed(df, vec_col, nlist, seed, iters=kmeans_iters)
            dim = cents.shape[1]
        else:
            sample = np.stack(
                [
                    np.asarray(r[0], dtype=np.float64)
                    for r in df.select(vec_col).limit(sample_size).collect()
                ]
            )
            cents = _kmeans(sample, nlist, seed=seed, iters=kmeans_iters)
            dim = sample.shape[1]

        codebooks = None
        rot = _opq_rotation(dim, seed) if (opq and pq_sub_vectors) else None
        if pq_sub_vectors is not None:
            if dim % pq_sub_vectors:
                raise ValueError(f"dim {dim} not divisible by m={pq_sub_vectors}")
            sub = dim // pq_sub_vectors
            if distributed_kmeans:
                codebooks = _train_pq_distributed(
                    spark, df, vec_col, cents, pq_sub_vectors, ncodes, seed, rot=rot
                )
            else:
                # PQ trains on residuals to the coarse centroid (as
                # Lance does), chunked assignment — no n×k×dim temp
                assign, _ = _assign_chunked(sample, cents)
                resid = sample - cents[assign]
                if rot is not None:
                    resid = resid @ rot.T
                codebooks = np.stack(
                    [
                        _kmeans(resid[:, j * sub : (j + 1) * sub], ncodes, seed=seed + 1 + j, iters=15)
                        for j in range(pq_sub_vectors)
                    ]
                )  # (m, ncodes, sub)

        sq_bounds = None
        if sq_bits is not None:
            # exact per-dimension [min, max] over the FULL dataset: one
            # posexplode + (pos) aggregate — output is dim rows, the
            # shuffle is map-side-combined, and bounds are deterministic
            # (no sample dependence), so re-encodes are reproducible
            rows = (
                df.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
                .groupBy("pos")
                .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
                .collect()
            )
            lo = np.empty(dim)
            hi = np.empty(dim)
            for r in rows:
                lo[r["pos"]], hi[r["pos"]] = float(r["lo"]), float(r["hi"])
            sq_bounds = np.stack([lo, np.maximum(hi, lo + 1e-12)])

        fsio.makedirs(path)
        _save_npy(fsio.join(path, "centroids.npy"), cents)
        if codebooks is not None:
            _save_npy(fsio.join(path, "codebooks.npy"), codebooks)
        if sq_bounds is not None:
            _save_npy(fsio.join(path, "sq_bounds.npy"), sq_bounds)
        if rot is not None:
            _save_npy(fsio.join(path, "rotation.npy"), rot)
        meta = {
            "nlist": nlist,
            "dim": dim,
            "pq_sub_vectors": pq_sub_vectors,
            "pq_bits": pq_bits,
            "sq_bits": sq_bits,
            "vec_col": vec_col,
            "opq": rot is not None,
        }
        if dataset is not None:
            meta.update(
                {
                    "dataset_path": dataset.path,
                    "dataset_version": len(dataset.versions()),
                    # the _row_file identity space indexed so far; mask
                    # time diffs it against the CURRENT live files to
                    # catch predicate-delete rewrites / compaction
                    "dataset_files": dataset.live_file_relpaths(),
                }
            )
        fsio.write_json_atomic(fsio.join(path, META), meta)

        # distributed assignment (+ PQ encoding): one Arrow-batched pass
        cents_b = spark.sparkContext.broadcast(cents)
        cb_b = spark.sparkContext.broadcast(codebooks) if codebooks is not None else None
        rot_b = spark.sparkContext.broadcast(rot)
        m = pq_sub_vectors

        @pandas_udf("int")
        def assign_centroid(v: pd.Series) -> pd.Series:
            assign, _ = _assign_chunked(_stack(v), cents_b.value)
            return pd.Series(assign.astype(np.int32))

        out = df.withColumn("centroid_id", assign_centroid(F.col(vec_col)))

        if codebooks is not None:

            @pandas_udf("array<int>")
            def pq_encode(v: pd.Series, cid: pd.Series) -> pd.Series:
                x = _stack(v)
                cb = cb_b.value  # (m, ncodes, sub)
                resid = x - cents_b.value[cid.to_numpy()]
                if rot_b.value is not None:
                    resid = resid @ rot_b.value.T
                sub = resid.shape[1] // m
                codes = np.empty((len(x), m), dtype=np.int32)
                for j in range(m):
                    r = resid[:, j * sub : (j + 1) * sub]
                    cbj = cb[j]
                    d = (r * r).sum(1)[:, None] - 2 * r @ cbj.T + (cbj * cbj).sum(1)[None, :]
                    codes[:, j] = d.argmin(1)
                return pd.Series(list(codes))

            out = out.withColumn("pq_code", pq_encode(F.col(vec_col), F.col("centroid_id")))

        if sq_bounds is not None:
            out = out.withColumn(
                "sq_code",
                _sq_encode_udf(
                    spark.sparkContext.broadcast(sq_bounds), sq_bits
                )(F.col(vec_col)),
            )

        (
            out.repartition("centroid_id")
            .write.partitionBy("centroid_id")
            .mode("overwrite")
            .parquet(fsio.join(path, "lists"))
        )
        return cls(path)

    # ---------- incremental add ----------

    def add(self, spark: SparkSession, df: DataFrame) -> list[int]:
        """Assign new vectors to the existing centroids (and PQ
        codebooks) and append them to the inverted lists — incremental
        index maintenance without retraining (Lance's index update
        path). Centroid quality degrades only if the data distribution
        drifts; rebuild then.

        Returns the sorted centroid ids that received rows, computed
        from the SAME materialized assignment that was appended — a
        non-deterministic input frame cannot desync consumers (e.g.
        HNSW graph rebuilds) from what actually landed on disk."""
        from lance_flink_spark.session import ship_package

        ship_package(spark)
        meta = self._meta()
        cents = _load_npy(fsio.join(self.path, "centroids.npy"))
        cents_b = spark.sparkContext.broadcast(cents)
        vec_col = meta["vec_col"]

        @pandas_udf("int")
        def assign_centroid(v: pd.Series) -> pd.Series:
            assign, _ = _assign_chunked(_stack(v), cents_b.value)
            return pd.Series(assign.astype(np.int32))

        out = df.withColumn("centroid_id", assign_centroid(F.col(vec_col)))
        if meta["pq_sub_vectors"]:
            cb = _load_npy(fsio.join(self.path, "codebooks.npy"))
            cb_b = spark.sparkContext.broadcast(cb)
            rot_b = spark.sparkContext.broadcast(self._rotation(meta))
            m = meta["pq_sub_vectors"]

            @pandas_udf("array<int>")
            def pq_encode(v: pd.Series, cid: pd.Series) -> pd.Series:
                x = _stack(v)
                resid = x - cents_b.value[cid.to_numpy()]
                if rot_b.value is not None:
                    resid = resid @ rot_b.value.T
                sub = resid.shape[1] // m
                codes = np.empty((len(x), m), dtype=np.int32)
                for j in range(m):
                    r = resid[:, j * sub : (j + 1) * sub]
                    cbj = cb_b.value[j]
                    d = (r * r).sum(1)[:, None] - 2 * r @ cbj.T + (cbj * cbj).sum(1)[None, :]
                    codes[:, j] = d.argmin(1)
                return pd.Series(list(codes))

            out = out.withColumn("pq_code", pq_encode(F.col(vec_col), F.col("centroid_id")))
        if meta.get("sq_bits"):
            bounds = _load_npy(fsio.join(self.path, "sq_bounds.npy"))
            # global bounds are FROZEN at build time (like the
            # centroids): new values outside them clip to the edge
            # code — re-score via refine catches any ranking damage;
            # rebuild on real distribution drift
            out = out.withColumn(
                "sq_code",
                _sq_encode_udf(
                    spark.sparkContext.broadcast(bounds), meta["sq_bits"]
                )(F.col(vec_col)),
            )
        # keep the lists schema uniform across appends: a dataset-bound
        # index always carries address columns, an unbound index never
        # does. Raw rows WITHOUT addresses are refused on a bound index
        # — a null-address entry can never be masked by a later delete
        # (nulls match no tombstone), so a delete-after-add would keep
        # resurfacing the row in search forever. Route through
        # ingest(df) (append to the dataset + resync) or pass
        # dataset.keyed_read(since_version=...).
        if meta.get("dataset_path"):
            if "_row_file" not in out.columns:
                raise ValueError(
                    "dataset-bound index: add() of rows without "
                    "(_row_file, _row_pos) addresses would be unmaskable "
                    "by later deletes. Use ingest(df) to append them to "
                    f"the dataset ({meta['dataset_path']}) and fold them "
                    "in under real addresses, or pass "
                    "dataset.keyed_read(since_version=...)."
                )
        elif "_row_file" in out.columns:
            out = out.drop("_row_file", "_row_pos")
        out = out.persist()
        try:
            (
                out.repartition("centroid_id")
                .write.partitionBy("centroid_id")
                .mode("append")
                .parquet(fsio.join(self.path, "lists"))
            )
            touched = sorted(
                int(r[0]) for r in out.select("centroid_id").distinct().collect()
            )
        finally:
            out.unpersist()
        if meta.get("dataset_path"):
            from lance_flink_spark.sources.dataset import Dataset

            ds = Dataset(meta["dataset_path"])
            meta["dataset_files"] = sorted(
                set(meta.get("dataset_files") or []) | set(ds.live_file_relpaths())
            )
            meta["dataset_version"] = len(ds.versions())
            fsio.write_json_atomic(fsio.join(self.path, META), meta)
        return touched

    def ingest(self, spark: SparkSession, df: DataFrame) -> list[int]:
        """Add rows that are NOT yet in the bound dataset: append them
        as a dataset commit, then fold the new fragment into the index
        under its real (_row_file, _row_pos) addresses via resync —
        the auto-route that keeps every index entry maskable (add()
        refuses unaddressed rows on a bound index). Returns the
        touched list ids. Cost ∝ len(df), never index or table size."""
        meta = self._meta()
        dp = meta.get("dataset_path")
        if not dp:
            raise ValueError(
                "index is not dataset-bound — use add() directly"
            )
        from lance_flink_spark.sources.dataset import Dataset

        Dataset(dp).write(df, mode="append")
        return self.resync(spark)

    def _resync_delta(self, spark: SparkSession) -> DataFrame | None:
        """The keyed rows of every dataset fragment newer than the
        index's recorded version, or None when the index is current
        (advancing the recorded version for metadata-only commits) —
        shared by IVFIndex.resync and HNSWIndex.resync."""
        from lance_flink_spark.sources.dataset import Dataset

        meta = self._meta()
        dp = meta.get("dataset_path")
        if not dp:
            raise ValueError("index is not dataset-bound (built without dataset=)")
        ds = Dataset(dp)
        since = int(meta.get("dataset_version", 0))
        if len(ds.versions()) == since:
            return None
        new = ds.keyed_read(spark, since_version=since)
        if not new.take(1):
            # metadata-only commits since (pure DV deletes, restores):
            # nothing to re-key, but record the version so the next
            # resync skips the empty probe
            meta["dataset_version"] = len(ds.versions())
            meta["dataset_files"] = sorted(
                set(meta.get("dataset_files") or []) | set(ds.live_file_relpaths())
            )
            fsio.write_json_atomic(fsio.join(self.path, META), meta)
            return None
        return new

    def resync(self, spark: SparkSession) -> list[int]:
        """Catch a dataset-bound index up with its Dataset: fold every
        fragment newer than the index's recorded dataset version via
        one incremental ``add`` of the keyed delta (appends since the
        last build/add/resync, AND the rewrite fragments a compaction
        produced — Lance's index-remap story: rewritten rows re-enter
        under their new addresses while the old addresses stay masked
        by the removed-files diff). Cost ∝ new fragments' rows, never
        index or table size. Returns the touched list ids ([] when
        already current)."""
        new = self._resync_delta(spark)
        if new is None:
            return []
        return self.add(spark, new)

    def compact_lists(self, spark: SparkSession, min_files: int = 2) -> list[int]:
        """Compact fragmented inverted-list partitions (Lance's
        index-optimize step after incremental updates): every ``add``
        appends one parquet file per touched list, so a frequently
        updated list accumulates small files and the probe scan pays
        a per-file open + footer read each probe. Rewrites only the
        partitions holding ≥ ``min_files`` data files — a
        partition-pruned scan + dynamic partition overwrite, one file
        per list after ``repartition("centroid_id")`` — so cost ∝
        fragmented lists, not index size. Untouched lists keep their
        files byte-identical. Returns the sorted compacted list ids.

        Works on any fsio scheme (the listing walks the same
        filesystem the dataset lives on). Like Dataset.compact, don't
        run it concurrently with an ``add`` to the same lists.

        Crash safety: the compacted partitions are STAGED to a sibling
        directory first, then swapped into ``lists/`` one partition at
        a time via backup-rename — never a dynamic overwrite of a path
        the job is also reading (version-sensitive, and a failed commit
        can drop the only copy of a partition). At every instant each
        list has a complete copy on disk (live, hidden backup, or
        stage); an interrupted swap is self-healed on the next call."""
        base = fsio.join(self.path, "lists")
        self._heal_interrupted_compact(base)
        frag = []
        for d in fsio.listdir(base):
            if not d.startswith("centroid_id="):
                continue
            n = sum(
                1
                for f in fsio.listdir(fsio.join(base, d))
                if f.endswith(".parquet")
            )
            if n >= min_files:
                frag.append(int(d.split("=", 1)[1]))
        if not frag:
            return []
        lists = spark.read.parquet(base).filter(F.col("centroid_id").isin(frag))
        self._staged_partition_swap(base, lists, frag)
        return sorted(frag)

    def _staged_partition_swap(
        self, base: str, frame: DataFrame, cids: list[int]
    ) -> None:
        """Atomically replace the given ``centroid_id`` partitions of
        ``base`` with ``frame``'s rows (staged write + per-partition
        backup-rename swap — see compact_lists crash-safety notes). A
        partition with NO rows in ``frame`` is removed outright."""
        stage = fsio.join(self.path, "lists_compacting")
        fsio.delete(stage)  # leftovers from a previous failed run
        (
            frame.repartition("centroid_id")
            .write.partitionBy("centroid_id")
            .mode("overwrite")
            .parquet(stage)
        )
        # swap: live -> hidden backup, staged -> live, drop backup.
        # Hidden (dot-prefixed) dirs are invisible to Spark's file
        # listing, so readers never see a half-renamed partition twice.
        for cid in cids:
            part = f"centroid_id={cid}"
            live = fsio.join(base, part)
            backup = fsio.join(base, f".compact-old-{part}")
            fsio.delete(backup)
            fsio.rename(live, backup)
            if fsio.exists(fsio.join(stage, part)):
                fsio.rename(fsio.join(stage, part), live)
            # else: every row of this partition was purged — it simply
            # stops existing (the backup is dropped below)
            fsio.delete(backup)
        fsio.delete(stage)

    def purge_dead(self, spark: SparkSession) -> list[int]:
        """Physically drop DEAD rows (tombstoned / removed-file
        addresses) from the inverted lists — the vacuum half of index
        maintenance (Lucene's "merge away deletes"): after a purge the
        query-time mask has nothing left to do for those lists, graph
        rebuilds see only live rows, and repeated resyncs are
        idempotent (dead rows no longer re-trigger rebuilds). Only the
        partitions that actually hold dead rows are rewritten (staged
        swap, crash-safe); returns their sorted ids ([] when clean or
        unbound)."""
        base = fsio.join(self.path, "lists")
        self._heal_interrupted_compact(base)
        lists = spark.read.parquet(base)
        if "_row_file" not in lists.columns:
            return []
        live = self._dv_mask(spark, lists)
        dead_cids = sorted(
            int(r[0])
            for r in lists.select("centroid_id")
            .exceptAll(live.select("centroid_id"))
            .distinct()
            .collect()
        )
        if not dead_cids:
            return []
        keep = live.filter(F.col("centroid_id").isin(dead_cids))
        self._staged_partition_swap(base, keep, dead_cids)
        return dead_cids

    @staticmethod
    def _heal_interrupted_compact(base: str) -> None:
        """Recover from a compact_lists crash between the two swap
        renames: a ``.compact-old-centroid_id=N`` backup with no live
        partition is restored; one WITH a live partition means the
        staged copy already landed, so the backup is dropped."""
        for d in fsio.listdir(base):
            if not d.startswith(".compact-old-centroid_id="):
                continue
            live = fsio.join(base, d[len(".compact-old-") :])
            if fsio.exists(live):
                fsio.delete(fsio.join(base, d))
            else:
                fsio.rename(fsio.join(base, d), live)

    # ---------- batch ANN join ----------

    def knn_join(
        self,
        spark: SparkSession,
        queries_df: DataFrame,
        k: int,
        nprobes: int = 8,
        query_id: str = "query_id",
        query_vec_col: str = "embedding",
        corpus_id: str = "vec_id",
        metric: str = "l2",
        round_to: int = 6,
    ) -> DataFrame:
        """Batch ANN join THROUGH the index — the scale path for
        "top-k neighbors for every row of a query table"
        (table/LanceVectorSearchFunction.java used as a lookup join).

        Each query is assigned its ``nprobes`` nearest centroids in one
        Arrow-batched pass (centroids broadcast), exploded to
        (query, centroid_id) rows, then hash-joined to the inverted
        lists ON centroid_id — both sides co-partition on the join key,
        so the shuffle carries queries·nprobes + probed-list rows,
        never a queries×corpus cross product. Distances are Catalyst
        HOFs on the two vector columns (JVM-side); per-query top-k via
        window. Scored rows ≈ |Q|·(nprobes/nlist)·|corpus| vs brute
        knn_join's |Q|·|corpus|; nprobes = nlist is exact."""
        from lance_flink_spark.functions import vector as V
        from lance_flink_spark.session import ship_package

        ship_package(spark)
        self.check_stale(spark)
        meta = self._meta()
        vec_col = meta["vec_col"]
        cents = _load_npy(fsio.join(self.path, "centroids.npy"))
        cents_b = spark.sparkContext.broadcast(cents)
        np_ = min(nprobes, len(cents))
        if metric not in ("l2", "cosine", "dot"):
            raise ValueError(f"unsupported metric {metric!r}")

        @pandas_udf("array<int>")
        def probe_cents(v: pd.Series) -> pd.Series:
            x = _stack(v)  # (batch, dim)
            c = cents_b.value
            s = x @ c.T  # (batch, nlist)
            if metric == "l2":
                rank = (c * c).sum(1)[None, :] - 2 * s
            elif metric == "cosine":
                norms = np.linalg.norm(x, axis=1)[:, None] * np.maximum(
                    np.linalg.norm(c, axis=1)[None, :], 1e-12
                )
                rank = -s / np.maximum(norms, 1e-12)
            else:
                rank = -s
            idx = np.argsort(rank, axis=1, kind="stable")[:, :np_]
            return pd.Series(list(idx.astype(np.int32)))

        q = queries_df.select(
            F.col(query_id).alias("__qid"),
            F.col(query_vec_col).alias("__qvec"),
            F.explode(probe_cents(F.col(query_vec_col))).alias("centroid_id"),
        ).persist()
        # union of probed lists across all queries (≤ nlist values — a
        # tiny job) → directory-level pruning: unprobed lists are never
        # read, let alone shuffled. For clustered query batches this is
        # the difference between scanning nprobes-covered lists and the
        # whole corpus.
        probed = [int(r[0]) for r in q.select("centroid_id").distinct().collect()]
        lists = (
            self._dv_mask(
                spark,
                spark.read.parquet(fsio.join(self.path, "lists")).filter(
                    F.col("centroid_id").isin(probed)
                ),
            )
            .select(
                F.col("centroid_id"),
                F.col(corpus_id).alias("neighbor_id"),
                F.col(vec_col).alias("__cvec"),
            )
        )
        dist = F.round(
            V.distance(
                metric,
                F.col("__cvec").cast("array<double>"),
                F.col("__qvec").cast("array<double>"),
            ),
            round_to,
        )
        from lance_flink_spark.operators.similarity import rank_top_k

        scored = q.join(lists, "centroid_id").select(
            F.col("__qid").alias(query_id), "neighbor_id", dist.alias("distance")
        )
        return rank_top_k(scored, k, query_id=query_id)

    # ---------- search ----------

    def _meta(self) -> dict:
        return fsio.read_json(fsio.join(self.path, META))

    def _rotation(self, meta: dict) -> np.ndarray | None:
        if not meta.get("opq"):
            return None
        return _load_npy(fsio.join(self.path, "rotation.npy"))

    def check_stale(self, spark: SparkSession, resync_fn=None) -> None:
        """Guard a search entry against silent post-rewrite staleness.

        A compact()/compact_small()/restore() supersedes files whose
        LIVE rows re-enter the dataset under new addresses; the mask's
        removed-files diff (correctly) drops the old addresses, but the
        new ones only reach the index via ``resync`` — in between, a
        search is quietly missing rows. Detection is metadata-only:
        one manifest read for post-sync rewrite commits + the same
        live-file listing the mask pays anyway. No-op for unbound
        indexes, pure DV deletes (nothing relocates), and rewrites
        that touched no indexed file. ``resync_fn`` lets HNSW route
        the self-heal through its graph-rebuilding resync."""
        meta = self._meta()
        dp = meta.get("dataset_path")
        if not dp or self.on_stale == "ignore":
            return
        from lance_flink_spark.sources.dataset import Dataset

        ds = Dataset(dp)
        since = int(meta.get("dataset_version", 0))
        vs = ds._load_manifest()["versions"]
        if not any(
            v["version"] > since and v["mode"] in _REWRITE_MODES for v in vs
        ):
            return
        removed = set(meta.get("dataset_files") or ()) - set(
            ds.live_file_relpaths()
        )
        if not removed:
            return
        if self.on_stale == "resync":
            (resync_fn or self.resync)(spark)
            return
        raise IndexStale(
            f"dataset {dp} was rewritten (compact/restore/overwrite) after "
            f"this index's last sync: {len(removed)} indexed file(s) left "
            "the live set, so their surviving rows are invisible to search. "
            "Call resync(), or open the index with on_stale='resync' "
            "(self-heal) / on_stale='ignore' (keep the conservative mask)."
        )

    def _dv_mask(self, spark: SparkSession, cand: DataFrame) -> DataFrame:
        """Mask index entries whose source rows are no longer live in
        the bound Dataset (Lance parity: deletion files mask indexed
        row addresses at query time — the index itself is never
        rewritten by a delete).

        Two mask layers, both bounded:
        - the dataset's CURRENT deletion-vector tombstones broadcast
          (≤128 MB, sources/dataset.py cap) into a left-anti join on
          the stored (_row_file, _row_pos) address;
        - files recorded at build/add time but no longer live (the
          predicate-delete rewrite / compaction / restore cases) —
          a driver-side set difference, usually empty.
        Rows added without addresses (_row_file null) are never
        masked. Unbound indexes (no dataset_path) return unchanged —
        plans stay byte-identical to pre-DV plans."""
        meta = self._meta()
        dp = meta.get("dataset_path")
        if not dp or "_row_file" not in cand.columns:
            return cand
        from lance_flink_spark.sources.dataset import Dataset

        ds = Dataset(dp)
        tomb = ds._dv_tombstones(spark)
        if tomb is not None:
            cand = cand.join(
                F.broadcast(
                    tomb.withColumnsRenamed(
                        {"_file": "_row_file", "_pos": "_row_pos"}
                    )
                ),
                ["_row_file", "_row_pos"],
                "left_anti",
            )
        removed = sorted(
            set(meta.get("dataset_files") or ()) - set(ds.live_file_relpaths())
        )
        if removed:
            cand = cand.filter(
                F.col("_row_file").isNull() | ~F.col("_row_file").isin(removed)
            )
        return cand

    def _dead_ids(
        self, spark: SparkSession, id_col: str, probed: list[int]
    ) -> DataFrame | None:
        """Ids of index entries in the probed lists whose source rows
        are no longer live — the id-space complement of :meth:`_dv_mask`
        for search paths that leave the lists (HNSW graph blobs emit
        bare ids). Scan is partition-pruned to the probed lists, and
        the result is bounded by mutation volume (broadcast-safe: the
        tombstones themselves are ≤128 MB). None when nothing is
        masked."""
        meta = self._meta()
        dp = meta.get("dataset_path")
        if not dp:
            return None
        lists = spark.read.parquet(fsio.join(self.path, "lists")).filter(
            F.col("centroid_id").isin(probed)
        )
        if "_row_file" not in lists.columns:
            return None
        from lance_flink_spark.sources.dataset import Dataset

        ds = Dataset(dp)
        tomb = ds._dv_tombstones(spark)
        dead = None
        if tomb is not None:
            dead = lists.join(
                F.broadcast(
                    tomb.withColumnsRenamed(
                        {"_file": "_row_file", "_pos": "_row_pos"}
                    )
                ),
                ["_row_file", "_row_pos"],
                "left_semi",
            )
        removed = sorted(
            set(meta.get("dataset_files") or ()) - set(ds.live_file_relpaths())
        )
        if removed:
            rm = lists.filter(F.col("_row_file").isin(removed))
            dead = rm if dead is None else dead.unionByName(rm)
        if dead is None:
            return None
        # an id is masked only when NO live copy of it remains: after
        # an update-then-re-add (or a post-compaction resync) the same
        # id has a dead old-address row AND a live new-address row —
        # the live copy must win, or re-indexed rows vanish forever
        live_ids = self._dv_mask(spark, lists).select(id_col).distinct()
        return (
            dead.select(id_col)
            .distinct()
            .join(live_ids, id_col, "left_anti")
        )

    def _probe_lists(
        self, spark: SparkSession, query_vec: list[float], nprobes: int, metric: str = "l2"
    ) -> DataFrame:
        cents = _load_npy(fsio.join(self.path, "centroids.npy"))
        q = np.asarray(query_vec, dtype=np.float64)
        # rank centroids under the search metric (LanceVectorSearch
        # supports L2/COSINE/DOT against any IVF index)
        if metric == "cosine":
            norms = np.linalg.norm(cents, axis=1) * max(np.linalg.norm(q), 1e-12)
            order = (-(cents @ q) / np.maximum(norms, 1e-12)).argsort()
        elif metric == "dot":
            order = (-(cents @ q)).argsort()
        else:
            order = (((cents - q) ** 2).sum(1)).argsort()
        probed = [int(i) for i in order[: min(nprobes, len(cents))]]
        self.check_stale(spark)
        lists = spark.read.parquet(fsio.join(self.path, "lists"))
        # IN-filter on the partition column → directory-level pruning;
        # dataset-bound indexes then mask rows deleted since indexing
        # (no-op otherwise — see _dv_mask)
        return self._dv_mask(spark, lists.filter(F.col("centroid_id").isin(probed)))

    def search(
        self,
        spark: SparkSession,
        query_vec: list[float],
        k: int,
        nprobes: int = 20,
        metric: str = "l2",
        filter: str | None = None,  # noqa: A002
        keep_vector: bool = False,
    ) -> DataFrame:
        """IVF_FLAT search: probe, then exact distances in the probed
        lists only. With nprobes >= nlist this is exact brute force."""
        meta = self._meta()
        cand = self._probe_lists(spark, query_vec, nprobes, metric=metric).drop(
            "centroid_id", "pq_code", "sq_code", "_row_file", "_row_pos"
        )
        return _brute_knn(
            cand, query_vec, k, vec_col=meta["vec_col"], metric=metric,
            filter=filter, keep_vector=keep_vector,
        )

    def search_pq(
        self,
        spark: SparkSession,
        query_vec: list[float],
        k: int,
        nprobes: int = 20,
        refine_factor: int | None = 4,
        metric: str = "l2",
    ) -> DataFrame:
        """IVF_PQ search: ADC over pq codes in probed lists, then exact
        re-scoring of refine_factor*k candidates (vector.refine-factor).

        Metric-aware like the reference's IVF_PQ search: L2 uses the
        squared-residual LUT; DOT reconstructs q·(centroid + residual)
        from a per-sub-vector inner-product LUT; COSINE additionally
        reconstructs the candidate norm from a ``||c_j + cb_j||²`` LUT.
        All three emit ``adc_distance`` in the ascending = closer
        convention (dot negated, cosine as 1 - cos), and the refine
        step re-scores exactly under the same metric."""
        from lance_flink_spark.session import ship_package

        ship_package(spark)
        meta = self._meta()
        if meta["pq_sub_vectors"] is None:
            raise ValueError("index was built without PQ")
        if metric not in ("l2", "cosine", "dot"):
            raise ValueError(f"unsupported metric {metric!r}")
        cents = _load_npy(fsio.join(self.path, "centroids.npy"))
        cb = _load_npy(fsio.join(self.path, "codebooks.npy"))  # (m, ncodes, sub)
        rot = self._rotation(meta)
        q = np.asarray(query_vec, dtype=np.float64)
        m, _, sub = cb.shape
        qn = max(float(np.linalg.norm(q)), 1e-12)
        # with OPQ, codebooks live in rotated residual space; rotating
        # the query side preserves every distance exactly:
        #   ||q - (c + Rᵀr̂)|| = ||R(q-c) - r̂||,  q·Rᵀr̂ = (Rq)·r̂,
        #   ||c + Rᵀr̂||² = ||Rc + r̂||²
        q_r = q if rot is None else rot @ q

        cand = self._probe_lists(spark, query_vec, nprobes, metric=metric)
        cents_b = spark.sparkContext.broadcast(cents)
        cb_b = spark.sparkContext.broadcast(cb)
        rot_b = spark.sparkContext.broadcast(rot)

        @pandas_udf("double")
        def adc(codes: pd.Series, cid: pd.Series) -> pd.Series:
            # per-batch LUTs, computed once per coarse centroid present
            # in the batch, then gathered per code
            codes_m = np.stack(codes.to_numpy())  # (n, m)
            cids = cid.to_numpy()
            out = np.zeros(len(codes_m))
            jj = np.arange(m)[None, :]
            for c_id in np.unique(cids):
                mask = cids == c_id
                c = cents_b.value[c_id]
                if metric == "l2":
                    resid_q = q - c
                    if rot_b.value is not None:
                        resid_q = rot_b.value @ resid_q
                    lut = np.stack(
                        [
                            ((cb_b.value[j] - resid_q[j * sub : (j + 1) * sub]) ** 2).sum(1)
                            for j in range(m)
                        ]
                    )  # (m, ncodes)
                    out[mask] = np.sqrt(lut[jj, codes_m[mask]].sum(1))
                    continue
                # inner product q·(c + resid) decomposes per sub-vector
                lut_ip = np.stack(
                    [cb_b.value[j] @ q_r[j * sub : (j + 1) * sub] for j in range(m)]
                )
                ip = float(q @ c) + lut_ip[jj, codes_m[mask]].sum(1)
                if metric == "dot":
                    out[mask] = -ip
                else:  # cosine: reconstructed norm² is also separable
                    c_r = c if rot_b.value is None else rot_b.value @ c
                    lut_n2 = np.stack(
                        [
                            ((cb_b.value[j] + c_r[j * sub : (j + 1) * sub]) ** 2).sum(1)
                            for j in range(m)
                        ]
                    )
                    norm = np.sqrt(np.maximum(lut_n2[jj, codes_m[mask]].sum(1), 1e-24))
                    out[mask] = 1.0 - ip / (norm * qn)
            return pd.Series(out)

        scored = cand.withColumn("adc_distance", adc(F.col("pq_code"), F.col("centroid_id")))
        if refine_factor:
            short = scored.orderBy("adc_distance").limit(k * refine_factor).drop(
                "adc_distance", "centroid_id", "pq_code", "_row_file", "_row_pos"
            )
            return _brute_knn(short, query_vec, k, vec_col=meta["vec_col"], metric=metric)
        out_cols = [
            c
            for c in scored.columns
            if c
            not in (meta["vec_col"], "pq_code", "centroid_id", "_row_file", "_row_pos")
        ]
        return (
            scored.select(*out_cols, F.round("adc_distance", 6).alias("distance"))
            .orderBy("distance", out_cols[0])
            .limit(k)
        )


    def search_sq(
        self,
        spark: SparkSession,
        query_vec: list[float],
        k: int,
        nprobes: int = 20,
        refine_factor: int | None = 4,
        metric: str = "l2",
    ) -> DataFrame:
        """IVF_SQ search: decode the per-dim uniform codes back to an
        approximate vector per batch (one fused numpy expression — no
        LUT walk, the cheapness that makes SQ attractive), score under
        the metric, then exact re-scoring of refine_factor*k candidates
        exactly like search_pq. ``adc_distance`` keeps the ascending =
        closer convention (dot negated, cosine as 1 - cos)."""
        from lance_flink_spark.session import ship_package

        ship_package(spark)
        meta = self._meta()
        if not meta.get("sq_bits"):
            raise ValueError("index was built without scalar quantization")
        if metric not in ("l2", "cosine", "dot"):
            raise ValueError(f"unsupported metric {metric!r}")
        bounds = _load_npy(fsio.join(self.path, "sq_bounds.npy"))
        levels = (1 << meta["sq_bits"]) - 1
        q = np.asarray(query_vec, dtype=np.float64)
        qn = max(float(np.linalg.norm(q)), 1e-12)
        cand = self._probe_lists(spark, query_vec, nprobes, metric=metric)
        bounds_b = spark.sparkContext.broadcast(bounds)

        @pandas_udf("double")
        def sq_dist(codes: pd.Series) -> pd.Series:
            lo, hi = bounds_b.value
            x = lo + np.stack(codes.to_numpy()) / levels * (hi - lo)
            if metric == "l2":
                d = np.sqrt(((x - q) ** 2).sum(1))
            elif metric == "dot":
                d = -(x @ q)
            else:
                n = np.maximum(np.linalg.norm(x, axis=1), 1e-12)
                d = 1.0 - (x @ q) / (n * qn)
            return pd.Series(d)

        scored = cand.withColumn("adc_distance", sq_dist(F.col("sq_code")))
        if refine_factor:
            short = scored.orderBy("adc_distance").limit(k * refine_factor).drop(
                "adc_distance", "centroid_id", "sq_code", "_row_file", "_row_pos"
            )
            return _brute_knn(short, query_vec, k, vec_col=meta["vec_col"], metric=metric)
        out_cols = [
            c
            for c in scored.columns
            if c
            not in (meta["vec_col"], "sq_code", "centroid_id", "_row_file", "_row_pos")
        ]
        return (
            scored.select(*out_cols, F.round("adc_distance", 6).alias("distance"))
            .orderBy("distance", out_cols[0])
            .limit(k)
        )


def build_hnsw(spark, df, path, **kwargs):
    """IVF_HNSW build (LanceIndexBuilder.java:141-186): IVF coarse
    partitioning with a real HNSW graph per inverted list — see
    index/hnsw.py. Kept here for API parity with LanceIndexBuilder
    IndexType; delegates to HNSWIndex.build."""
    from lance_flink_spark.index.hnsw import HNSWIndex

    return HNSWIndex.build(spark, df, path, **kwargs)
