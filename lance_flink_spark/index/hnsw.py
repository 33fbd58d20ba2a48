"""Distributed IVF_HNSW: a real HNSW graph per IVF list.

Parity: LanceIndexBuilder.java:141-186 (IVF_HNSW with ``index.m`` /
``index.ef-construction``) and LanceVectorSearch's ``vector.ef`` beam.

The reference's IVF_HNSW is IVF coarse partitioning with an HNSW graph
built over each inverted list. That decomposition is exactly what makes
HNSW Spark-shaped: a single *global* graph build is inherently
sequential (every insert navigates the graph built so far), but the
per-list graphs are independent — one ``applyInPandas`` task per
centroid list, executor-parallel, no driver loop. This is the same
segment model Lucene/Elasticsearch use (one HNSW per segment, merged at
query time).

Layout (beside the IVF artifacts under the index root):
    graphs/            parquet: (centroid_id, n, graph binary)
                       one row per list; ``graph`` is an npz blob with
                       ids, levels, CSR adjacency, float32 vectors

Search = partition-pruned read of the probed lists' graph rows →
``mapInPandas`` beam search (ef candidates per list, exact re-scoring
under the requested metric from the blob's own vectors) → global
TakeOrderedAndProject top-k. At 100 TB each graph blob is a few MB
(a list), tasks stream one blob at a time, and only nprobes/nlist of
the blobs are read.

Graph navigation uses L2; the ef-candidate beam is exactly re-scored
under the requested metric (l2/cosine/dot) before the global top-k, so
metric mismatch only costs recall (gated in tests), never wrong
distances on returned rows.

Determinism: node levels come from md5(vec_id), insertion order is
vec_id order, and all ties break on id — two builds over the same list
produce byte-identical blobs (pytest-pinned).
"""

from __future__ import annotations

import hashlib
import heapq
import io
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lance_flink_spark.index.ivf import META, IVFIndex, _load_npy, _stack
from lance_flink_spark.sources import fsio


def _node_level(vid: int, m_l: float) -> int:
    """Geometric level from md5(vec_id) — the paper's floor(-ln(U)·mL)
    with a deterministic, engine-independent U."""
    h = int.from_bytes(hashlib.md5(f"hnsw:{vid}".encode()).digest()[:8], "big")
    u = (h + 1) / float(1 << 64)  # (0, 1]
    return int(-math.log(u) * m_l)


class _Graph:
    """In-memory per-list HNSW: float32 vectors + per-level adjacency."""

    __slots__ = ("ids", "x", "levels", "nbrs", "entry", "max_level")

    def __init__(self, ids, x, levels, nbrs, entry, max_level):
        self.ids = ids          # (n,) int64 original vec_ids
        self.x = x              # (n, dim) float32
        self.levels = levels    # (n,) int16
        self.nbrs = nbrs        # list[node] -> list[level] -> list[int]
        self.entry = entry      # int node index
        self.max_level = max_level


def _search_layer(x, nbrs, q, eps, ef, level, dists):
    """Best-first beam on one layer (HNSW SEARCH-LAYER). ``dists`` is a
    node->distance memo reused across layers; neighbor distances are
    computed with one vectorized numpy gather per expansion."""
    visited = set(eps)
    cand = []   # min-heap (dist, node)
    top = []    # max-heap (-dist, node), size <= ef
    for p in eps:
        if p not in dists:
            d = q - x[p]
            dists[p] = float(d @ d)
        heapq.heappush(cand, (dists[p], p))
        heapq.heappush(top, (-dists[p], p))
    while cand:
        dc, c = heapq.heappop(cand)
        if dc > -top[0][0] and len(top) >= ef:
            break
        nb = [e for e in nbrs[c][level] if e not in visited]
        if not nb:
            continue
        visited.update(nb)
        diff = x[nb] - q
        nd = (diff * diff).sum(1)
        for e, de in zip(nb, nd.tolist()):
            dists[e] = de
            if len(top) < ef or de < -top[0][0]:
                heapq.heappush(cand, (de, e))
                heapq.heappush(top, (-de, e))
                if len(top) > ef:
                    heapq.heappop(top)
    out = [(-nd, e) for nd, e in top]
    out.sort(key=lambda t: (t[0], t[1]))
    return out  # ascending (dist, node)


def _select_neighbors(cands, m):
    """Closest-first truncation (the paper's simple selection); ties on
    node id for determinism. ``cands`` is ascending (dist, node)."""
    return [e for _, e in cands[:m]]


def build_graph(
    ids: np.ndarray,
    x: np.ndarray,
    m: int = 16,
    ef_construction: int = 64,
    max_level: int | None = None,
) -> _Graph:
    """Sequential HNSW build over ONE list (runs inside one executor
    task; the distribution is across lists, not within one).
    ``max_level`` caps node levels (reference option index.max-level,
    config/LanceOptions.java:168-175 / LanceIndexBuilder.java:541,757 —
    bounds per-node memory at a small recall cost on huge lists)."""
    n = len(ids)
    m_l = 1.0 / math.log(max(m, 2))
    order = np.argsort(ids, kind="stable")  # deterministic insertion order
    levels = np.array([_node_level(int(ids[i]), m_l) for i in range(n)], dtype=np.int16)
    if max_level is not None:
        levels = np.minimum(levels, np.int16(max_level))
    nbrs = [[[] for _ in range(int(levels[i]) + 1)] for i in range(n)]
    xf = x.astype(np.float64)
    entry, max_level = -1, -1
    for i in order.tolist():
        li = int(levels[i])
        if entry < 0:
            entry, max_level = i, li
            continue
        q = xf[i]
        dists: dict[int, float] = {}
        eps = [entry]
        for lc in range(max_level, li, -1):
            eps = [_search_layer(xf, nbrs, q, eps, 1, lc, dists)[0][1]]
        for lc in range(min(li, max_level), -1, -1):
            w = _search_layer(xf, nbrs, q, eps, ef_construction, lc, dists)
            mmax = m * 2 if lc == 0 else m
            sel = _select_neighbors(w, m)
            nbrs[i][lc] = list(sel)
            for e in sel:
                ne = nbrs[e][lc]
                ne.append(i)
                if len(ne) > mmax:
                    # shrink: keep the mmax closest to e (ties on id)
                    diff = xf[ne] - xf[e]
                    dd = (diff * diff).sum(1)
                    keep = sorted(zip(dd.tolist(), ne))[:mmax]
                    nbrs[e][lc] = [v for _, v in keep]
            eps = [nd for _, nd in w]
        if li > max_level:
            entry, max_level = i, li
    return _Graph(ids.astype(np.int64), x.astype(np.float32), levels, nbrs, entry, max_level)


def serialize_graph(g: _Graph) -> bytes:
    """CSR-flattened npz blob (no pickle: stable across Python builds)."""
    counts, flat = [], []
    for i in range(len(g.ids)):
        for lc in range(int(g.levels[i]) + 1):
            counts.append(len(g.nbrs[i][lc]))
            flat.extend(g.nbrs[i][lc])
    buf = io.BytesIO()
    np.savez(
        buf,
        ids=g.ids,
        x=g.x,
        levels=g.levels,
        counts=np.array(counts, dtype=np.int32),
        flat=np.array(flat, dtype=np.int32),
        entry=np.array([g.entry, g.max_level], dtype=np.int32),
    )
    return buf.getvalue()


def deserialize_graph(blob: bytes) -> _Graph:
    z = np.load(io.BytesIO(blob))
    ids, x, levels = z["ids"], z["x"], z["levels"]
    counts, flat = z["counts"], z["flat"]
    entry, max_level = int(z["entry"][0]), int(z["entry"][1])
    nbrs, ci, fi = [], 0, 0
    for i in range(len(ids)):
        per = []
        for _ in range(int(levels[i]) + 1):
            c = int(counts[ci]); ci += 1
            per.append(flat[fi : fi + c].tolist()); fi += c
        nbrs.append(per)
    return _Graph(ids, x, levels, nbrs, entry, max_level)


def search_graph(g: _Graph, q: np.ndarray, ef: int) -> list[tuple[float, int]]:
    """Beam search one graph: greedy descent to layer 1, ef-beam at
    layer 0. Returns ascending (l2², node-index) for the ef beam."""
    if g.entry < 0 or len(g.ids) == 0:
        return []
    xf = g.x.astype(np.float64)
    dists: dict[int, float] = {}
    eps = [g.entry]
    for lc in range(g.max_level, 0, -1):
        eps = [_search_layer(xf, g.nbrs, q, eps, 1, lc, dists)[0][1]]
    return _search_layer(xf, g.nbrs, q, eps, ef, 0, dists)


GRAPH_SCHEMA = "centroid_id int, n long, graph binary"


def _graph_builder(
    vec_col: str,
    id_col: str,
    m: int,
    ef_construction: int,
    normalize: bool = False,
    max_level: int | None = None,
):
    """applyInPandas body shared by build() and add(): one list in →
    one serialized graph row out. ``normalize`` stores L2-normalized
    vectors so the l2 navigation order coincides with cosine order
    (unit sphere: l2² = 2 − 2·cos)."""

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="stable")
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        x = _stack(pdf[vec_col])
        if normalize:
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        g = build_graph(
            ids, x.astype(np.float32), m=m,
            ef_construction=ef_construction, max_level=max_level,
        )
        return pd.DataFrame(
            {
                "centroid_id": [int(pdf["centroid_id"].iloc[0])],
                "n": [len(ids)],
                "graph": [serialize_graph(g)],
            }
        )

    return _build


class HNSWIndex:
    """IVF_HNSW over an IVFIndex layout + per-list graph blobs."""

    def __init__(self, path: str, on_stale: str = "error"):
        self.path = path
        # the underlying IVF layout carries the staleness guard; HNSW
        # search entries route its self-heal through THIS resync so the
        # affected lists' graphs are rebuilt, not just the lists
        self.ivf = IVFIndex(path, on_stale=on_stale)

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        df: DataFrame,
        path: str,
        vec_col: str = "embedding",
        nlist: int = 16,
        m: int = 16,
        ef_construction: int = 64,
        id_col: str | None = None,
        metric: str = "l2",
        max_level: int | None = None,
        **ivf_kwargs,
    ) -> "HNSWIndex":
        """IVF coarse build, then one HNSW graph per inverted list via
        applyInPandas — each list's build is a single executor task, so
        graph construction parallelism = nlist (the 100 TB path: lists
        are bounded by write-time sizing, tasks stay uniform).

        ``id_col`` names the integer row-id column embedded in the
        blobs; default: ``vec_id`` if present, else the first integer
        column that isn't the vector.

        ``metric``: ``l2`` builds over raw vectors (cosine/dot searches
        re-score the beam — recall-only cost); ``cosine`` stores
        L2-normalized vectors so navigation order IS cosine order
        (unit sphere: l2² = 2 − 2·cos) — a cosine-built index serves
        cosine searches only."""
        from lance_flink_spark.session import ship_package

        ship_package(spark)
        if metric not in ("l2", "cosine"):
            raise ValueError(f"hnsw build metric must be l2 or cosine, got {metric!r}")
        if df is None and ivf_kwargs.get("dataset") is not None:
            df = ivf_kwargs["dataset"].keyed_read(spark)
        if id_col is None:
            ints = [
                f.name
                for f in df.schema.fields
                if f.dataType.typeName() in ("long", "integer")
                and f.name not in (vec_col, "_row_pos")
            ]
            if "vec_id" in ints:
                id_col = "vec_id"
            elif len(ints) == 1:
                id_col = ints[0]
            else:
                raise ValueError(
                    "cannot infer the row-id column: pass id_col= explicitly "
                    f"(integer candidates: {ints or 'none'})"
                )
        IVFIndex.build(spark, df, path, vec_col=vec_col, nlist=nlist, **ivf_kwargs)
        lists = spark.read.parquet(fsio.join(path, "lists"))
        (
            lists.groupBy("centroid_id")
            .applyInPandas(
                _graph_builder(
                    vec_col, id_col, m, ef_construction,
                    normalize=metric == "cosine", max_level=max_level,
                ),
                GRAPH_SCHEMA,
            )
            .write.partitionBy("centroid_id")
            .mode("overwrite")
            .parquet(fsio.join(path, "graphs"))
        )
        meta = fsio.read_json(fsio.join(path, META))
        meta.update(
            {
                "hnsw_m": m,
                "hnsw_ef_construction": ef_construction,
                "hnsw_id_col": id_col,
                "hnsw_metric": metric,
                "hnsw_max_level": max_level,
            }
        )
        fsio.write_json_atomic(fsio.join(path, META), meta)
        return cls(path)

    def add(self, spark: SparkSession, df: DataFrame) -> int:
        """Incremental insert (Lance's index-update path): assign +
        append through the IVF layer, then rebuild graphs ONLY for the
        lists that received vectors — per-list graphs are independent,
        so the rebuild is a dynamic partition overwrite of the touched
        ``centroid_id`` partitions of graphs/. Cost ∝ touched lists,
        not index size. Returns the number of rebuilt lists.

        Crash safety: a ``hnsw_graphs_pending`` marker is committed to
        the index META *before* the list append. A crash between the
        append and the graph rebuild would otherwise leave graphs/
        silently stale (search reads only graphs/, so appended vectors
        would be invisible); with the marker, search/knn_join refuse to
        serve until :meth:`repair` reconciles graphs with lists."""
        from lance_flink_spark.session import ship_package

        ship_package(spark)
        meta = fsio.read_json(fsio.join(self.path, META))
        meta["hnsw_graphs_pending"] = True
        fsio.write_json_atomic(fsio.join(self.path, META), meta)
        # the IVF append assigns ONCE (materialized) and reports which
        # lists actually received rows — a non-deterministic input
        # frame cannot leave a list updated but its graph stale
        affected = self.ivf.add(spark, df)
        self._rebuild_graphs(spark, meta, affected)
        meta.pop("hnsw_graphs_pending", None)
        fsio.write_json_atomic(fsio.join(self.path, META), meta)
        return len(affected)

    def _rebuild_graphs(self, spark: SparkSession, meta: dict, centroid_ids) -> None:
        """Dynamic partition overwrite of the given graphs/ partitions
        from the current lists/ contents (shared by add, resync and
        repair). Dataset-bound indexes rebuild from the MASKED rows
        (dead addresses excluded), so a rebuilt graph carries no stale
        node for an updated-then-re-added id — the one case the
        id-space query mask cannot distinguish (the id has a live
        copy, so it must not be masked, yet the stale node would
        surface near the OLD location with a stale distance)."""
        vec_col, id_col = meta["vec_col"], meta.get("hnsw_id_col", "vec_id")
        lists = self.ivf._dv_mask(
            spark,
            spark.read.parquet(fsio.join(self.path, "lists")).filter(
                F.col("centroid_id").isin(list(centroid_ids))
            ),
        )
        old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                lists.groupBy("centroid_id")
                .applyInPandas(
                    _graph_builder(
                        vec_col,
                        id_col,
                        meta["hnsw_m"],
                        meta["hnsw_ef_construction"],
                        normalize=meta.get("hnsw_metric", "l2") == "cosine",
                        max_level=meta.get("hnsw_max_level"),
                    ),
                    GRAPH_SCHEMA,
                )
                .write.partitionBy("centroid_id")
                .mode("overwrite")
                .parquet(fsio.join(self.path, "graphs"))
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)

    def ingest(self, spark: SparkSession, df: DataFrame) -> int:
        """Append rows to the bound dataset, then fold them in via
        :meth:`resync` (graph-rebuilding) — see IVFIndex.ingest for the
        maskability contract. Returns the number of rebuilt lists."""
        meta = fsio.read_json(fsio.join(self.path, META))
        dp = meta.get("dataset_path")
        if not dp:
            raise ValueError("index is not dataset-bound — use add() directly")
        from lance_flink_spark.sources.dataset import Dataset

        Dataset(dp).write(df, mode="append")
        return self.resync(spark)

    def resync(self, spark: SparkSession) -> int:
        """Catch a dataset-bound graph index up with its Dataset (see
        IVFIndex.resync): the keyed delta folds through :meth:`add`
        (touched lists' graphs rebuild, dead rows excluded), and lists
        still holding DEAD rows are rebuilt too — the Lucene
        "merge segments with deletes" maintenance step, so no rebuilt
        graph navigates through stale nodes. Returns the number of
        rebuilt lists (0 when current)."""
        new = self.ivf._resync_delta(spark)
        n_added = self.add(spark, new) if new is not None else 0
        # purge dead rows out of the lists, then rebuild exactly the
        # purged lists' graphs from the now-clean rows; a fully-purged
        # list's graph partition is deleted outright. Purging (not just
        # masked rebuilding) keeps resync idempotent: dead rows no
        # longer linger to re-trigger rebuilds on every call.
        purged = self.ivf.purge_dead(spark)
        if purged:
            meta = fsio.read_json(fsio.join(self.path, META))
            base = fsio.join(self.path, "lists")
            alive = [
                cid
                for cid in purged
                if fsio.exists(fsio.join(base, f"centroid_id={cid}"))
            ]
            if alive:
                self._rebuild_graphs(spark, meta, alive)
            for cid in purged:
                if cid not in alive:
                    fsio.delete(
                        fsio.join(self.path, "graphs", f"centroid_id={cid}")
                    )
        return n_added + len(purged)

    def repair(self, spark: SparkSession) -> list[int]:
        """Reconcile graphs/ with lists/ after an interrupted add:
        compares per-list row counts in lists/ against the ``n``
        recorded in each graph row (column-pruned — blobs aren't read)
        and rebuilds every missing or count-drifted graph, then clears
        the ``hnsw_graphs_pending`` marker. Returns rebuilt list ids.
        Idempotent; cost ∝ drifted lists."""
        from lance_flink_spark.session import ship_package

        ship_package(spark)
        meta = fsio.read_json(fsio.join(self.path, META))
        lc = (
            spark.read.parquet(fsio.join(self.path, "lists"))
            .groupBy("centroid_id")
            .count()
        )
        gc = spark.read.parquet(fsio.join(self.path, "graphs")).select(
            "centroid_id", "n"
        )
        stale = sorted(
            int(r["centroid_id"])
            for r in lc.join(gc, "centroid_id", "left")
            .where(F.col("n").isNull() | (F.col("n") != F.col("count")))
            .select("centroid_id")
            .collect()
        )
        if stale:
            self._rebuild_graphs(spark, meta, stale)
        meta.pop("hnsw_graphs_pending", None)
        fsio.write_json_atomic(fsio.join(self.path, META), meta)
        return stale

    @staticmethod
    def _check_not_pending(meta: dict) -> None:
        if meta.get("hnsw_graphs_pending"):
            raise RuntimeError(
                "index has a pending graph rebuild (an add() was interrupted "
                "between the list append and the graph rebuild); appended "
                "vectors are invisible to graph search until repaired — call "
                "HNSWIndex.repair(spark) to reconcile graphs with lists"
            )

    def compact(self, spark: SparkSession, min_files: int = 2) -> list[int]:
        """Compact list partitions fragmented by incremental ``add``
        (delegates to IVFIndex.compact_lists). The graph side never
        fragments: each rebuild dynamically OVERWRITES the touched
        ``graphs/`` partitions with a single one-row-per-list file, so
        only the appended ``lists/`` side accumulates small files."""
        return self.ivf.compact_lists(spark, min_files=min_files)

    def knn_join(
        self,
        spark: SparkSession,
        queries_df: DataFrame,
        k: int,
        nprobes: int = 4,
        ef: int = 64,
        query_id: str = "query_id",
        query_vec_col: str = "embedding",
        metric: str = "l2",
        round_to: int = 6,
    ) -> DataFrame:
        """Batch ANN join through the graphs — the high-recall analogue
        of IVFIndex.knn_join: queries are assigned their nprobes
        nearest centroids (one Arrow pass), then COGROUPED with the
        graph blobs on centroid_id; each task beam-searches one list's
        graph for all queries routed to it (per-list graph loaded once
        per task, not once per query). Output ranks through the same
        rank_top_k contract as the brute join."""
        from lance_flink_spark.operators.similarity import rank_top_k
        from lance_flink_spark.session import ship_package

        ship_package(spark)
        self.ivf.check_stale(spark, resync_fn=self.resync)
        meta = fsio.read_json(fsio.join(self.path, META))
        self._check_not_pending(meta)
        built = meta.get("hnsw_metric", "l2")
        if metric not in ("l2", "cosine", "dot"):
            raise ValueError(f"unsupported metric {metric!r}")
        if built == "cosine" and metric != "cosine":
            raise ValueError(
                "index was built with metric=cosine; only cosine searches are valid"
            )
        cents = _load_npy(fsio.join(self.path, "centroids.npy"))
        cents_b = spark.sparkContext.broadcast(cents)
        np_ = min(nprobes, len(cents))
        ef_eff = max(ef, k)
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<int>")
        def probe_cents(v: pd.Series) -> pd.Series:
            x = _stack(v)
            c = cents_b.value
            s = x @ c.T
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
        probed = [int(r[0]) for r in q.select("centroid_id").distinct().collect()]
        graphs = spark.read.parquet(fsio.join(self.path, "graphs")).filter(
            F.col("centroid_id").isin(probed)
        )

        def _join(qpdf: pd.DataFrame, gpdf: pd.DataFrame) -> pd.DataFrame:
            if gpdf.empty or qpdf.empty:
                return pd.DataFrame(
                    {"query_id": pd.Series(dtype="int64"),
                     "neighbor_id": pd.Series(dtype="int64"),
                     "distance": pd.Series(dtype="float64")}
                )
            g = deserialize_graph(bytes(gpdf["graph"].iloc[0]))
            out_q, out_n, out_d = [], [], []
            for qid, qv in zip(qpdf["__qid"], qpdf["__qvec"]):
                qa = np.asarray(qv, dtype=np.float64)
                beam = search_graph(g, qa, ef_eff)
                if not beam:
                    continue
                nodes = np.array([nd for _, nd in beam], dtype=np.int64)
                vx = g.x[nodes].astype(np.float64)
                if metric == "l2":
                    d = np.sqrt(((vx - qa) ** 2).sum(1))
                elif metric == "cosine":
                    nv = np.linalg.norm(vx, axis=1) * max(np.linalg.norm(qa), 1e-12)
                    d = 1.0 - (vx @ qa) / np.maximum(nv, 1e-12)
                else:
                    d = -(vx @ qa)
                out_q.extend([qid] * len(nodes))
                out_n.extend(g.ids[nodes].tolist())
                out_d.extend(d.tolist())
            return pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "distance": out_d}
            )

        scored = (
            q.groupBy("centroid_id")
            .cogroup(graphs.groupBy("centroid_id"))
            .applyInPandas(_join, "query_id long, neighbor_id long, distance double")
            .select(
                F.col("query_id").alias(query_id),
                "neighbor_id",
                F.round("distance", round_to).alias("distance"),
            )
        )
        dead = self.ivf._dead_ids(
            spark, meta.get("hnsw_id_col", "vec_id"), probed
        )
        if dead is not None:
            scored = scored.join(
                F.broadcast(
                    dead.withColumnRenamed(
                        meta.get("hnsw_id_col", "vec_id"), "neighbor_id"
                    )
                ),
                "neighbor_id",
                "left_anti",
            )
        return rank_top_k(scored, k, query_id=query_id)

    def search(
        self,
        spark: SparkSession,
        query_vec: list[float],
        k: int,
        nprobes: int = 4,
        ef: int = 64,
        metric: str = "l2",
    ) -> DataFrame:
        """Probe nprobes lists' graphs (partition-pruned parquet read of
        the blob rows), beam-search each in mapInPandas, exact-rescore
        the per-list ef beams under ``metric``, global top-k."""
        from lance_flink_spark.session import ship_package

        ship_package(spark)
        self.ivf.check_stale(spark, resync_fn=self.resync)
        if metric not in ("l2", "cosine", "dot"):
            raise ValueError(f"unsupported metric {metric!r}")
        meta = fsio.read_json(fsio.join(self.path, META))
        self._check_not_pending(meta)
        id_col = meta.get("hnsw_id_col", "vec_id")
        built = meta.get("hnsw_metric", "l2")
        if built == "cosine" and metric != "cosine":
            raise ValueError(
                "index was built with metric=cosine (normalized vectors); "
                f"{metric!r} distances would be wrong — build with metric=l2 "
                "for l2/dot searches"
            )
        cents = _load_npy(fsio.join(self.path, "centroids.npy"))
        q = np.asarray(query_vec, dtype=np.float64)
        if metric == "cosine":
            norms = np.linalg.norm(cents, axis=1) * max(np.linalg.norm(q), 1e-12)
            order = (-(cents @ q) / np.maximum(norms, 1e-12)).argsort()
        elif metric == "dot":
            order = (-(cents @ q)).argsort()
        else:
            order = (((cents - q) ** 2).sum(1)).argsort()
        probed = [int(i) for i in order[: min(nprobes, len(cents))]]
        graphs = spark.read.parquet(fsio.join(self.path, "graphs")).filter(
            F.col("centroid_id").isin(probed)
        )
        ef_eff = max(ef, k)
        qv = q.copy()

        def _probe(batches):
            for pdf in batches:
                out_ids: list[int] = []
                out_d: list[float] = []
                for blob in pdf["graph"]:
                    g = deserialize_graph(bytes(blob))
                    beam = search_graph(g, qv, ef_eff)
                    if not beam:
                        continue
                    nodes = np.array([nd for _, nd in beam], dtype=np.int64)
                    vx = g.x[nodes].astype(np.float64)
                    if metric == "l2":
                        d = np.sqrt(((vx - qv) ** 2).sum(1))
                    elif metric == "cosine":
                        nv = np.linalg.norm(vx, axis=1) * max(np.linalg.norm(qv), 1e-12)
                        d = 1.0 - (vx @ qv) / np.maximum(nv, 1e-12)
                    else:  # dot: ascending = closer convention
                        d = -(vx @ qv)
                    out_ids.extend(g.ids[nodes].tolist())
                    out_d.extend(d.tolist())
                yield pd.DataFrame({id_col: out_ids, "distance": out_d})

        out = graphs.mapInPandas(_probe, f"{id_col} long, distance double")
        # dataset-bound masking: graph blobs emit bare ids, so the mask
        # is the id-space complement (probed lists' dead ids, broadcast)
        dead = self.ivf._dead_ids(spark, id_col, probed)
        if dead is not None:
            out = out.join(F.broadcast(dead), id_col, "left_anti")
        return (
            out.select(id_col, F.round("distance", 6).alias("distance"))
            .orderBy("distance", id_col)
            .limit(k)
        )
