"""Reference index/search option surface → index build/search arguments.

Parity with LanceOptions.java:118-238 (index.type / index.column /
index.num-partitions / index.num-sub-vectors / index.num-bits /
index.max-level / index.m / index.ef-construction, vector.metric /
vector.nprobes / vector.ef / vector.refine-factor) so every WITH(...)
config from the reference's SQL demos (flink-sql-demo.sql:85-99)
executes here.

IVF_HNSW routes to a REAL per-list HNSW graph (index/hnsw.py — the
reference's own decomposition: IVF coarse partitioning, an HNSW per
inverted list):

- ``index.m`` → graph degree, ``index.ef-construction`` → build beam.
- ``vector.ef`` (default 100) → search beam width at layer 0.
- ``vector.nprobes`` → probed lists (default 20, the reference's own
  nprobes default; values above nlist probe everything).
- ``index.max-level`` caps per-node levels (levels otherwise derive
  from md5(vec_id) geometrically at 1/ln(m) scale, which already
  self-limits to ~log_m(list size); the cap bounds worst-case node
  memory on huge lists, at a small recall cost).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lance_flink_spark.index.ivf import IVFIndex

_INDEX_TYPES = ("IVF_FLAT", "IVF_PQ", "IVF_HNSW", "IVF_SQ")


def _geti(opts: dict, key: str, default: int | None) -> int | None:
    return int(opts[key]) if key in opts else default


def build_args_from_options(opts: dict) -> dict:
    """WITH(...)-style option strings → IVFIndex/HNSWIndex.build kwargs."""
    itype = opts.get("index.type", "IVF_PQ").upper()
    if itype not in _INDEX_TYPES:
        raise ValueError(
            f"Unsupported index type: {itype}, supported types: "
            "IVF_PQ, IVF_HNSW, IVF_FLAT, IVF_SQ"
        )
    args: dict = {
        "vec_col": opts.get("index.column", opts.get("vector.column", "embedding")),
        "nlist": _geti(opts, "index.num-partitions", 256),
    }
    if itype == "IVF_PQ":
        args["pq_sub_vectors"] = _geti(opts, "index.num-sub-vectors", 16)
        args["pq_bits"] = _geti(opts, "index.num-bits", 8)
        # extension key (not in LanceOptions): deterministic OPQ-style
        # residual rotation before the sub-vector split
        if str(opts.get("index.opq", "false")).lower() in ("true", "1"):
            args["opq"] = True
    if itype == "IVF_SQ":
        # Lance's scalar-quantization variant (per-dim uniform codes)
        args["sq_bits"] = _geti(opts, "index.num-bits", 8)
    if itype == "IVF_HNSW":
        args["m"] = _geti(opts, "index.m", 16)
        args["ef_construction"] = _geti(opts, "index.ef-construction", 100)
        args["max_level"] = _geti(opts, "index.max-level", None)
        # cosine configs get the cosine-NATIVE graph (normalized
        # vectors: navigation order == cosine order); l2/dot navigate
        # raw vectors and re-score the beam
        if opts.get("vector.metric", "L2").lower() == "cosine":
            args["metric"] = "cosine"
    return args


def search_args_from_options(opts: dict) -> dict:
    """WITH(...)-style option strings → search kwargs (metric, nprobes,
    plus ef for HNSW / refine factor for PQ)."""
    itype = opts.get("index.type", "IVF_PQ").upper()
    metric = opts.get("vector.metric", "L2").lower()
    if metric not in ("l2", "cosine", "dot"):
        raise ValueError(f"unsupported vector.metric {metric!r}")
    out = {"metric": metric, "nprobes": _geti(opts, "vector.nprobes", 20)}
    if itype == "IVF_HNSW":
        out["ef"] = _geti(opts, "vector.ef", 100)
    refine = _geti(opts, "vector.refine-factor", None)
    if refine is not None:
        out["refine_factor"] = refine
    return out


def build_index_from_options(
    spark: SparkSession, df: DataFrame, path: str, opts: dict, dataset=None
):
    """Build an index from the reference's option-string surface:
    IVF_HNSW → HNSWIndex (per-list graphs), else IVFIndex.

    ``dataset`` binds the index to a Dataset (pass ``df=None``): index
    entries carry row addresses and every search masks rows deleted
    after the build — the SQL surface (CREATE INDEX / vector_search)
    builds bound so a SQL DELETE is immediately search-visible."""
    args = build_args_from_options(opts)
    if opts.get("index.type", "IVF_PQ").upper() == "IVF_HNSW":
        from lance_flink_spark.index.hnsw import HNSWIndex

        return HNSWIndex.build(spark, df, path, dataset=dataset, **args)
    return IVFIndex.build(spark, df, path, dataset=dataset, **args)


def search_index_with_options(
    spark: SparkSession,
    idx,
    query_vec: list[float],
    k: int,
    opts: dict,
) -> DataFrame:
    """Search under the reference's option surface. Dispatch follows
    the index's OWN metadata (not the caller's option dict): HNSW
    graphs → beam search with vector.ef; PQ codes → ADC + refine;
    flat → metric-aware probing."""
    from lance_flink_spark.index.hnsw import HNSWIndex

    args = search_args_from_options(opts)
    if isinstance(idx, str):
        meta = IVFIndex(idx)._meta()
        idx = HNSWIndex(idx) if "hnsw_m" in meta else IVFIndex(idx)
    meta = idx._meta() if isinstance(idx, IVFIndex) else idx.ivf._meta()
    if "hnsw_m" in meta:
        hidx = idx if isinstance(idx, HNSWIndex) else HNSWIndex(idx.path)
        return hidx.search(
            spark, query_vec, k,
            nprobes=args["nprobes"],
            ef=args.get("ef", 100),
            metric=args["metric"],
        )
    if meta.get("sq_bits"):
        return idx.search_sq(
            spark, query_vec, k,
            nprobes=args["nprobes"],
            refine_factor=args.get("refine_factor", 4),
            metric=args["metric"],
        )
    if meta["pq_sub_vectors"]:
        return idx.search_pq(
            spark, query_vec, k,
            nprobes=args["nprobes"],
            refine_factor=args.get("refine_factor", 4),
            metric=args["metric"],
        )
    return idx.search(
        spark, query_vec, k, nprobes=args["nprobes"], metric=args["metric"]
    )
