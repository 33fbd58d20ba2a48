"""Reference index/search option surface → IVF build/search arguments.

Parity with LanceOptions.java:118-238 (index.type / index.column /
index.num-partitions / index.num-sub-vectors / index.num-bits /
index.max-level / index.m / index.ef-construction, vector.metric /
vector.nprobes / vector.ef / vector.refine-factor) so every WITH(...)
config from the reference's SQL demos (flink-sql-demo.sql:85-99)
executes here.

IVF_HNSW mapping (documented; SURVEY §6): a true HNSW graph build is
driver-sequential — the wrong shape for Spark — so the HNSW quality
knobs translate onto the IVF + exact-refine path that serves the same
high-recall need:

- ``vector.ef`` (search beam width, default 100) → ``nprobes``:
  ef/5, so the reference defaults (ef=100) land on the reference's own
  default nprobes=20. Wider beam == more probed lists — both parameters
  trade latency for candidate coverage linearly.
- ``index.m`` (graph degree, default 16) → ``refine_factor``: m/8.
  Higher degree == more edges to exact-score per hop in HNSW; here,
  more shortlisted candidates re-scored exactly.
- ``index.ef-construction`` / ``index.max-level`` govern build-time
  graph quality; the IVF analog is centroid quality, so ef-construction
  scales the k-means iteration budget (ef_c/10, min 10).

An explicit ``vector.nprobes`` / ``vector.refine-factor`` always wins
over the derived values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lance_flink_spark.index.ivf import IVFIndex

_INDEX_TYPES = ("IVF_FLAT", "IVF_PQ", "IVF_HNSW")


def _geti(opts: dict, key: str, default: int | None) -> int | None:
    return int(opts[key]) if key in opts else default


def build_args_from_options(opts: dict) -> dict:
    """WITH(...)-style option strings → IVFIndex.build kwargs."""
    itype = opts.get("index.type", "IVF_PQ").upper()
    if itype not in _INDEX_TYPES:
        raise ValueError(
            f"Unsupported index type: {itype}, supported types: IVF_PQ, IVF_HNSW, IVF_FLAT"
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
    if itype == "IVF_HNSW":
        ef_c = _geti(opts, "index.ef-construction", 100)
        args["kmeans_iters"] = max(10, ef_c // 10)
    return args


def search_args_from_options(opts: dict) -> dict:
    """WITH(...)-style option strings → IVFIndex.search kwargs
    (metric, nprobes, refine factor where the index type uses one)."""
    itype = opts.get("index.type", "IVF_PQ").upper()
    metric = opts.get("vector.metric", "L2").lower()
    if metric not in ("l2", "cosine", "dot"):
        raise ValueError(f"unsupported vector.metric {metric!r}")
    ef = _geti(opts, "vector.ef", 100)
    m = _geti(opts, "index.m", 16)
    nprobes = _geti(opts, "vector.nprobes", None)
    if nprobes is None:
        # HNSW beam width → probed lists; reference defaults align
        # (ef=100 → nprobes=20, LanceOptions' own nprobes default)
        nprobes = max(1, ef // 5) if itype == "IVF_HNSW" else 20
    refine = _geti(opts, "vector.refine-factor", None)
    if refine is None and itype == "IVF_HNSW":
        refine = max(2, m // 8)
    out = {"metric": metric, "nprobes": nprobes}
    if refine is not None:
        out["refine_factor"] = refine
    return out


def build_index_from_options(
    spark: SparkSession, df: DataFrame, path: str, opts: dict
) -> IVFIndex:
    """Build an index from the reference's option-string surface."""
    return IVFIndex.build(spark, df, path, **build_args_from_options(opts))


def search_index_with_options(
    spark: SparkSession,
    idx: IVFIndex,
    query_vec: list[float],
    k: int,
    opts: dict,
) -> DataFrame:
    """Search under the reference's option surface: PQ indexes go
    through ADC + refine (vector.refine-factor / derived from index.m);
    flat indexes through metric-aware probing (vector.metric,
    nprobes derived from vector.ef for IVF_HNSW configs)."""
    args = search_args_from_options(opts)
    if idx._meta()["pq_sub_vectors"]:
        return idx.search_pq(
            spark, query_vec, k,
            nprobes=args["nprobes"],
            refine_factor=args.get("refine_factor", 4),
            metric=args["metric"],
        )
    return idx.search(
        spark, query_vec, k, nprobes=args["nprobes"], metric=args["metric"]
    )
