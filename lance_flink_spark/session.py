"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]`` but every conf here is chosen for a
multi-executor cluster: AQE (runtime coalescing + skew-join splitting),
Arrow for any pandas-UDF exchange, and a shuffle-partition count that
callers override to ~2-3x total cluster cores at real scale.
"""

from __future__ import annotations

import os
import threading as _threading

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "lance_flink_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    On a real cluster, drop ``master`` (spark-submit provides it) and
    raise ``shuffle_partitions`` to ~2-3x total cores; AQE coalesces
    the excess at runtime so over-provisioning is cheap.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # respect the advisory target size when coalescing instead of
        # keeping ~1 partition per core: a micro-batch/small shuffle
        # collapses to the few tasks its bytes justify (a 1,200-row
        # frame stops fanning out to 32 tasks of pure scheduling
        # overhead), while a 100 TB shuffle still yields thousands of
        # partitions from the same size rule — the scale-adaptive
        # setting Spark's own AQE docs recommend for production
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"),
        )
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_AQE_ADVISORY_SIZE", "64m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # size scan splits to the MACHINE without capping them for big
        # data: minPartitionNum asks the split planner for ≥ 2×cores
        # splits (maxSplitBytes = min(maxPartitionBytes, max(openCost,
        # totalBytes/minPartitionNum)) — FilePartition.scala), so a
        # single small parquet file still fans out to every core
        # (measured: q1 0.67→0.32s, sql_join_agg 1.19→0.72s,
        # agg_approx 3.68→2.96s, matview_incremental 4.55→3.84s at
        # sf0.1; the binding default was openCostInBytes=4m) while a
        # 100 TB scan keeps the 128 MB per-task ceiling instead of
        # exploding into millions of tiny tasks — an earlier build
        # hardcoded maxPartitionBytes=1m, which inverts at scale.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"),
        )
        .config(
            "spark.sql.files.minPartitionNum",
            os.environ.get(
                "SPARK_GRAFT_MIN_PARTITION_NUM", str(2 * int(cpus))
            ),
        )
        .config("spark.sql.files.openCostInBytes", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


_SHIP_LOCK = _threading.Lock()
_SHIPPED: set = set()


def ship_package(spark: SparkSession) -> None:
    """Make ``lance_flink_spark`` importable on executor Python workers.

    Module-level functions referenced from pandas UDFs / mapInPandas /
    applyInPandasWithState are pickled BY REFERENCE, so workers must
    import this package — which fails when the driver's cwd isn't the
    repo root (e.g. the verification harness). Zip the package once per
    application and addPyFile it. The once-guard is a PROCESS-global
    set under a lock, NOT a Spark local property: local properties are
    thread-local, so overlapped driver work (concurrent fragment-write
    / deletion-resolve actions, pre-commit side-writes) re-entered
    addPyFile from pool threads and raced CPython's
    ``importlib.invalidate_caches`` (KeyError in zipimport cache
    invalidation)."""
    sc = spark.sparkContext
    app = sc.applicationId
    if app in _SHIPPED:
        return
    with _SHIP_LOCK:
        if app in _SHIPPED:
            return
        import zipfile

        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        out_dir = os.path.join(os.path.dirname(pkg_dir), ".scratch")
        os.makedirs(out_dir, exist_ok=True)
        zip_path = os.path.join(out_dir, "lance_flink_spark_pkg.zip")
        with zipfile.ZipFile(zip_path, "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        z.write(
                            full,
                            os.path.relpath(full, os.path.dirname(pkg_dir)),
                        )
        sc.addPyFile(zip_path)
        _SHIPPED.add(app)


#: broadcasts created per distributed native call (_task_frame payload
#: lists): without explicit release, cleanup rides Python GC + the
#: ContextCleaner's weak refs, and a long-running driver issuing many
#: read_distributed/read_changes calls accumulates block-manager
#: entries between GC cycles (r15 advice). unpersist() only drops the
#: executor/block-manager copies — the driver keeps the value, so a
#: later re-execution of a frame that still references the broadcast
#: transparently re-ships it (destroy() would NOT be safe here).
_TRACKED_BROADCASTS: list = []


def track_broadcast(bc) -> None:
    """Register a broadcast for release at the next unpersist_all."""
    _TRACKED_BROADCASTS.append(bc)


def unpersist_all(spark: SparkSession, blocking: bool = False) -> int:
    """Drop every persisted RDD/DataFrame block in the session.

    Several operators (MinHash/ngram/embedding dedup, index knn_join)
    persist() an intermediate that the RETURNED lazy frame still
    references, so they cannot unpersist it themselves — the caller
    owns the lifetime. In a long-lived session interleaving many such
    calls, invoke this between pipelines (after the results are
    materialized) to release executor storage memory. Returns the
    number of RDDs dropped. Async by default: unpersist(blocking=False)
    is near-free, vs catalog.clearCache() (~0.3 s/call measured).

    Also releases the tracked task-frame broadcasts (see
    ``track_broadcast``) — executor copies only; frames re-executed
    later re-ship from the driver-held value on demand."""
    while _TRACKED_BROADCASTS:
        try:
            _TRACKED_BROADCASTS.pop().unpersist(blocking)
        except Exception:  # noqa: BLE001 - cleanup is best-effort
            pass
    n = 0
    try:
        it = spark.sparkContext._jsc.getPersistentRDDs().values().iterator()
        while it.hasNext():
            it.next().unpersist(blocking)
            n += 1
    except Exception:  # noqa: BLE001 - cleanup is best-effort
        pass
    return n


def load_tables(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> dict:
    """Load the benchmark tables from ``sf_dir`` and register temp views.

    Returns {name: DataFrame}. Reading is lazy; projection/filter
    pushdown reach the parquet scan because nothing is materialized.
    """
    names = tables or [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
