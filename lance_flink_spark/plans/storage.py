"""Storage-layout operators: bucketed (shuffle-free) joins and
hive-partitioned writes with partition pruning.

The two physical-layout techniques a 100 TB deployment leans on
hardest, demonstrated end-to-end as registry entries:

- ``bucketed_join`` — both join sides are written bucketed+sorted on
  the join key, so the sort-merge join reads co-located buckets and
  the plan has NO shuffle exchange on either side (pinned in
  tests/test_storage.py). At real scale this is the difference between
  re-shuffling 100 TB per join and reading pre-organized buckets; the
  write-side cost is paid once, amortized over every downstream join.
- ``partition_pruned_scan`` — facts written hive-partitioned by day;
  a date-filtered read touches only matching partition directories
  (PartitionFilters in the scan, pinned by inputFiles count). The
  analogue of the reference's fragment pruning, at directory
  granularity.

Both build their layout lazily into .scratch (once per session+sf) and
register oracle-checked queries over the result — the oracle reads the
ORIGINAL parquet, proving layout changes don't change answers.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lance_flink_spark.registry import query, scratch_dir, table
from lance_flink_spark.registry import cached_native_fixture

_DB = "storage_demo"
_BUCKETS = 8


def _tag(sf_dir: str) -> str:
    return sf_dir.rstrip("/").replace("/", "_").replace(".", "_")


def _bucketed_table(spark, sf_dir, name: str, key: str) -> str:
    """Create (once per session+sf) an external parquet table bucketed
    AND sorted on the join key; return its qualified name.

    Bucket metadata lives in the session catalog, so a fresh session
    re-registers (re-writes) the table — the one-time cost a real
    deployment pays at ingest, not per query."""
    # pin the db location into .scratch: the default would be a
    # spark-warehouse dir under the DRIVER'S cwd, which may not be
    # writable (and shouldn't be written) when invoked from elsewhere
    loc = scratch_dir("bucketed", "_db")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {_DB} LOCATION '{loc}'")
    tbl = f"{_DB}.{name}_{_tag(sf_dir)}"
    if not spark.catalog.tableExists(tbl):
        path = scratch_dir("bucketed", f"{name}_{_tag(sf_dir)}")
        (
            table(spark, sf_dir, name)
            .write.format("parquet")
            .bucketBy(_BUCKETS, key)
            .sortBy(key)
            .option("path", path)
            .mode("overwrite")
            .saveAsTable(tbl)
        )
    return tbl


@query(
    "bucketed_join",
    extra=True,  # gate budget: co-located join via bucketing
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           ROUND(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                          AS BIGINT)) / 100.0, 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def bucketed_join(spark, sf_dir):
    """Fact-fact join over tables bucketed+sorted on the join key.

    Both sides read as `_BUCKETS` pre-hashed buckets
    (SelectedBucketsCount in the scan), so the merge join needs NO
    shuffle exchange on either side — asserted in
    tests/test_storage.py, with a plain-parquet control that does
    shuffle. A local per-bucket sort remains when a bucket spans
    multiple files (Spark trusts sortBy metadata only for
    one-file-per-bucket); it is node-local and spill-free, unlike the
    exchange it replaces. The merge hint pins SMJ so the demonstration
    doesn't silently degrade to a broadcast join at small SF. Revenue
    rides as exact integer cents."""
    lt = _bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    ot = _bucketed_table(spark, sf_dir, "orders", "o_orderkey")
    l = spark.table(lt)  # noqa: E741
    o = spark.table(ot)
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    )
    return (
        l.hint("merge")
        .join(o.hint("merge"), l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(cents) / 100.0, 2).alias("revenue"),
        )
        .orderBy("o_orderstatus")
    )


def partitioned_events_path(spark, sf_dir) -> str:
    """Write (once per sf) events hive-partitioned by event day."""
    path = os.path.join(scratch_dir("partitioned"), f"events_{_tag(sf_dir)}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        ev = table(spark, sf_dir, "events").withColumn(
            "event_day", F.to_date("ts")
        )
        ev.write.partitionBy("event_day").mode("overwrite").parquet(path)
    return path


@query(
    "partition_pruned_scan",
    extra=True,  # gate budget: hive-partition pruning
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS value_cents
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-08'
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def partition_pruned_scan(spark, sf_dir):
    """Three-day aggregate over day-partitioned events.

    The filter is on the PARTITION column, so Spark prunes at the
    directory level before any file is opened — the scan's
    PartitionFilters carry the predicate and inputFiles shrink to the
    3 matching days (pinned in tests/test_storage.py). At 100 TB this
    is the difference between listing 3 directories and scanning a
    month. The oracle filters the unpartitioned original by ts,
    proving the layout preserves the rows exactly."""
    path = partitioned_events_path(spark, sf_dir)
    ev = spark.read.parquet(path)
    return (
        ev.filter(
            (F.col("event_day") >= F.lit("2024-01-05").cast("date"))
            & (F.col("event_day") < F.lit("2024-01-08").cast("date"))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100 + 0.5)).cast("long").alias(
                "value_cents"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "lance_native_roundtrip",
    # r13: the native-Lance WRITE flagship, driver-graded from day one
    oracle="""
    SELECT lang,
           COUNT(*) AS n,
           COUNT(CASE WHEN n_chars % 3 = 0 THEN 1 END) AS n_title,
           CAST(SUM(CASE WHEN source <> 'web' THEN n_chars END)
                AS BIGINT) AS sum_nc,
           CAST(SUM(CASE WHEN lang <> 'de'
                         THEN n_chars + doc_id END) AS BIGINT) AS sum_emb
    FROM documents
    WHERE doc_id % 10 <> 3
    GROUP BY lang
    """,
)
def lance_native_roundtrip(spark, sf_dir):
    """NATIVE Lance format e2e, WRITE side included (round 13): a
    null-bearing table (nullable string / int64 / list<float> columns)
    writes through the pure-Python 'Lance File 2.0' writer
    (sources/lance_native.py — validity bitmaps, protobuf manifests),
    takes a deletion-file mutation (Arrow deletion sidecar, the spec's
    ARROW_ARRAY type), and reads back through the native reader into
    Spark. The oracle replays the same derivation relationally over
    the parquet source, so a dropped null, a swapped column, a mis-
    masked deletion, or a lossy list round-trip breaks the hash.
    Reference parity: LanceSink.java:32 / LanceInputFormat.java
    delegate this to com.lancedb.lance.Dataset."""
    import shutil

    import numpy as np

    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        delete_rows,
        write_dataset,
    )

    src = (
        table(spark, sf_dir, "documents")
        .selectExpr(
            "doc_id",
            "lang",
            "CASE WHEN n_chars % 3 = 0 THEN text END AS title",
            "CASE WHEN source <> 'web' THEN n_chars END AS nc",
            "CASE WHEN lang <> 'de' THEN ARRAY(CAST(n_chars AS FLOAT), "
            "CAST(doc_id AS FLOAT)) END AS emb",
        )
        .orderBy("doc_id")
    )
    t = src.toArrow()
    root = os.path.join(
        scratch_dir("lance_native" + _tag(sf_dir)), "docs_native"
    )
    shutil.rmtree(root, ignore_errors=True)
    write_dataset(root, t)
    # deletion-file mutation: physical offsets of doc_id % 10 == 3
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    delete_rows(root, np.nonzero(ids % 10 == 3)[0])
    df = LanceNativeDataset(root).read(spark)
    return df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("title").alias("n_title"),
        F.sum("nc").alias("sum_nc"),
        F.sum(
            F.col("emb")[0].cast("bigint") + F.col("emb")[1].cast("bigint")
        ).alias("sum_emb"),
    )


@query(
    "lance_native_distributed",
    # r14: executor-parallel native write + roaring deletion + one-
    # task-per-fragment read — the cluster-scale Lance lifecycle
    oracle="""
    SELECT lang,
           COUNT(*) AS n,
           COUNT(CASE WHEN n_chars % 3 = 0 THEN 1 END) AS n_title,
           CAST(SUM(n_chars) AS BIGINT) AS sum_nc
    FROM documents
    WHERE doc_id % 7 <> 2
    GROUP BY lang
    """,
)
def lance_native_distributed(spark, sf_dir):
    """The CLUSTER-scale native Lance lifecycle (round 14): the
    documents table repartitions to 8 and writes through
    write_dataset_distributed — each executor task encodes its own
    'Lance File 2.0' fragments (mapInArrow, physical-schema casts,
    uuid names), the driver commits only the manifest. A
    roaring-BITMAP deletion file (portable serialization — the type
    current Lance versions write) masks doc_id % 7 == 2, with the
    offsets resolved through the DISTRIBUTED with_offsets read. The
    final read is one task per fragment (read_distributed — the
    reference's LanceInputFormat split model, LanceSink.java:60-108
    for the write side). The oracle replays the derivation over the
    parquet source: a fragment lost in the distributed commit, a
    mis-based physical offset, a roaring container decoded wrong, or
    a null dropped by a task-side cast breaks the hash."""
    import shutil

    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        delete_rows,
        read_distributed,
        write_dataset_distributed,
        mutate_rows_distributed,
    )

    src = (
        table(spark, sf_dir, "documents")
        .selectExpr(
            "doc_id",
            "lang",
            "n_chars",
            "CASE WHEN n_chars % 3 = 0 THEN text END AS title",
        )
        .repartition(8)
    )
    root = os.path.join(
        scratch_dir("lance_native_dist" + _tag(sf_dir)), "docs_dist"
    )
    cached_native_fixture(
        "lance_native_dist" + _tag(sf_dir),
        root,
        lambda t: write_dataset_distributed(t, src),
    )
    nds = LanceNativeDataset(root)
    # offsets of the doomed rows stay a DataFrame end to end: the
    # per-fragment tasks write the deletion files and only name-plates
    # reach the driver (mutate_rows_distributed) — no offsets collect,
    # no driver row bound; columns= prunes the decode to the predicate
    # column (guide §5/§6)
    offs_df = (
        read_distributed(nds, spark, with_offsets=True, columns=["doc_id"])
        .filter("doc_id % 7 = 2")
        .select("__phys")
    )
    mutate_rows_distributed(
        root, offs_df, deletion_format="bitmap", offsets_aligned=True
    )
    df = read_distributed(LanceNativeDataset(root), spark)
    return df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("title").alias("n_title"),
        F.sum("n_chars").alias("sum_nc"),
    )


@query(
    "lance_datasource_roundtrip",
    oracle="""
    SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_nc
    FROM documents
    WHERE n_chars > 200
    GROUP BY lang
    """,
)
def lance_datasource_roundtrip(spark, sf_dir):
    """spark.read/write.format('lance_native') end-to-end — the Spark
    V2 packaging of the native format (sources/spark_datasource.py):
    the documents table writes through the DataSourceArrowWriter
    (task-side fragments, driver manifest commit), reads back through
    the fragment-partitioned reader with `n_chars > 200` PUSHED into
    the task-side pyarrow filter (pushFilters absorbs simple
    comparisons), and aggregates. The oracle replays relationally — a
    row lost in a task commit or a filter mis-applied in-task breaks
    the hash."""
    import shutil

    from lance_flink_spark.sources import spark_datasource as dsx

    dsx.register(spark)
    root = os.path.join(
        scratch_dir("lance_ds" + _tag(sf_dir)), "docs_ds"
    )
    shutil.rmtree(root, ignore_errors=True)
    (
        table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .repartition(4)
        .write.format("lance_native")
        .mode("append")
        .option("path", root)
        .save()
    )
    df = spark.read.format("lance_native").option("path", root).load()
    return (
        df.filter("n_chars > 200")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("sum_nc"),
        )
    )


@query(
    "lance_native_evolution",
    oracle="""
    WITH all_rows AS (
        SELECT doc_id, n_chars, CAST(NULL AS DOUBLE) AS quality
        FROM documents
        UNION ALL
        SELECT doc_id + 10000000, n_chars, CAST(n_chars AS DOUBLE)
        FROM documents WHERE source IN ('src1', 'src2', 'src3')
    )
    SELECT doc_id % 10 AS bucket,
           COUNT(*) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS sum_nc,
           COUNT(quality) AS nq,
           CAST(SUM(quality) AS BIGINT) AS sum_q
    FROM all_rows
    WHERE doc_id % 7 <> 3
    GROUP BY doc_id % 10
    """,
)
def lance_native_evolution(spark, sf_dir):
    """The native Lance SCHEMA-EVOLUTION + COMPACTION lifecycle
    (round 14, §2 #262): documents write distributed → ADD COLUMN
    quality (metadata-only commit; every pre-existing fragment reads
    NULL through the field-id map) → a second distributed append
    CARRIES the column → a roaring deletion masks doc_id % 7 = 3 →
    DROP COLUMN lang (metadata-only; the pages stay but are never
    decoded) → compact_dataset merges the fragment tail one-task-per-
    bin, materializing the deletion files and the dropped column away
    → final one-task-per-fragment read aggregates. The oracle replays
    the whole history relationally: a null mis-synthesized on an old
    fragment, an appended quality value lost in a task cast, a
    deletion row resurrected by the compaction rewrite, or a dropped
    column leaking back in breaks the hash. Reference parity:
    com.lancedb.lance.Dataset add_columns/drop_columns/compact_files
    (the reference evolves schemas through the same library calls its
    LanceSink writes with)."""
    import shutil

    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        add_column,
        append_to_dataset_distributed,
        compact_dataset,
        delete_rows,
        drop_column,
        read_distributed,
        write_dataset_distributed,
        mutate_rows_distributed,
    )

    import pyarrow as pa

    src = table(spark, sf_dir, "documents").selectExpr(
        "doc_id", "lang", "n_chars"
    ).repartition(6)
    root = os.path.join(
        scratch_dir("lance_native_evo" + _tag(sf_dir)), "docs_evo"
    )
    cached_native_fixture(
        "lance_native_evo" + _tag(sf_dir),
        root,
        lambda t: write_dataset_distributed(t, src, max_rows_per_file=1 << 14),
    )
    add_column(root, "quality", pa.float64())
    append_to_dataset_distributed(
        root,
        table(spark, sf_dir, "documents")
        .filter("source IN ('src1', 'src2', 'src3')")
        .selectExpr(
            "doc_id + 10000000 AS doc_id",
            "lang",
            "n_chars",
            "CAST(n_chars AS DOUBLE) AS quality",
        ),
    )
    offs_df = (
        read_distributed(
            LanceNativeDataset(root), spark,
            with_offsets=True, columns=["doc_id"],
        )
        .filter("doc_id % 7 = 3")
        .select("__phys")
    )
    mutate_rows_distributed(
        root, offs_df, deletion_format="bitmap", offsets_aligned=True
    )
    drop_column(root, "lang")
    compact_dataset(root, spark)
    df = read_distributed(LanceNativeDataset(root), spark)
    return (
        df.groupBy((F.col("doc_id") % 10).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").cast("long").alias("sum_nc"),
            F.count("quality").alias("nq"),
            F.sum("quality").cast("long").alias("sum_q"),
        )
    )


@query(
    "lance_native_update_merge",
    oracle="""
    WITH upd AS (
        SELECT doc_id, lang,
               CASE WHEN lang = 'en' THEN n_chars + 5 ELSE n_chars END
                   AS n_chars
        FROM documents
    ), merged AS (
        SELECT u.doc_id,
               CASE WHEN c.doc_id IS NOT NULL THEN 'xx' ELSE u.lang END
                   AS lang,
               CASE WHEN c.doc_id IS NOT NULL THEN c.nc2 ELSE u.n_chars END
                   AS n_chars
        FROM upd u
        LEFT JOIN (
            SELECT doc_id, n_chars * 2 AS nc2
            FROM documents WHERE source IN ('src4', 'src5', 'src6')
        ) c ON u.doc_id = c.doc_id
        UNION ALL
        SELECT doc_id + 20000000, lang, n_chars
        FROM documents WHERE source IN ('src8', 'src9')
    )
    SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_nc
    FROM merged GROUP BY lang
    """,
)
def lance_native_update_merge(spark, sf_dir):
    """Native Lance UPDATE + MERGE, the round-14 close of the last
    native-write refusal (§2 #263): documents land as a native table,
    ``UPDATE ... WHERE lang='en'`` rewrites matched rows Lance-style —
    deletion files + executor-written replacement fragments in ONE
    manifest commit (lance_native.update_rows_distributed) — then a
    positional ``MERGE INTO ... ON doc_id`` upserts: matched rows
    replaced by the source ('code' docs, n_chars doubled, lang 'xx'),
    unmatched source rows ('wiki' docs under shifted ids) append. The
    oracle replays both mutations relationally — a row lost to the
    tombstone/append split, an update applied twice (the join fired on
    a stale snapshot), or a non-atomic commit surfacing the delete
    without the append breaks the hash. Reference parity:
    com.lancedb.lance.Dataset update/merge_insert (the write paths the
    reference's LanceSink delegates to)."""
    import shutil

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import (
        write_dataset_distributed,
    )

    from lance_flink_spark.registry import cached_native_fixture

    base = scratch_dir("lance_native_um" + _tag(sf_dir))
    root = os.path.join(base, "docs_um")
    cached_native_fixture(
        "um" + _tag(sf_dir),
        root,
        lambda t: write_dataset_distributed(
            t,
            table(spark, sf_dir, "documents")
            .selectExpr("doc_id", "lang", "n_chars")
            .repartition(4),
            max_rows_per_file=1 << 14,
        ),
    )
    table(spark, sf_dir, "documents").createOrReplaceTempView("um_docs_src")
    eng = SqlEngine(spark, Catalog(os.path.join(base, "whw")))
    eng.execute(
        f"CREATE TABLE um_docs (doc_id BIGINT, lang STRING, n_chars INT) "
        f"WITH ('connector'='lance', 'path'='{root}')"
    )
    eng.execute("UPDATE um_docs SET n_chars = n_chars + 5 WHERE lang = 'en'")
    eng.execute(
        "MERGE INTO um_docs USING ("
        "SELECT doc_id, 'xx' AS lang, n_chars * 2 AS n_chars "
        "FROM um_docs_src WHERE source IN ('src4', 'src5', 'src6') "
        "UNION ALL "
        "SELECT doc_id + 20000000, lang, n_chars "
        "FROM um_docs_src WHERE source IN ('src8', 'src9')"
        ") ON doc_id"
    )
    return (
        eng.execute("SELECT * FROM um_docs")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").cast("long").alias("sum_nc"),
        )
    )


@query(
    "lance_native_changes",
    # r14-late rotation IN (for multimodal_meta): the native change
    # feed gets driver-grade hash evidence
    oracle="""
    SELECT 1 AS commit_v, 'insert' AS op, COUNT(*) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS sum_nc
    FROM documents
    UNION ALL
    SELECT 2, 'delete', COUNT(*), CAST(SUM(n_chars) AS BIGINT)
    FROM documents WHERE doc_id % 5 = 0
    UNION ALL
    SELECT 3, 'insert', COUNT(*), CAST(SUM(n_chars + 7) AS BIGINT)
    FROM documents WHERE source IN ('src1', 'src2', 'src3')
    """,
)
def lance_native_changes(spark, sf_dir):
    """The NATIVE change feed (round 14, §2 #265):
    ``read_changes_distributed`` replays a write → roaring-delete →
    distributed-append history as a Flink-CDC-shaped changelog —
    inserts from appeared fragments, deletes from deletion-file growth
    WITH pre-image values, one executor task per changed fragment. The
    aggregate folds the feed per (_commit_version, _change_type); the
    oracle states each commit's expected row set relationally, so a
    delete emitted without pre-image values, an insert double-counted
    across fragments, or a commit mis-attributed breaks the hash.
    Reference parity: the reference consumes Lance history as a Flink
    CDC source; this is the same shape over the native format."""
    import shutil

    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        append_to_dataset_distributed,
        delete_rows,
        read_changes_distributed,
        read_distributed,
        write_dataset_distributed,
        mutate_rows_distributed,
    )

    src = table(spark, sf_dir, "documents").selectExpr(
        "doc_id", "lang", "n_chars"
    ).repartition(4)
    root = os.path.join(
        scratch_dir("lance_native_cdc" + _tag(sf_dir)), "docs_cdc"
    )
    cached_native_fixture(
        "lance_native_cdc" + _tag(sf_dir),
        root,
        lambda t: write_dataset_distributed(
            t, src, max_rows_per_file=1 << 14
        ),
    )  # v1
    offs_df = (
        read_distributed(
            LanceNativeDataset(root), spark,
            with_offsets=True, columns=["doc_id"],
        )
        .filter("doc_id % 5 = 0")
        .select("__phys")
    )
    mutate_rows_distributed(
        root, offs_df, deletion_format="bitmap", offsets_aligned=True
    )  # v2
    append_to_dataset_distributed(
        root,
        table(spark, sf_dir, "documents")
        .filter("source IN ('src1', 'src2', 'src3')")
        .selectExpr("doc_id + 30000000 AS doc_id", "lang", "n_chars + 7 AS n_chars"),
    )  # v3
    feed = read_changes_distributed(root, spark, 0)
    return feed.groupBy(
        F.col("_commit_version").alias("commit_v"),
        F.col("_change_type").alias("op"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").cast("long").alias("sum_nc"),
    )


@query(
    "lance_native_struct_evolution",
    oracle="""
    WITH all_rows AS (
        SELECT doc_id, n_chars AS w, LENGTH(source) AS h,
               CAST(NULL AS DOUBLE) AS quality
        FROM documents
        UNION ALL
        SELECT doc_id + 10000000, n_chars, LENGTH(source),
               CAST(n_chars % 97 AS DOUBLE)
        FROM documents WHERE source IN ('src1', 'src2')
    )
    SELECT doc_id % 8 AS bucket,
           COUNT(*) AS n,
           CAST(SUM(w) AS BIGINT) AS sum_w,
           CAST(SUM(h) AS BIGINT) AS sum_h,
           COUNT(quality) AS nq,
           CAST(SUM(quality) AS BIGINT) AS sum_q
    FROM all_rows
    WHERE doc_id % 11 <> 6
    GROUP BY doc_id % 8
    """,
)
def lance_native_struct_evolution(spark, sf_dir):
    """STRUCT schema evolution on native Lance (round 14, §2 #273 —
    the last evolution refusal, closed): documents write distributed
    with a STRUCT column (struct headers plate at their first child's
    column, so DataFile arrays stay parallel) → ADD COLUMN quality →
    a distributed append CARRIES quality alongside the struct → a
    roaring deletion masks doc_id % 11 = 6 → DROP COLUMN lang. The
    final read is deliberately UNCOMPACTED: every pre-evolution
    fragment must decode through the field-id map — the struct at a
    mapped base column, NULL quality synthesized, the dropped lang
    pages untouched. The oracle replays the history relationally over
    the struct's flattened children; a struct child mis-based by the
    map, a null quality lost, or a dropped column leaking back breaks
    the hash. Reference parity: com.lancedb.lance.Dataset
    add_columns/drop_columns over struct-bearing schemas."""
    import shutil

    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        add_column,
        append_to_dataset_distributed,
        delete_rows,
        drop_column,
        read_distributed,
        write_dataset_distributed,
        mutate_rows_distributed,
    )

    import pyarrow as pa

    src = table(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "named_struct('w', n_chars, 'h', CAST(LENGTH(source) AS BIGINT)) AS meta",
        "lang",
    ).repartition(4)
    root = os.path.join(
        scratch_dir("lance_native_sevo" + _tag(sf_dir)), "docs_sevo"
    )
    cached_native_fixture(
        "lance_native_sevo" + _tag(sf_dir),
        root,
        lambda t: write_dataset_distributed(t, src, max_rows_per_file=1 << 14),
    )
    add_column(root, "quality", pa.float64())
    append_to_dataset_distributed(
        root,
        table(spark, sf_dir, "documents")
        .filter("source IN ('src1', 'src2')")
        .selectExpr(
            "doc_id + 10000000 AS doc_id",
            "named_struct('w', n_chars, 'h', CAST(LENGTH(source) AS BIGINT)) AS meta",
            "lang",
            "CAST(n_chars % 97 AS DOUBLE) AS quality",
        ),
    )
    offs_df = (
        read_distributed(
            LanceNativeDataset(root), spark,
            with_offsets=True, columns=["doc_id"],
        )
        .filter("doc_id % 11 = 6")
        .select("__phys")
    )
    mutate_rows_distributed(
        root, offs_df, deletion_format="bitmap", offsets_aligned=True
    )
    drop_column(root, "lang")
    df = read_distributed(LanceNativeDataset(root), spark)
    return (
        df.groupBy((F.col("doc_id") % 8).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("meta.w")).cast("long").alias("sum_w"),
            F.sum(F.col("meta.h")).cast("long").alias("sum_h"),
            F.count("quality").alias("nq"),
            F.sum("quality").cast("long").alias("sum_q"),
        )
    )


@query(
    "native_backfill",
    # r14 extension flagship, PRIMARY from day one: zero-rewrite
    # ADD COLUMN ... AS (expr) — driver-graded hash evidence
    oracle="""
    SELECT lang,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(n_chars * 1.0 / (doc_id % 7 + 1) * 100
                               + 0.5) AS BIGINT)) AS BIGINT) AS sum_score
    FROM documents
    WHERE doc_id % 11 <> 4
    GROUP BY lang
    """,
)
def native_backfill(spark, sf_dir):
    """Zero-rewrite column backfill on native Lance (Lance's
    ``add_columns(transforms)``, SQL ``ALTER TABLE ... ADD COLUMN x
    DOUBLE AS (expr)``): documents write distributed, a deletion file
    masks doc_id % 11 = 4 FIRST, then executors compute the expression
    per fragment — only the referenced columns decoded,
    Catalyst-evaluated — and each fragment gains ONE single-column
    data file (table.proto ``DataFragment.files``); no existing file
    is rewritten. The read zips the files' rows at physical offsets.
    The oracle recomputes the expression relationally over the parquet
    source: a mis-aligned backfill row, a value computed from a
    deleted row served live, or a file zipped against the wrong
    fragment breaks the hash. Cite: Lance add_columns;
    LanceInputFormat one-split-per-fragment for the read."""
    import shutil

    import numpy as np
    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        add_column_backfill,
        delete_rows,
        read_distributed,
        write_dataset_distributed,
        mutate_rows_distributed,
    )

    src = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .repartition(4)
    )
    root = os.path.join(
        scratch_dir("lance_native_bf" + _tag(sf_dir)), "docs_bf"
    )
    cached_native_fixture(
        "lance_native_bf" + _tag(sf_dir),
        root,
        lambda t: write_dataset_distributed(t, src),
    )
    nds = LanceNativeDataset(root)
    # offsets stay a DataFrame: per-fragment tasks write the deletion
    # files, only name-plates reach the driver; columns= pushes the
    # projection into the page decode so lang/n_chars pages are never
    # read for the offset resolution
    doomed_df = (
        read_distributed(
            nds, spark, with_offsets=True, columns=["doc_id"]
        )
        .filter("doc_id % 11 = 4")
        .select("__phys")
    )
    mutate_rows_distributed(root, doomed_df, offsets_aligned=True)
    add_column_backfill(
        root, "score", pa.float64(),
        "n_chars * 1.0 / (doc_id % 7 + 1)", spark,
    )
    df = read_distributed(LanceNativeDataset(root), spark)
    return df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("score") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("sum_score"),
    )


@query(
    "native_merge_columns",
    oracle="""
    SELECT lang,
           COUNT(*) AS n,
           COUNT(nc2) AS n_matched,
           CAST(SUM(nc2) AS BIGINT) AS sum_nc2
    FROM documents d
    LEFT JOIN (
        SELECT doc_id, n_chars * 2 AS nc2
        FROM documents WHERE doc_id % 3 = 0
    ) s USING (doc_id)
    WHERE d.doc_id % 11 <> 4
    GROUP BY lang
    """,
)
def native_merge_columns(spark, sf_dir):
    """Zero-rewrite column MERGE on native Lance (Lance's
    ``Dataset.merge``, SQL ``ALTER TABLE ... MERGE COLUMNS (q) ON
    key``): documents write distributed, a deletion masks doc_id %
    11 = 4 FIRST, then a derived frame (doc_id, nc2) joins in by key —
    each fragment gains ONE data file zipped at physical offsets,
    unmatched rows read NULL, nothing is rewritten. The oracle replays
    the LEFT JOIN relationally over the parquet source: a mis-aligned
    merge row, a value landing on a deleted offset's neighbor, or a
    dropped unmatched-NULL breaks the hash. Cite: Lance Dataset.merge;
    LanceInputFormat one-split-per-fragment for the read."""
    import shutil

    import numpy as np

    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        delete_rows,
        merge_columns,
        read_distributed,
        write_dataset_distributed,
        mutate_rows_distributed,
    )

    src = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .repartition(4)
    )
    root = os.path.join(
        scratch_dir("lance_native_mc" + _tag(sf_dir)), "docs_mc"
    )
    cached_native_fixture(
        "lance_native_mc" + _tag(sf_dir),
        root,
        lambda t: write_dataset_distributed(t, src),
    )
    nds = LanceNativeDataset(root)
    doomed_df = (
        read_distributed(
            nds, spark, with_offsets=True, columns=["doc_id"]
        )
        .filter("doc_id % 11 = 4")
        .select("__phys")
    )
    mutate_rows_distributed(root, doomed_df, offsets_aligned=True)
    attach = (
        table(spark, sf_dir, "documents")
        .filter("doc_id % 3 = 0")
        .selectExpr("doc_id", "n_chars * 2 AS nc2")
    )
    merge_columns(root, attach, "doc_id", spark)
    df = read_distributed(LanceNativeDataset(root), spark)
    return df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("nc2").alias("n_matched"),
        F.sum("nc2").cast("long").alias("sum_nc2"),
    )


@query(
    "lance_21_bitpacked",
    extra=True,  # r15: 2.1 read-subset evidence with a full oracle
    oracle="""
    SELECT l_linenumber, COUNT(*) AS n,
           CAST(SUM(l_partkey) AS BIGINT) AS sum_pk,
           CAST(SUM(l_orderkey) AS BIGINT) AS sum_ok
    FROM lineitem WHERE l_orderkey % 17 = 0 GROUP BY l_linenumber
    """,
)
def lance_21_bitpacked(spark, sf_dir):
    """Lance 2.1 BITPACKED read subset end-to-end (§2 #285): a bounded
    deterministic lineitem slice (one order in 17 — the fixture stays
    driver-writable at any SF) lands in a native dataset whose
    fragment files are rewritten as footer-(2,1) files with every
    int64 page bitpacked at its minimal width, then the DISTRIBUTED
    native read decodes them and a plain aggregate must match DuckDB
    over the original parquet — a single mis-unpacked bit in any page
    flips a SUM. Cite: public encodings.proto Bitpacked; the
    structural 2.1 encodings stay a loud refusal (SURVEY §6)."""
    import shutil

    from lance_flink_spark.registry import fixture_once, scratch_dir
    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        read_distributed,
        write_dataset,
        write_fragment_file_21,
    )

    tag = sf_dir.rstrip("/").replace("/", "_")
    base = scratch_dir("l21" + tag)
    root = os.path.join(base, "ds")
    if fixture_once(base):
        # read-only fixture: built once per (process, sf), reused
        # across passes — a fresh invocation always rebuilds from
        # the parquet (fixture_once)
        shutil.rmtree(root, ignore_errors=True)
        t = (
            table(spark, sf_dir, "lineitem")
            .filter("l_orderkey % 17 = 0")
            .select("l_orderkey", "l_partkey", "l_linenumber")
            .toArrow()
        )
        ds = write_dataset(root, t, max_rows_per_file=16384)
        _f, frags, _v = ds._manifest()
        # rewrite every fragment file as 2.1 bitpacked (same rows,
        # same manifest — only the page encoding changes)
        off = 0
        for fr in frags:
            write_fragment_file_21(
                os.path.join(root, "data", fr.path),
                t.slice(off, fr.physical_rows),
                max_rows_per_page=4096,
            )
            off += fr.physical_rows
    out = read_distributed(LanceNativeDataset(root), spark)
    return out.groupBy("l_linenumber").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_orderkey").alias("sum_ok"),
        F.sum("l_partkey").alias("sum_pk"),
    ).select("l_linenumber", "n", "sum_pk", "sum_ok")
