"""Native Lance as a Spark V2 Python data source
(sources/spark_datasource.py): spark.read.format('lance_native') with
one partition per fragment + in-task deletion masks + filter pushdown
+ column projection; df.write.format('lance_native') with
task-side fragment writes and a driver manifest commit (append AND
overwrite-as-new-version); writeStream with batchId-idempotent
exactly-once commits. Reference parity: LanceInputFormat /
LanceSink.java:60-108 / the checkpointed streaming sink."""

import os
import shutil

import pytest

REF = "/root/reference/test-data"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference test-data not present"
)


@pytest.fixture()
def ds_spark(spark):
    from lance_flink_spark.sources import spark_datasource as dsx

    dsx.register(spark)
    return spark


def _mk(tmp_path_str, name="ds", rows=30, frag_rows=10):
    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import write_dataset

    root = os.path.join(tmp_path_str, name)
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array(range(rows), type=pa.int64()),
                "title": pa.array([f"t-{i}" for i in range(rows)]),
                "score": pa.array([i * 0.5 for i in range(rows)]),
            }
        ),
        max_rows_per_file=frag_rows,
    )
    return root


def test_read_partitions_deletions_and_time_travel(ds_spark, tmp_path_str):
    from lance_flink_spark.sources.lance_native import delete_rows

    root = _mk(tmp_path_str)
    delete_rows(root, [0, 29], deletion_format="bitmap")
    df = ds_spark.read.format("lance_native").option("path", root).load()
    assert df.rdd.getNumPartitions() == 3  # one per fragment
    assert df.count() == 28
    ids = sorted(r["id"] for r in df.collect())
    assert ids == list(range(1, 29))
    v1 = (
        ds_spark.read.format("lance_native")
        .option("path", root)
        .option("version", "1")
        .load()
    )
    assert v1.count() == 30


def test_filter_pushdown_applied_in_task(ds_spark, tmp_path_str):
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        In,
        IsNotNull,
        Not,
        StringContains,
    )

    from lance_flink_spark.sources.spark_datasource import LanceNativeReader

    root = _mk(tmp_path_str, "dsflt")
    # unit: supported filters are absorbed, the rest return to Spark
    r = LanceNativeReader(root, {})
    rest = r.pushFilters(
        [
            GreaterThan(("id",), 5),
            In(("title",), ("t-7", "t-9")),
            IsNotNull(("score",)),
            Not(EqualTo(("id",), 3)),  # unsupported shape
            StringContains(("title",), "t-"),  # unsupported shape
        ]
    )
    assert len(r.filters) == 3 and len(list(rest)) == 2
    # e2e: results are exact under mixed pushed/residual filters
    df = ds_spark.read.format("lance_native").option("path", root).load()
    got = sorted(
        x["id"]
        for x in df.filter(
            "id > 5 AND title IN ('t-7','t-9') AND title LIKE '%-%'"
        ).collect()
    )
    assert got == [7, 9]


def test_projection_option_prunes_decode(ds_spark, tmp_path_str):
    root = _mk(tmp_path_str, "dsproj")
    df = (
        ds_spark.read.format("lance_native")
        .option("path", root)
        .option("columns", "score,id")
        .load()
    )
    assert df.columns == ["score", "id"]
    assert df.count() == 30
    with pytest.raises(Exception, match="columns"):
        (
            ds_spark.read.format("lance_native")
            .option("path", root)
            .option("columns", "nope")
            .load()
        )


def test_batch_write_append_and_overwrite(ds_spark, tmp_path_str):
    from lance_flink_spark.sources.lance_native import LanceNativeDataset

    root = os.path.join(tmp_path_str, "dswrite")
    (
        ds_spark.range(7)
        .selectExpr("id", "concat('x-', id) AS title")
        .repartition(3)
        .write.format("lance_native")
        .mode("append")
        .option("path", root)
        .save()
    )
    ds = LanceNativeDataset(root)
    assert ds.to_arrow().num_rows == 7
    # append onto the existing dataset: new fragments, field ids kept
    (
        ds_spark.range(3)
        .selectExpr("id + 100 AS id", "concat('y-', id) AS title")
        .write.format("lance_native")
        .mode("append")
        .option("path", root)
        .save()
    )
    ds = LanceNativeDataset(root)
    assert ds.to_arrow().num_rows == 10 and ds.versions() == [1, 2]
    # overwrite: a NEW version holding only the new fragments; the old
    # version stays time-travelable (lance overwrite semantics)
    (
        ds_spark.range(2)
        .selectExpr("id + 500 AS id", "concat('z-', id) AS title")
        .write.format("lance_native")
        .mode("overwrite")
        .option("path", root)
        .save()
    )
    ds = LanceNativeDataset(root)
    assert ds.to_arrow().num_rows == 2
    assert ds.to_arrow(version=2).num_rows == 10
    # round-trips through the DataSource reader too
    back = ds_spark.read.format("lance_native").option("path", root).load()
    assert sorted(r["id"] for r in back.collect()) == [500, 501]


def test_write_append_onto_reference_dataset(ds_spark, tmp_path_str):
    from lance_flink_spark.sources.lance_native import LanceNativeDataset

    root = os.path.join(tmp_path_str, "dsref")
    shutil.copytree(f"{REF}/lance-db1", root)
    before = LanceNativeDataset(root).to_arrow()
    (
        ds_spark.createDataFrame(
            [(6, "Transformers", [0.9, 0.8, 0.7, 0.6])],
            "id long, title string, embedding array<float>",
        )
        .write.format("lance_native")
        .mode("append")
        .option("path", root)
        .save()
    )
    after = LanceNativeDataset(root).to_arrow()
    assert after.num_rows == before.num_rows + 1
    d = after.to_pydict()
    assert "Transformers" in d["title"]
    assert d["title"][: before.num_rows] == before.to_pydict()["title"]


def test_stream_write_exactly_once(ds_spark, tmp_path_str):
    """writeStream into the native sink: availableNow drains the
    source, every micro-batch appends one manifest version, and a
    REPLAYED batchId (crash-restart) is a no-op — its re-written
    fragment files are dropped, the original commit stands."""
    import time

    from lance_flink_spark.sources.lance_native import LanceNativeDataset
    from lance_flink_spark.sources.spark_datasource import (
        LanceNativeStreamWriter,
        LanceWriteCommit,
    )

    src = os.path.join(tmp_path_str, "stream_src")
    os.makedirs(src)
    for i in range(2):
        ds_spark.createDataFrame(
            [(i * 10 + j, f"s-{i}-{j}") for j in range(5)],
            "id long, title string",
        ).coalesce(1).write.mode("append").parquet(os.path.join(src, f"b{i}"))
        time.sleep(1.05)
    root = os.path.join(tmp_path_str, "dsstream")
    sdf = (
        ds_spark.readStream.schema("id long, title string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        sdf.writeStream.format("lance_native")
        .option("path", root)
        .option(
            "checkpointLocation", os.path.join(tmp_path_str, "ckpt_dsstream")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ds = LanceNativeDataset(root)
    t = ds.to_arrow()
    assert t.num_rows == 10
    assert len(ds.versions()) >= 2  # one manifest version per micro-batch
    assert sorted(t.to_pydict()["id"]) == sorted(
        list(range(0, 5)) + list(range(10, 15))
    )
    # replay batch 0 manually: the idempotency marker makes it a no-op
    w = LanceNativeStreamWriter(root, sdf.schema)
    before = ds.versions()[-1]
    w.commit([LanceWriteCommit([])], batchId=0)
    assert LanceNativeDataset(root).versions()[-1] == before


def test_stream_read_tails_manifest_versions(ds_spark, tmp_path_str):
    """readStream.format('lance_native'): the first availableNow run
    drains the current snapshot; after an append, a SECOND run on the
    SAME checkpoint emits only the new fragments — incremental
    manifest tailing with checkpointed offsets (the reference's
    LanceSource streaming mode)."""
    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import (
        append_to_dataset,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "dssrc")
    write_dataset(
        root,
        pa.table({"id": pa.array(range(6), type=pa.int64())}),
        max_rows_per_file=3,
    )
    ckpt = os.path.join(tmp_path_str, "ckpt_dssrc")
    sink = os.path.join(tmp_path_str, "dssrc_out")

    def drain():
        # file sink: the one built-in sink that supports checkpoint
        # RECOVERY across separate queries (memory sink refuses)
        sdf = (
            ds_spark.readStream.format("lance_native")
            .option("path", root)
            .load()
        )
        q = (
            sdf.writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            r["id"] for r in ds_spark.read.parquet(sink).collect()
        )

    assert drain() == list(range(6))
    append_to_dataset(
        root, pa.table({"id": pa.array([100, 101], type=pa.int64())})
    )
    # same checkpoint: only the appended fragment streams (sink totals
    # grow by exactly the new rows)
    assert drain() == list(range(6)) + [100, 101]
    # fresh checkpoint with startingVersion replays from the beginning
    sdf = (
        ds_spark.readStream.format("lance_native")
        .option("path", root)
        .option("startingVersion", "0")
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("dssrc_replay")
        .outputMode("append")
        .option(
            "checkpointLocation", os.path.join(tmp_path_str, "ckpt_replay")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(
        r["id"] for r in ds_spark.table("dssrc_replay").collect()
    ) == list(range(6)) + [100, 101]


def test_stream_read_changes_mode(ds_spark, tmp_path_str):
    spark = ds_spark
    """readStream.format('lance_native').option('readChanges','true')
    (round 14): the native change feed as micro-batches — bootstrap
    drain replays history as inserts + pre-image deletes; a SECOND
    run on the SAME checkpoint emits only the new commit, an UPDATE's
    delete+insert pair under one _commit_version (the Flink retract
    changelog); 'columns' refuses in changes mode."""
    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import (
        delete_rows,
        update_rows_distributed,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "cdcstream")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array(range(4), pa.int64()),
                "v": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
            }
        ),
    )
    delete_rows(root, [1])
    out = os.path.join(tmp_path_str, "cdc_out")
    ck = os.path.join(tmp_path_str, "cdc_ck")
    sdf = (
        spark.readStream.format("lance_native")
        .option("path", root)
        .option("readChanges", "true")
        .load()
    )
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    r1 = sorted(
        (x["_commit_version"], x["_change_type"], x["id"], x["v"])
        for x in spark.read.parquet(out).collect()
    )
    assert r1 == [
        (1, "insert", 0, 1.0),
        (1, "insert", 1, 2.0),
        (1, "insert", 2, 3.0),
        (1, "insert", 3, 4.0),
        (2, "delete", 1, 2.0),  # pre-image value
    ]
    update_rows_distributed(
        root,
        spark.createDataFrame([(2, 30.0)], "id long, v double"),
        [2],
    )
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    r2 = sorted(
        (x["_commit_version"], x["_change_type"], x["id"], x["v"])
        for x in spark.read.parquet(out).collect()
    )
    assert sorted(set(r2) - set(r1)) == [
        (3, "delete", 2, 3.0),
        (3, "insert", 2, 30.0),
    ]
    with pytest.raises(Exception, match="readChanges"):
        (
            spark.read.format("lance_native")
            .option("path", root)
            .option("readChanges", "true")
            .option("columns", "id")
            .load()
            .count()
        )


def test_datasource_reads_evolved_dataset(ds_spark, tmp_path_str):
    """The V2 reader serves schema-evolved datasets through the same
    field-id map as every other path: old fragments read NULL for an
    added column, dropped columns disappear, filters still push into
    the task (round 14)."""
    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import (
        add_column,
        append_to_dataset,
        drop_column,
        write_dataset,
    )

    spark = ds_spark
    root = os.path.join(tmp_path_str, "evods")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array(range(6), pa.int64()),
                "name": pa.array([f"d{i}" for i in range(6)], pa.large_utf8()),
            }
        ),
        max_rows_per_file=3,
    )
    add_column(root, "score", pa.float64())
    append_to_dataset(
        root,
        pa.table(
            {
                "id": pa.array([10], pa.int64()),
                "name": pa.array(["new"], pa.large_utf8()),
                "score": pa.array([0.5], pa.float64()),
            }
        ),
    )
    drop_column(root, "name")
    df = spark.read.format("lance_native").option("path", root).load()
    assert df.columns == ["id", "score"]
    assert df.count() == 7
    assert df.filter("score IS NOT NULL").count() == 1
    # filter pushdown still applies in-task on the evolved layout
    assert df.filter("id < 3").count() == 3


def test_stream_read_survives_mid_stream_evolution(ds_spark, tmp_path_str):
    """The append-mode stream renders every batch at the schema
    captured at stream START: an ADD COLUMN + append mid-stream emits
    the new fragments at the ORIGINAL shape (the added column simply
    isn't part of this query) instead of breaking the fixed stream
    schema (round 14)."""
    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import (
        add_column,
        append_to_dataset,
        write_dataset,
    )

    spark = ds_spark
    root = os.path.join(tmp_path_str, "evostream")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array([1, 2], pa.int64()),
                "v": pa.array([1.0, 2.0], pa.float64()),
            }
        ),
    )
    out = os.path.join(tmp_path_str, "evo_out")
    ck = os.path.join(tmp_path_str, "evo_ck")
    sdf = spark.readStream.format("lance_native").option("path", root).load()
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # evolve AND append between drains — same checkpoint, same query
    add_column(root, "extra", pa.float64())
    append_to_dataset(
        root,
        pa.table(
            {
                "id": pa.array([3], pa.int64()),
                "v": pa.array([3.0], pa.float64()),
                "extra": pa.array([9.9], pa.float64()),
            }
        ),
    )
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.columns == ["id", "v"]  # stream-start shape throughout
    assert sorted(r["id"] for r in got.collect()) == [1, 2, 3]


def test_pushdown_null_semantics_and_snapshot_pinning(ds_spark, tmp_path_str):
    """SQL null semantics survive in-task pyarrow evaluation: a NULL in
    an IN value set never matches the column's null rows, and x <=> NULL
    lowers to IS NULL; the batch reader pins its manifest version at
    PLAN time so a commit landing mid-query can't change the snapshot."""
    import pyarrow as pa
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import EqualNullSafe, In

    from lance_flink_spark.sources.lance_native import (
        delete_rows,
        write_dataset,
    )
    from lance_flink_spark.sources.spark_datasource import (
        LanceNativeReader,
        _apply_filter,
    )

    root = os.path.join(tmp_path_str, "dsnull")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array([1, 2, 3], pa.int64()),
                "s": pa.array(["a", None, "c"]),
            }
        ),
    )
    df = ds_spark.read.format("lance_native").option("path", root).load()
    # IN with a NULL element: only the real match, never the null row
    got = sorted(r["id"] for r in df.filter(F.col("s").isin("a", None)).collect())
    assert got == [1]
    # unit: the filter evaluators under direct null probes
    import pyarrow.compute as pc

    t = pa.table({"s": pa.array(["a", None, "c"])})
    m = _apply_filter(pc, pa, t, EqualNullSafe(("s",), None))
    assert t.filter(m).num_rows == 1
    m = _apply_filter(pc, pa, t, EqualNullSafe(("s",), "a"))
    assert [x.as_py() for x in m] == [True, False, False]
    m = _apply_filter(pc, pa, t, In(("s",), ("a", None)))
    assert [x.as_py() for x in m] == [True, False, False]
    # snapshot pinning: a reader planned before a DELETE still reads
    # the pinned version in its tasks
    r = LanceNativeReader(root, {})
    parts = r.partitions()
    delete_rows(root, [0, 1, 2])
    rows = [b.num_rows for p in parts for b in r.read(p)]
    assert sum(rows) == 3  # pre-delete snapshot, not the mutated one


def test_distributed_write_splits_fragments_by_bytes(ds_spark, tmp_path_str):
    """One byte-heavy partition (binary media rows) must flush multiple
    fragments under the byte threshold instead of one oversized file
    the reader's decode gate would refuse."""
    from pyspark.sql import functions as F

    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        write_dataset_distributed,
    )

    root = os.path.join(tmp_path_str, "dsbytes")
    # 8 rows x ~1 MiB binary in ONE partition; 2 MiB byte cap
    df = (
        ds_spark.range(8)
        .coalesce(1)
        .select(
            F.col("id"),
            F.expr("cast(repeat('x', 1048576) as binary) as payload"),
        )
    )
    write_dataset_distributed(
        root, df, max_bytes_per_file=2 * 1024 * 1024
    )
    nds = LanceNativeDataset(root)
    _fields, frags, _v = nds._manifest()
    assert len(frags) >= 3  # split by bytes, not one 8 MiB fragment
    assert sum(fr.physical_rows for fr in frags) == 8
    got = nds.read(ds_spark)
    assert got.count() == 8


def test_datasource_reads_struct_evolved_dataset(ds_spark, tmp_path_str):
    """Struct-bearing datasets now evolve (struct headers carry a
    column index): the V2 reader serves pre-evolution fragments with
    NULL for the added column and intact struct values end-to-end."""
    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import (
        add_column,
        append_to_dataset,
        arrow_schema_of,
        LanceNativeDataset,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "dsstructev")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array([1, 2], pa.int64()),
                "meta": pa.array(
                    [{"w": 5, "h": 6}, {"w": 7, "h": None}],
                    pa.struct([("w", pa.int64()), ("h", pa.int64())]),
                ),
            }
        ),
    )
    add_column(root, "q", pa.float64())
    fields, _f, _v = LanceNativeDataset(root)._manifest()
    append_to_dataset(
        root,
        pa.table(
            {
                "id": pa.array([3], pa.int64()),
                "meta": pa.array(
                    [{"w": 9, "h": 10}],
                    pa.struct([("w", pa.int64()), ("h", pa.int64())]),
                ),
                "q": pa.array([0.5], pa.float64()),
            }
        ).cast(arrow_schema_of(fields)),
    )
    df = ds_spark.read.format("lance_native").option("path", root).load()
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["q"] is None and rows[3]["q"] == 0.5
    assert rows[2]["meta"]["w"] == 7 and rows[2]["meta"]["h"] is None
    assert rows[3]["meta"]["h"] == 10


def test_write_mode_sequence_matches_model(ds_spark, tmp_path_str):
    """append/overwrite sequences through df.write.format('lance_native')
    fold like a list model, every intermediate version stays
    time-travelable to its own snapshot, and a version never loses or
    duplicates rows across the task-write/driver-commit split."""
    import itertools

    from lance_flink_spark.sources.lance_native import LanceNativeDataset

    root = os.path.join(tmp_path_str, "dsmodel")
    fresh = itertools.count(0)

    def write(mode, k):
        ids = [next(fresh) for _ in range(k)]
        df = ds_spark.createDataFrame(
            [(i, i * 3) for i in ids], "id long, v long"
        ).repartition(2)
        df.write.format("lance_native").mode(mode).option("path", root).save()
        return [(i, i * 3) for i in ids]

    model: list = []
    history = []
    for mode, k in [
        ("append", 3),
        ("append", 2),
        ("overwrite", 4),
        ("append", 0),  # empty append still commits a valid version
        ("overwrite", 1),
        ("append", 3),
    ]:
        rows = write(mode, k)
        model = rows if mode == "overwrite" else model + rows
        v = LanceNativeDataset(root).versions()[-1]
        history.append((v, sorted(model)))
    for v, expect in history:
        got = sorted(
            (r["id"], r["v"])
            for r in ds_spark.read.format("lance_native")
            .option("path", root)
            .option("version", str(v))
            .load()
            .collect()
        )
        assert got == expect, f"version {v}"


def test_v2_read_of_backfilled_multifile_dataset(ds_spark, tmp_path_str):
    """spark.read.format('lance_native') over a dataset whose
    fragments carry backfill extra files: the partition reader zips
    the files at physical offsets and pushes filters/projection."""
    import os

    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import (
        add_column_backfill,
        write_dataset,
    )

    root = os.path.join(tmp_path_str, "v2bf")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4], pa.int64()),
                "v": pa.array([10.0, 20.0, 30.0, 40.0], pa.float64()),
            }
        ),
    )
    add_column_backfill(root, "w", pa.float64(), "v * 3", ds_spark)
    df = (
        ds_spark.read.format("lance_native")
        .load(root)
        .where("id >= 2")
        .select("id", "w")
    )
    assert sorted((r["id"], r["w"]) for r in df.collect()) == [
        (2, 60.0), (3, 90.0), (4, 120.0),
    ]
