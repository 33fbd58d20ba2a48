"""Dataset round-trip, modes, versioning, max-rows-per-file — mirrors
the reference's LanceSourceTest/LanceSinkTest coverage."""

import glob
import os

import pytest
from pyspark.sql import Row

from lance_flink_spark.sources.dataset import Dataset, DatasetOptions

from conftest import SF_DIR


def _df(spark, n=100, offset=0):
    return spark.createDataFrame(
        [Row(id=i + offset, val=float(i), name=f"row-{i + offset}") for i in range(n)]
    )


def test_write_read_roundtrip(spark, tmp_path_str):
    ds = Dataset(tmp_path_str + "/ds")
    v = ds.write(_df(spark))
    assert v == 1
    out = ds.read(spark)
    assert out.count() == 100
    assert set(out.columns) == {"id", "val", "name"}


def test_append_and_overwrite_versions(spark, tmp_path_str):
    ds = Dataset(tmp_path_str + "/ds")
    ds.write(_df(spark, 10))
    ds.write(_df(spark, 5, offset=100), mode="append")
    assert ds.read(spark).count() == 15
    ds.write(_df(spark, 3, offset=200), mode="overwrite")
    assert ds.read(spark).count() == 3
    # time travel: earlier versions still readable (Lance manifest model)
    assert ds.read(spark, version=1).count() == 10
    assert ds.read(spark, version=2).count() == 15
    assert ds.versions() == [1, 2, 3]


def test_max_rows_per_file(spark, tmp_path_str):
    ds = Dataset(tmp_path_str + "/ds")
    ds.write(_df(spark, 1000).coalesce(1), max_rows_per_file=100)
    files = glob.glob(os.path.join(ds.path, "data", "*", "*.parquet"))
    assert len(files) >= 10


def test_projection_filter_limit(spark, tmp_path_str):
    ds = Dataset(tmp_path_str + "/ds")
    ds.write(_df(spark, 100))
    out = ds.read(spark, columns=["id", "val"], filter="id >= 90", limit=5)
    assert out.columns == ["id", "val"]
    assert out.count() == 5


def test_options_surface():
    opts = DatasetOptions.from_options(
        {
            "path": "/x",
            "read.batch-size": "2048",
            "read.columns": "a, b",
            "read.filter": "a > 1",
            "write.mode": "overwrite",
            "write.max-rows-per-file": "500",
            "index.type": "IVF_PQ",
        }
    )
    assert opts.read_batch_size == 2048
    assert opts.read_columns == ["a", "b"]
    assert opts.write_mode == "overwrite"
    assert opts.write_max_rows_per_file == 500
    assert opts.extra == {"index.type": "IVF_PQ"}


def test_idempotent_tagged_write(spark, tmp_path_str):
    ds = Dataset(tmp_path_str + "/ds")
    v1 = ds.write(_df(spark, 10), tag="batch-0")
    v2 = ds.write(_df(spark, 10), tag="batch-0")  # replay → no-op
    assert v1 == v2
    assert ds.read(spark).count() == 10


def test_bad_mode_rejected(spark, tmp_path_str):
    ds = Dataset(tmp_path_str + "/ds")
    with pytest.raises(ValueError):
        ds.write(_df(spark, 1), mode="upsert")


def test_read_empty_dataset_raises(spark, tmp_path_str):
    with pytest.raises(FileNotFoundError):
        Dataset(tmp_path_str + "/nope").read(spark)


def test_read_stream_picks_up_appends(spark, tmp_path_str):
    """Streaming source parity: appended fragments arrive as new
    micro-batches under one checkpoint."""
    ds = Dataset(tmp_path_str + "/ds")
    ds.write(_df(spark, 10))
    sdf = ds.read_stream(spark)
    ckpt, out = tmp_path_str + "/ckpt", tmp_path_str + "/out"

    def drain():
        q = (
            sdf.writeStream.format("parquet").option("path", out)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).count()

    assert drain() == 10
    ds.write(_df(spark, 5, offset=100), mode="append")
    # same checkpoint → only the new fragment is processed incrementally
    assert drain() == 15


def test_read_stream_merged_schema_after_evolution(spark, tmp_path_str):
    """The stream schema must come from the merged read, not the first
    fragment: columns added by later appends are part of the stream
    (older files surface null)."""
    from pyspark.sql import Row

    ds = Dataset(tmp_path_str + "/ds")
    ds.write(spark.createDataFrame([Row(id=1, v=1.0)]))
    ds.write(spark.createDataFrame([Row(id=2, v=2.0, extra="x")]), mode="append")
    sdf = ds.read_stream(spark)
    assert "extra" in sdf.columns
    out = tmp_path_str + "/out"
    q = (
        sdf.writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", tmp_path_str + "/ckpt")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    vals = {r["id"]: r["extra"] for r in spark.read.parquet(out).collect()}
    assert vals == {1: None, 2: "x"}


def test_read_stream_skips_overwritten_history(spark, tmp_path_str):
    """A fresh stream must not replay fragments hidden by an earlier
    overwrite (r1 advice): v1 is dead after the v2 overwrite; only v2
    and the later append may arrive."""
    ds = Dataset(tmp_path_str + "/ds")
    ds.write(_df(spark, 10))                                # v1 (dead)
    ds.write(_df(spark, 3, offset=100), mode="overwrite")   # v2
    ds.write(_df(spark, 2, offset=200), mode="append")      # v3
    sdf = ds.read_stream(spark)
    out = tmp_path_str + "/out"
    q = (
        sdf.writeStream.format("parquet").option("path", out)
        .outputMode("append").option("checkpointLocation", tmp_path_str + "/ckpt")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(r["id"] for r in spark.read.parquet(out).collect())
    assert got == [100, 101, 102, 200, 201]


def test_version_ge_globs():
    import fnmatch

    from lance_flink_spark.sources.dataset import _version_ge_globs

    for k in (1, 7, 10, 99, 123, 1000, 9999):
        pats = _version_ge_globs(k)
        for n in (1, 6, 7, 8, 9, 10, 42, 99, 100, 123, 999, 1000, 5000, 9999,
                  10000, 12345, 100000, 7654321):
            s = str(n).zfill(4)
            matched = any(fnmatch.fnmatch(s, p) for p in pats)
            assert matched == (n >= k), (k, n)
    # overflow names include the fragment suffix: the width+1 prefix
    # pattern must match them and must NOT match 4-digit names
    pats = [f"v{p}-*" for p in _version_ge_globs(2)]
    assert any(fnmatch.fnmatch("v10000-abcd1234", p) for p in pats)
    assert any(fnmatch.fnmatch("v123456-abcd1234", p) for p in pats)
    assert not any(fnmatch.fnmatch("v0001-abcd1234", p) for p in pats)


def test_dataset_on_hadoop_scheme(spark, tmp_path_str):
    """Manifest + catalog I/O through the JVM Hadoop FileSystem: a
    non-file: scheme (viewfs:// with a mount table onto local disk —
    Hadoop's bundled mock-remote FS) works end-to-end — write,
    versioned manifest, read-back, time travel. The same code path
    serves s3a://; only the FS impl behind the scheme differs."""
    spark._jsc.hadoopConfiguration().set(
        "fs.viewfs.mounttable.dscluster.link./wh", "file://" + tmp_path_str
    )
    path = "viewfs://dscluster/wh/remote_ds"
    ds = Dataset(path)
    ds.write(_df(spark, 5))
    ds.write(_df(spark, 3, offset=100), mode="append")
    assert ds.versions() == [1, 2]
    assert ds.read(spark).count() == 8
    assert ds.read(spark, version=1).count() == 5


def test_catalog_on_hadoop_scheme(spark, tmp_path_str):
    """Catalog CRUD over a non-file: Hadoop scheme (LanceCatalogS3Test
    parity): database + table lifecycle with metadata going through the
    JVM FileSystem."""
    from lance_flink_spark.sources.catalog import Catalog

    spark._jsc.hadoopConfiguration().set(
        "fs.viewfs.mounttable.catcluster.link./wh", "file://" + tmp_path_str
    )
    wh = "viewfs://catcluster/wh/warehouse"
    cat = Catalog(wh)
    assert cat.list_databases() == ["default"]
    cat.create_table("default", "t1", _df(spark, 4))
    assert cat.list_tables("default") == ["t1"]
    assert cat.load_table("default", "t1").read(spark).count() == 4
    cat.rename_table("default", "t1", "t2")
    assert cat.list_tables("default") == ["t2"]
    cat.drop_table("default", "t2")
    assert cat.list_tables("default") == []


def test_schema_evolution_on_append(spark, tmp_path_str):
    """Appending a fragment with an extra column evolves the dataset
    schema; old rows read the new column as null (Lance add-column)."""
    from pyspark.sql import Row

    ds = Dataset(tmp_path_str + "/ds")
    ds.write(spark.createDataFrame([Row(id=1, v=1.0)]))
    ds.write(spark.createDataFrame([Row(id=2, v=2.0, extra="x")]), mode="append")
    out = ds.read(spark)
    assert set(out.columns) == {"id", "v", "extra"}
    vals = {r["id"]: r["extra"] for r in out.collect()}
    assert vals == {1: None, 2: "x"}


def test_sorted_write_clusters_row_groups(spark, tmp_path_str):
    """sort_by writes produce disjoint per-file ranges → parquet
    min/max stats can skip files for range predicates."""
    import pyarrow.parquet as pq

    ds = Dataset(tmp_path_str + "/ds")
    ds.write(_df(spark, 1000), sort_by=["id"], max_rows_per_file=200)
    files = glob.glob(os.path.join(ds.path, "data", "*", "*.parquet"))
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        col = [md.schema.column(i).name for i in range(md.num_columns)].index("id")
        st = md.row_group(0).column(col).statistics
        ranges.append((st.min, st.max))
    ranges.sort()
    # disjoint, ordered ranges across files
    assert all(ranges[i][1] < ranges[i + 1][0] for i in range(len(ranges) - 1))
    assert ds.read(spark, filter="id < 50").count() == 50


def test_compact_preserves_data_and_history(spark, tmp_path_str):
    ds = Dataset(tmp_path_str + "/ds")
    for i in range(5):
        ds.write(_df(spark, 10, offset=i * 10))
    v = ds.compact(spark)
    assert ds.read(spark).count() == 50
    assert ds.read(spark, version=v - 1).count() == 50  # pre-compaction view intact
    ids = {r["id"] for r in ds.read(spark).collect()}
    assert ids == set(range(50))


def test_read_stream_max_files_per_trigger_splits_batches(spark, tmp_path_str):
    """A large append written as many small part-files is consumed
    across >= 2 micro-batches under maxFilesPerTrigger, with
    exactly-once totals (sub-fragment admission control — the Spark
    analogue of the reference's checkpointed mid-fragment resume)."""
    ds = Dataset(tmp_path_str + "/ds")
    # 40 rows, <=5 rows per file -> >= 8 part-files in one fragment
    ds.write(_df(spark, 40).repartition(1), max_rows_per_file=5)
    sdf = ds.read_stream(spark, max_files_per_trigger=2)
    batch_sizes = []

    def sink(batch_df, batch_id):
        batch_sizes.append(batch_df.count())

    q = (
        sdf.writeStream.foreachBatch(sink)
        .option("checkpointLocation", tmp_path_str + "/ckpt")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    assert len(batch_sizes) >= 2          # split, not one giant batch
    assert sum(batch_sizes) == 40         # exactly-once totals


def test_zorder_write_tightens_both_dimensions(spark, tmp_path_str):
    """Z-order clustering must keep parquet file min/max stats tight on
    BOTH columns; a linear sort only bounds the leading one. Coverage =
    mean over files of (max-min)/global_range per column."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    n = 20_000
    df = (
        spark.range(n)
        .select(
            (F.col("id") % 141).cast("double").alias("x"),
            ((F.col("id") * 2654435761) % 139).cast("double").alias("y"),
        )
    )

    def coverage(root, col):
        fracs = []
        for p in glob.glob(os.path.join(root, "data", "v0001-*", "*.parquet")):
            md = pq.read_metadata(p)
            names = md.schema.names
            ci = names.index(col)
            mins = [md.row_group(i).column(ci).statistics.min for i in range(md.num_row_groups)]
            maxs = [md.row_group(i).column(ci).statistics.max for i in range(md.num_row_groups)]
            fracs.append((max(maxs) - min(mins)))
        rng = 141.0 if col == "x" else 139.0
        return sum(fracs) / len(fracs) / rng

    zds = Dataset(tmp_path_str + "/zds")
    zds.write(df, zorder_by=["x", "y"], max_rows_per_file=1250)
    lds = Dataset(tmp_path_str + "/lds")
    lds.write(df.repartitionByRange(16, "x").sortWithinPartitions("x"), max_rows_per_file=1250)

    zx, zy = coverage(tmp_path_str + "/zds", "x"), coverage(tmp_path_str + "/zds", "y")
    lx, ly = coverage(tmp_path_str + "/lds", "x"), coverage(tmp_path_str + "/lds", "y")
    # linear sort: x tight, y spans ~everything
    assert lx < 0.35 and ly > 0.8
    # z-order: BOTH dimensions bounded well below the linear sort's y
    assert zx < 0.6 and zy < 0.6, (zx, zy, lx, ly)
    # data preserved
    assert zds.read(spark).count() == n


def test_zorder_write_validation(spark, tmp_path_str):
    ds = Dataset(tmp_path_str + "/ds")
    df = _df(spark, 10)
    with pytest.raises(ValueError, match=">= 2"):
        ds.write(df, zorder_by=["id"])
    with pytest.raises(ValueError, match="mutually exclusive"):
        ds.write(df, zorder_by=["id", "val"], sort_by=["id"])
    with pytest.raises(ValueError, match="not in frame"):
        ds.write(df, zorder_by=["id", "nope"])


def test_zorder_rejects_non_orderable(spark, tmp_path_str):
    """Strings/dates Z-order fine now; truly unorderable types (arrays,
    maps) must still fail loudly."""
    from pyspark.sql import functions as F

    ds = Dataset(tmp_path_str + "/ds")
    df = _df(spark, 10).withColumn("arr", F.array("id"))
    with pytest.raises(ValueError, match="orderable"):
        ds.write(df, zorder_by=["id", "arr"])


def test_zorder_write_tightens_date_string_pair(spark, tmp_path_str):
    """Z-order on a (date, string) pair — the Delta OPTIMIZE ZORDER
    shape the numeric-only restriction used to reject — must keep
    per-file min/max tight on BOTH dims (rank-space sample splits)."""
    import datetime

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    n = 20_000
    df = spark.range(n).select(
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 141).cast("int")).alias("d"),
        F.format_string("k%04d", (F.col("id") * 2654435761) % 139).alias("s"),
    )

    def coverage(root, col, to_num):
        fracs = []
        for p in glob.glob(os.path.join(root, "data", "v0001-*", "*.parquet")):
            md = pq.read_metadata(p)
            ci = md.schema.names.index(col)
            mins, maxs = [], []
            for i in range(md.num_row_groups):
                st = md.row_group(i).column(ci).statistics
                mins.append(to_num(st.min))
                maxs.append(to_num(st.max))
            fracs.append(max(maxs) - min(mins))
        rng = 140.0 if col == "d" else 138.0
        return sum(fracs) / len(fracs) / rng

    def date_num(v):
        if isinstance(v, datetime.date):
            return (v - datetime.date(2024, 1, 1)).days
        return int(v)  # days-since-epoch int stat

    def str_num(v):
        if isinstance(v, bytes):
            v = v.decode()
        return int(v[1:])

    zds = Dataset(tmp_path_str + "/zds")
    zds.write(df, zorder_by=["d", "s"], max_rows_per_file=1250)
    lds = Dataset(tmp_path_str + "/lds")
    lds.write(df.repartitionByRange(16, "d").sortWithinPartitions("d"), max_rows_per_file=1250)

    zd, zs = coverage(tmp_path_str + "/zds", "d", date_num), coverage(tmp_path_str + "/zds", "s", str_num)
    ld, ls = coverage(tmp_path_str + "/lds", "d", date_num), coverage(tmp_path_str + "/lds", "s", str_num)
    assert ld < 0.35 and ls > 0.8  # linear: only the date is tight
    assert zd < 0.6 and zs < 0.6, (zd, zs, ld, ls)
    assert zds.read(spark).count() == n


def test_scalar_index_prunes_files_on_equality(spark, tmp_path_str):
    """Equality lookups through the scalar index must scan only the
    files containing the value — observable via inputFiles()."""
    from pyspark.sql import functions as F

    ds = Dataset(tmp_path_str + "/ds")
    # 10 files, category c0..c9 each confined to one file
    df = spark.range(1000).select(
        F.col("id"),
        F.concat(F.lit("c"), (F.col("id") % 10)).alias("cat"),
    ).repartition(10, "cat")
    ds.write(df, max_rows_per_file=200)
    total_files = len(ds.read(spark).inputFiles())
    assert total_files >= 5
    ds.build_scalar_index(spark, "cat")
    hit = ds.read_eq(spark, "cat", "c3")
    assert len(hit.inputFiles()) < total_files
    assert hit.count() == 100
    assert {r["cat"] for r in hit.collect()} == {"c3"}
    # missing value -> empty, no scan
    assert ds.read_eq(spark, "cat", "zzz").count() == 0
    # staleness: any write invalidates
    extra = spark.createDataFrame([(9999, "c3")], "id long, cat string")
    ds.write(extra, mode="append")
    with pytest.raises(ValueError, match="stale"):
        ds.read_eq(spark, "cat", "c3")
    ds.build_scalar_index(spark, "cat")
    assert ds.read_eq(spark, "cat", "c3").count() == 101
    with pytest.raises(ValueError, match="unknown column"):
        ds.build_scalar_index(spark, "nope")
    with pytest.raises(ValueError, match="no scalar index"):
        ds.read_eq(spark, "id", 5)


def test_scalar_index_routes_declared_filters_and_in_lists(spark, tmp_path_str):
    from pyspark.sql import functions as F

    ds = Dataset(tmp_path_str + "/ds")
    df = spark.range(1000).select(
        F.col("id"),
        F.concat(F.lit("c"), (F.col("id") % 10)).alias("cat"),
    ).repartition(10, "cat")
    ds.write(df, max_rows_per_file=200)
    total = len(ds.read(spark).inputFiles())
    unrouted = ds.read(spark, filter="cat = 'c3'")
    assert len(unrouted.inputFiles()) == total  # no index yet: full scan
    ds.build_scalar_index(spark, "cat")
    routed = ds.read(spark, filter="cat = 'c3'")
    assert len(routed.inputFiles()) < total  # same API, fewer files
    assert routed.count() == 100
    # complex filters fall through to the full scan, same results
    both = ds.read(spark, filter="cat = 'c3' OR cat = 'c4'")
    assert both.count() == 200
    # IN-list lookup (bitmap union)
    hit = ds.read_in(spark, "cat", ["c3", "c4"])
    assert len(hit.inputFiles()) < total
    assert hit.count() == 200
    assert ds.read_in(spark, "cat", ["zzz"]).count() == 0


def test_scalar_index_range_lookup_prunes_files(spark, tmp_path_str):
    """Range predicates through the scalar index must scan strictly
    fewer files than the full scan (per-file min/max sidecar), with
    exact results — the Lance BTREE range-lookup analogue."""
    from pyspark.sql import functions as F

    ds = Dataset(tmp_path_str + "/ds")
    # ids clustered into files by century: file k holds [100k, 100k+100)
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") / 100).cast("long").alias("bucket")
    ).repartition("bucket")
    ds.write(df, max_rows_per_file=200)
    total = len(ds.read(spark).inputFiles())
    assert total >= 5
    ds.build_scalar_index(spark, "id")

    hit = ds.read_range(spark, "id", lower=250, upper=350)
    assert len(hit.inputFiles()) < total
    assert hit.count() == 100
    vals = {r["id"] for r in hit.collect()}
    assert vals == set(range(250, 350))

    # bound inclusivity
    assert ds.read_range(spark, "id", lower=100, upper=200).count() == 100
    assert (
        ds.read_range(
            spark, "id", lower=100, upper=200, include_lower=False, include_upper=True
        ).count()
        == 100
    )
    # one-sided + empty ranges
    assert ds.read_range(spark, "id", lower=900).count() == 100
    assert ds.read_range(spark, "id", upper=0).count() == 0
    with pytest.raises(ValueError, match="at least one bound"):
        ds.read_range(spark, "id")
    # staleness contract matches read_eq
    ds.write(spark.range(1).select(F.col("id"), F.lit(99).alias("bucket")), mode="append")
    with pytest.raises(ValueError, match="stale"):
        ds.read_range(spark, "id", lower=0, upper=10)


def test_scalar_index_routes_range_filters(spark, tmp_path_str):
    """read(filter=...) auto-routing must handle < > <= >= BETWEEN and
    single-column AND-chains, not just equality."""
    from pyspark.sql import functions as F

    ds = Dataset(tmp_path_str + "/ds")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") / 100).cast("long").alias("bucket")
    ).repartition("bucket")
    ds.write(df, max_rows_per_file=200)
    total = len(ds.read(spark).inputFiles())
    ds.build_scalar_index(spark, "id")

    for flt, expect in [
        ("id < 100", 100),
        ("id >= 900", 100),
        ("id BETWEEN 250 AND 349", 100),
        ("id >= 420 AND id < 480", 60),
    ]:
        routed = ds.read(spark, filter=flt)
        assert len(routed.inputFiles()) < total, flt
        assert routed.count() == expect, flt
    # a multi-column AND still prunes on the indexed column (bucket
    # has no index, so its conjunct over-approximates to all files)
    mixed = ds.read(spark, filter="id < 100 AND bucket = 0")
    assert mixed.count() == 100
    assert len(mixed.inputFiles()) < total
    # genuinely unparsable shapes (OR) fall through to the full scan
    full = ds.read(spark, filter="id < 100 OR bucket = 9")
    assert full.count() == 200
    assert len(full.inputFiles()) == total


def test_scalar_index_routed_read_conforms_to_merged_schema(spark, tmp_path_str):
    """ADVICE regression: after a schema-evolving append, a routed
    read() whose matching rows live only in OLD files must still
    surface the newer columns (as nulls), exactly like the unrouted
    scan of the same call."""
    from pyspark.sql import functions as F

    ds = Dataset(tmp_path_str + "/ds")
    ds.write(
        spark.range(100).select(F.col("id"), F.concat(F.lit("c"), F.col("id") % 4).alias("cat"))
    )
    # evolve schema: new column exists only in the second fragment
    ds.write(
        spark.range(100, 200).select(
            F.col("id"),
            F.lit("c9").alias("cat"),
            F.lit(1.5).alias("score"),
        ),
        mode="append",
    )
    ds.build_scalar_index(spark, "cat")
    routed = ds.read(spark, filter="cat = 'c3'")
    assert "score" in routed.columns  # old-file-only match keeps full schema
    rows = routed.collect()
    assert len(rows) == 25
    assert all(r["score"] is None for r in rows)
    # columns= naming the evolved column must not raise on routed reads
    assert ds.read(spark, columns=["id", "score"], filter="cat = 'c3'").count() == 25


def test_vacuum_keeps_live_fragment_dir_without_success_marker(spark, tmp_path_str):
    """ADVICE regression: a fragment still LIVE at the latest version
    whose parquet files were ALL superseded by a mutation must keep its
    directory after vacuum even when no _SUCCESS marker exists (markers
    are disabled on object stores) — reads listdir every live fragment."""
    import glob as _glob

    ds = Dataset(tmp_path_str + "/ds")
    ds.write(_df(spark, 10))
    # supersede every row of the v1 fragment
    ds.update_where(spark, "true", {"val": "val + 1000.0"})
    # simulate marksuccessfuljobs=false: drop non-parquet marker files
    for p in _glob.glob(tmp_path_str + "/ds/data/v0001-*/*"):
        if not p.endswith(".parquet"):
            os.remove(p)
    ds.vacuum(keep_versions=1)
    # the v1 fragment dir must survive (it is live, files merely dead)
    assert _glob.glob(tmp_path_str + "/ds/data/v0001-*")
    out = ds.read(spark)
    assert out.count() == 10
    assert all(r["val"] >= 1000.0 for r in out.collect())


def test_read_stream_exactly_once_across_mutation(spark, tmp_path_str):
    """A mutation committed MID-stream must not double-feed rows: the
    rewrite fragment is m-prefixed and invisible to the v* stream glob,
    so totals across an append→update→append history count each
    original row exactly once."""
    ds = Dataset(tmp_path_str + "/ds")
    ds.write(_df(spark, 10))
    sdf = ds.read_stream(spark)
    ckpt, out = tmp_path_str + "/ckpt", tmp_path_str + "/out"

    def drain():
        q = (
            sdf.writeStream.format("parquet").option("path", out)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return [r["id"] for r in spark.read.parquet(out).collect()]

    assert sorted(drain()) == list(range(10))
    # mid-stream mutation: rewrites every row of the first fragment
    ds.update_where(spark, "true", {"val": "val + 1000.0"})
    got = drain()
    assert sorted(got) == list(range(10)), "mutation rewrite was double-fed"
    # appends after the mutation still arrive
    ds.write(_df(spark, 5, offset=100), mode="append")
    got = drain()
    assert sorted(got) == list(range(10)) + list(range(100, 105))
    assert len(got) == len(set(got))  # exactly-once on every row
    # batch read sees the POST-mutation state, unlike the stream
    assert all(r["val"] >= 1000.0 for r in ds.read(spark).filter("id < 10").collect())
    # fresh streams on a mutated dataset still refuse until compact()
    with pytest.raises(ValueError, match="compact"):
        Dataset(tmp_path_str + "/ds").read_stream(spark)


def test_read_changes_long_history_bounded_plan(spark, tmp_path_str):
    """A 50-version mutation history must stay readable in bounded
    time: read_changes localCheckpoints the accumulating feed every
    checkpoint_every versions, so the plan never grows past ~16
    diff segments no matter the history length."""
    from pyspark.sql import Row

    ds = Dataset(tmp_path_str + "/ds")
    ds.write(spark.createDataFrame([Row(id=i, val=0.0) for i in range(8)]).coalesce(1))
    expect_updates = 0
    for k in range(1, 50):  # 49 more versions: appends + sprinkled updates
        if k % 5 == 0:
            ds.update_where(spark, f"id = {k % 8}", {"val": f"val + {k}.0"})
            expect_updates += 1
        else:
            ds.write(
                spark.createDataFrame([Row(id=100 + k, val=float(k))]).coalesce(1),
                mode="append",
            )
    assert len(ds.versions()) == 50
    feed = ds.read_changes(spark, key="id")
    by_type = {r["_change_type"]: r["n"] for r in
               feed.groupBy("_change_type").count().withColumnRenamed("count", "n").collect()}
    assert by_type.get("update", 0) == expect_updates
    assert by_type.get("insert", 0) == 8 + (49 - expect_updates)
    assert "delete" not in by_type


def test_write_compression_option(spark, tmp_path_str):
    """write.compression routes to the parquet codec per fragment;
    mixed codecs within one dataset read fine (per-file metadata)."""
    import glob

    from pyspark.sql import Row

    from lance_flink_spark.sources.dataset import Dataset, DatasetOptions

    ds = Dataset(tmp_path_str + "/comp")
    df = spark.createDataFrame([Row(id=i, t="x" * 100) for i in range(1000)])
    ds.write(df, compression="zstd")
    ds.write(df, mode="append", compression="snappy")
    files = glob.glob(ds.path + "/data/*/*.parquet")
    codecs = {f.rsplit(".", 2)[-2] for f in files}
    assert codecs == {"zstd", "snappy"}
    assert ds.read(spark).count() == 2000
    opts = DatasetOptions.from_options(
        {"path": "", "write.compression": "zstd"}
    )
    assert opts.write_compression == "zstd"


def test_update_scalar_index_incremental_and_fallback(spark, tmp_path_str):
    from pyspark.sql import Row

    from lance_flink_spark.sources.dataset import Dataset
    from lance_flink_spark.sources import fsio

    ds = Dataset(tmp_path_str + "/inc_idx")
    ds.write(spark.createDataFrame([Row(id=i, cat=f"c{i % 3}") for i in range(60)]))
    v1 = ds.build_scalar_index(spark, "cat")
    assert v1 == 1
    # append brings a NEW category; the delta update must index it
    ds.write(
        spark.createDataFrame([Row(id=100 + i, cat="c9") for i in range(10)]),
        mode="append",
    )
    v2 = ds.update_scalar_index(spark, "cat")
    assert v2 == 2
    # routed lookup of the new value scans only the new fragment's files
    out = ds.read_eq(spark, "cat", "c9")
    assert out.count() == 10
    assert all("/v0002-" in f for f in out.inputFiles())
    # old values still found (old sidecar carried forward)
    assert ds.read_eq(spark, "cat", "c1").count() == 20
    # auto-routing sees the refreshed index as fresh
    assert ds.read(spark, filter="cat = 'c9'").count() == 10
    # no-op when already current
    assert ds.update_scalar_index(spark, "cat") == 2
    # a mutation in the gap falls back to a full rebuild — still correct
    ds.delete_where(spark, "cat = 'c0'")
    v3 = ds.update_scalar_index(spark, "cat")
    assert v3 == 3
    assert ds.read_eq(spark, "cat", "c0").count() == 0
    assert ds.read_eq(spark, "cat", "c9").count() == 10


def test_count_eq_answers_from_index_sidecar(spark, tmp_path_str):
    """COUNT(*) WHERE col = v from the sidecar's per-(value, file)
    counts — validated against a real scan, incl. after a delta
    index update."""
    from pyspark.sql import Row

    from lance_flink_spark.sources.dataset import Dataset

    ds = Dataset(tmp_path_str + "/cnt_idx")
    ds.write(spark.createDataFrame([Row(id=i, cat=f"c{i % 3}") for i in range(90)]))
    ds.build_scalar_index(spark, "cat")
    assert ds.count_eq(spark, "cat", "c1") == 30
    assert ds.count_eq(spark, "cat", "nope") == 0
    ds.write(
        spark.createDataFrame([Row(id=200 + i, cat="c1") for i in range(7)]),
        mode="append",
    )
    ds.update_scalar_index(spark, "cat")
    assert ds.count_eq(spark, "cat", "c1") == 37
    assert ds.count_eq(spark, "cat", "c1") == ds.read(spark).filter(
        "cat = 'c1'"
    ).count()


def test_count_by_and_minmax_answered_from_sidecars(spark, tmp_path_str):
    """GROUP BY counts and global MIN/MAX answered ENTIRELY from index
    sidecars — parity vs real scans, incl. after a delta update."""
    from pyspark.sql import Row

    from lance_flink_spark.sources.dataset import Dataset

    ds = Dataset(tmp_path_str + "/agg_idx")
    ds.write(
        spark.createDataFrame(
            [Row(id=i, cat=f"c{i % 4}", v=i * 3) for i in range(80)]
        )
    )
    ds.build_scalar_index(spark, "cat")
    ds.build_scalar_index(spark, "v")
    got = {r["cat"]: r["cnt"] for r in ds.count_by(spark, "cat").collect()}
    want = {
        r["cat"]: r["n"]
        for r in ds.read(spark).groupBy("cat").count().withColumnRenamed("count", "n").collect()
    }
    assert got == want
    assert ds.minmax(spark, "v") == (0, 237)

    ds.write(
        spark.createDataFrame([Row(id=100, cat="c9", v=-5)]), mode="append"
    )
    ds.update_scalar_index(spark, "cat")
    ds.update_scalar_index(spark, "v")
    assert ds.count_by(spark, "cat").filter("cat = 'c9'").first()["cnt"] == 1
    assert ds.minmax(spark, "v") == (-5, 237)


def test_driver_side_schema_inference_matches_spark(spark, tmp_path_str):
    """_infer_merged_schema's pyarrow fast path must return the same
    StructType Spark's distributed mergeSchema produces — including
    add-column evolution (older files null-fill) and NTZ mapping."""
    from pyspark.sql import functions as F

    from lance_flink_spark.sources.dataset import Dataset

    ds = Dataset(tmp_path_str + "/schema_ds")
    base = spark.range(10).select(
        F.col("id"),
        (F.col("id") * 1.5).alias("v"),
        F.lit("x").alias("s"),
        F.current_timestamp().alias("ts"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("arr"),
    )
    ds.write(base)
    ds.write(base.withColumn("extra", F.lit(7)), mode="append")  # evolve
    frags = ds._live_paths()
    fast = ds._infer_merged_schema(spark, frags)
    slow = spark.read.option("mergeSchema", "true").parquet(*frags).schema
    assert {f.name: f.dataType for f in fast.fields} == {
        f.name: f.dataType for f in slow.fields
    }
    # the evolved column surfaces as null on old fragments either way
    assert ds.read(spark).filter("extra IS NULL").count() == 10
