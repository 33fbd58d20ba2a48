"""Row-group-granularity scalar-index pruning (Lance BTREE analogue):
a selective range predicate inside a large multi-row-group file reads
only the qualifying row groups, not the whole file."""

import pyarrow.parquet as pq
import pytest
from pathlib import Path

from lance_flink_spark.sources.dataset import Dataset


@pytest.fixture(scope="module")
def ds(spark, tmp_path_factory):
    """One dataset, ONE data file, many row groups, sorted on v so the
    per-row-group [lo, hi] spans are disjoint."""
    root = str(tmp_path_factory.mktemp("rgidx") / "ds")
    df = spark.range(4000).selectExpr(
        "id", "CAST(id AS DOUBLE) AS v", "CAST(id % 7 AS STRING) AS tag"
    )
    d = Dataset(root)
    # tiny parquet.block.size forces many row groups into the single
    # coalesced file; sort_by gives them disjoint stats
    d.write(df.coalesce(1), sort_by=["v"], row_group_bytes=4096)
    d.build_scalar_index(spark, "v")
    return d


def _the_file(ds):
    files = [p for p in Path(ds.path).rglob("*.parquet") if "/data/" in str(p)]
    assert len(files) == 1
    return files[0]


def test_single_file_many_row_groups(ds):
    md = pq.ParquetFile(str(_the_file(ds))).metadata
    assert md.num_row_groups >= 4  # the premise: file-level can't prune


def test_rowgroup_sidecar_written(ds, spark):
    v = ds.versions()[-1]
    side = Path(ds.path) / "_scalar_index" / "v" / f"v{v:04d}_rowgroups"
    assert side.exists()
    rows = spark.read.parquet(str(side)).collect()
    md = pq.ParquetFile(str(_the_file(ds))).metadata
    assert len(rows) == md.num_row_groups
    assert sum(r["n_rows"] for r in rows) == 4000
    # stats mirror the footers
    by_rg = {r["rg"]: r for r in rows}
    for i in range(md.num_row_groups):
        st = md.row_group(i).column(1).statistics  # v column
        assert by_rg[i]["lo"] == st.min and by_rg[i]["hi"] == st.max


def test_range_prunes_row_groups_inside_a_file(ds, spark):
    """The verdict's acceptance bar: a selective range predicate reads
    fewer row groups than file-level pruning alone (which here = ALL
    of them, since there is exactly one file)."""
    md = pq.ParquetFile(str(_the_file(ds))).metadata
    pairs = ds.range_rowgroups(spark, "v", lower=100.0, upper=200.0)
    assert 0 < len(pairs) < md.num_row_groups


def test_rowgroup_read_matches_full_scan(ds, spark):
    got = ds.read_range(spark, "v", lower=100.0, upper=200.0)
    want = ds.read(spark).filter("v >= 100.0 AND v < 200.0")
    assert sorted(r["id"] for r in got.collect()) == sorted(
        r["id"] for r in want.collect()
    )
    # bounds + half-open semantics preserved through the rg path
    vals = [r["v"] for r in got.collect()]
    assert min(vals) == 100.0 and max(vals) == 199.0


def test_rowgroup_read_with_projection_and_unbounded_side(ds, spark):
    got = ds.read_range(spark, "v", lower=3900.0, columns=["id", "tag"])
    assert got.columns == ["id", "tag"]
    assert got.count() == 100


def test_incremental_update_extends_rowgroup_sidecar(ds, spark):
    """An append + update_scalar_index unions new-file row groups into
    the sidecar; probes spanning old+new data stay correct."""
    extra = spark.range(4000, 4500).selectExpr(
        "id", "CAST(id AS DOUBLE) AS v", "CAST(id % 7 AS STRING) AS tag"
    )
    ds.write(extra.coalesce(1), sort_by=["v"], row_group_bytes=4096)
    ds.update_scalar_index(spark, "v")
    got = ds.read_range(spark, "v", lower=3950.0, upper=4050.0)
    assert sorted(r["id"] for r in got.collect()) == list(range(3950, 4050))


def test_no_matching_rowgroups_returns_empty(ds, spark):
    assert ds.read_range(spark, "v", lower=1e9).count() == 0


def test_null_stats_row_groups_are_must_read(spark, tmp_path_factory):
    """A row group whose sidecar lo/hi is NULL (the footer had no
    usable min/max — NaN-policy writers, truncated binary stats) must
    be READ, not pruned: the prune condition on lo/hi evaluates NULL
    for it, and NULL->filtered would silently lose its rows. Simulated
    by nulling the sidecar rows for the row groups that hold the probe
    range (Spark's own writer always emits stats, so the NULL shape is
    injected the way a foreign writer would produce it)."""
    import pandas as pd

    root = str(tmp_path_factory.mktemp("rgnull") / "ds")
    df = spark.range(2000).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    d = Dataset(root)
    d.write(df.coalesce(1), sort_by=["v"], row_group_bytes=4096)
    d.build_scalar_index(spark, "v")

    v = d.versions()[-1]
    side = Path(d.path) / "_scalar_index" / "v" / f"v{v:04d}_rowgroups"
    pdf = spark.read.parquet(str(side)).toPandas()
    hit = (pdf["lo"] <= 260.0) & (pdf["hi"] >= 240.0)
    assert hit.any(), "premise: some row group covers the probe range"
    pdf.loc[hit, ["lo", "hi"]] = None
    spark.createDataFrame(
        pdf, "\u005ffile string, rg int, n_rows long, lo double, hi double"
    ).write.mode("overwrite").parquet(str(side))

    nulled = {
        (r["_file"], int(r["rg"]))
        for _, r in pdf[hit].iterrows()
    }

    # rows inside the now-stats-less row groups must still come back
    got = sorted(
        r["id"]
        for r in d.read_range(spark, "v", lower=240.0, upper=260.0).collect()
    )
    assert got == list(range(240, 260))  # half-open [lower, upper)

    # the introspection surface agrees: stats-less RGs are listed
    listed = set(d.range_rowgroups(spark, "v", lower=240.0, upper=260.0))
    assert nulled <= listed
