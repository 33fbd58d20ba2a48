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
