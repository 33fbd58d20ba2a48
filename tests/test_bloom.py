"""Bloom-filter sidecar (sources/bloom.py): candidate pruning is
sound (never misses the true file), effective (absent values prune
nearly everything at the configured fpp), and version-guarded."""

import pytest

from lance_flink_spark.sources.bloom import bloom_candidate_files
from lance_flink_spark.sources.dataset import Dataset


@pytest.fixture(scope="module")
def ds(spark, tmp_path_factory):
    """Four files of 1000 high-cardinality ids each (disjoint)."""
    root = str(tmp_path_factory.mktemp("bloom") / "ds")
    d = Dataset(root)
    for i in range(4):
        df = spark.range(i * 1000, (i + 1) * 1000).selectExpr(
            "id", "concat('doc-', id) AS doc_key", "id % 7 AS grp"
        )
        d.write(df.coalesce(1), mode="append")
    d.build_bloom_index(spark, "doc_key", fpp=0.01)
    return d


def test_probe_finds_the_right_file_and_rows(ds, spark):
    for probe, want_rows in [("doc-5", 1), ("doc-2500", 1), ("doc-3999", 1)]:
        cands = bloom_candidate_files(ds, spark, "doc_key", probe)
        assert 1 <= len(cands) <= 2  # the true file (+ rare fp)
        got = ds.read_eq_bloom(spark, "doc_key", probe).collect()
        assert len(got) == want_rows
        assert got[0]["doc_key"] == probe


def test_matches_full_scan(ds, spark):
    want = ds.read(spark).filter("doc_key = 'doc-1234'").collect()
    got = ds.read_eq_bloom(spark, "doc_key", "doc-1234").collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in want]


def test_absent_values_prune_at_fpp(ds, spark):
    """200 absent probes over 4 files: candidate hits are false
    positives, expected ~1% of 800 tests — assert well under 10%."""
    hits = sum(
        len(bloom_candidate_files(ds, spark, "doc_key", f"nope-{i}"))
        for i in range(200)
    )
    assert hits <= 80  # 10% of 800; expectation is ~8


def test_absent_value_returns_empty_frame(ds, spark):
    out = ds.read_eq_bloom(spark, "doc_key", "missing")
    assert out.count() == 0
    assert "doc_key" in out.columns


def test_projection(ds, spark):
    out = ds.read_eq_bloom(spark, "doc_key", "doc-42", columns=["id", "grp"])
    assert out.columns == ["id", "grp"]
    assert out.count() == 1


def test_stale_index_raises(ds, spark):
    ds.write(
        spark.range(4000, 4001).selectExpr(
            "id", "concat('doc-', id) AS doc_key", "id % 7 AS grp"
        ),
        mode="append",
    )
    with pytest.raises(ValueError, match="stale"):
        ds.read_eq_bloom(spark, "doc_key", "doc-1")
    ds.build_bloom_index(spark, "doc_key", fpp=0.01)
    assert ds.read_eq_bloom(spark, "doc_key", "doc-4000").count() == 1


def test_declared_filter_auto_routes_via_bloom(ds, spark):
    """read(filter='doc_key = ...') with no scalar index but a fresh
    bloom sidecar scans only candidate files (inputFiles pruning)."""
    routed = ds.read(spark, filter="doc_key = 'doc-42'")
    assert routed.count() == 1
    assert len(routed.inputFiles()) <= 2  # candidates, not all 5 files
    full = ds.read(spark)
    assert len(full.inputFiles()) >= 5


def test_fractional_columns_refused(spark, tmp_path):
    d = Dataset(str(tmp_path / "fds"))
    d.write(spark.range(10).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    with pytest.raises(ValueError, match="string/integral"):
        d.build_bloom_index(spark, "v")
