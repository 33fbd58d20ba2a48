"""Deletion-vector deletes: ``delete_where(dv=True)`` writes a
(_file, _pos) tombstone sidecar and NO data file is rewritten (Lance
deletion-file semantics — at 100 TB, deleting 0.1% of rows must not
rewrite the other 99.9%). Reference parity: Lance fragments'
deletion files (the reference's com.lancedb.lance.Dataset delegates
deletes to them); the Spark-side contract under test is that every
read path excludes tombstoned rows and every rewrite path fails to
resurrect them.
"""

import pytest
from pyspark.sql import Row

from lance_flink_spark.sources.dataset import Dataset


def _df(spark, lo, hi, val=1.0):
    return spark.createDataFrame(
        [Row(id=i, val=float(val), name=f"row-{i}") for i in range(lo, hi)]
    )


@pytest.fixture()
def ds2(spark, tmp_path_str):
    """Two append fragments with disjoint id ranges (0-99, 100-199)."""
    ds = Dataset(tmp_path_str + "/ds")
    ds.write(_df(spark, 0, 100))
    ds.write(_df(spark, 100, 200), mode="append")
    return ds


def _data_files(ds):
    import os

    out = []
    data = os.path.join(ds.path, "data")
    for frag in sorted(os.listdir(data)):
        for name in sorted(os.listdir(os.path.join(data, frag))):
            if name.endswith(".parquet"):
                p = os.path.join(data, frag, name)
                out.append((f"data/{frag}/{name}", os.path.getsize(p), os.path.getmtime(p)))
    return out


def test_dv_delete_removes_rows_without_rewriting(spark, ds2):
    before = [f for f in _data_files(ds2) if not f[0].split("/")[1].startswith("dv")]
    v = ds2.delete_where(spark, "id >= 150", dv=True)
    assert v == 3
    out = ds2.read(spark)
    assert out.count() == 150
    assert out.agg({"id": "max"}).first()[0] == 149
    # the data files are byte-identical — only a dv sidecar appeared
    after = [f for f in _data_files(ds2) if not f[0].split("/")[1].startswith("dv")]
    assert after == before
    man = ds2._load_manifest()["versions"][-1]
    assert man["mode"] == "delete-dv" and man["dv"] and man["dv_rows"] == 50
    assert not man.get("removed_files")
    # time travel: the pre-delete version still sees everything
    assert ds2.read(spark, version=2).count() == 200


def test_dv_delete_no_match_is_noop(spark, ds2):
    assert ds2.delete_where(spark, "id > 10000", dv=True) is None
    assert ds2.versions() == [1, 2]


def test_second_dv_delete_records_only_new_tombstones(spark, ds2):
    ds2.delete_where(spark, "id >= 150", dv=True)
    # overlapping predicate: 100-199 ∩ live = 100-149 → 50 NEW rows
    v = ds2.delete_where(spark, "id >= 100", dv=True)
    assert ds2._load_manifest()["versions"][-1]["dv_rows"] == 50
    assert ds2.read(spark).count() == 100
    # version between the two deletes sees exactly the first delete
    assert ds2.read(spark, version=3).count() == 150
    assert v == 4


def test_dv_then_rewrite_mutation_does_not_resurrect(spark, ds2):
    ds2.delete_where(spark, "id >= 190", dv=True)
    # rewrite-mode mutation touching the same fragment: survivors must
    # exclude the tombstoned rows
    ds2.update_where(spark, "id = 100", {"val": "2.0"})
    out = ds2.read(spark)
    assert out.count() == 190
    assert out.filter("val = 2.0").count() == 1
    # rewrite-mode delete after a dv delete: same invariant
    ds2.delete_where(spark, "id = 101")
    assert ds2.read(spark).count() == 189


def test_dv_then_merge_insert_does_not_resurrect(spark, ds2):
    ds2.delete_where(spark, "id = 199", dv=True)
    src = spark.createDataFrame([Row(id=198, val=9.0, name="upd")])
    ds2.merge_insert(spark, src, on="id")
    out = ds2.read(spark)
    assert out.count() == 199
    assert out.filter("id = 199").count() == 0
    assert out.filter("id = 198").first()["val"] == 9.0


def test_compact_materializes_and_resets_dvs(spark, ds2):
    ds2.delete_where(spark, "id % 2 = 1", dv=True)
    assert ds2._live_dvs()
    ds2.compact(spark)
    assert not ds2._live_dvs()
    assert ds2.read(spark).count() == 100
    assert ds2.read(spark).filter("id % 2 = 1").count() == 0


def test_compact_small_applies_dvs(spark, tmp_path_str):
    ds = Dataset(tmp_path_str + "/ds")
    ds.write(_df(spark, 0, 50))
    ds.write(_df(spark, 50, 100), mode="append")
    ds.delete_where(spark, "id < 10", dv=True)
    v = ds.compact_small(spark, small_bytes=1 << 30)
    assert v is not None
    out = ds.read(spark)
    assert out.count() == 90
    assert out.agg({"id": "min"}).first()[0] == 10


def test_dv_filter_still_pushes_to_scan(spark, ds2):
    ds2.delete_where(spark, "id = 0", dv=True)
    plan = (
        ds2.read(spark, filter="id > 100")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the user filter reaches the parquet reader through the anti-join
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,100)]" in plan
    # and the join stayed broadcast (scan-stage-local)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_dv_cdf_emits_each_delete_once(spark, ds2):
    from pyspark.sql import functions as F

    ds2.delete_where(spark, "id >= 198", dv=True)          # v3: 2 deletes
    ds2.delete_where(spark, "id >= 196", dv=True)          # v4: 2 more
    ds2.update_where(spark, "id = 195", {"val": "5.0"})    # v5: rewrite
    ch = ds2.read_changes(spark, key="id", since_version=2)
    got = [
        (r["id"], r["_change_type"], r["_version"])
        for r in ch.select("id", "_change_type", "_version")
        .orderBy("id", "_version")
        .collect()
    ]
    assert got == [
        (195, "update", 5),
        (196, "delete", 4),
        (197, "delete", 4),
        (198, "delete", 3),
        (199, "delete", 3),
    ]
    # pre-images ride along on dv deletes
    pre = ch.filter("id = 199").first()
    assert pre["name"] == "row-199" and pre["val"] == 1.0
    assert ch.filter(F.col("_change_type") == "delete").count() == 4


def test_dv_read_stream_refuses(spark, ds2):
    ds2.delete_where(spark, "id = 0", dv=True)
    with pytest.raises(ValueError, match="compact"):
        ds2.read_stream(spark)


def test_dv_vacuum_keeps_live_tombstones(spark, ds2):
    ds2.delete_where(spark, "id >= 100", dv=True)
    ds2.write(_df(spark, 200, 210), mode="append")
    ds2.vacuum(keep_versions=2, orphan_grace_seconds=1 << 30)
    # the dv sidecar survives (both retained versions apply it) and
    # reads stay tombstone-correct
    assert ds2._live_dvs()
    assert ds2.read(spark).count() == 110
    with pytest.raises(ValueError, match="expired"):
        ds2.read(spark, version=1)


def test_dv_indexed_reads_exclude_tombstones(spark, ds2):
    ds2.build_scalar_index(spark, "id")
    ds2.delete_where(spark, "id = 42", dv=True)
    # the dv commit staled the index; refresh (full rebuild — mode is
    # not append) and probe
    ds2.update_scalar_index(spark, "id")
    assert ds2.read_eq(spark, "id", 42).count() == 0
    assert ds2.read_eq(spark, "id", 43).count() == 1
    assert ds2.read_in(spark, "id", [41, 42, 43]).count() == 2
    assert ds2.read_range(spark, "id", lower=40, upper=45).count() == 4
    assert ds2.count_eq(spark, "id", 42) == 0


def test_dv_restore_and_overwrite_reset(spark, ds2):
    ds2.delete_where(spark, "id >= 100", dv=True)  # v3
    ds2.restore(2)                                  # v4: pre-delete state
    assert not ds2._live_dvs()
    assert ds2.read(spark).count() == 200
    ds2.restore(3)                                  # v5: deleted state again
    assert ds2._live_dvs()
    assert ds2.read(spark).count() == 100
    ds2.write(_df(spark, 0, 5), mode="overwrite")   # v6: resets dvs
    assert not ds2._live_dvs()
    assert ds2.read(spark).count() == 5


def test_dv_count_rows_and_schema_evolution(spark, ds2):
    ds2.delete_where(spark, "id < 50", dv=True)
    assert ds2.count_rows(spark) == 150
    # schema-evolving append after a dv delete: merged reads keep both
    # the new column and the tombstones
    wide = spark.createDataFrame(
        [Row(id=500, val=1.0, name="w", extra="x")]
    )
    ds2.write(wide, mode="append")
    out = ds2.read(spark)
    assert out.count() == 151
    assert out.filter("extra = 'x'").count() == 1
    assert out.filter("id < 50").count() == 0


def test_dv_sql_surface(spark, tmp_path_str):
    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine

    eng = SqlEngine(spark, Catalog(tmp_path_str))
    eng.execute(
        "CREATE TABLE tdv (id INT, name STRING) WITH ("
        "'connector'='lance', 'delete.mode'='deletion-vector')"
    )
    eng.execute("INSERT INTO tdv VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    eng.execute("DELETE FROM tdv WHERE id = 2")
    assert [r["id"] for r in eng.execute("SELECT id FROM tdv ORDER BY id").collect()] == [1, 3]
    ds = eng.catalog.load_table(eng.database, "tdv")
    assert ds._load_manifest()["versions"][-1]["mode"] == "delete-dv"
    # t$deletes metadata table surfaces the tombstone
    dels = eng.execute("SELECT file, pos FROM tdv$deletes").collect()
    assert len(dels) == 1 and dels[0]["file"].startswith("data/")
    # a table WITHOUT the option keeps the rewrite path
    eng.execute("CREATE TABLE trw (id INT) WITH ('connector'='lance')")
    eng.execute("INSERT INTO trw VALUES (1), (2)")
    eng.execute("DELETE FROM trw WHERE id = 1")
    ds2 = eng.catalog.load_table(eng.database, "trw")
    assert ds2._load_manifest()["versions"][-1]["mode"] == "delete"


def test_dv_update_tombstones_plus_new_fragment(spark, ds2):
    before = [f for f in _data_files(ds2)]
    v = ds2.update_where(spark, "id >= 150", {"val": "val + 1.0"}, dv=True)
    assert v == 3
    out = ds2.read(spark)
    assert out.count() == 200
    assert out.filter("val = 2.0").count() == 50
    assert out.filter("id >= 150 AND val = 1.0").count() == 0
    # pre-existing data files byte-identical; one new m-fragment + one
    # dv sidecar appeared
    after = _data_files(ds2)
    assert [f for f in after if f in before] == before
    news = {f[0].split("/")[1][:2] for f in after if f not in before}
    assert news == {"m0", "dv"}
    man = ds2._load_manifest()["versions"][-1]
    assert man["mode"] == "update-dv" and man["dv_rows"] == 50
    # time travel to the pre-update state
    assert ds2.read(spark, version=2).filter("val = 2.0").count() == 0


def test_dv_update_no_match_is_noop(spark, ds2):
    assert ds2.update_where(spark, "id > 10000", {"val": "0.0"}, dv=True) is None
    assert ds2.versions() == [1, 2]


def test_dv_merge_upserts_without_rewrite(spark, ds2):
    before = [f for f in _data_files(ds2)]
    src = spark.createDataFrame(
        [Row(id=199, val=9.0, name="upd"), Row(id=500, val=5.0, name="new")]
    )
    v = ds2.merge_insert(spark, src, on="id", dv=True)
    assert v == 3
    out = ds2.read(spark)
    assert out.count() == 201
    assert out.filter("id = 199").first()["name"] == "upd"
    assert out.filter("id = 500").first()["val"] == 5.0
    assert [f for f in _data_files(ds2) if f in before] == before
    man = ds2._load_manifest()["versions"][-1]
    assert man["mode"] == "merge-dv" and man["dv_rows"] == 1


def test_dv_merge_no_match_is_plain_append(spark, ds2):
    src = spark.createDataFrame([Row(id=900, val=1.0, name="n")])
    v = ds2.merge_insert(spark, src, on="id", dv=True)
    assert v == 3
    assert ds2.read(spark).count() == 201
    # no sidecar: nothing was tombstoned
    assert not ds2._live_dvs()


def test_dv_update_merge_cdf(spark, ds2):
    from pyspark.sql import functions as F

    ds2.update_where(spark, "id = 10", {"val": "3.0"}, dv=True)   # v3
    src = spark.createDataFrame(
        [Row(id=11, val=4.0, name="row-11"), Row(id=700, val=1.0, name="ins")]
    )
    ds2.merge_insert(spark, src, on="id", dv=True)                 # v4
    ch = ds2.read_changes(spark, key="id", since_version=2)
    got = sorted(
        (r["id"], r["_change_type"], r["_version"])
        for r in ch.select("id", "_change_type", "_version").collect()
    )
    assert got == [
        (10, "update", 3),
        (11, "update", 4),
        (700, "insert", 4),
    ]
    # four-type mode for matview maintenance: pre+post for updates
    ch4 = ds2.read_changes(
        spark, key="id", since_version=2, update_preimages=True
    )
    tenth = {
        r["_change_type"]: r["val"] for r in ch4.filter("id = 10").collect()
    }
    assert tenth == {"update_preimage": 1.0, "update_postimage": 3.0}


def test_dv_update_stacks_with_later_mutations(spark, ds2):
    ds2.update_where(spark, "id = 0", {"val": "2.0"}, dv=True)
    ds2.update_where(spark, "id = 0", {"val": "5.0"}, dv=True)
    out = ds2.read(spark).filter("id = 0").collect()
    assert len(out) == 1 and out[0]["val"] == 5.0
    # compact materializes the chain
    ds2.compact(spark)
    assert not ds2._live_dvs()
    out = ds2.read(spark).filter("id = 0").collect()
    assert len(out) == 1 and out[0]["val"] == 5.0


def test_dv_sql_update_merge(spark, tmp_path_str):
    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine

    eng = SqlEngine(spark, Catalog(tmp_path_str))
    eng.execute(
        "CREATE TABLE tdu (id INT, v DOUBLE) WITH ("
        "'connector'='lance', 'delete.mode'='deletion-vector')"
    )
    eng.execute("INSERT INTO tdu VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    eng.execute("UPDATE tdu SET v = v * 10 WHERE id = 2")
    ds = eng.catalog.load_table(eng.database, "tdu")
    assert ds._load_manifest()["versions"][-1]["mode"] == "update-dv"
    got = {r["id"]: r["v"] for r in eng.execute("SELECT * FROM tdu").collect()}
    assert got == {1: 1.0, 2: 20.0, 3: 3.0}


def test_dv_incremental_index_update_no_rebuild(spark, ds2, monkeypatch):
    ds2.build_scalar_index(spark, "id")
    ds2.delete_where(spark, "id >= 190", dv=True)            # incl. global max
    ds2.update_where(spark, "id = 0", {"val": "7.0"}, dv=True)
    ds2.write(_df(spark, 300, 310), mode="append")
    # the gap is appends + dv commits only: the refresh must fold
    # deltas, never full-rebuild
    def boom(*a, **kw):
        raise AssertionError("full rebuild taken for a foldable gap")

    monkeypatch.setattr(Dataset, "build_scalar_index", boom)
    v = ds2.update_scalar_index(spark, "id")
    assert v == ds2.versions()[-1]
    # counts exact through the folded sidecar
    assert ds2.count_eq(spark, "id", 195) == 0               # tombstoned
    assert ds2.count_eq(spark, "id", 0) == 1                 # update-dv copy
    assert ds2.count_eq(spark, "id", 305) == 1               # appended
    total = ds2.count_by(spark, "id").agg({"cnt": "sum"}).first()[0]
    assert total == 200 - 10 + 10                            # == live rows
    # minmax exact: the deleted global max is gone, append raised it
    assert ds2.minmax(spark, "id") == (0, 309)
    # indexed point reads stay tombstone-correct
    assert ds2.read_eq(spark, "id", 195).count() == 0
    assert ds2.read_eq(spark, "id", 189).count() == 1


def test_dv_incremental_index_max_shrinks_without_append(spark, ds2, monkeypatch):
    ds2.build_scalar_index(spark, "id")
    ds2.delete_where(spark, "id >= 150", dv=True)
    monkeypatch.setattr(
        Dataset, "build_scalar_index",
        lambda *a, **kw: (_ for _ in ()).throw(AssertionError("rebuild")),
    )
    ds2.update_scalar_index(spark, "id")
    # the affected file's bounds were rescanned from its LIVE rows
    assert ds2.minmax(spark, "id") == (0, 149)
    assert ds2.read_range(spark, "id", lower=140, upper=200).count() == 10


def test_dv_index_rewrite_mutation_still_rebuilds(spark, ds2):
    ds2.build_scalar_index(spark, "id")
    ds2.delete_where(spark, "id = 5")  # rewrite-mode: files superseded
    calls = []
    real = Dataset.build_scalar_index
    try:
        Dataset.build_scalar_index = lambda self, s, c: calls.append(c) or real(self, s, c)
        ds2.update_scalar_index(spark, "id")
    finally:
        Dataset.build_scalar_index = real
    assert calls == ["id"]
    assert ds2.count_eq(spark, "id", 5) == 0


def test_dv_delete_keeps_index_routing_usable(spark, ds2):
    ds2.build_scalar_index(spark, "id")
    ds2.delete_where(spark, "id = 42", dv=True)
    # NO index refresh: a delete-dv gap is removals-only, so candidate
    # pruning stays correct (over-approximate) and reads stay
    # tombstone-exact
    assert ds2.read_eq(spark, "id", 42).count() == 0
    assert ds2.read_eq(spark, "id", 43).count() == 1
    assert ds2.read_in(spark, "id", [41, 42]).count() == 1
    assert ds2.read_range(spark, "id", lower=40, upper=45).count() == 4
    # declared-filter auto-routing still goes through the index
    routed = ds2._try_index_prune(spark, "id = 43")
    assert routed is not None and len(routed) >= 1
    # sidecar-ANSWERED aggregates refuse the stale sidecar loudly
    with pytest.raises(ValueError, match="stale"):
        ds2.count_eq(spark, "id", 43)
    with pytest.raises(ValueError, match="stale"):
        ds2.minmax(spark, "id")
    # any non-dv commit in the gap kills prune tolerance too
    ds2.write(_df(spark, 500, 505), mode="append")
    assert ds2._try_index_prune(spark, "id = 43") is None
    with pytest.raises(ValueError, match="stale"):
        ds2.read_eq(spark, "id", 43)


def test_dv_delete_keeps_bloom_usable(spark, ds2):
    ds2.build_bloom_index(spark, "name")
    ds2.delete_where(spark, "id = 42", dv=True)
    assert ds2.read_eq_bloom(spark, "name", "row-42").count() == 0
    assert ds2.read_eq_bloom(spark, "name", "row-43").count() == 1


def test_dv_merge_when_clauses(spark, ds2):
    before = [f for f in _data_files(ds2)]
    src = spark.createDataFrame(
        [
            Row(id=10, val=0.5, name="upd-half"),   # matched, cond val<1 -> delete? no: t.val=1.0
            Row(id=11, val=9.0, name="upd"),        # matched -> update
            Row(id=12, val=-1.0, name="del"),       # matched, s.val<0 -> delete
            Row(id=777, val=3.0, name="ins"),       # not matched -> insert
        ]
    )
    v = ds2.merge_when(
        spark,
        src,
        on="id",
        clauses=[
            {"matched": True, "cond": "s.val < 0", "action": "delete"},
            {"matched": True, "cond": None, "action": "update",
             "sets": {"val": "s.val", "name": "s.name"}},
            {"matched": False, "cond": None, "action": "insert"},
        ],
        dv=True,
    )
    assert v == 3
    out = ds2.read(spark)
    assert out.count() == 200  # 200 - 1 delete + 1 insert
    assert out.filter("id = 12").count() == 0
    assert out.filter("id = 11").first()["val"] == 9.0
    assert out.filter("id = 10").first()["name"] == "upd-half"
    assert out.filter("id = 777").first()["val"] == 3.0
    # no pre-existing file rewritten
    assert [f for f in _data_files(ds2) if f in before] == before
    man = ds2._load_manifest()["versions"][-1]
    assert man["mode"] == "merge-dv" and man["dv_rows"] == 3
    # CDF: delete for 12, updates for 10/11, insert for 777
    ch = ds2.read_changes(spark, key="id", since_version=2)
    got = sorted(
        (r["id"], r["_change_type"]) for r in ch.select("id", "_change_type").collect()
    )
    assert got == [(10, "update"), (11, "update"), (12, "delete"), (777, "insert")]


# ---------- tombstone-heavy compaction (OPTIMIZE "rewrite wins") ----------


def _two_file_ds(spark, path):
    """Two appends → two live files: ids 0..99 (file A) and 100..199
    (file B), val = id as double."""
    ds = Dataset(path)
    ds.write(
        spark.range(0, 100)
        .selectExpr("id", "CAST(id AS DOUBLE) AS val")
        .coalesce(1)
    )
    ds.write(
        spark.range(100, 200)
        .selectExpr("id", "CAST(id AS DOUBLE) AS val")
        .coalesce(1),
        mode="append",
    )
    return ds


def test_compact_small_rewrites_tombstone_heavy_file(spark, tmp_path_str):
    """A file past the 20% dead-row threshold is rewritten regardless
    of size; its deletions materialize and the now-fully-superseded DV
    sidecar is FOLDED (scans stop broadcasting it)."""
    ds = _two_file_ds(spark, tmp_path_str + "/t")
    files_before = ds.live_file_relpaths()
    assert ds.delete_where(spark, "id < 30", dv=True)  # 30% of file A
    assert ds._live_dvs()
    # small_bytes=1: nothing qualifies as "small" — only the tombstone
    # trigger can select files
    v = ds.compact_small(spark, small_bytes=1, tombstone_ratio=0.2)
    assert v is not None
    after = ds.live_file_relpaths()
    # file A superseded, file B byte-identical and still live
    a = [f for f in files_before if f not in after]
    assert len(a) == 1
    assert len([f for f in files_before if f in after]) == 1
    # the sidecar only referenced file A → folded: no live DVs remain
    assert ds._live_dvs() == []
    # data correct, deletions materialized
    assert ds.read(spark).count() == 170
    assert ds.read(spark, filter="id < 30").count() == 0
    # time travel to the pre-compact version still applies the DV
    assert ds.read(spark, version=v - 1).count() == 170


def test_compact_small_below_threshold_noop(spark, tmp_path_str):
    ds = _two_file_ds(spark, tmp_path_str + "/t")
    ds.delete_where(spark, "id < 10", dv=True)  # 10% < 20%
    assert ds.compact_small(spark, small_bytes=1, tombstone_ratio=0.2) is None
    assert ds._live_dvs()  # sidecar untouched


def test_compact_small_keeps_sidecar_spanning_surviving_file(spark, tmp_path_str):
    """A sidecar that tombstones BOTH files, with only one file heavy:
    the heavy file is rewritten but the sidecar stays live (it still
    masks rows of the surviving file) — and reads stay exact."""
    ds = _two_file_ds(spark, tmp_path_str + "/t")
    # 30 dead rows in file A, 1 dead row in file B — one sidecar
    ds.delete_where(spark, "id < 30 OR id = 150", dv=True)
    v = ds.compact_small(spark, small_bytes=1, tombstone_ratio=0.2)
    assert v is not None
    assert ds._live_dvs()  # still live: it masks id=150 in file B
    assert ds.read(spark).count() == 169
    assert ds.read(spark, filter="id = 150").count() == 0


def test_optimize_binpack_sql_materializes_dvs(spark, tmp_path_str):
    """OPTIMIZE ... BINPACK on a heavily-tombstoned table through the
    SQL surface: deletions materialize, sidecars reset, and t$files
    reflects the rewrite."""
    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine

    eng = SqlEngine(spark, Catalog(tmp_path_str + "/cat"))
    eng.execute(
        """CREATE TABLE hot (id BIGINT, val DOUBLE)
           WITH ('connector' = 'lance', 'delete.mode' = 'deletion-vector')"""
    )
    spark.range(0, 1000).selectExpr(
        "id", "CAST(id AS DOUBLE) AS val"
    ).createOrReplaceTempView("hot_src")
    eng.execute("INSERT INTO hot SELECT * FROM hot_src")
    eng.execute("DELETE FROM hot WHERE id % 2 = 0")  # 50% dead
    ds = eng.catalog.load_table("default", "hot")
    assert ds._live_dvs()
    files_before = set(ds.live_file_relpaths())
    eng.execute("OPTIMIZE hot BINPACK")
    assert ds._live_dvs() == []  # sidecars folded into the rewrite
    files_after = set(ds.live_file_relpaths())
    assert files_before.isdisjoint(files_after)  # every hot file rewritten
    eng._register("hot")
    n = eng.execute("SELECT COUNT(*) AS n FROM hot").collect()[0]["n"]
    assert n == 500
    # t$files: only the rewritten file(s) remain, rows reflect the purge
    frows = eng.execute("SELECT * FROM hot$files").collect()
    assert {r["file"] for r in frows} == files_after
    assert sum(r["rows"] for r in frows) == 500


def test_vacuum_reclaims_folded_sidecars(spark, tmp_path_str):
    """Once a tombstone-heavy compact folds a sidecar and the
    pre-compact versions expire, vacuum physically reclaims the
    sidecar files (they were load-bearing only for time travel)."""
    import os

    ds = _two_file_ds(spark, tmp_path_str + "/t")
    ds.delete_where(spark, "id < 30", dv=True)
    dv_frag = ds._live_dvs()[0]
    assert ds.compact_small(spark, small_bytes=1, tombstone_ratio=0.2)
    assert ds._live_dvs() == []  # folded
    # sidecar still on disk: the pre-compact version needs it
    assert os.path.exists(os.path.join(tmp_path_str, "t", dv_frag))
    ds.vacuum(keep_versions=1)
    assert not os.path.exists(os.path.join(tmp_path_str, "t", dv_frag))
    # data intact after the reclaim
    assert ds.read(spark).count() == 170
    assert ds.read(spark, filter="id < 30").count() == 0
