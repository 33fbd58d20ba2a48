"""Row-level mutations on Dataset: delete_where / update_where /
merge_insert (Lance delete + merge_insert parity). The key property
under test besides correctness is FRAGMENT PRUNING: files with no
affected rows must be neither rewritten nor superseded."""

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


def _removed(ds):
    out = set()
    for v in ds._load_manifest()["versions"]:
        out.update(v.get("removed_files", ()))
    return out


def test_delete_where_basic_and_time_travel(spark, ds2):
    v = ds2.delete_where(spark, "id >= 150")
    assert v == 3
    out = ds2.read(spark)
    assert out.count() == 150
    assert out.agg({"id": "max"}).first()[0] == 149
    # pre-delete version still sees everything (Lance time travel)
    assert ds2.read(spark, version=2).count() == 200
    # only fragment 2 held affected rows -> fragment 1 never superseded
    assert all(f.startswith("data/v0002") for f in _removed(ds2))


def test_delete_where_no_match_is_noop(spark, ds2):
    assert ds2.delete_where(spark, "id > 10000") is None
    assert ds2.versions() == [1, 2]


def test_delete_where_null_predicate_rows_survive(spark, tmp_path_str):
    ds = Dataset(tmp_path_str + "/ds")
    ds.write(
        spark.createDataFrame(
            [Row(id=0, val=None), Row(id=1, val=5.0), Row(id=2, val=50.0)],
            "id bigint, val double",
        )
    )
    ds.delete_where(spark, "val > 10")
    ids = sorted(r["id"] for r in ds.read(spark).select("id").collect())
    # NULL val: predicate is NULL -> not matched -> must survive
    assert ids == [0, 1]


def test_update_where(spark, ds2):
    v = ds2.update_where(spark, "id < 10", {"val": "val + 100", "name": "'touched'"})
    assert v == 3
    out = ds2.read(spark)
    assert out.count() == 200
    touched = out.filter("id < 10").collect()
    assert all(r["val"] == 101.0 and r["name"] == "touched" for r in touched)
    # rows in the rewritten file but not matched stay unchanged
    same_file = out.filter("id >= 10 AND id < 100").collect()
    assert all(r["name"] == f"row-{r['id']}" for r in same_file)
    # fragment 2 untouched
    assert all(f.startswith("data/v0001") for f in _removed(ds2))
    assert ds2.update_where(spark, "id < 0", {"val": "0"}) is None
    with pytest.raises(ValueError, match="unknown column"):
        ds2.update_where(spark, "id < 5", {"nope": "1"})


def test_merge_insert_upsert_and_pure_insert(spark, ds2):
    src = spark.createDataFrame(
        [Row(id=i, val=9.0, name=f"new-{i}") for i in (5, 150, 300, 301)]
    )
    v = ds2.merge_insert(spark, src, on="id")
    assert v == 3
    out = ds2.read(spark)
    assert out.count() == 202  # 200 - 2 replaced + 4 source
    got = {r["id"]: r["name"] for r in out.filter("id in (5,150,300,301)").collect()}
    assert got == {5: "new-5", 150: "new-150", 300: "new-300", 301: "new-301"}
    # both fragments held a matched key -> both may be superseded; the
    # untouched rows of each must survive the rewrite
    assert out.filter("id = 6").first()["name"] == "row-6"
    # pure insert: no key overlap -> plain append version, nothing removed
    before = _removed(ds2)
    src2 = spark.createDataFrame([Row(id=900, val=1.0, name="ins")])
    assert ds2.merge_insert(spark, src2, on="id") == 4
    assert _removed(ds2) == before
    assert ds2.read(spark).count() == 203
    with pytest.raises(ValueError, match="schema"):
        ds2.merge_insert(spark, src2.drop("name"), on="id")


def test_merge_insert_prunes_unmatched_fragment(spark, ds2):
    src = spark.createDataFrame([Row(id=5, val=9.0, name="new-5")])
    ds2.merge_insert(spark, src, on="id")
    assert all(f.startswith("data/v0001") for f in _removed(ds2))


def test_stream_refuses_mutated_state_until_compact(spark, ds2):
    ds2.delete_where(spark, "id >= 150")
    with pytest.raises(ValueError, match="compact"):
        ds2.read_stream(spark)
    ds2.compact(spark)
    assert ds2.read(spark).count() == 150
    sdf = ds2.read_stream(spark)
    assert sdf.isStreaming


def test_mutation_then_compact_resets_supersession(spark, ds2):
    ds2.delete_where(spark, "id % 2 = 0")
    assert ds2.read(spark).count() == 100
    ds2.compact(spark)
    frags, removed = ds2._live_state()
    assert removed == set()
    assert len(frags) == 1
    assert ds2.read(spark).count() == 100
    # time travel across the whole history still works
    assert ds2.read(spark, version=2).count() == 200


def test_vacuum_reclaims_overwritten_fragments(spark, tmp_path_str):
    ds = Dataset(tmp_path_str + "/ds")
    ds.write(_df(spark, 0, 50))
    ds.write(_df(spark, 0, 30), mode="overwrite")
    ds.write(_df(spark, 100, 120), mode="append")
    deleted = ds.vacuum(keep_versions=2)
    # v1's fragment is unreachable from v2/v3 (hidden by the overwrite)
    assert deleted and all(f.startswith("data/v0001") for f in deleted)
    assert ds.read(spark).count() == 50
    assert ds.read(spark, version=2).count() == 30
    with pytest.raises(ValueError, match="expired"):
        ds.read(spark, version=1)


def test_vacuum_keeps_append_chain(spark, ds2):
    # both fragments reachable from the latest version: nothing to delete
    assert ds2.vacuum(keep_versions=1) == []
    assert ds2.read(spark).count() == 200


def test_vacuum_reclaims_superseded_mutation_files(spark, ds2):
    ds2.delete_where(spark, "id >= 150")  # supersedes files of fragment 2
    deleted = ds2.vacuum(keep_versions=1)
    # the superseded originals are unreachable from the latest version
    assert deleted and all(f.startswith("data/v0002") for f in deleted)
    out = ds2.read(spark)
    assert out.count() == 150
    with pytest.raises(ValueError, match="expired"):
        ds2.read(spark, version=2)


def test_vacuum_noop_when_keeping_all(spark, ds2):
    assert ds2.vacuum(keep_versions=5) == []
    with pytest.raises(ValueError):
        ds2.vacuum(keep_versions=0)


def test_merge_insert_rejects_duplicate_source_keys(spark, ds2):
    src = spark.createDataFrame(
        [Row(id=5, val=1.0, name="x"), Row(id=5, val=2.0, name="y")]
    )
    with pytest.raises(ValueError, match="multiple rows"):
        ds2.merge_insert(spark, src, on="id")


def test_read_changes_across_mutation_history(spark, ds2):
    ds2.update_where(spark, "id = 5", {"val": "42.0"})        # v3: 1 update
    ds2.delete_where(spark, "id >= 190")                      # v4: 10 deletes
    src = spark.createDataFrame(
        [Row(id=7, val=9.0, name="up-7"), Row(id=500, val=1.0, name="new-500")]
    )
    ds2.merge_insert(spark, src, on="id")                     # v5: 1 update + 1 insert

    ch = ds2.read_changes(spark, key="id", since_version=2).collect()
    by = {}
    for r in ch:
        by.setdefault((r["_version"], r["_change_type"]), set()).add(r["id"])
    assert by[(3, "update")] == {5}
    assert (3, "delete") not in by and (3, "insert") not in by
    assert by[(4, "delete")] == set(range(190, 200))
    assert by[(5, "update")] == {7}
    assert by[(5, "insert")] == {500}
    # delete pre-image carries the old payload
    pre = [r for r in ch if r["_change_type"] == "delete" and r["id"] == 190][0]
    assert pre["name"] == "row-190"


def test_read_changes_appends_are_inserts(spark, ds2):
    ch = ds2.read_changes(spark, key="id", since_version=1)
    assert {r["_change_type"] for r in ch.collect()} == {"insert"}
    assert ch.count() == 100  # only v2's fragment


def test_read_changes_refuses_overwrite_range(spark, ds2):
    ds2.write(_df(spark, 0, 10), mode="overwrite")
    with pytest.raises(ValueError, match="overwrite"):
        ds2.read_changes(spark, key="id", since_version=1)


def test_drop_columns_metadata_only_with_time_travel(spark, ds2):
    pre = len(ds2.versions())
    v = ds2.drop_columns(spark, ["name"])
    assert v == pre + 1
    assert ds2.read(spark).columns == ["id", "val"]
    # earlier versions still see the column (metadata-only drop)
    assert "name" in ds2.read(spark, version=pre).columns
    # a later mutation rewrite physically writes the reduced schema
    ds2.update_where(spark, "id = 0", {"val": "9.0"})
    assert ds2.read(spark).columns == ["id", "val"]
    assert ds2.read(spark).filter("id = 0").first()["val"] == 9.0


def test_drop_columns_validates(spark, ds2):
    with pytest.raises(ValueError, match="unknown columns"):
        ds2.drop_columns(spark, ["nope"])
    with pytest.raises(ValueError, match="every column"):
        ds2.drop_columns(spark, ["id", "val", "name"])


def test_drop_columns_compact_resets(spark, ds2):
    ds2.drop_columns(spark, ["name"])
    ds2.compact(spark)
    # overwrite resets the dropped set; the rewritten data simply has
    # no such column anymore
    assert ds2._dropped_cols() == []
    assert ds2.read(spark).columns == ["id", "val"]


def test_commit_conflict_on_stale_overwrite(spark, ds2):
    from lance_flink_spark.sources.dataset import CommitConflict

    base = len(ds2.versions())
    ds2.write(_df(spark, 200, 210), mode="append")  # concurrent writer
    with pytest.raises(CommitConflict, match="advanced"):
        ds2.write(
            _df(spark, 0, 1), mode="overwrite", expected_version=base
        )
    # the failed commit left no torn state: the append is intact
    assert ds2.read(spark).count() == 210


def test_commit_conflict_mid_mutation(spark, ds2):
    """A writer that commits between a mutation's snapshot and its
    manifest swap must force the mutation to fail, not be clobbered."""
    from lance_flink_spark.sources.dataset import CommitConflict, Dataset

    other = Dataset(ds2.path)
    real = ds2._read_files

    def interleaved(spark_, files, **kw):
        # first call happens after the snapshot version was captured
        ds2._read_files = real
        other.write(_df(spark_, 500, 510), mode="append")
        return real(spark_, files, **kw)

    ds2._read_files = interleaved
    with pytest.raises(CommitConflict):
        ds2.delete_where(spark, "id < 10")
    # the concurrent append survived; nothing was deleted
    assert ds2.read(spark).count() == 210
    assert ds2.read(spark).filter("id < 10").count() == 10


def test_append_never_conflicts(spark, ds2):
    base = len(ds2.versions())
    other = Dataset(ds2.path)
    other.write(_df(spark, 300, 310), mode="append")
    # plain appends commute: no expected_version, commit re-reads the
    # manifest under the swap
    ds2.write(_df(spark, 400, 410), mode="append")
    assert len(ds2.versions()) == base + 2
    assert ds2.read(spark).count() == 220


def test_compact_small_rewrites_only_small_files(spark, tmp_path_str):
    """Bin-packing compaction: big files stay byte-identical, the small
    tail merges into one fragment, row set and time travel survive."""
    import os

    ds = Dataset(tmp_path_str + "/cs")
    ds.write(_df(spark, 0, 100))  # one "big" file
    for lo in range(100, 140, 10):  # 4 small single-file appends
        ds.write(_df(spark, lo, lo + 10), mode="append")
    import glob

    paths = [
        f for p in ds._live_paths() for f in glob.glob(p + "/*.parquet")
    ]
    sizes = {p: os.path.getsize(p) for p in paths}
    big = max(sizes, key=sizes.get)
    big_stat = (big, os.path.getsize(big), os.path.getmtime(big))

    v = ds.compact_small(spark, small_bytes=os.path.getsize(big))
    assert v == 6
    live = ds._live_paths()
    # the big file is still served, untouched on disk
    assert big in live
    assert (big, os.path.getsize(big), os.path.getmtime(big)) == big_stat
    # the four small files are superseded; survivors are big + packed
    assert all(p == big or "/m0006-" in p for p in live)
    assert ds.read(spark).count() == 140
    assert sorted(r["id"] for r in ds.read(spark).collect()) == list(range(140))
    # time travel to the pre-compact version still sees the small files
    assert ds.read(spark, version=5).count() == 140


def test_compact_small_noop_without_small_tail(spark, tmp_path_str):
    ds = Dataset(tmp_path_str + "/cs2")
    ds.write(_df(spark, 0, 100))
    assert ds.compact_small(spark, small_bytes=10) is None
    assert len(ds.versions()) == 1


def test_compact_small_emits_no_cdf_rows(spark, tmp_path_str):
    ds = Dataset(tmp_path_str + "/cs3")
    ds.write(_df(spark, 0, 20))
    ds.write(_df(spark, 20, 40), mode="append")
    v = ds.compact_small(spark, small_bytes=1 << 30)
    rows = ds.read_changes(spark, key="id", since_version=v - 1).collect()
    assert rows == []


def test_vacuum_sweeps_aged_orphans_only(spark, ds2):
    import os

    # simulate a crashed writer: a fragment on disk, never committed
    orphan = os.path.join(ds2.path, "data", "v9999-deadbeef")
    os.makedirs(orphan)
    _df(spark, 900, 910).write.mode("overwrite").parquet(orphan)
    committed_before = set(ds2._live_paths())
    # within the grace window: untouched (an in-flight writer looks
    # exactly like this)
    assert ds2.vacuum(keep_versions=10) == []
    assert os.path.exists(orphan)
    # past the grace window: swept; committed data intact
    deleted = ds2.vacuum(keep_versions=10, orphan_grace_seconds=0)
    assert deleted == ["data/v9999-deadbeef"]
    assert not os.path.exists(orphan)
    assert set(ds2._live_paths()) == committed_before
    assert ds2.read(spark).count() == 200


def test_restore_rolls_back_metadata_only(spark, ds2):
    import glob as g

    files_before = sorted(
        f for p in ds2._live_paths() for f in g.glob(p + "/*.parquet")
    )
    ds2.delete_where(spark, "id >= 100")
    assert ds2.read(spark).count() == 100
    v = ds2.restore(2)  # pre-delete state
    assert ds2.read(spark).count() == 200
    # metadata-only: no new data files exist anywhere
    all_files = sorted(g.glob(ds2.path + "/data/*/*.parquet"))
    rewrite = [f for f in all_files if "/m0003-" in f]
    assert sorted(set(all_files) - set(rewrite)) == files_before
    # the rolled-back history is still travelable, incl. the delete
    assert ds2.read(spark, version=3).count() == 100
    assert ds2.read(spark, version=v).count() == 200
    # a restore can itself be restored away
    ds2.restore(3)
    assert ds2.read(spark).count() == 100


def test_restore_guards(spark, ds2):
    with pytest.raises(ValueError, match="no such version"):
        ds2.restore(99)
    ds2.write(_df(spark, 200, 210), mode="overwrite")
    ds2.vacuum(keep_versions=1)
    with pytest.raises(ValueError, match="expired"):
        ds2.restore(1)


def test_restore_then_stream_requires_compact(spark, ds2):
    ds2.restore(1)
    with pytest.raises(ValueError, match="compact"):
        ds2.read_stream(spark)
    ds2.compact(spark)
    assert ds2.read_stream(spark).isStreaming
    assert ds2.read(spark).count() == 100


def test_restore_resets_dropped_columns(spark, ds2):
    ds2.drop_columns(spark, ["name"])
    assert ds2.read(spark).columns == ["id", "val"]
    ds2.restore(2)
    assert ds2.read(spark).columns == ["id", "val", "name"]
