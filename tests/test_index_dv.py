"""Delete/DV-aware vector search: indexes bound to a Dataset mask
rows deleted AFTER the index was built — Lance parity (indexes store
row addresses; deletion files mask them at query time; LanceDB's
mutate-then-search flow never surfaces tombstoned rows), without any
index rewrite on delete.

Covers all four search paths (IVF flat/PQ/SQ, knn_join, HNSW search +
knn_join), both delete modes (DV tombstones and predicate-delete file
rewrites), the update-then-add lifecycle, and the unbound-index
no-behavior-change guarantee.
"""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from lance_flink_spark.index.hnsw import HNSWIndex
from lance_flink_spark.index.ivf import IVFIndex
from lance_flink_spark.sources.dataset import Dataset


def _vecs(spark, ids, center, dim=4, sigma=0.05, seed=7):
    rng = np.random.default_rng(seed)
    rows = [
        Row(
            vec_id=int(i),
            embedding=[
                float(x) for x in (np.array(center, dtype=float) + rng.normal(0, sigma, dim))
            ],
        )
        for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture()
def bound(spark, tmp_path_str):
    """A 2-cluster dataset with a dataset-bound IVF_FLAT index."""
    ds = Dataset(tmp_path_str + "/ds")
    ds.write(_vecs(spark, range(60), [0.0, 0.0, 0.0, 0.0]))
    ds.write(_vecs(spark, range(60, 120), [5.0, 5.0, 5.0, 5.0]), mode="append")
    idx = IVFIndex.build(
        spark, None, tmp_path_str + "/idx", nlist=4, sample_size=512, dataset=ds
    )
    return ds, idx


def test_lists_carry_row_addresses(spark, bound):
    ds, idx = bound
    lists = spark.read.parquet(idx.path + "/lists")
    assert {"_row_file", "_row_pos"} <= set(lists.columns)
    # every address points at a live data file of the dataset
    files = {r[0] for r in lists.select("_row_file").distinct().collect()}
    assert files <= set(ds.live_file_relpaths())
    meta = idx._meta()
    assert meta["dataset_path"] == ds.path
    assert sorted(meta["dataset_files"]) == ds.live_file_relpaths()


def test_dv_delete_masks_search_and_k_survives(spark, bound):
    ds, idx = bound
    before = {r["vec_id"] for r in idx.search(spark, [0.0] * 4, k=5, nprobes=4).collect()}
    assert ds.delete_where(spark, "vec_id IN (%s)" % ",".join(map(str, before)), dv=True)
    hits = idx.search(spark, [0.0] * 4, k=5, nprobes=4).collect()
    assert len(hits) == 5  # k survivors still return
    got = {r["vec_id"] for r in hits}
    assert not (got & before)  # no tombstoned id ever comes back
    assert all(i < 60 for i in got)  # still the right cluster


def test_dv_delete_equals_brute_over_live_scan(spark, bound):
    """Full-probe masked search == brute force over the live read —
    the exactness contract the ivf_deleted_exactness extra hash-gates
    at the driver."""
    from lance_flink_spark.operators.similarity import knn

    ds, idx = bound
    ds.delete_where(spark, "vec_id % 7 = 3", dv=True)
    q = [0.1, 0.0, 0.1, 0.0]
    masked = idx.search(spark, q, k=10, nprobes=4).select("vec_id", "distance")
    brute = knn(ds.read(spark), q, 10, metric="l2").select("vec_id", "distance")
    assert [tuple(r) for r in masked.collect()] == [tuple(r) for r in brute.collect()]


def test_predicate_delete_rewrite_masks_via_removed_files(spark, bound):
    ds, idx = bound
    # non-DV delete rewrites the affected files: the old files leave
    # the live set, so masking must drop EVERY index entry addressed
    # into them (rewritten survivors need a re-add / rebuild — the
    # documented Lance compaction/remap contract)
    assert ds.delete_where(spark, "vec_id >= 110", dv=False)
    got = {r["vec_id"] for r in idx.search(spark, [5.0] * 4, k=50, nprobes=4).collect()}
    assert not any(i >= 110 for i in got)


def test_update_dv_masks_stale_entry_and_add_reindexes(spark, bound):
    ds, idx = bound
    v_before = len(ds.versions())
    # move vec 0 to a far-away point via the DV update path
    assert ds.update_where(
        spark,
        "vec_id = 0",
        {"embedding": "array(9.0f, 9.0f, 9.0f, 9.0f)"},
        dv=True,
    )
    # stale entry masked: the old-location search no longer returns 0
    old = {r["vec_id"] for r in idx.search(spark, [0.0] * 4, k=60, nprobes=4).collect()}
    assert 0 not in old
    # fold ONLY the new fragment into the index (incremental re-index)
    new_rows = ds.keyed_read(spark, since_version=v_before)
    assert new_rows.count() == 1
    idx.add(spark, new_rows)
    hits = idx.search(spark, [9.0] * 4, k=1, nprobes=4).collect()
    assert hits[0]["vec_id"] == 0
    # and the re-added row is itself maskable: delete it again
    ds.delete_where(spark, "vec_id = 0", dv=True)
    hits2 = idx.search(spark, [9.0] * 4, k=1, nprobes=4).collect()
    assert hits2 and hits2[0]["vec_id"] != 0


def test_masking_applies_to_pq_sq_and_knn_join(spark, tmp_path_str):
    ds = Dataset(tmp_path_str + "/ds")
    ds.write(_vecs(spark, range(80), [0.0, 0.0, 0.0, 0.0], sigma=1.0))
    pq = IVFIndex.build(
        spark, None, tmp_path_str + "/pq", nlist=4, pq_sub_vectors=2,
        pq_bits=4, sample_size=512, dataset=ds,
    )
    sq = IVFIndex.build(
        spark, None, tmp_path_str + "/sq", nlist=4, sq_bits=8,
        sample_size=512, dataset=ds,
    )
    dead = {r["vec_id"] for r in pq.search_pq(spark, [0.0] * 4, k=5, nprobes=4).collect()}
    assert ds.delete_where(spark, "vec_id IN (%s)" % ",".join(map(str, dead)), dv=True)
    for got in (
        {r["vec_id"] for r in pq.search_pq(spark, [0.0] * 4, k=5, nprobes=4).collect()},
        {r["vec_id"] for r in sq.search_sq(spark, [0.0] * 4, k=5, nprobes=4).collect()},
    ):
        assert len(got) == 5 and not (got & dead)
    queries = spark.createDataFrame(
        [Row(query_id=0, embedding=[0.0, 0.0, 0.0, 0.0])],
        "query_id long, embedding array<float>",
    )
    jn = pq.knn_join(spark, queries, k=5, nprobes=4).collect()
    assert len(jn) == 5 and not ({r["neighbor_id"] for r in jn} & dead)


def test_masking_applies_to_hnsw(spark, tmp_path_str):
    ds = Dataset(tmp_path_str + "/ds")
    ds.write(_vecs(spark, range(80), [0.0, 0.0, 0.0, 0.0], sigma=1.0))
    idx = HNSWIndex.build(
        spark, None, tmp_path_str + "/h", nlist=2, m=8, ef_construction=32,
        sample_size=512, dataset=ds,
    )
    dead = {r["vec_id"] for r in idx.search(spark, [0.0] * 4, k=5, nprobes=2, ef=80).collect()}
    assert ds.delete_where(spark, "vec_id IN (%s)" % ",".join(map(str, dead)), dv=True)
    got = {r["vec_id"] for r in idx.search(spark, [0.0] * 4, k=5, nprobes=2, ef=80).collect()}
    assert len(got) == 5 and not (got & dead)
    queries = spark.createDataFrame(
        [Row(query_id=0, embedding=[0.0, 0.0, 0.0, 0.0])],
        "query_id long, embedding array<float>",
    )
    jn = idx.knn_join(spark, queries, k=5, nprobes=2, ef=80).collect()
    assert len(jn) == 5 and not ({r["neighbor_id"] for r in jn} & dead)


def test_unbound_index_unchanged(spark, tmp_path_str):
    """No dataset binding → no address columns, no mask joins: the
    pre-DV plan shape is preserved byte-for-byte."""
    df = _vecs(spark, range(40), [0.0, 0.0, 0.0, 0.0], sigma=1.0)
    idx = IVFIndex.build(spark, df, tmp_path_str + "/plain", nlist=2, sample_size=512)
    lists = spark.read.parquet(idx.path + "/lists")
    assert "_row_file" not in lists.columns
    plan = idx.search(spark, [0.0] * 4, k=3, nprobes=2)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # no mask anti-join slipped in
    assert idx.search(spark, [0.0] * 4, k=3, nprobes=2).count() == 3


def test_add_raw_rows_to_bound_index_refused_ingest_routes(spark, bound):
    """Raw add() on a bound index is REFUSED (a null-address entry
    could never be masked, so delete-after-add would resurface rows
    forever); ingest() is the auto-route — append to the dataset +
    resync — and its rows carry real addresses, so a later delete
    masks them like any other row."""
    ds, idx = bound
    newbies = _vecs(spark, range(500, 510), [20.0] * 4)
    with pytest.raises(ValueError, match="ingest"):
        idx.add(spark, newbies)
    assert idx.ingest(spark, newbies)
    # every entry of the bound index carries a real address
    lists = spark.read.parquet(idx.path + "/lists")
    assert lists.filter(F.col("_row_file").isNull()).count() == 0
    hits = idx.search(spark, [20.0] * 4, k=5, nprobes=4).collect()
    assert all(500 <= r["vec_id"] < 510 for r in hits)
    # delete-after-ingest never resurfaces: the ingested rows mask
    ds.delete_where(spark, "vec_id >= 500", dv=True)
    got = {r["vec_id"] for r in idx.search(spark, [20.0] * 4, k=5, nprobes=4).collect()}
    assert not any(i >= 500 for i in got)


def test_search_outputs_hide_address_columns(spark, bound):
    ds, idx = bound
    cols = set(idx.search(spark, [0.0] * 4, k=3, nprobes=4).columns)
    assert not cols & {"_row_file", "_row_pos"}


def test_hnsw_readd_after_delete_survives_mask(spark, tmp_path_str):
    """The id-space mask must not kill an id that was deleted and then
    RE-ADDED (live copy exists): update-dv + resync, then search finds
    the moved vector under its new address."""
    ds = Dataset(tmp_path_str + "/ds")
    ds.write(_vecs(spark, range(60), [0.0, 0.0, 0.0, 0.0], sigma=1.0))
    idx = HNSWIndex.build(
        spark, None, tmp_path_str + "/h", nlist=2, m=8, ef_construction=32,
        sample_size=512, dataset=ds,
    )
    assert ds.update_where(
        spark, "vec_id = 7", {"embedding": "array(9.0f, 9.0f, 9.0f, 9.0f)"}, dv=True
    )
    assert idx.resync(spark) >= 1  # fold the update's new fragment
    hits = idx.search(spark, [9.0] * 4, k=1, nprobes=2, ef=80).collect()
    assert hits and hits[0]["vec_id"] == 7
    # the STALE node is gone (resync purged + rebuilt its list's
    # graph): id 7 now scores from its NEW vector only — an
    # old-location search sees it at the far distance, never the
    # stale near one
    old = {
        r["vec_id"]: r["distance"]
        for r in idx.search(spark, [0.0] * 4, k=60, nprobes=2, ef=200).collect()
    }
    assert old[7] > 10.0  # ||(9,9,9,9)|| ≈ 18; the stale node was ~1
    # exactly one graph node per id remains after the purge
    lists = spark.read.parquet(idx.path + "/lists")
    assert lists.filter("vec_id = 7").count() == 1
    # purge is idempotent: nothing dead remains
    assert idx.ivf.purge_dead(spark) == []


def test_resync_after_compaction_restores_results(spark, tmp_path_str):
    """Compaction rewrites live rows into new files; the mask
    conservatively drops the old addresses — resync() folds the
    rewrite fragments back in under their new addresses (Lance's
    index-remap story) and full-probe search equals brute again."""
    from lance_flink_spark.operators.similarity import knn

    ds = Dataset(tmp_path_str + "/ds")
    ds.write(_vecs(spark, range(80), [0.0, 0.0, 0.0, 0.0], sigma=1.0))
    idx = IVFIndex.build(
        spark, None, tmp_path_str + "/idx", nlist=4, sample_size=512, dataset=ds
    )
    ds.delete_where(spark, "vec_id % 3 = 0", dv=True)
    ds.compact(spark)  # materializes the DVs, rewrites every live row
    # post-compaction the mask hides the rewritten LIVE rows — silent
    # thinning is wrong answers, so the default search path refuses
    from lance_flink_spark.index.ivf import IndexStale

    with pytest.raises(IndexStale, match="resync"):
        idx.search(spark, [0.0] * 4, k=10, nprobes=4).count()
    # on_stale='ignore' keeps the documented conservative-mask behavior
    assert (
        IVFIndex(idx.path, on_stale="ignore")
        .search(spark, [0.0] * 4, k=10, nprobes=4)
        .count()
        < 10
    )
    assert idx.resync(spark)
    q = [0.2, 0.1, 0.0, 0.3]
    masked = idx.search(spark, q, k=10, nprobes=4).select("vec_id", "distance")
    brute = knn(ds.read(spark), q, 10, metric="l2").select("vec_id", "distance")
    assert [tuple(r) for r in masked.collect()] == [tuple(r) for r in brute.collect()]
    # idempotent: nothing new → no-op
    assert idx.resync(spark) == []


def test_resync_metadata_only_commits_noop(spark, bound):
    ds, idx = bound
    ds.delete_where(spark, "vec_id = 1", dv=True)  # metadata-only commit
    assert idx.resync(spark) == []
    assert idx._meta()["dataset_version"] == len(ds.versions())


def test_stale_guard_auto_resync_knob(spark, tmp_path_str):
    """on_stale='resync' self-heals at search entry: compact-then-search
    returns the COMPLETE live top-k with no manual resync call."""
    from lance_flink_spark.operators.similarity import knn

    ds = Dataset(tmp_path_str + "/ds")
    ds.write(_vecs(spark, range(80), [0.0, 0.0, 0.0, 0.0], sigma=1.0))
    IVFIndex.build(
        spark, None, tmp_path_str + "/idx", nlist=4, sample_size=512, dataset=ds
    )
    ds.delete_where(spark, "vec_id % 4 = 1", dv=True)
    ds.compact(spark)
    idx = IVFIndex(tmp_path_str + "/idx", on_stale="resync")
    q = [0.3, 0.1, 0.2, 0.0]
    got = idx.search(spark, q, k=10, nprobes=4).select("vec_id", "distance")
    brute = knn(ds.read(spark), q, 10, metric="l2").select("vec_id", "distance")
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in brute.collect()]
    # healed: the default-strict handle is clean again
    assert IVFIndex(idx.path).search(spark, q, k=10, nprobes=4).count() == 10


def test_stale_guard_not_triggered_by_dv_deletes(spark, bound):
    """Pure DV deletes relocate nothing: the strict default must keep
    serving (masked) results, not refuse."""
    ds, idx = bound
    ds.delete_where(spark, "vec_id < 10", dv=True)
    got = {r["vec_id"] for r in idx.search(spark, [0.0] * 4, k=10, nprobes=4).collect()}
    assert got and not any(i < 10 for i in got)


def test_stale_guard_restore_and_hnsw(spark, tmp_path_str):
    """RESTORE flips the live set without touching data files — same
    staleness window; the HNSW entries guard it too, and the resync
    knob routes through HNSW's graph-rebuilding resync."""
    from lance_flink_spark.index.ivf import IndexStale

    ds = Dataset(tmp_path_str + "/ds")
    ds.write(_vecs(spark, range(40), [0.0, 0.0, 0.0, 0.0], sigma=1.0))
    ds.write(_vecs(spark, range(40, 80), [0.0, 0.0, 0.0, 0.0], sigma=1.0), mode="append")
    ds.compact(spark)  # v3: all rows under new addresses
    idx = HNSWIndex.build(
        spark, None, tmp_path_str + "/h", nlist=2, m=8, ef_construction=32,
        sample_size=512, dataset=ds,
    )
    ds.restore(1)  # back to the first 40 rows — indexed files left the live set
    with pytest.raises(IndexStale, match="resync"):
        idx.search(spark, [0.0] * 4, k=5, nprobes=2, ef=80).count()
    healed = HNSWIndex(idx.path, on_stale="resync")
    got = {r["vec_id"] for r in healed.search(spark, [0.0] * 4, k=50, nprobes=2, ef=200).collect()}
    assert got <= set(range(40)) and len(got) > 0


def test_property_random_index_lifecycles(spark, tmp_path_str):
    """Seeded random lifecycles over a bound index — DV deletes, DV
    updates, ingest of new rows, compact+auto-resync — with the
    invariant checked after EVERY step: full-probe masked search ==
    brute KNN over the live scan (the ivf_deleted_exactness contract),
    under mutation orders the targeted tests don't enumerate."""
    import random

    from lance_flink_spark.operators.similarity import knn

    for seed in (13, 29):
        rng = random.Random(seed)
        root = tmp_path_str + f"/prop{seed}"
        ds = Dataset(root + "/ds")
        ds.write(_vecs(spark, range(60), [0.0] * 4, sigma=1.0, seed=seed))
        idx = IVFIndex.build(
            spark, None, root + "/idx", nlist=4, sample_size=512, dataset=ds
        )
        healing = IVFIndex(idx.path, on_stale="resync")
        next_id = [1000]
        for step in range(5):
            op = rng.choice(["delete", "update", "ingest", "compact"])
            if op == "delete":
                m = rng.randint(3, 9)
                ds.delete_where(spark, f"vec_id % {m} = 1", dv=True)
            elif op == "update":
                m = rng.randint(4, 11)
                ds.update_where(
                    spark,
                    f"vec_id % {m} = 2",
                    {"embedding": f"array({rng.uniform(-2,2)}f, 0.0f, 0.0f, 0.0f)"},
                    dv=True,
                )
                healing.resync(spark)  # fold the update copies back in
            elif op == "ingest":
                ids = range(next_id[0], next_id[0] + rng.randint(3, 8))
                next_id[0] += 10
                healing.ingest(
                    spark, _vecs(spark, ids, [rng.uniform(-1, 1)] * 4, sigma=0.5, seed=seed + step)
                )
            else:
                ds.compact(spark)  # healing handle auto-resyncs at search
            q = [rng.uniform(-1, 1) for _ in range(4)]
            got = healing.search(spark, q, k=8, nprobes=4).select("vec_id", "distance")
            brute = knn(ds.read(spark), q, 8, metric="l2").select("vec_id", "distance")
            assert [tuple(r) for r in got.collect()] == [
                tuple(r) for r in brute.collect()
            ], f"seed {seed} step {step} op {op}"
