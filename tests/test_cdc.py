"""Checkpointed change-feed consumption (sources/cdc.py): bounded
batches, durable cursor, crash replay of at most the in-flight batch,
overwrite restart contract."""

import pytest
from pyspark.sql import Row

from lance_flink_spark.sources.cdc import ChangeFeedConsumer
from lance_flink_spark.sources.dataset import Dataset


def _df(spark, lo, hi):
    return spark.createDataFrame([Row(id=i, v=i * 10) for i in range(lo, hi)])


@pytest.fixture()
def src(spark, tmp_path_str):
    ds = Dataset(tmp_path_str + "/src")
    ds.write(_df(spark, 0, 5))              # v1
    ds.write(_df(spark, 5, 8), mode="append")   # v2
    ds.update_where(spark, "id = 0", {"v": "999"})  # v3
    ds.delete_where(spark, "id = 7")        # v4
    return ds


def test_drain_in_bounded_batches_then_noop(spark, src, tmp_path_str):
    seen = []
    c = ChangeFeedConsumer(src, tmp_path_str + "/ckpt", key="id")
    n = c.process_available(
        spark,
        lambda df, lo, hi: seen.append((lo, hi, sorted(
            (r["_version"], r["_change_type"], r["id"]) for r in df.collect()
        ))),
        max_versions_per_batch=2,
    )
    assert n == 2
    assert [(lo, hi) for lo, hi, _ in seen] == [(0, 2), (2, 4)]
    flat = [x for _, _, rows in seen for x in rows]
    assert (1, "insert", 0) in flat and (2, "insert", 7) in flat
    assert (3, "update", 0) in flat
    assert (4, "delete", 7) in flat
    assert c.position() == 4
    # nothing new: zero batches, cursor untouched
    assert c.process_available(spark, lambda *a: None) == 0
    # new commit: exactly the delta arrives
    src.write(_df(spark, 100, 102), mode="append")  # v5
    more = []
    assert c.process_available(
        spark, lambda df, lo, hi: more.append((lo, hi, df.count()))
    ) == 1
    assert more == [(4, 5, 2)]


def test_crash_replays_only_inflight_batch(spark, src, tmp_path_str):
    calls = []

    def boom(df, lo, hi):
        calls.append((lo, hi))
        if hi == 4:
            raise RuntimeError("crash mid-feed")

    c = ChangeFeedConsumer(src, tmp_path_str + "/ckpt2", key="id")
    with pytest.raises(RuntimeError):
        c.process_available(spark, boom, max_versions_per_batch=2)
    # batch (0,2] committed; (2,4] did not
    assert c.position() == 2
    ok = []
    c.process_available(
        spark, lambda df, lo, hi: ok.append((lo, hi)), max_versions_per_batch=2
    )
    assert ok == [(2, 4)]  # only the failed batch replays


def test_overwrite_requires_reset(spark, src, tmp_path_str):
    c = ChangeFeedConsumer(src, tmp_path_str + "/ckpt3", key="id")
    c.process_available(spark, lambda *a: None)
    src.write(_df(spark, 0, 3), mode="overwrite")  # lineage break
    with pytest.raises(ValueError, match="overwrite"):
        c.process_available(spark, lambda *a: None)
    head = c.reset_to_latest()
    assert c.position() == head
    assert c.process_available(spark, lambda *a: None) == 0


def test_cdc_loop_maintains_scalar_index(spark, src, tmp_path_str):
    """Composition: the CDC subscription drives incremental index
    maintenance — each drained batch triggers a delta index update, so
    routed lookups stay fresh without any full rebuild on appends."""
    src.build_scalar_index(spark, "id")
    c = ChangeFeedConsumer(src, tmp_path_str + "/ckpt_idx", key="id")
    c.reset_to_latest()  # subscribe from the current head

    def refresh_index(df, lo, hi):
        src.update_scalar_index(spark, "id")

    src.write(_df(spark, 50, 55), mode="append")
    assert c.process_available(spark, refresh_index) == 1
    out = src.read_eq(spark, "id", 52)
    assert out.count() == 1
    # the routed scan touched only the new fragment
    assert all("/v0005-" in f for f in out.inputFiles())
