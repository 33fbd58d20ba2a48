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


# ---------- round 13: CDC-as-stream bridge (ChangeFeedStream) ----------


def test_stream_bridge_spools_ops_and_versions(spark, src, tmp_path_str):
    """pump() stages every committed version with the changelog
    columns the upsert sink consumes: _op D/U, _seq = commit version,
    _seq2 ranking upserts over same-version delete pre-images."""
    from lance_flink_spark.sources.cdc import ChangeFeedStream

    feed = ChangeFeedStream(src, tmp_path_str + "/spool", key="id")
    assert feed.pump(spark) == 1  # 4 versions ≤ one 16-version range
    rows = spark.read.parquet(tmp_path_str + "/spool/data/*").collect()
    by = {(r["id"], r["_seq"]): r for r in rows}
    assert by[(0, 1)]["_op"] == "U" and by[(0, 3)]["_op"] == "U"
    assert by[(0, 3)]["v"] == 999  # update post-image
    assert by[(7, 2)]["_op"] == "U" and by[(7, 4)]["_op"] == "D"
    assert by[(7, 4)]["v"] == 70  # delete carries the pre-image
    assert all(r["_seq2"] == (0 if r["_op"] == "D" else 1) for r in rows)


def test_stream_bridge_pump_is_idempotent_and_incremental(
    spark, src, tmp_path_str
):
    """A second pump with no new commits writes nothing; a new commit
    pumps exactly one more range; a replayed range (cursor rolled
    back, the crash shape) overwrites its directory instead of
    duplicating rows."""
    import os

    from lance_flink_spark.sources.cdc import ChangeFeedStream

    feed = ChangeFeedStream(src, tmp_path_str + "/spool", key="id")
    assert feed.pump(spark) == 1
    assert feed.pump(spark) == 0  # cursor at head: no-op
    src.write(_df(spark, 100, 102), mode="append")  # v5
    assert feed.pump(spark) == 1
    data = tmp_path_str + "/spool/data"
    n_dirs = len([d for d in os.listdir(data) if d.startswith("v")])
    assert n_dirs == 2
    total = spark.read.parquet(data + "/*").count()
    # crash shape: roll the cursor back and re-pump the last range
    feed.consumer.reset_to(4)
    assert feed.pump(spark) == 1
    assert spark.read.parquet(data + "/*").count() == total  # no dupes


def test_stream_bridge_feeds_upsert_sink_end_to_end(
    spark, src, tmp_path_str
):
    """The full loop: source history → spooled changelog → streaming
    upsert sink → replica == source's current state (keyed)."""
    from lance_flink_spark.sources.cdc import ChangeFeedStream
    from lance_flink_spark.streaming.upsert import UpsertDatasetSink

    feed = ChangeFeedStream(src, tmp_path_str + "/spool", key="id")
    feed.pump(spark)
    sink = UpsertDatasetSink(
        tmp_path_str + "/replica", key="id", seq_cols=["_seq", "_seq2"]
    )
    sink.run_available(feed.read_stream(spark), tmp_path_str + "/ckpt")
    got = {
        r["id"]: r["v"]
        for r in Dataset(tmp_path_str + "/replica").read(spark).collect()
    }
    want = {r["id"]: r["v"] for r in src.read(spark).collect()}
    assert got == want  # incl. id 0 updated to 999, id 7 absent
