"""Streaming: windows = batch parity, exactly-once sink replay,
stateful operator vs batch aggregate."""

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from lance_flink_spark.registry import table
from lance_flink_spark.sources.dataset import Dataset
from lance_flink_spark.streaming.pipeline import run_to_memory, stream_events
from lance_flink_spark.streaming.sink import ExactlyOnceDatasetSink
from lance_flink_spark.streaming.stateful import running_user_counters
from lance_flink_spark.streaming.windows import sessionize, tumbling_agg

from conftest import SF_DIR


def test_streaming_tumbling_equals_batch(spark):
    batch = tumbling_agg(table(spark, SF_DIR, "events"))
    t = run_to_memory(tumbling_agg(stream_events(spark, SF_DIR)))
    stream = spark.table(t)
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in stream.collect()}
    assert b == s and len(b) > 0


def test_sessionize_gap_semantics(spark):
    rows = [
        Row(user_id=1, event_id=i, ts=f"2024-01-01 00:{m:02d}:00")
        for i, m in enumerate([0, 5, 10, 50, 55])  # 30min gap after :10
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sessionize(df, gap_seconds=1800).first()
    assert out["n_sessions"] == 2
    assert out["n_events"] == 5
    assert out["max_session_events"] == 3


def test_exactly_once_sink_replay(spark, tmp_path_str):
    sink = ExactlyOnceDatasetSink(tmp_path_str + "/sink")
    df = spark.createDataFrame([Row(id=i) for i in range(10)])
    sink.write_batch(df, 0)
    sink.write_batch(df, 0)  # replayed micro-batch must be a no-op
    sink.write_batch(df, 1)
    assert Dataset(sink.dataset.path).read(spark).count() == 20


def test_stateful_counters_match_batch(spark):
    events = stream_events(spark, SF_DIR)
    t = run_to_memory(running_user_counters(events), mode="update")
    got = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 2))
        for r in spark.table(t).collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["s"], 2))
        for r in table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want


def test_multimodal_stub_pipeline(spark):
    from lance_flink_spark.functions.multimodal import extract_metadata, to_binary_docs

    docs = table(spark, SF_DIR, "documents").limit(20)
    out = extract_metadata(to_binary_docs(docs))
    rows = out.collect()
    assert len(rows) == 20
    r = rows[0]
    assert r["n_bytes"] > 0
    assert len(r["feature"]) == 3 and r["feature"][0] == float(r["n_bytes"])


def test_multimodal_resize_and_frames(spark):
    from lance_flink_spark.functions.multimodal import (
        resize_images,
        sample_frames,
        to_binary_docs,
    )

    blobs = to_binary_docs(table(spark, SF_DIR, "documents").limit(10))
    thumbs = resize_images(blobs, 64, 64).collect()
    assert len(thumbs) == 10
    assert all(len(t["thumb"]) == 64 * 64 // 64 for t in thumbs)  # bounded output
    frames = sample_frames(blobs, every_n_bytes=100, max_frames=3)
    per_doc = frames.groupBy("doc_id").count().collect()
    assert len(per_doc) == 10
    assert all(1 <= r["count"] <= 3 for r in per_doc)
    f = frames.filter("frame_idx = 1").first()
    assert f["frame_offset"] == 100 and len(f["frame"]) <= 32


def test_state_partitions_pins_shard_count_and_restores_conf(spark, tmp_path_str):
    """run_to_memory(state_partitions=N) must (a) create exactly N
    state-store shards in the checkpoint and (b) restore the session's
    shuffle partitions afterwards."""
    import glob
    import os
    import shutil

    from lance_flink_spark.registry import scratch_dir
    from lance_flink_spark.streaming.pipeline import run_to_memory, stream_events
    from lance_flink_spark.streaming.windows import tumbling_agg

    # fixed checkpoint name: clear any previous pytest session's state
    # or the resumed (fully-consumed) stream would emit no batch
    shutil.rmtree(scratch_dir("ckpt", "state_parts_probe"), ignore_errors=True)
    before = spark.conf.get("spark.sql.shuffle.partitions")
    t = run_to_memory(
        tumbling_agg(stream_events(spark, SF_DIR)),
        name="state_parts_probe",
        state_partitions=4,
    )
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    assert spark.table(t).count() > 0
    shard_dirs = glob.glob(
        os.path.join(scratch_dir("ckpt", "state_parts_probe"), "state", "0", "*")
    )
    shards = [d for d in shard_dirs if os.path.basename(d).isdigit()]
    assert len(shards) == 4


def test_rocksdb_state_store_matches_default_provider(spark):
    """run_to_memory(state_store='rocksdb') runs the stateful pipeline
    on the RocksDB provider (Flink's large-state backend analogue),
    produces the same final table as the default in-memory provider,
    leaves RocksDB sst/log artifacts in the checkpoint, and restores
    the session provider conf afterwards."""
    import glob
    import os
    import shutil

    from lance_flink_spark.registry import scratch_dir
    from lance_flink_spark.streaming.pipeline import run_to_memory, stream_events
    from lance_flink_spark.streaming.windows import tumbling_agg

    prov_key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(prov_key, None)
    shutil.rmtree(scratch_dir("ckpt", "rocks_probe"), ignore_errors=True)
    t = run_to_memory(
        tumbling_agg(stream_events(spark, SF_DIR)),
        name="rocks_probe",
        state_partitions=4,
        state_store="rocksdb",
    )
    assert spark.conf.get(prov_key, None) == before
    got = {tuple(r) for r in spark.table(t).collect()}
    want = {
        tuple(r)
        for r in spark.table(
            run_to_memory(
                tumbling_agg(stream_events(spark, SF_DIR)), state_partitions=4
            )
        ).collect()
    }
    assert got == want and got
    # RocksDB actually backed the state: changelog/zip artifacts exist
    ck = scratch_dir("ckpt", "rocks_probe")
    assert glob.glob(os.path.join(ck, "state", "0", "*", "*.zip")) or glob.glob(
        os.path.join(ck, "state", "0", "*", "*.changelog")
    )


def test_state_store_unknown_backend_rejected(spark):
    import pytest

    events = stream_events(spark, SF_DIR, watermark="1 hour")
    with pytest.raises(ValueError, match="rocksdb"):
        run_to_memory(tumbling_agg(events), state_store="rocks")


def test_stream_dedup_drops_in_window_duplicates(spark, tmp_path_str):
    """Flink-SQL-dedup parity: duplicates of a key arriving within the
    watermark window collapse to the first row, including across
    micro-batches under one checkpoint."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lance_flink_spark.streaming.dedup import stream_dedup

    src = tmp_path_str + "/src"
    os.makedirs(src)
    base = 1_700_000_000

    def write_batch(name, rows):
        tbl = pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [base + r[1] for r in rows], pa.timestamp("us", tz="UTC")
                ),
                "v": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
        pq.write_table(tbl, f"{src}/{name}.parquet")

    write_batch("b0", [(1, 0, 10), (1, 5, 11), (2, 0, 20)])  # dup k=1 in-batch
    sink = tmp_path_str + "/sink"

    def drain():
        s2 = spark.readStream.schema(
            "k long, ts timestamp, v long"
        ).option("maxFilesPerTrigger", 1).parquet(src)
        q = (
            stream_dedup(s2, ["k"], watermark="10 minutes")
            .writeStream.format("parquet").option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", tmp_path_str + "/ckpt")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    drain()
    # cross-micro-batch duplicate (same checkpoint, second drain)
    write_batch("b1", [(1, 60, 12), (3, 60, 30)])
    drain()
    rows = {r["k"]: r["v"] for r in spark.read.parquet(sink).collect()}
    assert rows == {1: 10, 2: 20, 3: 30}  # k=1 kept its FIRST value only


def test_streaming_topn_multibatch_and_replay(spark, tmp_path_str):
    """Top-N state folds across MANY micro-batches (maxFilesPerTrigger=1)
    and a re-run against the same checkpoint replays nothing."""
    import os

    from pyspark.sql import Row

    from lance_flink_spark.streaming.topn import StreamingTopN

    src = tmp_path_str + "/src"
    os.makedirs(src)
    rows = [
        ("a", 1, 10), ("a", 2, 5), ("b", 1, 7),
        ("a", 1, 1), ("a", 3, 20), ("b", 2, 2),
        ("a", 2, 30), ("b", 1, 1), ("b", 3, 4),
    ]
    for i in range(3):  # 3 files → 3 micro-batches
        spark.createDataFrame(
            [Row(cat=c, uid=u, v=v) for c, u, v in rows[i * 3 : i * 3 + 3]]
        ).coalesce(1).write.parquet(f"{src}/f{i}")
    schema = spark.read.parquet(src + "/f0").schema

    def run():
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        topn = StreamingTopN(
            tmp_path_str + "/state", ["cat"], ["uid"], "v", n=2
        )
        q = (
            topn.attach(sdf, checkpoint=tmp_path_str + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return topn

    topn = run()
    got = {
        (r["cat"], r["rn"]): (r["uid"], r["v"], r["c"])
        for r in topn.results(spark).collect()
    }
    # a: uid2=35, uid3=20 (uid1=11 out); b: uid1=8, uid3=4 (uid2=2 out)
    assert got == {
        ("a", 1): (2, 35, 2),
        ("a", 2): (3, 20, 1),
        ("b", 1): (1, 8, 2),
        ("b", 2): (3, 4, 1),
    }
    n_versions = len(topn.state.versions())
    assert n_versions >= 3  # one fold per micro-batch
    # re-run on the same checkpoint: no batches replay, state unchanged
    topn2 = run()
    assert len(topn2.state.versions()) == n_versions
    assert {
        (r["cat"], r["rn"]): (r["uid"], r["v"], r["c"])
        for r in topn2.results(spark).collect()
    } == got


def test_streaming_topn_batch_replay_is_noop(spark, tmp_path_str):
    """Direct replay of a batch id must not double-fold."""
    from pyspark.sql import Row

    from lance_flink_spark.streaming.topn import StreamingTopN

    topn = StreamingTopN(tmp_path_str + "/st", ["cat"], ["uid"], "v", n=2)
    b0 = spark.createDataFrame([Row(cat="a", uid=1, v=10)])
    topn.write_batch(b0, 0)
    topn.write_batch(b0, 0)  # replay
    r = topn.results(spark).first()
    assert (r["v"], r["c"]) == (10, 1)


def test_cumulate_streaming_equals_batch(spark):
    """CUMULATE windows: the streaming run's final state equals the
    batch frame (unified engine, same operator)."""
    from conftest import SF_DIR

    from lance_flink_spark.registry import table
    from lance_flink_spark.streaming.pipeline import run_to_memory, stream_events
    from lance_flink_spark.streaming.windows import cumulate_agg

    batch = {
        (r["window_start_s"], r["window_end_s"], r["event_type"]): (
            r["n_events"],
            r["sum_value"],
        )
        for r in cumulate_agg(
            table(spark, SF_DIR, "events"), step="6 hours", size="1 day"
        ).collect()
    }
    sdf = stream_events(spark, SF_DIR, watermark="1 hour")
    t = run_to_memory(
        cumulate_agg(sdf, step="6 hours", size="1 day"), state_partitions=8
    )
    stream = {
        (r["window_start_s"], r["window_end_s"], r["event_type"]): (
            r["n_events"],
            r["sum_value"],
        )
        for r in spark.table(t).collect()
    }
    assert stream == batch
    assert len(batch) > 10


def test_stream_latest_by_key_keep_last(spark, tmp_path_str):
    """Flink keep-last deduplication over a stream: one-row state per
    key, update-mode emissions only when the winner changes; the final
    winner equals the batch latest_by_key dual."""
    import os

    from pyspark.sql import Row, functions as F

    from lance_flink_spark.operators.changelog import latest_by_key
    from lance_flink_spark.streaming.dedup import stream_latest_by_key

    src = tmp_path_str + "/src"
    os.makedirs(src)
    b0 = [Row(k="a", seq=1, tb=1, v="a1"), Row(k="b", seq=5, tb=1, v="b5")]
    b1 = [Row(k="a", seq=9, tb=1, v="a9"),   # newer -> wins
          Row(k="b", seq=2, tb=1, v="b2")]   # older -> no change
    b2 = [Row(k="b", seq=5, tb=2, v="b5b")]  # tie on seq -> tb decides
    for i, rows in enumerate([b0, b1, b2]):
        spark.createDataFrame(rows).coalesce(1).write.parquet(f"{src}/b{i}")

    sdf = spark.readStream.schema("k string, seq bigint, tb bigint, v string") \
        .option("maxFilesPerTrigger", 1).parquet(src + "/*")
    out = stream_latest_by_key(sdf, ["k"], "seq", "tb")
    q = (
        out.writeStream.format("memory").queryName("keeplast")
        .outputMode("update")
        .option("checkpointLocation", tmp_path_str + "/ckpt")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    emitted = spark.table("keeplast").collect()
    # the winner per key is monotone in (seq, tb): the max emission IS
    # the final state
    final = {}
    for r in emitted:
        cur = final.get(r["k"])
        if cur is None or (r["seq"], r["tb"]) > (cur["seq"], cur["tb"]):
            final[r["k"]] = r
    assert {k: r["v"] for k, r in final.items()} == {"a": "a9", "b": "b5b"}
    # b's losing update (seq=2) must not have been emitted
    assert not any(r["k"] == "b" and r["seq"] == 2 for r in emitted)

    batch = spark.createDataFrame(b0 + b1 + b2)
    want = {
        r["k"]: r["v"] for r in latest_by_key(batch, ["k"], "seq", "tb").collect()
    }
    assert {k: r["v"] for k, r in final.items()} == want


def test_stream_latest_by_key_allowed_lateness_drops_late_rows(spark, tmp_path_str):
    """The explicit allowed_lateness knob on keep-last dedup: a row
    arriving later than the watermark allows is dropped before the
    stateful operator and cannot revise the winner; without the knob
    the same row wins."""
    import datetime as dt
    import os

    from pyspark.sql import Row

    from lance_flink_spark.streaming.dedup import stream_latest_by_key

    t0 = dt.datetime(2024, 1, 1, 10, 0)

    def mk_src(tag):
        src = tmp_path_str + f"/src_{tag}"
        os.makedirs(src)
        b0 = [Row(k="a", ts=t0, seq=1, tb=1, v="early")]
        b1 = [Row(k="x", ts=t0 + dt.timedelta(hours=2), seq=1, tb=1, v="wm")]
        # 115min out of order relative to the b1 watermark push
        b2 = [Row(k="a", ts=t0 + dt.timedelta(minutes=5), seq=9, tb=1, v="late")]
        for i, rows in enumerate([b0, b1, b2]):
            spark.createDataFrame(
                rows, "k string, ts timestamp, seq bigint, tb bigint, v string"
            ).coalesce(1).write.parquet(f"{src}/b{i}")
        return src

    def run(tag, lateness):
        src = mk_src(tag)
        sdf = (
            spark.readStream.schema(
                "k string, ts timestamp, seq bigint, tb bigint, v string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        out = stream_latest_by_key(
            sdf, ["k"], "seq", "tb", allowed_lateness=lateness
        )
        q = (
            out.writeStream.format("memory")
            .queryName(f"kl_{tag}")
            .outputMode("update")
            .option("checkpointLocation", tmp_path_str + f"/ckpt_{tag}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        final = {}
        for r in spark.table(f"kl_{tag}").collect():
            cur = final.get(r["k"])
            if cur is None or (r["seq"], r["tb"]) > (cur["seq"], cur["tb"]):
                final[r["k"]] = r
        return {k: r["v"] for k, r in final.items()}

    # 1-minute lateness: the 115min-late row is discarded -> early wins
    assert run("strict", "1 minute")["a"] == "early"
    # 3-hour lateness: the same row is within bounds -> it wins
    assert run("loose", "3 hours")["a"] == "late"


def test_stream_window_join_types(spark, tmp_path_str):
    """Flink window-join type coverage on streams: inner pairs rows in
    the same (key, tumble); LEFT OUTER emits null-partner rows once
    the window closes (the watermark proves no partner can arrive);
    LEFT ANTI emits exactly the windows with no partner."""
    import datetime
    import os

    from lance_flink_spark.streaming.joins import stream_window_join
    from lance_flink_spark.streaming.pipeline import run_to_memory

    def ts(h, m=0):
        return datetime.datetime(2024, 1, 1, h, m)

    schema = "k long, ts timestamp, tag string"
    rows = [
        # window 10: both sides → inner match
        (1, ts(10, 5), "L1"), (1, ts(10, 40), "R1"),
        # window 11: left only → left-outer null partner / anti hit
        (1, ts(11, 5), "L2"),
        # window 12: right only
        (1, ts(12, 5), "R2"),
        # advance the watermark far past everything
        (9, ts(20, 0), "L9"), (9, ts(20, 1), "R9"),
    ]
    left_rows = [(k, t, g) for k, t, g in rows if g.startswith("L")]
    right_rows = [(k, t, g) for k, t, g in rows if g.startswith("R")]
    src = os.path.join(tmp_path_str, "wj")
    spark.createDataFrame(left_rows, schema).coalesce(1).write.parquet(src + "/l")
    spark.createDataFrame(right_rows, schema).coalesce(1).write.parquet(src + "/r")

    def stream(side):
        return (
            spark.readStream.schema(schema)
            .parquet(src + f"/{side}")
            .withWatermark("ts", "0 seconds")
        )

    inner = stream_window_join(stream("l"), stream("r"), on="k", window="1 hour")
    t = run_to_memory(inner, mode="append", state_partitions=4)
    got = {(r["k"], r["l_tag"], r["r_tag"]) for r in spark.sql(f"SELECT * FROM {t}").collect()}
    assert got == {(1, "L1", "R1"), (9, "L9", "R9")}

    louter = stream_window_join(
        stream("l"), stream("r"), on="k", window="1 hour", how="left"
    )
    t2 = run_to_memory(louter, mode="append", state_partitions=4)
    got2 = {(r["k"], r["l_tag"], r["r_tag"]) for r in spark.sql(f"SELECT * FROM {t2}").collect()}
    assert (1, "L2", None) in got2 and (1, "L1", "R1") in got2

    anti = stream_window_join(
        stream("l"), stream("r"), on="k", window="1 hour", how="left_anti"
    )
    t3 = run_to_memory(anti, mode="append", state_partitions=4)
    got3 = {(r["k"], r["l_tag"]) for r in spark.sql(f"SELECT * FROM {t3}").collect()}
    assert got3 == {(1, "L2")}


def test_stream_latest_by_key_sharded_equals_per_key(spark, tmp_path_str):
    """r16 sharded grouping for keep-last dedup: one state row per
    SHARD (pickled winner map), same emit-only-on-change contract —
    emissions must equal the per-key path exactly, including the
    suppressed losing update and NULL keys (which stay data, no
    sentinel)."""
    import os

    from pyspark.sql import Row

    from lance_flink_spark.streaming.dedup import stream_latest_by_key

    src = tmp_path_str + "/src_sh"
    os.makedirs(src)
    b0 = [Row(k="a", seq=1, tb=1, v="a1"), Row(k=None, seq=5, tb=1, v="n5")]
    b1 = [Row(k="a", seq=9, tb=1, v="a9"),   # newer -> wins
          Row(k=None, seq=2, tb=1, v="n2")]  # older -> no change, no emit
    b2 = [Row(k=None, seq=5, tb=2, v="n5b")]  # tie on seq -> tb decides
    for i, rows in enumerate([b0, b1, b2]):
        spark.createDataFrame(
            rows, "k string, seq bigint, tb bigint, v string"
        ).coalesce(1).write.parquet(f"{src}/b{i}")

    def run(tag, shards):
        sdf = (
            spark.readStream.schema("k string, seq bigint, tb bigint, v string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        out = stream_latest_by_key(
            sdf, ["k"], "seq", "tb", key_shards=shards
        )
        q = (
            out.writeStream.format("memory").queryName(f"klsh_{tag}")
            .outputMode("update")
            .option("checkpointLocation", tmp_path_str + f"/ckpt_{tag}")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return sorted(
            (tuple(r) for r in spark.table(f"klsh_{tag}").collect()),
            key=lambda t: tuple((x is None, x) for x in t),
        )

    per_key = run("pk", None)
    sharded = run("sh", 1)  # max collision: every key in one shard
    assert sharded == per_key
    # the losing updates must not have been emitted in either mode
    assert not any(r[1] == 2 for r in sharded)
    # final winners (max emission per key) match the batch dual
    final = {}
    for r in sharded:
        cur = final.get(r[0])
        if cur is None or (r[1], r[2]) > (cur[1], cur[2]):
            final[r[0]] = r
    assert {k: r[3] for k, r in final.items()} == {"a": "a9", None: "n5b"}


def test_running_counters_sharded_equals_per_key(spark, tmp_path_str):
    """r16 sharded counters: per-shard pickled map, but emissions must
    equal per-key grouping exactly — running totals across batches,
    last_ts = the BATCH max (not running max), only arriving users
    emitted per batch."""
    import datetime as dt
    import os

    from pyspark.sql import Row

    from lance_flink_spark.streaming.stateful import running_user_counters

    t0 = dt.datetime(2024, 1, 1, 10, 0)
    src = tmp_path_str + "/src_cnt"
    os.makedirs(src)
    b0 = [Row(user_id=1, ts=t0, value=1.5),
          Row(user_id=2, ts=t0 + dt.timedelta(minutes=1), value=2.0)]
    b1 = [Row(user_id=1, ts=t0 + dt.timedelta(minutes=2), value=0.25),
          Row(user_id=1, ts=t0 + dt.timedelta(minutes=3), value=0.25)]
    for i, rows in enumerate([b0, b1]):
        spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double"
        ).coalesce(1).write.parquet(f"{src}/b{i}")

    def run(tag, shards):
        sdf = (
            spark.readStream.schema("user_id long, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
            .withWatermark("ts", "1 hour")
        )
        out = running_user_counters(sdf, key_shards=shards)
        q = (
            out.writeStream.format("memory").queryName(f"cnt_{tag}")
            .outputMode("update")
            .option("checkpointLocation", tmp_path_str + f"/ckpt_cnt_{tag}")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return sorted(tuple(r) for r in spark.table(f"cnt_{tag}").collect())

    per_key = run("pk", None)
    sharded = run("sh", 1)
    assert sharded == per_key
    # user 1 emitted twice (both batches) with RUNNING totals; user 2 once
    u1 = [r for r in sharded if r[0] == 1]
    assert [(r[1], r[2]) for r in u1] == [(1, 1.5), (3, 2.0)]
