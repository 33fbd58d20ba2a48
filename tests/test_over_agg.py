"""Streaming event-time OVER aggregation (streaming/over_agg.py):
cross-micro-batch correctness — rows buffered until the watermark
passes them, frames spanning batch boundaries, peer-ts rows, eviction
safety. The corpus-scale single-batch path is hash-gated by the
streaming_over_agg extra."""

import os
import time

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from lance_flink_spark.streaming.over_agg import over_range_sum

RANGE_MS = 10 * 60 * 1000  # 10 minutes


def _batch_expected(spark, rows):
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, vc long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-RANGE_MS * 1000, 0)
    )
    return {
        (r["user_id"], r["event_id"]): r["range_sum"]
        for r in df.select(
            "user_id",
            "event_id",
            F.sum("vc").over(w).alias("range_sum"),
        ).collect()
    }


def _stream(spark, tmp_path_str, batches):
    """One parquet file per micro-batch (mtime-ordered), streamed with
    maxFilesPerTrigger=1 → true cross-batch state."""
    src = os.path.join(tmp_path_str, "src")
    os.makedirs(src, exist_ok=True)
    schema = "user_id long, event_id long, ts timestamp, vc long"
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(os.path.join(src, f"b{i}"))
        time.sleep(1.05)  # distinct mtimes fix the batch order
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )  # unwatermarked: the operator attaches its shifted watermark
    out = over_range_sum(
        sdf, key_col="user_id", ts_col="ts", id_col="event_id",
        value_col="vc", preceding_ms=RANGE_MS,
    )
    from lance_flink_spark.streaming.pipeline import run_to_memory

    t = run_to_memory(out, mode="append", state_partitions=4)
    return {
        (r["user_id"], r["event_id"]): r["range_sum"]
        for r in spark.sql(f"SELECT * FROM {t}").collect()
    }


def _ts(minute, sec=0):
    import datetime

    return datetime.datetime(2024, 1, 1, 12, minute, sec)


def test_cross_batch_frames_equal_batch_oracle(spark, tmp_path_str):
    """Frames SPAN micro-batch boundaries: a row arriving in batch 3
    must sum rows that arrived in batches 1-2 (still in state), and
    rows near each batch's end must wait for the next batch's
    watermark before emitting."""
    b1 = [
        Row(user_id=1, event_id=1, ts=_ts(0), vc=10),
        Row(user_id=1, event_id=2, ts=_ts(5), vc=20),
        Row(user_id=2, event_id=3, ts=_ts(5), vc=7),
    ]
    b2 = [
        Row(user_id=1, event_id=4, ts=_ts(9), vc=30),   # frame: 10+20+30
        Row(user_id=1, event_id=5, ts=_ts(16), vc=40),  # frame: 30+40 (10,20 out of range)
        Row(user_id=2, event_id=6, ts=_ts(14), vc=8),   # frame: 7+8
    ]
    b3 = [
        Row(user_id=1, event_id=7, ts=_ts(30), vc=50),  # frame: itself
        Row(user_id=2, event_id=8, ts=_ts(30), vc=9),   # frame: itself
    ]
    rows = b1 + b2 + b3
    got = _stream(spark, tmp_path_str, [b1, b2, b3])
    assert got == _batch_expected(spark, rows)
    assert got[(1, 4)] == 60 and got[(1, 5)] == 70 and got[(2, 6)] == 15


def test_peer_timestamps_share_the_full_frame(spark, tmp_path_str):
    """Equal-ts rows are RANGE peers: each includes the other."""
    b1 = [
        Row(user_id=1, event_id=1, ts=_ts(0), vc=5),
        Row(user_id=1, event_id=2, ts=_ts(0), vc=6),
        Row(user_id=1, event_id=3, ts=_ts(3), vc=1),
    ]
    got = _stream(spark, tmp_path_str, [b1])
    assert got[(1, 1)] == 11 and got[(1, 2)] == 11 and got[(1, 3)] == 12
    assert got == _batch_expected(spark, b1)


def test_quiet_key_flushes_via_event_time_timer(spark, tmp_path_str):
    """A key with NO rows in later batches must still flush its pending
    rows when other keys advance the watermark — the event-time-timer
    path (Flink onTimer parity)."""
    b1 = [Row(user_id=9, event_id=1, ts=_ts(0), vc=42)]
    b2 = [Row(user_id=1, event_id=2, ts=_ts(20), vc=1)]
    got = _stream(spark, tmp_path_str, [b1, b2])
    assert got[(9, 1)] == 42  # emitted despite user 9 never reappearing
    assert got == _batch_expected(spark, b1 + b2)


def test_rows_frame_cross_batch_and_eviction(spark, tmp_path_str):
    """ROWS frame spans batches: with n_preceding=2 the frame of a
    batch-2 row reaches rows that arrived (and were emitted) in
    batch 1 — eviction must keep exactly the last n slots before the
    pending horizon."""
    from lance_flink_spark.streaming.over_agg import over_rows_sum
    from lance_flink_spark.streaming.pipeline import run_to_memory

    b1 = [
        Row(user_id=1, event_id=1, ts=_ts(0), vc=1),
        Row(user_id=1, event_id=2, ts=_ts(1), vc=2),
        Row(user_id=1, event_id=3, ts=_ts(2), vc=4),
    ]
    b2 = [
        Row(user_id=1, event_id=4, ts=_ts(40), vc=8),   # frame: 2+4+8 (range-irrelevant: ROWS)
        Row(user_id=1, event_id=5, ts=_ts(41), vc=16),  # frame: 4+8+16
    ]
    src = os.path.join(tmp_path_str, "src_rows")
    os.makedirs(src, exist_ok=True)
    schema = "user_id long, event_id long, ts timestamp, vc long"
    for i, rows in enumerate([b1, b2]):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            os.path.join(src, f"b{i}")
        )
        time.sleep(1.05)
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )  # unwatermarked: the operator attaches its shifted watermark
    out = over_rows_sum(sdf, n_preceding=2)
    t = run_to_memory(out, mode="append", state_partitions=4)
    got = {
        (r["user_id"], r["event_id"]): r["rows_sum"]
        for r in spark.sql(f"SELECT * FROM {t}").collect()
    }
    assert got == {(1, 1): 1, (1, 2): 3, (1, 3): 7, (1, 4): 14, (1, 5): 28}


def test_rows_frame_peer_ties_break_on_id(spark, tmp_path_str):
    from lance_flink_spark.streaming.over_agg import over_rows_sum
    from lance_flink_spark.streaming.pipeline import run_to_memory

    rows = [
        Row(user_id=1, event_id=2, ts=_ts(0), vc=10),  # sorts after id=1
        Row(user_id=1, event_id=1, ts=_ts(0), vc=1),
        Row(user_id=1, event_id=3, ts=_ts(5), vc=100),
    ]
    src = os.path.join(tmp_path_str, "src_ties")
    os.makedirs(src, exist_ok=True)
    schema = "user_id long, event_id long, ts timestamp, vc long"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(os.path.join(src, "b0"))
    sdf = (
        spark.readStream.schema(schema)
        .parquet(src + "/*")
    )  # unwatermarked: the operator attaches its shifted watermark
    t = run_to_memory(over_rows_sum(sdf, n_preceding=1), mode="append", state_partitions=4)
    got = {
        (r["user_id"], r["event_id"]): r["rows_sum"]
        for r in spark.sql(f"SELECT * FROM {t}").collect()
    }
    # (ts, id) order: id1 → frame {1}; id2 → frame {1,10}; id3 → {10,100}
    assert got == {(1, 1): 1, (1, 2): 11, (1, 3): 110}


def test_property_random_events_match_batch_window(spark, tmp_path_str):
    """Randomized robustness: seeded random events (duplicate
    timestamps, multiple keys, values incl. negatives) split into
    time-ordered micro-batches — streamed RANGE sums must equal the
    batch window exactly. Deterministic seeds so failures replay."""
    import random

    for seed in (11, 23):
        rng = random.Random(seed)
        n_keys = rng.randint(1, 4)
        rows = []
        t = 0
        for i in range(rng.randint(20, 60)):
            t += rng.choice([0, 0, 1, 30, 200, 700])  # seconds; dups common
            rows.append(
                Row(
                    user_id=rng.randrange(n_keys),
                    event_id=i,
                    ts=_ts(0, 0) + __import__("datetime").timedelta(seconds=t),
                    vc=rng.randint(-50, 100),
                )
            )
        # split into 3 time-ordered batches at STRICT ts increases:
        # a cut inside an equal-ts run would ship a peer one batch
        # after the watermark sealed its frame — legitimately late
        # under the delay-0 contract, but absent from the batch oracle
        def snap(i):
            while 0 < i < len(rows) and rows[i].ts == rows[i - 1].ts:
                i += 1
            return i

        cut1 = snap(len(rows) // 3)
        cut2 = snap(max(2 * len(rows) // 3, cut1))
        batches = [rows[:cut1], rows[cut1:cut2], rows[cut2:]]
        batches = [b for b in batches if b]
        sub = os.path.join(tmp_path_str, f"prop{seed}")
        os.makedirs(sub, exist_ok=True)
        got = _stream(spark, sub, batches)
        assert got == _batch_expected(spark, rows), f"seed {seed}"


def test_cross_batch_late_row_dropped_not_misframed(spark, tmp_path_str):
    """A straggler arriving BELOW the key's emission horizon (a sealed
    frame already covered its timestamp) is DROPPED — Flink's OVER
    late-row behavior — so it neither rewrites history nor emits. A
    straggler that is late by Spark's watermark but still ABOVE the
    horizon emits normally with a correct frame (nothing sealed
    covered it) — strictly better than Flink's blanket drop."""
    b1 = [
        Row(user_id=1, event_id=1, ts=_ts(0), vc=1),
        Row(user_id=1, event_id=2, ts=_ts(20), vc=2),
    ]
    # batch 2's invocation runs at wm = minute 20 (+1ms): ids 1-2 emit
    # and the horizon seals at that watermark
    b2 = [Row(user_id=1, event_id=3, ts=_ts(25), vc=4)]
    # batch 3: a straggler at minute 1 — BELOW the sealed horizon →
    # dropped; the minute-26 row emits with its normal frame
    b3 = [
        Row(user_id=1, event_id=9, ts=_ts(1), vc=100),
        Row(user_id=1, event_id=4, ts=_ts(26), vc=8),
    ]
    got = _stream(spark, tmp_path_str, [b1, b2, b3])
    assert (1, 9) not in got  # never emitted
    # and never leaked into a later frame: id 4 at minute 26 covers
    # minutes 16-26 → ids 2 (minute 20), 3 (minute 25), 4 itself
    assert got[(1, 4)] == 14
    assert got[(1, 1)] == 1 and got[(1, 2)] == 2 and got[(1, 3)] == 6


def test_multi_agg_range_cross_batch(spark, tmp_path_str):
    """over_range_multi: COUNT/SUM/MIN/MAX/AVG across micro-batch
    boundaries equal the batch five-aggregate window — incl. MIN/MAX
    frames whose extremum enters in an EARLIER batch than the emitted
    row (the sparse table runs over buffered + new rows together)."""
    from lance_flink_spark.streaming.over_agg import over_range_multi
    from lance_flink_spark.streaming.pipeline import run_to_memory

    batches = [
        [
            Row(user_id=1, event_id=1, ts=_ts(0, 0), vc=-50),
            Row(user_id=1, event_id=2, ts=_ts(4, 0), vc=30),
        ],
        [
            Row(user_id=1, event_id=3, ts=_ts(8, 0), vc=10),
            Row(user_id=1, event_id=4, ts=_ts(13, 0), vc=99),
        ],
        [Row(user_id=1, event_id=5, ts=_ts(30, 0), vc=7)],
    ]
    src = os.path.join(tmp_path_str, "multi_src")
    os.makedirs(src, exist_ok=True)
    schema = "user_id long, event_id long, ts timestamp, vc long"
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(os.path.join(src, f"b{i}"))
        time.sleep(1.05)
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = over_range_multi(
        sdf, key_col="user_id", ts_col="ts", id_col="event_id",
        value_col="vc", preceding_ms=RANGE_MS,
    )
    t = run_to_memory(out, mode="append", state_partitions=4)
    got = {
        r["event_id"]: (
            r["over_cnt"], r["over_sum"], r["over_min"], r["over_max"],
            r["over_avg"],
        )
        for r in spark.sql(f"SELECT * FROM {t}").collect()
    }
    # frames (10-min range): e1:{e1} e2:{e1,e2} e3:{e1,e2,e3}
    # e4:{e2(4m),e3,e4} — e1 (13m back) OUT; e5:{e5} after eviction gap
    assert got[1] == (1, -50, -50, -50, -50.0)
    assert got[2] == (2, -20, -50, 30, -10.0)
    assert got[3] == (3, -10, -50, 30, -10.0 / 3)
    assert got[4] == (3, 139, 10, 99, 139.0 / 3)
    assert got[5] == (1, 7, 7, 7, 7.0)


def test_multi_agg_rows_frame_head_counts(spark, tmp_path_str):
    """over_rows_multi: the head of a key's history has COUNT < n+1
    (shorter frame), and MIN/MAX track the sliding 2-preceding frame
    exactly in (ts, id) order."""
    from lance_flink_spark.streaming.over_agg import over_rows_multi
    from lance_flink_spark.streaming.pipeline import run_to_memory

    rows = [
        Row(user_id=1, event_id=i, ts=_ts(i, 0), vc=v)
        for i, v in enumerate([5, -3, 9, 0, -7, 4])
    ]
    src = os.path.join(tmp_path_str, "rows_multi_src")
    os.makedirs(src, exist_ok=True)
    schema = "user_id long, event_id long, ts timestamp, vc long"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        os.path.join(src, "b0")
    )
    sdf = spark.readStream.schema(schema).parquet(src + "/*")
    out = over_rows_multi(
        sdf, key_col="user_id", ts_col="ts", id_col="event_id",
        value_col="vc", n_preceding=2,
    )
    t = run_to_memory(out, mode="append", state_partitions=4)
    got = {
        r["event_id"]: (r["over_cnt"], r["over_sum"], r["over_min"], r["over_max"])
        for r in spark.sql(f"SELECT * FROM {t}").collect()
    }
    assert got[0] == (1, 5, 5, 5)
    assert got[1] == (2, 2, -3, 5)
    assert got[2] == (3, 11, -3, 9)
    assert got[3] == (3, 6, -3, 9)
    assert got[4] == (3, 2, -7, 9)
    assert got[5] == (3, -3, -7, 4)


def test_streaming_lag_cross_batch_and_head_nulls(spark, tmp_path_str):
    """over_rows_lag: predecessors bound across micro-batch
    boundaries; NULL exactly for the first n rows of a key (eviction
    never masquerades as stream head — the evicted counter guards
    it)."""
    from lance_flink_spark.streaming.over_agg import over_rows_lag
    from lance_flink_spark.streaming.pipeline import run_to_memory

    batches = [
        [Row(user_id=1, event_id=1, ts=_ts(0, 0), vc=10),
         Row(user_id=1, event_id=2, ts=_ts(1, 0), vc=20)],
        [Row(user_id=1, event_id=3, ts=_ts(2, 0), vc=30),
         Row(user_id=1, event_id=4, ts=_ts(3, 0), vc=40)],
        [Row(user_id=1, event_id=5, ts=_ts(59, 0), vc=50)],
    ]
    src = os.path.join(tmp_path_str, "lag_src")
    os.makedirs(src, exist_ok=True)
    schema = "user_id long, event_id long, ts timestamp, vc long"
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(os.path.join(src, f"b{i}"))
        time.sleep(1.05)
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = over_rows_lag(
        sdf, key_col="user_id", ts_col="ts", id_col="event_id",
        value_col="vc", n_lag=2,
    )
    t = run_to_memory(out, mode="append", state_partitions=4)
    got = {
        r["event_id"]: r["lag_v"]
        for r in spark.sql(f"SELECT * FROM {t}").collect()
    }
    # e5 arrives two batches later, after e1/e2 were emitted (and e1
    # possibly evicted) — its LAG(2) is still e3's value
    assert got == {1: None, 2: None, 3: 10, 4: 20, 5: 30}


class TestStreamingSqlOverDialect:
    """The SQL dialect's streaming OVER lowering (sources/ddl.py::
    _try_stream_over, VERDICT r13 #6): the same OVER text Spark SQL
    runs on batch lowers onto over_{range,rows}_multi / over_rows_lag
    when the FROM view is streaming; everything outside the subset
    refuses loudly; batch sources pass through to Spark SQL."""

    def _sdf(self, spark, tmp_path_str):
        src = os.path.join(tmp_path_str, "sqlover_src")
        os.makedirs(src, exist_ok=True)
        schema = "user_id long, event_id long, ts timestamp, vc long"
        rows = [
            (1, 10, _ts(0), 5),
            (1, 11, _ts(1), 7),
            (1, 12, _ts(40), 2),
            (2, 20, _ts(2), 9),
        ]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(src)
        return spark.readStream.schema(schema).parquet(src)

    def _engine(self, spark, tmp_path_str):
        from lance_flink_spark.sources.catalog import Catalog
        from lance_flink_spark.sources.ddl import SqlEngine

        return SqlEngine(spark, Catalog(tmp_path_str + "/whso"))

    def test_rows_frame_and_inline_over(self, spark, tmp_path_str):
        from lance_flink_spark.streaming.pipeline import run_to_memory

        self._sdf(spark, tmp_path_str).createOrReplaceTempView("so_events")
        eng = self._engine(spark, tmp_path_str)
        out = eng.execute(
            """SELECT user_id, event_id, ts,
                      SUM(vc) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)
                          AS s
               FROM so_events"""
        )
        assert out.isStreaming
        t = run_to_memory(out, mode="append", state_partitions=4)
        got = {r["event_id"]: r["s"] for r in spark.table(t).collect()}
        assert got == {10: 5, 11: 12, 12: 9, 20: 9}

    def test_lag_lowering(self, spark, tmp_path_str):
        from lance_flink_spark.streaming.pipeline import run_to_memory

        self._sdf(spark, tmp_path_str).createOrReplaceTempView("so_lag")
        eng = self._engine(spark, tmp_path_str)
        out = eng.execute(
            """SELECT user_id, event_id, ts,
                      LAG(vc, 1) OVER (PARTITION BY user_id ORDER BY ts)
                          AS prev_v
               FROM so_lag"""
        )
        t = run_to_memory(out, mode="append", state_partitions=4)
        got = {r["event_id"]: r["prev_v"] for r in spark.table(t).collect()}
        assert got == {10: None, 11: 5, 12: 7, 20: None}

    def test_refusals(self, spark, tmp_path_str):
        self._sdf(spark, tmp_path_str).createOrReplaceTempView("so_bad")
        eng = self._engine(spark, tmp_path_str)
        head = "SELECT user_id, event_id, ts, "
        # two different value columns
        with pytest.raises(ValueError, match="ONE value column"):
            eng.execute(
                head + """SUM(vc) OVER w AS a, MIN(event_id) OVER w AS b
                   FROM so_bad
                   WINDOW w AS (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"""
            )
        # mixed inline window specs
        with pytest.raises(ValueError, match="ONE window spec"):
            eng.execute(
                head + """SUM(vc) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS a,
                      MAX(vc) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS b
                   FROM so_bad"""
            )
        # unbounded frame (Flink streaming OVER must be trailing-bounded)
        with pytest.raises(ValueError, match="trailing-bounded"):
            eng.execute(
                head + """SUM(vc) OVER (PARTITION BY user_id ORDER BY ts) AS a
                   FROM so_bad"""
            )
        # LAG mixed with frame aggregates
        with pytest.raises(ValueError, match="cannot mix"):
            eng.execute(
                head + """SUM(vc) OVER w AS a, LAG(vc, 1) OVER w AS b
                   FROM so_bad
                   WINDOW w AS (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"""
            )

    def test_batch_source_falls_through_to_spark(self, spark, tmp_path_str):
        spark.createDataFrame(
            [(1, 10, _ts(0), 5), (1, 11, _ts(1), 7)],
            "user_id long, event_id long, ts timestamp, vc long",
        ).createOrReplaceTempView("so_batch")
        eng = self._engine(spark, tmp_path_str)
        out = eng.execute(
            """SELECT user_id, event_id, ts,
                      SUM(vc) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)
                          AS s
               FROM so_batch"""
        )
        assert not out.isStreaming  # Spark SQL served it natively
        assert {r["event_id"]: r["s"] for r in out.collect()} == {10: 5, 11: 12}


# ---------- r15: sharded grouping equivalence ----------


def _stream_op(spark, tmp_path_str, batches, op, sub, **kw):
    src = os.path.join(tmp_path_str, "src_" + sub)
    os.makedirs(src, exist_ok=True)
    schema = "user_id long, event_id long, ts timestamp, vc long"
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(os.path.join(src, f"b{i}"))
        time.sleep(1.05)
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = op(
        sdf, key_col="user_id", ts_col="ts", id_col="event_id",
        value_col="vc", **kw
    )
    from lance_flink_spark.streaming.pipeline import run_to_memory

    t = run_to_memory(out, mode="append", state_partitions=4)
    return sorted(
        (tuple(r) for r in spark.sql(f"SELECT * FROM {t}").collect()),
        key=lambda t: tuple((x is None, x) for x in t),  # NULL-key rows sort
    )


def test_sharded_equals_per_key_including_stragglers(spark, tmp_path_str):
    """key_shards groups MANY keys into one state row; emitted rows
    must equal per-key grouping exactly — including the per-key
    emission-horizon semantics: key 10's sealed horizon must not leak
    onto key 20 sharing its shard, so key 20's straggler (late by the
    watermark's late filter in BOTH modes — Spark's stateful-operator
    watermark predicate drops sub-watermark input rows before the
    function), and the shard timer fires key 20's flush in a batch
    where only key 10 has data. key_shards=1 forces every key into ONE
    shard — the maximal-collision case."""
    b1 = [
        Row(user_id=10, event_id=1, ts=_ts(0), vc=1),
        Row(user_id=10, event_id=2, ts=_ts(20), vc=2),
        Row(user_id=20, event_id=3, ts=_ts(1), vc=5),
    ]
    # watermark advances to minute 20 (+1ms): key 10 seals through 20;
    # key 20 has no arrivals and nothing emittable beyond its buffer
    b2 = [Row(user_id=10, event_id=4, ts=_ts(25), vc=4)]
    b3 = [
        # stragglers below the watermark: Spark's late filter drops
        # them before the operator in BOTH grouping modes
        Row(user_id=10, event_id=9, ts=_ts(1), vc=100),
        Row(user_id=20, event_id=8, ts=_ts(3), vc=7),
        Row(user_id=10, event_id=5, ts=_ts(26), vc=8),
    ]
    from lance_flink_spark.streaming.over_agg import (
        over_range_sum as _rs,
    )

    per_key = _stream_op(
        spark, tmp_path_str, [b1, b2, b3], _rs, "pk", preceding_ms=RANGE_MS
    )
    sharded = _stream_op(
        spark, tmp_path_str, [b1, b2, b3], _rs, "sh",
        preceding_ms=RANGE_MS, key_shards=1,
    )
    assert sharded == per_key
    got = {(k, i): v for k, i, _t, v in sharded}
    assert (10, 9) not in got and (20, 8) not in got  # late rows dropped
    assert got[(20, 3)] == 5           # key 20 flushed by the shard timer
    assert got[(10, 4)] == 6           # 2 + 4 (minute 25 frame covers 20,25)
    assert got[(10, 5)] == 14          # 2 + 4 + 8 (frame 16..26)


def test_sharded_lag_equals_per_key(spark, tmp_path_str):
    """LAG in sharded mode: per-key predecessor chains and stream-head
    NULLs must be untouched by shard co-residency (evicted counters are
    per key inside the shard state)."""
    b1 = [
        Row(user_id=10, event_id=1, ts=_ts(0), vc=1),
        Row(user_id=20, event_id=2, ts=_ts(1), vc=5),
        Row(user_id=10, event_id=3, ts=_ts(2), vc=2),
    ]
    b2 = [
        Row(user_id=10, event_id=4, ts=_ts(10), vc=3),
        Row(user_id=20, event_id=5, ts=_ts(11), vc=6),
    ]
    b3 = [Row(user_id=10, event_id=6, ts=_ts(30), vc=9)]
    from lance_flink_spark.streaming.over_agg import over_rows_lag as _lg

    per_key = _stream_op(
        spark, tmp_path_str, [b1, b2, b3], _lg, "lpk", n_lag=1
    )
    sharded = _stream_op(
        spark, tmp_path_str, [b1, b2, b3], _lg, "lsh", n_lag=1, key_shards=1
    )
    assert sharded == per_key
    got = {(k, i): v for k, i, _t, v in sharded}
    assert got[(10, 1)] is None and got[(20, 2)] is None  # stream heads
    assert got[(10, 3)] == 1 and got[(10, 4)] == 2 and got[(20, 5)] == 5


def test_sharded_null_keys_equal_per_key(spark, tmp_path_str):
    """NULL partition keys (r15 advice): the sharded path must treat
    NULL as ONE partition — exactly like the per-key path and batch
    SQL — not crash converting a nulled int64 pandas column. The
    sentinel mapping happens in Catalyst both ways, so the emitted key
    column carries real NULLs."""
    b1 = [
        Row(user_id=None, event_id=1, ts=_ts(0), vc=1),
        Row(user_id=10, event_id=2, ts=_ts(1), vc=5),
        Row(user_id=None, event_id=3, ts=_ts(2), vc=2),
    ]
    b2 = [
        Row(user_id=None, event_id=4, ts=_ts(10), vc=3),
        Row(user_id=10, event_id=5, ts=_ts(11), vc=6),
    ]
    b3 = [Row(user_id=10, event_id=6, ts=_ts(30), vc=9)]
    from lance_flink_spark.streaming.over_agg import over_rows_sum as _rsum

    per_key = _stream_op(
        spark, tmp_path_str, [b1, b2, b3], _rsum, "npk", n_preceding=1
    )
    sharded = _stream_op(
        spark, tmp_path_str, [b1, b2, b3], _rsum, "nsh",
        n_preceding=1, key_shards=1,
    )
    assert sharded == per_key
    got = {(k, i): v for k, i, _t, v in sharded}
    # NULL keys form one partition: id 3's frame covers ids 1+3, id 4's 3+4
    assert got[(None, 3)] == 3 and got[(None, 4)] == 5
    assert got[(10, 5)] == 11  # real key unaffected by NULL co-residents
