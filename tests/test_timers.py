"""Event-time timers via transformWithStateInPandas
(streaming/timers.py): gap closure fires from the watermark, the
duration cap closes inline, stale timers are ignored."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from lance_flink_spark.streaming.timers import capped_sessions


def _write_batch(spark, path, i, rows):
    spark.createDataFrame(
        [Row(user_id=u, ts=ts, value=float(v)) for u, ts, v in rows],
        "user_id bigint, ts timestamp, value double",
    ).coalesce(1).write.parquet(f"{path}/b{i}")


TS = "2024-01-01 00:{m:02d}:00"


def _t(m):
    import datetime

    return datetime.datetime(2024, 1, 1, 0, m, 0)


def test_capped_sessions_gap_and_duration(spark, tmp_path_str):
    src = tmp_path_str + "/src"
    os.makedirs(src)
    # user 1: events at minutes 0,2,4 then 30 (gap >5m closes first
    # session via timer), user 2: events every 2 min from 0..20 — the
    # 15-minute cap splits it inline despite no gap ever passing
    _write_batch(spark, src, 0, [(1, _t(0), 1), (1, _t(2), 1), (2, _t(0), 2)])
    _write_batch(
        spark, src, 1,
        [(1, _t(4), 1)] + [(2, _t(m), 2) for m in range(2, 22, 2)],
    )
    # minute-59 sentinels push the watermark far enough to fire the
    # gap timers of everything above (filtered from assertions)
    _write_batch(spark, src, 2, [(1, _t(30), 1), (99, _t(59), 0)])
    _write_batch(spark, src, 3, [(98, _t(59), 0)])

    schema = "user_id bigint, ts timestamp, value double"
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
        .withWatermark("ts", "1 minute")
    )
    out = capped_sessions(
        sdf, gap_ms=5 * 60_000, max_duration_ms=15 * 60_000
    )
    q = (
        out.writeStream.format("memory")
        .queryName("capped")
        .outputMode("append")
        .option("checkpointLocation", tmp_path_str + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [
        r
        for r in spark.table("capped").collect()
        if r["user_id"] in (1, 2)
    ]
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            r["value_sum"],
            r["close_reason"],
        )
        for r in rows
    }

    def ms(m):
        import calendar

        return calendar.timegm(_t(m).timetuple()) * 1000

    # user 1, session [0,4] closed by gap (minute-30 event is >5m later)
    assert got[(1, ms(0), ms(4))] == (3, 3.0, "gap")
    # user 2: cap closes [0,14] when the minute-16 event arrives...
    assert got[(2, ms(0), ms(14))] == (8, 16.0, "max_duration")
    # ...and the tail [16,20] closes by gap once the watermark passes
    assert got[(2, ms(16), ms(20))] == (3, 6.0, "gap")
    # user 1's minute-30 session closes by gap via the sentinel watermark
    assert got[(1, ms(30), ms(30))] == (1, 1.0, "gap")


def test_capped_sessions_state_survives_restart(spark, tmp_path_str):
    """An OPEN session's state recovers from the checkpoint: events
    arriving in a second run extend it instead of starting fresh."""
    src = tmp_path_str + "/src2"
    os.makedirs(src)
    schema = "user_id bigint, ts timestamp, value double"

    sink = tmp_path_str + "/sink2"

    def run(qname):
        sdf = (
            spark.readStream.schema(schema)
            .parquet(src + "/*")
            .withWatermark("ts", "1 minute")
        )
        out = capped_sessions(
            sdf, gap_ms=5 * 60_000, max_duration_ms=60 * 60_000
        )
        # parquet sink: supports checkpoint RECOVERY (memory does not)
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", tmp_path_str + "/ckpt2")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink).collect()

    _write_batch(spark, src, 0, [(7, _t(0), 1), (7, _t(2), 1)])
    assert [r for r in run("run1") if r["user_id"] == 7] == []
    # second run: minute-4 extends the RECOVERED session; the sentinel
    # watermark then gap-closes it as one [0,4] session of 3 events
    _write_batch(spark, src, 1, [(7, _t(4), 1), (99, _t(59), 0)])
    rows = [r for r in run("run2") if r["user_id"] == 7]
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_events"], r["value_sum"], r["close_reason"]) == (3, 3.0, "gap")
