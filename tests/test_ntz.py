"""Regression: parquet timestamp[us] WITHOUT timezone is inferred as
TIMESTAMP_NTZ by Spark 4, which withWatermark / windowed aggs reject
(EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). registry.table and
streaming.pipeline.stream_events must normalize the event-time column
to a TIMESTAMP (LTZ) UTC instant — session-timezone independent, so
the DuckDB oracle's naive epoch() stays consistent."""

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T


@pytest.fixture(scope="module")
def ntz_sf_dir(tmp_path_factory):
    """A minimal sf-dir whose events.parquet carries tz-naive µs
    timestamps (what the driver's testdata generator emits)."""
    d = tmp_path_factory.mktemp("ntz_sf")
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    n = 200
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [base + datetime.timedelta(minutes=7 * i) for i in range(n)],
                pa.timestamp("us"),  # NO timezone -> Spark reads NTZ
            ),
            "user_id": pa.array([i % 5 for i in range(n)], pa.int64()),
            "event_type": pa.array(["click", "view"][i % 2] for i in range(n)),
            "value": pa.array([float(i) for i in range(n)], pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, os.path.join(str(d), "events.parquet"))
    return str(d)


def test_table_normalizes_ntz_to_utc_instant(spark, ntz_sf_dir):
    from lance_flink_spark.registry import table

    df = table(spark, ntz_sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    # wall clock preserved: first event is exactly 2024-01-01T00:00:00 UTC
    first = df.orderBy("event_id").select("ts").first()[0]
    assert (first.year, first.month, first.day, first.hour) == (2024, 1, 1, 0)


def test_streaming_watermark_accepts_ntz_source(spark, ntz_sf_dir):
    from lance_flink_spark.streaming.pipeline import run_to_memory, stream_events
    from lance_flink_spark.streaming.windows import tumbling_agg

    sdf = stream_events(spark, ntz_sf_dir, watermark="1 hour")
    assert isinstance(sdf.schema["ts"].dataType, T.TimestampType)
    out = spark.table(run_to_memory(tumbling_agg(sdf, window="1 hour")))
    # 200 events at 7-min spacing span ~23.2h -> 24 hourly windows x 2 types
    total = out.agg({"n_events": "sum"}).first()[0]
    assert total == 200


def test_batch_window_agg_on_ntz_matches_epoch_alignment(spark, ntz_sf_dir):
    """Hourly tumbling windows must align to UTC epoch hours regardless
    of session timezone (the oracle computes date_trunc on the naive
    wall clock)."""
    from lance_flink_spark.registry import table
    from lance_flink_spark.streaming.windows import tumbling_agg

    out = tumbling_agg(table(spark, ntz_sf_dir, "events"), window="1 hour")
    starts = sorted(r[0] for r in out.select("window_start_s").distinct().collect())
    epoch_2024 = 1704067200  # 2024-01-01T00:00:00Z
    assert starts[0] == epoch_2024
    assert all((s - epoch_2024) % 3600 == 0 for s in starts)


def test_ntz_mapping_is_session_tz_independent(spark, ntz_sf_dir):
    """The ADVICE-flagged bug: to_utc_timestamp(ntz,'UTC') casts NTZ
    through the SESSION timezone first, so under America/New_York the
    wall clock 2024-01-01T00:00 landed on epoch 1704085200 (the EST
    instant) instead of 1704067200 (the UTC instant). registry.ntz_as_utc
    must produce the UTC instant under ANY session timezone."""
    from pyspark.sql import functions as F

    from lance_flink_spark.registry import table

    utc_epoch = 1704067200  # 2024-01-01T00:00:00Z
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            df = table(spark, ntz_sf_dir, "events")
            first = (
                df.orderBy("event_id")
                .select(F.unix_timestamp("ts").alias("epoch"))
                .first()[0]
            )
            assert first == utc_epoch, f"session tz {tz}: epoch {first}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
