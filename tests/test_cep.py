"""CEP match_sequence (operators/cep.py) and changelog deduplication
(operators/changelog.py): semantics pinned on hand-built event logs."""

import datetime as dt

import pytest
from pyspark.sql import Row

from lance_flink_spark.operators.cep import match_sequence
from lance_flink_spark.operators.changelog import earliest_by_key, latest_by_key

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=T0 + dt.timedelta(minutes=m),
                user_id=u,
                event_type=t,
            )
            for i, (u, m, t) in enumerate(rows)
        ]
    )


def test_greedy_binding_earliest_steps(spark):
    """A view binds the EARLIEST following click, then the earliest
    purchase after THAT click — not any other combination."""
    e = _ev(
        spark,
        [
            (1, 0, "view"),
            (1, 10, "click"),   # bound
            (1, 20, "click"),   # ignored (greedy takes minute 10)
            (1, 30, "purchase"),
            (1, 40, "purchase"),  # ignored
        ],
    )
    out = match_sequence(e, ["view", "click", "purchase"], within="1 hour").collect()
    assert len(out) == 1
    m = out[0]
    assert (m["t1_us"] - m["t0_us"]) == 10 * 60 * 1_000_000
    assert (m["t2_us"] - m["t0_us"]) == 30 * 60 * 1_000_000
    assert m["duration_us"] == 30 * 60 * 1_000_000


def test_no_backtracking_documented_semantics(spark):
    """Greedy means NO backtracking: if the earliest click's purchase
    falls outside the window, the match fails even though a later
    click would have completed in time."""
    e = _ev(
        spark,
        [
            (1, 0, "view"),
            (1, 5, "click"),
            (1, 200, "purchase"),  # > 1h after the view
        ],
    )
    assert match_sequence(e, ["view", "click", "purchase"], within="1 hour").count() == 0
    # ...and succeeds once the window allows it
    assert (
        match_sequence(e, ["view", "click", "purchase"], within="4 hours").count() == 1
    )


def test_every_step1_event_can_match(spark):
    """SKIP TO NEXT ROW: each view emits its own match; bound events
    may be shared between matches."""
    e = _ev(
        spark,
        [
            (1, 0, "view"),
            (1, 1, "view"),
            (1, 10, "click"),
            (1, 20, "purchase"),
        ],
    )
    out = match_sequence(e, ["view", "click", "purchase"], within="1 hour").collect()
    assert len(out) == 2
    assert sorted(r["start_event_id"] for r in out) == [0, 1]


def test_order_must_be_strict_and_keys_isolate(spark):
    e = _ev(
        spark,
        [
            (1, 0, "click"),      # before the view: must not bind
            (1, 5, "view"),
            (2, 6, "click"),      # other user: must not bind
            (2, 7, "purchase"),
            (1, 10, "click"),
            (1, 20, "purchase"),
        ],
    )
    out = match_sequence(e, ["view", "click", "purchase"], within="1 hour").collect()
    assert len(out) == 1
    assert out[0]["user_id"] == 1
    assert (out[0]["t1_us"] - out[0]["t0_us"]) == 5 * 60 * 1_000_000


def test_two_step_and_four_step_patterns(spark):
    e = _ev(
        spark,
        [
            (1, 0, "signup"),
            (1, 1, "view"),
            (1, 2, "click"),
            (1, 3, "purchase"),
        ],
    )
    assert match_sequence(e, ["signup", "view"], within="1 hour").count() == 1
    four = match_sequence(
        e, ["signup", "view", "click", "purchase"], within="1 hour"
    ).collect()
    assert len(four) == 1
    assert four[0]["t3_us"] - four[0]["t0_us"] == 3 * 60 * 1_000_000


def test_latest_and_earliest_by_key(spark):
    df = spark.createDataFrame(
        [
            Row(k="a", ts=3, id=1, v="a3"),
            Row(k="a", ts=7, id=2, v="a7"),
            Row(k="a", ts=7, id=5, v="a7b"),  # tie on ts: higher id wins latest
            Row(k="b", ts=1, id=3, v="b1"),
        ]
    )
    latest = {r["k"]: r["v"] for r in latest_by_key(df, ["k"], "ts", "id").collect()}
    assert latest == {"a": "a7b", "b": "b1"}
    first = {r["k"]: r["v"] for r in earliest_by_key(df, ["k"], "ts", "id").collect()}
    assert first == {"a": "a3", "b": "b1"}


def test_latest_by_key_plan_is_partitioned(spark):
    """The dedup window partitions by key — no single-partition sort."""
    df = spark.range(100).selectExpr("id % 7 AS k", "id AS ts", "id AS tb")
    plan = (
        latest_by_key(df, ["k"], "ts", "tb")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan


def _stream_cep(spark, src, tmp, steps=("view", "click", "purchase"), within="1 hour"):
    from lance_flink_spark.streaming.cep import stream_match_sequence

    sdf = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
        .withWatermark("ts", "1 minute")
    )
    out = stream_match_sequence(sdf, list(steps), within=within)
    q = (
        out.writeStream.format("memory")
        .queryName("cepq")
        .outputMode("append")
        .option("checkpointLocation", tmp + "/ckpt_cep")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("cepq").collect()


def test_streaming_match_across_micro_batches(spark, tmp_path_str):
    """A chain whose steps arrive in DIFFERENT micro-batches completes
    from buffered state; each match emits exactly once."""
    import os

    from pyspark.sql import Row

    src = tmp_path_str + "/src"
    os.makedirs(src)

    def batch(i, rows):
        spark.createDataFrame(
            [
                Row(event_id=e, ts=T0 + dt.timedelta(minutes=m), user_id=u, event_type=t)
                for e, (u, m, t) in enumerate(rows, start=i * 100)
            ]
        ).coalesce(1).write.parquet(f"{src}/b{i}")

    batch(0, [(1, 0, "view"), (1, 5, "click")])
    batch(1, [(1, 10, "purchase"), (2, 11, "view")])
    batch(2, [(2, 12, "click"), (2, 13, "purchase")])

    rows = _stream_cep(spark, src, tmp_path_str)
    got = sorted((r["user_id"], r["duration_us"]) for r in rows)
    assert got == [(1, 10 * 60 * 1_000_000), (2, 2 * 60 * 1_000_000)]


def test_streaming_match_equals_batch_on_same_data(spark, tmp_path_str):
    """Unified-engine pin on random-ish data: the streamed match set
    equals the batch operator's."""
    import os
    import random

    from pyspark.sql import Row

    rng = random.Random(3)
    rows = [
        (e, rng.randrange(1, 5), rng.randrange(0, 300),
         rng.choice(["view", "click", "purchase", "error"]))
        for e in range(120)
    ]
    df_rows = [
        Row(event_id=e, ts=T0 + dt.timedelta(minutes=m), user_id=u, event_type=t)
        for e, u, m, t in rows
    ]
    # contiguous event-time batches: the stream==batch equality holds
    # for input ordered within the watermark (the documented Flink-CEP
    # allowed-lateness contract); arbitrarily late events may bind
    # differently, exactly as in Flink
    df_rows.sort(key=lambda r: r.ts)
    src = tmp_path_str + "/src"
    os.makedirs(src)
    for i in range(3):  # three files → three micro-batches
        spark.createDataFrame(df_rows[i * 40 : (i + 1) * 40]).coalesce(1).write.parquet(
            f"{src}/b{i}"
        )

    got = {
        (r["user_id"], r["start_event_id"], r["t2_us"])
        for r in _stream_cep(spark, src, tmp_path_str, within="2 hours")
    }
    batch_df = spark.createDataFrame(df_rows)
    want = {
        (r["user_id"], r["start_event_id"], r["t2_us"])
        for r in match_sequence(
            batch_df, ["view", "click", "purchase"], within="2 hours"
        ).collect()
    }
    assert got == want


def test_match_absence_not_followed_by(spark):
    """notFollowedBy: a view with no purchase within the window
    matches; one WITH a purchase doesn't; other users don't count."""
    from lance_flink_spark.operators.cep import match_absence

    e = _ev(
        spark,
        [
            (1, 0, "view"),       # purchase at +30min -> NOT abandoned
            (1, 30, "purchase"),
            (1, 100, "view"),     # next purchase at +200 -> abandoned (1h window)
            (1, 300, "purchase"),
            (2, 0, "view"),       # user 2 never purchases -> abandoned
        ],
    )
    out = match_absence(e, "view", "purchase", within="1 hour").collect()
    got = sorted((r["user_id"], r["start_event_id"]) for r in out)
    assert got == [(1, 2), (2, 4)]


def test_streaming_absence_timer_semantics(spark, tmp_path_str):
    """Streaming notFollowedBy: an abandonment is declared only when
    the WATERMARK passes first + within; a qualifying absent-event
    arrival cancels the pending; sentinel events push the watermark to
    fire the timers (the test_timers pattern)."""
    import os

    from lance_flink_spark.streaming.cep import stream_match_absence

    src = tmp_path_str + "/src"
    os.makedirs(src)

    def batch(i, rows):
        spark.createDataFrame(
            [
                Row(event_id=e, ts=T0 + dt.timedelta(minutes=m), user_id=u, event_type=t)
                for e, (u, m, t) in enumerate(rows, start=i * 100)
            ]
        ).coalesce(1).write.parquet(f"{src}/b{i}")

    # user 1: view at 0, purchase at 10 -> resolved (no abandonment)
    # user 2: view at 0, nothing -> abandoned once watermark passes 60
    # user 3: view at 5, purchase at 200 (outside 1h) -> abandoned
    batch(0, [(1, 0, "view"), (2, 0, "view"), (3, 5, "view")])
    batch(1, [(1, 10, "purchase")])
    batch(2, [(3, 200, "purchase"), (99, 300, "error")])  # pushes watermark
    batch(3, [(98, 400, "error")])  # second push so timers fire

    sdf = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
        .withWatermark("ts", "1 minute")
    )
    out = stream_match_absence(sdf, "view", "purchase", within="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("absq")
        .outputMode("append")
        .option("checkpointLocation", tmp_path_str + "/ckpt_abs")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("absq").collect()
    got = sorted((r["user_id"], r["start_event_id"]) for r in rows)
    assert got == [(2, 1), (3, 2)]


def test_streaming_absence_state_survives_restart(spark, tmp_path_str):
    """A pending first-event RECOVERS from the checkpoint: a second
    run's absent-arrival cancels it (no abandonment emitted), and a
    different key's pending times out after the restart."""
    import os

    src = tmp_path_str + "/src_abs"
    os.makedirs(src)
    sink = tmp_path_str + "/sink_abs"

    from lance_flink_spark.streaming.cep import stream_match_absence

    def run():
        sdf = (
            spark.readStream.schema(
                "event_id bigint, ts timestamp, user_id bigint, event_type string"
            )
            .parquet(src + "/*")
            .withWatermark("ts", "1 minute")
        )
        out = stream_match_absence(sdf, "view", "purchase", within="1 hour")
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", tmp_path_str + "/ckpt_abs2")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        try:
            return spark.read.parquet(sink).collect()
        except Exception:
            return []

    def batch(i, rows):
        spark.createDataFrame(
            [
                Row(event_id=e, ts=T0 + dt.timedelta(minutes=m), user_id=u, event_type=t)
                for e, (u, m, t) in enumerate(rows, start=i * 100)
            ]
        ).coalesce(1).write.parquet(f"{src}/b{i}")

    batch(0, [(1, 0, "view"), (2, 0, "view")])
    assert run() == []  # both pending, nothing expired yet

    # SECOND process run: user 1's purchase (in-window) cancels its
    # recovered pending; the sentinel pushes the watermark past user
    # 2's deadline so only user 2 is abandoned
    batch(1, [(1, 30, "purchase"), (99, 120, "error")])
    batch(2, [(98, 150, "error")])
    rows = run()
    got = sorted((r["user_id"], r["start_event_id"]) for r in rows)
    assert got == [(2, 1)]


def test_streaming_absence_out_of_order_first_is_cancelled(spark, tmp_path_str):
    """A first event landing in a LATER micro-batch than its cancelling
    absent event (out-of-order but watermark-legal) must still be
    cancelled — the absent buffer in state exists for exactly this."""
    import os

    from lance_flink_spark.streaming.cep import stream_match_absence

    src = tmp_path_str + "/src_ooo"
    os.makedirs(src)

    def batch(i, rows):
        spark.createDataFrame(
            [
                Row(event_id=e, ts=T0 + dt.timedelta(minutes=m), user_id=u, event_type=t)
                for e, (u, m, t) in enumerate(rows, start=i * 100)
            ]
        ).coalesce(1).write.parquet(f"{src}/b{i}")

    # user 7's purchase (t=30) is INGESTED before its view (t=10):
    # batch 0 carries the purchase, batch 1 the view. Watermark delay
    # (2h) keeps the view legal. A second user (8) views and never
    # purchases -> the one true abandonment.
    batch(0, [(7, 30, "purchase"), (8, 0, "view")])
    batch(1, [(7, 10, "view")])
    batch(2, [(99, 300, "error")])  # push watermark past deadlines
    batch(3, [(98, 500, "error")])  # second push so timers fire

    sdf = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
        .withWatermark("ts", "2 hours")
    )
    out = stream_match_absence(sdf, "view", "purchase", within="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("absq_ooo")
        .outputMode("append")
        .option("checkpointLocation", tmp_path_str + "/ckpt_abs_ooo")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"] for r in spark.sql("SELECT * FROM absq_ooo").collect()
    }
    assert got == {8}  # user 7 resolved by the buffered absent


@pytest.mark.parametrize(
    "lateness,expect_match", [("3 hours", True), ("1 minute", False)]
)
def test_streaming_match_allowed_lateness_knob(
    spark, tmp_path_str, lateness, expect_match
):
    """The explicit allowed_lateness knob: an out-of-order step event
    binds into a chain iff it arrives within the lateness window of
    the key's max event time — beyond it, the chain partners were
    evicted (Flink's dropped-as-late contract)."""
    import os

    from pyspark.sql import Row

    from lance_flink_spark.streaming.cep import stream_match_sequence

    tag = lateness.replace(" ", "")
    src = tmp_path_str + f"/src_{tag}"
    os.makedirs(src)

    def batch(i, rows):
        spark.createDataFrame(
            [
                Row(event_id=e, ts=T0 + dt.timedelta(minutes=m), user_id=u, event_type=t)
                for e, (u, m, t) in enumerate(rows, start=i * 100)
            ]
        ).coalesce(1).write.parquet(f"{src}/b{i}")

    # view at t=0; an unrelated event at t=120min advances user 1's max
    # event time (buffer eviction horizon); the matching click at t=5
    # arrives only afterwards, 115min out of order
    batch(0, [(1, 0, "view")])
    batch(1, [(1, 120, "error")])
    batch(2, [(1, 5, "click")])

    sdf = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
        .withWatermark("ts", "3 hours")
    )
    out = stream_match_sequence(
        sdf, ["view", "click"], within="10 minutes", allowed_lateness=lateness
    )
    q = (
        out.writeStream.format("memory")
        .queryName(f"cep_late_{tag}")
        .outputMode("append")
        .option("checkpointLocation", tmp_path_str + f"/ckpt_{tag}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(f"cep_late_{tag}").collect()
    assert bool(rows) == expect_match


class TestMatchRecognizeSQL:
    """MATCH_RECOGNIZE SQL surface (sources/ddl.py) lowering onto
    match_sequence — the statement must reproduce the operator's
    oracle-gated output exactly (events_match_sequence's semantics)."""

    MR = """SELECT * FROM mr_events MATCH_RECOGNIZE (
              PARTITION BY user_id
              ORDER BY ts
              {measures}
              ONE ROW PER MATCH
              AFTER MATCH SKIP TO NEXT ROW
              PATTERN (A B C) WITHIN INTERVAL '24' HOUR
              DEFINE
                A AS A.event_type = 'view',
                B AS B.event_type = 'click',
                C AS C.event_type = 'purchase'
            )"""

    @pytest.fixture(scope="class")
    def mr_engine(self, spark, tmp_path_factory):
        from lance_flink_spark.registry import table
        from lance_flink_spark.sources.catalog import Catalog
        from lance_flink_spark.sources.ddl import SqlEngine

        table(spark, "/root/testdata/sf0.001", "events").createOrReplaceTempView(
            "mr_events"
        )
        return SqlEngine(spark, Catalog(str(tmp_path_factory.mktemp("mrcat"))))

    def test_full_output_matches_operator(self, mr_engine, spark):
        got = mr_engine.execute(self.MR.format(measures="")).collect()
        want = match_sequence(
            spark.table("mr_events"),
            ["view", "click", "purchase"],
            within="24 hours",
        ).collect()
        key = lambda r: (r["user_id"], r["start_event_id"])  # noqa: E731
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))
        assert len(want) > 0  # non-vacuous at sf0.001

    def test_measures_project_and_alias(self, mr_engine, spark):
        sql = self.MR.format(
            measures="""MEASURES
                A.event_id AS start_id,
                A.ts AS view_us,
                C.ts AS purchase_us"""
        )
        got = mr_engine.execute(sql)
        assert got.columns == ["user_id", "start_id", "view_us", "purchase_us"]
        want = match_sequence(
            spark.table("mr_events"), ["view", "click", "purchase"], within="24 hours"
        ).select("user_id", "start_event_id", "t0_us", "t2_us").collect()
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want))

    def test_unsupported_shapes_raise(self, mr_engine):
        with pytest.raises(ValueError, match="DEFINE"):
            mr_engine.execute(
                self.MR.format(measures="").replace(
                    "A.event_type = 'view'", "A.value > 3"
                )
            )
        with pytest.raises(ValueError, match="without DEFINE"):
            mr_engine.execute(
                self.MR.format(measures="").replace("PATTERN (A B C)", "PATTERN (A B C D)")
            )


class TestMatchPatternQuantified:
    """Quantified MATCH_RECOGNIZE — the SQL-STANDARD strict-contiguity
    dialect (operators/cep.py::match_pattern, round 13): greedy +/*,
    AFTER MATCH SKIP PAST LAST ROW, ALL ROWS PER MATCH, loud refusals
    for ambiguous shapes. Corpus-scale hash gate:
    events_match_quantified."""

    @pytest.fixture(scope="class")
    def quant_df(self, spark):
        import datetime

        def T(m):
            return datetime.datetime(2024, 1, 1, 0, m)

        rows = [
            # user 1: V V C P — view+ click purchase matches all 4 rows
            (1, 1, T(0), "view"), (1, 2, T(1), "view"),
            (1, 3, T(2), "click"), (1, 4, T(3), "purchase"),
            # user 2: V C C P — middle single click needs run len 1: NO
            (2, 5, T(0), "view"), (2, 6, T(1), "click"),
            (2, 7, T(2), "click"), (2, 8, T(3), "purchase"),
            # user 3: V [error] C P — strict contiguity broken: NO
            (3, 9, T(0), "view"), (3, 10, T(1), "error"),
            (3, 11, T(2), "click"), (3, 12, T(3), "purchase"),
            # user 4: V C P V C P — two matches (skip past last row)
            (4, 13, T(0), "view"), (4, 14, T(1), "click"),
            (4, 15, T(2), "purchase"), (4, 16, T(10), "view"),
            (4, 17, T(11), "click"), (4, 18, T(12), "purchase"),
        ]
        return spark.createDataFrame(
            [
                {"user_id": u, "event_id": i, "ts": t, "event_type": e}
                for u, i, t, e in rows
            ]
        )

    def test_greedy_plus_strict_contiguity_skip_past(self, quant_df):
        from lance_flink_spark.operators.cep import match_pattern

        got = (
            match_pattern(quant_df, ["view+", "click", "purchase"])
            .orderBy("start_event_id")
            .collect()
        )
        assert [(r["start_event_id"], r["n_rows"]) for r in got] == [
            (1, 4), (13, 3), (16, 3),
        ]
        assert got[0]["duration_us"] == 3 * 60_000_000

    def test_star_elision_alternative(self, quant_df):
        from lance_flink_spark.operators.cep import match_pattern

        got = (
            match_pattern(quant_df, ["view+", "click*", "purchase"])
            .orderBy("start_event_id")
            .collect()
        )
        # click* present (as +) admits user 2's double-click run too
        assert [r["start_event_id"] for r in got] == [1, 5, 13, 16]
        assert [r["n_rows"] for r in got] == [4, 4, 3, 3]

    def test_leading_single_anchors_at_run_end(self, quant_df):
        from lance_flink_spark.operators.cep import match_pattern

        got = (
            match_pattern(quant_df, ["click", "purchase"])
            .orderBy("start_event_id")
            .collect()
        )
        # user 2's C C P: only the SECOND click can start a strict match
        assert [(r["start_event_id"], r["n_rows"]) for r in got] == [
            (3, 2), (7, 2), (11, 2), (14, 2), (17, 2),
        ]

    def test_all_rows_per_match(self, quant_df):
        from lance_flink_spark.operators.cep import match_pattern

        got = (
            match_pattern(
                quant_df, ["view+", "click", "purchase"], rows_per_match="all"
            )
            .orderBy("row_id")
            .collect()
        )
        assert [r["row_id"] for r in got] == [1, 2, 3, 4, 13, 14, 15, 16, 17, 18]
        assert [r["var"] for r in got[:4]] == ["view", "view", "click", "purchase"]
        assert {r["match_start_id"] for r in got} == {1, 13, 16}

    def test_repeated_literal_non_overlapping_ok(self, quant_df, spark):
        import datetime

        from lance_flink_spark.operators.cep import match_pattern

        def T(m):
            return datetime.datetime(2024, 1, 1, 0, m)

        df = spark.createDataFrame(
            [
                {"user_id": 9, "event_id": 90 + i, "ts": T(i), "event_type": e}
                for i, e in enumerate(["view", "click", "view", "purchase"])
            ]
        )
        got = match_pattern(df, ["view", "click", "view", "purchase"]).collect()
        assert [(r["start_event_id"], r["n_rows"]) for r in got] == [(90, 4)]

    def test_ambiguous_shapes_refuse(self, quant_df):
        from lance_flink_spark.operators.cep import match_pattern

        with pytest.raises(ValueError, match="self-overlapping"):
            match_pattern(quant_df, ["view", "click", "view"])
        with pytest.raises(ValueError, match="adjacent pattern elements"):
            match_pattern(quant_df, ["view", "click*", "view"])
        with pytest.raises(ValueError, match="at most 3"):
            match_pattern(
                quant_df, ["view*", "click*", "purchase*", "error*", "signup"]
            )

    def test_sql_surface_quantified(self, quant_df, spark, tmp_path_str):
        from lance_flink_spark.operators.cep import match_pattern
        from lance_flink_spark.sources.catalog import Catalog
        from lance_flink_spark.sources.ddl import SqlEngine

        quant_df.createOrReplaceTempView("mrq_events")
        eng = SqlEngine(spark, Catalog(tmp_path_str + "/mrq"))
        sql = """SELECT * FROM mrq_events MATCH_RECOGNIZE (
                   PARTITION BY user_id
                   ORDER BY ts
                   {rows}
                   AFTER MATCH SKIP PAST LAST ROW
                   PATTERN (A+ B C) WITHIN INTERVAL '24' HOUR
                   DEFINE
                     A AS A.event_type = 'view',
                     B AS B.event_type = 'click',
                     C AS C.event_type = 'purchase'
                 )"""
        got = eng.execute(sql.format(rows="ONE ROW PER MATCH")).collect()
        want = match_pattern(
            quant_df, ["view+", "click", "purchase"], within="24 hours"
        ).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))
        all_rows = eng.execute(sql.format(rows="ALL ROWS PER MATCH")).collect()
        assert len(all_rows) == 10 and "var" in all_rows[0].asDict()
        # quantifiers demand the PAST LAST ROW skip policy
        with pytest.raises(ValueError, match="SKIP PAST LAST ROW"):
            eng.execute(
                sql.format(rows="ONE ROW PER MATCH").replace(
                    "SKIP PAST LAST ROW", "SKIP TO NEXT ROW"
                )
            )


class TestStreamMatchPattern:
    """Quantified strict-contiguity MATCH_RECOGNIZE on a STREAM
    (streaming/cep.py::stream_match_pattern): cross-micro-batch
    buffering, watermark-settled emission, within-timeout flush of
    greedy trailing quantifiers. Corpus-scale hash gate:
    streaming_match_quantified."""

    def _drain(
        self, spark, tmp_path_str, batches, pattern, within="1 hour",
        key_shards=None, sub="smp_src", with_key=False,
    ):
        import os
        import time

        from lance_flink_spark.streaming.cep import stream_match_pattern
        from lance_flink_spark.streaming.pipeline import run_to_memory

        src = os.path.join(tmp_path_str, sub)
        os.makedirs(src, exist_ok=True)
        schema = "user_id long, event_id long, ts timestamp, event_type string"
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
        out = stream_match_pattern(
            sdf, pattern, within=within, key_shards=key_shards
        )
        t = run_to_memory(out, mode="append", state_partitions=4)
        rows = spark.sql(f"SELECT * FROM {t}").collect()
        if with_key:
            return sorted(
                (
                    (r["user_id"] is None, r["user_id"]),
                    r["start_event_id"], r["n_rows"],
                    r["t_last_us"] - r["t0_us"],
                )
                for r in rows
            )
        return sorted(
            (r["start_event_id"], r["n_rows"], r["t_last_us"] - r["t0_us"])
            for r in rows
        )

    def test_match_spans_micro_batches(self, spark, tmp_path_str):
        import datetime

        def T(m):
            return datetime.datetime(2024, 1, 1, 0, m)

        rows = lambda *specs: [  # noqa: E731
            {"user_id": 1, "event_id": i, "ts": T(m), "event_type": e}
            for i, m, e in specs
        ]
        got = self._drain(
            spark,
            tmp_path_str,
            [
                rows((1, 0, "view"), (2, 1, "view")),
                rows((3, 2, "click"), (4, 3, "purchase")),
                # second chain + a run-breaking error in the middle
                rows((5, 10, "view"), (6, 11, "error")),
                rows((7, 12, "view"), (8, 13, "click"), (9, 14, "purchase")),
            ],
            ["view+", "click", "purchase"],
        )
        # chain 1: view view click purchase (rows 1-4); the error at 11
        # breaks row 5's run, so chain 2 anchors at row 7
        assert got == [(1, 4, 3 * 60_000_000), (7, 3, 2 * 60_000_000)]

    def test_trailing_quantifier_refused_on_streams(self, spark, tmp_path_str):
        """PATTERN (click view+): a trailing greedy quantifier is
        undecidable on an unbounded stream under the batch dialect's
        whole-run semantics (a future row can always extend the final
        run and flip WITHIN) — the streaming operator refuses loudly
        instead of emitting provisional matches."""
        from lance_flink_spark.streaming.cep import stream_match_pattern

        sdf = (
            spark.readStream.schema(
                "user_id long, event_id long, ts timestamp, event_type string"
            ).parquet(tmp_path_str + "/never/*")
        )
        with pytest.raises(ValueError, match="trailing quantified"):
            stream_match_pattern(sdf, ["click", "view+"])
        with pytest.raises(ValueError, match="trailing quantified"):
            stream_match_pattern(sdf, ["click", "view*"])

    def test_within_timeout_fails_blocked_anchor_definitively(
        self, spark, tmp_path_str
    ):
        """A mid-pattern anchor blocked at the settled boundary (its
        leading run still open, no continuation ever arriving)
        resolves as a definitive FAIL once the watermark passes
        t0+within — no provisional emission, no stuck state — while an
        unrelated key's complete in-window chain still matches. Also
        pins the dialect: runs are ADJACENCY-based (the error row is
        what closes user 3's first view-run; a bare time gap would
        not), and WITHIN is an end-check on the bound match."""
        import datetime

        def T(m):
            return datetime.datetime(2024, 1, 1, 0, m)

        def mk(u, i, m, e):
            return {"user_id": u, "event_id": i, "ts": T(m), "event_type": e}

        batches = [
            # user 1: a lone view whose chain never completes
            [mk(1, 1, 0, "view")],
            # user 3: view run CLOSED by an error, then a full chain
            [mk(3, 2, 0, "view"), mk(3, 3, 5, "error"),
             mk(3, 4, 30, "view"), mk(3, 5, 31, "click"),
             mk(3, 6, 32, "purchase")],
            # wm mover
            [mk(2, 99, 59, "error")],
        ]
        got = self._drain(
            spark, tmp_path_str, batches, ["view+", "click", "purchase"],
            within="10 minutes",
        )
        # user 1 resolves to NO match via the within-timeout; user 3's
        # first view-run fails at the error and the second chain wins
        assert got == [(4, 3, 2 * 60_000_000)]

    def test_gap_does_not_break_a_run_within_end_check(
        self, spark, tmp_path_str
    ):
        """Dialect pin (same as the batch operator): two views 30 min
        apart with nothing between them are ONE run — the greedy +
        consumes both, the WITHIN end-check fails, and no suffix
        anchor is retried (quantified elements anchor at run starts).
        Flink's NFA-with-pruning would emit the suffix match; this
        repo's documented dialect does not, in batch AND streaming."""
        import datetime

        from lance_flink_spark.operators.cep import match_pattern

        def T(m):
            return datetime.datetime(2024, 1, 1, 0, m)

        rows = [
            {"user_id": 1, "event_id": 1, "ts": T(0), "event_type": "view"},
            {"user_id": 1, "event_id": 2, "ts": T(30), "event_type": "view"},
            {"user_id": 1, "event_id": 3, "ts": T(31), "event_type": "click"},
            {"user_id": 1, "event_id": 4, "ts": T(32), "event_type": "purchase"},
            {"user_id": 2, "event_id": 99, "ts": T(59), "event_type": "error"},
        ]
        got = self._drain(
            spark, tmp_path_str, [rows[:2], rows[2:]],
            ["view+", "click", "purchase"], within="10 minutes",
        )
        assert got == []
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp, event_type string"
        )
        assert (
            match_pattern(
                df, ["view+", "click", "purchase"], within="10 minutes"
            ).count()
            == 0
        )

    def test_skip_past_last_row_across_batches(self, spark, tmp_path_str):
        """Back-to-back chains in separate batches each emit once, and
        a consumed row can never re-enter a later match."""
        import datetime

        def T(m):
            return datetime.datetime(2024, 1, 1, 0, m)

        mk = lambda i, m, e: {  # noqa: E731
            "user_id": 7, "event_id": i, "ts": T(m), "event_type": e,
        }
        got = self._drain(
            spark,
            tmp_path_str,
            [
                [mk(1, 0, "view"), mk(2, 1, "click")],
                [mk(3, 2, "view"), mk(4, 3, "click")],
                [mk(5, 4, "view"), mk(6, 5, "click"), mk(7, 30, "error")],
            ],
            ["view", "click"],
        )
        assert got == [(1, 2, 60_000_000), (3, 2, 60_000_000), (5, 2, 60_000_000)]

    def test_stream_equals_batch_operator(self, spark, tmp_path_str):
        """Property check at fixture scale: the streamed emitted set ==
        the batch match_pattern over the same rows."""
        import datetime
        import random

        from lance_flink_spark.operators.cep import match_pattern

        rng = random.Random(13)
        rows = []
        i = 0
        for u in range(6):
            t = 0
            for _ in range(40):
                t += rng.randint(1, 7)
                i += 1
                rows.append(
                    {
                        "user_id": u,
                        "event_id": i,
                        "ts": datetime.datetime(2024, 1, 1)
                        + datetime.timedelta(minutes=t),
                        "event_type": rng.choice(
                            ["view", "click", "purchase", "error"]
                        ),
                    }
                )
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        cut = [rows[: len(rows) // 3], rows[len(rows) // 3 : 2 * len(rows) // 3],
               rows[2 * len(rows) // 3 :]]
        got = self._drain(
            spark, tmp_path_str, cut, ["view+", "click", "purchase"],
            within="30 minutes",
        )
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp, event_type string"
        )
        want = sorted(
            (r["start_event_id"], r["n_rows"], r["duration_us"])
            for r in match_pattern(
                df, ["view+", "click", "purchase"], within="30 minutes"
            ).collect()
        )
        assert got == want and len(want) > 0


def test_match_pattern_plan_single_exchange(spark, tmp_path_str):
    """Scale pin: the ONE-ROW quantified matcher plans exactly ONE
    shuffle — the (key) hash partitioning from the row window is
    reused by the islands groupBy, the run-order window and every
    LEAD window (ClusteredDistribution satisfied by the subset
    partitioning). A second exchange appearing here means a 100 TB
    run re-shuffles the corpus."""
    import datetime

    from lance_flink_spark.operators.cep import match_pattern

    df = spark.createDataFrame(
        [
            {
                "user_id": i % 5,
                "event_id": i,
                "ts": datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i),
                "event_type": ["view", "click", "purchase"][i % 3],
            }
            for i in range(60)
        ]
    )
    plan = (
        match_pattern(df, ["view+", "click", "purchase"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastExchange" not in plan


class TestRepeatedPatternVariable:
    """ADVICE r13: a pattern variable repeated with different
    quantifiers must not collapse to a dict entry — PATTERN (A+ B A)
    is quantified and must refuse loudly (not silently fall through to
    the relaxed dialect with the '+' dropped)."""

    def test_repeated_var_with_quantifier_refuses(self, spark, tmp_path_str):
        import datetime

        from lance_flink_spark.sources.catalog import Catalog
        from lance_flink_spark.sources.ddl import SqlEngine

        def T(m):
            return datetime.datetime(2024, 1, 1, 0, m)

        spark.createDataFrame(
            [
                {"user_id": 1, "event_id": i, "ts": T(i), "event_type": e}
                for i, e in enumerate(["view", "view", "click", "view"])
            ]
        ).createOrReplaceTempView("mr_rep_events")
        eng = SqlEngine(spark, Catalog(tmp_path_str + "/mrrep"))
        sql = """SELECT * FROM mr_rep_events MATCH_RECOGNIZE (
                   PARTITION BY user_id
                   ORDER BY ts
                   {skip}
                   PATTERN (A+ B A) WITHIN INTERVAL '24' HOUR
                   DEFINE
                     A AS A.event_type = 'view',
                     B AS B.event_type = 'click'
                 )"""
        # without SKIP PAST LAST ROW: r13 silently dropped the '+' and
        # ran the relaxed dialect; now the quantifier is seen
        # per-position and the statement refuses
        with pytest.raises(ValueError, match="SKIP PAST LAST ROW"):
            eng.execute(sql.format(skip="AFTER MATCH SKIP TO NEXT ROW"))
        # with it, the strict dialect sees view+ ... view and refuses
        # the self-overlapping shape rather than mis-matching
        with pytest.raises(ValueError):
            eng.execute(sql.format(skip="AFTER MATCH SKIP PAST LAST ROW"))


class TestStreamMatchPatternSharded:
    """r16: sharded grouping for the streaming quantified matcher —
    one state row / one Python invocation per SHARD, the per-key scan
    kernel run per key inside it. The per-key path is the semantics
    reference: outputs must be IDENTICAL, including per-key horizons,
    within-timeout flushes of blocked anchors, and NULL keys."""

    def _mk(self, u, i, m, e):
        import datetime

        return {
            "user_id": u, "event_id": i,
            "ts": datetime.datetime(2024, 1, 1, 0, m), "event_type": e,
        }

    def test_sharded_equals_per_key_blocked_and_multi_key(
        self, spark, tmp_path_str
    ):
        mk = self._mk
        batches = [
            # key 1 completes a chain across batches; key 2's anchor
            # stays blocked at the settled boundary until the within
            # timer (shared shard timer must fire it); key 3 matches
            # in one batch
            [mk(1, 1, 0, "view"), mk(1, 2, 1, "view"), mk(2, 3, 2, "view")],
            [mk(1, 4, 3, "click"), mk(1, 5, 4, "purchase"),
             mk(3, 6, 5, "view"), mk(3, 7, 6, "click"),
             mk(3, 8, 7, "purchase")],
            # watermark mover (key 9 never matches)
            [mk(9, 99, 59, "error")],
        ]
        drain = TestStreamMatchPattern._drain
        per_key = drain(
            self, spark, tmp_path_str, batches,
            ["view+", "click", "purchase"], within="10 minutes",
            sub="pk", with_key=True,
        )
        sharded = drain(
            self, spark, tmp_path_str, batches,
            ["view+", "click", "purchase"], within="10 minutes",
            key_shards=1, sub="sh", with_key=True,  # max collision
        )
        assert sharded == per_key
        assert [(k[1], s) for k, s, _n, _d in sharded] == [(1, 1), (3, 6)]

    def test_sharded_null_keys_equal_per_key(self, spark, tmp_path_str):
        mk = self._mk
        batches = [
            [mk(None, 1, 0, "view"), mk(None, 2, 1, "click"),
             mk(None, 3, 2, "purchase"), mk(5, 4, 3, "view")],
            [mk(5, 5, 4, "click"), mk(5, 6, 5, "purchase")],
            [mk(9, 99, 59, "error")],
        ]
        drain = TestStreamMatchPattern._drain
        per_key = drain(
            self, spark, tmp_path_str, batches,
            ["view+", "click", "purchase"], sub="npk", with_key=True,
        )
        sharded = drain(
            self, spark, tmp_path_str, batches,
            ["view+", "click", "purchase"], key_shards=1, sub="nsh",
            with_key=True,
        )
        assert sharded == per_key
        # the NULL-key chain matched AS ONE PARTITION and emits key NULL
        assert [(k[1], s) for k, s, _n, _d in sharded] == [(5, 4), (None, 1)]
