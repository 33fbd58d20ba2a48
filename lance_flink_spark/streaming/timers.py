"""Per-key event-time timers — Flink KeyedProcessFunction + onTimer
parity via ``applyInPandasWithState`` with ``EventTimeTimeout``.

``streaming/stateful.py`` covers running per-key state; Flink jobs
lean on one more primitive: TIMERS — "call me back when the event-time
clock passes T for this key", decoupled from new input arriving.
Structured Streaming exposes exactly one event-time timer per key
(``GroupState.setTimeoutTimestamp`` + ``hasTimedOut``), which is all
session closure needs — the same single re-armed timer a Flink
session operator keeps.

The canonical use native ``session_window`` cannot express: sessions
closed by an inactivity gap AND capped at a maximum duration (a bot
pinging every minute keeps a gap-only session open — and its state
alive — forever):

- per-key state holds (start, last, n, value-sum),
- each batch folds its events in event-time order; an event that
  would stretch the session past ``max_duration_ms`` CLOSES the
  current session inline and starts a fresh one (the cap),
- the timeout timestamp is re-armed to ``last + gap_ms``; when the
  watermark passes it with no newer event, the function is invoked
  with ``hasTimedOut`` and emits the gap-closed session — Flink's
  onTimer, exactly.

State is one fixed-width tuple per ACTIVE key; closed keys clear
state, so state size tracks live sessions, not stream history.

(Spark 4's richer transformWithStateInPandas — many named timers,
state TTL — is the natural upgrade path, but its Python runner needs
protobuf, absent in this container; the single-timer formulation
needs nothing beyond Arrow and covers the session pattern.)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id bigint, session_start bigint, session_end bigint, "
    "n_events bigint, value_sum double, close_reason string"
)
STATE_SCHEMA = "start bigint, last bigint, n bigint, vsum double"


def _session_fn(gap_ms: int, max_ms: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key

        def row(start, last, n, vsum, reason):
            return pd.DataFrame(
                {
                    "user_id": [int(k)],
                    "session_start": [int(start)],
                    "session_end": [int(last)],
                    "n_events": [int(n)],
                    "value_sum": [float(vsum)],
                    "close_reason": [reason],
                }
            )

        if state.hasTimedOut:
            # onTimer: the watermark passed last + gap with no newer
            # event — close the open session and drop the key's state
            start, last, n, vsum = state.get
            state.remove()
            yield row(start, last, n, vsum, "gap")
            return

        events = pd.concat(list(pdfs), ignore_index=True)
        # event-time order makes the fold deterministic per batch
        events = events.sort_values(["ts_ms", "value"], ignore_index=True)
        cur = state.get if state.exists else None
        for ts, v in zip(events["ts_ms"], events["value"]):
            ts = int(ts)
            if cur is None:
                cur = (ts, ts, 1, float(v))
                continue
            start, last, n, vsum = cur
            if ts - last >= gap_ms:
                # the gap elapsed BEFORE this event: Spark invokes the
                # timeout only for keys with no batch data, so a
                # session whose closing silence ends with a new event
                # closes inline — same observable sessions as Flink,
                # just via the input path instead of onTimer
                yield row(start, last, n, vsum, "gap")
                cur = (ts, ts, 1, float(v))
            elif ts - start >= max_ms:
                # duration cap: close [start, last]; this event opens anew
                yield row(start, last, n, vsum, "max_duration")
                cur = (ts, ts, 1, float(v))
            else:
                cur = (start, max(last, ts), n + 1, vsum + float(v))
        state.update(cur)
        # re-arm the single event-time timer at last + gap
        state.setTimeoutTimestamp(cur[1] + gap_ms)

    return fn


def capped_sessions(
    sdf: DataFrame,
    gap_ms: int,
    max_duration_ms: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Sessionize a watermarked stream by inactivity gap AND maximum
    duration. Emits one append-mode row per CLOSED session with the
    close reason (``gap`` from the fired timer, ``max_duration`` from
    the inline cap). Sessions still open when the stream ends stay
    unemitted — the same contract as Flink without a final watermark."""
    from pyspark.sql import functions as F

    from lance_flink_spark.session import ship_package

    ship_package(sdf.sparkSession)
    prepared = sdf.select(
        F.col(key_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.unix_millis(F.col(ts_col)).alias("ts_ms"),
        F.col(value_col).cast("double").alias("value"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_fn(int(gap_ms), int(max_duration_ms)),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
