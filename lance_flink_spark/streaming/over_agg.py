"""Streaming event-time OVER aggregation — Flink SQL's

    SUM(v) OVER (PARTITION BY k ORDER BY ts
                 RANGE BETWEEN INTERVAL '...' PRECEDING AND CURRENT ROW)

on an unbounded stream (the last uncovered Flink streaming query
shape; flink-sql-demo-style per-event running features). One output
row per input row: the key's value sum over the row's trailing
event-time range.

Flink's RowTimeRangeBoundedPrecedingFunction contract, reproduced with
``applyInPandasWithState`` + ``EventTimeTimeout``:

- Arriving rows BUFFER in per-key state; a row only emits once the
  watermark passes its event time — at that point no earlier row can
  still arrive (watermark guarantee), so its trailing frame is
  complete and the result is FINAL (append semantics, no retractions).
- Emission is driven by the data batches themselves and by event-time
  timers (``setTimeoutTimestamp`` at the earliest pending row), so
  pending rows flush when the watermark advances past them even with
  no new data for the key — including Structured Streaming's final
  no-data micro-batch.
- State per key is bounded by rate × (range + watermark delay): rows
  older than ``watermark − range`` can never enter a future frame
  (future rows have ts > watermark) and are evicted each invocation.
  The per-invocation frame sums are numpy prefix-sum lookups over the
  ts-sorted buffer — O((buffer+batch)·log buffer), no Python loop over
  frame members.

Batch dual: the window-frame queries (#77) — the driver oracle runs
the exact RANGE-frame SQL over the same rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# (ts_us, event_id, value, emitted) column-arrays — one state row
STATE_SCHEMA = (
    "ts array<long>, ids array<long>, vs array<long>, done array<boolean>"
)


def over_range_sum(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "vc",
    preceding_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """Per-row trailing-range sum over a watermarked stream. ``events``
    needs key/ts/id/value columns; ``value_col`` should be an integer
    (quantize money to cents upstream) so running sums are exact.
    Output: (key, id, ts_us, range_sum) — append mode, one FINAL row
    per input row, emitted when the watermark passes its event time."""
    from pyspark.sql import functions as F

    from lance_flink_spark.session import ship_package

    ship_package(events.sparkSession)
    rng_us = int(preceding_ms) * 1000

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ts, ids, vs, done = (
                np.asarray(c) for c in state.get
            )
            done = done.astype(bool)
        else:
            ts = np.empty(0, dtype=np.int64)
            ids = np.empty(0, dtype=np.int64)
            vs = np.empty(0, dtype=np.int64)
            done = np.empty(0, dtype=bool)
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts = np.concatenate([ts, pdf["__ts_us"].to_numpy(np.int64)])
            ids = np.concatenate([ids, pdf["__id"].to_numpy(np.int64)])
            vs = np.concatenate([vs, pdf["__v"].to_numpy(np.int64)])
            done = np.concatenate([done, np.zeros(len(pdf), dtype=bool)])
        wm_us = state.getCurrentWatermarkMs() * 1000
        order = np.argsort(ts, kind="stable")
        ts, ids, vs, done = ts[order], ids[order], vs[order], done[order]
        emit = (~done) & (ts <= wm_us)
        if emit.any():
            # trailing-range sums via one prefix-sum over the sorted
            # buffer: frame(r) = rows with ts in [r.ts − range, r.ts]
            # — complete, because every row ≤ wm has arrived
            csum = np.concatenate([[0], np.cumsum(vs)])
            hi = np.searchsorted(ts, ts[emit], side="right")
            lo = np.searchsorted(ts, ts[emit] - rng_us, side="left")
            sums = csum[hi] - csum[lo]
            out = pd.DataFrame(
                {
                    "key": key[0],
                    "event_id": ids[emit],
                    "ts_us": ts[emit],
                    "range_sum": sums,
                }
            )
            done = done | emit
        else:
            out = pd.DataFrame(
                {
                    "key": pd.Series([], dtype="int64"),
                    "event_id": pd.Series([], dtype="int64"),
                    "ts_us": pd.Series([], dtype="int64"),
                    "range_sum": pd.Series([], dtype="int64"),
                }
            )
        # evict rows no future frame can reference
        keep = ts >= wm_us - rng_us
        # pending rows must never be evicted (late watermark math aside,
        # done rows are the only safe drops below the horizon)
        keep |= ~done
        ts, ids, vs, done = ts[keep], ids[keep], vs[keep], done[keep]
        if len(ts):
            state.update(
                (ts.tolist(), ids.tolist(), vs.tolist(), done.tolist())
            )
            pending = ts[~done]
            if len(pending):
                # Spark fires an event-time timeout only when the
                # watermark advances STRICTLY beyond the timer, but a
                # row is emittable already at wm == ts — so aim the
                # timer one ms BEFORE the earliest pending row becomes
                # emittable, or the stream's FINAL watermark (== max
                # event time) would strand rows sitting exactly on it.
                # Clamped strictly ahead of the current watermark
                # (Spark rejects timers at/behind it); the clamp can
                # defer a sub-ms-boundary row by ≤2 ms of watermark
                # progress, never drop it.
                wm_ms = wm_us // 1000
                timer = (int(pending.min()) + 999) // 1000 - 1
                state.setTimeoutTimestamp(max(timer, wm_ms + 1))
        else:
            state.remove()
        yield out

    keyed = events.select(
        F.col(key_col).alias("__k"),
        F.unix_micros(F.col(ts_col)).alias("__ts_us"),
        F.col(id_col).alias("__id"),
        F.col(value_col).cast("long").alias("__v"),
        F.col(ts_col).alias(ts_col),  # watermark column must survive
    )
    out = keyed.groupBy("__k").applyInPandasWithState(
        _update,
        outputStructType="key long, event_id long, ts_us long, range_sum long",
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.withColumnRenamed("key", key_col)
