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


def _update_shard_state(
    shard: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Sharded twin of :func:`_update_user_state` (r16 — the r15
    sharded-grouping economics): one state row (pickled {user: (n,
    sum)} map) and ONE Python invocation per shard. Only users with
    arrivals this batch are touched and emitted — exactly the per-key
    path's update-mode behavior — and the per-batch groupby computes
    each user's counts/sums/last_ts vectorized instead of per group."""
    import pickle

    counters = pickle.loads(state.get[0]) if state.exists else {}
    frames = [pdf for pdf in pdfs if len(pdf)]
    if not frames:
        return
    allpdf = pd.concat(frames) if len(frames) > 1 else frames[0]
    agg = allpdf.groupby("user_id", sort=False).agg(
        n=("value", "size"), s=("value", "sum"), m=("ts", "max")
    )
    users, ns, sums, lasts = [], [], [], []
    for uid, row in agg.iterrows():
        n0, s0 = counters.get(uid, (0, 0.0))
        n, s = n0 + int(row["n"]), s0 + float(row["s"])
        counters[uid] = (n, s)
        users.append(uid); ns.append(n); sums.append(s)
        lasts.append(row["m"])
    state.update((pickle.dumps(counters, protocol=4),))
    yield pd.DataFrame(
        {
            "user_id": users, "n_events": ns, "sum_value": sums,
            "last_ts": lasts,
        }
    )


def running_user_counters(
    events: DataFrame, key_shards: int | None = None
) -> DataFrame:
    """Per-user running counters over a stream (grouped map with state).
    ``events`` must be a streaming DataFrame with user_id/ts/value.
    ``key_shards=N`` groups by ``pmod(xxhash64(user_id), N)`` — one
    Python/state round per shard instead of per user (the r15
    sharded-grouping pattern; per-key semantics preserved exactly)."""
    from lance_flink_spark.session import ship_package

    ship_package(events.sparkSession)
    if key_shards:
        from pyspark.sql import functions as F

        sharded = events.withColumn(
            "__s", F.pmod(F.xxhash64("user_id"), F.lit(int(key_shards)))
        )
        return sharded.groupBy("__s").applyInPandasWithState(
            _update_shard_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType="blob binary",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
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
