"""Streaming deduplication — Flink SQL's deduplication pattern
(ROW_NUMBER() OVER (PARTITION BY keys ORDER BY proctime) = 1 on an
unbounded stream) re-expressed with Structured Streaming's
watermark-bounded duplicate state.

State stays bounded: a key's dedup entry is dropped once the watermark
passes its event time, exactly like Flink's state-TTL'd dedup operator
— the contract is "drop duplicates arriving within the lateness
window", not "forever" (unbounded exact dedup on an infinite stream is
unbounded state in any engine; route that through batch
``exact_dedup`` over the landed Dataset instead)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_dedup(
    sdf: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Keep the first row per ``keys`` among duplicates arriving within
    the watermark window.

    ``sdf`` must already carry a watermark on ``ts_col`` (stream_events
    sets one), or pass ``watermark`` to set it here. The event-time
    column is part of the dedup state key's expiry, not of the identity:
    two rows with the same keys but different timestamps are still
    duplicates."""
    if watermark is not None:
        sdf = sdf.withWatermark(ts_col, watermark)
    return sdf.dropDuplicatesWithinWatermark(keys)


def stream_latest_by_key(
    sdf: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak_col: str,
    keep: str = "last",
    allowed_lateness: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Flink deduplication, keep-LAST mode (ORDER BY ... DESC): the
    current winner per key, revised as later rows arrive — Flink's
    changelog-producing dedup, Spark's update output mode.

    State per key is ONE row (the winner's order/tiebreak + payload),
    the same O(keys) bound Flink documents for keep-last dedup. Each
    micro-batch emits only keys whose winner changed. The batch dual
    is ``operators/changelog.latest_by_key`` (same total order:
    order_col DESC, tiebreak DESC). ``keep="first"`` flips the
    comparison to EVENT-TIME-earliest — Flink's keep-first mode with
    a deterministic (event-time) winner, unlike
    dropDuplicatesWithinWatermark's arrival-order first; batch dual
    ``earliest_by_key``.

    ``allowed_lateness`` is the explicit Flink-style lateness knob:
    when given, it (re)sets the watermark on ``ts_col`` to that delay
    AND the operator drops rows whose event time is behind the current
    watermark (checked against ``getCurrentWatermarkMs`` per batch —
    Spark does NOT auto-filter late input for
    applyInPandasWithState, unlike aggregations), so a too-late row
    can no longer revise a winner — Flink's "events later than
    watermark + lateness are discarded" contract, surfaced
    per-operator. Without it, the input stream's own watermark (or
    none) governs and nothing is dropped."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from lance_flink_spark.session import ship_package

    ship_package(sdf.sparkSession)
    if allowed_lateness is not None:
        sdf = sdf.withWatermark(ts_col, allowed_lateness)
    payload = [c for c in sdf.columns if c not in keys]
    out_schema = sdf.schema
    key_fields = [out_schema[k] for k in keys]
    pay_fields = [out_schema[c] for c in payload]
    from pyspark.sql import types as T

    out_struct = T.StructType(key_fields + pay_fields)
    state_struct = T.StructType(pay_fields)
    oi, ti = payload.index(order_col), payload.index(tiebreak_col)

    keep_last = keep == "last"
    enforce_lateness = allowed_lateness is not None
    tsi = payload.index(ts_col) if enforce_lateness else -1

    def update(key, pdfs, state: GroupState):
        best = list(state.get) if state.exists else None
        changed = False
        wm_us = state.getCurrentWatermarkMs() * 1000 if enforce_lateness else 0
        for pdf in pdfs:
            sub = pdf[payload]
            if enforce_lateness and wm_us:
                t_us = (
                    pdf[ts_col].astype("datetime64[us]").astype("int64")
                )
                sub = sub[t_us.to_numpy() >= wm_us]  # drop late rows
            for row in sub.itertuples(index=False):
                row = list(row)
                better = (
                    best is None
                    or ((row[oi], row[ti]) > (best[oi], best[ti]))
                    if keep_last
                    else (
                        best is None
                        or ((row[oi], row[ti]) < (best[oi], best[ti]))
                    )
                )
                if better:
                    best = row
                    changed = True
        if best is not None:
            state.update(tuple(best))
        if changed:
            yield pd.DataFrame(
                [list(key) + best], columns=list(keys) + payload
            )

    return sdf.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=out_struct,
        stateStructType=state_struct,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
