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
