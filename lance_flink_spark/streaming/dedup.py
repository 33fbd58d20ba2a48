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
from pyspark.sql import functions as F


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
    key_shards: int | None = None,
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

    ``key_shards=N`` (r16 — over_agg's r15 sharded-grouping economics):
    group by ``pmod(xxhash64(keys), N)`` instead of by key — ONE state
    row and ONE Python invocation per shard, the same winner logic run
    per key inside it. applyInPandasWithState pays ~12-15 ms of
    protocol per GROUP per micro-batch, so at real key cardinalities
    the per-key form is protocol-bound. This operator has no timers
    and arbitrary key/payload types, so the shard state is simply the
    pickled {key tuple: winner row} map — NULL keys need no sentinel
    (they stay data, never a packed int64) — and EXACT semantics are
    free: a key is touched only when it has arrivals, emission still
    fires only when its winner CHANGED this batch. Size N to ~4x the
    stateful-operator partition count, scaled with the cluster.

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

    def _better(row, best):
        if best is None:
            return True
        if keep_last:
            return (row[oi], row[ti]) > (best[oi], best[ti])
        return (row[oi], row[ti]) < (best[oi], best[ti])

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
                if _better(row, best):
                    best = row
                    changed = True
        if best is not None:
            state.update(tuple(best))
        if changed:
            yield pd.DataFrame(
                [list(key) + best], columns=list(keys) + payload
            )

    if key_shards:
        nk = len(keys)

        def supdate(shard, pdfs, state: GroupState):
            import pickle

            winners = pickle.loads(state.get[0]) if state.exists else {}
            changed: dict = {}
            wm_us = (
                state.getCurrentWatermarkMs() * 1000
                if enforce_lateness
                else 0
            )
            for pdf in pdfs:
                if not len(pdf):
                    continue
                sub = pdf[list(keys) + payload]
                if enforce_lateness and wm_us:
                    t_us = (
                        pdf[ts_col].astype("datetime64[us]").astype("int64")
                    )
                    sub = sub[t_us.to_numpy() >= wm_us]  # drop late rows
                for row in sub.itertuples(index=False):
                    row = list(row)
                    kt, pay = tuple(row[:nk]), row[nk:]
                    if _better(pay, winners.get(kt)):
                        winners[kt] = pay
                        changed[kt] = pay
            if winners:
                state.update((pickle.dumps(winners, protocol=4),))
            else:
                state.remove()
            if changed:
                yield pd.DataFrame(
                    [list(k) + list(v) for k, v in changed.items()],
                    columns=list(keys) + payload,
                )

        sharded = sdf.withColumn(
            "__s",
            F.pmod(
                F.xxhash64(*[F.col(k) for k in keys]),
                F.lit(int(key_shards)),
            ),
        )
        return sharded.groupBy("__s").applyInPandasWithState(
            supdate,
            outputStructType=out_struct,
            stateStructType="blob binary",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    return sdf.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=out_struct,
        stateStructType=state_struct,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class NearDedupIngest:
    """NEAR-duplicate dedup AT INGEST — the streaming face of the
    MinHash family (operators/dedup.py): each micro-batch's documents
    check their 16 md5-derived signature components against a
    persistent SIGNATURE STORE of every previously-seen document; a
    batch document matching ≥ ``min_matches`` components of ANY
    earlier document (or of a smaller-id document in its own batch)
    is dropped as a near-dup, survivors append to the admitted
    output, and the WHOLE batch's signatures append to the store —
    so later chains ("B dups A, C dups B") still collapse to the
    first-seen member. Deterministic: signatures are md5-derived (no
    RNG), in-batch ties resolve keep-min-id, and a batchId marker
    makes replayed batches no-ops.

    Scale shape: the history check is a bucket join on
    (component, sig) — batch×store BUCKETS, never rows; the store
    grows by one signature row set per seen doc (append-only parquet,
    16 longs per doc) and ``max_bucket`` caps degenerate buckets
    exactly as in minhash_lsh_pairs. Reference parity: Flink's
    dedup-at-ingest jobs keep the same signature state in RocksDB;
    parquet-backed state is the batch-replayable equivalent."""

    def __init__(
        self,
        root: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        k: int = 16,
        min_matches: int = 8,
        max_bucket: int | None = None,
    ):
        self.root = root.rstrip("/")
        self.text_col = text_col
        self.id_col = id_col
        self.k = k
        self.min_matches = min_matches
        self.max_bucket = max_bucket

    def _store(self):
        import os

        return os.path.join(self.root, "sig_store")

    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        import os

        from lance_flink_spark.operators.dedup import minhash_signatures

        spark = df.sparkSession
        marker = os.path.join(
            self.root, "_stream_commits", f"neardedup-{int(batch_id)}"
        )
        if os.path.exists(marker):
            return  # replayed batch
        bs = minhash_signatures(
            df, self.text_col, self.id_col, self.k
        ).persist()
        try:
            idc = self.id_col
            dropped = None
            if os.path.isdir(self._store()):
                hist = spark.read.parquet(self._store()).select(
                    F.col(idc).alias("__hist_id"), "i", "sig"
                )
                if self.max_bucket is not None:
                    hot = (
                        hist.groupBy("i", "sig")
                        .agg(F.count(F.lit(1)).alias("bsz"))
                        .filter(F.col("bsz") > self.max_bucket)
                        .select("i", "sig")
                    )
                    hist = hist.join(
                        F.broadcast(hot), ["i", "sig"], "left_anti"
                    )
                dropped = (
                    bs.join(hist, ["i", "sig"])
                    .groupBy(idc, "__hist_id")
                    .agg(F.count(F.lit(1)).alias("nm"))
                    .filter(F.col("nm") >= self.min_matches)
                    .select(idc)
                    .distinct()
                )
            # in-batch: the larger id of any matching pair drops —
            # chains resolve to the batch's first (smallest-id) member
            a = bs.select(F.col(idc).alias("__a"), "i", "sig")
            inb = (
                a.join(
                    bs.withColumnRenamed(idc, "__b"), ["i", "sig"]
                )
                .filter(F.col("__a") < F.col("__b"))
                .groupBy("__a", "__b")
                .agg(F.count(F.lit(1)).alias("nm"))
                .filter(F.col("nm") >= self.min_matches)
                .select(F.col("__b").alias(idc))
                .distinct()
            )
            dropped = inb if dropped is None else dropped.unionByName(inb)
            admitted = df.join(
                dropped.distinct(), self.id_col, "left_anti"
            )
            admitted.write.mode("append").parquet(
                os.path.join(self.root, "admitted")
            )
            # the WHOLE batch's signatures enter the store (seen, not
            # just admitted): later members of a cluster must match
            # the history even when their match was itself dropped
            bs.write.mode("append").parquet(self._store())
        finally:
            bs.unpersist()
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        with open(marker, "w") as f:
            f.write("ok")

    def attach(self, sdf: DataFrame, checkpoint: str):
        return (
            sdf.writeStream.foreachBatch(self.write_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
        )

    def admitted(self, spark) -> DataFrame:
        import os

        return spark.read.parquet(os.path.join(self.root, "admitted"))
