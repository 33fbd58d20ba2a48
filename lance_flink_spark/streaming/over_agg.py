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
  watermark STRICTLY passes its event time — at that point no row at
  or before it can still arrive, so its trailing frame is complete
  and the result is FINAL (append semantics, no retractions).
- **Shifted watermark.** Spark's lateness rule admits rows AT the
  (millisecond-floored) watermark, so a row's frame is never provably
  complete at ``ts == wm`` — and the stream's FINAL row (wm stops at
  ``floor_ms(max ts)`` ≤ its µs timestamp) would strand unemitted.
  The operator therefore watermarks an INTERNAL column shifted
  ``+1 ms`` ahead of the data column: the resulting watermark is
  Flink's strict "no more rows ≤ t" promise over the raw timestamps —
  rows later than ``delay`` behind the shifted front are late
  (dropped), exactly the trade Flink's ms-granular watermark makes,
  and every buffered row (the final one included) becomes provably
  complete and flushes. Callers pass an UNWATERMARKED stream.
- Emission is driven by the data batches themselves and by event-time
  timers (``setTimeoutTimestamp`` at the earliest pending row's
  emittability millisecond), so pending rows flush when the watermark
  advances past them even with no new data for the key — including
  Structured Streaming's final no-data micro-batch.
- **Emission horizon.** The watermark is millisecond-floored while
  timestamps are µs, so Spark's admission rule lets a row arrive up to
  1 ms BELOW a frame the operator already sealed. Each key remembers
  the highest watermark it emitted under (``hwm``) and DROPS arrivals
  beneath it — Flink's late-row behavior in its OVER operators — so an
  emitted result is final AND consistent with every row the operator
  ever counts. Unreachable for sources whose cross-batch arrival order
  respects event time (the file-replay contract the registry entries
  and tests run under).
- State per key is bounded by rate × (range + watermark delay): rows
  older than ``watermark − range`` can never enter a future frame
  (future rows sort strictly after the watermark) and are evicted
  each invocation. The per-invocation frame sums are numpy prefix-sum
  lookups over the ts-sorted buffer — O((buffer+batch)·log buffer),
  no Python loop over frame members.

Batch dual: the window-frame queries (#77) — the driver oracle runs
the exact RANGE-frame SQL over the same rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# (ts_us, event_id, value, emitted) column-arrays + the key's emission
# horizon — one state row
# r14: the four column-arrays ride as PACKED little-endian bytes, not
# array<long> — 1500 keys x 2 state round-trips per micro-batch made
# per-key list<->Row encoding the dominant fixture cost at sf0.1;
# np.frombuffer/tobytes is ~10x cheaper and checkpoint compat is moot
# (every run_to_memory starts a fresh uuid checkpoint)
STATE_SCHEMA = (
    "ts binary, ids binary, vs binary, done binary, hwm long"
)


def _packed_state(ts, ids, vs, done, hwm) -> tuple:
    return (
        ts.astype("<i8").tobytes(),
        ids.astype("<i8").tobytes(),
        vs.astype("<i8").tobytes(),
        done.astype(np.uint8).tobytes(),
        int(hwm),
    )


def _unpack_arrays(st):
    ts = np.frombuffer(st[0], "<i8")
    ids = np.frombuffer(st[1], "<i8")
    vs = np.frombuffer(st[2], "<i8")
    done = np.frombuffer(st[3], np.uint8).astype(bool)
    return ts, ids, vs, done

#: internal shifted event-time column (module docstring)
_WM_COL = "__wm_ts"


def _timer_ms(min_pending_us: int, wm_us: int) -> int:
    """Earliest-firing legal timer for the earliest pending row: a row
    is emittable when wm_ms·1000 > ts_us ⇔ wm_ms ≥ ⌊ts_us/1000⌋+1, and
    Spark fires a timer when the watermark advances STRICTLY beyond
    it — so ⌊ts_us/1000⌋ fires exactly at emittability. Clamped
    strictly ahead of the current watermark (Spark rejects timers
    at/behind it); the clamp can defer a row sharing the watermark's
    millisecond by one watermark movement, never drop it (the shifted
    watermark ends 1 ms past the stream's max)."""
    return max(min_pending_us // 1000, wm_us // 1000 + 1)


def _with_shifted_watermark(keyed, ts_col: str, delay: str):
    """Attach the +1 ms shifted watermark column (module docstring).
    The input must not already carry a watermark — two event-time
    columns would make Spark take the MINIMUM, reintroducing the
    at-the-watermark ambiguity this shift removes.

    The raw ``ts_col`` is DROPPED after the watermark attaches: the
    stateful operators read only the integer ``__ts_us`` twin, and the
    per-GROUP Arrow->pandas conversion inside applyInPandasWithState
    pays per column — timestamp columns worst of all (tz-aware dtype
    path). Only ``__wm_ts`` must survive; the analyzer rejects
    dropping the watermarked column itself (guide §4: pass only the
    columns the function needs)."""
    from pyspark.sql import functions as F

    return (
        keyed.withColumn(
            _WM_COL, F.col(ts_col) + F.expr("INTERVAL 1 MILLISECOND")
        )
        .withWatermark(_WM_COL, delay)
        .drop(ts_col)
    )


# ---------- per-key kernels (r15) ----------
#
# The emit/evict math of every OVER operator lives in a KERNEL shared
# by BOTH grouping modes: per-key groupBy (the original shape, kept for
# non-integral keys and as the semantics reference the tests pin) and
# the sharded mode below, where one applyInPandasWithState group holds
# MANY keys and the kernel runs per key inside the shard invocation.
# Contract: kernel(ts, ids, vs, done, wm_us, ...) -> (out | None, ts,
# ids, vs, done[, extra]) where ``out`` is a dict of numpy column
# arrays for the emitted rows (no key column — the caller adds it).


def _kern_range_sum(ts, ids, vs, done, wm_us, rng_us):
    order = np.argsort(ts, kind="stable")
    ts, ids, vs, done = ts[order], ids[order], vs[order], done[order]
    emit = (~done) & (ts < wm_us)
    out = None
    if emit.any():
        csum = np.concatenate([[0], np.cumsum(vs)])
        hi = np.searchsorted(ts, ts[emit], side="right")
        lo = np.searchsorted(ts, ts[emit] - rng_us, side="left")
        out = {
            "event_id": ids[emit],
            "ts_us": ts[emit],
            "range_sum": csum[hi] - csum[lo],
        }
        done = done | emit
    keep = (ts >= wm_us - rng_us) | ~done
    return out, ts[keep], ids[keep], vs[keep], done[keep]


def _kern_rows_sum(ts, ids, vs, done, wm_us, n_prec):
    order = np.lexsort((ids, ts))
    ts, ids, vs, done = ts[order], ids[order], vs[order], done[order]
    emit = (~done) & (ts < wm_us)
    out = None
    if emit.any():
        csum = np.concatenate([[0], np.cumsum(vs)])
        pos = np.flatnonzero(emit)
        lo = np.maximum(pos + 1 - (n_prec + 1), 0)
        out = {
            "event_id": ids[emit],
            "ts_us": ts[emit],
            "rows_sum": csum[pos + 1] - csum[lo],
        }
        done = done | emit
    cut = int(np.searchsorted(ts, wm_us, side="left"))
    idx = np.arange(len(ts))
    keep = (~done) | (idx >= cut - n_prec)
    return out, ts[keep], ids[keep], vs[keep], done[keep]


def _kern_range_multi(ts, ids, vs, done, wm_us, rng_us):
    order = np.argsort(ts, kind="stable")
    ts, ids, vs, done = ts[order], ids[order], vs[order], done[order]
    emit = (~done) & (ts < wm_us)
    out = None
    if emit.any():
        hi = np.searchsorted(ts, ts[emit], side="right")
        lo = np.searchsorted(ts, ts[emit] - rng_us, side="left")
        out = _multi_dict(ids, ts, vs, emit, lo, hi)
        done = done | emit
    keep = (ts >= wm_us - rng_us) | ~done
    return out, ts[keep], ids[keep], vs[keep], done[keep]


def _kern_rows_multi(ts, ids, vs, done, wm_us, n_prec):
    order = np.lexsort((ids, ts))
    ts, ids, vs, done = ts[order], ids[order], vs[order], done[order]
    emit = (~done) & (ts < wm_us)
    out = None
    if emit.any():
        pos = np.flatnonzero(emit)
        lo = np.maximum(pos + 1 - (n_prec + 1), 0)
        out = _multi_dict(ids, ts, vs, emit, lo, pos + 1)
        done = done | emit
    cut = int(np.searchsorted(ts, wm_us, side="left"))
    idx = np.arange(len(ts))
    keep = (~done) | (idx >= cut - n_prec)
    return out, ts[keep], ids[keep], vs[keep], done[keep]


def _kern_lag(ts, ids, vs, done, wm_us, n, evicted, key_repr):
    order = np.lexsort((ids, ts))
    ts, ids, vs, done = ts[order], ids[order], vs[order], done[order]
    emit = (~done) & (ts < wm_us)
    out = None
    if emit.any():
        pos = np.flatnonzero(emit)
        src = pos - n
        if ((src < 0) & (src >= -evicted)).any():
            # the eviction rule retains every predecessor a future
            # emit needs — a missing one means corrupted state, and
            # a silently-wrong LAG would be worse than a crash
            raise RuntimeError(
                f"lag predecessor evicted (key={key_repr}, "
                f"evicted={evicted}, min src={int(src.min())})"
            )
        lag = np.where(src >= 0, vs[np.maximum(src, 0)], 0)
        out = {
            "event_id": ids[emit],
            "ts_us": ts[emit],
            # src < 0 ⇔ within n of the TRUE stream head ⇔ NULL
            "__lag_vals": lag,
            "__lag_null": src < 0,
        }
        done = done | emit
    cut = int(np.searchsorted(ts, wm_us, side="left"))
    idx = np.arange(len(ts))
    keep = (~done) | (idx >= cut - n)
    evicted += int((~keep).sum())
    return out, ts[keep], ids[keep], vs[keep], done[keep], evicted


# ---------- sharded grouping (r15) ----------
#
# applyInPandasWithState pays a fixed per-GROUP protocol cost (state
# row construct/serialize, per-column Arrow<->pandas slices): measured
# ~15 ms per key invocation at sf0.1, which at 1,500 keys x 2
# micro-batches dominated every OVER fixture — and at open-web key
# cardinalities it dominates asymptotically. ``key_shards=N`` groups by
# ``pmod(xxhash64(key), N)`` instead of by key: ONE state row and ONE
# Python invocation per shard, with the per-key kernels above applied
# inside the shard loop. Exact per-key semantics are preserved:
#
# - per-key emission horizon: state carries a per-row ``hwm`` (shared
#   by the key's rows), so late-drop behaves per key, not per shard;
# - per-key INVOCATION gating: a key is processed only when per-key
#   grouping would have invoked it — it has arrivals this batch, or its
#   (recomputed) event-time timer fired. Keys not invoked carry their
#   rows AND horizon unchanged, so stragglers above an untouched key's
#   horizon still emit with full frames;
# - the shard timer is the MIN over member keys' per-key timer values
#   (same ``_timer_ms`` formula), re-armed each invocation; a shard
#   firing for one key skips the others via the invocation gate.
#
# Keys must be integral (they are packed into the state row); callers
# with non-integral keys keep ``key_shards=None`` — the per-key path.
# Shard count is a parallelism knob, not a semantics knob: size it to
# ~8-16x the stateful-operator partition count (the fixtures use 256
# at state_partitions=16; a cluster raises both together).

_SHARD_STATE = (
    "keys binary, ts binary, ids binary, vs binary, done binary, "
    "hwm binary, extra binary"
)

# NULL partition keys form ONE partition in SQL OVER semantics (and in
# the per-key path, where the group key tuple simply carries None). The
# packed shard state stores keys as int64, which cannot hold NULL — and
# a NULL long reaching pandas widens the column to float64, silently
# corrupting large ids before it crashes ``to_numpy(np.int64)``. So the
# sentinel mapping happens in CATALYST, before the Python boundary:
# NULL -> INT64_MIN on the way in (``_shard_keyed``), INT64_MIN -> NULL
# on the way out (``_shard_unsentinel``). A real key equal to the
# sentinel raises loudly at row level instead of aliasing with NULL.
_NULL_KEY = -(1 << 63)


def default_key_shards() -> int:
    """Shard count for integral-keyed OVER streams. Parameterised for
    deployment scale (``SPARK_GRAFT_OVER_KEY_SHARDS``): size to ~4x
    the stateful-operator partition count so every state task works a
    few shards (interleaved A/B at sf0.1, 16 state partitions: 64
    shards 2.67s vs 256 shards 3.14s vs per-key 3.31s for
    streaming_over_rows) — a cluster at P partitions wants ~4*P. More
    shards = per-invocation protocol overhead returns; fewer = larger
    state rows and coarser skew spreading."""
    import os

    return int(os.environ.get("SPARK_GRAFT_OVER_KEY_SHARDS", "64"))


def _shard_update_fn(kernel, kargs, assemble, has_extra):
    """Build the applyInPandasWithState function for sharded mode."""

    def _update(
        shard: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = state.get
            keys = np.frombuffer(st[0], "<i8")
            ts = np.frombuffer(st[1], "<i8")
            ids = np.frombuffer(st[2], "<i8")
            vs = np.frombuffer(st[3], "<i8")
            done = np.frombuffer(st[4], np.uint8).astype(bool)
            hwmr = np.frombuffer(st[5], "<i8")
            extra = np.frombuffer(st[6], "<i8")
        else:
            keys = ts = ids = vs = hwmr = extra = np.empty(0, np.int64)
            done = np.empty(0, bool)
        aks, ats, aids, avs = [], [], [], []
        for pdf in pdfs:
            if not len(pdf):
                continue
            aks.append(pdf["__k"].to_numpy(np.int64))
            ats.append(pdf["__ts_us"].to_numpy(np.int64))
            aids.append(pdf["__id"].to_numpy(np.int64))
            avs.append(pdf["__v"].to_numpy(np.int64))
        ak = np.concatenate(aks) if aks else np.empty(0, np.int64)
        at = np.concatenate(ats) if ats else np.empty(0, np.int64)
        ai = np.concatenate(aids) if aids else np.empty(0, np.int64)
        av = np.concatenate(avs) if avs else np.empty(0, np.int64)
        wm = state.getCurrentWatermarkMs() * 1000
        wm_ms = wm // 1000
        if len(keys):
            o = np.argsort(keys, kind="stable")
            keys, ts, ids, vs, done, hwmr, extra = (
                keys[o], ts[o], ids[o], vs[o], done[o], hwmr[o], extra[o]
            )
        if len(ak):
            o = np.argsort(ak, kind="stable")
            ak, at, ai, av = ak[o], at[o], ai[o], av[o]
        union = np.union1d(keys, ak) if len(ak) else np.unique(keys)
        nk, nts, nids, nvs, nd, nh, nx = [], [], [], [], [], [], []
        outs = []
        for k in union:
            k = int(k)
            s0 = int(np.searchsorted(keys, k, "left"))
            s1 = int(np.searchsorted(keys, k, "right"))
            a0 = int(np.searchsorted(ak, k, "left"))
            a1 = int(np.searchsorted(ak, k, "right"))
            k_hwm = int(hwmr[s0]) if s1 > s0 else 0
            k_ext = int(extra[s0]) if s1 > s0 else 0
            kts, kids, kvs, kdone = (
                ts[s0:s1], ids[s0:s1], vs[s0:s1], done[s0:s1]
            )
            fired = False
            if s1 > s0:
                pend = kts[~kdone]
                if len(pend):
                    fired = wm_ms > _timer_ms(int(pend.min()), k_hwm)
            if a1 == a0 and not fired:
                # per-key grouping would not have invoked this key:
                # rows, horizon and timer carry over untouched
                nk.append(np.full(s1 - s0, k, np.int64))
                nts.append(kts); nids.append(kids); nvs.append(kvs)
                nd.append(kdone)
                nh.append(hwmr[s0:s1]); nx.append(extra[s0:s1])
                continue
            if a1 > a0:
                a_ts = at[a0:a1]
                keep = a_ts >= k_hwm  # _load_state's late-drop, per key
                kts = np.concatenate([kts, a_ts[keep]])
                kids = np.concatenate([kids, ai[a0:a1][keep]])
                kvs = np.concatenate([kvs, av[a0:a1][keep]])
                kdone = np.concatenate(
                    [kdone, np.zeros(int(keep.sum()), bool)]
                )
            wm_us_k = max(wm, k_hwm)
            if has_extra:
                res, kts, kids, kvs, kdone, k_ext = kernel(
                    kts, kids, kvs, kdone, wm_us_k, *kargs, k_ext, k
                )
            else:
                res, kts, kids, kvs, kdone = kernel(
                    kts, kids, kvs, kdone, wm_us_k, *kargs
                )
            if res is not None:
                outs.append((k, res))
            if len(kts):
                m = len(kts)
                nk.append(np.full(m, k, np.int64))
                nts.append(kts); nids.append(kids); nvs.append(kvs)
                nd.append(kdone)
                nh.append(np.full(m, wm_us_k, np.int64))
                nx.append(np.full(m, k_ext, np.int64))
        if nk:
            cat = np.concatenate
            state.update((
                cat(nk).astype("<i8").tobytes(),
                cat(nts).astype("<i8").tobytes(),
                cat(nids).astype("<i8").tobytes(),
                cat(nvs).astype("<i8").tobytes(),
                cat(nd).astype(np.uint8).tobytes(),
                cat(nh).astype("<i8").tobytes(),
                cat(nx).astype("<i8").tobytes(),
            ))
            timer = None
            for arr_ts, arr_done, arr_h in zip(nts, nd, nh):
                p = arr_ts[~arr_done]
                if len(p):
                    t_k = _timer_ms(int(p.min()), int(arr_h[0]))
                    timer = t_k if timer is None else min(timer, t_k)
            if timer is not None:
                # re-arming is shard-wide, so the min may sit AT the
                # current watermark (a member key's standing per-key
                # timer could legally be there); clamp exactly like
                # _timer_ms does for a key invoked at this watermark
                state.setTimeoutTimestamp(max(timer, wm_ms + 1))
        else:
            state.remove()
        if outs:
            yield assemble(outs)

    return _update


def shard_key_expr(key_col: str):
    """NULL-safe int64 key expression for sharded grouping: NULL keys
    -> the ``_NULL_KEY`` sentinel (one partition, SQL semantics); a
    genuine key at the sentinel value raises instead of aliasing. The
    inner WHEN is NULL for NULL input, so coalesce supplies the
    sentinel; raise_error only evaluates on an actual collision."""
    from pyspark.sql import functions as F

    return F.coalesce(
        F.when(
            F.col(key_col) == F.lit(_NULL_KEY),
            F.raise_error(
                F.lit(
                    "key_shards: key value -2^63 is reserved as the "
                    "NULL-key sentinel; use key_shards=None (per-key "
                    "grouping) for key domains that include INT64_MIN"
                )
            ).cast("long"),
        ).otherwise(F.col(key_col).cast("long")),
        F.lit(_NULL_KEY),
    )


def _shard_keyed(events, key_col, ts_col, id_col, value_col, delay, n_shards):
    """Project + shifted-watermark + shard column for sharded mode."""
    from pyspark.sql import functions as F

    keyed = _with_shifted_watermark(
        events.select(
            shard_key_expr(key_col).alias("__k"),
            F.unix_micros(F.col(ts_col)).alias("__ts_us"),
            F.col(id_col).alias("__id"),
            F.col(value_col).cast("long").alias("__v"),
            F.col(ts_col).alias(ts_col),
        ),
        ts_col,
        delay,
    )
    # deterministic shard key (guide §2.5: never rand-derived)
    return keyed.withColumn(
        "__s", F.pmod(F.xxhash64("__k"), F.lit(int(n_shards)))
    )


def _shard_unsentinel(out, key_col):
    """Map the sharded path's NULL-key sentinel back to a SQL NULL in
    the emitted key column (inverse of ``_shard_keyed``'s mapping)."""
    from pyspark.sql import functions as F

    return out.withColumn(
        "key",
        F.when(F.col("key") == F.lit(_NULL_KEY), F.lit(None)).otherwise(
            F.col("key")
        ),
    ).withColumnRenamed("key", key_col)


def _assemble_simple(value_name):
    """Output assembler for single-value kernels (range/rows sum)."""

    def assemble(outs):
        return pd.DataFrame(
            {
                "key": np.concatenate(
                    [np.full(len(r["event_id"]), k, np.int64) for k, r in outs]
                ),
                "event_id": np.concatenate([r["event_id"] for _, r in outs]),
                "ts_us": np.concatenate([r["ts_us"] for _, r in outs]),
                value_name: np.concatenate([r[value_name] for _, r in outs]),
            }
        )

    return assemble


def _assemble_multi(outs):
    cols = {
        "key": np.concatenate(
            [np.full(len(r["event_id"]), k, np.int64) for k, r in outs]
        )
    }
    for name in (
        "event_id", "ts_us", "over_cnt", "over_sum", "over_min",
        "over_max", "over_avg",
    ):
        cols[name] = np.concatenate([r[name] for _, r in outs])
    return pd.DataFrame(cols)


def _assemble_lag(outs):
    vals = np.concatenate([r["__lag_vals"] for _, r in outs])
    nulls = np.concatenate([r["__lag_null"] for _, r in outs])
    return pd.DataFrame(
        {
            "key": np.concatenate(
                [np.full(len(r["event_id"]), k, np.int64) for k, r in outs]
            ),
            "event_id": np.concatenate([r["event_id"] for _, r in outs]),
            "ts_us": np.concatenate([r["ts_us"] for _, r in outs]),
            "lag_v": pd.array(
                [int(v) if not m else None for v, m in zip(vals, nulls)],
                dtype="Int64",
            ),
        }
    )


def _require_integral_key(events, key_col):
    from pyspark.sql import types as T

    dt = events.schema[key_col].dataType
    if not isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        raise ValueError(
            f"key_shards requires an integral key column; {key_col} is {dt}. "
            "Use key_shards=None (per-key grouping) for other key types."
        )


def _load_state(state, pdfs):
    """(ts, ids, vs, done, hwm) from state + this batch's rows, with
    arrivals below the key's emission horizon DROPPED (module
    docstring: the ms-floored watermark admits rows up to 1 ms below a
    sealed frame — late-drop keeps emitted results consistent)."""
    if state.exists:
        st = state.get
        ts, ids, vs, done = _unpack_arrays(st)
        hwm = int(st[4])
    else:
        ts = np.empty(0, dtype=np.int64)
        ids = np.empty(0, dtype=np.int64)
        vs = np.empty(0, dtype=np.int64)
        done = np.empty(0, dtype=bool)
        hwm = 0
    for pdf in pdfs:
        if not len(pdf):
            continue
        nts = pdf["__ts_us"].to_numpy(np.int64)
        keep = nts >= hwm
        ts = np.concatenate([ts, nts[keep]])
        ids = np.concatenate([ids, pdf["__id"].to_numpy(np.int64)[keep]])
        vs = np.concatenate([vs, pdf["__v"].to_numpy(np.int64)[keep]])
        done = np.concatenate([done, np.zeros(int(keep.sum()), dtype=bool)])
    return ts, ids, vs, done, hwm


def over_range_sum(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "vc",
    preceding_ms: int = 30 * 60 * 1000,
    delay: str = "0 seconds",
    key_shards: int | None = None,
) -> DataFrame:
    """Per-row trailing-range sum over a stream. ``events`` needs
    key/ts/id/value columns and must be UNWATERMARKED — the operator
    attaches its own shifted watermark (module docstring); ``delay``
    is the out-of-orderness budget. ``value_col`` should be an integer
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
        ts, ids, vs, done, hwm = _load_state(state, pdfs)
        wm_us = max(state.getCurrentWatermarkMs() * 1000, hwm)
        # STRICT emission + trailing-range frames + eviction live in
        # the kernel (shared with the sharded driver); nothing settled
        # this batch yields NOTHING — 1500 keys x an empty pandas frame
        # through Arrow per micro-batch was measurable fixture cost
        res, ts, ids, vs, done = _kern_range_sum(
            ts, ids, vs, done, wm_us, rng_us
        )
        out = pd.DataFrame({"key": key[0], **res}) if res is not None else None
        if len(ts):
            state.update(_packed_state(ts, ids, vs, done, wm_us))
            pending = ts[~done]
            if len(pending):
                state.setTimeoutTimestamp(
                    _timer_ms(int(pending.min()), wm_us)
                )
        else:
            state.remove()
        if out is not None:
            yield out

    out_struct = "key long, event_id long, ts_us long, range_sum long"
    if key_shards:
        _require_integral_key(events, key_col)
        keyed = _shard_keyed(
            events, key_col, ts_col, id_col, value_col, delay, key_shards
        )
        out = keyed.groupBy("__s").applyInPandasWithState(
            _shard_update_fn(
                _kern_range_sum, (rng_us,), _assemble_simple("range_sum"), False
            ),
            outputStructType=out_struct,
            stateStructType=_SHARD_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        return _shard_unsentinel(out, key_col)
    keyed = _with_shifted_watermark(
        events.select(
            F.col(key_col).alias("__k"),
            F.unix_micros(F.col(ts_col)).alias("__ts_us"),
            F.col(id_col).alias("__id"),
            F.col(value_col).cast("long").alias("__v"),
            F.col(ts_col).alias(ts_col),
        ),
        ts_col,
        delay,
    )
    out = keyed.groupBy("__k").applyInPandasWithState(
        _update,
        outputStructType=out_struct,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.withColumnRenamed("key", key_col)


def over_rows_sum(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "vc",
    n_preceding: int = 5,
    delay: str = "0 seconds",
    key_shards: int | None = None,
) -> DataFrame:
    """ROWS-frame twin (Flink's RowTimeRowsBoundedPrecedingFunction):
    per-row sum over the key's last ``n_preceding`` rows plus itself in
    (event time, id) order — the id tie-break makes peer-ts frames
    deterministic (a bare ROWS frame over ties is engine-dependent).
    Same unwatermarked-input / shifted-watermark / strict-emission /
    timer contract as :func:`over_range_sum`; eviction keeps a row
    while it can still fall inside a future row's frame: the earliest
    future row sorts at the first pending position, so done rows more
    than ``n_preceding`` slots before it are dead."""
    from pyspark.sql import functions as F

    from lance_flink_spark.session import ship_package

    ship_package(events.sparkSession)
    n_prec = int(n_preceding)

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ts, ids, vs, done, hwm = _load_state(state, pdfs)
        wm_us = max(state.getCurrentWatermarkMs() * 1000, hwm)
        # (ts, id) total order + strict emission + head-aware eviction
        # live in the kernel (shared with the sharded driver)
        res, ts, ids, vs, done = _kern_rows_sum(
            ts, ids, vs, done, wm_us, n_prec
        )
        out = pd.DataFrame({"key": key[0], **res}) if res is not None else None
        if len(ts):
            state.update(_packed_state(ts, ids, vs, done, wm_us))
            pending = ts[~done]
            if len(pending):
                state.setTimeoutTimestamp(
                    _timer_ms(int(pending.min()), wm_us)
                )
        else:
            state.remove()
        if out is not None:
            yield out

    if key_shards:
        _require_integral_key(events, key_col)
        skeyed = _shard_keyed(
            events, key_col, ts_col, id_col, value_col, delay, key_shards
        )
        sout = skeyed.groupBy("__s").applyInPandasWithState(
            _shard_update_fn(_kern_rows_sum, (n_prec,), _assemble_simple("rows_sum"), False),
            outputStructType="key long, event_id long, ts_us long, rows_sum long",
            stateStructType=_SHARD_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        return _shard_unsentinel(sout, key_col)
    keyed = _with_shifted_watermark(
        events.select(
            F.col(key_col).alias("__k"),
            F.unix_micros(F.col(ts_col)).alias("__ts_us"),
            F.col(id_col).alias("__id"),
            F.col(value_col).cast("long").alias("__v"),
            F.col(ts_col).alias(ts_col),
        ),
        ts_col,
        delay,
    )
    out = keyed.groupBy("__k").applyInPandasWithState(
        _update,
        outputStructType="key long, event_id long, ts_us long, rows_sum long",
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.withColumnRenamed("key", key_col)


# ---------- round 13: multi-aggregate OVER (COUNT/SUM/MIN/MAX/AVG) ----------

#: output schema shared by the multi-aggregate variants
_MULTI_OUT = (
    "key long, event_id long, ts_us long, over_cnt long, over_sum long, "
    "over_min long, over_max long, over_avg double"
)


def _empty_multi() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "key": pd.Series([], dtype="int64"),
            "event_id": pd.Series([], dtype="int64"),
            "ts_us": pd.Series([], dtype="int64"),
            "over_cnt": pd.Series([], dtype="int64"),
            "over_sum": pd.Series([], dtype="int64"),
            "over_min": pd.Series([], dtype="int64"),
            "over_max": pd.Series([], dtype="int64"),
            "over_avg": pd.Series([], dtype="float64"),
        }
    )


def _range_reduce(vals: np.ndarray, lo: np.ndarray, hi: np.ndarray, ufunc):
    """Vectorized ``ufunc.reduce(vals[lo[i]:hi[i]])`` for every i via a
    sparse table (O(B log B) build, O(1) per query): level k holds the
    reduction of each 2^k-wide window; a [lo, hi) query is the overlap
    of the two 2^⌊log2(hi−lo)⌋ windows anchored at both ends — exact
    for idempotent ops (min/max). Frames always include the current
    row, so hi > lo everywhere."""
    res = np.empty(len(lo), dtype=vals.dtype)
    if not len(lo):
        return res
    n = (hi - lo).astype(np.float64)
    ks = np.frexp(n)[1] - 1  # exact ⌊log2⌋ for integer-valued floats
    tables = [vals]
    for k in range(1, int(ks.max()) + 1):
        span = 1 << (k - 1)
        prev = tables[-1]
        tables.append(ufunc(prev[:-span], prev[span:]))
    for k in range(int(ks.max()) + 1):
        m = ks == k
        if not m.any():
            continue
        w = 1 << k
        res[m] = ufunc(tables[k][lo[m]], tables[k][hi[m] - w])
    return res


def _multi_dict(ids, ts, vs, emit, lo, hi) -> dict:
    """Five-aggregate output columns for emitted rows whose frames are
    the sorted-buffer slices [lo, hi) — keyless dict form shared by the
    per-key and sharded drivers."""
    csum = np.concatenate([[0], np.cumsum(vs)])
    cnt = (hi - lo).astype(np.int64)
    sums = csum[hi] - csum[lo]
    return {
        "event_id": ids[emit],
        "ts_us": ts[emit],
        "over_cnt": cnt,
        "over_sum": sums,
        "over_min": _range_reduce(vs, lo, hi, np.minimum),
        "over_max": _range_reduce(vs, lo, hi, np.maximum),
        "over_avg": sums / cnt,
    }


def _multi_frame(key, ids, ts, vs, emit, lo, hi) -> pd.DataFrame:
    """Assemble the five-aggregate output for emitted rows whose
    frames are the sorted-buffer slices [lo, hi)."""
    return pd.DataFrame(
        {"key": key[0], **_multi_dict(ids, ts, vs, emit, lo, hi)}
    )


def over_range_multi(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "vc",
    preceding_ms: int = 30 * 60 * 1000,
    delay: str = "0 seconds",
    key_shards: int | None = None,
) -> DataFrame:
    """Multi-aggregate trailing-RANGE OVER on a stream — Flink's
    RowTimeRangeBoundedPrecedingFunction serves arbitrary aggregate
    lists in one operator; this is the COUNT/SUM/MIN/MAX/AVG bundle
    over the same buffered-state machinery as :func:`over_range_sum`
    (shifted watermark, strict emission, event-time timers, bounded
    eviction). One state pass computes all five: prefix sums for
    COUNT/SUM/AVG, an O(B log B) sparse table for MIN/MAX."""
    from pyspark.sql import functions as F

    from lance_flink_spark.session import ship_package

    ship_package(events.sparkSession)
    rng_us = int(preceding_ms) * 1000

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ts, ids, vs, done, hwm = _load_state(state, pdfs)
        wm_us = max(state.getCurrentWatermarkMs() * 1000, hwm)
        res, ts, ids, vs, done = _kern_range_multi(
            ts, ids, vs, done, wm_us, rng_us
        )
        out = pd.DataFrame({"key": key[0], **res}) if res is not None else None
        if len(ts):
            state.update(_packed_state(ts, ids, vs, done, wm_us))
            pending = ts[~done]
            if len(pending):
                state.setTimeoutTimestamp(_timer_ms(int(pending.min()), wm_us))
        else:
            state.remove()
        if out is not None:
            yield out

    if key_shards:
        _require_integral_key(events, key_col)
        skeyed = _shard_keyed(
            events, key_col, ts_col, id_col, value_col, delay, key_shards
        )
        sout = skeyed.groupBy("__s").applyInPandasWithState(
            _shard_update_fn(_kern_range_multi, (rng_us,), _assemble_multi, False),
            outputStructType=_MULTI_OUT,
            stateStructType=_SHARD_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        return _shard_unsentinel(sout, key_col)
    keyed = _with_shifted_watermark(
        events.select(
            F.col(key_col).alias("__k"),
            F.unix_micros(F.col(ts_col)).alias("__ts_us"),
            F.col(id_col).alias("__id"),
            F.col(value_col).cast("long").alias("__v"),
            F.col(ts_col).alias(ts_col),
        ),
        ts_col,
        delay,
    )
    out = keyed.groupBy("__k").applyInPandasWithState(
        _update,
        outputStructType=_MULTI_OUT,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.withColumnRenamed("key", key_col)


def over_rows_multi(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "vc",
    n_preceding: int = 5,
    delay: str = "0 seconds",
    key_shards: int | None = None,
) -> DataFrame:
    """Multi-aggregate ROWS-frame twin (COUNT/SUM/MIN/MAX/AVG over the
    key's last ``n_preceding`` rows plus itself in (ts, id) order) —
    same contract as :func:`over_rows_sum`. COUNT < n_preceding+1 only
    at the head of a key's history, exactly like the batch frame."""
    from pyspark.sql import functions as F

    from lance_flink_spark.session import ship_package

    ship_package(events.sparkSession)
    n_prec = int(n_preceding)

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ts, ids, vs, done, hwm = _load_state(state, pdfs)
        wm_us = max(state.getCurrentWatermarkMs() * 1000, hwm)
        res, ts, ids, vs, done = _kern_rows_multi(
            ts, ids, vs, done, wm_us, n_prec
        )
        out = pd.DataFrame({"key": key[0], **res}) if res is not None else None
        if len(ts):
            state.update(_packed_state(ts, ids, vs, done, wm_us))
            pending = ts[~done]
            if len(pending):
                state.setTimeoutTimestamp(_timer_ms(int(pending.min()), wm_us))
        else:
            state.remove()
        if out is not None:
            yield out

    if key_shards:
        _require_integral_key(events, key_col)
        skeyed = _shard_keyed(
            events, key_col, ts_col, id_col, value_col, delay, key_shards
        )
        sout = skeyed.groupBy("__s").applyInPandasWithState(
            _shard_update_fn(_kern_rows_multi, (n_prec,), _assemble_multi, False),
            outputStructType=_MULTI_OUT,
            stateStructType=_SHARD_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        return _shard_unsentinel(sout, key_col)
    keyed = _with_shifted_watermark(
        events.select(
            F.col(key_col).alias("__k"),
            F.unix_micros(F.col(ts_col)).alias("__ts_us"),
            F.col(id_col).alias("__id"),
            F.col(value_col).cast("long").alias("__v"),
            F.col(ts_col).alias(ts_col),
        ),
        ts_col,
        delay,
    )
    out = keyed.groupBy("__k").applyInPandasWithState(
        _update,
        outputStructType=_MULTI_OUT,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.withColumnRenamed("key", key_col)


# ---------- round 13: streaming LAG (Flink's streaming OVER LAG) ----------

#: lag state adds the per-key evicted-row count so a missing
#: in-buffer predecessor is provably "stream head" (NULL), never an
#: eviction artifact
_LAG_STATE = (
    "ts binary, ids binary, vs binary, done binary, hwm long, evicted long"
)


def _lag_frame(key_val, res: dict) -> pd.DataFrame:
    """Assemble the nullable-LAG output frame from the kernel dict."""
    return pd.DataFrame(
        {
            "key": key_val,
            "event_id": res["event_id"],
            "ts_us": res["ts_us"],
            "lag_v": pd.array(
                [
                    int(v) if not isnull else None
                    for v, isnull in zip(res["__lag_vals"], res["__lag_null"])
                ],
                dtype="Int64",
            ),
        }
    )


def over_rows_lag(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "vc",
    n_lag: int = 1,
    delay: str = "0 seconds",
    key_shards: int | None = None,
) -> DataFrame:
    """Streaming ``LAG(value, n) OVER (PARTITION BY key ORDER BY ts,
    id)`` — Flink SQL supports exactly LAG (not LEAD) in streaming
    mode, because a row's LAG depends only on already-arrived rows:
    once the watermark settles a row, its n-th predecessor in (ts, id)
    order is final. Same shifted-watermark / strict-emission / timer
    contract as :func:`over_rows_sum`; eviction keeps the last
    ``n_lag`` rows before the settled cut, and the per-key evicted
    count proves a missing in-buffer predecessor is the TRUE stream
    head (LAG = NULL) rather than evicted history — rows whose
    predecessor was evicted are themselves already emitted, by the
    eviction rule. Output: (key, event_id, ts_us, lag_v nullable)."""
    from pyspark.sql import functions as F

    from lance_flink_spark.session import ship_package

    ship_package(events.sparkSession)
    n = int(n_lag)
    if n < 1:
        raise ValueError("n_lag must be >= 1")

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = state.get
            ts, ids, vs, done = _unpack_arrays(st)
            hwm, evicted = int(st[4]), int(st[5])
        else:
            ts = np.empty(0, np.int64)
            ids = np.empty(0, np.int64)
            vs = np.empty(0, np.int64)
            done = np.empty(0, bool)
            hwm, evicted = 0, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            nts = pdf["__ts_us"].to_numpy(np.int64)
            keep = nts >= hwm
            ts = np.concatenate([ts, nts[keep]])
            ids = np.concatenate([ids, pdf["__id"].to_numpy(np.int64)[keep]])
            vs = np.concatenate([vs, pdf["__v"].to_numpy(np.int64)[keep]])
            done = np.concatenate([done, np.zeros(int(keep.sum()), bool)])
        wm_us = max(state.getCurrentWatermarkMs() * 1000, hwm)
        res, ts, ids, vs, done, evicted = _kern_lag(
            ts, ids, vs, done, wm_us, n, evicted, key[0]
        )
        out = _lag_frame(key[0], res) if res is not None else None
        if len(ts):
            state.update(
                _packed_state(ts, ids, vs, done, wm_us) + (int(evicted),)
            )
            pending = ts[~done]
            if len(pending):
                state.setTimeoutTimestamp(_timer_ms(int(pending.min()), wm_us))
        else:
            state.remove()
        if out is not None:
            yield out

    if key_shards:
        _require_integral_key(events, key_col)
        skeyed = _shard_keyed(
            events, key_col, ts_col, id_col, value_col, delay, key_shards
        )
        sout = skeyed.groupBy("__s").applyInPandasWithState(
            _shard_update_fn(_kern_lag, (n,), _assemble_lag, True),
            outputStructType="key long, event_id long, ts_us long, lag_v long",
            stateStructType=_SHARD_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        return _shard_unsentinel(sout, key_col)
    keyed = _with_shifted_watermark(
        events.select(
            F.col(key_col).alias("__k"),
            F.unix_micros(F.col(ts_col)).alias("__ts_us"),
            F.col(id_col).alias("__id"),
            F.col(value_col).cast("long").alias("__v"),
            F.col(ts_col).alias(ts_col),
        ),
        ts_col,
        delay,
    )
    out = keyed.groupBy("__k").applyInPandasWithState(
        _update,
        outputStructType="key long, event_id long, ts_us long, lag_v long",
        stateStructType=_LAG_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.withColumnRenamed("key", key_col)
