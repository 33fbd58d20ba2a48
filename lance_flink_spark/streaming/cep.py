"""Streaming CEP — MATCH_RECOGNIZE over a keyed stream with
applyInPandasWithState (the Flink CEP NFA's keyed-state analogue).

Semantics are the SAME greedy skip-to-next-row contract as the batch
``operators/cep.match_sequence`` (earliest binding per step, no
backtracking, chain must complete within ``within`` of the step-1
event), maintained across micro-batches:

- per-key state = a bounded event buffer (retention = ``within`` +
  the source watermark delay, evicted against the key's max event
  time) plus the set of already-emitted step-1 ids (so a match emits
  exactly once across batches).
- a match emits in the first micro-batch whose buffered events
  complete its chain. Bindings finalize at emission: an event arriving
  later than the watermark allows may bind differently than a batch
  replay would — the same allowed-lateness contract Flink CEP
  documents. With in-order (or single-batch availableNow) input the
  emitted set equals the batch operator exactly, which is the pinned
  oracle contract.

Scale: state per key is O(events within the retention window), the
bound Flink CEP's NFA buffer carries; the shuffle is the keyed
exchange Structured Streaming already pays for stateful ops.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_TMPL = "{key} {key_type}, start_event_id long, {ts_cols}, duration_us long"
# state: parallel lists (Spark state structs can't nest dataframes)
_STATE_SCHEMA = (
    "ts array<long>, eid array<long>, etype array<string>, emitted array<long>"
)


def _duration_us(spec: str) -> int:
    """'10 minutes' / '1 hour' → microseconds."""
    qty, unit = spec.split()
    mult = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }[unit.lower()]
    return int(qty) * mult * 1_000_000


def _greedy_matches(ts, eid, etype, steps, within_us, emitted):
    """The batch operator's greedy binding, replayed over one key's
    sorted buffer. Returns (new_matches, matched_start_ids).

    O(B·steps): one backward pass per step builds next-occurrence
    pointers (the in-memory mirror of the batch operator's reverse
    struct-min windows), then each start follows steps-1 pointers —
    no quadratic rescans for hot keys."""
    order = sorted(range(len(ts)), key=lambda i: (ts[i], eid[i]))
    B = len(order)
    # nxt[s][pos] = position in `order` of the earliest event of type
    # steps[s] strictly after pos, or -1
    nxt = []
    for s in range(1, len(steps)):
        arr = [-1] * B
        seen = -1
        for pos in range(B - 1, -1, -1):
            arr[pos] = seen
            if etype[order[pos]] == steps[s]:
                seen = pos
        nxt.append(arr)
    out = []
    done = set(emitted)
    for pos in range(B):
        i = order[pos]
        if etype[i] != steps[0] or eid[i] in done:
            continue
        chain = [i]
        cur = pos
        for arr in nxt:
            cur = arr[cur]
            if cur < 0:
                break
            chain.append(order[cur])
        if cur >= 0 and ts[chain[-1]] - ts[chain[0]] <= within_us:
            out.append((eid[i], [ts[c] for c in chain]))
            done.add(eid[i])
    return out, done


def stream_match_sequence(
    events: DataFrame,
    steps: list[str],
    within: str = "24 hours",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    retention_slack_seconds: int = 3600,
    allowed_lateness: str | None = None,
) -> DataFrame:
    """Streaming twin of ``operators/cep.match_sequence`` — same output
    schema (key, start_event_id, t0_us..t{n-1}_us, duration_us).

    ``allowed_lateness`` is the explicit Flink-style lateness knob:
    events arriving out of order by at most this much (relative to the
    key's max event time) can still bind into a chain, because the
    per-key buffer retains ``within + allowed_lateness`` of events.
    It supersedes ``retention_slack_seconds`` when given (same
    mechanism, duration-string surface). Events later than that are
    past the eviction horizon — their chain partners are gone, the
    same dropped-as-late contract Flink CEP documents for events
    beyond the watermark plus lateness."""
    from lance_flink_spark.session import ship_package

    ship_package(events.sparkSession)
    n = len(steps)
    within_us = _duration_us(within)
    slack_us = (
        _duration_us(allowed_lateness)
        if allowed_lateness is not None
        else retention_slack_seconds * 1_000_000
    )
    retain_us = within_us + slack_us
    out_schema = _OUT_TMPL.format(
        key=key_col,
        key_type=events.schema[key_col].dataType.simpleString(),
        ts_cols=", ".join(f"t{i}_us long" for i in range(n)),
    )

    def update(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        ts, eid, etype, emitted = (
            state.get if state.exists else ([], [], [], [])
        )
        ts, eid, etype, emitted = list(ts), list(eid), list(etype), list(emitted)
        for pdf in pdfs:
            ts += [
                int(v)
                for v in pdf[ts_col].astype("datetime64[us]").astype("int64")
            ]
            eid += [int(v) for v in pdf[id_col]]
            etype += [str(v) for v in pdf[type_col]]
        matches, done = _greedy_matches(ts, eid, etype, steps, within_us, emitted)
        # evict events the retention window has passed; keep emitted
        # ids only while their start event could still re-enter
        if ts:
            horizon = max(ts) - retain_us
            keep = [i for i in range(len(ts)) if ts[i] >= horizon]
            live = set(eid[i] for i in keep)
            ts = [ts[i] for i in keep]
            eid_k = [eid[i] for i in keep]
            etype = [etype[i] for i in keep]
            emitted = [e for e in done if e in live]
            eid = eid_k
        state.update((ts, eid, etype, emitted))
        if matches:
            rows = {
                key_col: [key[0]] * len(matches),
                "start_event_id": [m[0] for m in matches],
            }
            for i in range(n):
                rows[f"t{i}_us"] = [m[1][i] for m in matches]
            rows["duration_us"] = [m[1][n - 1] - m[1][0] for m in matches]
            yield pd.DataFrame(rows)

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_ABSENCE_STATE = "ts array<long>, eid array<long>, abs_ts array<long>"


def stream_match_absence(
    events: DataFrame,
    first: str,
    absent: str,
    within: str = "1 hour",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """STREAMING notFollowedBy — the true Flink CEP timeout pattern:
    an abandonment can only be DECLARED when the event-time clock
    (the watermark) passes first_ts + within with no ``absent`` event
    having arrived. Pending ``first`` events live in per-key state; a
    qualifying ``absent`` arrival cancels them; the single per-key
    event-time timer re-arms to the EARLIEST pending deadline and
    emits expired pendings on fire (Flink's onTimer, via
    GroupStateTimeout.EventTimeTimeout + getCurrentWatermarkMs).

    Emission schema matches the batch ``match_absence``:
    (key, start_event_id, t0_us). State per key = pending firsts
    within one window PLUS recent ``absent`` event times still above
    the watermark — both bounded by per-key arrival rate × within.
    The absent buffer exists for out-of-order arrival: a ``first``
    landing in a LATER micro-batch than its cancelling ``absent``
    (watermark-legal reordering) must still be cancelled, or a false
    abandonment diverges from the batch oracle. An absent time is
    droppable once the watermark passes it — no watermark-legal first
    that it could cancel can arrive after that."""
    from lance_flink_spark.session import ship_package

    ship_package(events.sparkSession)
    within_us = _duration_us(within)
    key_type = events.schema[key_col].dataType.simpleString()
    out_schema = f"{key_col} {key_type}, start_event_id long, t0_us long"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        ts, eid, abs_ts = (
            (list(x) for x in state.get) if state.exists else ([], [], [])
        )
        ts, eid, abs_ts = list(ts), list(eid), list(abs_ts)
        out_ids, out_ts = [], []

        def flush_expired(wm_us):
            nonlocal ts, eid
            keep_t, keep_i = [], []
            for t, i in zip(ts, eid):
                if t + within_us <= wm_us:
                    out_ts.append(t)
                    out_ids.append(i)
                else:
                    keep_t.append(t)
                    keep_i.append(i)
            ts, eid = keep_t, keep_i

        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.hasTimedOut:
            flush_expired(wm_us)
        else:
            rows = []
            for pdf in pdfs:
                tu = pdf[ts_col].astype("datetime64[us]").astype("int64")
                for t, i, ty in zip(tu, pdf[id_col], pdf[type_col]):
                    if ty == first or ty == absent:
                        rows.append((int(t), int(i), ty))
            rows.sort()
            for t, i, ty in rows:
                if ty == first:
                    # an out-of-order first may arrive AFTER its
                    # cancelling absent was processed in an earlier
                    # batch — the buffered absent times resolve it
                    if any(t < a <= t + within_us for a in abs_ts):
                        continue  # resolved — never pending
                    ts.append(t)
                    eid.append(i)
                else:  # absent event: cancels pendings it follows in-window;
                    # pendings whose window ALREADY closed are abandoned
                    abs_ts.append(t)
                    keep_t, keep_i = [], []
                    for pt, pi in zip(ts, eid):
                        if pt < t <= pt + within_us:
                            continue  # resolved — not abandoned
                        if pt + within_us < t:
                            out_ts.append(pt)
                            out_ids.append(pi)
                        else:
                            keep_t.append(pt)
                            keep_i.append(pi)
                    ts, eid = keep_t, keep_i
            flush_expired(wm_us)
        # an absent time at/below the watermark can never cancel a
        # future watermark-legal first — evict it
        abs_ts = [a for a in abs_ts if a > wm_us]
        if ts or abs_ts:
            state.update((ts, eid, abs_ts))
            # re-arm the single event-time timer: the earliest pending
            # deadline (ms, the timer API's unit), else — absents only —
            # just past the last buffered absent so cleanup still fires
            deadlines = [min(ts) + within_us] if ts else []
            if abs_ts:
                deadlines.append(max(abs_ts) + 1000)
            state.setTimeoutTimestamp(min(deadlines) // 1000)
        else:
            state.remove()
        if out_ids:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(out_ids),
                    "start_event_id": out_ids,
                    "t0_us": out_ts,
                }
            )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_ABSENCE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------- round 13: quantified MATCH_RECOGNIZE on a stream ----------

_QUANT_STATE = "ts array<long>, eid array<long>, sym array<int>, hwm long"


def _try_match_quant(ts, sym, pos, n_settled, alts, within_us, wm_us):
    """Attempt a match anchored at settled row ``pos`` against the
    greedy-ordered ``alts`` (lists of (sym_idx, quant)) under the
    BATCH dialect's exact semantics (operators/cep.match_pattern): a
    '+' element greedily consumes its ENTIRE same-symbol run, a
    quantified LEADING element only anchors at a run start, and the
    WITHIN bound is checked once on the bound match (t_last − t0).
    Returns ('match', end_idx_exclusive, n_rows) | ('fail',) |
    ('blocked',):

    - an attempt is BLOCKED (undetermined) when consumption reaches
      the settled boundary while the pattern could still bind —
      UNLESS the watermark already passed t0+within: any future row
      has ts > t0+within, so whichever way the open run resolves the
      match violates WITHIN → definitive FAIL (trailing-quantified
      patterns, where this argument breaks, are refused up front)."""
    t0 = ts[pos]
    definitive_window = wm_us > t0 + within_us
    at_run_start = pos == 0 or sym[pos - 1] != sym[pos]
    for alt in alts:
        if alt[0][0] != sym[pos]:
            continue
        if alt[0][1] == "+" and not at_run_start:
            # batch dialect: greedy leading elements anchor at run
            # starts only (mid-run suffix anchors are not matches)
            continue
        i = pos
        blocked = False
        ok = True
        for s_, q in alt:
            if q == "1":
                if i >= n_settled:
                    blocked = True
                    break
                if sym[i] == s_:
                    i += 1
                else:
                    ok = False
                    break
            else:  # '+': consume the whole same-symbol run
                cnt = 0
                while i < n_settled and sym[i] == s_:
                    i += 1
                    cnt += 1
                if cnt == 0:
                    if i >= n_settled:
                        blocked = True
                        break
                    ok = False
                    break
                if i >= n_settled:
                    # the run is OPEN at the settled boundary: a future
                    # row could extend it (whole-run consumption would
                    # then grow) — undetermined unless the window is
                    # closed, in which case any resolution fails WITHIN
                    blocked = True
                    break
        if blocked:
            if definitive_window:
                continue  # fails under every future — try a less
                # greedy alternative over the settled rows
            return ("blocked",)
        if ok and ts[i - 1] - t0 <= within_us:
            return ("match", i, i - pos)
    return ("fail",)


def _kern_quant(ts, eid, sym, hwm, wm, alts, first_syms, within_us):
    """Per-key settled-prefix scan shared by BOTH grouping modes of
    :func:`stream_match_pattern` (the over_agg kernel pattern): merged
    (unsorted) buffers in, emitted matches + surviving suffix + new
    horizon + the key's next event-time timer out. ``wm`` is the raw
    watermark in µs; the kernel applies the per-key horizon max
    exactly as the per-key path always did."""
    from lance_flink_spark.streaming.over_agg import _timer_ms

    wm_us = max(wm, hwm)
    order = np.lexsort((eid, ts))
    ts, eid, sym = ts[order], eid[order], sym[order]
    n_settled = int(np.searchsorted(ts, wm_us, side="left"))
    pos = 0
    out = {"start_event_id": [], "t0_us": [], "t_last_us": [], "n_rows": []}
    blocked_t0 = None
    while pos < n_settled:
        if sym[pos] not in first_syms:
            pos += 1
            continue
        res = _try_match_quant(ts, sym, pos, n_settled, alts, within_us, wm_us)
        if res[0] == "blocked":
            blocked_t0 = int(ts[pos])
            break
        if res[0] == "match":
            end = res[1]
            out["start_event_id"].append(int(eid[pos]))
            out["t0_us"].append(int(ts[pos]))
            out["t_last_us"].append(int(ts[end - 1]))
            out["n_rows"].append(int(res[2]))
            pos = end
        else:
            pos += 1
    # rows the scan moved past are gone forever (sequential
    # semantics); the horizon pins what was scanned
    hwm = int(ts[pos]) if pos < len(ts) else max(hwm, wm_us)
    ts, eid, sym = ts[pos:], eid[pos:], sym[pos:]
    timer = None
    if len(ts):
        candidates = []
        pend = ts[ts >= wm_us]
        if len(pend):
            candidates.append(_timer_ms(int(pend.min()), wm_us))
        if blocked_t0 is not None:
            # the within-timeout that definitively resolves the
            # blocked anchor even if no further rows arrive
            candidates.append(
                max((blocked_t0 + within_us) // 1000 + 1, wm_us // 1000 + 1)
            )
        elif not len(pend):
            # settled-but-unscanned rows (below a blocked anchor
            # cleared elsewhere) — revisit on the next wm move
            candidates.append(wm_us // 1000 + 1)
        if candidates:
            timer = min(candidates)
    return (
        (out if out["start_event_id"] else None), ts, eid, sym, hwm, timer
    )


# sharded grouping (r16 — over_agg's r15 economics applied to CEP):
# one applyInPandasWithState group per SHARD, the kernel above run per
# key inside it. Per-event parallel arrays carry each key's rows; the
# key's horizon and its per-key timer value ride per-row (first index
# per key read back), so invocation gating — a key is processed only
# when per-key grouping would have invoked it (arrivals, or its stored
# timer fired) — and late-drop stay exactly per key.
_SHARD_QUANT_STATE = (
    "keys binary, ts binary, eid binary, sym binary, hwm binary, "
    "timer binary"
)


def _shard_quant_update(alts, first_syms, within_us):
    def _update(
        shard: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = state.get
            keys = np.frombuffer(st[0], "<i8")
            ts = np.frombuffer(st[1], "<i8")
            eid = np.frombuffer(st[2], "<i8")
            sym = np.frombuffer(st[3], "<i8")
            hwmr = np.frombuffer(st[4], "<i8")
            timr = np.frombuffer(st[5], "<i8")
        else:
            keys = ts = eid = sym = hwmr = timr = np.empty(0, np.int64)
        aks, ats, aids, asym = [], [], [], []
        for pdf in pdfs:
            if not len(pdf):
                continue
            aks.append(pdf["__k"].to_numpy(np.int64))
            ats.append(pdf["__ts_us"].to_numpy(np.int64))
            aids.append(pdf["__id"].to_numpy(np.int64))
            asym.append(pdf["__sym"].to_numpy(np.int64))
        ak = np.concatenate(aks) if aks else np.empty(0, np.int64)
        at = np.concatenate(ats) if ats else np.empty(0, np.int64)
        ai = np.concatenate(aids) if aids else np.empty(0, np.int64)
        ay = np.concatenate(asym) if asym else np.empty(0, np.int64)
        wm = state.getCurrentWatermarkMs() * 1000
        wm_ms = wm // 1000
        if len(keys):
            o = np.argsort(keys, kind="stable")
            keys, ts, eid, sym, hwmr, timr = (
                keys[o], ts[o], eid[o], sym[o], hwmr[o], timr[o]
            )
        if len(ak):
            o = np.argsort(ak, kind="stable")
            ak, at, ai, ay = ak[o], at[o], ai[o], ay[o]
        union = np.union1d(keys, ak) if len(ak) else np.unique(keys)
        nk, nts, neid, nsym, nh, ntm = [], [], [], [], [], []
        outs = []
        for k in union:
            k = int(k)
            s0 = int(np.searchsorted(keys, k, "left"))
            s1 = int(np.searchsorted(keys, k, "right"))
            a0 = int(np.searchsorted(ak, k, "left"))
            a1 = int(np.searchsorted(ak, k, "right"))
            k_hwm = int(hwmr[s0]) if s1 > s0 else 0
            kts, keid, ksym = ts[s0:s1], eid[s0:s1], sym[s0:s1]
            fired = s1 > s0 and wm_ms > int(timr[s0])
            if a1 == a0 and not fired:
                # per-key grouping would not have invoked this key:
                # rows, horizon and timer carry over untouched
                nk.append(np.full(s1 - s0, k, np.int64))
                nts.append(kts); neid.append(keid); nsym.append(ksym)
                nh.append(hwmr[s0:s1]); ntm.append(timr[s0:s1])
                continue
            if a1 > a0:
                a_ts = at[a0:a1]
                keep = a_ts >= k_hwm  # the per-key late-drop
                kts = np.concatenate([kts, a_ts[keep]])
                keid = np.concatenate([keid, ai[a0:a1][keep]])
                ksym = np.concatenate([ksym, ay[a0:a1][keep]])
            res, kts, keid, ksym, k_hwm, k_tmr = _kern_quant(
                kts, keid, ksym, k_hwm, wm, alts, first_syms, within_us
            )
            if res is not None:
                outs.append((k, res))
            if len(kts):
                m = len(kts)
                nk.append(np.full(m, k, np.int64))
                nts.append(kts); neid.append(keid); nsym.append(ksym)
                nh.append(np.full(m, k_hwm, np.int64))
                # rows remain => the kernel always produced a timer
                ntm.append(np.full(m, int(k_tmr), np.int64))
        if nk:
            cat = np.concatenate
            state.update((
                cat(nk).astype("<i8").tobytes(),
                cat(nts).astype("<i8").tobytes(),
                cat(neid).astype("<i8").tobytes(),
                cat(nsym).astype("<i8").tobytes(),
                cat(nh).astype("<i8").tobytes(),
                cat(ntm).astype("<i8").tobytes(),
            ))
            # shard timer = min over member keys' per-key timers; the
            # min may sit AT the current watermark (a standing timer of
            # a non-invoked key), so clamp ahead exactly like over_agg
            timer = min(int(arr[0]) for arr in ntm)
            state.setTimeoutTimestamp(max(timer, wm_ms + 1))
        else:
            state.remove()
        if outs:
            yield pd.DataFrame(
                {
                    "key": np.concatenate(
                        [
                            np.full(len(r["start_event_id"]), k, np.int64)
                            for k, r in outs
                        ]
                    ),
                    "start_event_id": np.concatenate(
                        [r["start_event_id"] for _, r in outs]
                    ).astype(np.int64),
                    "t0_us": np.concatenate(
                        [r["t0_us"] for _, r in outs]
                    ).astype(np.int64),
                    "t_last_us": np.concatenate(
                        [r["t_last_us"] for _, r in outs]
                    ).astype(np.int64),
                    "n_rows": np.concatenate(
                        [r["n_rows"] for _, r in outs]
                    ).astype(np.int64),
                    "duration_us": np.concatenate(
                        [
                            np.asarray(r["t_last_us"], np.int64)
                            - np.asarray(r["t0_us"], np.int64)
                            for _, r in outs
                        ]
                    ),
                }
            )

    return _update


def stream_match_pattern(
    events: DataFrame,
    pattern: list[str],
    within: str = "1 hour",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    delay: str = "0 seconds",
    key_shards: int | None = None,
) -> DataFrame:
    """Streaming twin of ``operators/cep.match_pattern`` — quantified
    MATCH_RECOGNIZE in the SQL-standard STRICT-contiguity dialect
    (greedy +/*, AFTER MATCH SKIP PAST LAST ROW) on an unbounded
    keyed stream. Flink CEP's NFA-on-keyed-state shape, expressed as a
    sequential scan over the key's watermark-SETTLED prefix:

    - rows buffer per key; the scan only consumes rows the shifted
      watermark has strictly passed (over_agg's provably-complete
      emission contract — strict contiguity is order-sensitive, so an
      unsettled row may not participate);
    - the scan advances row by row exactly like the batch semantics;
      consumed and skipped-past rows DROP from state (sequential
      semantics never revisit them), so state is the blocked suffix +
      unsettled rows, not a retention window;
    - a match whose greedy trailing consumption touches the settled
      boundary stays BLOCKED until a later row closes the run or the
      watermark passes t0+within (the within-timeout, via an
      event-time timer) — Flink CEP's greedy-quantifier flush rule;
    - emitted matches are FINAL (append mode): everything they read
      was settled, and the per-key horizon drops sub-millisecond
      stragglers below already-scanned ground (over_agg's hwm rule).

    Output: (key, start_event_id, t0_us, t_last_us, n_rows,
    duration_us) — the batch operator's ONE ROW PER MATCH schema, so
    the batch run over the same rows is the exact oracle."""
    import numpy as np
    from pyspark.sql import functions as F

    from lance_flink_spark.operators.cep import (
        _alternatives,
        _parse_pattern,
        _refuse_ambiguous,
    )
    from lance_flink_spark.session import ship_package
    from lance_flink_spark.streaming.over_agg import (
        _timer_ms,
        _with_shifted_watermark,
    )

    ship_package(events.sparkSession)
    elems = _parse_pattern(pattern)
    if elems[-1][1] in ("+", "*"):
        raise ValueError(
            "stream_match_pattern: trailing quantified elements are "
            "undecidable on an unbounded stream under the batch "
            "dialect's whole-run greedy semantics (a future row can "
            "always extend the final run and flip the WITHIN check) — "
            "end the pattern with a single-occurrence element, or run "
            "the batch operator over bounded data"
        )
    alts_lit = _alternatives(elems)
    _refuse_ambiguous(alts_lit)
    uniq = list(dict.fromkeys(lit for lit, _ in elems))
    lit_idx = {lit: i for i, lit in enumerate(uniq)}
    alts = [[(lit_idx[lit], q) for lit, q in a] for a in alts_lit]
    first_syms = {a[0][0] for a in alts}
    within_us = _duration_us(within)

    sym_expr = F.lit(-1)
    for lit, i in lit_idx.items():
        sym_expr = F.when(F.col(type_col) == lit, F.lit(i)).otherwise(sym_expr)

    def update(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            st = state.get
            ts = np.asarray(st[0], dtype=np.int64)
            eid = np.asarray(st[1], dtype=np.int64)
            sym = np.asarray(st[2], dtype=np.int64)
            hwm = int(st[3])
        else:
            ts = np.empty(0, np.int64)
            eid = np.empty(0, np.int64)
            sym = np.empty(0, np.int64)
            hwm = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            nts = pdf["__ts_us"].to_numpy(np.int64)
            keep = nts >= hwm
            ts = np.concatenate([ts, nts[keep]])
            eid = np.concatenate([eid, pdf["__id"].to_numpy(np.int64)[keep]])
            sym = np.concatenate([sym, pdf["__sym"].to_numpy(np.int64)[keep]])
        wm = state.getCurrentWatermarkMs() * 1000
        out, ts, eid, sym, hwm, timer = _kern_quant(
            ts, eid, sym, hwm, wm, alts, first_syms, within_us
        )
        if len(ts):
            state.update((ts.tolist(), eid.tolist(), sym.tolist(), int(hwm)))
            if timer is not None:
                state.setTimeoutTimestamp(timer)
        else:
            state.remove()
        if out is not None:
            df = pd.DataFrame({"key": key[0], **out})
            df["duration_us"] = df["t_last_us"] - df["t0_us"]
            yield df

    out_struct = (
        "key long, start_event_id long, t0_us long, t_last_us long, "
        "n_rows long, duration_us long"
    )
    if key_shards:
        from lance_flink_spark.streaming.over_agg import (
            _require_integral_key,
            _shard_unsentinel,
            shard_key_expr,
        )

        _require_integral_key(events, key_col)
        keyed = _with_shifted_watermark(
            events.select(
                shard_key_expr(key_col).alias("__k"),
                F.unix_micros(F.col(ts_col)).alias("__ts_us"),
                F.col(id_col).alias("__id"),
                sym_expr.alias("__sym"),
                F.col(ts_col).alias(ts_col),
            ),
            ts_col,
            delay,
        ).withColumn(
            "__s", F.pmod(F.xxhash64("__k"), F.lit(int(key_shards)))
        )
        sout = keyed.groupBy("__s").applyInPandasWithState(
            _shard_quant_update(alts, first_syms, within_us),
            outputStructType=out_struct,
            stateStructType=_SHARD_QUANT_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        return _shard_unsentinel(sout, key_col)
    keyed = _with_shifted_watermark(
        events.select(
            F.col(key_col).alias("__k"),
            F.unix_micros(F.col(ts_col)).alias("__ts_us"),
            F.col(id_col).alias("__id"),
            sym_expr.alias("__sym"),
            F.col(ts_col).alias(ts_col),
        ),
        ts_col,
        delay,
    )
    out = keyed.groupBy("__k").applyInPandasWithState(
        update,
        outputStructType=out_struct,
        stateStructType=_QUANT_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.withColumnRenamed("key", key_col)
