"""Complex-event-processing patterns — Flink CEP / SQL
MATCH_RECOGNIZE parity, expressed as partitioned window passes.

The reference is a Flink connector; sequence-pattern detection over
keyed event streams (``PATTERN (A B C) WITHIN ...``) is the flagship
Flink capability its users reach for after windows. Spark has no
MATCH_RECOGNIZE, but the skip-to-next-row variant is expressible with
N-1 *partitioned* window passes and zero joins:

- semantics (documented, deterministic): for every step-1 event, the
  match greedily binds the EARLIEST step-2 event strictly after it
  (order = (ts, id)), then the earliest step-3 event after that one,
  and so on — no backtracking; the match succeeds iff the final bound
  event falls within ``within`` of the step-1 event. This is
  MATCH_RECOGNIZE with AFTER MATCH SKIP TO NEXT ROW and greedy
  single-event steps — and it is exactly replayable in SQL (LATERAL
  min-per-step), which is what makes it oracle-checkable.

Scale: each pass is one window over the SAME (key, ts, id) ordering —
one shuffle on the key total (Catalyst reuses the partitioning across
passes); state per task is bounded by a key's event count, the same
bound Flink CEP's keyed state carries. No self-joins, no fan-out.

Reference parity anchor: Flink CEP's keyed NFA over
``LanceSource``-fed streams (the connector feeds patterns; the NFA is
Flink's); here the NFA unrolls into per-step reverse minima.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def match_sequence(
    events: DataFrame,
    steps: list[str],
    within: str = "1 hour",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Detect ordered ``steps`` per key within ``within`` of the first
    step. Returns one row per successful match: the key, the step-1
    event id, and each bound step's epoch-micros timestamp as
    ``t0_us .. t{n-1}_us`` plus ``duration_us`` — all exact integers.

    Pass k (built backward from the last step) computes, for every
    row, the earliest following step-k event AND that event's own
    continuation, carried as struct fields through a reverse min —
    so by pass 1 each step-1 row holds its entire greedy chain."""
    n = len(steps)
    if n < 2:
        raise ValueError("match_sequence needs at least 2 steps")
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    df = events
    later_fields: list[str] = []
    for k in range(n - 1, 0, -1):
        inner = [F.col(ts_col).alias(f"t{k}"), F.col(id_col).alias(f"i{k}")]
        for a in later_fields:
            inner.append(F.col(f"__c{k + 1}.{a}").alias(a))
        cand = F.when(F.col(type_col) == steps[k], F.struct(*inner))
        df = df.withColumn(f"__c{k}", F.min(cand).over(w))
        later_fields = [f"t{k}", f"i{k}"] + later_fields
    last_t = F.col(f"__c1.t{n - 1}")
    complete = last_t.isNotNull() & (
        last_t <= F.col(ts_col) + F.expr(f"INTERVAL {within}")
    )
    out_cols = [
        F.col(key_col),
        F.col(id_col).alias("start_event_id"),
        F.unix_micros(F.col(ts_col)).alias("t0_us"),
    ]
    for k in range(1, n):
        out_cols.append(F.unix_micros(F.col(f"__c1.t{k}")).alias(f"t{k}_us"))
    return (
        df.filter(F.col(type_col) == steps[0])
        .filter(complete)
        .select(*out_cols)
        .withColumn(
            "duration_us", F.col(f"t{n - 1}_us") - F.col("t0_us")
        )
    )


def match_absence(
    events: DataFrame,
    first: str,
    absent: str,
    within: str = "24 hours",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Negative pattern (Flink CEP ``notFollowedBy`` within a time
    bound): every ``first`` event with NO ``absent`` event in
    (event, event + within] for the same key — the
    abandonment/churn/timeout shape. Same single-exchange reverse-min
    construction as match_sequence; the absence test is one null/range
    check on the earliest following candidate."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = F.min(
        F.when(F.col(type_col) == absent, F.struct(F.col(ts_col), F.col(id_col)))
    ).over(w)
    df = events.withColumn("__nxt", nxt)
    followed = F.col(f"__nxt.{ts_col}").isNotNull() & (
        F.col(f"__nxt.{ts_col}") <= F.col(ts_col) + F.expr(f"INTERVAL {within}")
    )
    return (
        df.filter(F.col(type_col) == first)
        .filter(~followed)
        .select(
            key_col,
            F.col(id_col).alias("start_event_id"),
            F.unix_micros(F.col(ts_col)).alias("t0_us"),
        )
    )


# ---------- round 13: quantified MATCH_RECOGNIZE (strict contiguity) ----------


def _parse_pattern(pattern: list[str]) -> list[tuple[str, str]]:
    """['view+', 'click', 'purchase*'] → [(lit, quant)] with quant in
    {'1', '+', '*'}."""
    out = []
    for p in pattern:
        if p.endswith("+") or p.endswith("*"):
            out.append((p[:-1], p[-1]))
        else:
            out.append((p, "1"))
    return out


def _alternatives(elems: list[tuple[str, str]]) -> list[list[tuple[str, str]]]:
    """Expand ``*`` elements into present/absent alternatives, ordered
    by GREEDY preference (present beats absent, leftmost star most
    significant). A present ``*`` behaves as ``+``."""
    stars = [i for i, (_l, q) in enumerate(elems) if q == "*"]
    if len(stars) > 3:
        raise ValueError(
            f"MATCH_RECOGNIZE subset: at most 3 '*' quantifiers "
            f"(pattern has {len(stars)} → {2 ** len(stars)} alternatives)"
        )
    alts = []
    for bits in range(2 ** len(stars)):
        alt = []
        for i, (lit, q) in enumerate(elems):
            if q == "*":
                # bit 0 (of the star's slot) = present — bits counts up,
                # so bits=0 is the all-present, greediest alternative
                if not (bits >> stars.index(i)) & 1:
                    alt.append((lit, "+"))
            else:
                alt.append((lit, q))
        if alt:
            alts.append(alt)
    return alts


def _refuse_ambiguous(alts: list[list[tuple[str, str]]]) -> None:
    """Refuse pattern shapes whose run-anchored enumeration could
    diverge from sequential AFTER-MATCH-SKIP-PAST-LAST-ROW scanning:

    - adjacent elements on the same literal (greedy consumption would
      need backtracking to leave rows for the neighbour);
    - any alternative pair where a proper suffix of one's literal
      sequence equals a prefix of the other's (self-overlapping
      patterns — a match could start inside another match's consumed
      span, which only a sequential scan resolves)."""
    for alt in alts:
        for (a, _), (b, _) in zip(alt, alt[1:]):
            if a == b:
                raise ValueError(
                    f"MATCH_RECOGNIZE subset: adjacent pattern elements "
                    f"both match {a!r} (greedy binding would need "
                    "backtracking)"
                )
    seqs = [[lit for lit, _ in alt] for alt in alts]
    for p in seqs:
        for q in seqs:
            for k in range(1, len(p)):
                suf = p[k:]
                if suf == q[: len(suf)]:
                    raise ValueError(
                        "MATCH_RECOGNIZE subset: pattern is self-"
                        f"overlapping (suffix {suf} of one alternative "
                        "prefixes another) — AFTER MATCH SKIP PAST LAST "
                        "ROW then depends on sequential scan order"
                    )


def _runs(events, key_col, ts_col, type_col, id_col, lits):
    """Run-length encode each key's (ts, id)-ordered rows by pattern
    symbol (rows matching no DEFINE get symbol NULL and break
    contiguity, per SQL MATCH_RECOGNIZE's strict pattern semantics).
    Returns (rows-with-run-ids, runs). One shuffle on the key; the
    islands trick (rn − per-symbol rn) is pure window arithmetic."""
    sym = F.lit(None).cast("int")
    for i, lit in enumerate(lits):
        sym = F.when(F.col(type_col) == lit, F.lit(i)).otherwise(sym)
    w_all = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    w_sym = Window.partitionBy(key_col, "__sym").orderBy(ts_col, id_col)
    rows = (
        events.withColumn("__sym", sym)
        .withColumn("__rn", F.row_number().over(w_all))
        .withColumn(
            "__grp", F.col("__rn") - F.row_number().over(w_sym)
        )
    )
    runs = rows.groupBy(key_col, "__sym", "__grp").agg(
        F.count(F.lit(1)).alias("__len"),
        F.min("__rn").alias("__rn0"),
        F.min(ts_col).alias("__ts0"),
        F.max(ts_col).alias("__ts1"),
        F.min_by(id_col, F.struct(ts_col, id_col)).alias("__id_first"),
        F.max_by(id_col, F.struct(ts_col, id_col)).alias("__id_last"),
        F.max_by(ts_col, F.struct(ts_col, id_col)).alias("__ts_last"),
    )
    w_runs = Window.partitionBy(key_col).orderBy("__rn0")
    runs = runs.withColumn("__ridx", F.row_number().over(w_runs))
    rows = rows.join(
        runs.select(key_col, "__sym", "__grp", "__ridx"),
        [key_col, "__sym", "__grp"],
        "left",
    )
    return rows, runs


def match_pattern(
    events: DataFrame,
    pattern: list[str],
    within: str = "1 hour",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    rows_per_match: str = "one",
) -> DataFrame:
    """SQL-standard MATCH_RECOGNIZE with quantifiers — STRICT
    contiguity (``A B`` means B is the literally NEXT row of the
    partition; rows matching no variable break a match), greedy
    ``+``/``*`` quantifiers, and AFTER MATCH SKIP PAST LAST ROW — the
    Flink SQL dialect's defaults (Flink docs "Pattern Recognition";
    reference parity anchor: Flink CEP over LanceSource streams).
    Contrast :func:`match_sequence`, which implements the RELAXED
    (followedBy) dialect for plain patterns.

    ``pattern`` elements are event-type literals with an optional
    trailing quantifier: ``["view+", "click", "purchase"]``. Matching
    compiles to run-length encoding + run-level window conditions
    (pure Catalyst, one shuffle on the key): a quantified element
    greedily consumes one whole same-symbol run, a single element
    consumes one row (so a MIDDLE single element requires a length-1
    run; a leading one anchors at its run's last row; a trailing one
    consumes its run's first row). Ambiguous shapes (adjacent same-
    literal elements, self-overlapping patterns) refuse loudly — for
    everything else this enumeration provably equals the sequential
    skip-past-last-row scan.

    Dialect boundary (documented, test-pinned): runs are
    ADJACENCY-based (only a different-symbol row breaks one — a bare
    time gap does not) and WITHIN is an END-check on the bound match.
    When a quantified run straddles the window, Flink's NFA prunes the
    over-window branch and can emit a suffix match; this dialect
    consumes the whole run, fails the end-check, and moves on —
    deterministic and exactly SQL-replayable, which is what the oracle
    gate requires. The streaming twin
    (streaming/cep.stream_match_pattern) implements the SAME dialect.

    ``rows_per_match='one'``: one row per match — (key,
    start_event_id, t0_us, t_last_us, n_rows, duration_us).
    ``'all'``: ALL ROWS PER MATCH — every consumed row with its bound
    variable (key, match_start_id, var, original id/ts as row_id/
    row_ts_us)."""
    elems = _parse_pattern(pattern)
    if rows_per_match not in ("one", "all"):
        raise ValueError(f"rows_per_match must be one|all, got {rows_per_match!r}")
    alts = _alternatives(elems)
    _refuse_ambiguous(alts)
    # repeated literals are fine when the ambiguity checks pass
    # (e.g. A B A C) — symbols are per-LITERAL, variables per-position
    uniq = list(dict.fromkeys(lit for lit, _ in elems))
    lit_idx = {lit: i for i, lit in enumerate(uniq)}
    rows, runs = _runs(events, key_col, ts_col, type_col, id_col, uniq)

    w_runs = Window.partitionBy(key_col).orderBy("__ridx")
    # lead columns once, deep enough for the longest alternative
    max_m = max(len(a) for a in alts)
    led = runs
    for k in range(1, max_m):
        for c in ("__sym", "__len", "__ts0", "__ts1", "__ts_last",
                  "__id_first", "__ridx"):
            led = led.withColumn(f"__l{k}_{c}", F.lead(c, k).over(w_runs))

    def col_at(k: int, c: str):
        return F.col(c) if k == 0 else F.col(f"__l{k}_{c}")

    per_alt = []
    for rank, alt in enumerate(alts):
        m = len(alt)
        first_lit, first_q = alt[0]
        cond = F.col("__sym") == lit_idx[first_lit]
        # run adjacency is positional: lead(k) IS run ridx+k, and runs
        # partition the row sequence, so consecutive runs are
        # contiguous rows by construction
        for k, (lit, q) in enumerate(alt):
            if k > 0:
                cond = cond & (col_at(k, "__sym") == lit_idx[lit])
            if q == "1" and 0 < k < m - 1:
                cond = cond & (col_at(k, "__len") == 1)
        # anchor (match start): leading '+' consumes its whole run from
        # the first row; leading single anchors at the run's LAST row
        t0 = F.col("__ts0") if first_q == "+" else F.col("__ts_last")
        sid = F.col("__id_first") if first_q == "+" else F.col("__id_last")
        last_q = alt[-1][1]
        t_last = (
            col_at(m - 1, "__ts1") if last_q == "+" else col_at(m - 1, "__ts0")
        )
        cond = cond & (t_last <= t0 + F.expr(f"INTERVAL {within}"))
        n_rows = F.lit(0)
        for k, (_lit, q) in enumerate(alt):
            n_rows = n_rows + (col_at(k, "__len") if q == "+" else F.lit(1))
        per_alt.append(
            led.filter(cond).select(
                F.col(key_col),
                F.col("__ridx").alias("__anchor"),
                F.lit(rank).alias("__rank"),
                sid.alias("start_event_id"),
                F.unix_micros(t0).alias("t0_us"),
                F.unix_micros(t_last).alias("t_last_us"),
                n_rows.cast("long").alias("n_rows"),
                F.lit(m).alias("__m"),
                F.lit(",".join(f"{l}:{q}" for l, q in alt)).alias("__alt"),
            )
        )
    matches = per_alt[0]
    for p in per_alt[1:]:
        matches = matches.unionByName(p)
    # greedy preference: one match per anchor run, lowest alternative
    # rank (all-present first) wins
    w_anchor = Window.partitionBy(key_col, "__anchor").orderBy("__rank")
    matches = (
        matches.withColumn("__pick", F.row_number().over(w_anchor))
        .filter("__pick = 1")
        .drop("__pick", "__rank")
    )
    if rows_per_match == "one":
        return matches.select(
            key_col, "start_event_id", "t0_us", "t_last_us", "n_rows",
        ).withColumn("duration_us", F.col("t_last_us") - F.col("t0_us"))
    # ALL ROWS PER MATCH: each element k consumed rows of run anchor+k
    # — explode the k offsets, equi-join rows on (key, ridx), then the
    # per-element row constraint (single leading = run's last row,
    # single trailing = run's first row, middle single = its only row)
    parts = matches.select(
        key_col,
        "start_event_id",
        "t0_us",
        "t_last_us",
        F.posexplode(F.split("__alt", ",")).alias("__k", "__elem"),
        F.col("__anchor"),
        F.col("__m"),
    ).select(
        key_col,
        "start_event_id",
        "t0_us",
        "t_last_us",
        (F.col("__anchor") + F.col("__k")).alias("__ridx"),
        F.split("__elem", ":")[0].alias("var"),
        F.split("__elem", ":")[1].alias("__q"),
        "__k",
        "__m",
    )
    joined = rows.join(parts, [key_col, "__ridx"], "inner")
    w_run_rows = Window.partitionBy(key_col, "__ridx").orderBy(ts_col, id_col)
    joined = (
        joined.withColumn("__pos", F.row_number().over(w_run_rows))
        .withColumn(
            "__last_pos",
            F.max("__pos").over(
                Window.partitionBy(key_col, "__ridx")
            ),
        )
    )
    keep = (
        (F.col("__q") == "+")
        | ((F.col("__k") == 0) & (F.col("__pos") == F.col("__last_pos")))
        | ((F.col("__k") == F.col("__m") - 1) & (F.col("__pos") == 1))
        | ((F.col("__k") > 0) & (F.col("__k") < F.col("__m") - 1))
    )
    return (
        joined.filter(keep)
        .select(
            F.col(key_col),
            F.col("start_event_id").alias("match_start_id"),
            F.col("var"),
            F.col(id_col).alias("row_id"),
            F.unix_micros(F.col(ts_col)).alias("row_ts_us"),
        )
    )
