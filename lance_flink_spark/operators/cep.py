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
