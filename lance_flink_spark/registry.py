"""Central registry mapping query names → (Spark callable, DuckDB oracle SQL).

Every operator in SURVEY.md §2 registers here; ``__spark_entry__``
exposes the registry to the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# Secondary registry: fully-implemented queries whose oracle coverage is
# provided by a *merged* primary entry (e.g. the knn_l2/cosine/dot trio
# is gate-checked through ``knn_metrics``) or by pytest. The driver's
# correctness artifact records at most 50 entries, so the primary
# registry is kept to exactly the 50 highest-value shapes; extras stay
# runnable and are oracle-checked in tests/test_extras_oracle.py and by
# ``tools/check_oracle.py --extras``.
EXTRA_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}


def query(name: str, oracle: str | None = None, extra: bool = False):
    """Register a (spark, sf_dir) -> DataFrame callable, optionally with
    an equivalent ANSI-SQL oracle for DuckDB. Rows-only checks omit the
    oracle (non-SQL-expressible ops). ``extra=True`` keeps the query out
    of the driver-facing primary registry (50-entry artifact budget)
    while remaining oracle-checked in pytest."""

    def deco(fn):
        if name in QUERIES or name in EXTRA_QUERIES:
            # silent last-wins would swap a query out from under its
            # oracle (a duplicate q18 registration once did exactly
            # that) — fail loudly at import time instead
            raise ValueError(f"duplicate registry entry {name!r}")
        (EXTRA_QUERIES if extra else QUERIES)[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def ntz_as_utc(col):
    """Interpret a TIMESTAMP_NTZ wall clock as a UTC instant,
    independent of the session timezone.

    A plain ``cast('timestamp')`` — and therefore also
    ``to_utc_timestamp(ntz, 'UTC')``, which casts first — maps the NTZ
    wall clock through the SESSION timezone, silently shifting every
    event time when the session tz is not UTC. Rewriting the wall clock
    from UTC to the current session tz first makes the subsequent
    session-tz cast land exactly on the UTC instant for ANY session tz
    (verified in tests/test_ntz.py under America/New_York)."""
    from pyspark.sql import functions as F

    shifted = F.convert_timezone(F.lit("UTC"), F.expr("current_timezone()"), col)
    return shifted.cast("timestamp")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a benchmark table. The events table carries TIMESTAMP(NANOS)
    which Spark refuses by default — read nanos as long (runtime conf)
    and convert to a microsecond timestamp (exact integer div, no fp)."""
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            # parquet timestamp[us] without tz → Spark 4 infers NTZ, which
            # watermarks/windows reject; interpret the wall clock as UTC
            # (session-tz independent, matches the DuckDB oracle's epoch())
            df = df.withColumn("ts", ntz_as_utc(F.col("ts")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _parse_bytes(s: str) -> int:
    """Parse a Spark byte-size conf string ('64MB', '10485760b', '-1')."""
    s = str(s).strip().lower()
    for suf, mult in (
        ("tb", 1 << 40), ("gb", 1 << 30), ("mb", 1 << 20), ("kb", 1 << 10),
        ("t", 1 << 40), ("g", 1 << 30), ("m", 1 << 20), ("k", 1 << 10), ("b", 1),
    ):
        if s.endswith(suf):
            return int(s[: -len(suf)]) * mult
    return int(s)


def bcast(df: DataFrame, dataset=None) -> DataFrame:
    """Size-gated broadcast hint for the dimension side of a join.

    An unconditional ``F.broadcast`` forces the broadcast regardless of
    ``spark.sql.autoBroadcastJoinThreshold`` — right for genuinely
    bounded frames (nation/region, single-row scalar aggregates), a
    forced executor/driver OOM for SF-scaling dims (customer/part/
    supplier are billions of rows at TPC-H 100 TB). This helper asks
    Catalyst for its own size estimate of the optimized logical plan
    and hints only when the estimate fits under the threshold;
    otherwise it returns the frame unhinted and lets AQE pick the
    strategy at runtime (AQE still converts to broadcast when a filter
    made the side small — without risking a planned-in OOM).

    ``dataset``: the Dataset the frame was read from, when the caller
    has one. If it carries CURRENT ``ANALYZE TABLE`` statistics
    (Dataset.stats()), their ``live_bytes`` estimate replaces
    Catalyst's — Catalyst sizes from FILE bytes, which never shrink
    under deletion-vector DELETEs, so a dim that became small stays
    un-broadcast until compaction; the analyzed estimate scales by the
    live-row fraction and flips the hint as soon as stats are fresh
    (pinned in tests/test_analyze_bcast.py)."""
    spark = df.sparkSession
    try:
        limit = _parse_bytes(spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    except Exception:  # noqa: BLE001 - unparseable conf → no hint
        return df
    if limit <= 0:  # broadcast disabled
        return df
    est = None
    if dataset is not None:
        try:
            st = dataset.stats()
        except Exception:  # noqa: BLE001 - unreadable manifest → estimate
            st = None
        if st is not None:
            est = int(st.get("live_bytes", st.get("bytes", 0)))
    if est is None:
        try:
            est = int(
                str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
            )
        except Exception:  # noqa: BLE001 - no stats (e.g. Connect) → no hint
            return df
    if est > limit:
        return df
    from pyspark.sql import functions as F

    return F.broadcast(df)


def scratch_dir(*parts: str) -> str:
    """Gitignored scratch space inside the repo (warehouses, indexes,
    streaming checkpoints)."""
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = os.path.join(root, ".scratch", *parts)
    os.makedirs(p, exist_ok=True)
    return p


_FIXTURES_BUILT: set[str] = set()


def fixture_once(key: str) -> bool:
    """True exactly once per (process, key) — callers rebuild their
    deterministic fixture then; later calls in the SAME process reuse
    the on-disk result. Deliberately PROCESS-scoped, never an on-disk
    marker: a fresh bench/oracle invocation always recomputes every
    fixture from the parquet inputs (nothing derived from the test
    data persists across runs), while repeat passes within one
    invocation skip the rebuild — the bench's untimed cold pass
    absorbs the first build, so timed passes measure the operator,
    not the fixture."""
    if key in _FIXTURES_BUILT:
        return False
    _FIXTURES_BUILT.add(key)
    return True


def cached_native_fixture(name: str, dest: str, build_fn) -> None:
    """Template-cached MUTABLE fixture: ``build_fn(template_dir)``
    builds a deterministic dataset ONCE per (name, process); every
    call then file-copies the template to ``dest`` so the query
    mutates a fresh copy. Turns a per-bench-pass Spark fixture job
    (write_dataset_distributed + commits, 1-3s each) into a
    millisecond copytree — the measured wall is the OPERATOR, not the
    fixture. The template must be deterministic (every registry
    fixture is: sources are the benchmark tables, ids are stable).
    The once-guard is process-scoped (``fixture_once``): a new
    invocation always rebuilds from the parquet inputs, so a changed
    build_fn can never serve a stale template across sessions."""
    import os
    import shutil

    base = scratch_dir("tmpl_" + name)
    tdir = os.path.join(base, "t")
    if fixture_once("tmpl_" + name):
        shutil.rmtree(tdir, ignore_errors=True)
        build_fn(tdir)
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    shutil.copytree(tdir, dest)
