"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as e
    from lance_flink_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()

    # warm the JVM + parquet footers once so per-query times measure the
    # query, not session startup
    qs["q1_pricing_summary"](spark, sf_dir).collect()

    # CALIBRATION (r15, adjudicability): one pinned machine-speed probe
    # — a fixed spark.range sort+agg whose plan never changes across
    # rounds — so cross-round comparisons can separate code movement
    # from machine drift (r13→r14 looked like a regression until the
    # judge re-ran r13 code on the day's machine). Runs AFTER warmup,
    # min of 3 like every query.
    cal = []
    for _ in range(3):
        t0 = time.time()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "id", "id % 997 AS k"
        ).groupBy("k").count().orderBy("k").write.mode(
            "overwrite"
        ).format("noop").save()
        cal.append(time.time() - t0)
    calibration = round(min(cal), 3)

    # Each query runs one UNTIMED cold pass (first-touch costs the plan
    # doesn't own: OS page cache for its input files, JIT/codegen of its
    # operator shapes — r6 recorded dedup_ngram_jaccard at 5.09s cold vs
    # 3.3s steady-state with an unchanged plan) and then N timed
    # steady-state passes, reporting the MINIMUM. A single steady-state
    # sample proved too noisy to trust: identical code measured 45.2s /
    # 53.7s / 49.9s across three r8-r9 runs, with streaming_latest_by_key
    # alone spanning 3.46-5.68s (micro-batch scheduling variance).
    # Min-of-N discards scheduler/GC interference, which is strictly
    # additive noise on a deterministic plan. Streaming queries are safe
    # to repeat: every run_to_memory uses a fresh uuid checkpoint, so
    # each run re-executes the full pipeline, never a checkpoint no-op.
    n_runs = max(int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")), 1)
    # Diagnostic subset filter (r15): comma-separated query names. UNSET
    # in driver runs — the default benches the full registry unchanged.
    # Exists so a targeted optimization can be re-measured in ~30s
    # instead of a ~15min full pass.
    only = {s for s in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if s}
    times: dict[str, float] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            samples = []
            for i in range(1 + n_runs):
                _drop_persisted(spark)
                t0 = time.time()
                df = fn(spark, sf_dir)
                # single full materialization, no driver transfer
                df.write.mode("overwrite").format("noop").save()
                if i > 0:  # run 0 is the untimed cold pass
                    samples.append(time.time() - t0)
            times[name] = round(min(samples), 3)
        except Exception as ex:  # noqa: BLE001
            print(f"bench error in {name}: {ex}", file=sys.stderr)
            times[name] = -1.0
        _drop_persisted(spark)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "total_query_wall_seconds",
        "value": round(sum(t for t in times.values() if t > 0), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "calibration_sec": calibration,
        "machine": _machine_fingerprint(),
    }
    # Per-query deltas vs the previous round go to a SIDE file, not the
    # stdout line: the driver captures only the tail of stdout and parses
    # the final JSON line, so an oversized line (r3: +deltas_vs_prev ->
    # ~3.6 KB) gets truncated and recorded as parsed:null. Keep stdout
    # to the contract fields only.
    prev = _load_prev_bench(out["sf"])
    if prev:
        rnd, pq = prev
        deltas = {
            n: round(t - pq[n], 3)
            for n, t in times.items()
            if n in pq and t > 0 and pq[n] > 0  # skip failed (-1) sides
        }
        try:
            with open(
                os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DELTAS.json"),
                "w",
            ) as f:
                json.dump(
                    {
                        "prev_round": rnd,
                        "sf": out["sf"],
                        # this run's calibration; compare with the
                        # prev round's BENCH calibration_sec (absent
                        # before r15) before reading deltas as code
                        # movement
                        "calibration_sec": out["calibration_sec"],
                        "deltas_vs_prev": deltas,
                    },
                    f,
                    indent=1,
                )
        except Exception:  # noqa: BLE001 - deltas are diagnostics, never fail the bench
            pass
    line = json.dumps(out, separators=(",", ":"))
    print(line)


def _machine_fingerprint() -> dict:
    """Identify the machine a bench ran on: cpu model, core count, and
    the 1-minute loadavg at bench end. Small fixed-size dict — the
    stdout contract line must stay parseable (the driver truncates
    oversized tails)."""
    model = ""
    try:
        with open("/proc/cpuinfo") as f:
            for ln in f:
                if ln.lower().startswith("model name"):
                    model = ln.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = -1.0
    return {
        "cpu": model[:64],
        "cores": os.cpu_count() or 0,
        "load1": load1,
    }


def _drop_persisted(spark) -> None:
    """Release blocks pinned by queries that persist() lazy
    intermediates (dedup signatures/shingles): they cannot unpersist
    inside the query (the returned frame is lazy), and left alone they
    accumulate across the 50-query run."""
    from lance_flink_spark.session import unpersist_all

    unpersist_all(spark)


def _load_prev_bench(sf):
    """(round, per-query times) from the newest same-sf BENCH_r*.json
    artifact, so every bench run surfaces its own per-query
    regressions (cross-sf deltas would be noise)."""
    import glob
    import re

    best = None
    for f in glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", f)
        if not m:
            continue
        try:
            d = json.load(open(f))
            parsed = d.get("parsed", d)
            q = parsed.get("queries")
        except Exception:  # noqa: BLE001
            continue
        if q and parsed.get("sf") == sf and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), q)
    return best


if __name__ == "__main__":
    main()
