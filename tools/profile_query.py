"""Profile one registered query's Spark job timeline (r15, guide §1/§7).

Runs a single query with the Spark event log enabled (one cold pass,
one timed pass) and prints a per-job summary of the TIMED pass: job id,
wall seconds, task count, and the job group/description — the
measurement that tells fixed per-job scheduling overhead apart from
real work. Usage:

    python tools/profile_query.py <query_name> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    import shutil

    evdir = "/tmp/spark-events-profile"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)

    import __spark_entry__ as e
    from lance_flink_spark.session import get_spark, unpersist_all

    spark = get_spark(
        f"profile_{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    fn = qs[name]

    # cold pass (untimed, absorbs fixture builds / page cache)
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    unpersist_all(spark)

    spark.sparkContext.setJobDescription(f"TIMED:{name}")
    t0 = time.time()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    wall = time.time() - t0
    unpersist_all(spark)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log (Spark 4 rolling logs are a directory of
    # events_* files; single-file logs are plain)
    path = os.path.join(evdir, app_id)
    if not os.path.exists(path):
        cands = [os.path.join(evdir, f) for f in os.listdir(evdir)]
        path = max(cands, key=os.path.getmtime)
    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("events_")
        )
    else:
        parts = [path]
    lines = []
    for p in parts:
        with open(p) as f:
            lines.extend(f.readlines())
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            k = ev.get("Event")
            if k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                st = stages.setdefault(si["Stage ID"], {})
                st["wall"] = (
                    si.get("Completion Time", 0) - si.get("Submission Time", 0)
                ) / 1000
                st["n"] = si.get("Number of Tasks", 0)
                st["name"] = si.get("Stage Name", "")[:60]
            elif k == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                acc = {
                    a["Name"]: a.get("Update", 0)
                    for a in (ev.get("Task Info") or {}).get("Accumulables", [])
                    if str(a.get("Name", "")).startswith("internal.metrics.")
                }
                run = acc.get("internal.metrics.executorRunTime", 0)
                st = stages.setdefault(sid, {})
                st["run_ms"] = st.get("run_ms", 0) + run
                st["deser_ms"] = st.get("deser_ms", 0) + acc.get(
                    "internal.metrics.executorDeserializeTime", 0
                )
                st["gc_ms"] = st.get("gc_ms", 0) + acc.get(
                    "internal.metrics.jvmGCTime", 0
                )
                st["max_run"] = max(st.get("max_run", 0), run)
            if k == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "t0": ev["Submission Time"],
                    "desc": props.get("spark.job.description", "")[:110],
                    "n_stages": len(ev.get("Stage IDs", [])),
                    "stage_ids": ev.get("Stage IDs", []),
                    "n_tasks": sum(
                        s.get("Number of Tasks", 0)
                        for s in ev.get("Stage Infos", [])
                    ),
                }
            elif k == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"]

    done = {j: d for j, d in jobs.items() if "t1" in d}
    if not done:
        print("no jobs parsed")
        return
    # report only jobs submitted inside the timed pass window
    t_wall_start = max(d["t0"] for d in done.values()) - wall * 1000 - 500
    rows = sorted(done.items())
    total_job = 0.0
    print(f"query={name} timed_wall={wall:.2f}s jobs={len(rows)}")
    print(f"{'job':>4} {'sec':>7} {'stg':>4} {'tasks':>6}  gap_before  desc")
    prev_end = None
    timed = [
        (j, d) for j, d in rows if d["desc"].startswith("TIMED:") or d["t0"] >= t_wall_start
    ]
    for j, d in timed:
        sec = (d["t1"] - d["t0"]) / 1000
        gap = 0.0 if prev_end is None else max(0.0, (d["t0"] - prev_end) / 1000)
        prev_end = d["t1"]
        total_job += sec
        print(
            f"{j:>4} {sec:>7.3f} {d['n_stages']:>4} {d['n_tasks']:>6}  "
            f"{gap:>9.3f}  {d['desc']}"
        )
        for sid in d.get("stage_ids", []):
            st = stages.get(sid)
            if not st or "wall" not in st:
                continue
            print(
                f"       stage {sid}: wall={st['wall']:.3f}s n={st.get('n', 0)} "
                f"sum_run={st.get('run_ms', 0) / 1000:.3f}s "
                f"max_task={st.get('max_run', 0) / 1000:.3f}s "
                f"deser={st.get('deser_ms', 0) / 1000:.3f}s "
                f"gc={st.get('gc_ms', 0) / 1000:.3f}s  {st.get('name', '')}"
            )
    n = len(timed)
    gaps = wall - total_job
    print(
        f"TOTAL job wall {total_job:.2f}s over {n} jobs "
        f"(outside-jobs time ≈ {gaps:.2f}s of {wall:.2f}s)"
    )


if __name__ == "__main__":
    main()
