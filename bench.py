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

    times: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            # single full materialization, no driver transfer
            df.write.mode("overwrite").format("noop").save()
            times[name] = round(time.time() - t0, 3)
        except Exception as ex:  # noqa: BLE001
            print(f"bench error in {name}: {ex}", file=sys.stderr)
            times[name] = -1.0
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": round(sum(t for t in times.values() if t > 0), 3),
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
