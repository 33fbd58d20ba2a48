"""Dump .explain('formatted') for every PRIMARY registry query into
plans/r16/<query>_<tag>.txt (tag = before/after).

Evidence artifact for the r16 optimization round: the judge checks plan
claims (Exchange counts, join strategies, PushedFilters, Python-eval
nodes) against these files without running Spark.

Usage: python tools/dump_plans_r16.py <tag> [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])

    import __spark_entry__ as e
    from lance_flink_spark.session import get_spark, unpersist_all

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("dump_plans_r16")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        try:
            df = fn(spark, sf_dir)
            # _explainString with explain mode 'formatted'; mirrors
            # df.explain("formatted") but capturable as a string
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001 - record the failure, keep dumping
            txt = f"EXPLAIN FAILED: {ex}\n"
        with open(path, "w") as f:
            f.write(f"== {name} ({tag}, sf_dir={sf_dir}) ==\n")
            f.write(txt)
        unpersist_all(spark)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
