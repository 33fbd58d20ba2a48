"""Local emulation of the driver's correctness gate.

Runs every registry query on Spark and its oracle on DuckDB at the
given sf dir, compares row count, column names, and order-insensitive
values. Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    args = [a for a in sys.argv[1:] if a not in ("--extras", "--all")]
    extras = "--extras" in sys.argv[1:]
    both = "--all" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as e
    from lance_flink_spark.session import get_spark

    spark = get_spark("oracle-check")
    qs, oracles = e.queries(), e.oracle_sql()
    if extras or both or only:
        from lance_flink_spark.registry import EXTRA_QUERIES, ORACLES

        ex = dict(EXTRA_QUERIES)
        exo = {k: v for k, v in ORACLES.items() if k in ex}
        if both or only:  # primary + extras in one session; explicit
            # names resolve across BOTH tiers (an extras-only name
            # previously matched nothing and printed a vacuous ALL OK)
            qs = {**qs, **ex}
            oracles = {**oracles, **exo}
        else:
            qs, oracles = ex, exo
    unknown = only - set(qs)
    if unknown:
        print(f"FAIL unknown query name(s): {sorted(unknown)}")
        return 1

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            if name not in oracles:
                n = fn(spark, sf_dir).count()
                print(f"ok   {name}: rows-only ({n} rows, {time.time()-t0:.1f}s)")
                continue
            sdf = normalize(fn(spark, sf_dir).toPandas())
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {ex}")
            failures += 1
            continue
        try:
            odf = normalize(con.execute(oracles[name]).df())
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {ex}")
            failures += 1
            continue
        status = []
        if len(sdf) != len(odf):
            status.append(f"rowcount {len(sdf)} != {len(odf)}")
        if list(sdf.columns) != list(odf.columns):
            status.append(f"cols {list(sdf.columns)} != {list(odf.columns)}")
        if not status:
            # Dtype-strict: the driver hashes canonicalized VALUES, and an
            # int64-vs-float64 skew (e.g. DuckDB SUM(BIGINT) -> HUGEINT ->
            # float64) hashes differently even when values are equal. Any
            # canonical-dtype mismatch after normalize() is a FAIL so the
            # local gate is at least as strict as the driver's hasher.
            for c in sdf.columns:
                if str(sdf[c].dtype) != str(odf[c].dtype):
                    status.append(
                        f"dtype skew on {c!r}: spark={sdf[c].dtype} duckdb={odf[c].dtype}"
                        " (wrap the oracle aggregate in CAST(... AS BIGINT/DOUBLE))"
                    )
        if not status:
            try:
                pd.testing.assert_frame_equal(sdf, odf, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
            except AssertionError as ex:
                status.append(f"values differ: {str(ex)[:300]}")
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            failures += 1
        else:
            print(f"ok   {name}: {len(sdf)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'} / {len(qs) if not only else len(only)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
