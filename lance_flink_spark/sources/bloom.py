"""Per-file Bloom-filter sidecar — equality pruning for
HIGH-CARDINALITY columns.

The scalar index's (value, file) inverted sidecar is exact but its
size is Σ per-file distinct values — for an id-like column that is
the table itself, which is why Lance pairs its BTREE with
Bloom-filter (``BLOOM``) scalar indexes and parquet writes optional
per-column bloom filters. This sidecar is the Spark-side analogue:

- one fixed-width bitset per (file), sized from the max per-file
  distinct count and the requested false-positive rate — sidecar
  bytes are O(files × m/8), INDEPENDENT of cardinality;
- hashing is md5 double-hashing (h1 + i·h2 mod m, Kirsch-Mitzenmacher)
  over the value's string form — deterministic, engine-independent,
  reproducible at probe time without touching data files;
- probes read the sidecar (file-count rows), test membership
  driver-side, and scan only candidate files; false positives cost a
  redundant file scan, never a wrong result (the exact predicate is
  re-applied after the scan).

Build is distributed: distinct (file, value) pairs aggregate to a
per-file bitset in applyInPandas (one task per file batch).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from lance_flink_spark.sources import fsio


def _params(ndv: int, fpp: float) -> tuple[int, int]:
    """(m bits, k hashes) for `ndv` insertions at false-positive rate
    `fpp` — the standard Bloom sizing, m rounded up to a whole byte."""
    ndv = max(ndv, 1)
    m = math.ceil(-ndv * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 7) // 8) * 8
    k = max(1, round(m / ndv * math.log(2)))
    return m, k


def _bit_positions(value, m: int, k: int) -> list[int]:
    """Kirsch-Mitzenmacher double hashing off one md5 — the SAME
    function at build and probe time (module-level so executors and
    the driver import one definition)."""
    import hashlib

    d = hashlib.md5(str(value).encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1  # odd → full-period stride
    return [(h1 + i * h2) % m for i in range(k)]


def build_bloom_index(ds, spark: SparkSession, col: str, fpp: float = 0.01) -> int:
    """Build the bloom sidecar for ``col`` at the current version.
    Returns the indexed version. Complements (does not replace) the
    scalar index: use bloom for high-cardinality equality, the scalar
    sidecar for low-cardinality values, ranges, and counts.

    Restricted to string/integral columns: hashing goes through the
    value's string form, and fractional types have more than one
    string spelling per value (1 vs 1.0) — a formatting mismatch
    between build and probe would be a false NEGATIVE, which unlike a
    false positive breaks correctness. Range predicates on fractional
    columns belong to the scalar index anyway."""
    from pyspark.sql import types as T
    import pandas as pd
    from pyspark.sql import functions as F

    from lance_flink_spark.session import ship_package

    schema = ds.read(spark).schema
    if col not in schema.names:
        raise ValueError(f"unknown column {col!r}")
    ok = (T.StringType, T.LongType, T.IntegerType, T.ShortType, T.ByteType)
    if not isinstance(schema[col].dataType, ok):
        raise ValueError(
            f"bloom index requires a string/integral column; {col!r} is "
            f"{schema[col].dataType.simpleString()} (float spellings would "
            "risk false negatives — use the scalar index)"
        )
    ship_package(spark)
    version = ds.versions()[-1]
    pairs = (
        ds._tagged_scan(spark)
        .select("_file", F.col(col).cast("string").alias("v"))
        .dropna()
        .distinct()
    )
    # max per-file NDV sizes ONE uniform bitset width (fixed-width
    # sidecar rows; the count is file-count-bounded driver work)
    ndv_rows = pairs.groupBy("_file").count().collect()
    if not ndv_rows:
        raise ValueError(f"no non-null values to index in {col!r}")
    m, k = _params(max(int(r["count"]) for r in ndv_rows), fpp)

    def make(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        bits = np.zeros(m // 8, dtype=np.uint8)
        for v in pdf["v"]:
            for pos in _bit_positions(v, m, k):
                bits[pos >> 3] |= 1 << (pos & 7)
        return pd.DataFrame(
            {"_file": [pdf["_file"].iloc[0]], "bits": [bytes(bits)]}
        )

    side = pairs.groupBy("_file").applyInPandas(make, "_file string, bits binary")
    out = fsio.join(ds.path, "_bloom_index", col, f"v{version:04d}")
    side.write.mode("overwrite").parquet(out)
    fsio.write_json_atomic(
        fsio.join(ds.path, "_bloom_index", col, "META.json"),
        {"version": version, "col": col, "m": m, "k": k, "fpp": fpp},
    )
    return version


def bloom_candidate_files(ds, spark: SparkSession, col: str, value) -> list[str]:
    """Files that MAY contain ``value`` (exact negatives, fpp-rate
    false positives). Raises on a stale index, like the scalar
    lookups — explicit probes fail loudly."""
    meta_path = fsio.join(ds.path, "_bloom_index", col, "META.json")
    if not fsio.exists(meta_path):
        raise ValueError(f"no bloom index on {col!r} — build_bloom_index first")
    meta = fsio.read_json(meta_path)
    # delete-dv-only staleness stays usable: removals can only turn
    # bloom hits into (re-filtered) false positives, never hide rows
    if not ds._index_version_usable(meta["version"]):
        raise ValueError(
            f"bloom index on {col!r} is stale (indexed v{meta['version']}) — rebuild"
        )
    m, k = int(meta["m"]), int(meta["k"])
    pos = _bit_positions(str(value), m, k)
    side = spark.read.parquet(
        fsio.join(ds.path, "_bloom_index", col, f"v{meta['version']:04d}")
    ).collect()  # file-count rows — bounded driver work
    out = []
    for r in side:
        bits = r["bits"]
        if all(bits[p >> 3] & (1 << (p & 7)) for p in pos):
            out.append(r["_file"])
    return sorted(out)


def read_eq_bloom(
    ds, spark: SparkSession, col: str, value, columns: list[str] | None = None
) -> DataFrame:
    """Equality lookup through the bloom sidecar: scan only candidate
    files, re-apply the exact predicate (false positives cost I/O,
    never correctness)."""
    from pyspark.sql import functions as F

    files = bloom_candidate_files(ds, spark, col, value)
    if not files:
        return ds.read(spark).filter(F.col(col) == F.lit(value)).limit(0)
    df = ds._read_files(
        spark, [ds._relpath(f) for f in files], apply_dv=True
    ).filter(F.col(col) == F.lit(value))
    return df.select(*columns) if columns else df
