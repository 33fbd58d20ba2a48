"""Vector distance expressions — pure Catalyst column expressions.

Parity with the reference's distance computation
(LanceVectorSearch.java:276-286: L2, COSINE, DOT).

These compile to JVM-side ``zip_with``/``aggregate`` higher-order
functions: no Python UDF, no Arrow transfer, fully inside whole-stage
codegen. At 100 TB the distance math runs where the data is, at
columnar-batch speed. All arithmetic in double to keep cross-engine
(DuckDB oracle) parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

METRICS = ("l2", "cosine", "dot")


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Inner product Σ aᵢbᵢ (sequential left fold — same summation
    order as DuckDB's list_inner_product, so results are bit-stable)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_distance(a: Column, b: Column) -> Column:
    """Euclidean distance √Σ(aᵢ-bᵢ)²."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_distance(a: Column, b: Column) -> Column:
    return F.lit(1.0) - cosine_similarity(a, b)


def distance(metric: str, a: Column, b: Column) -> Column:
    """Distance in the reference's convention: lower = closer for L2;
    for COSINE/DOT the reference reports distance with similarity =
    1 - distance (SearchResult.getSimilarity, LanceVectorSearch.java:420)."""
    if metric == "l2":
        return l2_distance(a, b)
    if metric == "cosine":
        return cosine_distance(a, b)
    if metric == "dot":
        return -dot(a, b)
    raise ValueError(f"unknown metric {metric!r}; must be one of {METRICS}")


def score(metric: str, a: Column, b: Column) -> Column:
    """Similarity score, higher = closer (used for DESC top-k)."""
    if metric == "l2":
        return -l2_distance(a, b)
    if metric == "cosine":
        return cosine_similarity(a, b)
    if metric == "dot":
        return dot(a, b)
    raise ValueError(f"unknown metric {metric!r}; must be one of {METRICS}")
