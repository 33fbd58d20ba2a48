"""Record linkage: blocked fuzzy join between TWO tables.

Entity resolution's join-shaped sibling of near-dup detection: match
rows of ``left`` to rows of ``right`` whose token sets overlap enough
(Jaccard >= threshold), without ever forming the L×R cross product.

Same scale contract as the n-gram dedup self-join
(operators/dedup.py::ngram_jaccard_pairs), adapted to two tables:

- candidates come from an inverted-index join on tokens whose RIGHT-
  side document frequency is <= ``max_df`` (per-token fan-out is then
  <= df_left(t) * max_df — linear in token volume, never quadratic in
  rows; ubiquitous tokens are blocked from generating candidates but
  still counted in the verify step, so the Jaccard itself stays
  EXACT for every surviving candidate pair),
- verification is restricted to candidate pairs: one aggregate
  counting shared distinct tokens, joined against per-side set sizes
  — |A∩B| / (|A| + |B| - |A∩B|).

A pair ALL of whose shared tokens are above the cap is not generated
(the blocked-join recall contract, identical to LSH banding); at the
default cap that requires every shared token to be near-stopword
frequency, exactly the pairs carrying no linkage signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lance_flink_spark.registry import bcast


def _token_sets(df: DataFrame, id_col: str, text_col: str, side: str) -> DataFrame:
    return (
        df.select(
            F.col(id_col).alias(side),
            F.explode(
                F.array_distinct(
                    F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
                )
            ).alias("token"),
        )
        .filter(F.col("token") != "")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    text_col: str = "text",
    threshold: float = 0.5,
    max_df: int = 100,
) -> DataFrame:
    """(left_id, right_id, jaccard 6dp) for all pairs with token-set
    Jaccard >= threshold among blocked candidates. Deterministic."""
    lt = _token_sets(left, left_id, text_col, "lid").persist()
    rt = _token_sets(right, right_id, text_col, "rid").persist()
    lsz = lt.groupBy("lid").agg(F.count(F.lit(1)).alias("lsz"))
    rsz = rt.groupBy("rid").agg(F.count(F.lit(1)).alias("rsz"))
    # blocking index: right-side tokens under the df cap
    rdf = rt.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    blocked = rt.join(
        bcast(rdf.filter(F.col("df") <= max_df).select("token")), "token"
    )
    cand = (
        lt.join(blocked, "token")
        .select("lid", "rid")
        .distinct()
    )
    # exact verify over candidates: shared-token counts use the FULL
    # token sets (capped tokens count here — only candidate GENERATION
    # is blocked), so the Jaccard value is exact. Join ORDER matters at
    # scale: expanding candidates by the left token set and probing
    # (rid, token) keeps every intermediate bounded by
    # Σ_cand |tokens(lid)| — a raw lt⋈rt token join first would
    # re-create the quadratic hot-token blowup the df cap exists to
    # prevent, with the candidate filter arriving too late to help
    inter = (
        cand.join(lt, "lid")
        .join(rt, ["rid", "token"], "left_semi")
        .groupBy("lid", "rid")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.round(
        F.col("inter") / (F.col("lsz") + F.col("rsz") - F.col("inter")), 6
    )
    out = (
        inter.join(bcast(lsz), "lid")
        .join(bcast(rsz), "rid")
        .filter(jac >= threshold)
        .select(
            F.col("lid").alias(left_id),
            F.col("rid").alias(right_id),
            jac.alias("jaccard"),
        )
    )
    return out
