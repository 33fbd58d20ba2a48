"""Stupid-backoff trigram LM (plans/text_dedup.py::text_trigram_logprob):
branch-exact values on a planted corpus — every backoff level (seen
trigram, bigram backoff, unigram floor) is hit and verified against
hand-computed probabilities. The corpus-scale path is hash-gated by
the text_trigram_logprob extra."""

import math
import os

import pytest
from pyspark.sql import Row


def _run(spark, tmp_path_str, rows):
    """Materialize a mini documents table and run the registry entry."""
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    sf_dir = os.path.join(tmp_path_str, "sf_mini")
    os.makedirs(sf_dir, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    from lance_flink_spark.plans.text_dedup import text_trigram_logprob

    return {
        r["doc_id"]: (r["avg_logp"], r["n_trigrams"])
        for r in text_trigram_logprob(spark, sf_dir).collect()
    }


def test_backoff_branches_exact(spark, tmp_path_str):
    # TRAIN half (even ids): "a b c a b c" → trigrams: abc, bca, cab, abc
    #   tri counts: abc=2, bca=1, cab=1
    #   bi counts:  ab=2, bc=2, ca=1 (from 5 bigram positions)
    #   uni counts: a=2, b=2, c=2  → N=6
    rows = [
        Row(doc_id=0, text="a b c a b c", lang="en", source="s", n_chars=11),
        # SCORE doc 1: "a b c" → one trigram abc: SEEN branch
        #   p = ct(abc)/cb(ab) = 2/2 = 1.0 → ln = 0
        Row(doc_id=1, text="a b c", lang="en", source="s", n_chars=5),
        # SCORE doc 3: "a b a" → trigram "a b a" unseen; bigram "b a"
        #   unseen too (train bigrams ab, bc, ca) → UNIGRAM floor on w3='a':
        #   p = 0.16 * (cu(a)+1)/(N+1) = 0.16 * 3/7
        Row(doc_id=3, text="a b a", lang="en", source="s", n_chars=5),
        # SCORE doc 5: "c b c" → trigram "c b c" unseen... bigram "b c"
        #   IS seen (cb=2), w2='b' cu=2 → BIGRAM branch: p = 0.4 * 2/2 = 0.4
        Row(doc_id=5, text="c b c", lang="en", source="s", n_chars=5),
        # SCORE doc 7: "x y z" → everything OOV → floor with cu(z)=0:
        #   p = 0.16 * 1/7
        Row(doc_id=7, text="x y z", lang="en", source="s", n_chars=5),
    ]
    got = _run(spark, tmp_path_str, rows)
    assert got[1] == (pytest.approx(round(math.log(1.0), 6)), 1)
    assert got[3] == (pytest.approx(round(math.log(0.16 * 3 / 7), 6)), 1)
    assert got[5] == (pytest.approx(round(math.log(0.4 * 2 / 2), 6)), 1)
    assert got[7] == (pytest.approx(round(math.log(0.16 * 1 / 7), 6)), 1)


def test_short_docs_excluded_and_mean_over_positions(spark, tmp_path_str):
    rows = [
        Row(doc_id=0, text="a b c a b c", lang="en", source="s", n_chars=11),
        Row(doc_id=9, text="a b", lang="en", source="s", n_chars=3),  # <3 tokens
        # two positions: "a b c" (seen, p=1) + "b c a" (seen bca: ct=1,
        # cb(bc)=2 → p=.5) → mean log = (0 + ln .5)/2
        Row(doc_id=11, text="a b c a", lang="en", source="s", n_chars=7),
    ]
    got = _run(spark, tmp_path_str, rows)
    assert 9 not in got
    assert got[11] == (pytest.approx(round(math.log(0.5) / 2, 6)), 2)
