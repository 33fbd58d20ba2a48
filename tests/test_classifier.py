"""Quality-classifier operator (operators/classifier.py): hashed
featurization, closed-form NB log-odds training, pyspark.ml
LogisticRegression training, and the shared broadcast-join scorer —
gated on PLANTED labels (two token vocabularies with overlap), the
separation contract a filter must actually deliver. The relational
(hash-oracle) path is additionally gated end-to-end by the
classifier_quality_filter extra."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from lance_flink_spark.operators.classifier import (
    class_prior_bias,
    hashed_token_features,
    log_odds_weights,
    score_linear,
    train_logistic,
)

GOOD = ["clear", "prose", "informative", "article", "reference", "study"]
BAD = ["buy", "click", "winner", "casino", "free", "pills"]
COMMON = ["the", "a", "of", "and"]


def _docs(spark, n=120, seed=3):
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        label = i % 2
        vocab = (GOOD if label else BAD) + COMMON
        words = [vocab[rng.randrange(len(vocab))] for _ in range(30)]
        rows.append(Row(doc_id=i, text=" ".join(words), label=label))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_hashed_features_shape_and_determinism(spark):
    d = _docs(spark, n=10)
    f1 = hashed_token_features(d, n_buckets=32).collect()
    f2 = hashed_token_features(d, n_buckets=32).collect()
    assert sorted(map(tuple, f1)) == sorted(map(tuple, f2))
    assert all(0 <= r["bucket"] < 32 for r in f1)
    # per-doc token counts are conserved
    total = sum(r["cnt"] for r in f1)
    assert total == sum(len(r["text"].split()) for r in d.collect())


def test_nb_log_odds_separates_planted_labels(spark):
    d = _docs(spark)
    labels = d.select("doc_id", "label")
    feats = hashed_token_features(d, n_buckets=64)
    # train on even ids, judge on odd ids (disjoint docs, same vocab)
    w = log_odds_weights(feats, labels.filter("doc_id % 4 < 2"), n_buckets=64)
    scored = score_linear(
        feats.join(d.filter("doc_id % 4 >= 2").select("doc_id"), "doc_id", "left_semi"),
        w,
    ).join(labels, "doc_id")
    rows = scored.collect()
    assert rows
    acc = sum((r["score"] > 0) == (r["label"] == 1) for r in rows) / len(rows)
    assert acc >= 0.95, f"NB separation too weak: {acc}"


def test_nb_scorer_plan_is_broadcast_join(spark):
    """The dot product must be a broadcast hash join + partial agg —
    no shuffle of the coefficients side, no Python in the plan."""
    d = _docs(spark, n=20)
    feats = hashed_token_features(d, n_buckets=64)
    w = log_odds_weights(feats, d.select("doc_id", "label"), n_buckets=64)
    plan = (
        score_linear(feats, w)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_logistic_regression_separates_and_scores_via_join(spark):
    d = _docs(spark)
    labels = d.select("doc_id", "label")
    feats = hashed_token_features(d, n_buckets=64)
    weights, intercept = train_logistic(
        spark, feats, labels, n_buckets=64, reg_param=0.01, max_iter=30
    )
    scored = score_linear(feats, weights, bias=intercept).join(labels, "doc_id")
    rows = scored.collect()
    acc = sum((r["score"] > 0) == (r["label"] == 1) for r in rows) / len(rows)
    assert acc >= 0.95, f"LR separation too weak: {acc}"


def test_class_prior_bias_value(spark):
    labels = spark.createDataFrame(
        [Row(doc_id=i, label=int(i < 30)) for i in range(100)],
        "doc_id long, label int",
    )
    import math

    got = class_prior_bias(labels).first()["bias"]
    assert got == pytest.approx(math.log(31 / 71))
