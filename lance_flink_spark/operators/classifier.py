"""Distributed quality-classifier training + inference — the
fastText-style linear filter DataComp/Dolma-class pipelines run after
heuristic quality rules (reference scope: the engine's job is the
featurize/train/score dataflow at corpus scale; the model itself is a
linear scorer over hashed token features).

Spark-first shape, every stage a relational plan:

- **Featurize** (`hashed_token_features`): hashing trick — token →
  md5-derived bucket in [0, n_buckets), per-doc bucket counts in
  SPARSE long form (id, bucket, cnt). One explode + one partial-agg
  shuffle; no vocabulary state, so featurization is embarrassingly
  parallel at 100 TB and train/serve skew is impossible (the hash IS
  the vocabulary).
- **Train, closed form** (`log_odds_weights`): multinomial
  Naive-Bayes log-likelihood-ratio weights — w[b] =
  ln((c1[b]+a)/(n1+a·B)) − ln((c0[b]+a)/(n0+a·B)) — computed as one
  groupBy over the labeled features plus a 2-row class-total
  broadcast. Deterministic (integer counts → fixed float arithmetic),
  so the whole train+score pipeline replays relationally in any SQL
  engine — the hash-gated oracle path.
- **Train, iterative** (`train_logistic`): ``pyspark.ml``
  LogisticRegression over the same hashed features assembled into
  fixed-width vectors — the heavier optimizer when calibrated
  probabilities matter. Distributed LBFGS; coefficients come back as
  a plain (bucket, weight) frame feeding the same scorer.
- **Score** (`score_linear`): coefficients are a BROADCAST (bucket,
  weight) side — the dot product is a broadcast hash join + one
  partial-agg sum per doc (pure Catalyst, zero Python in the hot
  path). At 100 TB the scan streams once; only (id, bucket, cnt)
  rows shuffle map-side-combined.

Reference parity: the lance-flink engine ships data TO such filters
(flink-sql-demo.sql's insert-select shapes); this module makes the
filter itself a first-class distributed operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lance_flink_spark.functions.text import md5i


def hashed_token_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """(id, bucket, cnt) hashing-trick features: whitespace tokens of
    lower(trim(text)) → md5i(token) % n_buckets. Sparse long form —
    what shuffles well; dense vectors are a pivot away when an ml
    optimizer needs them."""
    tok = df.select(
        F.col(id_col),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("token"),
    ).filter(F.col("token") != "")
    return (
        tok.withColumn("bucket", md5i(F.col("token")) % n_buckets)
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def log_odds_weights(
    features: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "label",
    n_buckets: int = 64,
    smoothing: float = 1.0,
) -> DataFrame:
    """Closed-form multinomial-NB training: per-bucket log-likelihood-
    ratio weights from the labeled docs' bucket counts. Returns
    (bucket, w) with one row per OBSERVED bucket (unseen buckets score
    the smoothing-only ratio — fold it into the bias if exactness for
    never-seen buckets matters; with md5 hashing over a corpus every
    bucket is observed in practice).

    One shuffle: features join the broadcast labels, groupBy bucket.
    The class token totals are a 2-row aggregate joined back broadcast
    — never a collect. Deterministic float arithmetic (counts are
    integers), so a SQL oracle replays it bit-for-bit up to rounding.
    """
    lab = labels.select(id_col, F.col(label_col).cast("int").alias("__y"))
    tagged = features.join(F.broadcast(lab), id_col)
    per_bucket = tagged.groupBy("bucket").agg(
        F.sum(F.when(F.col("__y") == 1, F.col("cnt")).otherwise(F.lit(0))).alias("c1"),
        F.sum(F.when(F.col("__y") == 0, F.col("cnt")).otherwise(F.lit(0))).alias("c0"),
    )
    totals = per_bucket.agg(
        F.sum("c1").alias("n1"), F.sum("c0").alias("n0")
    )
    a = float(smoothing)
    b = float(n_buckets)
    return per_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("c1") + a) / (F.col("n1") + a * b))
            - F.log((F.col("c0") + a) / (F.col("n0") + a * b))
        ).alias("w"),
    )


def score_linear(
    features: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    bias: float = 0.0,
    round_to: int | None = 6,
) -> DataFrame:
    """(id, score): score = bias + Σ_b cnt[b]·w[b] — the broadcast-
    coefficients dot product as a broadcast hash join + one
    map-side-combined sum per doc. Pure Catalyst; at scale only the
    sparse feature rows move."""
    s = F.sum(F.col("cnt") * F.col("w")) + F.lit(float(bias))
    out = (
        features.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            (F.round(s, round_to) if round_to is not None else s).alias(
                "score"
            )
        )
    )
    return out


def class_prior_bias(
    labels: DataFrame, label_col: str = "label"
) -> DataFrame:
    """1-row (bias) frame: ln(P(y=1)/P(y=0)) with add-one smoothing —
    broadcast-join it (or inline its literal) into score_linear's
    bias. Kept as a frame so the train pipeline stays collect-free."""
    return labels.agg(
        F.log(
            (F.sum(F.col(label_col).cast("int")) + 1.0)
            / (F.sum(1 - F.col(label_col).cast("int")) + 1.0)
        ).alias("bias")
    )


def train_logistic(
    spark: SparkSession,
    features: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "label",
    n_buckets: int = 64,
    reg_param: float = 0.01,
    max_iter: int = 50,
) -> tuple[DataFrame, float]:
    """Distributed LogisticRegression over the hashed features:
    sparse (id, bucket, cnt) rows pivot into fixed-width
    ``pyspark.ml`` sparse vectors per doc (collect_list of (bucket,
    cnt) pairs → SparseVector, one Arrow-batched constructor — the
    vector assembly is the only non-relational step and it is
    per-row-local), LBFGS fits in the JVM, and the coefficients come
    back as a (bucket, w) frame + intercept feeding the SAME
    score_linear broadcast-join scorer — train once, score with a
    plan, never a per-row model UDF in the corpus path."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    lab = labels.select(id_col, F.col(label_col).cast("double").alias("label"))
    dense = (
        features.groupBy(id_col)
        .agg(
            F.aggregate(
                F.collect_list(F.struct("bucket", "cnt")),
                F.array_repeat(F.lit(0.0), n_buckets),
                lambda acc, x: F.transform(
                    acc,
                    lambda v, i: F.when(
                        i == x["bucket"], v + x["cnt"].cast("double")
                    ).otherwise(v),
                ),
            ).alias("arr")
        )
        .withColumn("features", array_to_vector("arr"))
        .join(lab, id_col)
    )
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=False
    )
    model = lr.fit(dense.select("features", "label"))
    coefs = [
        (int(i), float(w)) for i, w in enumerate(model.coefficients.toArray())
    ]
    weights = spark.createDataFrame(coefs, "bucket int, w double")
    return weights, float(model.intercept)
