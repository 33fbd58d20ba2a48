"""End-to-end training-data pipeline composition: the operators a
corpus build chains together, with conservation invariants pinned at
every stage (the data-pipeline sibling of test_sql's lakehouse
lifecycle)."""

from conftest import SF_DIR

from lance_flink_spark.registry import table


def test_training_corpus_build_end_to_end(spark, tmp_path_str):
    from pyspark.sql import functions as F

    from lance_flink_spark.functions.text import chunk_tokens, token_count
    from lance_flink_spark.operators.dedup import decontaminate, exact_dedup
    from lance_flink_spark.operators.packing import shard_by_token_budget
    from lance_flink_spark.sources.dataset import Dataset

    docs = table(spark, SF_DIR, "documents")
    n0 = docs.count()

    # 1. quality gate: keep docs with enough tokens
    kept = docs.filter(token_count(F.col("text")) >= 10).select("doc_id", "text")
    n1 = kept.count()
    assert 0 < n1 <= n0

    # 2. exact dedup: keep the first doc of each fingerprint class
    keepers = exact_dedup(kept, text_col="text", id_col="doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    deduped = kept.join(keepers, "doc_id", "left_semi")
    n2 = deduped.count()
    assert 0 < n2 <= n1

    # 3. decontaminate against a fake benchmark (the first 5 docs):
    #    flagged docs are anti-joined away
    bench = kept.orderBy("doc_id").limit(5).select("text")
    flagged = decontaminate(deduped, bench, n=5)
    clean = deduped.join(flagged, "doc_id", "left_anti")
    n3 = clean.count()
    assert 0 < n3 < n2  # the planted overlap is caught

    # 4. chunk into overlapping token windows; every doc chunks
    chunks = clean.select(
        "doc_id", F.explode(chunk_tokens(F.col("text"), 64, 16)).alias("chunk")
    )
    assert chunks.count() >= n3
    assert chunks.select("doc_id").distinct().count() == n3

    # 5. shard by token budget over a seeded permutation
    sized = clean.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tok"),
    )
    shards = shard_by_token_budget(sized, budget=2000, seed="e2e")
    assert shards.count() == n3
    per_shard = shards.groupBy("shard_id").agg(
        F.sum("n_tok").alias("t"), F.max("n_tok").alias("m")
    )
    assert all(r["t"] < 2000 + r["m"] for r in per_shard.collect())

    # 6. land the final corpus as a versioned Dataset and index it
    ds = Dataset(tmp_path_str + "/corpus")
    ds.write(clean.join(shards, "doc_id"))
    ds.build_scalar_index(spark, "shard_id")
    some_shard = shards.first()["shard_id"]
    assert ds.count_eq(spark, "shard_id", some_shard) == shards.filter(
        F.col("shard_id") == some_shard
    ).count()
    assert ds.read(spark).count() == n3
