"""Deterministic sampling + chunking semantics."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from lance_flink_spark.functions.text import chunk_tokens
from lance_flink_spark.operators.sampling import (
    deterministic_sample,
    train_val_test_split,
)
from lance_flink_spark.registry import table

from conftest import SF_DIR


def test_split_is_stable_and_partitions_everything(spark):
    d = table(spark, SF_DIR, "documents")
    s1 = train_val_test_split(d, "doc_id").groupBy("split").count().collect()
    s2 = train_val_test_split(d, "doc_id").groupBy("split").count().collect()
    assert {r["split"]: r["count"] for r in s1} == {r["split"]: r["count"] for r in s2}
    assert sum(r["count"] for r in s1) == d.count()
    counts = {r["split"]: r["count"] for r in s1}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_deterministic_sample_is_subset_monotone(spark):
    d = table(spark, SF_DIR, "documents")
    small = {r["doc_id"] for r in deterministic_sample(d, "doc_id", 10).collect()}
    big = {r["doc_id"] for r in deterministic_sample(d, "doc_id", 50).collect()}
    assert small <= big  # buckets nest: 10% sample is inside the 50% one
    assert 0 < len(small) < len(big) < d.count()


def test_chunking_covers_all_tokens_with_overlap(spark):
    text = " ".join(f"w{i}" for i in range(80))
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    chunks = df.select(F.explode(chunk_tokens(F.col("text"), 32, 8)).alias("c")).collect()
    # stride 24 over 80 tokens → starts 1,25,49,73
    assert [c["c"]["start"] for c in chunks] == [1, 25, 49, 73]
    assert chunks[0]["c"]["n_chunk_tokens"] == 32
    assert chunks[-1]["c"]["n_chunk_tokens"] == 8  # tail chunk
    first, second = chunks[0]["c"]["chunk_text"].split(), chunks[1]["c"]["chunk_text"].split()
    assert first[-8:] == second[:8]  # overlap region shared


def test_chunking_short_doc_single_chunk(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    chunks = df.select(F.explode(chunk_tokens(F.col("text"), 32, 8)).alias("c")).collect()
    assert len(chunks) == 1 and chunks[0]["c"]["n_chunk_tokens"] == 3


def test_chunking_validates_overlap():
    with pytest.raises(ValueError):
        chunk_tokens(F.lit("x"), chunk_size=8, overlap=8)


def test_shard_by_token_budget_invariants(spark):
    """Distributed prefix-sum sharding vs a single-machine reference:
    identical assignment, contiguity in the seeded order, and the
    budget bound (a shard exceeds `budget` by at most one document)."""
    import hashlib

    from pyspark.sql import Row

    from lance_flink_spark.operators.packing import shard_by_token_budget

    import numpy as np

    rng = np.random.default_rng(5)
    toks = {i: int(rng.integers(1, 400)) for i in range(137)}
    df = spark.createDataFrame(
        [Row(doc_id=i, n_tok=toks[i]) for i in toks]
    )
    budget = 1500
    out = {
        r["doc_id"]: r["shard_id"]
        for r in shard_by_token_budget(df, budget, seed="p").collect()
    }
    assert set(out) == set(toks)
    # single-machine reference: same md5 order, same running-sum cut
    order = sorted(toks, key=lambda i: (hashlib.md5(f"p:{i}".encode()).hexdigest(), i))
    cum, ref = 0, {}
    for i in order:
        cum += toks[i]
        ref[i] = (cum - 1) // budget
    assert out == ref
    # budget bound: every shard's total < budget + its largest doc
    per_shard: dict = {}
    for i, s in out.items():
        per_shard.setdefault(s, []).append(toks[i])
    for s, sizes in per_shard.items():
        assert sum(sizes) < budget + max(sizes)
    # deterministic across invocations
    again = {
        r["doc_id"]: r["shard_id"]
        for r in shard_by_token_budget(df, budget, seed="p").collect()
    }
    assert again == out


def test_seeded_shuffle_deterministic_balanced_distributed(spark):
    import hashlib

    from lance_flink_spark.operators.sampling import seeded_shuffle

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    out = seeded_shuffle(df, "doc_id", seed=7, n_shards=8)
    rows = {r["doc_id"]: (r["ord"], r["shard"], r["pos_in_shard"]) for r in out.collect()}
    # single-machine reference: md5 order, round-robin shards
    order = sorted(range(1000), key=lambda i: (hashlib.md5(f"7:{i}".encode()).hexdigest(), i))
    for rank, i in enumerate(order, start=1):
        assert rows[i] == (rank, (rank - 1) % 8, (rank - 1) // 8), i
    # different seed -> different order (with overwhelming probability)
    other = seeded_shuffle(df, "doc_id", seed=8, n_shards=8)
    assert (
        out.select("doc_id", "ord")
        .join(other.select("doc_id", F.col("ord").alias("o2")), "doc_id")
        .filter("ord != o2")
        .count()
        > 0
    )
    # shard sizes differ by at most one (round-robin invariant)
    sizes = [r["n"] for r in out.groupBy("shard").count().withColumnRenamed("count", "n").collect()]
    assert max(sizes) - min(sizes) <= 1
    # the global order never funnels through one task
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan


def test_temperature_mixture(spark):
    """r15: α-sampling plan + materialization — upsampled small
    domains get full epoch copies, the majority downsamples, the
    multiset is deterministic, and the apply path is map-only (no
    shuffle after the broadcast plan join)."""
    from pyspark.sql import functions as F

    from lance_flink_spark.operators.sampling import (
        apply_temperature_mixture,
        temperature_mixture_plan,
    )

    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "small", 100) for i in range(100)],
        "doc_id long, lang string, n_chars long",
    )
    plan = temperature_mixture_plan(
        df, budget=10_000, alpha=0.5, domain_col="lang",
        weight_col="n_chars",
    )
    rows = {r["lang"]: r for r in plan.collect()}
    # alpha=0.5 shifts mass to the small domain: repeat > 1 there,
    # < 1 for the big one; total planned tokens ~= budget
    assert rows["small"]["r_pm"] > 1000 > rows["big"]["r_pm"]
    planned = sum(r["tokens"] * r["r_pm"] / 1000 for r in rows.values())
    assert abs(planned - 10_000) < 200
    out = apply_temperature_mixture(df, plan)
    got = out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"), F.max("copy").alias("mx")
    )
    g = {r["lang"]: r for r in got.collect()}
    assert g["small"]["mx"] >= 1  # upsampling produced epoch copies
    assert g["big"]["mx"] == 0
    assert g["big"]["n"] < 90  # downsampled
    # deterministic: the exact multiset reproduces
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, apply_temperature_mixture(df, plan).collect()))
    assert a == b
    # map-only apply: no Exchange above the broadcast join
    plan_str = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_str or "BroadcastNestedLoop" in plan_str
    head = plan_str.split("Generate", 1)[0]
    assert "Exchange hashpartitioning" not in head
