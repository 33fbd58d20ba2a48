"""Deduplication operators for LLM-data pipelines.

All are single-pass DataFrame pipelines designed so candidate
generation is *blocked* (hash buckets / LSH bands / sign buckets) —
never an unblocked O(n²) self-join — which is what keeps them viable
at 100 TB:

- exact: fingerprint groupBy (1 shuffle on the hash).
- minhash LSH: K signature components via min-over-shingle-hashes;
  candidate pairs must share a (component, value) bucket — the join
  key is the bucket, so the shuffle carries docs-per-bucket, not
  pairs.
- simhash: 16-bit sign-of-weighted-sum signature; pairs compared
  within lang blocks by hamming distance.
- n-gram jaccard: exact set jaccard via shingle-inverted-index
  self-join (blocked on lang).
- embedding: cosine pairs blocked on an md5-seeded random-hyperplane
  sign signature with a bucket-size cap (deterministic — no RNG state,
  so the DuckDB oracle embeds identical hyperplane literals).

Hashing is md5-derived (functions.text.md5i) so every engine with
md5() reproduces the exact signatures — the oracle gate runs the same
math in DuckDB SQL.
"""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from lance_flink_spark.functions import vector as V
from lance_flink_spark.functions.text import fingerprint, md5i, word_shingles


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups by content fingerprint; keeps the smallest id.
    Returns (keep_id, n_copies)."""
    return (
        df.groupBy(fingerprint(F.col(text_col)).alias("fp"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_id", "n_copies")
    )


def _provision_explode(df: DataFrame) -> DataFrame:
    """Shingle/fingerprint explodes multiply per-input-row work by
    ~n_tokens, so a scan with fewer splits than cores starves the
    heavy stage (a small corpus is one parquet split — the explode
    then runs 2 tasks on 32 cores; measured 3.1s → 0.7s for
    cut_repeated_spans at sf0.1). The repartition shuffles only raw
    text bytes, orders of magnitude under the explode's output; at
    production scale the input already has more splits than cores and
    this is a no-op.

    The parallelism probe must not EXECUTE the frame: under AQE,
    ``df.rdd`` finalizes the adaptive plan by RUNNING its intermediate
    shuffle stages, so a caller-supplied post-join/post-agg frame
    would pay for its upstream stages twice. A frame whose physical
    plan carries an Exchange (or a subquery) already re-provisions
    through spark.sql.shuffle.partitions — leave it alone; only
    scan-shaped lineage (no exchange → AQE never engages → ``.rdd``
    is pure lineage construction, zero jobs) is probed. Residual
    (accepted): AQE may coalesce a shuffle-fed frame's tiny output
    below cluster parallelism before the explode; the default
    ``coalescePartitions.parallelismFirst=true`` floors the coalesce
    at defaultParallelism, and A/B at sf0.1 shows no regression —
    reintroducing the probe would re-execute callers' upstream
    stages, a strictly worse trade."""
    target = df.sparkSession.sparkContext.defaultParallelism
    # executedPlan is built lazily — toString() renders the INITIAL
    # adaptive plan without materializing any stage. AQE wraps a plan
    # iff it has exchanges or subqueries, so the wrapper's presence is
    # exactly the "probing .rdd would run jobs" signal.
    plan = df._jdf.queryExecution().executedPlan().toString()
    if (
        "AdaptiveSparkPlan" in plan
        or "Exchange" in plan
        or "Subquery" in plan
    ):
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _shingle_df(df: DataFrame, text_col: str, id_col: str, block_col: str | None) -> DataFrame:
    cols = [F.col(id_col)] + ([F.col(block_col)] if block_col else [])
    return (
        _provision_explode(df)
        .select(*cols, F.explode(word_shingles(F.col(text_col))).alias("gram"))
        .distinct()
    )


# universal-hash family for minhash: h_i(x) = (A[i]*h + B[i]) mod P with
# one md5-derived base hash h < 2^32. A[i] < 2^31 keeps A*h < 2^63 (no
# overflow in either engine); P = 2^61-1. Constants are the single
# source of truth for both the Spark plan and the DuckDB oracle.
MINHASH_P = (1 << 61) - 1
MINHASH_A = [(2 * i + 1) * 2654435761 % (1 << 31) for i in range(64)]
MINHASH_B = [(i * 40503 * 65537 + 1) % (1 << 31) for i in range(64)]


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 16
) -> DataFrame:
    """(id, component i ∈ [0,k), sig) — sig_i = min over shingles of
    (A_i·md5i(shingle)+B_i) mod P.

    One md5 per shingle; the k mins are k aggregate columns over the
    shingle rows, so partial (map-side) aggregation collapses each
    partition to one row per doc before the only shuffle. The k-row
    (id, i, sig) shape is unpacked afterwards from doc-level rows.

    No distinct() on shingles: min over a multiset equals min over its
    set, so the dedup shuffle would be pure waste."""
    grams = _provision_explode(df).select(
        id_col, F.explode(word_shingles(F.col(text_col))).alias("gram")
    )
    h = grams.select(id_col, md5i(F.col("gram")).alias("h"))
    sigs_wide = h.groupBy(id_col).agg(
        *[
            F.min((F.lit(MINHASH_A[i]) * F.col("h") + F.lit(MINHASH_B[i])) % MINHASH_P).alias(f"s{i}")
            for i in range(k)
        ]
    )
    pairs = F.array(
        *[F.struct(F.lit(i).alias("i"), F.col(f"s{i}").alias("sig")) for i in range(k)]
    )
    return sigs_wide.select(id_col, F.explode(pairs).alias("e")).select(
        id_col, F.col("e.i").alias("i"), F.col("e.sig").alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    min_matches: int = 8,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: share ≥ min_matches of k minhash
    components (est. jaccard ≥ min_matches/k). Join key is
    (component, signature value) — a bucket join, never all-pairs.

    ``max_bucket`` caps the docs per (component, sig) bucket: a corpus
    of degenerate documents (empty/near-empty, all sharing a handful of
    shingles) collapses every component onto one signature, making the
    bucket join O(n²) in that bucket. Buckets above the cap are dropped
    entirely — their members are either exact dups (cheaper via
    exact_dedup) or signature collisions with no near-dup signal. Hot
    keys are found with a partially-aggregated groupBy (map-side
    combine collapses each partition to one row per key) and removed
    with a broadcast anti-join — by construction there are at most
    n·k/max_bucket hot keys, so the broadcast side stays tiny no matter
    how skewed the corpus is, and no window sort is paid.

    Storage lifetime: the signature frame stays persisted because the
    returned lazy frame references it; after materializing results,
    call ``lance_flink_spark.unpersist_all(spark)`` to release it."""
    # persist: the signature frame (shingle explode + md5 + k-way agg)
    # feeds the hot-key aggregate and both self-join sides
    sigs = minhash_signatures(df, text_col, id_col, k).persist()
    if max_bucket is not None:
        hot = (
            sigs.groupBy("i", "sig")
            .agg(F.count(F.lit(1)).alias("bsz"))
            .filter(F.col("bsz") > max_bucket)
            .select("i", "sig")
        )
        sigs = sigs.join(F.broadcast(hot), ["i", "sig"], "left_anti")
    a = sigs.select(F.col(id_col).alias("id_a"), "i", "sig")
    b = sigs.select(F.col(id_col).alias("id_b"), "i", "sig")
    return (
        a.join(b, ["i", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .filter(F.col("n_matches") >= min_matches)
    )


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """(id, sig): bit j of sig = majority vote of bit j over shingle
    hashes (classic simhash, 16-bit for cross-engine int safety)."""
    grams = _shingle_df(df, text_col, id_col, None)
    h = grams.select(id_col, md5i(F.col("gram")).alias("h"))
    # one aggregate column per bit → map-side partial agg collapses to
    # one row per doc per partition; no bit-explode of the shingle rows
    votes = h.groupBy(id_col).agg(
        *[
            F.sum(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{j}")
            for j in range(bits)
        ]
    )
    sig = sum(
        (F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0)) for j in range(bits)),
        start=F.lit(0),
    )
    return votes.select(id_col, sig.cast("long").alias("sig"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str = "lang",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by simhash hamming distance.

    Candidate generation is BANDED (multi-index Hamming search): the
    16-bit signature splits into ``bands`` equal slices; two signatures
    within ``max_hamming`` must share at least one identical band
    whenever max_hamming < bands (pigeonhole) — so joining on
    (block, band_id, band_value) is EXACT, never all-pairs. The
    candidate shuffle carries per-band buckets instead of N²/block."""
    bits = 16
    sigs = simhash_signatures(df, text_col, id_col, bits=bits).join(
        df.select(id_col, block_col), id_col
    )
    if max_hamming >= bands:
        # banding can't guarantee a shared band — fall back to
        # all-pairs within blocks (exact, for loose thresholds)
        a0 = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"), block_col)
        b0 = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"), block_col)
        return (
            a0.join(b0, block_col)
            .filter(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a",
                "id_b",
                F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("long").alias("hamming"),
            )
            .filter(F.col("hamming") <= max_hamming)
        )
    width = bits // bands
    mask = (1 << width) - 1

    def band_val(sig, b):
        return F.shiftright(sig, b * width).bitwiseAND(F.lit(mask))

    banded = sigs.select(
        id_col,
        "sig",
        block_col,
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), band_val(F.col("sig"), b).alias("bv"))
                for b in range(bands)
            ])
        ).alias("e"),
    ).select(id_col, "sig", block_col, F.col("e.band").alias("band"), F.col("e.bv").alias("bv"))
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"), block_col, "band", "bv"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"), block_col, "band", "bv"
    )
    # first-matching-band rule: a pair is emitted only by the lowest
    # band where its values agree — every earlier band must differ.
    # Replaces a pair-level distinct() (an extra full shuffle) with a
    # row-local filter.
    earlier_bands_differ = F.lit(True)
    for j in range(bands - 1):
        earlier_bands_differ = earlier_bands_differ & (
            (F.col("band") <= j)
            | (band_val(F.col("sig_a"), j) != band_val(F.col("sig_b"), j))
        )
    return (
        a.join(b, [block_col, "band", "bv"])
        .filter((F.col("id_a") < F.col("id_b")) & earlier_bands_differ)
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_candidates(
    grams: DataFrame, id_col: str, block_col: str, max_df: int
) -> DataFrame:
    """Distinct candidate pairs sharing ≥1 shingle whose document
    frequency (within its block) is ≤ ``max_df``.

    The df-cap is what bounds the inverted-index self-join at scale:
    uncapped, an ultra-common shingle with document frequency d emits
    d·(d-1)/2 pairs — Σ df(gram)² blows up quadratically on stopword-y
    shingles at 100 TB. Capped, every bucket emits ≤ max_df·(max_df-1)/2
    pairs, so total candidates ≤ (Σ df)·max_df/2 — linear in corpus
    shingle volume. Pairs whose ONLY shared shingles are above the cap
    are missed — those shingles are by definition background phrases
    carrying ~zero near-dup signal (the recall loss SCALE.md accepts)."""
    dfreq = grams.groupBy(block_col, "gram").agg(F.count(F.lit(1)).alias("gdf"))
    capped = grams.join(
        dfreq.filter(F.col("gdf") <= max_df).select(block_col, "gram"),
        [block_col, "gram"],
    )
    a = capped.select(F.col(id_col).alias("id_a"), F.col(block_col).alias("blk"), "gram")
    b = capped.select(F.col(id_col).alias("id_b"), F.col(block_col).alias("blk"), "gram")
    return (
        a.join(b, ["blk", "gram"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str = "lang",
    threshold: float = 0.6,
    max_df: int | None = 1000,
) -> DataFrame:
    """Shingle-set jaccard via inverted-index self-join, blocked on
    ``block_col``. Returns (id_a, id_b, jaccard rounded 6dp).

    With ``max_df`` set (the default — scale path), candidate pairs come
    from the df-capped inverted index and the jaccard of each candidate
    is then verified EXACTLY over the full shingle sets. The exact
    intersection is assembled as capped-count + over-cap-count: the
    capped bucket join already counts the shared ≤max_df shingles per
    pair (no re-count), and only the shared ABOVE-cap shingles — a few
    distinct grams, restricted to candidate pairs — are joined on top.
    The shingle frame is computed ONCE: document frequency is a count
    over a (block, gram) window — no separate dfreq aggregate+join —
    and the tagged frame is persisted, so sizes, both capped join
    sides and the over-cap slices all read the same cached scan (the
    r2 shape recomputed the explode+distinct ~5×; at cluster scale
    substitute a scratch dataset for the persist). ``max_df=None`` is
    the uncapped fully-exact path. The persisted shingle frame is
    released by ``lance_flink_spark.unpersist_all(spark)`` once the
    caller has materialized the results."""
    from pyspark.sql import Window

    if max_df is None:
        grams = _shingle_df(df, text_col, id_col, block_col).persist()
        sizes = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
        a = grams.select(F.col(id_col).alias("id_a"), F.col(block_col).alias("blk"), "gram")
        b = grams.select(F.col(id_col).alias("id_b"), F.col(block_col).alias("blk"), "gram")
        inter = (
            a.join(b, ["blk", "gram"])
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        # one wide exchange: repartition on (block, gram) up front —
        # hash(block, gram) co-partitions both the shingle distinct
        # (key superset) and the document-frequency window, so neither
        # adds its own shuffle
        raw = df.select(
            F.col(id_col), F.col(block_col),
            F.explode(word_shingles(F.col(text_col))).alias("gram"),
        ).repartition(F.col(block_col), F.col("gram"))
        tagged = raw.distinct().withColumn(
            "gdf", F.count(F.lit(1)).over(Window.partitionBy(block_col, "gram"))
        ).persist()
        sizes = tagged.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
        capped = tagged.filter(F.col("gdf") <= max_df)
        a = capped.select(F.col(id_col).alias("id_a"), F.col(block_col).alias("blk"), "gram")
        b = capped.select(F.col(id_col).alias("id_b"), F.col(block_col).alias("blk"), "gram")
        # candidate pairs AND their capped-shingle intersection in one
        # bucket join — every bucket emits ≤ max_df·(max_df-1)/2 pairs
        inter_c = (
            a.join(b, ["blk", "gram"])
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter_c"))
        )
        over_a = tagged.filter(F.col("gdf") > max_df).select(
            F.col(id_col).alias("id_a"), "gram"
        )
        over_b = tagged.filter(F.col("gdf") > max_df).select(
            F.col(id_col).alias("id_b"), "gram"
        )
        # shared above-cap shingles, candidate-restricted: the row count
        # is Σ_cand |overcap grams(id_a)| — bounded because above-cap
        # grams are few DISTINCT values per doc
        inter_o = (
            inter_c.select("id_a", "id_b")
            .join(over_a, "id_a")
            .join(over_b, ["id_b", "gram"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("inter_o"))
        )
        inter = (
            inter_c.join(inter_o, ["id_a", "id_b"], "left")
            .select(
                "id_a",
                "id_b",
                (F.col("inter_c") + F.coalesce(F.col("inter_o"), F.lit(0))).alias("inter"),
            )
        )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    # filter on the ROUNDED value so the cutoff is bit-identical across
    # engines (the oracle applies the same rounded threshold)
    jac = F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6)
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= threshold)
        .select("id_a", "id_b", jac.alias("jaccard"))
    )


def rademacher_planes(dim: int, nbits: int, salt: str = "rh") -> list[list[int]]:
    """±1 hyperplane entries derived from md5(salt:plane:dim) —
    deterministic and engine-independent, so the DuckDB oracle embeds
    the identical literals. Rademacher entries are a standard
    random-hyperplane family for cosine LSH (sign agreement probability
    = 1 - angle/π, Charikar'02)."""
    import hashlib

    return [
        [
            1 if hashlib.md5(f"{salt}:{j}:{d}".encode()).digest()[0] & 1 else -1
            for d in range(dim)
        ]
        for j in range(nbits)
    ]


def embedding_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.8,
    sign_bits: int = 8,
    dim: int | None = None,
    max_bucket: int | None = None,
    drop_stats: dict | None = None,
) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold among rows sharing
    a ``sign_bits``-bit random-hyperplane signature. Returns
    (id_a, id_b, cosine 6dp).

    Blocking uses md5-seeded Rademacher hyperplanes, NOT the raw sign
    of leading dimensions: data-derived sign blocks collapse to a
    single O(n²) bucket on non-centered embedding families (ReLU-style
    all-positive dims), while random projections of any direction split
    ~50/50 per bit. Scaled copies (the archetypal near-dup) still share
    every bit exactly.

    ``max_bucket`` caps the bucket size: buckets holding more rows are
    dropped from pair generation entirely (mirrors the shingle df-cap —
    a hot bucket at 100 TB means the bits carry no signal for that
    region, and its pairs would be O(bucket²)). Pass ``drop_stats={}``
    to eagerly count dropped rows into it (runs one small job)."""
    from pyspark.sql.functions import pandas_udf

    from lance_flink_spark.session import ship_package

    ship_package(df.sparkSession)
    # planes are derived per observed batch dimension when dim is not
    # given (the hash is deterministic per (salt, plane, d), so every
    # executor derives identical planes for the same width); passing an
    # explicit dim just pins the expectation with a clear error
    planes_cache: dict[int, np.ndarray] = {}
    if dim is not None:
        planes_cache[dim] = np.array(rademacher_planes(dim, sign_bits), dtype=np.float64)
    powers = np.array([2**j for j in range(sign_bits)], dtype=np.int64)

    # Arrow-batched matmul signature: (batch × dim) @ (dim × bits) in
    # BLAS — one UDF call per batch. A Catalyst literal expression for
    # the same math is bits×dim leaf nodes (512 at dim=64, 6k at
    # dim=768): per-query analysis+codegen cost dwarfs the row work.
    # Accumulation-order float divergence vs the oracle's sequential
    # list_inner_product only matters within ~1e-13 of a hyperplane —
    # vanishingly unlikely and the test corpus sits nowhere near it.
    @pandas_udf("long")
    def rh_sig(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy()).astype(np.float64)
        d = x.shape[1]
        if dim is not None and d != dim:
            raise ValueError(f"embedding dim {d} != declared dim {dim}")
        if d not in planes_cache:
            planes_cache[d] = np.array(
                rademacher_planes(d, sign_bits), dtype=np.float64
            )
        bits = (x @ planes_cache[d].T) >= 0
        return pd.Series((bits * powers).sum(1))

    # persist: the signature otherwise recomputes for the bucket-size
    # aggregate and BOTH self-join sides
    e = df.select(F.col(id_col), F.col(vec_col), rh_sig(F.col(vec_col)).alias("blk")).persist()
    if max_bucket is not None:
        bsz = e.groupBy("blk").agg(F.count(F.lit(1)).alias("bsz"))
        if drop_stats is not None:
            dropped = e.join(
                F.broadcast(bsz.filter(F.col("bsz") > max_bucket)), "blk"
            ).count()
            drop_stats["dropped_rows"] = dropped
        # ≤ 2^sign_bits bucket rows — always broadcastable
        e = e.join(
            F.broadcast(bsz.filter(F.col("bsz") <= max_bucket).select("blk")), "blk"
        )
    a = e.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "blk")
    b = e.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "blk")
    cos = F.round(V.cosine_similarity(F.col("va"), F.col("vb")), 6)
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cos >= threshold)
        .select("id_a", "id_b", cos.alias("cosine"))
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination — the training-pipeline hygiene step
    (published practice: GPT-3 paper appendix C, Llama pretraining):
    flag corpus documents sharing at least one word n-gram with an
    evaluation set. Returns (id, n_hits) with n_hits = count of
    DISTINCT shared n-grams; consumers anti-join to drop, or threshold
    on n_hits.

    Scale shape: the eval side reduces to DISTINCT n-grams of a
    benchmark — tiny next to a 100 TB corpus — so it broadcasts. The
    corpus side is ONE scan + explode with a map-side broadcast
    semi-join; the only corpus shuffle is the final per-doc count,
    which partial-aggregates. Never a corpus×corpus join."""
    ev = (
        eval_df.select(F.explode(word_shingles(F.col(text_col), n)).alias("gram"))
        .distinct()
    )
    cg = corpus.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("gram")
    )
    # broadcast semi-join FIRST (map-side, no corpus shuffle), then
    # dedupe only the matched rows — counting distinct shared grams is
    # identical whether the dedup runs before or after the filter, but
    # the shuffle shrinks from the whole exploded corpus to the matches
    return (
        cg.join(F.broadcast(ev), "gram")
        .distinct()
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def source_overlap(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    n: int = 3,
    max_sources_per_gram: int | None = None,
) -> DataFrame:
    """Pairwise cross-source content overlap — the corpus-analytics
    signal behind training-mix design (which sources re-publish each
    other's text): count of DISTINCT word n-grams shared by each
    source pair. Returns (source_a, source_b, n_shared_grams) with
    source_a < source_b.

    Scale shape: one scan + explode to DISTINCT (gram, source) — the
    shuffle key is the gram, and the per-gram pair fan-out is bounded
    by the SOURCE count (tiny), never the document count. With
    thousands of sources set ``max_sources_per_gram`` to drop
    ubiquitous grams (stopword phrases) — the same df-cap idea as
    ngram_jaccard_pairs; a gram in nearly every source carries no
    mix-design information anyway."""
    gs = df.select(
        F.col(source_col).alias("src"),
        F.explode(word_shingles(F.col(text_col), n)).alias("gram"),
    ).distinct()
    if max_sources_per_gram is not None:
        from pyspark.sql import Window

        gs = gs.withColumn(
            "sdf", F.count(F.lit(1)).over(Window.partitionBy("gram"))
        ).filter(F.col("sdf") <= max_sources_per_gram).drop("sdf")
    a = gs.select(F.col("src").alias("source_a"), "gram")
    b = gs.select(F.col("src").alias("source_b"), "gram")
    return (
        a.join(b, "gram")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


def incremental_near_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    min_matches: int = 8,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Near-duplicate incremental ingest: (batch_id, corpus_id,
    n_matches) for batch documents sharing ≥ ``min_matches`` of k
    minhash components with an EXISTING corpus document (est. jaccard
    ≥ min_matches/k). Consumers anti-join the batch on batch_id to
    admit only novel documents. Same signature math as
    minhash_lsh_pairs, so a stored corpus-signature table is reusable
    across ingests.

    Scale shape: a batch×corpus bucket join on (component, sig) —
    never batch×corpus rows. The corpus side is the expensive scan; in
    production persist its signature frame once (it is append-only —
    new admissions just add signature rows). ``max_bucket`` caps
    per-bucket corpus docs exactly as in minhash_lsh_pairs (hot keys
    are broadcast anti-joined away from BOTH sides)."""
    bs = minhash_signatures(batch, text_col, id_col, k)
    cs = minhash_signatures(corpus, text_col, id_col, k)
    if max_bucket is not None:
        hot = (
            cs.groupBy("i", "sig")
            .agg(F.count(F.lit(1)).alias("bsz"))
            .filter(F.col("bsz") > max_bucket)
            .select("i", "sig")
        )
        cs = cs.join(F.broadcast(hot), ["i", "sig"], "left_anti")
        bs = bs.join(F.broadcast(hot), ["i", "sig"], "left_anti")
    a = bs.select(F.col(id_col).alias("batch_id"), "i", "sig")
    b = cs.select(F.col(id_col).alias("corpus_id"), "i", "sig")
    return (
        a.join(b, ["i", "sig"])
        .groupBy("batch_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .filter(F.col("n_matches") >= min_matches)
    )


def incremental_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental corpus dedup — the production ingest flow (reference
    analogue: LanceSink.java append mode feeding a growing dataset):
    admit only new-batch documents whose normalized content fingerprint
    (a) does not already exist in the corpus and (b) is the first
    occurrence within the batch itself (smallest id wins). Returns
    (doc_id, fp, n_batch_copies).

    Scale shape: the corpus side reduces to DISTINCT fingerprints of
    ONE projected column (parquet reads just `text`), then a left-anti
    join on `fp` — AQE picks broadcast when the fingerprint set is
    small and a shuffled-hash anti join when it is not; the batch is
    never joined against corpus rows, only against fingerprints. The
    batch-internal first-wins pass is one partial-aggregated groupBy
    on the same `fp` key, so the anti-join's partitioning is reused
    (no second exchange). Never a corpus×corpus or batch×batch join."""
    bfp = batch.select(
        F.col(id_col), fingerprint(F.col(text_col)).alias("fp")
    )
    cfp = corpus.select(fingerprint(F.col(text_col)).alias("fp")).distinct()
    return (
        bfp.join(cfp, "fp", "left_anti")
        .groupBy("fp")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_batch_copies"),
        )
        .select(id_col, "fp", "n_batch_copies")
    )


def resolve_duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
    driver_max_edges: int = 2_000_000,
) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, keep_id):
    every doc that appears in a pair is labeled with the MINIMUM doc id
    reachable through the pair graph, i.e. the canonical survivor of
    its duplicate cluster (keep-one-per-cluster, the step that turns
    pairwise dedup output into an actual drop list).

    SIZE-GATED execution (the ``registry.bcast`` pattern): the pair
    graph is duplication-volume-sized, usually orders of magnitude
    smaller than the corpus. When it fits under ``driver_max_edges``
    (counted exactly — one cheap action on the already-needed frame),
    an exact driver-side union-find resolves it in ONE pass instead of
    O(diameter) Spark rounds, each of which costs two joins + a
    checkpoint + a count of fixed job overhead. Above the gate, the
    distributed path runs:

    Iterative min-label propagation: l(v) ← min(l(v), min over
    neighbors l(u)); converges in O(component diameter) rounds.
    Near-dup clusters are shallow (copies of a common original), so a
    handful of rounds suffices in practice; ``max_iters`` bounds
    pathological chains, and convergence is detected exactly (a round
    that changes no label terminates the loop). Each round is one
    shuffle of the label frame — the same per-round cost profile as
    the published MapReduce CC algorithms (large-star/small-star,
    Kiveris et al. 2014), which are the contraction-style alternative
    when diameters are unbounded."""
    spark = pairs.sparkSession
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).persist()
    n_edges = e.count()
    if n_edges <= driver_max_edges:
        # exact union-find with path compression + union-by-min: the
        # collect is bounded by the gate (2M edges ≈ tens of MB), the
        # result frame by node count
        parent: dict = {}
        nodes: set = set()

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        try:
            for r in e.collect():
                a, b = int(r["src"]), int(r["dst"])
                nodes.add(a)
                nodes.add(b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    # union by MIN id so the root IS the keep_id
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
        finally:
            e.unpersist()
        # BROADCAST hint: this frame is provably driver-bounded (its
        # rows were just held in driver memory under the edge gate),
        # but it reaches Catalyst as an ExistingRDD with NO size
        # statistics, so joins against the corpus fall to SortMergeJoin
        # and shuffle the corpus side (guide §3.1). The hint is only
        # attached on THIS path — the distributed label-propagation
        # result below can be arbitrarily large and stays unhinted.
        # ``_driver_bounded`` lets callers extend the same certainty to
        # frames THEY derive from this one (cluster-count-sized picks
        # like a per-cluster canonical), which the hint itself does not
        # survive a join/window to.
        out = F.broadcast(
            spark.createDataFrame(
                [(x, find(x)) for x in sorted(nodes)], "doc_id long, keep_id long"
            )
        )
        out._driver_bounded = True  # noqa: SLF001 - advisory flag, same process
        return out
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    # each round references the previous labels frame TWICE (join +
    # fallback), so carrying lineage doubles the logical plan per round
    # — exponential analysis cost by ~10 iterations. localCheckpoint
    # (eager) materializes the round AND truncates lineage: plan size
    # stays constant, blocks are cleaned by the ContextCleaner. On a
    # cluster, swap for checkpoint() on a reliable dir if executor loss
    # during the (short) loop matters.
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    try:
        converged = False
        for _ in range(max_iters):
            nbr_min = (
                edges.join(labels, edges["src"] == labels["id"])
                .groupBy("dst")
                .agg(F.min("label").alias("nbr_label"))
            )
            new_full = (
                labels.join(nbr_min, labels["id"] == nbr_min["dst"], "left")
                .select(
                    "id",
                    F.least(
                        F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                    ).alias("label"),
                    (F.col("nbr_label") < F.col("label")).alias("__chg"),
                )
                .localCheckpoint(eager=True)
            )
            changed = new_full.filter("__chg").count()
            labels = new_full.select("id", "label")
            if changed == 0:
                converged = True
                break
        if not converged:
            warnings.warn(
                f"resolve_duplicate_clusters hit max_iters={max_iters} with labels "
                "still changing; keep_id may not be the component minimum on "
                "long-chain graphs. Raise max_iters or use "
                "resolve_duplicate_clusters_star (O(log n) rounds).",
                RuntimeWarning,
                stacklevel=2,
            )
        return labels.select(
            F.col("id").alias("doc_id"), F.col("label").alias("keep_id")
        )
    finally:
        edges.unpersist()
        e.unpersist()


def resolve_duplicate_clusters_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 16,
) -> DataFrame:
    """Large-star / small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014) — the
    contraction-style alternative to ``resolve_duplicate_clusters``:
    round count is O(log n) INDEPENDENT of component diameter, so this
    is the scale-safe choice when the pair graph can contain long
    chains (chained near-duplicates a≈b≈c≈… where each hop passes the
    similarity threshold but the endpoints do not).

    Per round, two edge-list transforms of one groupBy shuffle each:

    - large-star: every node links its strictly-LARGER neighbors to
      m(u) = min(Γ(u) ∪ {u}).
    - small-star: edges oriented toward the larger endpoint; every
      node links its smaller neighbors (and itself) to m(u).

    Both preserve connectivity (Kiveris Lemma 1-2); the fixed point is
    a star forest child→component-minimum. Fixed point is detected via
    count + order-insensitive xxhash64 bit_xor over the canonical edge set
    — one scalar agg per round, the same bounded driver check the
    label-propagation variant uses. Each round localCheckpoints so the
    logical plan stays constant size (see resolve_duplicate_clusters).

    Returns (doc_id, keep_id) for every node of the pair graph,
    keep_id = minimum id in the node's component — identical output to
    resolve_duplicate_clusters.
    """
    raw = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v")).where(
        F.col("u") != F.col("v")
    )
    # canonical (larger, smaller) edges, deduped
    edges = (
        raw.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    converged = False
    for _ in range(max_iters):
        # ---- large-star: group the symmetric view by u ----
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least(F.col("u"), F.col("mv")).alias("m"))
        )
        # emit (v, m(u)) for neighbors v > u; v > u >= m, so the pair
        # is already (larger, smaller)-oriented and never a self-loop
        ls = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # ---- small-star: ls is (larger, smaller), so grouping by u
        # already sees exactly the smaller neighborhood ----
        mins2 = ls.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            ls.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(mins2.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        edges = ss
        # bit_xor, not sum: order-insensitive over the distinct edge
        # set and immune to ANSI-mode long overflow
        row = edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).first()
        sig = (row["n"], row["h"])
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        # exiting on the iteration budget means the star forest may not
        # have contracted fully: keep_id can be a LOCAL minimum, not the
        # true component minimum. The groupBy-min below still never
        # duplicates a doc, but callers deserve a signal.
        warnings.warn(
            f"resolve_duplicate_clusters_star hit max_iters={max_iters} before "
            "the edge-set fixed point; keep_id may not be the component minimum "
            "for components still contracting. Raise max_iters "
            "(rounds needed ~ O(log n)).",
            RuntimeWarning,
            stacklevel=2,
        )
    nodes = (
        raw.select(F.col("u").alias("id"))
        .unionByName(raw.select(F.col("v").alias("id")))
        .distinct()
    )
    # at the fixed point each non-root appears once in edges; the
    # groupBy-min also makes a max_iters cutoff safe (never duplicates)
    return (
        nodes.join(edges.withColumnRenamed("u", "id"), "id", "left")
        .groupBy("id")
        .agg(F.min(F.coalesce(F.col("v"), F.col("id"))).alias("keep_id"))
        .select(F.col("id").alias("doc_id"), "keep_id")
    )


def repeated_spans(
    df: DataFrame,
    window: int = 30,
    min_copies: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Substring-level duplication: every position where a
    ``window``-token span recurs at least ``min_copies`` times across
    the corpus — the fixed-window form of exact-substring training-data
    dedup (Lee et al. 2022 build suffix arrays; any duplicated
    substring of length >= window contains a duplicated window, so the
    window fingerprints find the same regions at 1/window the index
    size). Returns (id, span_start, span_fp, n_copies) for the
    flagged positions; consumers cut those token ranges or drop docs
    above a duplication-fraction threshold.

    Shape: posexplode of per-position window fingerprints (md5 of the
    joined tokens — collision-safe at any corpus size), then ONE
    shuffle on the fingerprint with a windowed count — the expensive
    fingerprint explode is computed exactly once (a count-aggregate +
    join-back would re-execute it for each side). Fan-out is one row
    per token position (the same amplification tokenization already
    pays); the shuffle carries fingerprints, never raw text.

    The fingerprint explode is provisioned to cluster parallelism
    first (:func:`_provision_explode` — measured 3.1s → 0.7s at
    sf0.1; a no-op at production split counts)."""
    df = _provision_explode(df)
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    k = window
    spans = (
        df.select(
            F.col(id_col),
            F.posexplode(
                # empty for short docs: sequence(1, 0) would count DOWN
                F.when(
                    F.size(toks) >= k,
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - k + 1),
                        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, k))),
                    ),
                ).otherwise(F.expr("array()").cast("array<string>"))
            ).alias("__p", "span_fp"),
        )
        # posexplode's position is 0-based; span_start is the 1-based
        # token index of the window's first token
        .select(
            id_col,
            (F.col("__p") + 1).cast("int").alias("span_start"),
            "span_fp",
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("span_fp")
    return (
        spans.withColumn("n_copies", F.count(F.lit(1)).over(w))
        .filter(F.col("n_copies") >= min_copies)
        .select(id_col, "span_start", "span_fp", "n_copies")
    )


def cut_repeated_spans(
    df: DataFrame,
    window: int = 30,
    min_copies: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply substring-level dedup: for every span family found by
    ``repeated_spans``, KEEP the occurrence with the globally smallest
    (id, span_start) and cut the tokens of every other occurrence —
    the all-but-one policy of exact-substring training dedup. Returns
    (id, clean_text, n_tokens_cut).

    All set algebra stays relational: keeper selection is one
    min-struct aggregate per fingerprint; cut coverage explodes each
    non-keeper span into its ``window`` token positions (fan-out
    bounded by flags × window, duplication-volume- not corpus-sized);
    the per-doc cut-position SET then applies ROW-LOCALLY with array
    higher-order functions — the corpus is never token-exploded,
    shuffled on (id, pos), or sort-aggregated back together; the only
    shuffles carry duplication-sized rows. Overlapping cut spans merge
    for free — coverage is a position set."""
    from pyspark.sql import Window

    flags = repeated_spans(
        df, window=window, min_copies=min_copies, text_col=text_col, id_col=id_col
    )
    # keeper = min (id, span_start) per family, as a window over the
    # SAME span_fp partitioning repeated_spans just established — no
    # second shuffle, and flags (whose lineage re-executes the corpus
    # fingerprint explode) is evaluated exactly once instead of once
    # per side of a keeper self-join
    k = F.min(F.struct(F.col(id_col), F.col("span_start"))).over(
        Window.partitionBy("span_fp")
    )
    cut = (
        flags.withColumn("__k", k)
        .filter(
            ~(
                (F.col(id_col) == F.col("__k")[id_col])
                & (F.col("span_start") == F.col("__k.span_start"))
            )
        )
        .select(
            id_col,
            F.explode(
                F.sequence(
                    F.col("span_start"), F.col("span_start") + window - 1
                )
            ).alias("pos"),
        )
        .distinct()
    )
    cutpos = cut.groupBy(id_col).agg(F.collect_set("pos").alias("__cut"))
    # (pos, tok) pairs as an ARRAY, 1-based positions matching
    # repeated_spans' numbering; '' tokens (empty doc) filtered with
    # positions already assigned, like the exploded form did
    arr = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    pairs = F.filter(
        F.transform(
            arr,
            lambda t, i: F.struct((i + 1).cast("int").alias("pos"), t.alias("tok")),
        ),
        lambda p: p["tok"] != F.lit(""),
    )
    joined = df.select(F.col(id_col), pairs.alias("__pairs")).join(
        cutpos, id_col, "left"
    )
    kept = F.when(F.col("__cut").isNull(), F.col("__pairs")).otherwise(
        F.filter(
            "__pairs", lambda p: ~F.array_contains(F.col("__cut"), p["pos"])
        )
    )
    return (
        joined.withColumn("__kept", kept)
        # a doc whose every token was cut (or an empty doc) vanished
        # from the exploded form's survivor aggregate; keep that
        # contract
        .filter(F.size("__kept") > 0)
        .select(
            F.col(id_col),
            F.concat_ws(
                " ", F.transform("__kept", lambda p: p["tok"])
            ).alias("clean_text"),
            (F.size("__pairs") - F.size("__kept"))
            .cast("long")
            .alias("n_tokens_cut"),
        )
    )


def _fingerprint_frame(
    blobs: DataFrame, fp_fn, out_col: str, content_col: str, id_col: str
) -> DataFrame:
    """Shared scaffold of every perceptual-dedup operator: one
    mapInPandas pass maps each blob's bytes through ``fp_fn`` (a
    module-level codec fingerprint — pickled by reference, so
    ship_package makes it importable on the workers) into a signed
    64-bit column. BYTE-identical blobs within a task decode once: a
    bounded per-task memo short-circuits repeats — the exact-duplicate
    case is the very workload a dedup operator sees, and the decode
    (PNG/JPEG inflate, WAV rFFT) dwarfs a dict probe. Capped so a
    task's memory stays bounded regardless of corpus size."""
    from pyspark.sql import types as T

    from lance_flink_spark.session import ship_package

    ship_package(blobs.sparkSession)
    schema = T.StructType(
        [
            T.StructField(id_col, blobs.schema[id_col].dataType, True),
            T.StructField(out_col, T.LongType(), True),
        ]
    )

    def _fp(batches):
        memo: dict[bytes, int] = {}
        for pdf in batches:
            out = []
            for c in pdf[content_col]:
                b = bytes(c)
                v = memo.get(b)
                if v is None:
                    v = fp_fn(b)
                    if len(memo) < 65536:
                        memo[b] = v
                out.append(v)
            yield pd.DataFrame({id_col: pdf[id_col], out_col: out})

    return blobs.select(id_col, content_col).mapInPandas(
        _fp, schema=schema
    )


def image_dhash_dedup(
    blobs: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Exact PERCEPTUAL image dedup: one mapInPandas pass hashes every
    blob with :func:`~lance_flink_spark.functions.multimodal.dhash64`
    (REAL PPM/PNG/JPEG pixel decoders — identical pixels hash equal
    regardless of container bytes or PNG filter choice), then a plain
    hash-groupBy. O(n) with a 64-bit shuffle key, never all-pairs —
    the multimodal counterpart of :func:`exact_dedup`. Returns
    (dhash, keep_id, n_copies)."""
    from lance_flink_spark.functions.multimodal import dhash64

    return (
        _fingerprint_frame(blobs, dhash64, "dhash", content_col, id_col)
        .groupBy("dhash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _banded_pairs(
    fps: DataFrame,
    fp_col: str,
    bands: int,
    distance,
    out_col: str,
    threshold: int,
    id_col: str,
) -> DataFrame:
    """Shared banded-LSH pair scaffold for the 64-bit perceptual
    fingerprints: PERSIST the fingerprint frame (its Python codec pass
    is the dominant cost — the self-join's two sides must not execute
    it twice; release later via ``unpersist_all``, the same contract
    as minhash_lsh_pairs), explode ``bands`` equal bit-bands,
    self-join on (band, value), and apply ``distance(fa, fb)`` with
    the threshold BEFORE the distinct so far pairs never reach the
    dedup shuffle (the distance is JVM codegen — re-evaluating it per
    shared band is free next to a shuffle row)."""
    width = 64 // bands
    mask = (1 << width) - 1
    fps = fps.persist()
    banded = fps.select(
        F.col(id_col),
        F.col(fp_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(fp_col, i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("b"),
    ).select(id_col, fp_col, "b.band", "b.val")
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col(fp_col).alias("fa"),
        "band", "val",
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col(fp_col).alias("fb"),
        "band", "val",
    )
    return (
        a.join(b, ["band", "val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", distance(F.col("fa"), F.col("fb")).alias(out_col)
        )
        .where(F.col(out_col) <= threshold)
        .distinct()
    )


def image_near_dup_pairs(
    blobs: DataFrame,
    max_hamming: int = 6,
    content_col: str = "content",
    id_col: str = "doc_id",
    bands: int = 8,
) -> DataFrame:
    """NEAR-duplicate image pairs by banded dHash: the 64-bit hash
    splits into ``bands`` equal bit-bands (LSH — two hashes within
    hamming distance ``bands-1`` MUST share at least one intact band,
    the pigeonhole guarantee; above that recall is probabilistic), a
    self-join on (band index, band value) generates candidates, and
    JVM-side ``bit_count(a XOR b)`` filters to the exact distance
    BEFORE the dedup shuffle. O(n·bucket), never all-pairs; the
    fingerprint pass runs ONCE (persisted — release with
    ``unpersist_all``). Returns (id_a, id_b, hamming)."""
    if 64 % bands:
        raise ValueError(f"bands={bands} must divide 64")
    from lance_flink_spark.functions.multimodal import dhash64

    fps = _fingerprint_frame(blobs, dhash64, "dhash", content_col, id_col)
    return _banded_pairs(
        fps, "dhash", bands,
        lambda fa, fb: F.bit_count(fa.bitwiseXOR(fb)),
        "hamming", max_hamming, id_col,
    )


def audio_fp_dedup(
    blobs: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Exact PERCEPTUAL audio dedup: one mapInPandas pass fingerprints
    every WAV blob with
    :func:`~lance_flink_spark.functions.multimodal.audio_fp64`
    (amplitude-invariant dominant-band spectra — re-levelled copies of
    one recording group together), then a hash-groupBy. O(n); the
    audio counterpart of :func:`image_dhash_dedup`. Returns
    (audio_fp, keep_id, n_copies)."""
    from lance_flink_spark.functions.multimodal import audio_fp64

    return (
        _fingerprint_frame(
            blobs, audio_fp64, "audio_fp", content_col, id_col
        )
        .groupBy("audio_fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def audio_near_dup_pairs(
    blobs: DataFrame,
    max_mismatch: int = 4,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """NEAR-duplicate audio pairs by windowed-symbol LSH: the
    fingerprint's 16 window symbols ARE the bands — two clips
    disagreeing in at most 15 windows always share one (pigeonhole),
    so recall is guaranteed for any ``max_mismatch`` ≤ 15. Candidates
    come from a (window, symbol) self-join and the exact mismatch
    count is a JVM-side higher-order function over the nibbles,
    filtered BEFORE the dedup shuffle — never all-pairs, never per-row
    Python past the (persisted, run-once) fingerprint. Returns
    (id_a, id_b, n_mismatch) for clips that differ in at most
    ``max_mismatch`` of their 16 windows (e.g. the same recording
    with a re-pitched tail)."""
    from lance_flink_spark.functions.multimodal import audio_fp64

    fps = _fingerprint_frame(blobs, audio_fp64, "afp", content_col, id_col)

    def _mismatch(fa, fb):
        return F.expr(
            "aggregate(sequence(0, 15), 0, (acc, i) -> acc + CASE WHEN "
            "(shiftrightunsigned(fa, i * 4) & 15) = "
            "(shiftrightunsigned(fb, i * 4) & 15) THEN 0 ELSE 1 END)"
        )

    return _banded_pairs(
        fps, "afp", 16, _mismatch, "n_mismatch", max_mismatch, id_col
    )
