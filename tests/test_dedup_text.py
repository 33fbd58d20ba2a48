"""Dedup + text-analysis semantics on constructed corpora (the oracle
gate checks cross-engine parity; these pin intended behavior)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from lance_flink_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
    word_shingles,
)
from lance_flink_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=1, text=BASE, lang="en"),
        Row(doc_id=2, text=BASE, lang="en"),  # exact dup of 1
        Row(doc_id=3, text=BASE.replace("lazy", "sleepy"), lang="en"),  # near dup
        Row(doc_id=4, text="completely different words entirely unrelated content here", lang="en"),
        Row(doc_id=5, text="le chat et le chien et la maison", lang="fr"),
    ]
    return spark.createDataFrame(rows)


def test_exact_dedup_groups(spark, docs):
    out = {r["keep_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    assert out[1] == 2  # docs 1+2 collapse, keeper is min id
    assert out[3] == 1 and out[4] == 1


def test_exact_dedup_normalizes(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="Hello,  World!"), Row(doc_id=2, text="hello world")]
    )
    assert exact_dedup(df).count() == 1


def test_minhash_finds_near_dup_pair(spark, docs):
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, min_matches=8).collect()}
    assert (1, 2) in pairs  # identical docs share all 16 components
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_simhash_identical_have_zero_hamming(spark, docs):
    out = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=16).collect()}
    assert out[(1, 2)] == 0
    assert out[(1, 3)] <= 6  # near dup → small hamming


def test_jaccard_exact_values(spark, docs):
    out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, threshold=0.1).collect()}
    assert out[(1, 2)] == 1.0
    assert 0.3 < out[(1, 3)] < 1.0
    assert (1, 4) not in out


def test_jaccard_df_cap_matches_exact_on_normal_corpus(spark, docs):
    """With the cap far above any real df, the capped+verify path must
    equal the uncapped exact path bit-for-bit."""
    exact = sorted(
        tuple(r) for r in ngram_jaccard_pairs(docs, threshold=0.1, max_df=None).collect()
    )
    capped = sorted(
        tuple(r) for r in ngram_jaccard_pairs(docs, threshold=0.1, max_df=100).collect()
    )
    assert exact == capped


def test_jaccard_df_cap_bounds_pathological_candidates(spark):
    """Pathological common-shingle corpus: every doc shares one
    ultra-common 3-gram. Uncapped, that single shingle bucket emits
    n·(n-1)/2 candidate pairs (≈20k here — the Σ df(gram)² blowup);
    capped, the bucket is dropped and candidates stay bounded by the
    planted near-dup pairs. True near-dups (sharing rare shingles) must
    still surface with exact jaccard."""
    from pyspark.sql import Row

    from lance_flink_spark.operators.dedup import ngram_candidates
    from lance_flink_spark.functions.text import word_shingles

    n = 200
    common = "as a matter of fact"
    rows = [
        Row(doc_id=i, text=f"{common} unique content piece number {i} with filler {i * 7} tail", lang="en")
        for i in range(n)
    ]
    # plant one true near-dup pair sharing rare shingles
    rows.append(Row(doc_id=n, text=rows[0].text + " extra", lang="en"))
    df = spark.createDataFrame(rows)
    grams = (
        df.select("doc_id", "lang", F.explode(word_shingles(F.col("text"))).alias("gram"))
        .distinct()
    )
    max_df = 10
    n_cand = ngram_candidates(grams, "doc_id", "lang", max_df).count()
    # bound: every surviving bucket emits ≤ max_df·(max_df-1)/2 pairs,
    # and the pathological bucket (df=201) is gone entirely
    assert n_cand < n * max_df  # ≪ n·(n-1)/2 = 19900 uncapped
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.3, max_df=max_df).collect()
    }
    assert (0, n) in pairs and pairs[(0, n)] > 0.5


def test_token_count_and_edge_cases(spark):
    df = spark.createDataFrame(
        [Row(t="one two  three"), Row(t="   "), Row(t="single")]
    )
    got = [r["n"] for r in df.select(token_count(F.col("t")).alias("n")).collect()]
    assert got == [3, 0, 1]


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            Row(t="the cat and the dog is here"),
            Row(t="le chien et la maison de paris"),
            Row(t="el gato y la casa que es"),
            Row(t="der hund und die katze ist da"),
            Row(t="xyzzy plugh qwerty"),
        ]
    )
    got = [r["l"] for r in df.select(lang_id(F.col("t")).alias("l")).collect()]
    assert got == ["en", "fr", "es", "de", "und"]


def test_quality_score_ranges(spark, docs):
    vals = [r["q"] for r in docs.select(quality_score(F.col("text")).alias("q")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame([Row(a="Foo  Bar!", b="foo bar")])
    r = df.select(
        fingerprint(F.col("a")).alias("fa"), fingerprint(F.col("b")).alias("fb")
    ).first()
    assert r["fa"] == r["fb"]


def test_word_shingles_short_text_empty(spark):
    df = spark.createDataFrame([Row(t="just two")])
    assert df.select(word_shingles(F.col("t")).alias("s")).first()["s"] == []


def test_repetition_ratio(spark):
    from lance_flink_spark.functions.text import repetition_ratio

    df = spark.createDataFrame(
        [
            Row(t="a b c a b c a b c"),  # heavy 3-gram repetition
            Row(t="one two three four five six"),  # all distinct
            Row(t="too short"),  # < 3 tokens → 0
        ]
    )
    got = [r["r"] for r in df.select(repetition_ratio(F.col("t")).alias("r")).collect()]
    assert got[0] > 0.5
    assert got[1] == 0.0
    assert got[2] == 0.0


def test_redact_pii(spark):
    from lance_flink_spark.functions.text import redact

    df = spark.createDataFrame(
        [Row(t="mail me at jo.doe@example.com or visit https://x.io/a?b=1 or call +1 (555) 123-4567 ok")]
    )
    out = df.select(redact(F.col("t")).alias("r")).first()["r"]
    assert "<EMAIL>" in out and "<URL>" in out and "<PHONE>" in out
    assert "example.com" not in out and "555" not in out


def test_null_text_robustness(spark):
    """Null text must not crash any text/dedup operator; null rows
    drop out of shingle-based ops and fingerprint to null."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, None, "en"), (2, "the real text here once more", "en")], schema
    )
    fp = df.select("doc_id", fingerprint(F.col("text")).alias("fp")).collect()
    assert {r["doc_id"]: r["fp"] is None for r in fp} == {1: True, 2: False}
    assert df.select(token_count(F.col("text")).alias("n")).count() == 2
    assert exact_dedup(df).count() == 2  # null fingerprint forms its own group
    assert minhash_lsh_pairs(df, min_matches=1).count() == 0  # no self-pairs from null
    assert ngram_jaccard_pairs(df, threshold=0.1).count() == 0


def test_embedding_rh_blocking_bounded_on_relu_corpus(spark):
    """All-positive (ReLU-style) embeddings collapse leading-dim sign
    blocking into ONE bucket; random-hyperplane signs must still split
    them, and the bucket cap must bound candidate pairs regardless."""
    import numpy as np

    from lance_flink_spark.operators.dedup import embedding_dup_pairs

    rng = np.random.RandomState(7)
    n, dim = 400, 64
    vecs = np.abs(rng.randn(n, dim))  # strictly non-negative dims
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    stats: dict = {}
    out = embedding_dup_pairs(
        df, threshold=0.99, dim=dim, max_bucket=50, drop_stats=stats
    )
    # hyperplanes split the all-positive corpus across many buckets:
    # with a cap of 50 (n/8) the plan must drop few-to-no rows, and the
    # candidate join stays far below the n^2/2 single-bucket blowup
    assert stats["dropped_rows"] <= n * 0.3
    planes_pairs = out.count()  # runs the capped plan end-to-end
    assert planes_pairs < n * n / 8

    # a planted scaled near-dup still lands in its twin's bucket
    dup = spark.createDataFrame(
        [(10_000, [float(x * 2.0) for x in vecs[0]])],
        "vec_id long, embedding array<double>",
    )
    found = embedding_dup_pairs(
        df.unionByName(dup), threshold=0.99, dim=dim, max_bucket=60
    ).filter("id_a = 0 and id_b = 10000")
    assert found.count() == 1


def test_minhash_bucket_cap_bounds_degenerate_corpus(spark):
    """Hundreds of near-empty docs sharing one shingle collapse every
    minhash component onto a single signature — the cap must drop that
    bucket instead of emitting O(n^2) pairs, while a normal near-dup
    pair in the same corpus survives."""
    from pyspark.sql import Row

    degenerate = [Row(doc_id=i, text="tiny shared stub", lang="en") for i in range(300)]
    normal = [
        Row(doc_id=1000, text=BASE, lang="en"),
        Row(doc_id=1001, text=BASE.replace("lazy", "sleepy"), lang="en"),
    ]
    df = spark.createDataFrame(degenerate + normal)
    uncapped = minhash_lsh_pairs(df, min_matches=8)
    capped = minhash_lsh_pairs(df, min_matches=8, max_bucket=100)
    # uncapped: the degenerate bucket alone is 300*299/2 pairs
    assert uncapped.count() >= 300 * 299 // 2
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (1000, 1001) in got
    assert all(a >= 1000 for a, _ in got)  # every degenerate pair dropped


def test_decontaminate_flags_planted_overlap(spark):
    """A corpus doc embedding an eval sentence verbatim is flagged with
    the exact shared-3-gram count; disjoint docs are absent; and the
    eval side reaches the corpus scan as a broadcast join (no
    corpus-side shuffle for the semi-join)."""
    from lance_flink_spark.operators.dedup import decontaminate

    ev = spark.createDataFrame(
        [Row(doc_id=1, text="the capital of france is paris")]
    )
    corpus = spark.createDataFrame(
        [
            # contains "capital of france", "of france is", ... 4 shared 3-grams
            Row(doc_id=10, text="quiz says the capital of france is paris indeed"),
            Row(doc_id=11, text="completely unrelated text about gardening tools"),
            Row(doc_id=12, text="of france is"),  # exactly one shared 3-gram
        ]
    )
    out = decontaminate(corpus, ev)
    got = {r["doc_id"]: r["n_hits"] for r in out.collect()}
    assert got == {10: 4, 12: 1}
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_pack_sequences_prefix_sum_semantics(spark):
    """Hand-checked packing: 3 docs of 300/300/300 tokens at budget 512
    pack to seq starts 0/0/1 with offsets 0/300/88; a second partition
    packs independently from zero."""
    from lance_flink_spark.operators.packing import pack_sequences

    def words(n, tag):
        return " ".join(f"{tag}{i}" for i in range(n))

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=words(300, "a"), lang="en"),
            Row(doc_id=2, text=words(300, "b"), lang="en"),
            Row(doc_id=3, text=words(300, "c"), lang="en"),
            Row(doc_id=4, text=words(5, "d"), lang="fr"),
        ]
    )
    out = {r["doc_id"]: r for r in pack_sequences(df, budget=512).collect()}
    assert (out[1]["seq_id"], out[1]["seq_offset"]) == (0, 0)
    assert (out[2]["seq_id"], out[2]["seq_offset"]) == (0, 300)
    assert (out[3]["seq_id"], out[3]["seq_offset"]) == (1, 600 - 512)
    assert (out[4]["seq_id"], out[4]["seq_offset"]) == (0, 0)  # fresh partition


def test_pack_spans_cover_sequences_exactly(spark):
    """Span rows reassemble every sequence to exactly `budget` tokens
    (except the final partial per partition), with no token lost or
    duplicated and per-doc spans contiguous."""
    from lance_flink_spark.operators.packing import pack_sequences, pack_spans

    def words(n, tag):
        return " ".join(f"{tag}{i}" for i in range(n))

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=words(700, "a"), lang="en"),   # longer than budget
            Row(doc_id=2, text=words(300, "b"), lang="en"),   # straddles
            Row(doc_id=3, text=words(24, "c"), lang="en"),
            Row(doc_id=4, text="", lang="en"),                # empty: no rows
        ]
    )
    spans = pack_spans(df, budget=512).collect()
    assert not [r for r in spans if r["doc_id"] == 4]
    total = sum(r["tok_to"] - r["tok_from"] for r in spans)
    assert total == 700 + 300 + 24
    per_seq = {}
    for r in spans:
        per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + (r["tok_to"] - r["tok_from"])
    last = max(per_seq)
    assert all(v == 512 for s, v in per_seq.items() if s != last)
    assert per_seq[last] == 1024 - 512 * (len(per_seq) - 1) == (1024 % 512 or 512)
    # doc 1 splits 0..512 then 512..700; doc 2 covers seq 1 then 2
    d1 = sorted((r["seq_id"], r["tok_from"], r["tok_to"]) for r in spans if r["doc_id"] == 1)
    assert d1 == [(0, 0, 512), (1, 512, 700)]


def test_resolve_duplicate_clusters_matches_union_find(spark):
    """Min-label propagation vs a plain union-find on a graph with a
    long chain (diameter 9 — forces multiple propagation rounds), a
    separate triangle, and an isolated pair."""
    from lance_flink_spark.operators.dedup import resolve_duplicate_clusters

    chain = [(i, i + 1) for i in range(10, 19)]           # 10-…-19
    tri = [(100, 101), (101, 102), (100, 102)]
    iso = [(7, 3)]
    pairs = spark.createDataFrame(chain + tri + iso, "id_a long, id_b long")
    got = {r["doc_id"]: r["keep_id"] for r in resolve_duplicate_clusters(pairs).collect()}

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in chain + tri + iso:
        parent[find(a)] = find(b)
    want = {x: min(y for y in parent if find(y) == find(x)) for x in parent}
    assert got == want
    assert got[19] == 10 and got[102] == 100 and got[7] == 3 and got[3] == 3


def test_resolve_duplicate_clusters_star_matches_union_find(spark):
    """Large-star/small-star CC vs plain union-find on a diameter-40
    chain (the case min-label propagation needs 40 rounds for — the
    star variant must finish inside its 16-round O(log n) budget),
    plus a triangle, an isolated pair, and a deterministic random
    graph with duplicate + reversed edges."""
    from lance_flink_spark.operators.dedup import resolve_duplicate_clusters_star

    chain = [(i, i + 1) for i in range(10, 50)]           # diameter 40
    tri = [(100, 101), (101, 102), (100, 102)]
    iso = [(7, 3)]
    # md5-free determinism: congruential walk, includes dup/reversed edges
    rnd = []
    x = 1
    for _ in range(120):
        x = (x * 1103515245 + 12345) % (1 << 31)
        a, b = 200 + x % 60, 200 + (x // 7) % 60
        if a != b:
            rnd.append((a, b))
    pairs = spark.createDataFrame(chain + tri + iso + rnd, "id_a long, id_b long")
    got = {
        r["doc_id"]: r["keep_id"]
        for r in resolve_duplicate_clusters_star(pairs).collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in chain + tri + iso + rnd:
        parent[find(a)] = find(b)
    want = {x: min(y for y in parent if find(y) == find(x)) for x in parent}
    assert got == want
    assert got[49] == 10 and got[102] == 100 and got[7] == 3 and got[3] == 3


def test_cc_iteration_budget_warns(spark):
    """Exiting either CC variant on max_iters (not the fixed point)
    must warn — a long chain with a budget of 1 cannot converge."""
    import warnings as w

    from lance_flink_spark.operators.dedup import (
        resolve_duplicate_clusters,
        resolve_duplicate_clusters_star,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    # force the DISTRIBUTED label-prop path (driver_max_edges=0):
    # under the size gate a small graph resolves exactly driver-side
    # and max_iters never applies
    for fn, kw in (
        (resolve_duplicate_clusters, {"driver_max_edges": 0}),
        (resolve_duplicate_clusters_star, {}),
    ):
        with w.catch_warnings(record=True) as rec:
            w.simplefilter("always")
            fn(chain, max_iters=1, **kw).collect()
        assert any("max_iters" in str(r.message) for r in rec), fn.__name__
    # and a converging run stays silent
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        resolve_duplicate_clusters_star(chain, max_iters=16).collect()
    assert not [r for r in rec if issubclass(r.category, RuntimeWarning)]


def test_source_overlap_cap_drops_ubiquitous_grams(spark):
    from pyspark.sql import Row

    from lance_flink_spark.operators.dedup import source_overlap

    # "common phrase here" appears in every source; "rare gram x/y" in two
    rows = [Row(doc_id=i, source=f"s{i}", text="common phrase here") for i in range(4)]
    rows += [
        Row(doc_id=10, source="s0", text="rare gram shared x"),
        Row(doc_id=11, source="s1", text="rare gram shared x"),
    ]
    df = spark.createDataFrame(rows)
    full = source_overlap(df).collect()
    # every pair shares the common phrase
    assert len(full) == 6 + 0  # 4 sources -> 6 pairs; s0-s1 row covers both grams
    capped = source_overlap(df, max_sources_per_gram=2).collect()
    # ubiquitous gram dropped: only the rare 2-source grams remain
    assert {(r["source_a"], r["source_b"]) for r in capped} == {("s0", "s1")}
    assert capped[0]["n_shared_grams"] == 2  # "rare gram shared", "gram shared x"


def test_incremental_near_dedup_flags_near_copies(spark):
    from pyspark.sql import Row

    from lance_flink_spark.operators.dedup import incremental_near_dedup

    # per-doc disjoint vocabularies: doc i's tokens are c{i}_0..c{i}_39,
    # so the ONLY near-dup signal is the planted one
    words = lambda pre, n: " ".join(f"{pre}_{j}" for j in range(n))
    corpus = spark.createDataFrame(
        [Row(doc_id=i, text=words(f"c{i}", 40)) for i in range(20)]
    )
    # batch: 100-104 near-copies of corpus docs (1-word change);
    # 200-204 fresh (disjoint vocabulary -> no shared shingles)
    near = [
        Row(doc_id=100 + i, text=words(f"c{i}", 40).replace(f"c{i}_7 ", "zz ", 1))
        for i in range(5)
    ]
    fresh = [Row(doc_id=200 + i, text=words(f"f{i}", 40)) for i in range(5)]
    batch = spark.createDataFrame(near + fresh)
    # 1-word edit over ~38 shingles -> jaccard ~0.85; k=16 minhash is
    # noisy at that set size, so threshold low — fresh docs share ZERO
    # shingles and stay at 0 matches regardless
    hits = incremental_near_dedup(batch, corpus, min_matches=5).collect()
    flagged = {r["batch_id"] for r in hits}
    assert {100, 101, 102, 103, 104} <= flagged
    assert flagged.isdisjoint({200, 201, 202, 203, 204})
    # every flagged pair points at its true source doc
    assert all(r["corpus_id"] == r["batch_id"] - 100 for r in hits)


def test_incremental_near_dedup_bucket_cap_bounds_degenerate_corpus(spark):
    from pyspark.sql import Row

    from lance_flink_spark.operators.dedup import incremental_near_dedup

    # degenerate corpus: every doc identical -> all signatures collide
    corpus = spark.createDataFrame(
        [Row(doc_id=i, text="same same same same") for i in range(50)]
    )
    batch = spark.createDataFrame([Row(doc_id=999, text="same same same same")])
    out = incremental_near_dedup(batch, corpus, max_bucket=10)
    # hot buckets dropped from both sides -> bounded result, no blowup
    assert out.count() == 0


def test_fuzzy_join_matches_bruteforce_reference(spark):
    """Uncapped blocked fuzzy join == brute-force token Jaccard on
    random corpora with planted truncation pairs."""
    import numpy as np
    from pyspark.sql import Row

    from lance_flink_spark.operators.linkage import fuzzy_join

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(40)]
    left_rows = {
        i: " ".join(rng.choice(vocab, size=rng.integers(5, 15)))
        for i in range(30)
    }
    # right side: truncated copies of even ids + random noise docs
    right_rows = {
        1000 + i: " ".join(left_rows[i].split()[:6]) for i in range(0, 30, 2)
    }
    right_rows.update(
        {
            2000 + i: " ".join(rng.choice(vocab, size=8))
            for i in range(5)
        }
    )
    L = spark.createDataFrame([Row(lid=i, text=t) for i, t in left_rows.items()])
    R = spark.createDataFrame([Row(rid=i, text=t) for i, t in right_rows.items()])
    got = {
        (r["lid"], r["rid"]): r["jaccard"]
        for r in fuzzy_join(
            L, R, "lid", "rid", threshold=0.4, max_df=10_000
        ).collect()
    }

    def toks(t):
        return set(t.lower().split())

    want = {}
    for li, lt in left_rows.items():
        for ri, rt in right_rows.items():
            a, b = toks(lt), toks(rt)
            j = len(a & b) / len(a | b)
            if round(j, 6) >= 0.4:
                want[(li, ri)] = round(j, 6)
    assert got == want
    assert len(want) > 5  # planted pairs actually exercised the check


def test_cut_repeated_spans_keeps_first_occurrence(spark):
    """Unit semantics for the span cutter: the globally-first
    occurrence survives verbatim, later copies lose exactly the
    duplicated window, short docs pass through untouched."""
    from pyspark.sql import Row

    from lance_flink_spark.operators.dedup import cut_repeated_spans

    boiler = "alpha beta gamma delta"  # 4-token span, window=4
    rows = [
        Row(doc_id=1, text=f"{boiler} unique one"),
        Row(doc_id=2, text=f"prefix {boiler} tail"),
        Row(doc_id=3, text=boiler),          # fully duplicated doc
        Row(doc_id=4, text="too short"),     # < window: untouched
    ]
    out = {
        r["doc_id"]: (r["clean_text"], r["n_tokens_cut"])
        for r in cut_repeated_spans(
            spark.createDataFrame(rows), window=4, min_copies=2
        ).collect()
    }
    # doc 1 holds the globally-first (smallest doc_id, start) copy
    assert out[1] == (f"{boiler} unique one", 0)
    assert out[2] == ("prefix tail", 4)
    assert 3 not in out  # every token cut → doc drops entirely
    assert out[4] == ("too short", 0)


def test_cc_driver_gate_matches_distributed(spark):
    """The size-gated driver union-find and the distributed label-prop
    produce identical (doc_id, keep_id) labelings — including long
    chains, multiple components, and isolated-pair clusters."""
    import random

    from lance_flink_spark.operators.dedup import resolve_duplicate_clusters

    rng = random.Random(11)
    edges = [(i, i + 1) for i in range(30)]          # one long chain
    edges += [(100 + 2 * i, 101 + 2 * i) for i in range(10)]  # pairs
    edges += [(rng.randrange(200, 230), rng.randrange(200, 230)) for _ in range(40)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = {
        (r["doc_id"], r["keep_id"])
        for r in resolve_duplicate_clusters(pairs).collect()
    }
    slow = {
        (r["doc_id"], r["keep_id"])
        for r in resolve_duplicate_clusters(
            pairs, driver_max_edges=0, max_iters=64
        ).collect()
    }
    assert fast == slow and fast


def test_provision_explode_never_executes_shuffle_fed_frames(spark):
    """_provision_explode probes parallelism to re-provision starved
    scans — but under AQE, df.rdd on a frame with an Exchange RUNS its
    upstream stages, doubling the caller's work (round-14 extension
    review). Shuffle-fed frames must pass through untouched (their
    parallelism is spark.sql.shuffle.partitions already) and only
    scan-shaped lineage may be probed/repartitioned."""
    from pyspark.sql import functions as F

    from lance_flink_spark.operators.dedup import _provision_explode

    agg = (
        spark.range(100)
        .groupBy((F.col("id") % 3).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert _provision_explode(agg) is agg  # untouched, unexecuted
    joined = agg.join(spark.range(3).withColumnRenamed("id", "k"), "k")
    assert _provision_explode(joined) is joined
    # scan-shaped frames still provision up to the machine
    scan = spark.range(10, numPartitions=1)
    out = _provision_explode(scan)
    assert (
        out.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    assert sorted(r["id"] for r in out.collect()) == list(range(10))


def test_near_dedup_ingest_chains_and_replay(spark, tmp_path):
    """r15 NearDedupIngest: cross-batch chains collapse to the
    first-seen member (B dups A dropped; C dups B still dropped
    because SEEN signatures — not just admitted — enter the store),
    and a replayed batch is a no-op (idempotency marker)."""
    from lance_flink_spark.streaming.dedup import NearDedupIngest

    root = str(tmp_path / "ndd")
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows0 = [(1, base), (2, "totally different words " * 3)]
    rows1 = [(3, base + " lambda")]       # dups doc 1 → dropped
    rows2 = [(4, base + " lambda mu")]    # dups doc 3 (dropped) → still dropped
    sink = NearDedupIngest(root, min_matches=8)
    for i, rows in enumerate([rows0, rows1, rows2]):
        sink.write_batch(
            spark.createDataFrame(rows, "doc_id long, text string"), i
        )
    got = sorted(r["doc_id"] for r in sink.admitted(spark).collect())
    assert got == [1, 2]
    # replayed batch: marker short-circuits, nothing duplicates
    sink.write_batch(
        spark.createDataFrame(rows0, "doc_id long, text string"), 0
    )
    assert sorted(
        r["doc_id"] for r in sink.admitted(spark).collect()
    ) == [1, 2]
