"""BPE tokenizer training/encoding (operators/bpe.py): the distributed
word-count + driver merge-loop decomposition must match a straight
single-process reference, and encode/decode must roundtrip."""

from collections import Counter

from pyspark.sql import Row

from lance_flink_spark.operators.bpe import (
    _EOW,
    bpe_encode,
    encode_word,
    train_bpe,
)

CORPUS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest wide wide wide",
    "low new wide slow slower",
]


def _ref_train(texts, n_merges):
    """Pure-python Sennrich reference on the same corpus."""
    wc = Counter(w for t in texts for w in t.lower().split())
    vocab = {tuple(w) + (_EOW,): n for w, n in wc.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        out = {}
        for sym, n in vocab.items():
            merged, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    merged.append(best[0] + best[1])
                    i += 2
                else:
                    merged.append(sym[i])
                    i += 1
            out[tuple(merged)] = out.get(tuple(merged), 0) + n
        vocab = out
    return merges


def test_train_matches_reference(spark):
    df = spark.createDataFrame([Row(text=t) for t in CORPUS])
    got = train_bpe(df, n_merges=20, max_words=None)
    assert got == _ref_train(CORPUS, 20)
    assert len(got) == 20


def test_encode_roundtrips_and_uses_merges(spark):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(CORPUS)])
    merges = train_bpe(df, n_merges=30, max_words=None)
    out = bpe_encode(df, merges).collect()
    for r in out:
        # roundtrip: tokens joined (minus </w>) reproduce the words
        words = "".join(r["bpe_tokens"]).replace(_EOW, " ").split()
        assert words == r["text"].lower().split()
    # frequent words actually compress below char length
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    assert len(encode_word("low", ranks)) < len("low") + 1
    assert len(encode_word("wide", ranks)) < len("wide") + 1


def test_max_words_truncation_is_deterministic(spark):
    df = spark.createDataFrame([Row(text=t) for t in CORPUS])
    a = train_bpe(df, n_merges=10, max_words=5)
    b = train_bpe(df, n_merges=10, max_words=5)
    assert a == b
