"""BPE tokenizer training + encoding, Spark-shaped.

Byte-pair-encoding training (Sennrich et al. 2016) is an inherently
sequential merge loop — but its input is not the corpus, it is the
WORD-FREQUENCY table: pair counts are fully determined by
(distinct word, count). So the scalable decomposition is

1. one distributed reduction of the corpus to word counts (the only
   corpus-sized job — a groupBy with map-side combine, same shape as
   ``vocab_topk``), optionally truncated to the ``max_words`` most
   frequent words (the long tail contributes vanishing pair mass), and
2. the merge loop on the driver over that bounded dict — O(vocab) per
   round like the IVF k-means driver sample, NOT O(corpus). 100 TB of
   text still reduces to a few million distinct words.

Encoding applies the learned merges per word with an LRU-less word
cache inside an Arrow-batched pandas UDF: real corpora repeat words
heavily, so each batch pays the merge walk once per DISTINCT word.

Determinism: ties in pair frequency break on the lexicographically
smallest pair, so the merge sequence is a pure function of the corpus.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EOW = "</w>"


def _word_counts(df: DataFrame, text_col: str, max_words: int | None):
    tok = (
        df.select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if max_words is not None:
        # TakeOrderedAndProject; deterministic tie-break on the word
        tok = tok.orderBy(F.desc("n"), F.asc("w")).limit(max_words)
    return [(r["w"], r["n"]) for r in tok.collect()]


def _pair_stats(vocab: dict[tuple[str, ...], int]) -> Counter:
    pairs: Counter = Counter()
    for sym, n in vocab.items():
        for a, b in zip(sym, sym[1:]):
            pairs[(a, b)] += n
    return pairs


def _merge_vocab(vocab, pair):
    a, b = pair
    ab = a + b
    out = {}
    for sym, n in vocab.items():
        merged = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                merged.append(ab)
                i += 2
            else:
                merged.append(sym[i])
                i += 1
        out[tuple(merged)] = out.get(tuple(merged), 0) + n
    return out


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    max_words: int | None = 100_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns them in
    application order. One corpus-sized Spark job (the word count);
    the loop runs on the bounded word dict driver-side."""
    counts = _word_counts(df, text_col, max_words)
    vocab = {tuple(w) + (_EOW,): n for w, n in counts}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = _pair_stats(vocab)
        if not pairs:
            break
        # max count, ties to the lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = _merge_vocab(vocab, best)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges (by rank) to one word — the greedy lowest-rank-first
    walk every BPE implementation uses."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        ranked = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(sym, sym[1:]))
            if (a, b) in ranks
        ]
        if not ranked:
            break
        _, i = min(ranked)
        sym[i : i + 2] = [sym[i] + sym[i + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with the learned merges. Arrow-batched;
    a per-batch word cache makes the merge walk run once per DISTINCT
    word (natural text repeats words heavily)."""
    from pyspark.sql.functions import pandas_udf

    from lance_flink_spark.session import ship_package

    ship_package(df.sparkSession)
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def one(t):
            out: list[str] = []
            for w in (t or "").lower().split():
                if w not in cache:
                    cache[w] = encode_word(w, ranks)
                out.extend(cache[w])
            return out

        return texts.map(one)

    return df.withColumn(out_col, enc(F.col(text_col)))
