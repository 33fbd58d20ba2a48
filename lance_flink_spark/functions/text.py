"""Text-analysis column expressions for LLM-data pipelines.

All pure Catalyst expressions (split/transform/filter/aggregate
higher-order functions) — JVM-side, codegen'd, no Python in the path.
Each has an exact DuckDB-SQL mirror used by the oracle gate, so the
semantics are pinned cross-engine.

Hash convention shared with dedup: ``md5i(s)`` = first 8 hex chars of
md5 parsed as a bigint — reproducible in any engine with md5().
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# marker stopwords per language for the n-gram/stopword langid heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is", "to", "in"),
    "fr": ("le", "la", "les", "de", "et", "un", "une"),
    "es": ("el", "los", "que", "y", "en", "un", "una"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
}

STOPWORDS = LANG_MARKERS["en"]


def md5i(col: Column) -> Column:
    """Deterministic 32-bit hash: int(md5(s)[:8], 16)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (BPE-ish splitting belongs in a follow-up
    regex; whitespace is the cross-engine-stable baseline)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokens(text))
    )


def subword_count(text: Column) -> Column:
    """BPE-ish token estimate: words + standalone punctuation marks
    (the regex pre-tokenization step of BPE tokenizers)."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\w+|[^\w\s]"), 0))


ROLLING_M = 100_000_000_000_000_003  # < 2^63/31 so acc*31+c never overflows


def rolling_hash_norm(norm: Column) -> Column:
    """Polynomial rolling hash over an ALREADY-normalized string's code
    points: acc = (acc*31 + code) mod M, left fold — cross-engine
    reproducible (DuckDB: list_reduce with a prepended 0 seed).

    Taking the normalized column lets a single-pass feature extractor
    (plans/text_dedup.text_features) project normalize_text ONCE and
    share it between the hash and the md5 fingerprint — measured ~2×
    faster cold (smaller codegen graph to compile).

    The text is split to a char array ONCE and folded; indexing the
    string per position instead would inline the normalization regexp
    into every per-char lambda call (O(len²) — measured 20× slower).
    The char→code conversion is hoisted into one transform() so the
    fold lambda is pure integer math (smaller codegen, ~3× faster
    first-run compile, slightly faster warm)."""
    codes = F.transform(F.split(norm, ""), F.ascii)
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % F.lit(ROLLING_M),
    )


def rolling_hash(text: Column) -> Column:
    """rolling_hash_norm over normalize_text(text)."""
    return rolling_hash_norm(normalize_text(text))


def marker_hits(text: Column, markers: tuple[str, ...]) -> Column:
    """Count of tokens that are in the marker list."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens(F.lower(text)), lambda t: F.array_contains(arr, t)))


def lang_id(text: Column) -> Column:
    """Argmax over per-language marker-hit counts; 'und' when no
    marker hits at all. The cascade below (ties favor earlier langs in
    en→fr→es→de order) is mirrored verbatim as a CASE in the oracle."""
    h = {lang: marker_hits(text, m) for lang, m in LANG_MARKERS.items()}
    return (
        F.when(
            (h["en"] > 0) & (h["en"] >= h["fr"]) & (h["en"] >= h["es"]) & (h["en"] >= h["de"]),
            F.lit("en"),
        )
        .when((h["fr"] > 0) & (h["fr"] >= h["es"]) & (h["fr"] >= h["de"]), F.lit("fr"))
        .when((h["es"] > 0) & (h["es"] >= h["de"]), F.lit("es"))
        .when(h["de"] > 0, F.lit("de"))
        .otherwise(F.lit("und"))
    )


def punct_count(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality: length saturation (40%), low punct
    density (30%), stopword presence (30%). Same closed formula in the
    oracle SQL."""
    n_tok = token_count(text).cast("double")
    n_chr = F.greatest(F.length(text), F.lit(1)).cast("double")
    stop = marker_hits(text, STOPWORDS).cast("double")
    return F.round(
        F.least(F.lit(1.0), n_tok / 50.0) * 0.4
        + (F.lit(1.0) - punct_count(text).cast("double") / n_chr) * 0.3
        + F.least(F.lit(1.0), stop / F.greatest(n_tok, F.lit(1.0)) * 5.0) * 0.3,
        6,
    )


def repetition_ratio(text: Column, n: int = 3) -> Column:
    """Gopher-style repetition signal: 1 - distinct_ngrams/total_ngrams
    over word n-grams (0 = no repetition). Degenerate docs (< n tokens)
    score 0."""
    grams = word_shingles(text, n)
    total = F.size(grams)
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        F.round(1.0 - F.size(F.array_distinct(grams)) / total.cast("double"), 6)
    )


REDACT_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "phone": r"\+?\d[\d\s().-]{7,}\d",
}


def redact(text: Column, kinds: tuple[str, ...] = ("email", "url", "phone")) -> Column:
    """PII/URL scrubbing: replace each matched span with <KIND>.
    Pattern order is fixed (dict order) so output is deterministic."""
    out = text
    for kind in kinds:
        out = F.regexp_replace(out, REDACT_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def normalize_text(text: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "))


def fingerprint(text: Column) -> Column:
    """Content fingerprint over normalized text — the exact-dedup key."""
    return F.md5(normalize_text(text))


def _shingle_range(count: Column) -> Column:
    """sequence(1, count), or empty when count < 1 (Spark's sequence
    would descend for 1 > stop — guard against that)."""
    return F.when(count >= 1, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )


def chunk_tokens(text: Column, chunk_size: int = 32, overlap: int = 8) -> Column:
    """Overlapping token chunks (the RAG/training-data chunking op):
    array of structs (start, chunk_text, n_chunk_tokens). Stride =
    chunk_size - overlap; chunk starts at token index 1, 1+stride, …

    Row-local (no shuffle); explode downstream to one row per chunk."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    arr = tokens(text)
    return F.transform(
        F.when(F.size(arr) >= 1, F.sequence(F.lit(1), F.size(arr), F.lit(stride))).otherwise(
            F.array().cast("array<int>")
        ),
        lambda s: F.struct(
            s.alias("start"),
            F.concat_ws(" ", F.slice(arr, s, chunk_size)).alias("chunk_text"),
            F.size(F.slice(arr, s, chunk_size)).alias("n_chunk_tokens"),
        ),
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """n-word shingles as strings.

    Built by zip_with over n shifted slices of the token array rather
    than indexing inside a transform lambda: Catalyst inlines the
    tokenization expression into every lambda reference, so per-element
    element_at(arr, i+j) recomputes the split O(tokens·n) times per row
    (measured 8s for 5000 docs, single-digit µs/row after this fix).
    Slicing references the array a constant number of times per row."""
    arr = tokens(F.lower(text))
    count = F.greatest(F.size(arr) - (n - 1), F.lit(0))
    shingle = F.slice(arr, 1, count)
    for j in range(1, n):
        shingle = F.zip_with(
            shingle, F.slice(arr, j + 1, count), lambda a, b: F.concat_ws(" ", a, b)
        )
    return shingle


def char_shingles(text: Column, n: int = 3) -> Column:
    return F.transform(
        _shingle_range(F.length(text) - (n - 1)),
        lambda i: text.substr(i, F.lit(n)),
    )


def gopher_stats(text: Column) -> dict[str, Column]:
    """The integer ingredients of Gopher-style document quality rules
    (Rae et al. 2021, "Scaling Language Models" App. A — word count,
    mean word length, lexical diversity, stopword presence), kept as
    EXACT integers so every rule is an integer comparison — no
    float/rounding semantics anywhere on the hashed surface.

    Tokenization mirrors the oracle's ``_TOKS`` (trim → lower → split
    on whitespace)."""
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    empty = F.length(F.trim(text)) == 0
    return {
        "n_words": F.when(empty, F.lit(0)).otherwise(F.size(toks)).cast("long"),
        "total_word_chars": F.length(
            F.regexp_replace(F.trim(F.lower(text)), r"\s", "")
        ).cast("long"),
        "n_distinct_words": F.when(empty, F.lit(0))
        .otherwise(F.size(F.array_distinct(toks)))
        .cast("long"),
        "stop_hits": marker_hits(text, STOPWORDS).cast("long"),
    }


def gopher_rules(text: Column) -> dict[str, Column]:
    """Per-rule booleans + the composite pass flag. Thresholds follow
    the Gopher paper's shape, scaled to short synthetic docs (the
    thresholds are arguments of the rule, not its structure):

    - word count in [10, 1000]
    - mean word length in [3, 10]  (as 3·n ≤ total_chars ≤ 10·n)
    - lexical diversity: distinct words ≥ 30% of words  (10·d ≥ 3·n)
    - ≥ 1 English stopword hit
    """
    s = gopher_stats(text)
    r_count = (s["n_words"] >= 10) & (s["n_words"] <= 1000)
    r_wordlen = (s["total_word_chars"] >= 3 * s["n_words"]) & (
        s["total_word_chars"] <= 10 * s["n_words"]
    )
    r_diversity = 10 * s["n_distinct_words"] >= 3 * s["n_words"]
    r_stop = s["stop_hits"] >= 1
    return {
        **s,
        "rule_word_count": r_count,
        "rule_word_length": r_wordlen,
        "rule_diversity": r_diversity,
        "rule_stopwords": r_stop,
        "passes_gopher": r_count & r_wordlen & r_diversity & r_stop,
    }


def fim_rearrange(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "fim_text",
):
    """FILL-IN-MIDDLE pretraining transform (Bavarian et al. 2022's
    PSM rearrangement): two md5-seeded character cuts a ≤ b —
    deterministic from the row's ``id_col``, no RNG state, so any
    engine reproduces the exact cuts — split each document into
    prefix/middle/suffix and the row gains ``out_col`` =
    ``<PRE>prefix<SUF>suffix<MID>middle`` plus the three span lengths.
    Pure Catalyst (md5/conv/substr): a map-only pass at any scale.
    Shared by the fim_transform registry query and the SQL
    ``fim_transform('t', 'id', 'text')`` table function."""
    did = F.col(id_col).cast("string")
    h1 = F.conv(
        F.substring(F.md5(F.concat(F.lit("fim:"), did)), 1, 8), 16, 10
    ).cast("long")
    h2 = F.conv(
        F.substring(F.md5(F.concat(F.lit("fim2:"), did)), 1, 8), 16, 10
    ).cast("long")
    L = F.length(text_col)
    a = F.when(L < 2, F.lit(0)).otherwise(h1 % L)
    b = F.when(L < 2, F.lit(0)).otherwise(a + (h2 % (L - a + 1)))
    c = df.select(
        id_col, text_col, L.alias("__L"), a.alias("__a"), b.alias("__b")
    )
    text = F.col(text_col)
    prefix = text.substr(F.lit(1), F.col("__a"))
    middle = text.substr(F.col("__a") + 1, F.col("__b") - F.col("__a"))
    suffix = text.substr(F.col("__b") + 1, F.col("__L") - F.col("__b"))
    return c.select(
        id_col,
        F.col("__a").alias("n_prefix"),
        (F.col("__b") - F.col("__a")).alias("n_middle"),
        (F.col("__L") - F.col("__b")).alias("n_suffix"),
        F.concat(
            F.lit("<PRE>"), prefix,
            F.lit("<SUF>"), suffix,
            F.lit("<MID>"), middle,
        ).alias(out_col),
    )
