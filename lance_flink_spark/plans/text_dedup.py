"""Registry entries for text analysis + dedup (SURVEY §2 #30-40).

Every oracle below re-implements the exact same math in DuckDB SQL —
including the md5-derived hashing — so even the MinHash/SimHash
signatures are bit-identical across engines (upgraded from the
rows-only plan in SURVEY §2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lance_flink_spark.functions.text import (
    LANG_MARKERS,
    ROLLING_M,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from lance_flink_spark.operators.dedup import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    _provision_explode,
    embedding_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from lance_flink_spark.registry import query, table

# ---------- shared DuckDB SQL fragments ----------

_MD5I = "('0x' || substr(md5({x}), 1, 8))::BIGINT"

_TOKS = "regexp_split_to_array(trim(lower(text)), '\\s+')"

# distinct 3-word shingles per doc (1-based list indexing, as in Spark element_at)
_GRAMS = f"""
    SELECT DISTINCT doc_id, gram FROM (
        SELECT doc_id, {_TOKS} AS arr FROM documents) t,
        unnest(list_transform(range(1, greatest(len(arr) - 2, 0) + 1),
               i -> concat(arr[i], ' ', arr[i+1], ' ', arr[i+2]))) AS u(gram)
"""


def _hits(markers: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter({_TOKS}, x -> x IN ({lst})))"


# ---------- text analysis ----------

_EN_HITS_ARR = "len(list_filter(arr, x -> x IN ({lst})))".format(
    lst=", ".join(f"'{m}'" for m in LANG_MARKERS["en"])
)


@query(
    "text_features",
    extra=True,  # r15 rotation: demoted, full oracle still checked in extras
    oracle=f"""
    WITH base AS (
        SELECT doc_id, text, {_TOKS} AS arr,
               trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
        FROM documents),
    m AS (
        SELECT doc_id, text, arr, norm,
               (CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(arr) END)::DOUBLE AS n_tok,
               length(text)::DOUBLE AS n_chr,
               (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE AS punct,
               ({_EN_HITS_ARR})::DOUBLE AS stop,
               list_transform(range(1, greatest(len(arr) - 2, 0) + 1),
                              i -> concat(arr[i], ' ', arr[i+1], ' ', arr[i+2])) AS grams
        FROM base)
    SELECT doc_id,
           CAST(n_tok AS BIGINT) AS n_tokens,
           len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_subtokens,
           length(text) AS n_chars_m,
           list_reduce(
               list_prepend(0::BIGINT,
                   list_transform(range(1, length(norm) + 1),
                                  i -> ord(substr(norm, i, 1))::BIGINT)),
               (a, c) -> (a * 31 + c) % {ROLLING_M}) AS rh,
           ROUND(LEAST(1.0, n_tok / 50.0) * 0.4
                 + (1.0 - punct / GREATEST(n_chr, 1.0)) * 0.3
                 + LEAST(1.0, stop / GREATEST(n_tok, 1.0) * 5.0) * 0.3, 6) AS quality,
           md5(norm) AS fp,
           CASE WHEN len(grams) <= 0 THEN 0.0
                ELSE ROUND(1.0 - len(list_distinct(grams)) / len(grams)::DOUBLE, 6)
           END AS rep_ratio
    FROM m
    """,
)
def text_features(spark, sf_dir):
    """Single-pass per-document text feature extraction (SURVEY §2
    #38/#39/#40/#44/#45/#64 in one gate entry): whitespace + BPE-ish
    subword token counts, char count, polynomial rolling hash, quality
    score, normalized-content md5 fingerprint, and the Gopher-style
    duplicated-3-gram repetition ratio. All Catalyst HOFs, zero Python
    UDFs, zero shuffles — at 100 TB this is the pattern: compute every
    per-doc signal in ONE scan instead of five. Standalone single-signal
    entries remain as extras."""
    from lance_flink_spark.functions.text import (
        normalize_text,
        repetition_ratio,
        rolling_hash_norm,
        subword_count,
    )

    # the per-row HOF work is ~n_tokens× the input bytes, so a
    # single-split scan starves it like an explode would — provision
    # to cluster parallelism (no-op at production split counts; the
    # plan stays narrow after the one conditional text-bytes exchange)
    d = _provision_explode(table(spark, sf_dir, "documents"))
    # project the normalization ONCE and share it between the rolling
    # hash and the md5 fingerprint: the halved expression graph compiles
    # ~2× faster (4.5s → 2.3s cold at sf0.1) and stays one narrow
    # scan→project→project pipeline — no shuffle, no extra pass
    base = d.select("doc_id", "text", normalize_text(F.col("text")).alias("__norm"))
    return base.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        subword_count(F.col("text")).cast("long").alias("n_subtokens"),
        F.length("text").cast("long").alias("n_chars_m"),
        rolling_hash_norm(F.col("__norm")).alias("rh"),
        quality_score(F.col("text")).alias("quality"),
        F.md5(F.col("__norm")).alias("fp"),
        repetition_ratio(F.col("text")).alias("rep_ratio"),
    )


@query(
    "text_tokens",
    extra=True,  # gate-covered by the single-pass text_features entry
    oracle=f"""
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_TOKS}) END AS n_tokens,
           len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_subtokens,
           length(text) AS n_chars_m
    FROM documents
    """,
)
def text_tokens(spark, sf_dir):
    """Token counting: whitespace tokens + BPE-ish regex
    pre-tokenization count, per document."""
    from lance_flink_spark.functions.text import subword_count

    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        subword_count(F.col("text")).cast("long").alias("n_subtokens"),
        F.length("text").cast("long").alias("n_chars_m"),
    )


@query(
    "text_rolling_hash",
    extra=True,  # gate-covered by the single-pass text_features entry
    oracle=f"""
    SELECT doc_id,
           list_reduce(
               list_prepend(0::BIGINT,
                   list_transform(range(1, length(norm) + 1),
                                  i -> ord(substr(norm, i, 1))::BIGINT)),
               (a, c) -> (a * 31 + c) % {ROLLING_M}) AS rh
    FROM (SELECT doc_id,
                 trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
          FROM documents) n
    """,
)
def text_rolling_hash(spark, sf_dir):
    """Polynomial rolling-hash document fingerprint over normalized
    text (the incremental-hash family used for content-defined
    chunking); exact cross-engine parity via mod-M left fold."""
    from lance_flink_spark.functions.text import rolling_hash

    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", rolling_hash(F.col("text")).alias("rh"))


_LANGID_CASE = f"""
    CASE WHEN h_en > 0 AND h_en >= h_fr AND h_en >= h_es AND h_en >= h_de THEN 'en'
         WHEN h_fr > 0 AND h_fr >= h_es AND h_fr >= h_de THEN 'fr'
         WHEN h_es > 0 AND h_es >= h_de THEN 'es'
         WHEN h_de > 0 THEN 'de'
         ELSE 'und' END
"""


@query(
    "text_langid",
    extra=True,  # gate budget; langid gate-covered via pipeline_clean_corpus
    oracle=f"""
    SELECT lang, pred_lang, COUNT(*) AS n FROM (
        SELECT lang, {_LANGID_CASE} AS pred_lang FROM (
            SELECT lang,
                   {_hits(LANG_MARKERS['en'])} AS h_en,
                   {_hits(LANG_MARKERS['fr'])} AS h_fr,
                   {_hits(LANG_MARKERS['es'])} AS h_es,
                   {_hits(LANG_MARKERS['de'])} AS h_de
            FROM documents) h) p
    GROUP BY lang, pred_lang
    """,
)
def text_langid(spark, sf_dir):
    """Language-ID heuristic (stopword-marker argmax) → confusion
    counts against the labeled lang column."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select("lang", lang_id(F.col("text")).alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "text_quality",
    extra=True,  # gate-covered by the single-pass text_features entry
    oracle=f"""
    SELECT doc_id,
           ROUND(LEAST(1.0, n_tok / 50.0) * 0.4
                 + (1.0 - punct / GREATEST(n_chr, 1.0)) * 0.3
                 + LEAST(1.0, stop / GREATEST(n_tok, 1.0) * 5.0) * 0.3, 6) AS quality
    FROM (
        SELECT doc_id,
               (CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_TOKS}) END)::DOUBLE AS n_tok,
               length(text)::DOUBLE AS n_chr,
               (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE AS punct,
               ({_hits(LANG_MARKERS['en'])})::DOUBLE AS stop
        FROM documents) m
    """,
)
def text_quality(spark, sf_dir):
    """Quality score: length saturation + punctuation density +
    stopword presence, one closed formula (see functions.text)."""
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score(F.col("text")).alias("quality"))


@query(
    "text_fingerprint",
    extra=True,  # gate-covered by the single-pass text_features entry
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark, sf_dir):
    """Normalized content fingerprint (md5 over lowercased,
    punctuation-collapsed text)."""
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint(F.col("text")).alias("fp"))


@query(
    "text_chunking",
    extra=True,  # r13 rotation: banked (driver hash-green r12); text_features stays primary
    oracle=f"""
    SELECT doc_id,
           CAST((s - 1) / 24 AS BIGINT) AS chunk_idx,
           md5(array_to_string(list_slice(arr, s, s + 31), ' ')) AS chunk_fp,
           len(list_slice(arr, s, s + 31)) AS n_chunk_tokens
    FROM (SELECT doc_id, {_TOKS.replace("lower(text)", "text")} AS arr FROM documents) t,
         unnest(range(1, len(arr) + 1, 24)) u(s)
    """,
)
def text_chunking(spark, sf_dir):
    """Overlapping token chunking (32-token chunks, 8-token overlap) —
    the RAG/training chunker; one row per chunk with a content
    fingerprint. Row-local transform + explode, no shuffle."""
    from lance_flink_spark.functions.text import chunk_tokens

    d = table(spark, sf_dir, "documents")
    c = d.select(
        "doc_id", F.explode(chunk_tokens(F.col("text"), 32, 8)).alias("c")
    )
    return c.select(
        "doc_id",
        (((F.col("c.start") - 1) / 24).cast("long")).alias("chunk_idx"),
        F.md5(F.col("c.chunk_text")).alias("chunk_fp"),
        F.col("c.n_chunk_tokens").cast("long").alias("n_chunk_tokens"),
    )


@query(
    "sample_split",
    extra=True,  # r11 rotation out: sampling family driver-graded via stratified_cap + weighted_sample
    oracle="""
    SELECT lang, split, COUNT(*) AS n, ROUND(AVG(n_chars), 6) AS avg_chars
    FROM (SELECT lang, n_chars,
                 CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
          FROM (SELECT lang, n_chars,
                       ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS b
                FROM documents) h) s
    GROUP BY lang, split
    """,
)
def sample_split(spark, sf_dir):
    """Deterministic hash-bucket train/val/test split (80/10/10) —
    stable across runs, engines, cluster sizes; zero shuffle for the
    split itself (operators/sampling.py)."""
    from lance_flink_spark.operators.sampling import train_val_test_split

    d = train_val_test_split(table(spark, sf_dir, "documents"), key_col="doc_id")
    return d.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
    )


@query(
    "corpus_seeded_shuffle",
    extra=True,  # r13 rotation: banked (driver hash-green r12)
    # r11 rotation: the #222 seeded-shuffle flagship gets driver-grade evidence
    oracle="""
    WITH h AS (
      SELECT doc_id, md5(concat('42:', CAST(doc_id AS VARCHAR))) AS hh
      FROM documents),
    r AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY hh, doc_id) AS o FROM h)
    SELECT doc_id,
           CAST(o AS BIGINT) AS ord,
           CAST((o - 1) % 8 AS INT) AS shard,
           CAST((o - 1) // 8 AS BIGINT) AS pos_in_shard
    FROM r
    """,
)
def corpus_seeded_shuffle(spark, sf_dir):
    """Deterministic seeded corpus shuffle + round-robin sharding
    (operators/sampling.py::seeded_shuffle): the reproducible
    training-order step of a data pipeline — same seed, same total
    order, any cluster size. The oracle replays the md5 order with a
    plain window ROW_NUMBER, so a rank mis-offset anywhere in the
    distributed row-number machinery (range bucket boundaries, offset
    arithmetic, hash-prefix monotonicity) breaks the hash."""
    from lance_flink_spark.operators.sampling import seeded_shuffle

    docs = table(spark, sf_dir, "documents").select("doc_id")
    return seeded_shuffle(docs, "doc_id", seed=42, n_shards=8).select(
        "doc_id", "ord", "shard", "pos_in_shard"
    )


@query(
    "embeddings_normalize",
    extra=True,  # r11 rotation out: vector-function surface driver-graded via knn_join/ivf twins
    oracle="""
    SELECT vec_id,
           ROUND(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2_norm,
           ROUND(embedding[1] / sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS u0
    FROM embeddings
    """,
)
def embeddings_normalize(spark, sf_dir):
    """Unit-normalization pass (pre-req for cosine ANN at scale: store
    unit vectors once, then cosine == dot). Emits the norm and the
    first normalized component as the oracle-checkable scalars."""
    from lance_flink_spark.functions import vector as V

    e = table(spark, sf_dir, "embeddings")
    n = V.norm(F.col("embedding"))
    return e.select(
        "vec_id",
        F.round(n, 6).alias("l2_norm"),
        F.round(F.element_at(F.col("embedding").cast("array<double>"), 1) / n, 6).alias("u0"),
    )


@query(
    "stratified_cap",
    extra=True,  # r15 rotation: demoted, full oracle still checked in extras
    oracle="""
    SELECT lang, COUNT(*) AS n_kept, MIN(doc_id) AS min_id
    FROM (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT, doc_id
               ) AS rn
        FROM documents) r
    WHERE rn <= 50
    GROUP BY lang
    """,
)
def stratified_cap(spark, sf_dir):
    """Corpus balancing: cap each language at 50 docs, selected by a
    deterministic hash order (not arrival order — stable across runs,
    engines, partitionings). One shuffle on the stratum key."""
    from pyspark.sql import Window

    from lance_flink_spark.functions.text import md5i

    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        md5i(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("lang", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 50)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.min("doc_id").alias("min_id"))
    )


@query(
    "text_repetition",
    extra=True,  # gate-covered by the single-pass text_features entry
    oracle=f"""
    SELECT doc_id,
           CASE WHEN len(grams) <= 0 THEN 0.0
                ELSE ROUND(1.0 - len(list_distinct(grams)) / len(grams)::DOUBLE, 6)
           END AS rep_ratio
    FROM (
        SELECT doc_id,
               list_transform(range(1, greatest(len(arr) - 2, 0) + 1),
                              i -> concat(arr[i], ' ', arr[i+1], ' ', arr[i+2])) AS grams
        FROM (SELECT doc_id, {_TOKS} AS arr FROM documents) t) g
    """,
)
def text_repetition(spark, sf_dir):
    """Repetition signal (Gopher-style quality filter): fraction of
    duplicated word 3-grams per document. Row-local, no shuffle."""
    from lance_flink_spark.functions.text import repetition_ratio

    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", repetition_ratio(F.col("text")).alias("rep_ratio"))


@query(
    "pipeline_clean_corpus",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang, n_chars,
               ROUND(LEAST(1.0, n_tok / 50.0) * 0.4
                     + (1.0 - punct / GREATEST(n_chr, 1.0)) * 0.3
                     + LEAST(1.0, stop / GREATEST(n_tok, 1.0) * 5.0) * 0.3, 6) AS quality,
               md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
        FROM (
            SELECT doc_id, lang, n_chars, text,
                   (CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_TOKS}) END)::DOUBLE AS n_tok,
                   length(text)::DOUBLE AS n_chr,
                   (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE AS punct,
                   ({_hits(LANG_MARKERS['en'])})::DOUBLE AS stop
            FROM documents) m),
    kept AS (
        SELECT lang, fp, MIN(doc_id) AS keep_id, MIN(n_chars) AS n_chars_kept
        FROM scored WHERE quality >= 0.5
        GROUP BY lang, fp)
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars_kept) AS BIGINT) AS total_chars
    FROM kept GROUP BY lang
    """,
)
def pipeline_clean_corpus(spark, sf_dir):
    """Composed data-prep pipeline (the 100TB pretraining-corpus
    shape): quality-filter → exact-dedup within language → corpus
    stats. One declarative plan — Catalyst fuses the filter into the
    scan and the dedup groupBy is the only shuffle."""
    d = table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        "n_chars",
        quality_score(F.col("text")).alias("quality"),
        fingerprint(F.col("text")).alias("fp"),
    )
    kept = (
        scored.filter(F.col("quality") >= 0.5)
        .groupBy("lang", "fp")
        .agg(F.min("doc_id").alias("keep_id"), F.min("n_chars").alias("n_chars_kept"))
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars_kept").alias("total_chars"),
    )


# ---------- dedup ----------


@query(
    "dedup_exact",
    extra=True,  # r14 rotation: banked; minhash/embedding/canonical stay primary
    oracle="""
    SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup by content fingerprint; one shuffle on the hash."""
    return exact_dedup(table(spark, sf_dir, "documents"))


_A16 = "[" + ", ".join(str(a) for a in MINHASH_A[:16]) + "]"
_B16 = "[" + ", ".join(str(b) for b in MINHASH_B[:16]) + "]"

_SIGS = f"""
    SELECT doc_id, i,
           MIN((list_extract({_A16}, i + 1) * h + list_extract({_B16}, i + 1)) % {MINHASH_P}) AS sig
    FROM (SELECT doc_id, {_MD5I.format(x='gram')} AS h FROM ({_GRAMS}) g0) g,
         unnest(range(0, 16)) c(i)
    GROUP BY doc_id, i
"""


@query(
    "dedup_minhash",
    oracle=f"""
    WITH capped AS (
        SELECT doc_id, i, sig FROM (
            SELECT doc_id, i, sig, COUNT(*) OVER (PARTITION BY i, sig) AS bsz
            FROM ({_SIGS}) s0) s
        WHERE bsz <= 200)
    SELECT id_a, id_b, n_matches FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_matches
        FROM capped a JOIN capped b
          ON a.i = b.i AND a.sig = b.sig AND a.doc_id < b.doc_id
        GROUP BY 1, 2) m
    WHERE n_matches >= 8
    """,
)
def dedup_minhash(spark, sf_dir):
    """MinHash-LSH near-dup candidates: 16 md5-derived signature
    components, pairs sharing ≥ 8 (est. jaccard ≥ 0.5). Bucket join on
    (component, value) — shuffle carries buckets, never all-pairs —
    with a 200-doc bucket cap bounding degenerate signature buckets
    (operators/dedup.py::minhash_lsh_pairs)."""
    return minhash_lsh_pairs(
        table(spark, sf_dir, "documents"), k=16, min_matches=8, max_bucket=200
    )


@query(
    "dedup_simhash",
    extra=True,  # gate budget; near-dup family keeps 4 other gate slots
    oracle=f"""
    WITH h AS (SELECT doc_id, {_MD5I.format(x='gram')} AS h FROM ({_GRAMS}) g),
    sigs AS (
        SELECT doc_id,
               {" + ".join(f"(CASE WHEN SUM(((h >> {j}) & 1) * 2 - 1) > 0 THEN {1 << j} ELSE 0 END)" for j in range(16))} AS sig
        FROM h GROUP BY doc_id),
    sl AS (SELECT s.doc_id, s.sig, d.lang FROM sigs s JOIN documents d USING (doc_id))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
    FROM sl a JOIN sl b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= 3
    """,
)
def dedup_simhash(spark, sf_dir):
    """SimHash (16-bit majority-vote signature) near-dup pairs within
    lang blocks, hamming ≤ 3."""
    return simhash_pairs(table(spark, sf_dir, "documents"), max_hamming=3)


@query(
    "dedup_ngram_jaccard",
    extra=True,  # r13 rotation: banked (driver hash-green r12); exact/minhash/embedding stay primary
    oracle=f"""
    WITH g AS (
        SELECT DISTINCT d.doc_id, d.lang, u.gram FROM (
            SELECT doc_id, lang, {_TOKS} AS arr FROM documents) d,
            unnest(list_transform(range(1, greatest(len(arr) - 2, 0) + 1),
                   i -> concat(arr[i], ' ', arr[i+1], ' ', arr[i+2]))) AS u(gram)),
    gdf AS (SELECT lang, gram, COUNT(*) AS gdf FROM g GROUP BY 1, 2),
    capped AS (
        SELECT g.doc_id, g.lang, g.gram
        FROM g JOIN gdf ON g.lang = gdf.lang AND g.gram = gdf.gram
        WHERE gdf.gdf <= 100),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM capped a JOIN capped b
          ON a.gram = b.gram AND a.lang = b.lang AND a.doc_id < b.doc_id),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
    inter AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS inter
        FROM cand c
        JOIN g ga ON ga.doc_id = c.id_a
        JOIN g gb ON gb.doc_id = c.id_b AND gb.gram = ga.gram
        GROUP BY 1, 2)
    SELECT id_a, id_b,
           ROUND(inter / (sa.n + sb.n - inter), 6) AS jaccard
    FROM inter JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
    WHERE ROUND(inter / (sa.n + sb.n - inter), 6) >= 0.3
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """3-word-shingle jaccard ≥ 0.3: df-capped (max_df=100) candidate
    generation bounds every inverted-index bucket, then EXACT jaccard
    verification per candidate pair (operators/dedup.py). The oracle
    mirrors the cap + verify, so the gate exercises the scale path."""
    return ngram_jaccard_pairs(
        table(spark, sf_dir, "documents"), threshold=0.3, max_df=100
    )


from lance_flink_spark.operators.dedup import rademacher_planes as _rh_planes

_PLANES = _rh_planes(64, 8)
_RH_BLK = " + ".join(
    f"(CASE WHEN list_inner_product(v, [{', '.join(f'{float(x)}' for x in p)}]) >= 0"
    f" THEN {2**j} ELSE 0 END)"
    for j, p in enumerate(_PLANES)
)


@query(
    "dedup_embedding",
    extra=True,  # r15 rotation: demoted, full oracle still checked in extras
    oracle=f"""
    WITH aug AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        UNION ALL
        SELECT vec_id + 100000,
               list_transform(embedding::DOUBLE[], x -> x * 1.5)
        FROM embeddings WHERE vec_id < 25),
    e AS (SELECT vec_id, v, {_RH_BLK} AS blk FROM aug),
    bs AS (SELECT blk, COUNT(*) AS bsz FROM e GROUP BY blk),
    ec AS (SELECT e.* FROM e JOIN bs USING (blk) WHERE bs.bsz <= 200)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM ec a JOIN ec b ON a.blk = b.blk AND a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.5
    """,
)
def dedup_embedding(spark, sf_dir):
    """Embedding near-dup pairs (cosine ≥ 0.5) blocked on an 8-bit
    md5-seeded random-hyperplane signature with a bucket-size cap of
    200 — the scale-safe blocking (leading-dim signs collapse to one
    bucket on all-positive embedding families; see
    operators/dedup.py::embedding_dup_pairs).

    The raw embeddings table is near-orthogonal random data with NO
    pairs above the threshold at any sf — a 0-row oracle match proves
    nothing (r1 verdict). The gate input therefore unions deterministic
    near-duplicates: scaled copies (x1.5 — same direction, cosine
    exactly 1, same hyperplane signs) of the first 25 vectors under
    shifted ids, so the check compares a non-empty, engine-identical
    pair set while still scanning the full corpus for false
    positives."""
    e = table(spark, sf_dir, "embeddings")
    dup = (
        e.filter(F.col("vec_id") < 25)
        .select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.transform(
                F.col("embedding").cast("array<double>"), lambda x: x * 1.5
            ).alias("embedding"),
        )
    )
    aug = e.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")).unionByName(dup)
    return embedding_dup_pairs(aug, threshold=0.5, max_bucket=200)


@query(
    "decontaminate_corpus",
    oracle=f"""
    WITH ev AS (
        SELECT DISTINCT gram FROM (
            SELECT {_TOKS} AS arr FROM documents WHERE doc_id % 97 = 0) d,
            unnest(list_transform(range(1, greatest(len(arr) - 2, 0) + 1),
                   i -> concat(arr[i], ' ', arr[i+1], ' ', arr[i+2]))) AS u(gram)),
    cg AS (
        SELECT DISTINCT doc_id, gram FROM (
            SELECT doc_id, {_TOKS} AS arr FROM documents WHERE doc_id % 97 <> 0) d,
            unnest(list_transform(range(1, greatest(len(arr) - 2, 0) + 1),
                   i -> concat(arr[i], ' ', arr[i+1], ' ', arr[i+2]))) AS u(gram))
    SELECT doc_id, COUNT(*) AS n_hits
    FROM cg JOIN ev USING (gram) GROUP BY doc_id
    """,
)
def decontaminate_corpus(spark, sf_dir):
    """Benchmark decontamination (operators/dedup.py::decontaminate):
    the ~1% doc_id % 97 == 0 slice stands in for an eval benchmark; the
    rest of the corpus is flagged by shared DISTINCT 3-grams via a
    broadcast semi-join (one corpus scan, no corpus-side self-join)."""
    from lance_flink_spark.operators.dedup import decontaminate

    d = table(spark, sf_dir, "documents")
    return decontaminate(d.filter("doc_id % 97 <> 0"), d.filter("doc_id % 97 = 0"))


@query(
    "pack_sequences",
    extra=True,  # r13 rotation: banked (driver hash-green r12); stratified_cap stays primary
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len({_TOKS}) END AS n_tokens
        FROM documents),
    pos AS (
        SELECT doc_id, lang, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
        FROM toks)
    SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(FLOOR(start / 512) AS BIGINT) AS seq_id,
           CAST(start % 512 AS BIGINT) AS seq_offset
    FROM pos
    """,
)
def pack_sequences_entry(spark, sf_dir):
    """GPT-style sequence packing (operators/packing.py): concatenate
    each language's docs in id order, chop every 512 tokens; placement
    is a windowed prefix-sum — one shuffle on the packing partition,
    fully parallel across partitions."""
    from lance_flink_spark.operators.packing import pack_sequences

    return pack_sequences(table(spark, sf_dir, "documents"), budget=512)


@query(
    "pack_spans",
    extra=True,  # gate budget; pack_sequences is the primary row
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len({_TOKS}) END AS n_tokens
        FROM documents),
    pos AS (
        SELECT doc_id, lang, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
        FROM toks WHERE n_tokens > 0),
    spans AS (
        SELECT doc_id, lang, n_tokens, start, u.seq_id
        FROM pos, unnest(generate_series(
            CAST(FLOOR(start / 512) AS BIGINT),
            CAST(FLOOR((start + n_tokens - 1) / 512) AS BIGINT))) AS u(seq_id))
    SELECT doc_id, lang, CAST(seq_id AS BIGINT) AS seq_id,
           CAST(GREATEST(start, seq_id * 512) - start AS BIGINT) AS tok_from,
           CAST(LEAST(start + n_tokens, (seq_id + 1) * 512) - start AS BIGINT) AS tok_to
    FROM spans
    """,
)
def pack_spans_entry(spark, sf_dir):
    """Loader-facing packing spans (operators/packing.py::pack_spans):
    each (doc × sequence) row carries the doc-relative token slice that
    lands in that fixed-512-token sequence — boundary-straddling docs
    split across rows, nothing discarded."""
    from lance_flink_spark.operators.packing import pack_spans

    return pack_spans(table(spark, sf_dir, "documents"), budget=512)


@query(
    "text_redact",
    extra=True,  # gate budget; promotes §2 #65 from pytest-only to oracle-checked
    oracle=r"""
    SELECT doc_id,
      regexp_replace(
        regexp_replace(
          regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          'https?://[^\s]+', '<URL>', 'g'),
        '\+?\d[\d\s().-]{7,}\d', '<PHONE>', 'g') AS red
    FROM documents
    """,
)
def text_redact(spark, sf_dir):
    """PII/URL redaction (functions/text.py::redact): email → URL →
    phone regexp_replace chain, fixed order; both engines run identical
    patterns so the output text is hash-compared verbatim."""
    from lance_flink_spark.functions.text import redact

    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", redact(F.col("text")).alias("red"))


_CLUSTERS_ORACLE = f"""
    WITH RECURSIVE capped AS (
        SELECT doc_id, i, sig FROM (
            SELECT doc_id, i, sig, COUNT(*) OVER (PARTITION BY i, sig) AS bsz
            FROM ({_SIGS}) s0) s
        WHERE bsz <= 200),
    pairs AS (
        SELECT id_a, id_b FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_matches
            FROM capped a JOIN capped b
              ON a.i = b.i AND a.sig = b.sig AND a.doc_id < b.doc_id
            GROUP BY 1, 2) m
        WHERE n_matches >= 8),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
    reach(a, b) AS (
        SELECT src, src FROM edges
        UNION
        SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
    SELECT a AS doc_id, MIN(b) AS keep_id FROM reach GROUP BY a
    """


@query(
    "dedup_clusters",
    extra=True,  # gate budget; iterative CC vs a recursive-CTE oracle
    oracle=_CLUSTERS_ORACLE,
)
def dedup_clusters(spark, sf_dir):
    """Duplicate-cluster resolution (operators/dedup.py::
    resolve_duplicate_clusters): connected components over the minhash
    near-dup pairs → (doc_id, keep_id = min id in cluster), the actual
    keep-one-per-cluster drop list. Spark side is iterative min-label
    propagation (O(diameter) rounds, one shuffle per round); the oracle
    is DuckDB's recursive-CTE transitive closure over the identical
    pair set."""
    from lance_flink_spark.operators.dedup import resolve_duplicate_clusters

    pairs = minhash_lsh_pairs(
        table(spark, sf_dir, "documents"), k=16, min_matches=8, max_bucket=200
    ).select("id_a", "id_b")
    return resolve_duplicate_clusters(pairs)


@query(
    "dedup_clusters_star",
    extra=True,  # same clusters, contraction-style CC — same oracle
    oracle=_CLUSTERS_ORACLE,
)
def dedup_clusters_star(spark, sf_dir):
    """Same duplicate-cluster resolution computed with the large-star/
    small-star contraction variant (operators/dedup.py::
    resolve_duplicate_clusters_star) — O(log n) rounds independent of
    pair-graph diameter, the scale path for chained near-duplicates.
    Output contract and oracle are identical to dedup_clusters."""
    from lance_flink_spark.operators.dedup import resolve_duplicate_clusters_star

    pairs = minhash_lsh_pairs(
        table(spark, sf_dir, "documents"), k=16, min_matches=8, max_bucket=200
    ).select("id_a", "id_b")
    return resolve_duplicate_clusters_star(pairs)


_FP = "md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))"


@query(
    "source_overlap",
    extra=True,  # gate budget; oracle-checks the overlap-matrix shape
    oracle=f"""
    WITH gs AS (
        SELECT DISTINCT source, gram FROM (
            SELECT source, {_TOKS} AS arr FROM documents) t,
            unnest(list_transform(range(1, greatest(len(arr) - 2, 0) + 1),
                   i -> concat(arr[i], ' ', arr[i+1], ' ', arr[i+2]))) AS u(gram))
    SELECT a.source AS source_a, b.source AS source_b,
           COUNT(*) AS n_shared_grams
    FROM gs a JOIN gs b ON a.gram = b.gram AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def source_overlap(spark, sf_dir):
    """Pairwise cross-source n-gram overlap matrix
    (operators/dedup.py::source_overlap): per-gram fan-out is bounded
    by the source count, so the matrix costs one distinct + one
    gram-keyed join regardless of corpus size."""
    from lance_flink_spark.operators.dedup import source_overlap as op

    return op(table(spark, sf_dir, "documents"))


@query(
    "dedup_incremental",
    extra=True,  # gate budget; oracle-checks the ingest anti-join path
    oracle=f"""
    WITH corpus AS (SELECT * FROM documents WHERE doc_id % 10 <> 0),
    batch AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 200000, text FROM documents WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 100000, text FROM corpus WHERE doc_id % 7 = 3),
    bfp AS (SELECT doc_id, {_FP} AS fp FROM batch),
    cfp AS (SELECT DISTINCT {_FP} AS fp FROM corpus)
    SELECT MIN(doc_id) AS doc_id, fp, COUNT(*) AS n_batch_copies
    FROM bfp WHERE fp NOT IN (SELECT fp FROM cfp)
    GROUP BY fp
    """,
)
def dedup_incremental(spark, sf_dir):
    """Incremental ingest dedup (operators/dedup.py::incremental_dedup):
    corpus = 90% of documents; the incoming batch unions (a) the held-out
    10% under their own ids — genuinely new, kept, (b) the same docs
    again under shifted ids — batch-internal dups, first id wins with
    n_batch_copies = 2, and (c) re-submissions of existing corpus docs —
    dropped by the fingerprint anti-join. Non-vacuous in both
    directions: the result is exactly the held-out slice, one row per
    fingerprint."""
    from lance_flink_spark.operators.dedup import incremental_dedup

    d = table(spark, sf_dir, "documents")
    corpus = d.filter("doc_id % 10 <> 0")
    held = d.filter("doc_id % 10 = 0").select("doc_id", "text")
    batch = (
        held
        .unionByName(held.select((F.col("doc_id") + 200000).alias("doc_id"), "text"))
        .unionByName(
            corpus.filter("doc_id % 7 = 3")
            .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
        )
    )
    return incremental_dedup(batch, corpus)


@query(
    "vocab_topk",
    extra=True,  # gate budget; oracle-checks the vocab-building shape
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, u.token FROM (
            SELECT doc_id, {_TOKS} AS arr FROM documents) t,
            unnest(arr) AS u(token)
        WHERE u.token <> '')
    SELECT token,
           COUNT(DISTINCT doc_id) AS df,
           COUNT(*) AS tf
    FROM tok GROUP BY token
    ORDER BY df DESC, token ASC LIMIT 100
    """,
)
def vocab_topk(spark, sf_dir):
    """Vocabulary building — top-100 tokens by document frequency (ties
    broken on the token itself, a total order). The tokenizer-prep /
    corpus-stats op every training pipeline runs first.

    Scale shape: explode is row-local; the groupBy partial-aggregates
    map-side (token cardinality << token occurrences), and the top-100
    is TakeOrderedAndProject — per-partition heap + driver merge, no
    full sort shuffle."""
    d = table(spark, sf_dir, "documents")
    tok = (
        d.select(
            "doc_id",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count_distinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("tf"),
        )
        .orderBy(F.desc("df"), F.asc("token"))
        .limit(100)
    )


@query(
    "text_unigram_logprob",
    extra=True,  # gate budget; oracle-checks the LM-score shape
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, u.token FROM (
            SELECT doc_id, {_TOKS} AS arr FROM documents) t,
            unnest(arr) AS u(token)
        WHERE u.token <> ''),
    tf AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
    tot AS (SELECT SUM(c) AS s FROM tf)
    SELECT doc_id,
           ROUND(AVG(ln(c / s)), 6) AS avg_logp,
           COUNT(*) AS n_toks
    FROM tok JOIN tf USING (token), tot
    GROUP BY doc_id
    """,
)
def text_unigram_logprob(spark, sf_dir):
    """Unigram language-model quality score (the KenLM-perplexity
    stand-in every corpus-filter pipeline runs): per-doc mean log
    probability under the corpus's own unigram distribution — low
    scores flag gibberish/rare-token documents, high scores flag
    boilerplate.

    Scale shape: token frequencies partial-aggregate to vocab size and
    BROADCAST back onto the exploded token stream (vocab << corpus),
    so the only corpus-sized shuffle is the per-doc average — and the
    frequency table is reusable across scoring runs."""
    d = table(spark, sf_dir, "documents")
    tok = (
        d.select(
            "doc_id",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    tf = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = tf.agg(F.sum("c").alias("s"))
    return (
        tok.join(F.broadcast(tf), "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.round(F.avg(F.log(F.col("c") / F.col("s"))), 6).alias("avg_logp"),
            F.count(F.lit(1)).alias("n_toks"),
        )
    )


@query(
    "corpus_mixture",
    extra=True,  # gate budget; data-mixing rates per source
    oracle="""
    SELECT source, COUNT(*) AS n
    FROM (SELECT source,
                 ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS b
          FROM documents) h
    WHERE b < (CASE source WHEN 'src0' THEN 80 WHEN 'src1' THEN 50
                           WHEN 'src2' THEN 20 ELSE 10 END)
    GROUP BY source
    """,
)
def corpus_mixture(spark, sf_dir):
    """Training-mix sampling (operators/sampling.py::mixture_sample):
    per-source keep rates (src0 80%, src1 50%, src2 20%, rest 10%)
    applied as a deterministic hash predicate — row-local, zero
    shuffle, identical surviving rows in both engines."""
    from lance_flink_spark.operators.sampling import mixture_sample

    d = mixture_sample(
        table(spark, sf_dir, "documents"),
        rates={"src0": 80, "src1": 50, "src2": 20},
        default_pct=10,
    )
    return d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))


@query(
    "text_tfidf_topk",
    extra=True,  # gate budget; oracle-checks keyword extraction
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, u.token FROM (
            SELECT doc_id, {_TOKS} AS arr FROM documents) t,
            unnest(arr) AS u(token)
        WHERE u.token <> ''),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
    dfreq AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
    scored AS (
        SELECT doc_id, token, tf, df,
               ROUND(tf * ln(n / df), 6) AS tfidf
        FROM tf JOIN dfreq USING (token), n)
    SELECT doc_id, token, tf, df, tfidf, rn FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS rn
        FROM scored) r
    WHERE rn <= 3
    """,
)
def text_tfidf_topk(spark, sf_dir):
    """Keyword extraction: per-document top-3 terms by tf-idf
    (tf · ln(N/df)), ties broken on the token — the classic corpus
    summarization / topic-tagging op.

    Scale shape: per-(doc,token) counts partial-aggregate map-side;
    the document-frequency table is vocab-sized and BROADCAST back
    onto the counts; the per-doc top-3 is one window shuffle on
    doc_id. The rounded score keeps cross-engine float ordering
    stable."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    tok = (
        d.select(
            "doc_id",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    n = d.agg(F.count_distinct("doc_id").alias("n"))
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.select(
            "doc_id", "token", "tf", "df", "tfidf",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("vector", "spark", "customer")


@query(
    "text_bm25_search",
    extra=True,  # gate budget; oracle-checks lexical retrieval
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, u.token FROM (
            SELECT doc_id, {_TOKS} AS arr FROM documents) t,
            unnest(arr) AS u(token)
        WHERE u.token <> ''),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT AVG(dl) AS avgdl, COUNT(*) AS n FROM dl),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
           WHERE token IN ('vector', 'spark', 'customer')
           GROUP BY doc_id, token),
    dfreq AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY token),
    scored AS (
        SELECT tf.doc_id,
               SUM(ln((n - df + 0.5) / (df + 0.5) + 1.0)
                   * tf * ({BM25_K1} + 1.0)
                   / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl))) AS s
        FROM tf JOIN dfreq USING (token)
        JOIN dl ON tf.doc_id = dl.doc_id, stats
        GROUP BY tf.doc_id)
    SELECT doc_id, ROUND(s, 6) AS bm25 FROM scored
    ORDER BY bm25 DESC, doc_id ASC LIMIT 10
    """,
)
def text_bm25_search(spark, sf_dir):
    """BM25 lexical retrieval — top-10 documents for a fixed query
    (Okapi BM25, k1=1.2 b=0.75, the Lucene-style idf ln((N-df+.5)/
    (df+.5)+1)). The lexical complement of the vector KNN path: data
    pipelines use it for decontamination lookup and quality probes.

    Scale shape: the token stream is filtered to the QUERY terms
    BEFORE any aggregation (a handful of terms — the tf frame is
    query-sized, not corpus-sized); document lengths partial-aggregate
    map-side; idf + corpus stats are broadcast scalars; top-10 is
    TakeOrderedAndProject. No corpus-sized shuffle except the dl
    aggregate, which any per-doc stat already pays."""
    d = table(spark, sf_dir, "documents")
    tok = (
        d.select(
            "doc_id",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n"))
    tf = (
        tok.filter(F.col("token").isin(*BM25_QUERY))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term_score = idf * F.col("tf") * (BM25_K1 + 1.0) / (
        F.col("tf")
        + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term_score), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(10)
    )


@query(
    "record_linkage",
    extra=True,  # one driver round of hash evidence banked (r11)
    oracle="""
    WITH l AS (
      SELECT doc_id AS lid, text FROM documents
    ), r AS (
      SELECT doc_id + 500000 AS rid,
             substr(text, 1, CAST(FLOOR(length(text) * 0.6) AS INT)) AS text
      FROM documents WHERE doc_id % 5 = 0
    ), lt AS (
      SELECT DISTINCT lid, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
      FROM l
    ), rt AS (
      SELECT DISTINCT rid, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
      FROM r
    ), ltc AS (SELECT * FROM lt WHERE token <> ''),
    rtc AS (SELECT * FROM rt WHERE token <> ''),
    lsz AS (SELECT lid, COUNT(*) AS lsz FROM ltc GROUP BY lid),
    rsz AS (SELECT rid, COUNT(*) AS rsz FROM rtc GROUP BY rid),
    rdf AS (SELECT token FROM rtc GROUP BY token HAVING COUNT(*) <= 100),
    cand AS (
      SELECT DISTINCT ltc.lid, b.rid
      FROM ltc JOIN (SELECT rtc.* FROM rtc JOIN rdf USING (token)) b
        ON ltc.token = b.token
    ), inter AS (
      SELECT ltc.lid, rtc.rid, COUNT(*) AS inter
      FROM ltc JOIN rtc ON ltc.token = rtc.token
      JOIN cand ON cand.lid = ltc.lid AND cand.rid = rtc.rid
      GROUP BY ltc.lid, rtc.rid
    )
    SELECT lid AS doc_id, rid AS dirty_id,
           ROUND(inter * 1.0 / (lsz + rsz - inter), 6) AS jaccard
    FROM inter JOIN lsz USING (lid) JOIN rsz USING (rid)
    WHERE inter * 1.0 / (lsz + rsz - inter) >= 0.82
    """,
)
def record_linkage(spark, sf_dir):
    """Two-table record linkage (operators/linkage.py::fuzzy_join):
    documents matched against a deterministic "dirty" side (every 5th
    doc truncated to 60% of its characters under shifted ids) by exact
    token-set Jaccard over df-capped blocked candidates. The oracle
    replays the identical blocking + exact verify relationally, so a
    candidate lost by the inverted-index join or a mis-counted
    intersection breaks the hash."""
    from lance_flink_spark.operators.linkage import fuzzy_join

    docs = table(spark, sf_dir, "documents")
    left = docs.select("doc_id", "text")
    right = docs.filter("doc_id % 5 = 0").select(
        (F.col("doc_id") + 500000).alias("dirty_id"),
        F.expr("substring(text, 1, cast(floor(length(text) * 0.6) as int))").alias("text"),
    )
    return fuzzy_join(
        left, right, "doc_id", "dirty_id", threshold=0.82, max_df=100
    )


@query(
    "training_shards",
    extra=True,  # gate budget; seeded order + distributed prefix-sum cut
    oracle="""
    WITH t AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_tok,
             md5(CONCAT('shard7:', doc_id)) AS rk
      FROM documents
    )
    SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
           CAST(FLOOR((SUM(n_tok) OVER (ORDER BY rk, doc_id) - 1) / 5000.0) AS BIGINT)
             AS shard_id
    FROM t
    """,
)
def training_shards(spark, sf_dir):
    """Token-budget shard assignment over a seeded global permutation
    (operators/packing.py::shard_by_token_budget): the oracle computes
    the same running sum with a single SQL window, the Spark side with
    the bucketed distributed prefix-sum — value-identical, so a bucket
    offset off by one token anywhere breaks the hash."""
    from lance_flink_spark.operators.packing import shard_by_token_budget

    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tok"),
    )
    return shard_by_token_budget(docs, budget=5000, seed="shard7")


@query(
    "weighted_sample",
    extra=True,  # one driver round of hash evidence banked (r11)
    oracle="""
    WITH w AS (
      SELECT doc_id, source, n_chars,
             CAST(n_chars AS DOUBLE) AS wt,
             CAST(CONCAT('0x', substr(md5(CONCAT('ws:', doc_id)), 1, 12)) AS BIGINT)
               / POWER(16, 12) AS u
      FROM documents WHERE n_chars > 0
    ), p AS (
      SELECT doc_id, source, n_chars,
             EXP(LN(u) / wt) AS pri
      FROM w
    ), r AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY pri DESC, doc_id) AS rn
      FROM p)
    SELECT doc_id, source, n_chars FROM r WHERE rn <= 20
    """,
)
def weighted_sample_docs(spark, sf_dir):
    """Per-source weighted sampling without replacement (operators/
    sampling.py::weighted_sample): 20 docs per source with probability
    ∝ length (the Efraimidis-Spirakis top-k-priority reduction). The
    oracle reproduces the md5-derived uniforms and priorities exactly,
    so the SELECTED SET — not just its size — is the check."""
    from lance_flink_spark.operators.sampling import weighted_sample

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("double").alias("wt"), "n_chars"
    )
    return weighted_sample(
        docs, k=20, weight_col="wt", key_col="doc_id", group_col="source"
    ).select("doc_id", "source", "n_chars")


@query(
    "repeated_spans",
    extra=True,  # gate budget; substring-level dup positions
    oracle="""
    WITH aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 700000, text FROM documents WHERE doc_id < 10
    ), t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tok
      FROM aug
    ), pos AS (
      SELECT doc_id, i AS span_start,
             md5(array_to_string(tok[i : i + 19], ' ')) AS span_fp
      FROM t, UNNEST(generate_series(1, len(tok) - 19)) AS u(i)
      WHERE len(tok) >= 20
    ), c AS (
      SELECT span_fp, COUNT(*) AS n_copies FROM pos
      GROUP BY span_fp HAVING COUNT(*) >= 2
    )
    SELECT doc_id, CAST(span_start AS INT) AS span_start, span_fp, n_copies
    FROM pos JOIN c USING (span_fp)
    """,
)
def repeated_spans_docs(spark, sf_dir):
    """Substring-level duplication positions (operators/dedup.py::
    repeated_spans — the fixed-window form of Lee et al.'s
    exact-substring dedup): the corpus is augmented with exact copies
    of the first 10 docs (shifted ids), so every window of those docs
    must be flagged with its position — the oracle checks the POSITION
    set, not just which docs are dirty. The raw corpus contributes any
    organically repeated 20-token spans on top."""
    from lance_flink_spark.operators.dedup import repeated_spans

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    aug = docs.unionByName(
        docs.filter("doc_id < 10").select(
            (F.col("doc_id") + 700000).alias("doc_id"), "text"
        )
    )
    return repeated_spans(aug, window=20, min_copies=2)


@query(
    "cut_repeated_spans",
    oracle="""
    WITH aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 700000, text FROM documents WHERE doc_id < 10
    ), t AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS tok
      FROM aug
    ), pos AS (
      SELECT doc_id, i AS span_start,
             md5(array_to_string(tok[i : i + 19], ' ')) AS span_fp
      FROM t, UNNEST(generate_series(1, len(tok) - 19)) AS u(i)
      WHERE len(tok) >= 20
    ), c AS (
      SELECT span_fp, COUNT(*) AS n_copies FROM pos
      GROUP BY span_fp HAVING COUNT(*) >= 2
    ), flags AS (
      SELECT pos.* FROM pos JOIN c USING (span_fp)
    ), keep AS (
      SELECT span_fp, MIN(ROW(doc_id, span_start)) AS k FROM flags GROUP BY span_fp
    ), cut AS (
      SELECT DISTINCT f.doc_id, f.span_start + i AS p
      FROM flags f JOIN keep USING (span_fp),
           UNNEST(generate_series(0, 19)) AS g(i)
      WHERE NOT (f.doc_id = keep.k[1] AND f.span_start = keep.k[2])
    ), toks AS (
      SELECT doc_id, i AS pos, tok[i] AS tk
      FROM t, UNNEST(generate_series(1, len(tok))) AS u(i)
      WHERE tok[i] <> ''
    ), surv AS (
      SELECT toks.* FROM toks
      LEFT JOIN cut ON toks.doc_id = cut.doc_id AND toks.pos = cut.p
      WHERE cut.p IS NULL
    ), n0 AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id)
    SELECT surv.doc_id,
           string_agg(tk, ' ' ORDER BY pos) AS clean_text,
           CAST(ANY_VALUE(n0.n) - COUNT(*) AS BIGINT) AS n_tokens_cut
    FROM surv JOIN n0 ON surv.doc_id = n0.doc_id
    GROUP BY surv.doc_id
    """,
)
def cut_repeated_spans_docs(spark, sf_dir):
    """Substring dedup APPLIED (operators/dedup.py::cut_repeated_spans)
    on the same planted-copy corpus as `repeated_spans`: every span
    family keeps exactly its globally-first occurrence; the oracle
    rebuilds the cleaned TEXTS — a keeper chosen differently, an
    off-by-one span boundary, or a lost survivor token all break the
    hash."""
    from lance_flink_spark.operators.dedup import cut_repeated_spans

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    aug = docs.unionByName(
        docs.filter("doc_id < 10").select(
            (F.col("doc_id") + 700000).alias("doc_id"), "text"
        )
    )
    return cut_repeated_spans(aug, window=20, min_copies=2)


_STOP_LIST = ", ".join(f"'{m}'" for m in LANG_MARKERS["en"])


@query(
    "text_gopher_rules",
    extra=True,  # gate budget; Gopher-style quality rule filter
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len({_TOKS}) END AS n_words,
             length(regexp_replace(trim(lower(text)), '\\s', '', 'g'))
               AS total_word_chars,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(list_distinct({_TOKS})) END AS n_distinct_words,
             len(list_filter({_TOKS}, x -> x IN ({_STOP_LIST}))) AS stop_hits
      FROM documents)
    SELECT doc_id, n_words, total_word_chars, n_distinct_words, stop_hits,
           (n_words >= 10 AND n_words <= 1000) AS rule_word_count,
           (total_word_chars >= 3 * n_words
            AND total_word_chars <= 10 * n_words) AS rule_word_length,
           (10 * n_distinct_words >= 3 * n_words) AS rule_diversity,
           (stop_hits >= 1) AS rule_stopwords,
           ((n_words >= 10 AND n_words <= 1000)
            AND (total_word_chars >= 3 * n_words
                 AND total_word_chars <= 10 * n_words)
            AND (10 * n_distinct_words >= 3 * n_words)
            AND (stop_hits >= 1)) AS passes_gopher
    FROM s
    """,
)
def text_gopher_rules(spark, sf_dir):
    """Gopher-style quality rule filter (functions/text.py
    gopher_rules): per-doc word count / mean word length / lexical
    diversity / stopword rules with an all-integer hashed surface
    (every rule is an integer comparison — rounding-proof by
    construction). Stateless map over one scan: zero shuffles, whole
    stage codegen, no Python."""
    from lance_flink_spark.functions.text import gopher_rules

    d = table(spark, sf_dir, "documents")
    cols = gopher_rules(F.col("text"))
    return d.select("doc_id", *[c.alias(n) for n, c in cols.items()])


_QUALITY_EXPR = f"""
    ROUND(LEAST(1.0, (CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len({_TOKS}) END)::DOUBLE / 50.0) * 0.4
          + (1.0 - (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE
                   / GREATEST(length(text)::DOUBLE, 1.0)) * 0.3
          + LEAST(1.0, ({_hits(LANG_MARKERS['en'])})::DOUBLE
                       / GREATEST((CASE WHEN length(trim(text)) = 0 THEN 0
                                        ELSE len({_TOKS}) END)::DOUBLE, 1.0) * 5.0) * 0.3,
          6)
"""


@query(
    "dedup_canonical",
    # r8 rotation: promoted to the driver registry for driver-grade hash evidence
    oracle=f"""
    WITH RECURSIVE capped AS (
        SELECT doc_id, i, sig FROM (
            SELECT doc_id, i, sig, COUNT(*) OVER (PARTITION BY i, sig) AS bsz
            FROM ({_SIGS}) s0) s
        WHERE bsz <= 200),
    pairs AS (
        SELECT id_a, id_b FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_matches
            FROM capped a JOIN capped b
              ON a.i = b.i AND a.sig = b.sig AND a.doc_id < b.doc_id
            GROUP BY 1, 2) m
        WHERE n_matches >= 8),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
    reach(a, b) AS (
        SELECT src, src FROM edges
        UNION
        SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
    clusters AS (SELECT a AS doc_id, MIN(b) AS keep_id FROM reach GROUP BY a),
    quality AS (SELECT doc_id, {_QUALITY_EXPR} AS q FROM documents),
    best AS (
        SELECT keep_id, doc_id AS canonical_id FROM (
            SELECT c.keep_id, c.doc_id,
                   ROW_NUMBER() OVER (PARTITION BY c.keep_id
                                      ORDER BY q.q DESC, c.doc_id ASC) AS rn
            FROM clusters c JOIN quality q USING (doc_id)) r
        WHERE rn = 1)
    SELECT d.doc_id,
           COALESCE(b.canonical_id, d.doc_id) AS canonical_id,
           (COALESCE(b.canonical_id, d.doc_id) = d.doc_id) AS is_canonical
    FROM documents d
    LEFT JOIN clusters c ON d.doc_id = c.doc_id
    LEFT JOIN best b ON c.keep_id = b.keep_id
    """,
)
def dedup_canonical(spark, sf_dir):
    """Canonical-document selection: the end of the near-dup pipeline.
    Clusters come from the SAME minhash pair graph as dedup_clusters;
    within each cluster the survivor is the HIGHEST-QUALITY document
    (quality_score, ties → lowest doc_id) rather than the arbitrary
    min-id — what a real corpus build keeps. Unclustered docs are
    their own canonical.

    Plan shape: pair graph + CC as before; quality is one stateless
    scan; argmax is a keep_id-partitioned window over the CLUSTERED
    docs only (cluster-membership-sized, not corpus-sized); the final
    assembly is two left joins on doc-count frames."""
    from pyspark.sql import Window as W

    from lance_flink_spark.operators.dedup import resolve_duplicate_clusters

    docs = table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, k=16, min_matches=8, max_bucket=200).select(
        "id_a", "id_b"
    )
    clusters = resolve_duplicate_clusters(pairs)
    q = docs.select("doc_id", quality_score(F.col("text")).alias("q"))
    ranked = (
        clusters.join(q, "doc_id")
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("keep_id").orderBy(F.desc("q"), F.asc("doc_id"))
            ),
        )
    )
    best = ranked.filter(F.col("rn") == 1).select(
        "keep_id", F.col("doc_id").alias("canonical_id")
    )
    # one row per duplicate cluster; when the cluster map came from the
    # gated driver union-find path (resolve_duplicate_clusters), best is
    # bounded by the same gate — hint it so the final assembly joins
    # stay broadcast (otherwise the corpus re-shuffles on keep_id).
    # On the distributed-CC path the flag is absent and AQE decides.
    if getattr(clusters, "_driver_bounded", False):
        best = F.broadcast(best)
    return (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .join(best, "keep_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("canonical_id"), F.col("doc_id")).alias("canonical_id"),
            (
                F.coalesce(F.col("canonical_id"), F.col("doc_id")) == F.col("doc_id")
            ).alias("is_canonical"),
        )
    )


@query(
    "text_bigram_logprob",
    extra=True,  # gate budget; smoothed bigram LM scoring
    oracle=f"""
    WITH docs AS (SELECT doc_id, {_TOKS} AS arr FROM documents),
    big AS (
        SELECT doc_id, u.bg,
               string_split(u.bg, ' ')[1] AS w1
        FROM docs t,
             unnest(list_transform(range(1, greatest(len(arr) - 1, 0) + 1),
                    i -> concat(arr[i], ' ', arr[i+1]))) AS u(bg)),
    bc AS (SELECT bg, COUNT(*) AS c2 FROM big GROUP BY bg),
    tok AS (
        SELECT u.token FROM docs t, unnest(arr) AS u(token)
        WHERE u.token <> ''),
    uc AS (SELECT token, COUNT(*) AS c1 FROM tok GROUP BY token),
    v AS (SELECT COUNT(*) AS vocab FROM uc)
    SELECT doc_id,
           ROUND(AVG(ln((c2 + 1.0) / (c1 + vocab))), 6) AS avg_logp,
           COUNT(*) AS n_bigrams
    FROM big JOIN bc USING (bg) JOIN uc ON big.w1 = uc.token, v
    GROUP BY doc_id
    """,
)
def text_bigram_logprob(spark, sf_dir):
    """Bigram language-model score with add-one smoothing —
    p(w2|w1) = (c(w1 w2)+1)/(c(w1)+|V|) — the next step up from the
    unigram stand-in toward KenLM-style perplexity filtering; per-doc
    mean log prob over the doc's bigrams.

    Scale shape mirrors the unigram entry: bigram and unigram count
    tables partial-aggregate to (bigram-)vocab size and broadcast back
    onto the exploded bigram stream; the only corpus-sized shuffle is
    the per-doc average. At open-web scale the bigram table gets a
    min-count floor (unseen bigrams already smooth to c2=0 semantics
    via +1) — TPC-H-sized corpora need none."""
    d = table(spark, sf_dir, "documents")
    arr = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    docs = d.select("doc_id", arr.alias("arr"))
    big = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(arr) - 1, 0)), "
                "i -> concat(element_at(arr, i), ' ', element_at(arr, i + 1)))"
            )
        ).alias("bg"),
    ).withColumn("w1", F.split_part(F.col("bg"), F.lit(" "), F.lit(1)))
    bc = big.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    tok = docs.select(F.explode("arr").alias("token")).filter(F.col("token") != "")
    uc = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c1"))
    vocab = uc.agg(F.count(F.lit(1)).alias("vocab"))
    return (
        big.join(F.broadcast(bc), "bg")
        .join(F.broadcast(uc.withColumnRenamed("token", "w1")), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.avg(F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("vocab")))), 6
            ).alias("avg_logp"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )


@query(
    "text_feature_hash",
    extra=True,  # gate budget; hashing-trick featurizer (sparse form)
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, u.token FROM (
            SELECT doc_id, {_TOKS} AS arr FROM documents) t,
            unnest(arr) AS u(token)
        WHERE u.token <> '')
    SELECT doc_id,
           {_MD5I.format(x='token')} % 64 AS bucket,
           COUNT(*) AS cnt
    FROM tok GROUP BY doc_id, bucket
    """,
)
def text_feature_hash(spark, sf_dir):
    """Hashing-trick featurization (the fixed-width vectorizer for
    linear/quality models over unbounded vocabularies): token →
    md5-derived bucket in [0, 64), per-doc bucket counts in sparse
    long form (doc_id, bucket, cnt) — the dense array is a trivial
    pivot at training time; the sparse form is what shuffles well.

    One explode + one partial-agg shuffle on (doc_id, bucket); the
    hash is the same md5i every other engine-reproducible operator
    uses, so the oracle embeds identical arithmetic."""
    from lance_flink_spark.functions.text import md5i

    d = table(spark, sf_dir, "documents")
    tok = (
        d.select(
            "doc_id",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    return (
        tok.withColumn("bucket", md5i(F.col("token")) % 64)
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "text_trigram_logprob",
    # r12 rotation: the #235 backoff-LM flagship gets driver-grade evidence
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, {_TOKS} AS arr FROM documents
        WHERE len({_TOKS}) >= 3),
    tr_tri AS (
        SELECT u.tg FROM docs t,
            unnest(list_transform(range(1, len(arr) - 2 + 1),
                i -> concat(arr[i], ' ', arr[i+1], ' ', arr[i+2]))) AS u(tg)
        WHERE t.doc_id % 2 = 0),
    tr_bi AS (
        SELECT u.bg FROM docs t,
            unnest(list_transform(range(1, len(arr) - 1 + 1),
                i -> concat(arr[i], ' ', arr[i+1]))) AS u(bg)
        WHERE t.doc_id % 2 = 0),
    tr_tok AS (
        SELECT u.token FROM docs t, unnest(arr) AS u(token)
        WHERE t.doc_id % 2 = 0 AND u.token <> ''),
    tc AS (SELECT tg, COUNT(*) AS ct FROM tr_tri GROUP BY tg),
    bc AS (SELECT bg, COUNT(*) AS cb FROM tr_bi GROUP BY bg),
    uc AS (SELECT token, COUNT(*) AS cu FROM tr_tok GROUP BY token),
    n AS (SELECT COUNT(*) AS n_tok FROM tr_tok),
    pos AS (
        SELECT doc_id, u.tg,
               string_split(u.tg, ' ')[1] || ' ' || string_split(u.tg, ' ')[2] AS b12,
               string_split(u.tg, ' ')[2] || ' ' || string_split(u.tg, ' ')[3] AS b23,
               string_split(u.tg, ' ')[2] AS w2,
               string_split(u.tg, ' ')[3] AS w3
        FROM docs t,
            unnest(list_transform(range(1, len(arr) - 2 + 1),
                i -> concat(arr[i], ' ', arr[i+1], ' ', arr[i+2]))) AS u(tg)
        WHERE t.doc_id % 2 = 1),
    p AS (
        SELECT pos.doc_id,
               CASE
                 WHEN tc.ct IS NOT NULL
                   THEN tc.ct * 1.0 / b1.cb
                 WHEN b2.cb IS NOT NULL
                   THEN 0.4 * b2.cb / u2.cu
                 ELSE 0.16 * (COALESCE(u3.cu, 0) + 1.0) / (n.n_tok + 1.0)
               END AS prob
        FROM pos
        LEFT JOIN tc USING (tg)
        LEFT JOIN bc b1 ON pos.b12 = b1.bg
        LEFT JOIN bc b2 ON pos.b23 = b2.bg
        LEFT JOIN uc u2 ON pos.w2 = u2.token
        LEFT JOIN uc u3 ON pos.w3 = u3.token
        CROSS JOIN n)
    SELECT doc_id, ROUND(AVG(ln(prob)), 6) AS avg_logp,
           COUNT(*) AS n_trigrams
    FROM p GROUP BY doc_id
    """,
)
def text_trigram_logprob(spark, sf_dir):
    """Stupid-backoff trigram LM scoring (Brants et al. 2007 — the
    web-scale KenLM stand-in past the bigram entry #182): trigram /
    bigram / unigram count tables train on the EVEN-doc_id half of the
    corpus, the odd half scores per position as

        S(w3|w1 w2) = c(w1w2w3)/c(w1w2)            seen trigram
                    | 0.4 · c(w2w3)/c(w2)          backoff to bigram
                    | 0.4² · (c(w3)+1)/(N+1)       unigram floor (OOV-safe)

    and each doc reports its mean log-score. Held-out scoring is what
    EXERCISES the backoff (scoring the training corpus never leaves
    the first branch). Count tables partial-aggregate to vocab size
    and broadcast onto the exploded position stream — the only
    corpus-sized shuffle is the per-doc average; at open-web scale the
    trigram table takes a min-count floor and the broadcasts become
    plain joins. All-relational, so the oracle replays train AND score
    exactly; ROUND(.,6) absorbs summation order in the mean."""
    d = table(spark, sf_dir, "documents")
    arr = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    docs = d.select("doc_id", arr.alias("arr")).filter(F.size("arr") >= 3)
    train = docs.filter("doc_id % 2 = 0")
    tri = "transform(sequence(1, size(arr) - 2), i -> concat(element_at(arr, i), ' ', element_at(arr, i + 1), ' ', element_at(arr, i + 2)))"
    bi = "transform(sequence(1, size(arr) - 1), i -> concat(element_at(arr, i), ' ', element_at(arr, i + 1)))"
    tc = (
        train.select(F.explode(F.expr(tri)).alias("tg"))
        .groupBy("tg").agg(F.count(F.lit(1)).alias("ct"))
    )
    # bc and uc each feed TWO broadcast builds below, and every
    # broadcast subtree re-scans and re-tokenizes the train half —
    # persist the vocab-bounded count tables so train is read once per
    # table, not once per join (6 → 3 train passes, guide §2.3/§5;
    # bench-level unpersist_all releases the blocks)
    bc = (
        train.select(F.explode(F.expr(bi)).alias("bg"))
        .groupBy("bg").agg(F.count(F.lit(1)).alias("cb"))
        .persist()
    )
    tok = train.select(F.explode("arr").alias("token")).filter(F.col("token") != "")
    uc = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cu")).persist()
    # N = Σ unigram counts — derived from the persisted table instead
    # of a fourth tokenize pass over train
    n = uc.agg(F.coalesce(F.sum("cu"), F.lit(0)).alias("n_tok"))
    pos = docs.filter("doc_id % 2 = 1").select(
        "doc_id", F.explode(F.expr(tri)).alias("tg")
    ).withColumns(
        {
            "b12": F.concat_ws(
                " ",
                F.split_part(F.col("tg"), F.lit(" "), F.lit(1)),
                F.split_part(F.col("tg"), F.lit(" "), F.lit(2)),
            ),
            "b23": F.concat_ws(
                " ",
                F.split_part(F.col("tg"), F.lit(" "), F.lit(2)),
                F.split_part(F.col("tg"), F.lit(" "), F.lit(3)),
            ),
            "w2": F.split_part(F.col("tg"), F.lit(" "), F.lit(2)),
            "w3": F.split_part(F.col("tg"), F.lit(" "), F.lit(3)),
        }
    )
    scored = (
        pos.join(F.broadcast(tc), "tg", "left")
        .join(F.broadcast(bc.withColumnsRenamed({"bg": "b12", "cb": "cb1"})), "b12", "left")
        .join(F.broadcast(bc.withColumnsRenamed({"bg": "b23", "cb": "cb2"})), "b23", "left")
        .join(F.broadcast(uc.withColumnsRenamed({"token": "w2", "cu": "cu2"})), "w2", "left")
        .join(F.broadcast(uc.withColumnsRenamed({"token": "w3", "cu": "cu3"})), "w3", "left")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "prob",
            F.when(F.col("ct").isNotNull(), F.col("ct") * 1.0 / F.col("cb1"))
            .when(F.col("cb2").isNotNull(), 0.4 * F.col("cb2") / F.col("cu2"))
            .otherwise(
                0.16 * (F.coalesce(F.col("cu3"), F.lit(0)) + 1.0)
                / (F.col("n_tok") + 1.0)
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.avg(F.log("prob")), 6).alias("avg_logp"),
        F.count(F.lit(1)).alias("n_trigrams"),
    )


@query(
    "lm_perplexity_buckets",
    # r13 rotation: CCNet perplexity tiers get driver-grade evidence
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, lang, {_TOKS} AS arr FROM documents
        WHERE len({_TOKS}) >= 2),
    tr_bi AS (
        SELECT lang, u.bg FROM docs t,
            unnest(list_transform(range(1, len(arr) - 1 + 1),
                i -> concat(arr[i], ' ', arr[i+1]))) AS u(bg)
        WHERE t.doc_id % 2 = 0),
    tr_tok AS (
        SELECT lang, u.token FROM docs t, unnest(arr) AS u(token)
        WHERE t.doc_id % 2 = 0 AND u.token <> ''),
    bc AS (SELECT lang, bg, COUNT(*) AS cb FROM tr_bi GROUP BY lang, bg),
    uc AS (SELECT lang, token, COUNT(*) AS cu FROM tr_tok GROUP BY lang, token),
    nl AS (SELECT lang, COUNT(*) AS n_tok FROM tr_tok GROUP BY lang),
    pos AS (
        SELECT doc_id, lang, u.bg,
               string_split(u.bg, ' ')[1] AS w1,
               string_split(u.bg, ' ')[2] AS w2
        FROM docs t,
            unnest(list_transform(range(1, len(arr) - 1 + 1),
                i -> concat(arr[i], ' ', arr[i+1]))) AS u(bg)
        WHERE t.doc_id % 2 = 1),
    p AS (
        SELECT pos.doc_id, pos.lang,
               CASE
                 WHEN bc.cb IS NOT NULL THEN bc.cb * 1.0 / u1.cu
                 ELSE 0.4 * (COALESCE(u2.cu, 0) + 1.0) / (nl.n_tok + 1.0)
               END AS prob
        FROM pos
        LEFT JOIN bc ON pos.lang = bc.lang AND pos.bg = bc.bg
        LEFT JOIN uc u1 ON pos.lang = u1.lang AND pos.w1 = u1.token
        LEFT JOIN uc u2 ON pos.lang = u2.lang AND pos.w2 = u2.token
        JOIN nl ON pos.lang = nl.lang),
    scored AS (
        SELECT doc_id, lang, ROUND(AVG(ln(prob)), 6) AS lp,
               COUNT(*) AS n_tok
        FROM p GROUP BY doc_id, lang),
    tiled AS (
        SELECT lang, lp, n_tok,
               NTILE(3) OVER (PARTITION BY lang ORDER BY lp DESC, doc_id)
                 AS bucket
        FROM scored)
    SELECT lang, bucket, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS sum_bigrams,
           CAST(SUM(CAST(ROUND(lp * 1000000) AS BIGINT)) AS BIGINT)
             AS sum_logp_micro
    FROM tiled GROUP BY lang, bucket
    """,
)
def lm_perplexity_buckets(spark, sf_dir):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 — the
    head/middle/tail quality tiers CCNet cuts each language's corpus
    into before sampling): a per-LANGUAGE bigram LM with stupid-backoff
    to an add-one unigram floor trains on the even-doc half, scores the
    held-out half by mean log-prob, and NTILE(3) over (score DESC,
    doc_id) assigns deterministic tiers; the report is per-(lang, tier)
    doc counts, bigram mass, and mean log-prob — the table a mixture
    sampler weights against. Per-language count tables partial-agg to
    vocab size; the only corpus-sized shuffles are the position stream
    and the tier window (per-language, never global). Fully relational
    → the oracle replays train, score, tiering, and rollup exactly."""
    d = table(spark, sf_dir, "documents")
    arr = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    docs = d.select("doc_id", "lang", arr.alias("arr")).filter(
        F.size("arr") >= 2
    )
    train = docs.filter("doc_id % 2 = 0")
    bi = (
        "transform(sequence(1, size(arr) - 1), "
        "i -> concat(element_at(arr, i), ' ', element_at(arr, i + 1)))"
    )
    bc = (
        train.select("lang", F.explode(F.expr(bi)).alias("bg"))
        .groupBy("lang", "bg")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    tok = train.select("lang", F.explode("arr").alias("token")).filter(
        F.col("token") != ""
    )
    # uc feeds TWO broadcast builds and nl is its per-lang rollup —
    # persist the vocab-bounded table and derive nl from it so train is
    # tokenized twice (bc + uc), not four times (guide §2.3/§5; the
    # bench's unpersist_all releases the blocks)
    uc = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("cu")).persist()
    nl = uc.groupBy("lang").agg(F.sum("cu").alias("n_tok"))
    pos = (
        docs.filter("doc_id % 2 = 1")
        .select("doc_id", "lang", F.explode(F.expr(bi)).alias("bg"))
        .withColumns(
            {
                "w1": F.split_part(F.col("bg"), F.lit(" "), F.lit(1)),
                "w2": F.split_part(F.col("bg"), F.lit(" "), F.lit(2)),
            }
        )
    )
    p = (
        pos.join(F.broadcast(bc), ["lang", "bg"], "left")
        .join(
            F.broadcast(uc.withColumnsRenamed({"token": "w1", "cu": "cu1"})),
            ["lang", "w1"],
            "left",
        )
        .join(
            F.broadcast(uc.withColumnsRenamed({"token": "w2", "cu": "cu2"})),
            ["lang", "w2"],
            "left",
        )
        .join(F.broadcast(nl), "lang")
        .withColumn(
            "prob",
            F.when(F.col("cb").isNotNull(), F.col("cb") * 1.0 / F.col("cu1"))
            .otherwise(
                0.4 * (F.coalesce(F.col("cu2"), F.lit(0)) + 1.0)
                / (F.col("n_tok") + 1.0)
            ),
        )
    )
    scored = p.groupBy("doc_id", "lang").agg(
        F.round(F.avg(F.log("prob")), 6).alias("lp"),
        F.count(F.lit(1)).alias("n_tok"),
    )
    from pyspark.sql import Window as W

    tiled = scored.withColumn(
        "bucket",
        F.ntile(3).over(
            W.partitionBy("lang").orderBy(F.col("lp").desc(), F.col("doc_id"))
        ),
    )
    # per-tier mass as INTEGER micro-logprob units: lp is already
    # 6dp-quantized, so scaling to BIGINT before the sum removes the
    # second rounding boundary (a tier mean once landed on a .5 ulp —
    # Spark HALF_UP vs DuckDB HALF_EVEN flipped the 6th decimal)
    return tiled.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("sum_bigrams"),
        F.sum(F.round(F.col("lp") * 1e6).cast("long")).cast("long").alias(
            "sum_logp_micro"
        ),
    )


@query(
    "fim_transform",
    oracle="""
    WITH c AS (
        SELECT doc_id, text, LENGTH(text) AS L,
               ('0x' || substr(md5('fim:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h1,
               ('0x' || substr(md5('fim2:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h2
        FROM documents
    ), cuts AS (
        SELECT doc_id, text, L,
               CASE WHEN L < 2 THEN 0 ELSE h1 % L END AS a,
               CASE WHEN L < 2 THEN 0
                    ELSE (h1 % L) + (h2 % (L - (h1 % L) + 1)) END AS b
        FROM c
    )
    SELECT doc_id,
           a AS n_prefix,
           b - a AS n_middle,
           L - b AS n_suffix,
           md5('<PRE>' || substr(text, 1, CAST(a AS INT))
               || '<SUF>' || substr(text, CAST(b AS INT) + 1)
               || '<MID>' || substr(text, CAST(a AS INT) + 1,
                                    CAST(b - a AS INT))) AS fp_psm
    FROM cuts
    """,
)
def fim_transform(spark, sf_dir):
    """FILL-IN-MIDDLE pretraining transform (the PSM rearrangement
    code-model pipelines apply to a fraction of documents — Bavarian
    et al. 2022): two md5-seeded character cuts a ≤ b split each doc
    into prefix/middle/suffix, and the document re-serializes as
    <PRE>prefix<SUF>suffix<MID>middle. Deterministic from doc_id —
    no RNG state — so DuckDB reproduces the exact cuts and the PSM
    fingerprint; a 1-character drift in either engine's substring or
    hash math breaks the hash. Pure Catalyst (md5/conv/substr), zero
    Python; at 100 TB this is a map-only pass. The transform itself
    lives in functions.text.fim_rearrange (shared with the SQL
    ``fim_transform('t', 'id', 'text')`` table function)."""
    from lance_flink_spark.functions.text import fim_rearrange

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    out = fim_rearrange(d, "doc_id", "text")
    return out.select(
        "doc_id", "n_prefix", "n_middle", "n_suffix",
        F.md5(F.col("fim_text")).alias("fp_psm"),
    )


@query(
    "sql_fim_transform",
    extra=True,  # r15: SQL surface for the FIM transform
    oracle="""
    WITH c AS (
        SELECT doc_id, text, LENGTH(text) AS L,
               ('0x' || substr(md5('fim:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h1,
               ('0x' || substr(md5('fim2:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h2
        FROM documents
    ), cuts AS (
        SELECT doc_id, text, L,
               CASE WHEN L < 2 THEN 0 ELSE h1 % L END AS a,
               CASE WHEN L < 2 THEN 0
                    ELSE (h1 % L) + (h2 % (L - (h1 % L) + 1)) END AS b
        FROM c
    )
    SELECT doc_id,
           a AS n_prefix,
           b - a AS n_middle,
           L - b AS n_suffix,
           md5('<PRE>' || substr(text, 1, CAST(a AS INT))
               || '<SUF>' || substr(text, CAST(b AS INT) + 1)
               || '<MID>' || substr(text, CAST(a AS INT) + 1,
                                    CAST(b - a AS INT))) AS fp_psm
    FROM cuts
    """,
)
def sql_fim_transform(spark, sf_dir):
    """The FIM/PSM transform reached FROM SQL (r15): documents land in
    a view, the ``fim_transform('v', 'doc_id', 'text')`` table
    function emits the rearranged text, and the fingerprint is plain
    SQL md5 over its output — byte-identical to the `fim_transform`
    registry query's Catalyst path and to the DuckDB oracle's
    substring math."""
    from lance_flink_spark.registry import scratch_dir
    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine

    table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).createOrReplaceTempView("fim_docs")
    eng = SqlEngine(
        spark, Catalog(scratch_dir("fim_tvf" + sf_dir.replace("/", "_")))
    )
    out = eng.execute(
        "SELECT * FROM fim_transform('fim_docs', 'doc_id', 'text')"
    )
    out.createOrReplaceTempView("fim_out")
    return spark.sql(
        "SELECT doc_id, n_prefix, n_middle, n_suffix, "
        "md5(fim_text) AS fp_psm FROM fim_out"
    )


@query(
    "mixture_plan_temperature",
    extra=True,  # r15: training-mix planning, integer-exact plan
    oracle="""
    WITH s AS (
      SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS tokens
      FROM documents GROUP BY lang
    ), tot AS (SELECT CAST(SUM(tokens) AS DOUBLE) AS b FROM s),
    z AS (SELECT SUM(POWER(CAST(tokens AS DOUBLE), 0.5)) AS z FROM s)
    SELECT lang, tokens,
           CAST(FLOOR(tot.b * (POWER(CAST(tokens AS DOUBLE), 0.5) / z.z)
                      / CAST(tokens AS DOUBLE) * 1000 + 0.5) AS BIGINT)
             AS r_pm
    FROM s, tot, z ORDER BY lang
    """,
)
def mixture_plan_temperature(spark, sf_dir):
    """TEMPERATURE data-mixing plan (§2 r15 — the α-sampling step of
    multilingual/multi-domain pretraining, Conneau & Lample 2019):
    per-language token mass → q_d ∝ tokens^0.5 → per-mille repeat
    factor at a budget equal to the corpus size (so small languages
    upsample past 1.0 and the majority downsamples — both branches of
    the plan exercised). All-integer output; the one float boundary
    is quantized per-mille, Spark and DuckDB agreeing through
    identical association order."""
    from lance_flink_spark.operators.sampling import (
        temperature_mixture_plan,
    )

    d = table(spark, sf_dir, "documents").select("lang", "n_chars")
    budget = d.agg(F.sum("n_chars").cast("long")).collect()[0][0]
    return temperature_mixture_plan(
        d, budget=int(budget), alpha=0.5, domain_col="lang",
        weight_col="n_chars",
    )


@query(
    "mixture_materialize_temperature",
    extra=True,  # r15: the mixing plan APPLIED — exact multiset
    oracle="""
    WITH s AS (
      SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS tokens
      FROM documents GROUP BY lang
    ), tot AS (SELECT CAST(SUM(tokens) AS DOUBLE) AS b FROM s),
    z AS (SELECT SUM(POWER(CAST(tokens AS DOUBLE), 0.5)) AS z FROM s),
    p AS (
      SELECT lang, tokens,
             CAST(FLOOR(tot.b * (POWER(CAST(tokens AS DOUBLE), 0.5) / z.z)
                        / CAST(tokens AS DOUBLE) * 1000 + 0.5) AS BIGINT)
               AS r_pm
      FROM s, tot, z
    ), d AS (
      SELECT doc_id, dd.lang, r_pm FROM documents dd JOIN p USING (lang)
    ), e AS (
      SELECT doc_id, lang, r_pm,
             UNNEST(range(r_pm // 1000 + 1)) AS copy
      FROM d
    )
    SELECT doc_id, lang, CAST(copy AS BIGINT) AS copy FROM e
    WHERE copy < r_pm // 1000
       OR (CAST(CONCAT('0x', substr(md5(CONCAT('mix:', doc_id)), 1, 12))
                AS BIGINT) / POWER(16, 12)) * 1000
          < CAST(r_pm % 1000 AS DOUBLE)
    """,
)
def mixture_materialize_temperature(spark, sf_dir):
    """The temperature mixing plan MATERIALIZED (§2 r15): every doc
    gains floor(r_pm/1000) full epochs plus a fractional epoch
    admitted by its md5-uniform — the exact output multiset
    (doc_id, lang, copy) must match DuckDB row-for-row, so a drifted
    repeat factor, a mis-gated fractional copy, or a hash mismatch
    breaks the hash. Map-only after one broadcast plan join: no
    shuffle touches the corpus; output size == the token budget."""
    from lance_flink_spark.operators.sampling import (
        apply_temperature_mixture,
        temperature_mixture_plan,
    )

    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    budget = d.agg(F.sum("n_chars").cast("long")).collect()[0][0]
    plan = temperature_mixture_plan(
        d, budget=int(budget), alpha=0.5, domain_col="lang",
        weight_col="n_chars",
    )
    return apply_temperature_mixture(
        d, plan, domain_col="lang", key_col="doc_id"
    ).select("doc_id", "lang", "copy")


@query(
    "streaming_near_dedup",
    extra=True,  # r15: near-dedup at ingest (streaming x MinHash)
    oracle=f"""
    WITH sigs AS ({_SIGS}),
    bt AS (SELECT doc_id, doc_id % 4 AS batch FROM documents),
    s AS (SELECT g.doc_id, bt.batch, g.i, g.sig
          FROM sigs g JOIN bt ON g.doc_id = bt.doc_id),
    pairs AS (
        SELECT a.doc_id AS d, e.doc_id AS o, COUNT(*) AS nm
        FROM s a JOIN s e
          ON a.i = e.i AND a.sig = e.sig
         AND (e.batch < a.batch
              OR (e.batch = a.batch AND e.doc_id < a.doc_id))
        GROUP BY 1, 2)
    SELECT bt.doc_id, bt.batch FROM bt
    WHERE bt.doc_id NOT IN (SELECT d FROM pairs WHERE nm >= 8)
    """,
)
def streaming_near_dedup(spark, sf_dir):
    """NEAR-dedup AT INGEST (§2 r15 — streaming × MinHash): documents
    replay as four mtime-ordered micro-batches through
    streaming/dedup.py::NearDedupIngest — each batch's 16-component
    signatures check a persistent store of every previously-seen doc,
    near-dups (≥ 8 shared components, est. jaccard ≥ 0.5) drop, and
    the whole batch's signatures append to the store so chains
    collapse to the first-seen member. The oracle replays the exact
    admission rule relationally (earlier-batch OR smaller-in-batch-id
    match drops a doc) — a signature drift, a store row lost between
    batches, or an in-batch tie broken the wrong way breaks the
    hash."""
    import os
    import shutil

    from lance_flink_spark.registry import fixture_once, scratch_dir
    from lance_flink_spark.streaming.dedup import NearDedupIngest

    tag = sf_dir.rstrip("/").replace("/", "_")
    base = scratch_dir("neardd" + tag)
    src = os.path.join(base, "src")
    # deterministic spool: built once per (process, sf) — a fresh
    # invocation always rebuilds from the parquet (fixture_once)
    if fixture_once(base):
        shutil.rmtree(src, ignore_errors=True)
        d = table(spark, sf_dir, "documents").select(
            "doc_id", "text", (F.col("doc_id") % 4).alias("b")
        )
        d.repartition("b").write.partitionBy("b").parquet(src)
        for i in range(4):
            pdir = os.path.join(src, f"b={i}")
            t = 1_700_000_000 + i * 100
            for r, _dd, files in os.walk(pdir):
                for f in files:
                    os.utime(os.path.join(r, f), (t, t))
            os.utime(pdir, (t, t))
    root = os.path.join(base, "run")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    schema = spark.read.parquet(os.path.join(src, "b=0")).schema
    sink = NearDedupIngest(root)
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b=*")
    )
    q = (
        sink.attach(sdf, os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink.admitted(spark).select(
        "doc_id", (F.col("doc_id") % 4).alias("batch")
    )
