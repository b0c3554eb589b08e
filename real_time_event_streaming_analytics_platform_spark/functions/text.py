"""Text-analysis operators for training-data pipelines over `documents`.

All tokenization happens JVM-side (split/filter/transform/regexp_*) so the
hot path stays inside whole-stage codegen — no Python UDFs. Each operator
is a single plan: scan → per-row expressions → (optionally) one aggregate
shuffle. At 100 TB these scale linearly with input; the only shuffle is
the token-count aggregation (partial map-side combine applies).

Queries: Q25 per-lang stats + top-20 tokens (SURVEY.md §2c), language-ID
heuristic, quality scoring, token counting (whitespace + BPE-ish), and a
rolling-hash fingerprint (xxhash64-based, no DuckDB twin → rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..plans.registry import query
from ..operators.helpers import (
    davg,
    quant6,
    round2,
    sql_davg,
    sql_quant6,
    sql_round2,
)

# tokens = non-empty runs of [a-z0-9] in the lowercased text
_TOK_SPARK = "filter(split(lower(text), '[^a-z0-9]+'), w -> w != '')"
_TOK_DUCK = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> w != '')"

_STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "fr": ("le", "la", "les", "et", "un", "une", "des"),
    "de": ("der", "die", "das", "und", "ein", "ist", "zu"),
    "es": ("el", "la", "los", "las", "y", "un", "una"),
}


def _in_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


# ---------------------------------------------------------------------------
# Q25 — per-language document stats.
# ---------------------------------------------------------------------------


@query(
    "q25_text_stats",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_docs, {sql_davg('n_chars')} AS avg_chars
    FROM documents GROUP BY 1 ORDER BY 1
    """,
)
def q25_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(F.count("*").alias("n_docs"), davg("n_chars").alias("avg_chars"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Q25b — global top-20 tokens: explode → count → TakeOrderedAndProject
# (top-k heaps, no global sort).
# ---------------------------------------------------------------------------


@query(
    "q25b_top_tokens",
    oracle=f"""
    SELECT token, COUNT(*) AS n FROM (
        SELECT unnest({_TOK_DUCK}) AS token FROM documents
    ) GROUP BY 1 ORDER BY n DESC, token LIMIT 20
    """,
)
def q25b_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.expr(_TOK_SPARK)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# T1 — language-ID heuristic: per-language stopword hit counts, winner by
# deterministic priority. Integer comparisons only → exact across engines.
# ---------------------------------------------------------------------------


def _lang_counts_spark():
    return [
        F.expr(f"size(filter({_TOK_SPARK}, w -> w IN ({_in_list(ws)})))").alias(
            f"c_{lang}"
        )
        for lang, ws in _STOPWORDS.items()
    ]


@query(
    "t1_lang_id",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN c_en > 0 AND c_en >= c_fr AND c_en >= c_de AND c_en >= c_es THEN 'en'
                WHEN c_fr > 0 AND c_fr >= c_de AND c_fr >= c_es THEN 'fr'
                WHEN c_de > 0 AND c_de >= c_es THEN 'de'
                WHEN c_es > 0 THEN 'es'
                ELSE 'und' END AS lang_pred
    FROM (
        SELECT doc_id, lang,
               len(list_filter({_TOK_DUCK}, w -> w IN ({_in_list(_STOPWORDS['en'])}))) AS c_en,
               len(list_filter({_TOK_DUCK}, w -> w IN ({_in_list(_STOPWORDS['fr'])}))) AS c_fr,
               len(list_filter({_TOK_DUCK}, w -> w IN ({_in_list(_STOPWORDS['de'])}))) AS c_de,
               len(list_filter({_TOK_DUCK}, w -> w IN ({_in_list(_STOPWORDS['es'])}))) AS c_es
        FROM documents
    ) ORDER BY doc_id
    """,
)
def t1_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    scored = docs.select("doc_id", "lang", *_lang_counts_spark())
    pred = (
        F.when(
            (F.col("c_en") > 0)
            & (F.col("c_en") >= F.col("c_fr"))
            & (F.col("c_en") >= F.col("c_de"))
            & (F.col("c_en") >= F.col("c_es")),
            "en",
        )
        .when(
            (F.col("c_fr") > 0)
            & (F.col("c_fr") >= F.col("c_de"))
            & (F.col("c_fr") >= F.col("c_es")),
            "fr",
        )
        .when((F.col("c_de") > 0) & (F.col("c_de") >= F.col("c_es")), "de")
        .when(F.col("c_es") > 0, "es")
        .otherwise("und")
    )
    return scored.select("doc_id", "lang", pred.alias("lang_pred")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# T2 — quality scoring: token count, alpha-char density, stopword ratio,
# mean token length. Ratios round2-quantized on both engines.
# ---------------------------------------------------------------------------

_ALL_STOP = _in_list(w for ws in _STOPWORDS.values() for w in ws)


@query(
    "t2_quality_score",
    oracle=f"""
    SELECT doc_id, n_tokens,
           {sql_round2('alpha_chars / GREATEST(n_chars, 1)')} AS alpha_ratio,
           {sql_round2('stop_hits / GREATEST(n_tokens, 1)')} AS stop_ratio,
           {sql_round2('alpha_chars / GREATEST(n_tokens, 1)')} AS mean_tok_len
    FROM (
        SELECT doc_id, n_chars,
               len({_TOK_DUCK}) AS n_tokens,
               length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS alpha_chars,
               len(list_filter({_TOK_DUCK}, w -> w IN ({_ALL_STOP}))) AS stop_hits
        FROM documents
    ) ORDER BY doc_id
    """,
)
def t2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "n_chars",
        F.expr(f"size({_TOK_SPARK})").alias("n_tokens"),
        F.length(F.regexp_replace(F.lower("text"), "[^a-z0-9]", "")).alias(
            "alpha_chars"
        ),
        F.expr(f"size(filter({_TOK_SPARK}, w -> w IN ({_ALL_STOP})))").alias(
            "stop_hits"
        ),
    )
    return base.select(
        "doc_id",
        "n_tokens",
        round2(F.col("alpha_chars") / F.greatest("n_chars", F.lit(1))).alias(
            "alpha_ratio"
        ),
        round2(F.col("stop_hits") / F.greatest("n_tokens", F.lit(1))).alias(
            "stop_ratio"
        ),
        round2(F.col("alpha_chars") / F.greatest("n_tokens", F.lit(1))).alias(
            "mean_tok_len"
        ),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# T3 — token counting: whitespace tokens and a BPE-ish regex segmentation
# (letter runs | digit runs | single punctuation marks).
# ---------------------------------------------------------------------------

_BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"
# Spark SQL string literals consume one level of backslash escaping
# (unknown escapes drop the backslash: '\s' → 's'), DuckDB's do not —
# so the Spark-side literal needs its backslashes doubled.
_BPE_RE_SPARK = _BPE_RE.replace("\\", "\\\\")


@query(
    "t3_token_counts",
    oracle=f"""
    SELECT doc_id,
           len(list_filter(string_split_regex(text, '[ \t\n\r\f]+'), w -> w != '')) AS ws_tokens,
           len(regexp_extract_all(lower(text), '{_BPE_RE}')) AS bpe_tokens
    FROM documents ORDER BY doc_id
    """,
)
def t3_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        # explicit class, not \s: Java \s includes vertical tab U+000B,
        # RE2 (DuckDB) \s does not — an explicit class is engine-neutral.
        # Double-escaped so the REGEX engine (not the SQL literal parser)
        # interprets the escapes: Spark's literal parser maps unknown \f
        # to plain 'f', which would make the letter f a token separator.
        F.expr(
            "size(filter(split(text, '[ \\\\t\\\\n\\\\r\\\\f]+'), w -> w != ''))"
        ).alias("ws_tokens"),
        F.expr(f"size(regexp_extract_all(lower(text), '{_BPE_RE_SPARK}', 0))").alias(
            "bpe_tokens"
        ),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# T4 — document fingerprint: min/max/xor-fold of xxhash64 over word
# 4-grams (a winnowing-style rolling hash). xxhash64 has no DuckDB twin →
# registered rows-only; determinism asserted in tests/test_functions.py.
# ---------------------------------------------------------------------------


@query("t4_fingerprint")
def t4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # Bind tokens, then the gram-hash array, as columns: higher-order
    # lambdas are interpreted with no common-subexpression elimination,
    # so inlining the tokenizer in the lambda would re-split the text
    # once PER GRAM (O(words²)/row), and repeating the gram expression
    # under min/max/xor would build it three times.
    grams = F.expr(
        """
        transform(
            sequence(1, greatest(size(_toks) - 3, 1)),
            i -> xxhash64(concat_ws(' ', slice(_toks, i, 4))))
        """
    )
    return (
        docs.withColumn("_toks", F.expr(_TOK_SPARK))
        .withColumn("_grams", grams)
        .select(
            "doc_id",
            F.array_min("_grams").alias("fp_min"),
            F.array_max("_grams").alias("fp_max"),
            F.expr("aggregate(_grams, 0L, (acc, h) -> acc ^ h)").alias("fp_xor"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# T6 — repetition quality (Gopher/C4-style): duplicate-token fraction and
# most-frequent-token fraction per document. High values flag boilerplate
# and degenerate generations a pretraining corpus filters out. One per-row
# projection — no shuffle at all; ratios round2-quantized cross-engine.
# ---------------------------------------------------------------------------


@query(
    "t6_repetition",
    oracle=f"""
    SELECT doc_id, n_tokens,
           {sql_round2('(n_tokens - n_distinct) * 1.0 / GREATEST(n_tokens, 1)')} AS dup_frac,
           {sql_round2('top_count * 1.0 / GREATEST(n_tokens, 1)')} AS top_tok_frac,
           CAST(flagged AS BOOLEAN) AS flagged
    FROM (
        SELECT doc_id, n_tokens, n_distinct, top_count,
               ((n_tokens - n_distinct) * 1.0 / GREATEST(n_tokens, 1)) > 0.9 AS flagged
        FROM (
            SELECT doc_id,
                   len(toks) AS n_tokens,
                   len(list_distinct(toks)) AS n_distinct,
                   COALESCE(list_max(list_transform(list_distinct(toks),
                       t -> len(list_filter(toks, x -> x = t)))), 0) AS top_count
            FROM (SELECT doc_id, {_TOK_DUCK} AS toks FROM documents)
        )
    ) ORDER BY doc_id
    """,
)
def t6_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # Top-token count via sort + run-length max: O(n log n) per row
    # instead of the O(distinct × n) rescans of a
    # transform(array_distinct, t -> size(filter(...))) form — a 1 M-token
    # document costs ~20 M comparisons, not ~10^12. Still strictly
    # per-row (no shuffle), still whole-stage-codegen'd.
    base = (
        docs.withColumn("_toks", F.expr(_TOK_SPARK))
        .select(
            "doc_id",
            F.expr("size(_toks)").alias("n_tokens"),
            F.expr("size(array_distinct(_toks))").alias("n_distinct"),
            F.expr(
                """aggregate(
                       array_sort(_toks),
                       named_struct('prev', cast(null as string),
                                    'run', 0, 'best', 0),
                       (acc, t) -> named_struct(
                           'prev', t,
                           'run', if(t <=> acc.prev, acc.run + 1, 1),
                           'best', greatest(acc.best,
                                            if(t <=> acc.prev, acc.run + 1, 1))),
                       acc -> acc.best)"""
            ).alias("top_count"),
        )
    )
    dup_frac = (F.col("n_tokens") - F.col("n_distinct")) * 1.0 / F.greatest(
        "n_tokens", F.lit(1)
    )
    return base.select(
        "doc_id",
        "n_tokens",
        round2(dup_frac).alias("dup_frac"),
        round2(
            F.col("top_count") * 1.0 / F.greatest("n_tokens", F.lit(1))
        ).alias("top_tok_frac"),
        (dup_frac > 0.9).alias("flagged"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# T5 — PII scrubbing: detect + redact email/phone patterns, the filter a
# training corpus runs before anything ships to a tokenizer. Counting and
# replacement are both JVM-side regex ops; the redacted text itself never
# needs to leave the executor — the output carries counts and a digest of
# the redacted content, so the verification never shuffles documents.
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[a-z0-9._%+\-]+@[a-z0-9.\-]+\.[a-z]{2,}"
_PHONE_RE = r"\d{3}[\-. ]\d{3}[\-. ]\d{4}"
# Spark SQL string literals eat one backslash level; DuckDB's don't.
_EMAIL_RE_SPARK = _EMAIL_RE.replace("\\", "\\\\")
_PHONE_RE_SPARK = _PHONE_RE.replace("\\", "\\\\")


def scrub_pii(docs: DataFrame) -> DataFrame:
    """(doc_id, n_emails, n_phones, clean_digest): redact emails then
    phones from the lowercased text and digest the result."""
    redacted = (
        f"regexp_replace(regexp_replace(lower(text), '{_EMAIL_RE_SPARK}', '<EMAIL>'),"
        f" '{_PHONE_RE_SPARK}', '<PHONE>')"
    )
    return docs.select(
        "doc_id",
        F.expr(f"size(regexp_extract_all(lower(text), '{_EMAIL_RE_SPARK}', 0))").alias(
            "n_emails"
        ),
        F.expr(f"size(regexp_extract_all(lower(text), '{_PHONE_RE_SPARK}', 0))").alias(
            "n_phones"
        ),
        F.expr(f"md5({redacted})").alias("clean_digest"),
    )


# ---------------------------------------------------------------------------
# T7 — chunk-level boilerplate dedup (C4-style): split each document into
# non-overlapping CHUNK_WORDS-word units, hash them, and remove every
# occurrence of a chunk that appears in ≥ HOT_DOCS distinct documents
# (headers/footers/licence blocks in a real corpus). Same shape as line-
# level dedup — the unit is a fixed word window because the synthetic
# corpus has no newlines; swap the chunker for split(text, '\n') on real
# data and nothing else changes.
#
# Scale shape: the explode emits (doc_id, 16-byte chunk hash) — text never
# shuffles. Hot chunks are found with one map-side-combined aggregate;
# the hot set is tiny by construction (only chunks repeated across ≥3
# docs) so the flag-back join broadcasts. Per-doc removal counts are then
# one aggregate on doc_id.
# ---------------------------------------------------------------------------

CHUNK_WORDS = 8
HOT_DOCS = 3


@query(
    "t7_chunk_dedup",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_TOK_DUCK} AS words FROM documents),
    c AS (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(0, CAST(floor(len(words) / {CHUNK_WORDS}.0) AS INT) - 1),
                   i -> md5(array_to_string(
                            words[i * {CHUNK_WORDS} + 1 : i * {CHUNK_WORDS} + {CHUNK_WORDS}],
                            ' ')))) AS ch
        FROM w WHERE len(words) >= {CHUNK_WORDS}
    ),
    hot AS (SELECT ch FROM c GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= {HOT_DOCS}),
    removed AS (
        SELECT doc_id, COUNT(*) AS n_removed FROM c JOIN hot USING (ch) GROUP BY 1
    )
    SELECT w.doc_id,
           CAST(floor(len(w.words) / {CHUNK_WORDS}.0) AS BIGINT) AS n_chunks,
           COALESCE(r.n_removed, 0) AS n_removed,
           COALESCE(r.n_removed, 0) = 0 AS clean
    FROM w LEFT JOIN removed r USING (doc_id)
    ORDER BY doc_id
    """,
)
def t7_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    words = docs.withColumn("_words", F.expr(_TOK_SPARK)).select(
        "doc_id",
        "_words",
        F.expr(f"size(_words) div {CHUNK_WORDS}").alias("n_chunks"),
    )
    # Guard the short-doc case: sequence(0, -1) in Spark yields the
    # DESCENDING [0, -1] (step defaults to -1), not an empty array.
    pos = F.expr(
        "CASE WHEN n_chunks < 1 THEN array() ELSE sequence(0L, n_chunks - 1) END"
    )
    chunks = words.select(
        "doc_id", F.explode(pos).alias("_i"), "_words"
    ).select(
        "doc_id",
        F.md5(
            F.expr(
                f"concat_ws(' ', slice(_words, CAST(_i * {CHUNK_WORDS} + 1 AS INT), {CHUNK_WORDS}))"
            )
        ).alias("ch"),
    )
    hot = (
        chunks.groupBy("ch")
        .agg(F.count_distinct("doc_id").alias("_nd"))
        .where(F.col("_nd") >= HOT_DOCS)
        .select("ch")
    )
    removed = (
        chunks.join(F.broadcast(hot), "ch")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_removed"))
    )
    return (
        words.select("doc_id", F.col("n_chunks").cast("bigint").alias("n_chunks"))
        .join(removed, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
            (F.coalesce("n_removed", F.lit(0)) == 0).alias("clean"),
        )
        .orderBy("doc_id")
    )


@query(
    "t5_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(lower(text), '{_PHONE_RE}')) AS n_phones,
           md5(regexp_replace(regexp_replace(lower(text), '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g')) AS clean_digest
    FROM documents ORDER BY doc_id
    """,
)
def t5_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scrub_pii(load(spark, sf_dir, "documents")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# T8 — fuzzy (edit-distance) dedup with prefix blocking: the classic
# entity-resolution shape the hash/MinHash family cannot express — x2's
# shingle Jaccard sees token-set overlap, but only an edit-distance
# comparator certifies "doc B is doc A with a 4-character typo". Blocking
# key = the first 60 characters: candidate pairs exist ONLY inside a
# block, so the full O(n²) comparison space collapses to the within-block
# pairs (the same discipline as x2's LSH bands). A row_number cap (50 per
# block) bounds the worst case: a pathological corpus where one prefix
# (boilerplate header, empty docs) covers millions of rows would
# otherwise make a single block quadratic — identical to the LSH
# hot-bucket cap at dedup.py:106. Scale: one shuffle on the 60-byte
# prefix; levenshtein runs JVM-side inside codegen; at 100 TB the text
# payload shuffles once and only blocked pairs are compared.
# ---------------------------------------------------------------------------

_FUZZY_PFX = 60  # blocking-key length
_FUZZY_CAP = 50  # max docs compared per block


@query(
    "t8_fuzzy_dedup",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, text, n_chars, substr(text, 1, {_FUZZY_PFX}) AS pfx
        FROM documents
    ),
    capped AS (
        SELECT doc_id, text, n_chars, pfx FROM (
            SELECT d.*, row_number() OVER (PARTITION BY pfx ORDER BY doc_id) AS rn
            FROM d
        ) WHERE rn <= {_FUZZY_CAP}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
    FROM capped a JOIN capped b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
    WHERE levenshtein(a.text, b.text) * 10 <= greatest(a.n_chars, b.n_chars)
    ORDER BY doc_a, doc_b
    """,
)
def t8_fuzzy_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "text", "n_chars", F.substring("text", 1, _FUZZY_PFX).alias("pfx")
    )
    w = Window.partitionBy("pfx").orderBy("doc_id")
    capped = (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _FUZZY_CAP)
        .drop("rn")
    )
    a, b = capped.alias("a"), capped.alias("b")
    ed = F.levenshtein(F.col("a.text"), F.col("b.text"))
    # The edit-distance predicate goes INTO the join condition, AFTER the
    # cheap conjuncts: Spark evaluates a hash join's non-equi residual
    # left-to-right per matching-key pair, and a separate .where() gets
    # merged in FRONT of the doc_id ordering test — which ran the O(len²)
    # levenshtein against every same-prefix pair including the n self-
    # pairs (measured 3× slower at sf0.1). With doc_id< first, only the
    # surviving ordered pairs pay the DP.
    return (
        a.join(
            b,
            (F.col("a.pfx") == F.col("b.pfx"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (ed * 10 <= F.greatest(F.col("a.n_chars"), F.col("b.n_chars"))),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ed.cast("bigint").alias("edit_dist"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# T9 — BM25 keyword retrieval (Robertson/Spärck Jones; the scoring
# function behind Lucene/Elasticsearch relevance — SURVEY.md §2a O8 notes
# the reference stack provisions Elasticsearch but never queries it; this
# is the engine-native twin of that capability). Spark-first shape: with
# a FIXED query-term set the inverted index degenerates to one corpus
# aggregate — per-doc term frequencies come from `size(filter(toks, ...))`
# projections (no explode, no per-token shuffle), the single-row corpus
# stats (N, Σdl, per-term df) broadcast back over the scan, and the
# top-20 selection is orderBy+limit (TakeOrderedAndProject — per-partition
# heaps, no global sort). Cross-engine float discipline: scores are
# quantized (quant6) BEFORE ranking and rounded (round2) for output, so
# the ln() ULP gap between java.lang.Math.log and libm cannot flip the
# rank boundary; doc_id breaks exact ties deterministically.
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "join", "window", "hash")
_BM25_K = 20  # result size


def _bm25_sql_component(t: str) -> str:
    return (
        f"(CASE WHEN tf_{t} > 0 THEN "
        f"ln((n_docs - df_{t} + 0.5) / (df_{t} + 0.5) + 1) * (tf_{t} * 2.2) "
        f"/ (tf_{t} + 1.2 * (0.25 + 0.75 * (dl / avgdl))) "
        f"ELSE 0.0 END)"
    )


@query(
    "t9_bm25_search",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOK_DUCK} AS toks FROM documents),
    t AS (
        SELECT doc_id, len(toks) AS dl,
               {", ".join(f"len(list_filter(toks, w -> w = '{t}')) AS tf_{t}" for t in _BM25_TERMS)}
        FROM tok
    ),
    c AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
               {", ".join(f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}" for t in _BM25_TERMS)}
        FROM t
    ),
    s AS (
        SELECT doc_id,
               {" + ".join(_bm25_sql_component(t) for t in _BM25_TERMS)} AS score
        FROM t, c
    ),
    q AS (SELECT doc_id, {sql_quant6('score')} AS qs FROM s),
    r AS (
        SELECT doc_id, qs,
               row_number() OVER (ORDER BY qs DESC, doc_id) AS rank
        FROM q
    )
    SELECT CAST(rank AS BIGINT) AS rank, doc_id, {sql_round2('qs')} AS bm25
    FROM r WHERE rank <= {_BM25_K} ORDER BY rank
    """,
)
def t9_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.expr(_TOK_SPARK).alias("toks"))
    t = toks.select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[
            F.expr(f"size(filter(toks, w -> w = '{term}'))").alias(f"tf_{term}")
            for term in _BM25_TERMS
        ],
    )
    c = t.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{term}") > 0).cast("bigint")).alias(f"df_{term}")
            for term in _BM25_TERMS
        ],
    )

    def component(term: str):
        tf = F.col(f"tf_{term}")
        df = F.col(f"df_{term}")
        idf = F.log(
            (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5)) + F.lit(1)
        )
        denom = tf + F.lit(1.2) * (
            F.lit(0.25) + F.lit(0.75) * (F.col("dl") / F.col("avgdl"))
        )
        return F.when(tf > 0, idf * (tf * F.lit(2.2)) / denom).otherwise(F.lit(0.0))

    score = component(_BM25_TERMS[0])
    for term in _BM25_TERMS[1:]:
        score = score + component(term)

    topk = (
        t.crossJoin(F.broadcast(c))
        .select("doc_id", quant6(score).alias("qs"))
        .orderBy(F.desc("qs"), "doc_id")
        .limit(_BM25_K)
    )
    w = Window.orderBy(F.desc("qs"), "doc_id")
    return (
        topk.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select("rank", "doc_id", round2("qs").alias("bm25"))
        .orderBy("rank")
    )
