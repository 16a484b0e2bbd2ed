"""Text-analysis operators over the `documents` table — language ID,
quality scoring, token counting, document fingerprinting.

All four are pure JVM-side expression pipelines (no Python UDFs): at
100 TB these are a single map stage over the corpus with full
whole-stage codegen, no shuffle at all (fingerprint dedup adds one
hash-partition shuffle on the fingerprint key).

Every operator has an exact DuckDB oracle: the expression trees are
built from functions with identical semantics in both engines (ASCII
regex classes, md5, integer division, IEEE double division).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# BPE-ish token pattern: runs of alphanumerics, or single non-space
# punctuation — ASCII classes so Java regex (Spark) and RE2 (DuckDB) agree.
TOKEN_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9 \t\n\r]"

STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "es": ("el", "la", "de", "los", "y", "en", "que"),
    "de": ("der", "die", "das", "und", "ist", "von", "zu"),
    "fr": ("le", "la", "les", "et", "de", "un", "est"),
}


def _stop_regex(lang: str) -> str:
    return r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"


def n_tokens_expr() -> Column:
    """Whitespace token count (empty tokens dropped). Counted as maximal
    non-space runs (`\\S+`) — value-identical to splitting on `\\s+` and
    dropping empties, but with no array materialization: one regex scan
    instead of split + higher-order filter + size (the r1 profile's
    hottest text expression, computed twice per quality row)."""
    return F.regexp_count(F.col("text"), F.lit(r"\S+"))


def _sql_n_tokens() -> str:
    return r"len(list_filter(regexp_split_to_array(text, '\s+'), x -> x != ''))"


# ---------------------------------------------------------------------------
# text_tokens — token counting (whitespace + BPE-ish regex)
# ---------------------------------------------------------------------------

TOKENS_ORACLE = f"""
SELECT doc_id,
       CAST({_sql_n_tokens()} AS INTEGER) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS INTEGER) AS n_bpe_tokens,
       CAST(length(text) AS INTEGER) AS n_chars_actual
FROM documents
ORDER BY doc_id
"""


@register("text_tokens", TOKENS_ORACLE)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            n_tokens_expr().cast("int").alias("n_ws_tokens"),
            F.regexp_count(F.col("text"), F.lit(TOKEN_PATTERN)).cast("int").alias("n_bpe_tokens"),
            F.length("text").cast("int").alias("n_chars_actual"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# text_langid — n-gram/stopword heuristic language ID
# ---------------------------------------------------------------------------


def _langid_cols():
    hits = {
        lang: F.regexp_count(F.lower(F.col("text")), F.lit(_stop_regex(lang))).alias(f"hits_{lang}")
        for lang in STOPWORDS
    }
    return hits


LANGID_ORACLE_HITS = ",\n       ".join(
    f"CAST(len(regexp_extract_all(lower(text), '{_stop_regex(lang)}')) AS INTEGER) AS hits_{lang}"
    for lang in STOPWORDS
)

LANGID_ORACLE = f"""
SELECT doc_id, lang AS labeled_lang, predicted_lang, hits_en, hits_es, hits_de, hits_fr
FROM (
  SELECT doc_id, lang,
         {LANGID_ORACLE_HITS},
         CASE
           WHEN hits_en = 0 AND hits_es = 0 AND hits_de = 0 AND hits_fr = 0 THEN 'und'
           WHEN hits_en >= hits_es AND hits_en >= hits_de AND hits_en >= hits_fr THEN 'en'
           WHEN hits_es >= hits_de AND hits_es >= hits_fr THEN 'es'
           WHEN hits_de >= hits_fr THEN 'de'
           ELSE 'fr'
         END AS predicted_lang
  FROM documents
)
ORDER BY doc_id
"""


@register("text_langid", LANGID_ORACLE)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    hits = _langid_cols()
    with_hits = d.select("doc_id", F.col("lang").alias("labeled_lang"), *hits.values())
    h = {lang: F.col(f"hits_{lang}") for lang in STOPWORDS}
    predicted = (
        F.when((h["en"] == 0) & (h["es"] == 0) & (h["de"] == 0) & (h["fr"] == 0), "und")
        .when((h["en"] >= h["es"]) & (h["en"] >= h["de"]) & (h["en"] >= h["fr"]), "en")
        .when((h["es"] >= h["de"]) & (h["es"] >= h["fr"]), "es")
        .when(h["de"] >= h["fr"], "de")
        .otherwise("fr")
    )
    return (
        with_hits.select(
            "doc_id", "labeled_lang", predicted.alias("predicted_lang"),
            "hits_en", "hits_es", "hits_de", "hits_fr",
        )
        .orderBy("doc_id")
    )


def quality_blend(n_tokens, punct_ratio, stop_ratio):
    """THE quality-score definition (Spark side): length/punct/stopword
    blend with 0.4/0.3/0.3 weights. Single definition site (r11
    review) — text_quality, pipeline_clean_corpus and
    pipeline_data_card (text6.py) all call this; edit weights HERE."""
    return (
        F.least(F.lit(1.0), n_tokens.cast("double") / 100.0) * 0.4
        + (F.lit(1.0) - punct_ratio) * 0.3
        + F.least(F.lit(1.0), stop_ratio * 5.0) * 0.3
    )


def _sql_quality_blend(n_tokens: str, punct_ratio: str, stop_ratio: str) -> str:
    """quality_blend's DuckDB twin — same single-definition contract."""
    return (
        f"least(1.0, {n_tokens} / 100.0) * 0.4"
        f" + (1.0 - {punct_ratio}) * 0.3"
        f" + least(1.0, {stop_ratio} * 5.0) * 0.3"
    )


def _sql_punct_ratio() -> str:
    return "len(regexp_extract_all(text, '[^A-Za-z0-9 \\t\\n\\r]')) / greatest(length(text), 1)"


def _sql_stop_ratio() -> str:
    return (
        f"len(regexp_extract_all(lower(text), '{_stop_regex('en')}'))"
        f" / greatest({_sql_n_tokens()}, 1)"
    )


def _sql_quality_inline() -> str:
    """The full quality expression over raw `text` (for oracles that
    inline it rather than selecting components first)."""
    return _sql_quality_blend(_sql_n_tokens(), _sql_punct_ratio(), _sql_stop_ratio())


def punct_ratio_expr():
    return (
        F.regexp_count(F.col("text"), F.lit(r"[^A-Za-z0-9 \t\n\r]")).cast("double")
        / F.greatest(F.length("text"), F.lit(1)).cast("double")
    )


def stop_ratio_expr():
    return (
        F.regexp_count(F.lower(F.col("text")), F.lit(_stop_regex("en"))).cast("double")
        / F.greatest(n_tokens_expr(), F.lit(1)).cast("double")
    )


# ---------------------------------------------------------------------------
# text_quality — length/punctuation/stopword quality score
# ---------------------------------------------------------------------------

QUALITY_ORACLE = f"""
SELECT doc_id, n_tokens, punct_ratio, stop_ratio,
       {_sql_quality_blend("n_tokens", "punct_ratio", "stop_ratio")} AS quality
FROM (
  SELECT doc_id,
         CAST({_sql_n_tokens()} AS INTEGER) AS n_tokens,
         len(regexp_extract_all(text, '[^A-Za-z0-9 \\t\\n\\r]')) / greatest(length(text), 1) AS punct_ratio,
         len(regexp_extract_all(lower(text), '{_stop_regex("en")}'))
           / greatest({_sql_n_tokens()}, 1) AS stop_ratio
  FROM documents
)
ORDER BY doc_id
"""


@register("text_quality", QUALITY_ORACLE)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        n_tokens_expr().cast("int").alias("n_tokens"),
        punct_ratio_expr().alias("punct_ratio"),
        stop_ratio_expr().alias("stop_ratio"),
    )
    quality = quality_blend(
        F.col("n_tokens"), F.col("punct_ratio"), F.col("stop_ratio")
    )
    return base.select("doc_id", "n_tokens", "punct_ratio", "stop_ratio", quality.alias("quality")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# text_fingerprint — content + bag-of-words fingerprints (md5)
# ---------------------------------------------------------------------------


def normalized_text_expr() -> Column:
    return F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")


def bow_fingerprint_expr() -> Column:
    tokens = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens)), " "))


SQL_BOW_FP = (
    "md5(array_to_string(list_sort(list_distinct("
    r"list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x != ''))), ' '))"
)

FINGERPRINT_ORACLE = f"""
SELECT doc_id,
       md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS content_fp,
       {SQL_BOW_FP} AS bow_fp
FROM documents
ORDER BY doc_id
"""


@register("text_fingerprint", FINGERPRINT_ORACLE)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.md5(normalized_text_expr()).alias("content_fp"),
            bow_fingerprint_expr().alias("bow_fp"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# pipeline_clean_corpus — the composed LLM-data flow: quality gate →
# exact-dedup canonical selection → per-language corpus stats. One
# declarative plan: Catalyst fuses the quality filter into the scan and
# the dedup window shares the bow_fp shuffle.
# ---------------------------------------------------------------------------

CLEAN_TAU = 0.6

CLEAN_CORPUS_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang, text,
         CAST({_sql_n_tokens()} AS INTEGER) AS n_tokens,
         {_sql_quality_inline()} AS quality
  FROM documents
), gated AS (
  SELECT doc_id, lang, n_tokens, quality, {SQL_BOW_FP} AS bow_fp
  FROM scored WHERE quality >= {CLEAN_TAU}
), canonical AS (
  SELECT * FROM (
    SELECT *, doc_id = MIN(doc_id) OVER (PARTITION BY bow_fp) AS is_canonical FROM gated
  ) WHERE is_canonical
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_tokens AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS avg_tokens
FROM canonical
GROUP BY lang
ORDER BY lang
"""


@register("pipeline_clean_corpus", CLEAN_CORPUS_ORACLE)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_tok = n_tokens_expr()
    quality = quality_blend(n_tok, punct_ratio_expr(), stop_ratio_expr())
    gated = d.select(
        "doc_id",
        "lang",
        n_tok.cast("int").alias("n_tokens"),
        quality.alias("quality"),
        bow_fingerprint_expr().alias("bow_fp"),
    ).where(F.col("quality") >= CLEAN_TAU)
    w = Window.partitionBy("bow_fp")
    canonical = gated.withColumn("is_canonical", F.col("doc_id") == F.min("doc_id").over(w)).where(
        F.col("is_canonical")
    )
    return (
        canonical.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum(F.col("n_tokens").cast("decimal(27,6)")).cast("double") / F.count(F.lit(1))).alias(
                "avg_tokens"
            ),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# text_vocab_topk — per-language vocabulary: top-K tokens by frequency
# (the corpus-statistics pass every tokenizer/BPE training run starts
# with). Shape at 100 TB: one shuffle on (lang, token) with map-side
# partial counts; the per-lang top-K window touches only the
# aggregated vocabulary, never the corpus.
# ---------------------------------------------------------------------------

VOCAB_TOP_K = 20

VOCAB_ORACLE = f"""
SELECT lang, token, n, rnk
FROM (
  SELECT lang, token, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rnk
  FROM (
    SELECT lang, t.token AS token, COUNT(*) AS n
    FROM documents,
         UNNEST(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '')) AS t(token)
    GROUP BY lang, t.token
  )
)
WHERE rnk <= {VOCAB_TOP_K}
ORDER BY lang, rnk
"""


@register("text_vocab_topk", VOCAB_ORACLE)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tokens = d.select(
        "lang",
        F.explode(F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")).alias("token"),
    )
    counts = tokens.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), "token")
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= VOCAB_TOP_K)
        .select("lang", "token", "n", "rnk")
        .orderBy("lang", "rnk")
    )


# ---------------------------------------------------------------------------
# sample_hash_stratified — deterministic hash-based sampling: the
# reproducible train/held-out split primitive (same rows selected on
# every run, every engine, every cluster size — unlike TABLESAMPLE,
# which is seed- and partitioning-dependent). Selection is a pure
# map-side predicate on md5(doc_id): ~10.2% (first hex byte <= 0x19),
# pushed to the scan, zero shuffle.
# ---------------------------------------------------------------------------

SAMPLE_HEX_CEIL = "19"  # 26/256 ≈ 10.16% of the md5 space

SAMPLE_ORACLE = f"""
SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS bucket
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '{SAMPLE_HEX_CEIL}'
ORDER BY doc_id
"""


@register("sample_hash_stratified", SAMPLE_ORACLE)
def sample_hash_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = F.md5(F.col("doc_id").cast("string"))
    return (
        d.select("doc_id", "lang", bucket.alias("bucket"))
        .where(F.substring("bucket", 1, 2) <= SAMPLE_HEX_CEIL)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# sample_tablesample — the TABLESAMPLE / USING SAMPLE surface itself
# (r9 verdict item 4): seeded Bernoulli(p) row sampling. Engine-native
# TABLESAMPLE (DuckDB `USING SAMPLE 15% (bernoulli, 42)`, Spark
# `.sample(0.15, 42)`) draws from engine-specific RNG streams — the
# same seed selects DIFFERENT rows per engine, per version, sometimes
# per partitioning — so the portable deterministic equivalent is an
# md5 threshold: keep a row iff the first 8 hex digits of
# md5(seed:doc_id) fall below floor(p·2³²) (fixed-width lowercase-hex
# string compare ≡ the integer compare). True per-row independence,
# seedable, fraction granularity 2⁻³², and a pure map-side predicate:
# zero shuffle, embarrassingly parallel at 100 TB.
# ---------------------------------------------------------------------------

TABLESAMPLE_PCT = 15
TABLESAMPLE_SEED = 42
# floor(0.15 * 2^32) = 644245094 = 0x26666666
_TS_THRESH_HEX = f"{int(TABLESAMPLE_PCT / 100 * 2**32):08x}"

TABLESAMPLE_ORACLE = f"""
SELECT doc_id, lang, source,
       substr(md5('{TABLESAMPLE_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8) AS sample_key
FROM documents
WHERE substr(md5('{TABLESAMPLE_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8) < '{_TS_THRESH_HEX}'
ORDER BY doc_id
"""


@register("sample_tablesample", TABLESAMPLE_ORACLE)
def sample_tablesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    key = F.substring(
        F.md5(F.concat(F.lit(f"{TABLESAMPLE_SEED}:"), F.col("doc_id").cast("string"))),
        1,
        8,
    )
    return (
        d.select("doc_id", "lang", "source", key.alias("sample_key"))
        .where(F.col("sample_key") < _TS_THRESH_HEX)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# dataset_token_budget — "fill a token budget" selection: per language,
# take documents in priority order (longest first, doc_id tiebreak)
# until the cumulative token count reaches TOKEN_BUDGET. This is the
# sampling step of every training-mix recipe ("X billion tokens of
# lang L at quality ≥ q"). Shape at 100 TB: one shuffle on lang for
# the running-sum window; the per-doc token count is map-side. All
# columns are integers — nothing float-sensitive reaches the hash.
# ---------------------------------------------------------------------------

TOKEN_BUDGET = 2000  # per language; corpus has ~5.4k tokens/lang at sf0.01

BUDGET_ORACLE = f"""
SELECT lang, doc_id, n_tok, cum_tok
FROM (
  SELECT lang, doc_id,
         CAST({_sql_n_tokens()} AS BIGINT) AS n_tok,
         CAST(SUM(CAST({_sql_n_tokens()} AS BIGINT)) OVER (
           PARTITION BY lang ORDER BY n_chars DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
  FROM documents
)
WHERE cum_tok <= {TOKEN_BUDGET}
ORDER BY lang, cum_tok
"""


@register("dataset_token_budget", BUDGET_ORACLE)
def dataset_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("n_chars"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.select("lang", "doc_id", "n_chars", n_tokens_expr().cast("bigint").alias("n_tok"))
        .withColumn("cum_tok", F.sum("n_tok").over(w))
        .where(F.col("cum_tok") <= TOKEN_BUDGET)
        .select("lang", "doc_id", "n_tok", "cum_tok")
        .orderBy("lang", "cum_tok")
    )


# ---------------------------------------------------------------------------
# text_repetition — repeated-token ratio, the cheapest "degenerate
# document" quality signal (boilerplate, keyword stuffing, decode
# loops). Token-level because the synthetic corpus has no newlines;
# line-level would be the same plan with a different split. Map-only,
# integer-exact.
# ---------------------------------------------------------------------------

_SQL_LOWER_TOKENS = r"list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x != '')"

REPETITION_ORACLE = f"""
SELECT doc_id,
       CAST(len({_SQL_LOWER_TOKENS}) AS INTEGER) AS n_tok,
       CAST(len(list_distinct({_SQL_LOWER_TOKENS})) AS INTEGER) AS n_uniq_tok,
       CAST(len({_SQL_LOWER_TOKENS}) - len(list_distinct({_SQL_LOWER_TOKENS})) AS INTEGER) AS n_dup_tok
FROM documents
ORDER BY doc_id
"""


@register("text_repetition", REPETITION_ORACLE)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
    return (
        d.select(
            "doc_id",
            F.size(toks).alias("n_tok"),
            F.size(F.array_distinct(toks)).alias("n_uniq_tok"),
            (F.size(toks) - F.size(F.array_distinct(toks))).alias("n_dup_tok"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# text_normalize — canonical text form for exact-dup detection across
# formatting variants: lowercase, non-alphanumerics → space, collapse
# runs, trim. Emits the md5 of the normal form (not the text itself)
# so the output stays narrow at 100 TB. Map-only, ASCII classes so
# Java regex and RE2 agree; both regexp_replace calls are global
# (Spark default; DuckDB 'g' flag).
# ---------------------------------------------------------------------------

NORMALIZE_ORACLE = """
SELECT doc_id, md5(norm) AS norm_fp, CAST(length(norm) AS INTEGER) AS n_norm_chars
FROM (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), '  +', ' ', 'g')) AS norm
  FROM documents
)
ORDER BY doc_id
"""


@register("text_normalize", NORMALIZE_ORACLE)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), "  +", " "
        )
    )
    return (
        d.select("doc_id", F.md5(norm).alias("norm_fp"), F.length(norm).cast("int").alias("n_norm_chars"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# pack_sequences — greedy sequence packing: concatenate documents in
# order and split every CONTEXT_LEN tokens (the concat-and-chunk
# packing used to build fixed-length training batches). bin_id is
# derived from the running token count BEFORE each doc, so the
# assignment is a pure window expression: one shuffle on lang, no
# iteration. All integers.
# ---------------------------------------------------------------------------

CONTEXT_LEN = 512

PACK_ORACLE = f"""
SELECT lang, doc_id, n_tok, bin_id
FROM (
  SELECT lang, doc_id, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // {CONTEXT_LEN} AS BIGINT) AS bin_id
  FROM (SELECT lang, doc_id, CAST({_sql_n_tokens()} AS BIGINT) AS n_tok FROM documents)
)
ORDER BY lang, doc_id
"""


@register("pack_sequences", PACK_ORACLE)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.select("lang", "doc_id", n_tokens_expr().cast("bigint").alias("n_tok"))
        .withColumn("cum_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
        .withColumn("bin_id", F.expr(f"cum_before div {CONTEXT_LEN}"))
        .select("lang", "doc_id", "n_tok", "bin_id")
        .orderBy("lang", "doc_id")
    )


# ---------------------------------------------------------------------------
# corpus_length_histogram — token-length histogram per language: the
# first corpus-health plot of any dataset build. Map-side bucket id +
# one partial-aggregated shuffle; integers only.
# ---------------------------------------------------------------------------

HIST_BUCKET_TOKENS = 10

HIST_ORACLE = f"""
SELECT lang, CAST(n_tok // {HIST_BUCKET_TOKENS} AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tok
FROM (SELECT lang, CAST({_sql_n_tokens()} AS BIGINT) AS n_tok FROM documents)
GROUP BY lang, bucket
ORDER BY lang, bucket
"""


@register("corpus_length_histogram", HIST_ORACLE)
def corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", n_tokens_expr().cast("bigint").alias("n_tok"))
        .withColumn("bucket", F.expr(f"n_tok div {HIST_BUCKET_TOKENS}"))
        .groupBy("lang", "bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("total_tok"))
        .orderBy("lang", "bucket")
    )


# ---------------------------------------------------------------------------
# decontaminate_ngram_overlap — eval-set contamination scan: corpus
# documents sharing any 8-token shingle with the (small) eval set,
# with the count of distinct shared shingles. The eval gram set is
# DISTINCT + broadcast, so at 100 TB the corpus side streams through
# a broadcast hash join — no shuffle of corpus grams at all. The
# synthetic eval set is every doc_id ≡ 0 (mod EVAL_MOD).
# ---------------------------------------------------------------------------

EVAL_MOD = 50
DECON_NGRAM = 8

DECON_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS toks
  FROM documents
),
grams AS (
  SELECT doc_id, UNNEST(list_distinct(CASE WHEN len(toks) >= {DECON_NGRAM}
    THEN list_transform(range(1, len(toks) - {DECON_NGRAM - 2}),
                        i -> array_to_string(toks[i:i+{DECON_NGRAM - 1}], ' '))
    ELSE [] END)) AS gram
  FROM toks
)
SELECT c.doc_id, CAST(COUNT(DISTINCT c.gram) AS BIGINT) AS n_shared_grams
FROM grams c
JOIN (SELECT DISTINCT gram FROM grams WHERE doc_id % {EVAL_MOD} = 0) e USING (gram)
WHERE c.doc_id % {EVAL_MOD} <> 0
GROUP BY c.doc_id
ORDER BY doc_id
"""


@register("decontaminate_ngram_overlap", DECON_ORACLE)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
    grams_arr = F.when(
        F.size(toks) >= DECON_NGRAM,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (DECON_NGRAM - 1)),
            lambda i: F.array_join(F.slice(toks, i, DECON_NGRAM), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = d.select("doc_id", F.explode(F.array_distinct(grams_arr)).alias("gram"))
    eval_grams = g.where(F.col("doc_id") % EVAL_MOD == 0).select("gram").distinct()
    return (
        g.where(F.col("doc_id") % EVAL_MOD != 0)
        .join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct(F.col("gram")).alias("n_shared_grams"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# pipeline_training_mix — the full selection pipeline as ONE declarative
# plan: integer quality gate → canonical dedup on the bag-of-words
# fingerprint → per-language token-budget fill (longest first) →
# CONTEXT_LEN packing summary. Output: per language, how many docs /
# tokens / packed bins the training mix gets. Three shuffles total
# (fp window, lang window, final agg) and every emitted column is an
# integer — the end-to-end "build me a training mix" query.
# ---------------------------------------------------------------------------

MIX_MIN_TOKENS = 20
MIX_BUDGET = 3000

MIX_ORACLE = f"""
WITH gated AS (
  SELECT doc_id, lang,
         CAST({_sql_n_tokens()} AS BIGINT) AS n_tok,
         {SQL_BOW_FP} AS bow_fp
  FROM documents
  WHERE CAST({_sql_n_tokens()} AS BIGINT) >= {MIX_MIN_TOKENS}
),
canonical AS (
  SELECT doc_id, lang, n_tok
  FROM (SELECT *, MIN(doc_id) OVER (PARTITION BY bow_fp) AS fp_min FROM gated)
  WHERE doc_id = fp_min
),
filled AS (
  SELECT lang, doc_id, n_tok, cum_tok,
         CAST((cum_tok - n_tok) // {CONTEXT_LEN} AS BIGINT) AS bin_id
  FROM (
    SELECT lang, doc_id, n_tok,
           CAST(SUM(n_tok) OVER (PARTITION BY lang ORDER BY n_tok DESC, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
    FROM canonical
  )
  WHERE cum_tok <= {MIX_BUDGET}
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tok,
       CAST(MAX(bin_id) + 1 AS BIGINT) AS n_bins
FROM filled
GROUP BY lang
ORDER BY lang
"""


@register("pipeline_training_mix", MIX_ORACLE)
def pipeline_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    gated = (
        d.select(
            "doc_id",
            "lang",
            n_tokens_expr().cast("bigint").alias("n_tok"),
            bow_fingerprint_expr().alias("bow_fp"),
        )
        .where(F.col("n_tok") >= MIX_MIN_TOKENS)
    )
    wfp = Window.partitionBy("bow_fp")
    canonical = (
        gated.withColumn("fp_min", F.min("doc_id").over(wfp))
        .where(F.col("doc_id") == F.col("fp_min"))
        .select("lang", "doc_id", "n_tok")
    )
    wlang = (
        Window.partitionBy("lang")
        .orderBy(F.desc("n_tok"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        canonical.withColumn("cum_tok", F.sum("n_tok").over(wlang))
        .where(F.col("cum_tok") <= MIX_BUDGET)
        .withColumn("bin_id", F.expr(f"(cum_tok - n_tok) div {CONTEXT_LEN}"))
    )
    return (
        filled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tok"),
            (F.max("bin_id") + F.lit(1)).alias("n_bins"),
        )
        .orderBy("lang")
    )
