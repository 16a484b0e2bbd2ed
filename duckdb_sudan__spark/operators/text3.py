"""Third wave of LLM-data-pipeline operators (r5c): bigram-LM OOV
scoring, exact-substring decontamination, boilerplate-prefix dedup,
and deterministic corpus sharding.

These are the quality / contamination / sharding primitives a
training-data pipeline runs between cleaning and packing. Every
fp-sensitive output follows DETERMINISM.md: integer counts first, one
exactly-rounded double division at the end, no transcendentals, no
engine tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# lm_oov_rate — held-out bigram OOV rate against a train-split LM table
# ---------------------------------------------------------------------------

LM_OOV_ORACLE = """
WITH tok AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
), bg AS (
  SELECT doc_id, lang, toks[s] AS w1, toks[s + 1] AS w2
  FROM (SELECT doc_id, lang, toks, unnest(generate_series(1, length(toks) - 1)) AS s FROM tok)
), train AS (
  SELECT DISTINCT lang, w1, w2 FROM bg WHERE doc_id % 10 != 0
), held AS (
  SELECT * FROM bg WHERE doc_id % 10 = 0
)
SELECT h.doc_id, h.lang,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(CASE WHEN t.w1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(SUM(CASE WHEN t.w1 IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS oov_rate
FROM held h
LEFT JOIN train t ON h.lang = t.lang AND h.w1 = t.w1 AND h.w2 = t.w2
GROUP BY h.doc_id, h.lang
ORDER BY h.doc_id
"""


@register("lm_oov_rate", LM_OOV_ORACLE)
def lm_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary bigram rate: the cheap perplexity
    proxy (a doc whose bigrams the train split has never seen is noise,
    machine-generated, or contamination — the log-prob version of this
    gate needs `ln`, which DETERMINISM.md rule 1 bans from oracled
    values; the OOV fraction is the transcendental-free variant with
    the same screening power). Split is the deterministic doc_id % 10
    (same family as sample_hash_stratified).

    Plan: each split reads its own pushed-projection scan (the mod-10
    predicate isn't parquet-pushable, so sharing one scan would need a
    persist — at scale the join, not the scan, dominates); the bigram
    explode is map-side `sequence`, no self-join; the train side
    reduces to a DISTINCT (lang,w1,w2) relation BEFORE the join, so
    the join input is vocab²-bounded, not corpus-bounded; held bigrams
    LEFT-join it on the bigram key (AQE broadcasts when small,
    shuffles on the key otherwise — stopword-headed skew is absorbed
    by the pre-DISTINCT).
    oov_rate is one int/int double division — exactly rounded, so the
    hash is bit-stable (DETERMINISM.md rule 2a)."""
    d = load_table(spark, sf_dir, "documents")
    # size >= 2 guard: a 1-token doc would make sequence(1, 0) step
    # DOWNWARD (start > stop => step -1) and element_at(toks, 0) raise,
    # where the oracle's generate_series(1, 0) is simply empty. The
    # filter reproduces the oracle's no-bigram-rows semantics exactly
    # (same guard family as dedup.py's greatest() bound).
    toks = (
        d.select("doc_id", "lang", F.split("text", " ").alias("toks"))
        .where(F.size("toks") >= 2)
    )
    bg = toks.select(
        "doc_id", "lang",
        F.explode(F.sequence(F.lit(1), F.size("toks") - 1)).alias("s"), "toks"
    ).select(
        "doc_id", "lang",
        F.element_at("toks", F.col("s")).alias("w1"),
        F.element_at("toks", F.col("s") + 1).alias("w2"),
    )
    train = bg.where(F.col("doc_id") % 10 != 0).select("lang", "w1", "w2").distinct()
    held = bg.where(F.col("doc_id") % 10 == 0)
    joined = held.join(
        train.withColumnRenamed("w1", "t_w1").withColumnRenamed("w2", "t_w2").withColumnRenamed("lang", "t_lang"),
        (F.col("lang") == F.col("t_lang")) & (F.col("w1") == F.col("t_w1")) & (F.col("w2") == F.col("t_w2")),
        "left",
    )
    return (
        joined.groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.when(F.col("t_w1").isNull(), 1).otherwise(0)).cast("bigint").alias("n_oov"),
        )
        .select(
            "doc_id", "lang", "n_bigrams", "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_bigrams").cast("double")).alias("oov_rate"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# decontaminate_substring — exact-substring eval-contamination scan
# ---------------------------------------------------------------------------

SUBSTR_PROBE_MOD = 53
SUBSTR_PROBE_START = 16
SUBSTR_PROBE_LEN = 16
# The eval set is a FIXED corpus slice (ids below this bound), not a
# sample that grows with the corpus: at 100 TB the contamination scan
# is |corpus| × |eval| with |eval| constant — without the bound, the
# 16× scaling experiment measured 116× wall (both sides growing), the
# wrong contract.
EVAL_MAX_DOC_ID = 5000

DECON_SUBSTR_ORACLE = f"""
WITH probes AS (
  SELECT doc_id AS probe_doc_id, substring(text, {SUBSTR_PROBE_START}, {SUBSTR_PROBE_LEN}) AS probe
  FROM documents
  WHERE doc_id % {SUBSTR_PROBE_MOD} = 0 AND doc_id < {EVAL_MAX_DOC_ID}
    AND length(text) >= {SUBSTR_PROBE_START + SUBSTR_PROBE_LEN - 1}
)
SELECT p.probe_doc_id, d.doc_id, CAST(strpos(d.text, p.probe) AS INTEGER) AS pos
FROM documents d, probes p
WHERE d.doc_id <> p.probe_doc_id AND strpos(d.text, p.probe) > 0
ORDER BY p.probe_doc_id, d.doc_id
"""


@register("decontaminate_substring", DECON_SUBSTR_ORACLE)
def decontaminate_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring decontamination — the strictest tier of the
    eval-overlap ladder (decontaminate_ngram_overlap is the
    shingle-level tier): flag every corpus document that contains an
    eval probe VERBATIM, with its 1-based match position (instr ≡
    strpos on both engines). Probes are fixed character windows of the
    deterministic doc_id % 53 eval slice, bounded by EVAL_MAX_DOC_ID
    so the eval set stays CONSTANT as the corpus grows (SCALING.md
    measured the unbounded version at 116× wall for 16× data — eval
    sets don't scale with training corpora).

    Plan: the probe set is eval-set-sized (tiny by construction), so
    it BROADCASTS and the corpus streams through a
    BroadcastNestedLoopJoin with a map-side contains() predicate —
    substring containment has no equi-key, so BNLJ with the bounded
    side broadcast IS the right shape; the corpus side is never
    shuffled and never collected. At 100 TB this is one scan emitting
    only matches (the same posture as ann_range_search)."""
    d = load_table(spark, sf_dir, "documents")
    probes = (
        d.where(
            (F.col("doc_id") % SUBSTR_PROBE_MOD == 0)
            & (F.col("doc_id") < EVAL_MAX_DOC_ID)
            & (F.length("text") >= SUBSTR_PROBE_START + SUBSTR_PROBE_LEN - 1)
        )
        .select(
            F.col("doc_id").alias("probe_doc_id"),
            F.substring("text", SUBSTR_PROBE_START, SUBSTR_PROBE_LEN).alias("probe"),
        )
    )
    corpus = d.select("doc_id", "text")
    return (
        corpus.join(
            F.broadcast(probes),
            (F.col("doc_id") != F.col("probe_doc_id")) & (F.expr("instr(text, probe)") > 0),
        )
        .select("probe_doc_id", "doc_id", F.expr("instr(text, probe)").cast("int").alias("pos"))
        .orderBy("probe_doc_id", "doc_id")
    )


# ---------------------------------------------------------------------------
# dedup_doc_prefix — boilerplate-prefix duplicate groups
# ---------------------------------------------------------------------------

PREFIX_TOKENS = 8

DEDUP_PREFIX_ORACLE = f"""
WITH p AS (
  SELECT doc_id, lang,
         md5(array_to_string(string_split(text, ' ')[1:{PREFIX_TOKENS}], ' ')) AS prefix_key
  FROM documents
)
SELECT prefix_key,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       MIN(doc_id) AS canonical_doc_id,
       MAX(doc_id) AS max_doc_id
FROM p
GROUP BY prefix_key
HAVING COUNT(*) >= 2
ORDER BY prefix_key
"""


@register("dedup_doc_prefix", DEDUP_PREFIX_ORACLE)
def dedup_doc_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-prefix dedup: group documents by the md5 of their
    first 8 tokens — the C4/RefinedWeb-style screen for shared
    headers, license banners, and template openings that exact dedup
    (whole-text hash) misses and near-dup tiers find only at much
    higher cost. Canonical keep = MIN doc_id, the same convention as
    dedup_exact. Documents shorter than 8 tokens key on their full
    token list (both engines' slice semantics truncate alike).

    Plan: map-side md5 of a bounded prefix (the scan never carries
    full text past the projection), ONE hash shuffle on the key with
    partial aggregation, HAVING prunes singletons reducer-side. The
    group key is 32 hex chars regardless of document size — at 100 TB
    this is the cheapest dedup tier after exact-hash."""
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.array_join(F.slice(F.split("text", " "), 1, PREFIX_TOKENS), " "))
    return (
        d.select(key.alias("prefix_key"), "doc_id", "lang")
        .groupBy("prefix_key")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("doc_id").alias("canonical_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .where(F.col("n_docs") >= 2)
        .orderBy("prefix_key")
    )


# ---------------------------------------------------------------------------
# dataset_shard_assign — deterministic hash sharding + shard manifests
# ---------------------------------------------------------------------------

N_SHARDS = 16

SHARD_ORACLE = f"""
SELECT CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER) % {N_SHARDS} AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id
FROM documents
GROUP BY shard
ORDER BY shard
"""


@register("dataset_shard_assign", SHARD_ORACLE)
def dataset_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard assignment + per-shard manifest — the "write
    the corpus as N stable files" step at the end of a pipeline. Shard
    = md5(doc_id) first 16 bits mod N (content-independent, stable
    across engines/cluster sizes — Spark's hash() and DuckDB's hash()
    disagree, so the md5-hex route is the cross-engine-deterministic
    choice, same family as sample_hash_stratified; hex→int is
    conv(,16,10) here and a '0x' cast in the oracle, both exact).

    Plan: pure map-side shard id, ONE partial-agg shuffle into
    N_SHARDS groups. The manifest (counts, token totals, id ranges)
    is what a writer job needs to plan balanced output files; the
    md5 spread makes shard sizes near-equal by construction — at
    100 TB this IS the repartition(N, shard) write plan."""
    d = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast("bigint")
        % N_SHARDS
    )
    return (
        d.select(
            shard.alias("shard"), "doc_id", "lang",
            F.size(F.split("text", " ")).alias("n_toks"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# text_ngram_novelty — per-document novel-shingle fraction
# ---------------------------------------------------------------------------

NOVELTY_K = 5  # token 5-gram shingles

NOVELTY_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh AS (
  SELECT doc_id, array_to_string(toks[s:s+{NOVELTY_K - 1}], ' ') AS shingle
  FROM (SELECT doc_id, toks, unnest(generate_series(1, length(toks) - {NOVELTY_K - 1})) AS s FROM tok)
), firsts AS (
  SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty
FROM sh s JOIN firsts f ON s.shingle = f.shingle
GROUP BY s.doc_id
ORDER BY s.doc_id
"""


@register("text_ngram_novelty", NOVELTY_ORACLE)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty curve — per document (in doc_id ingestion order),
    the fraction of its token 5-gram shingles appearing for the FIRST
    time: the curation metric that shows a crawl going stale (novelty
    decays as a source repeats itself) and flags low-novelty documents
    as near-copies of earlier material without any pairwise work.
    "First" is attributed by MIN(doc_id) per shingle — an aggregate,
    not an ordered scan, so the metric is order-parallel. Plan: one
    map-side shingle explode, ONE shuffle keyed on the shingle (the
    min-doc partial agg absorbs stopword-shingle skew map-side), and
    the join back is shingle-keyed too; per-doc aggregation closes it.
    novelty is one int/int double division (DETERMINISM.md rule 2a).
    At 100 TB this is exactly the decontaminate/count-table shape —
    linear, never pairwise."""
    d = load_table(spark, sf_dir, "documents")
    # size >= NOVELTY_K guard: shorter docs would flip sequence() into a
    # descending range (slice(toks, 0, 5) errors) where the oracle's
    # generate_series is empty — filter to match the oracle's
    # no-shingle-rows semantics (see lm_oov_rate).
    toks = (
        d.select("doc_id", F.split("text", " ").alias("toks"))
        .where(F.size("toks") >= NOVELTY_K)
    )
    sh = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("toks") - (NOVELTY_K - 1))).alias("s"),
        "toks",
    ).select(
        "doc_id",
        F.array_join(F.slice(F.col("toks"), F.col("s"), NOVELTY_K), " ").alias("shingle"),
    )
    firsts = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(firsts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("bigint").alias("n_novel"),
        )
        .select(
            "doc_id", "n_shingles", "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_shingles").cast("double")).alias("novelty"),
        )
        .orderBy("doc_id")
    )
