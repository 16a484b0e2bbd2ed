"""Fourth wave of LLM-data-pipeline operators (r6): tokenizer-training
statistics and per-source corpus health.

Same determinism posture as text2/text3 (DETERMINISM.md): integer
counts first, at most one exactly-rounded double op in hashed output,
no transcendentals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.operators.text import SQL_BOW_FP, bow_fingerprint_expr
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# bpe_pair_counts — adjacent character-pair frequencies (the first BPE
# merge decision), top-10 per language
# ---------------------------------------------------------------------------

BPE_TOP = 10

BPE_PAIR_ORACLE = f"""
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents
), pairs AS (
  SELECT lang, substr(t, s, 2) AS pair
  FROM (SELECT lang, t, unnest(generate_series(1, length(t) - 1)) AS s
        FROM tok WHERE length(t) >= 2)
), counted AS (
  SELECT lang, pair, COUNT(*) AS n FROM pairs GROUP BY lang, pair
)
SELECT lang, pair, CAST(n AS BIGINT) AS n
FROM (SELECT lang, pair, n,
             row_number() OVER (PARTITION BY lang ORDER BY n DESC, pair) AS rn
      FROM counted)
WHERE rn <= {BPE_TOP}
ORDER BY lang, n DESC, pair
"""


@register("bpe_pair_counts", BPE_PAIR_ORACLE)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first iteration of BPE tokenizer training as a relation:
    count adjacent character pairs WITHIN whitespace tokens per
    language and rank the top-10 (the pair a trainer would merge
    first, per language — running this over the corpus is how
    tokenizer vocabularies are fitted at scale; full BPE iterates this
    exact aggregation after each merge). Tokens shorter than 2 chars
    are filtered BEFORE the position explode (the descending-sequence
    guard from lm_oov_rate). Plan: map-side double explode
    (token, position), ONE count shuffle on (lang, pair) with partial
    aggregation absorbing the hot pairs map-side, then the two-phase
    top-k window over the counted relation (per-lang, count-bounded
    input). Ties break on the pair string ascending — deterministic on
    both engines."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select("lang", F.explode(F.split("text", " ")).alias("t"))
        .where(F.length("t") >= 2)
    )
    pairs = toks.select(
        "lang",
        F.explode(F.sequence(F.lit(1), F.length("t") - 1)).alias("s"),
        "t",
    ).select("lang", F.expr("substr(t, s, 2)").alias("pair"))
    counted = pairs.groupBy("lang", "pair").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), "pair")
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= BPE_TOP)
        .select("lang", "pair", "n")
        .orderBy("lang", F.desc("n"), "pair")
    )


# ---------------------------------------------------------------------------
# corpus_dedup_rate_by_source — per-source exact-duplicate rate
# ---------------------------------------------------------------------------

DUP_RATE_ORACLE = f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique,
       CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_dups,
       CAST(COUNT(*) - COUNT(DISTINCT fp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS dup_rate
FROM (SELECT source, {SQL_BOW_FP} AS fp FROM documents)
GROUP BY source
ORDER BY source
"""


@register("corpus_dedup_rate_by_source", DUP_RATE_ORACLE)
def corpus_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplicate rate — the crawl-health metric that
    decides which sources get demoted or re-fetched (a source whose
    dup_rate spikes is re-serving cached pages; dedup pipelines read
    this table before deciding per-source sampling weights). Uses the
    SAME bag-of-words fingerprint as dedup_exact so the two relations
    can never disagree about what a duplicate is. Plan: map-side
    fingerprint, one partial-agg shuffle on source with a distinct
    count (Spark expands to two-phase distinct aggregation — the
    correct shape; the source cardinality is tiny so the final
    reduction is trivial). dup_rate is one int/int double division."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("source", bow_fingerprint_expr().alias("fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_unique"),
        )
        .select(
            "source",
            "n_docs",
            "n_unique",
            (F.col("n_docs") - F.col("n_unique")).alias("n_dups"),
            (
                (F.col("n_docs") - F.col("n_unique")).cast("double")
                / F.col("n_docs").cast("double")
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# text_gopher_filters — composite Gopher-style document quality screen
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 20, 100_000
GOPHER_MIN_MWL, GOPHER_MAX_MWL = 3.0, 10.0
GOPHER_MIN_UNIQUE, GOPHER_MAX_TOP = 0.20, 0.20

GOPHER_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), per_word AS (
  SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w
), per_doc AS (
  SELECT doc_id,
         SUM(c) AS n_words,
         SUM(length(w) * c) AS n_chars_in_words,
         COUNT(*) AS n_unique,
         MAX(c) AS top_count
  FROM per_word GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_chars_in_words AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_word_len,
       CAST(n_unique AS DOUBLE) / CAST(n_words AS DOUBLE) AS unique_ratio,
       CAST(top_count AS DOUBLE) / CAST(n_words AS DOUBLE) AS top_word_ratio,
       (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
         AND (CAST(n_chars_in_words AS DOUBLE) / CAST(n_words AS DOUBLE)
                BETWEEN {GOPHER_MIN_MWL} AND {GOPHER_MAX_MWL})
         AND (CAST(n_unique AS DOUBLE) / CAST(n_words AS DOUBLE) >= {GOPHER_MIN_UNIQUE})
         AND (CAST(top_count AS DOUBLE) / CAST(n_words AS DOUBLE) <= {GOPHER_MAX_TOP})
         AS passes
FROM per_doc
ORDER BY doc_id
"""


@register("text_gopher_filters", GOPHER_ORACLE)
def text_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rules-style composite quality screen (the public
    Rae et al. 2021 heuristics, token-variant for this corpus): word
    count bounds, mean word length bounds, unique-word ratio floor and
    top-word dominance cap — the multi-rule gate production pipelines
    run before any model-based filtering. All four statistics derive
    from ONE (doc_id, word) count relation: integer sums + one double
    division each (DETERMINISM.md rule 2a), and the pass flag is pure
    comparisons on those exact doubles. Plan: token explode → one
    (doc, word) partial-agg shuffle → one per-doc agg; linear, the
    same two-shuffle shape as text_vocab_topk."""
    d = load_table(spark, sf_dir, "documents")
    per_word = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = per_word.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.sum(F.length("w") * F.col("c")).alias("n_chars_in_words"),
        F.count(F.lit(1)).alias("n_unique"),
        F.max("c").alias("top_count"),
    )
    nw = F.col("n_words").cast("double")
    mwl = F.col("n_chars_in_words").cast("double") / nw
    uniq = F.col("n_unique").cast("double") / nw
    top = F.col("top_count").cast("double") / nw
    return (
        per_doc.select(
            "doc_id",
            F.col("n_words").cast("bigint").alias("n_words"),
            mwl.alias("mean_word_len"),
            uniq.alias("unique_ratio"),
            top.alias("top_word_ratio"),
            (
                F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
                & mwl.between(GOPHER_MIN_MWL, GOPHER_MAX_MWL)
                & (uniq >= GOPHER_MIN_UNIQUE)
                & (top <= GOPHER_MAX_TOP)
            ).alias("passes"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# vocab_coverage_rate — per-document coverage under a fixed top-K vocab
# ---------------------------------------------------------------------------

VOCAB_K = 50

VOCAB_COVERAGE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), vocab AS (
  SELECT w FROM (
    SELECT w, COUNT(*) AS c FROM tok GROUP BY w
  ) QUALIFY row_number() OVER (ORDER BY c DESC, w) <= {VOCAB_K}
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.w IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
       CAST(SUM(CASE WHEN v.w IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS coverage
FROM tok t LEFT JOIN vocab v ON t.w = v.w
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


@register("vocab_coverage_rate", VOCAB_COVERAGE_ORACLE)
def vocab_coverage_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document coverage under a FIXED top-K global vocabulary —
    the tokenizer-sizing statistic: how much of each document a
    K-entry word vocab explains (low-coverage docs are what drive
    vocab growth or get byte-fallback treatment). Vocabulary = global
    top-K tokens by count, ties broken on the token string — both
    engines derive it from the same count relation, so the vocab sets
    are identical. Plan: TWO pruned (doc_id, text) scans, each with
    its own token explode — one under the vocab aggregate, one under
    the per-doc join — BY DESIGN: the exploded token stream is the
    largest relation in the query (∼10× the corpus bytes at 100 TB),
    so persisting it to "save" the second scan would trade a cheap
    columnar re-read for caching the most expensive intermediate;
    re-tokenization is map-side and pipeline-fused. The K-row vocab
    BROADCASTS back (VOCAB_K rows here; the boundedness argument holds
    unchanged at a production-scale ~50k-entry vocab, still KBs — the
    join never shuffles the token stream); coverage is one int/int
    double division. Scan count = 2 pinned by a plan test."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    w_top = Window.orderBy(F.desc("c"), "w")
    vocab = (
        tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(w_top))
        .where(F.col("rn") <= VOCAB_K)
        .select(F.col("w").alias("vw"))
    )
    return (
        tok.join(F.broadcast(vocab), tok.w == F.col("vw"), "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("vw").isNotNull(), 1).otherwise(0)).cast("bigint").alias("n_covered"),
        )
        .select(
            "doc_id", "n_tokens", "n_covered",
            (F.col("n_covered").cast("double") / F.col("n_tokens").cast("double")).alias("coverage"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# dataset_epoch_interleave — reproducible multi-epoch training order
# ---------------------------------------------------------------------------

N_EPOCHS = 2

EPOCH_INTERLEAVE_ORACLE = f"""
WITH expanded AS (
  SELECT doc_id, e.epoch,
         md5(CAST(doc_id AS VARCHAR) || ':' || CAST(e.epoch AS VARCHAR)) AS shuffle_key
  FROM documents, (SELECT unnest(generate_series(0, {N_EPOCHS - 1})) AS epoch) e
)
SELECT CAST(epoch AS INTEGER) AS epoch, doc_id,
       CAST(row_number() OVER (PARTITION BY epoch ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos_in_epoch
FROM expanded
ORDER BY epoch, pos_in_epoch
"""


@register("dataset_epoch_interleave", EPOCH_INTERLEAVE_ORACLE)
def dataset_epoch_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible multi-epoch data ordering: every document gets a
    per-epoch position from a DETERMINISTIC shuffle key
    md5(doc_id ':' epoch) — each epoch is an independent permutation,
    identical across engines, cluster sizes and reruns (seeded RNG
    shuffles are engine-private; the hash route is the cross-engine /
    resume-safe contract, same family as sample_hash_stratified). A
    trainer resuming epoch 1 at position k re-derives the exact order
    from the relation. Plan: map-side epoch explode + key, one
    per-epoch window for positions — at 100 TB the window partitions
    by epoch; production would additionally bucket positions into
    shard files via dataset_shard_assign."""
    d = load_table(spark, sf_dir, "documents")
    expanded = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(N_EPOCHS - 1))).alias("epoch"),
    ).select(
        "doc_id", "epoch",
        F.md5(F.concat_ws(":", F.col("doc_id"), F.col("epoch"))).alias("shuffle_key"),
    )
    w = Window.partitionBy("epoch").orderBy("shuffle_key", "doc_id")
    return (
        expanded.select(
            F.col("epoch").cast("int").alias("epoch"),
            "doc_id",
            F.row_number().over(w).cast("bigint").alias("pos_in_epoch"),
        )
        .orderBy("epoch", "pos_in_epoch")
    )


# ---------------------------------------------------------------------------
# corpus_vocab_growth — Heaps-law vocabulary growth curve
# ---------------------------------------------------------------------------

VOCAB_BUCKET = 100  # docs per curve point — the curve length knob

VOCAB_GROWTH_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), first_seen AS (
  SELECT w, MIN(doc_id) AS first_doc FROM tok GROUP BY w
), per_bucket AS (
  SELECT first_doc // {VOCAB_BUCKET} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS new_tokens
  FROM first_seen GROUP BY 1
), buckets AS (
  SELECT DISTINCT doc_id // {VOCAB_BUCKET} AS bucket FROM documents
)
SELECT b.bucket, COALESCE(p.new_tokens, 0) AS new_tokens,
       CAST(SUM(COALESCE(p.new_tokens, 0)) OVER (ORDER BY b.bucket) AS BIGINT) AS vocab_size
FROM buckets b LEFT JOIN per_bucket p USING (bucket)
ORDER BY bucket
"""


@register("corpus_vocab_growth", VOCAB_GROWTH_ORACLE)
def corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heaps' law audit) — distinct tokens
    seen after every VOCAB_BUCKET documents in doc_id order: the
    statistic that says whether a corpus is still contributing new
    vocabulary or has gone redundant (the flattening point is where
    continued crawling stops paying). Computed WITHOUT any running
    distinct: each token contributes exactly once at its FIRST
    document (MIN(doc_id) — one partial-agg shuffle on the token),
    first-occurrences aggregate to per-bucket counts, and the curve is
    a running sum over CURVE POINTS, not documents — the single-
    partition window sees |docs|/VOCAB_BUCKET rows of two ints (the
    bucket width is the curve-resolution/window-size knob; a running
    distinct over the token stream would instead shuffle every
    occurrence into one ordered state)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    first_seen = tok.groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    per_bucket = (
        first_seen.groupBy(F.expr(f"first_doc DIV {VOCAB_BUCKET}").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("new_tokens"))
    )
    buckets = d.select(F.expr(f"doc_id DIV {VOCAB_BUCKET}").alias("bucket")).distinct()
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        buckets.join(per_bucket, "bucket", "left")
        .select("bucket", F.coalesce("new_tokens", F.lit(0)).alias("new_tokens"))
        .withColumn("vocab_size", F.sum("new_tokens").over(w))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# pipeline_decontaminate_report — the three-tier contamination ladder
# as ONE per-document report
# ---------------------------------------------------------------------------


def _decon_report_oracle() -> str:
    from duckdb_sudan__spark.operators.olap12 import DECON_EMB_ORACLE
    from duckdb_sudan__spark.operators.text import DECON_ORACLE
    from duckdb_sudan__spark.operators.text3 import DECON_SUBSTR_ORACLE

    return f"""
WITH sub AS ({DECON_SUBSTR_ORACLE}),
ng AS ({DECON_ORACLE}),
emb AS ({DECON_EMB_ORACLE})
SELECT doc_id, substring_hit, ngram_hit, embedding_hit,
       CAST(CAST(substring_hit AS INTEGER) + CAST(ngram_hit AS INTEGER)
            + CAST(embedding_hit AS INTEGER) AS BIGINT) AS n_tiers_flagged,
       NOT (substring_hit OR ngram_hit OR embedding_hit) AS is_clean
FROM (
  SELECT d.doc_id,
         d.doc_id IN (SELECT DISTINCT doc_id FROM sub) AS substring_hit,
         d.doc_id IN (SELECT doc_id FROM ng) AS ngram_hit,
         COALESCE((SELECT contaminated FROM emb e WHERE e.vec_id = d.doc_id), FALSE) AS embedding_hit
  FROM documents d
)
ORDER BY doc_id
"""


def _register_decon_report() -> None:
    @register("pipeline_decontaminate_report", _decon_report_oracle())
    def pipeline_decontaminate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The decontamination LADDER as one per-document report — what
        a data-governance job actually publishes: for EVERY document,
        whether the verbatim (substring), shingle (8-gram), and
        semantic (embedding-cosine) tiers flagged it, how many tiers
        agree, and the final is_clean bit. Composes the three audited
        entries verbatim (each tier keeps its own fixed eval-slice
        definition; a doc inside a tier's eval slice is simply not on
        that tier's corpus side — documented behavior, not a gap).

        Plan: three dup-sized hit relations (each produced by its
        already-bounded tier) left-join the pruned 1-column documents
        scan; AQE broadcasts every hit side. Linear, no new quadratic
        work — the expensive screens run once each, exactly as they do
        standalone."""
        from duckdb_sudan__spark.operators.olap12 import decontaminate_embedding
        from duckdb_sudan__spark.operators.text import decontaminate_ngram_overlap
        from duckdb_sudan__spark.operators.text3 import decontaminate_substring

        d = load_table(spark, sf_dir, "documents").select("doc_id")
        sub = (
            decontaminate_substring(spark, sf_dir)
            .select("doc_id").distinct()
            .withColumn("substring_hit", F.lit(True))
        )
        ng = (
            decontaminate_ngram_overlap(spark, sf_dir)
            .select("doc_id")
            .withColumn("ngram_hit", F.lit(True))
        )
        emb = decontaminate_embedding(spark, sf_dir).select(
            F.col("vec_id").alias("doc_id"), F.col("contaminated").alias("embedding_hit")
        )
        j = (
            d.join(sub, "doc_id", "left")
            .join(ng, "doc_id", "left")
            .join(emb, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("substring_hit", F.lit(False)).alias("substring_hit"),
                F.coalesce("ngram_hit", F.lit(False)).alias("ngram_hit"),
                F.coalesce("embedding_hit", F.lit(False)).alias("embedding_hit"),
            )
        )
        n_tiers = (
            F.col("substring_hit").cast("int")
            + F.col("ngram_hit").cast("int")
            + F.col("embedding_hit").cast("int")
        ).cast("bigint")
        return (
            j.withColumn("n_tiers_flagged", n_tiers)
            .withColumn(
                "is_clean",
                ~(F.col("substring_hit") | F.col("ngram_hit") | F.col("embedding_hit")),
            )
            .orderBy("doc_id")
        )


_register_decon_report()
