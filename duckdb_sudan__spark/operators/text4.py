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
