"""Second wave of LLM-data-pipeline text operators (r5): sliding-window
chunking with overlap, PII scrubbing, tf-idf top-terms, and BM25
ranking.

Scoring functions deliberately use RATIONAL idf variants
(``N/df`` and ``(N-df+0.5)/(df+0.5)``) instead of the textbook
``ln(...)``: a measured sweep of 5,500 idf inputs showed JVM
``Math.log`` and DuckDB/glibc ``ln`` disagree at the last ulp on 99%
of them, which a value-hash gate cannot tolerate. Division is an
exactly-rounded IEEE op, so the rational forms are bit-identical
across engines while preserving the (monotone-in-df) ranking
semantics. All pipelines are JVM expressions — no Python in the hot
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# text_chunk_overlap — sliding token windows (size 32, stride 24)
# ---------------------------------------------------------------------------

CHUNK_SIZE = 32
CHUNK_STRIDE = 24

TEXT_CHUNK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), e AS (
  -- scalar generate_series + unnest: DuckDB's table-function form
  -- rejects lateral column refs
  SELECT doc_id, toks,
         unnest(generate_series(0, greatest(length(toks) - 1, 0), {CHUNK_STRIDE})) AS s
  FROM t
)
SELECT doc_id,
       CAST(s / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       length(list_slice(toks, s + 1, s + {CHUNK_SIZE})) AS n_tokens,
       array_to_string(list_slice(toks, s + 1, s + {CHUNK_SIZE}), ' ') AS chunk_text
FROM e
ORDER BY doc_id, chunk_idx
"""


@register("text_chunk_overlap", TEXT_CHUNK_ORACLE)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking for context-length-bounded training
    samples: windows of 32 tokens starting every 24 (8-token overlap),
    last window ragged. sequence() + explode + slice is a pure JVM
    pipeline — the chunk relation never routes through Python, and the
    explode multiplies rows ~n/24× map-side with no shuffle (only the
    output sort exchanges). At 100 TB chunking is the canonical
    map-only stage before packing; this shape keeps it embarrassingly
    parallel. Reference parity: corpus prep a sudan-extension user
    would run downstream of the providers."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    base = d.select("doc_id", toks.alias("toks"))
    starts = F.explode(
        F.sequence(F.lit(0), F.greatest(F.size("toks") - 1, F.lit(0)), F.lit(CHUNK_STRIDE))
    ).alias("s")
    chunk = F.slice(F.col("toks"), F.col("s") + 1, CHUNK_SIZE)
    return (
        base.select("doc_id", "toks", starts)
        .select(
            "doc_id",
            (F.col("s") / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
            F.size(chunk).alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


# ---------------------------------------------------------------------------
# text_pii_scrub — regex redaction of emails/phones with counts
# ---------------------------------------------------------------------------

# RE2 ∩ java.util.regex subset: char classes, bounded repeats — no
# lookarounds, no backrefs, so both engines compile identically.
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\+[0-9]{2,4}-[0-9]{3,4}-[0-9]{3,4}"

TEXT_PII_ORACLE = f"""
WITH synth AS (
  -- deterministic PII injection: the synthetic corpus carries no real
  -- contact strings, so append one email + one phone per doc to give
  -- the scrubber something to find (same expression on both engines)
  SELECT doc_id,
         text || ' contact user' || doc_id || '@mail.example.com or +249-'
              || lpad(CAST(doc_id * 7 % 10000 AS VARCHAR), 4, '0') || '-'
              || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') AS raw
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(raw, '{_PHONE_RE}')) AS n_phones,
       regexp_replace(regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS clean
FROM synth
ORDER BY doc_id
"""


@register("text_pii_scrub", TEXT_PII_ORACLE)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training-corpus hygiene: redact emails and
    international phone numbers, report per-doc match counts. The
    patterns live in the RE2 ∩ java.util.regex common subset so the
    oracle and the plan compile the same automaton. Map-only (sort
    exchange aside); regexp_replace/extract_all run inside
    whole-stage codegen. At 100 TB this is a pure scan stage — the
    shape PII filtering must have, because anything with a shuffle
    would dominate the pipeline."""
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +249-"),
        F.lpad((F.col("doc_id") * 7 % 10000).cast("string"), 4, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
    )
    s = d.select("doc_id", raw.alias("raw"))
    return (
        s.select(
            "doc_id",
            F.size(F.regexp_extract_all("raw", F.lit(_EMAIL_RE), F.lit(0))).alias("n_emails"),
            F.size(F.regexp_extract_all("raw", F.lit(_PHONE_RE), F.lit(0))).alias("n_phones"),
            F.regexp_replace(
                F.regexp_replace("raw", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
            ).alias("clean"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# tfidf_topk — top-3 terms per document by tf·idf (rational idf)
# ---------------------------------------------------------------------------

TFIDF_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok
), df AS (
  SELECT tok, COUNT(DISTINCT doc_id) AS df_docs FROM tf GROUP BY tok
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.tok, tf.tf, df.df_docs,
         CAST(tf.tf AS DOUBLE) * (CAST(n.n_docs AS DOUBLE) / CAST(df.df_docs AS DOUBLE)) AS score,
         row_number() OVER (PARTITION BY tf.doc_id ORDER BY
           CAST(tf.tf AS DOUBLE) * (CAST(n.n_docs AS DOUBLE) / CAST(df.df_docs AS DOUBLE)) DESC,
           tf.tok) AS rn
  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
)
SELECT doc_id, tok, tf, df_docs, score
FROM scored WHERE rn <= 3
ORDER BY doc_id, score DESC, tok
"""


@register("tfidf_topk", TFIDF_ORACLE)
def tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf·idf with the
    RATIONAL idf ``N/df`` (see module docstring for why not ln —
    ranking by tf·N/df is order-isomorphic to tf·exp(idf_ln) per
    term-frequency level, and bit-stable).

    ONE corpus scan + one zero-column count scan: the token explode
    and (doc, tok) partial agg build tf; df comes from a COUNT window
    over tf partitioned by tok (tf rows are distinct per (doc, tok),
    so the window count ≡ COUNT(DISTINCT doc)) — NOT from a second
    aggregation of tf, which Catalyst would recompute from a second
    full corpus scan + explode. The N relation is a broadcast 1-row
    count whose parquet scan prunes to zero columns (footer-only).
    Three fact-sized shuffles (tf agg, tok window, doc window) — the
    tok window is the skew point for web-scale vocab (stopword
    tokens); at 100 TB the mitigation is the standard two-phase
    df pre-agg, traded here for the single-scan plan."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    n_rel = load_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    wt = Window.partitionBy("tok")
    score = F.col("tf").cast("double") * (
        F.col("n_docs").cast("double") / F.col("df_docs").cast("double")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "tok")
    return (
        tf.withColumn("df_docs", F.count(F.lit(1)).over(wt))
        .crossJoin(F.broadcast(n_rel))
        .withColumn("score", score)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "tok", "tf", "df_docs", "score")
        .orderBy("doc_id", F.desc("score"), "tok")
    )


# ---------------------------------------------------------------------------
# bm25_rank — BM25 document ranking for a fixed query (rational idf)
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ["data", "query", "merge"]

_BM25_TERM_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

BM25_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         CAST(SUM(length(toks)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM docs
), tf AS (
  SELECT d.doc_id, length(d.toks) AS dl, t.term,
         len(list_filter(d.toks, x -> x = t.term)) AS tf
  FROM docs d CROSS JOIN (SELECT unnest([{_BM25_TERM_SQL}]) AS term) t
), df AS (
  SELECT term, CAST(count_if(tf > 0) AS DOUBLE) AS df_docs
  FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id, tf.dl,
         SUM(((s.n_docs - df.df_docs + 0.5) / (df.df_docs + 0.5))
             * ((CAST(tf.tf AS DOUBLE) * ({BM25_K1} + 1.0))
                / (CAST(tf.tf AS DOUBLE)
                   + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * (CAST(tf.dl AS DOUBLE) / s.avgdl))))) AS score
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN stats s
  GROUP BY tf.doc_id, tf.dl
)
SELECT doc_id, dl, score
FROM scored
ORDER BY score DESC, doc_id
LIMIT 10
"""


@register("bm25_rank", BM25_ORACLE)
def bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents for a fixed 3-term query (k1=1.2,
    b=0.75), with the rational Robertson idf ``(N−df+0.5)/(df+0.5)``
    (un-logged — module docstring).

    ONE corpus scan: a narrow per-doc relation (doc_id, dl, one tf
    column per query term — array filters, no explode) is persisted,
    then corpus stats (N, avgdl) AND all per-term dfs come from a
    single tiny aggregate over it, broadcast back as one row —
    Catalyst does not reuse unpersisted subplans, so the oracle's
    multi-CTE formulation would re-scan the corpus per reference.
    The per-doc score is an explicit t₀+t₁+t₂ expression, fixing the
    fp addition order by construction (matching the oracle's
    term-major SUM order), where a SUM over exploded rows would
    depend on row placement. Top-10 compiles to
    TakeOrderedAndProject — no global sort materialization. Scale:
    map-only over the corpus + a scalar broadcast, the minimal shape
    for fixed-query scoring."""
    return (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.desc("score"), "doc_id")
        .limit(10)
    )


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared BM25 scorer (bm25_rank + hybrid_search_rrf): returns the
    (doc_id, dl, score) relation. One corpus scan into a persisted
    narrow per-doc tf relation; stats broadcast back as one row; the
    score is the fixed-order t₀+t₁+t₂ expression."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )

    def tf_col(term: str):
        # closure, NOT a defaulted lambda arg — pyspark HOFs dispatch
        # on lambda arity, so a 2-param lambda would receive (x, idx)
        return F.size(F.filter("toks", lambda x: x == F.lit(term)))

    per_doc = d.select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[tf_col(t).alias(f"tf_{i}") for i, t in enumerate(BM25_TERMS)],
    ).persist()
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias("avgdl"),
        *[
            F.count_if(F.col(f"tf_{i}") > 0).cast("double").alias(f"df_{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    k1, b = F.lit(BM25_K1), F.lit(BM25_B)

    def contrib(i: int):
        tf = F.col(f"tf_{i}").cast("double")
        df = F.col(f"df_{i}")
        idf = (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5))
        return idf * (
            (tf * (k1 + F.lit(1.0)))
            / (tf + k1 * (F.lit(1.0) - b + b * (F.col("dl").cast("double") / F.col("avgdl"))))
        )

    score = contrib(0) + contrib(1) + contrib(2)
    return per_doc.crossJoin(F.broadcast(stats)).select(
        "doc_id", "dl", score.alias("score")
    )


# ---------------------------------------------------------------------------
# ngram_lm_counts — bigram language-model count tables
# ---------------------------------------------------------------------------

NGRAM_LM_ORACLE = """
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE lang = 'en'
), bg AS (
  SELECT toks[s] AS w1, toks[s + 1] AS w2
  FROM (SELECT toks, unnest(generate_series(1, length(toks) - 1)) AS s FROM tok)
), c AS (
  SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY w1, w2
)
SELECT w1, w2, n,
       CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY w1) AS DOUBLE) AS p_mle,
       COUNT(*) OVER (PARTITION BY w2) AS continuation_types
FROM c
ORDER BY w1, w2
"""


@register("ngram_lm_counts", NGRAM_LM_ORACLE)
def ngram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model count table over the English slice:
    per-bigram count, MLE conditional probability P(w2|w1) (one exact
    int/int double division), and the continuation-type count
    |{w1 : c(w1,w2)>0}| that Kneser-Ney smoothing needs. One corpus
    scan → map-side bigram explode (sequence over token positions, no
    self-join) → one (w1,w2) partial-agg shuffle; both normalizing
    windows run on the aggregated vocab²-bounded relation, not the
    corpus. At 100 TB this is the canonical count-table shape — the
    skew cure for stopword-headed w1 partitions is the same two-phase
    pre-agg the counts already do."""
    d = load_table(spark, sf_dir, "documents").where(F.col("lang") == "en")
    toks = d.select(F.split("text", " ").alias("toks"))
    bg = (
        toks.select(
            F.explode(F.sequence(F.lit(1), F.size("toks") - 1)).alias("s"), "toks"
        )
        .select(
            F.element_at("toks", F.col("s")).alias("w1"),
            F.element_at("toks", F.col("s") + 1).alias("w2"),
        )
    )
    c = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    w_w1 = Window.partitionBy("w1")
    w_w2 = Window.partitionBy("w2")
    return (
        c.select(
            "w1",
            "w2",
            "n",
            (F.col("n").cast("double") / F.sum("n").over(w_w1).cast("double")).alias("p_mle"),
            F.count(F.lit(1)).over(w_w2).alias("continuation_types"),
        )
        .orderBy("w1", "w2")
    )


# ---------------------------------------------------------------------------
# pipeline_chunk_index — RAG-prep: chunk → fingerprint → dedup flag
# ---------------------------------------------------------------------------

PIPELINE_CHUNK_INDEX_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), e AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, greatest(length(toks) - 1, 0), {CHUNK_STRIDE})) AS s
  FROM t
), chunks AS (
  SELECT doc_id,
         CAST(s / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
         length(list_slice(toks, s + 1, s + {CHUNK_SIZE})) AS n_tokens,
         md5(array_to_string(list_slice(toks, s + 1, s + {CHUNK_SIZE}), ' ')) AS chunk_hash
  FROM e
)
SELECT doc_id, chunk_idx, n_tokens, chunk_hash,
       row_number() OVER (PARTITION BY chunk_hash ORDER BY doc_id, chunk_idx) > 1 AS is_dup
FROM chunks
ORDER BY doc_id, chunk_idx
"""


@register("pipeline_chunk_index", PIPELINE_CHUNK_INDEX_ORACLE)
def pipeline_chunk_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed retrieval-prep pipeline: sliding-window chunking
    (text_chunk_overlap's shape) → md5 content fingerprint per chunk →
    exact-duplicate chunk flag via ONE row_number window on the hash
    (first occurrence by (doc_id, chunk_idx) is canonical, later ones
    are flagged — what a RAG index build must drop before embedding).
    One corpus scan, map-side explode+hash, one window shuffle on the
    hash. The overlap-heavy chunk relation never stores chunk text —
    only the 32-byte hash — so the shuffled bytes stay small at
    100 TB; embedding the deduped survivors is the expensive
    downstream stage this pipeline exists to shrink."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", F.split("text", " ").alias("toks"))
    chunks = (
        base.select(
            "doc_id",
            "toks",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.size("toks") - 1, F.lit(0)), F.lit(CHUNK_STRIDE))
            ).alias("s"),
        )
        .select(
            "doc_id",
            (F.col("s") / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
            F.size(F.slice(F.col("toks"), F.col("s") + 1, CHUNK_SIZE)).alias("n_tokens"),
            F.md5(F.array_join(F.slice(F.col("toks"), F.col("s") + 1, CHUNK_SIZE), " ")).alias(
                "chunk_hash"
            ),
        )
    )
    w = Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_idx")
    return (
        chunks.withColumn("is_dup", F.row_number().over(w) > 1)
        .orderBy("doc_id", "chunk_idx")
    )


# ---------------------------------------------------------------------------
# sample_temperature_mix — temperature-rebalanced language sampling
# ---------------------------------------------------------------------------

SAMPLE_TEMP_MIX_ORACLE = """
WITH c AS (
  SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(CAST(n_chars AS DECIMAL(38,0))) AS DOUBLE) AS total_chars
  FROM documents GROUP BY lang
), w AS (
  -- weight quantized to 1e-6: round(sqrt(n)*1e6) is an exact BIGINT on
  -- both engines (sqrt and the *1e6 multiply are correctly-rounded IEEE
  -- ops on identical inputs), so the normalizer is an integer sum --
  -- no double->fractional-decimal cast (DETERMINISM.md #2)
  SELECT lang, n_docs, total_chars,
         CAST(round(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0) AS BIGINT) AS wti
  FROM c
), t AS (
  SELECT SUM(wti) AS wt_total, SUM(n_docs) AS all_docs FROM w
)
SELECT w.lang, w.n_docs, w.total_chars,
       CAST(w.wti AS DOUBLE) / CAST(t.wt_total AS DOUBLE) AS sample_p,
       (CAST(w.wti AS DOUBLE) / CAST(t.wt_total AS DOUBLE))
         / (CAST(w.n_docs AS DOUBLE) / CAST(t.all_docs AS DOUBLE)) AS upweight
FROM w CROSS JOIN t
ORDER BY w.lang
"""


@register("sample_temperature_mix", SAMPLE_TEMP_MIX_ORACLE)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-rebalanced multilingual sampling weights -- the
    p_i ∝ n_i^α mix (α = 0.5) that upweights low-resource languages
    in a training mixture. α is fixed at 0.5 BECAUSE n^0.5 is sqrt,
    the one power IEEE 754 requires to be correctly rounded -- a
    general pow(n, 0.7) is transcendental and not cross-libm
    ulp-stable (DETERMINISM.md #1). The weights are quantized to
    1e-6 (round(sqrt(n)*1e6) as BIGINT -- every op exactly rounded on
    identical inputs) so the normalizer is an EXACT integer sum;
    sample_p and the upweight ratio are then fixed-sequence double
    divisions of exact integers. One map-combined shuffle into
    |langs| groups; the normalizer is an unpartitioned window over
    that |langs|-row aggregate -- a pure scan at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars").cast("decimal(38,0)")).cast("double").alias("total_chars"),
    )
    w = c.withColumn(
        "wti",
        F.round(F.sqrt(F.col("n_docs").cast("double")) * F.lit(1000000.0)).cast("bigint"),
    )
    # totals via an unpartitioned window over the |langs|-row aggregate
    # (a derived t-relation would recompute the agg from a SECOND
    # corpus scan - Catalyst does not reuse unpersisted subplans)
    wall = Window.partitionBy()
    w = w.withColumn("wt_total", F.sum("wti").over(wall)).withColumn(
        "all_docs", F.sum("n_docs").over(wall)
    )
    p = F.col("wti").cast("double") / F.col("wt_total").cast("double")
    return (
        w
        .select(
            "lang",
            "n_docs",
            "total_chars",
            p.alias("sample_p"),
            (p / (F.col("n_docs").cast("double") / F.col("all_docs").cast("double"))).alias("upweight"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# hybrid_search_rrf — BM25 ⊕ embedding-cosine via reciprocal-rank fusion
# ---------------------------------------------------------------------------

RRF_K = 60
RRF_TOP_N = 50

_BM25_SCORED_SQL = f"""
  WITH docs AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  ), stats AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
           CAST(SUM(length(toks)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
           CAST(count_if(len(list_filter(toks, x -> x = 'data'))  > 0) AS DOUBLE) AS df_0,
           CAST(count_if(len(list_filter(toks, x -> x = 'query')) > 0) AS DOUBLE) AS df_1,
           CAST(count_if(len(list_filter(toks, x -> x = 'merge')) > 0) AS DOUBLE) AS df_2
    FROM docs
  )
  SELECT d.doc_id,
         ((s.n_docs - s.df_0 + 0.5) / (s.df_0 + 0.5))
           * ((CAST(len(list_filter(d.toks, x -> x = 'data')) AS DOUBLE) * ({BM25_K1} + 1.0))
              / (CAST(len(list_filter(d.toks, x -> x = 'data')) AS DOUBLE)
                 + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * (CAST(length(d.toks) AS DOUBLE) / s.avgdl))))
         + ((s.n_docs - s.df_1 + 0.5) / (s.df_1 + 0.5))
           * ((CAST(len(list_filter(d.toks, x -> x = 'query')) AS DOUBLE) * ({BM25_K1} + 1.0))
              / (CAST(len(list_filter(d.toks, x -> x = 'query')) AS DOUBLE)
                 + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * (CAST(length(d.toks) AS DOUBLE) / s.avgdl))))
         + ((s.n_docs - s.df_2 + 0.5) / (s.df_2 + 0.5))
           * ((CAST(len(list_filter(d.toks, x -> x = 'merge')) AS DOUBLE) * ({BM25_K1} + 1.0))
              / (CAST(len(list_filter(d.toks, x -> x = 'merge')) AS DOUBLE)
                 + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * (CAST(length(d.toks) AS DOUBLE) / s.avgdl))))
         AS score
  FROM docs d CROSS JOIN stats s
"""

HYBRID_RRF_ORACLE = f"""
WITH bscored AS ({_BM25_SCORED_SQL}),
btop AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank_bm25
  FROM bscored
  QUALIFY rank_bm25 <= {RRF_TOP_N}
),
q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
cscored AS (
  SELECT e.vec_id AS doc_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.q_emb AS DOUBLE[])), 6) AS cos
  FROM embeddings e CROSS JOIN q
),
ctop AS (
  SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS rank_cos
  FROM cscored
  QUALIFY rank_cos <= {RRF_TOP_N}
)
SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
       b.rank_bm25 AS rank_bm25,
       c.rank_cos AS rank_cos,
       COALESCE(1.0 / ({RRF_K} + b.rank_bm25), 0.0)
         + COALESCE(1.0 / ({RRF_K} + c.rank_cos), 0.0) AS rrf
FROM btop b FULL OUTER JOIN ctop c ON b.doc_id = c.doc_id
ORDER BY rrf DESC, doc_id
LIMIT 10
"""


@register("hybrid_search_rrf", HYBRID_RRF_ORACLE)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: the lexical BM25 ranking and the dense
    embedding-cosine ranking (query = vector 0) fused by reciprocal
    rank — RRF(d) = Σ 1/(60 + rank_i(d)) over the two top-50 lists,
    the industry-standard fusion precisely BECAUSE it is rank-based:
    the only fp math is two exact int divisions added in a fixed
    order, so heterogeneous score scales (and cross-engine score
    ulps) cannot perturb the result. Plan: each ranker reduces to a
    TakeOrdered top-50 before any window touches it — ranks are
    assigned on 50-row relations, never via an unbounded unpartitioned
    window over the corpus — then a 50×50 full outer join and a
    top-10. Scale: both candidate lists are fixed-size model objects;
    the corpus-side work is the two scans the rankers already do."""
    from duckdb_sudan__spark.operators.similarity import cosine_expr

    bscored = _bm25_scored(spark, sf_dir).select("doc_id", "score")
    btop50 = bscored.orderBy(F.desc("score"), "doc_id").limit(RRF_TOP_N)
    wb = Window.orderBy(F.desc("score"), "doc_id")
    btop = btop50.select("doc_id", F.row_number().over(wb).alias("rank_bm25"))

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    cscored = (
        e.crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine_expr("embedding", "q_emb"), 6).alias("cos"),
        )
    )
    ctop50 = cscored.orderBy(F.desc("cos"), "doc_id").limit(RRF_TOP_N)
    wc = Window.orderBy(F.desc("cos"), "doc_id")
    ctop = ctop50.select("doc_id", F.row_number().over(wc).alias("rank_cos"))

    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_bm25")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_cos")), F.lit(0.0))
    return (
        btop.join(ctop, "doc_id", "full_outer")
        .select("doc_id", "rank_bm25", "rank_cos", rrf.alias("rrf"))
        .orderBy(F.desc("rrf"), "doc_id")
        .limit(10)
    )
