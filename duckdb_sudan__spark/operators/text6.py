"""r7 third text wave: language-model-based quality scoring — the
CCNet/KenLM-style "score every document under a corpus LM and filter
the tail" stage that sits between rule gates (text_gopher_filters) and
learned classifiers (text_quality_classifier) in production pipelines.

Determinism: true cross-entropy needs log2(p) and JVM/glibc libm
disagree at the last ulp (measured, see text2.py header), so the score
here is the INTEGER bit-surprisal bitlen(c(w1)+V) - bitlen(c(w1,w2)+1)
— within 1 bit per term of the exact -log2 of the add-one-smoothed
bigram probability, monotone-equivalent for ranking/thresholding, and
bit-identical across engines because bitlen is computed on the binary
STRING representation (F.conv base-2 / printf('%b')), never through a
float log. The one emitted double is a single exact int/int division +
ROUND, repeated verbatim in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# text_perplexity_proxy — per-doc mean bigram bit-surprisal
# ---------------------------------------------------------------------------

PERPLEXITY_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE lang = 'en'
), bg AS (
  SELECT doc_id, t[s] AS w1, t[s+1] AS w2
  FROM (SELECT doc_id, t, unnest(generate_series(1, length(t) - 1)) AS s FROM toks)
), vocab AS (
  SELECT CAST(COUNT(DISTINCT w1) AS BIGINT) AS v FROM (
    SELECT w1 FROM bg UNION ALL SELECT w2 FROM bg
  )
), c12 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY w1, w2
), c1 AS (
  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1
), scored AS (
  SELECT bg.doc_id,
         length(printf('%b', c1.c1 + vocab.v)) - length(printf('%b', c12.c12 + 1)) AS bits
  FROM bg
  JOIN c12 ON bg.w1 = c12.w1 AND bg.w2 = c12.w2
  JOIN c1 ON bg.w1 = c1.w1
  CROSS JOIN vocab
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(bits) AS BIGINT) AS total_bits,
       ROUND(CAST(SUM(bits) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_bits
FROM scored
GROUP BY doc_id
ORDER BY doc_id
"""


def _bitlen(col):
    """floor(log2(n)) + 1 for positive bigints, via the base-2 string
    length — integer-exact, no float log anywhere."""
    return F.length(F.conv(col.cast("string"), 10, 2))


@register("text_perplexity_proxy", PERPLEXITY_ORACLE)
def text_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every English document under the corpus's own add-one-
    smoothed bigram LM: per-bigram surprisal approximated as
    bitlen(c(w1)+V) - bitlen(c(w1,w2)+1) bits (exact -log2 within one
    bit per term, see module header), aggregated to per-doc total and
    mean bits — the perplexity-filter stage of CCNet-style pipelines,
    where the score threshold separates fluent text from boilerplate
    and garble.

    Plan (r14): ONE corpus scan builds the per-doc bigram relation
    (map-side explode, no self-join — ngram_lm_counts' shape); the
    count table c12 partial-aggs off it, c1 AND the vocabulary scalar
    derive from c12 (a word is in the vocab iff it appears as w1 or
    w2 of some distinct bigram — the r13 shape re-ran the token-grain
    explode twice more for vocab's unionAll), and the per-bigram
    surprisal bits are computed ON THE COUNT TABLE before the score
    join, so bg pays ONE join that attaches a precomputed int per
    (w1, w2) instead of two joins plus per-row arithmetic. The score
    join's build side is the count table, never raw bigram pairs, so
    stopword-headed w1 skew is absorbed by the pre-aggregation; the
    per-doc rollup is a map-combinable doc-grain aggregate. (An
    alternative that pre-aggregates bg to (doc_id, w1, w2) grain was
    A/B-measured SLOWER at sf0.1 — the doc-bigram keys are nearly
    unique so that shuffle moves the full token-grain volume where
    this shape shuffles only combined doc-grain partials.) At 100 TB:
    one token-grain scan + count-grain shuffles + one map-combinable
    doc-grain shuffle; swapping bitlen for true log2 on a real
    cluster is a one-expression change."""
    d = load_table(spark, sf_dir, "documents").where(F.col("lang") == "en")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    bg = (
        toks.select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("s"),
            "t",
        )
        .select(
            "doc_id",
            F.element_at("t", F.col("s")).alias("w1"),
            F.element_at("t", F.col("s") + 1).alias("w2"),
        )
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # r15: c12 is consumed 3x (vocab, c1, the ctab join's left side) —
    # unpersisted, the token-grain scan+split+explode subtree compiled
    # once per consumer (5 copies in the r14 after-plan). Materialize
    # the count-grain table once (guide §2.4/§5): every reader scans
    # the materialized distinct-bigram rows, and the only remaining
    # token-grain subtree is bg's own scan feeding the score join.
    c12 = c12.localCheckpoint()
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    # r15: vocab via ONE explode over c12 instead of unionAll of two
    # projections — the unionAll-of-projections antipattern this repo
    # removed from threshold_sweep/degree_histogram in r14 (each union
    # branch pruned differently, so Catalyst compiled the c12 subtree
    # twice; guide §2.3). Same multiset of words, same distinct count.
    vocab = (
        c12.select(F.explode(F.array("w1", "w2")).alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )
    ctab = (
        c12.join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            (_bitlen(F.col("c1") + F.col("v")) - _bitlen(F.col("c12") + 1)).alias("bits"),
        )
    )
    scored = bg.join(ctab, ["w1", "w2"]).select("doc_id", "bits")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("bits").cast("bigint").alias("total_bits"),
            F.round(
                F.sum("bits").cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("mean_bits"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# corpus_perplexity_buckets — the filter decision the proxy feeds
# ---------------------------------------------------------------------------

PPL_BUCKETS = 4  # quartile buckets over mean_bits, CCNet's head/middle/tail +1

PPL_BUCKETS_ORACLE = f"""
WITH scored AS ({PERPLEXITY_ORACLE.replace("ORDER BY doc_id", "")}),
ranked AS (
  SELECT doc_id, n_bigrams, total_bits, mean_bits,
         ntile({PPL_BUCKETS}) OVER (ORDER BY mean_bits, doc_id) AS bucket
  FROM scored
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
       MIN(mean_bits) AS min_bits,
       MAX(mean_bits) AS max_bits
FROM ranked
GROUP BY bucket
ORDER BY bucket
"""


@register("corpus_perplexity_buckets", PPL_BUCKETS_ORACLE)
def corpus_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split, one bucket finer: quartile the
    corpus by mean bit-surprisal (ntile over (mean_bits, doc_id) — the
    doc_id tiebreak makes the split total-order deterministic) and
    report per-bucket doc and bigram mass — the relation a
    perplexity-filtered training mix samples from (keep head+middle,
    drop tail).

    Plan: the proxy's scoring plan plus ONE global ntile window over
    the per-doc score relation (docs-grain, far smaller than tokens)
    and a final 4-row aggregate. A global ORDER BY window is a single-
    partition sort of doc-grain scores; at 100 TB you'd swap ntile for
    approx quantile cutpoints (sketch_quantiles) — documented, not
    needed at test SF."""
    from pyspark.sql.window import Window

    scored = text_perplexity_proxy(spark, sf_dir)
    ranked = scored.select(
        "doc_id", "n_bigrams", "mean_bits",
        F.ntile(PPL_BUCKETS).over(Window.orderBy("mean_bits", "doc_id")).alias("bucket"),
    )
    return (
        ranked.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bigrams").cast("bigint").alias("n_bigrams"),
            F.min("mean_bits").alias("min_bits"),
            F.max("mean_bits").alias("max_bits"),
        )
        .select(F.col("bucket").cast("bigint").alias("bucket"), "n_docs", "n_bigrams", "min_bits", "max_bits")
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# dataset_split_train_valid — deterministic 3-way holdout split
# ---------------------------------------------------------------------------

SPLIT_VALID_PCT = 1  # % to valid
SPLIT_TEST_PCT = 1   # % to test; rest is train

SPLIT_ORACLE = f"""
WITH assigned AS (
  SELECT source, lang,
         CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 4) AS INTEGER) % 100 AS BIGINT) AS bucket,
         length(string_split(text, ' ')) AS n_toks
  FROM documents
)
SELECT source,
       CASE WHEN bucket < {SPLIT_VALID_PCT} THEN 'valid'
            WHEN bucket < {SPLIT_VALID_PCT + SPLIT_TEST_PCT} THEN 'test'
            ELSE 'train' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS n_tokens
FROM assigned
GROUP BY source, split
ORDER BY source, split
"""


@register("dataset_split_train_valid", SPLIT_ORACLE)
def dataset_split_train_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test holdout: md5(doc_id || ':split')
    mod 100 buckets, first 1% valid / next 1% test — the assignment is
    content- and cluster-size-independent, so re-running the pipeline
    after adding data NEVER moves an old document across splits (the
    leakage-safety property random splits lose). The ':split' salt
    decorrelates from every other md5 assignment in the repo (shards,
    A/B variants, samplers). Pure map + one partial-agg shuffle to the
    (source, split) manifest."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":split"))), 1, 4),
            16, 10,
        ).cast("bigint") % 100
    )
    split = (
        F.when(bucket < SPLIT_VALID_PCT, "valid")
        .when(bucket < SPLIT_VALID_PCT + SPLIT_TEST_PCT, "test")
        .otherwise("train")
    )
    return (
        d.select(
            "source", split.alias("split"), F.size(F.split("text", " ")).alias("n_toks")
        )
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
        )
        .orderBy("source", "split")
    )


# ---------------------------------------------------------------------------
# corpus_zipf_fit — Zipf law fit of the per-language frequency curve
# ---------------------------------------------------------------------------
# The corpus-health diagnostic tokenizer teams run first: rank tokens
# by frequency and fit log(freq) ~ -s·log(rank); natural text gives
# s ≈ 1, boilerplate/spam corpora bend the curve. Determinism: libm
# logs diverge across engines at the last ulp (text2.py header), so
# BOTH axes use the integer bit-length log2 (bitlen = floor(log2)+1 —
# the same quantization text_perplexity_proxy rides), and the OLS
# slope/intercept derive from DECIMAL-exact integer moments through
# the identical IEEE double sequence (agg_regression's recipe). The
# slope is the Zipf exponent in bit-space (quantized, monotone in the
# true exponent — the ranking/thresholding semantics survive).

ZIPF_MAX_RANK = 1024

ZIPF_FIT_ORACLE = f"""
WITH counts AS (
  SELECT lang, t.token AS token, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents,
       UNNEST(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '')) AS t(token)
  GROUP BY lang, t.token
), ranked AS (
  SELECT lang, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rnk
  FROM counts
), pts AS (
  SELECT lang,
         CAST(length(printf('%b', rnk)) AS BIGINT) AS x,
         CAST(length(printf('%b', n)) AS BIGINT) AS y
  FROM ranked WHERE rnk <= {ZIPF_MAX_RANK}
), m AS (
  SELECT lang, COUNT(*) AS cnt,
         SUM(CAST(x AS DECIMAL(38,0)))     AS sx,
         SUM(CAST(y AS DECIMAL(38,0)))     AS sy,
         SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx,
         SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy
  FROM pts GROUP BY lang
)
SELECT lang, CAST(cnt AS BIGINT) AS n_terms,
       (CAST(cnt AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(cnt AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         AS slope_bits,
       (CAST(sy AS DOUBLE)
        - ((CAST(cnt AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(cnt AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
          * CAST(sx AS DOUBLE))
         / CAST(cnt AS DOUBLE)
         AS intercept_bits
FROM m
ORDER BY lang
"""


@register("corpus_zipf_fit", ZIPF_FIT_ORACLE)
def corpus_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Zipf slope/intercept in bitlen-log2 space over the
    top-ZIPF_MAX_RANK ranks. Plan: one (lang, token) partial-agg
    shuffle; the rank window and the moment aggregate run on the
    vocabulary relation; the fact table is scanned once."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(
            "lang",
            F.explode(
                F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
            ).alias("token"),
        )
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), "token")
    pts = (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= ZIPF_MAX_RANK)
        .select(
            "lang",
            _bitlen(F.col("rnk")).cast("bigint").alias("x"),
            _bitlen(F.col("n")).cast("bigint").alias("y"),
        )
    )
    m = pts.groupBy("lang").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
    )
    cnt_d = F.col("cnt").cast("double")
    sx_d, sy_d = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx_d, sxy_d = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    slope = (cnt_d * sxy_d - sx_d * sy_d) / (cnt_d * sxx_d - sx_d * sx_d)
    return m.select(
        "lang",
        F.col("cnt").cast("bigint").alias("n_terms"),
        slope.alias("slope_bits"),
        ((sy_d - slope * sx_d) / cnt_d).alias("intercept_bits"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# sample_exact_stratified — EXACT per-stratum sample sizes
# ---------------------------------------------------------------------------
# sample_hash_stratified selects a hash band (expected 10.2%, binomial
# jitter per stratum); dataset builders that must hit quota EXACTLY
# (eval sets, per-language caps) instead rank by a deterministic hash
# and cut at ⌈n/5⌉ — zero variance, still reproducible on any engine
# or cluster size, and the selected set is stable under corpus
# re-partitioning (the hash order is data-derived, not task-derived).

SAMPLE_EXACT_FRAC_DEN = 5  # 20%

SAMPLE_EXACT_ORACLE = f"""
WITH ranked AS (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk,
         COUNT(*) OVER (PARTITION BY lang) AS n_docs
  FROM documents
)
SELECT lang, doc_id, CAST(rnk AS BIGINT) AS rnk,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST((n_docs + {SAMPLE_EXACT_FRAC_DEN - 1}) // {SAMPLE_EXACT_FRAC_DEN} AS BIGINT) AS k_sample
FROM ranked
WHERE rnk <= (n_docs + {SAMPLE_EXACT_FRAC_DEN - 1}) // {SAMPLE_EXACT_FRAC_DEN}
ORDER BY lang, rnk
"""


SLICE_HEX = 3  # slice id = first 3 hex chars of h → 4096 h-ordered slices/lang


@register("sample_exact_stratified", SAMPLE_EXACT_ORACLE)
def sample_exact_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly ⌈n_lang/5⌉ docs per language, chosen by md5 rank
    (integer ceiling (n+4)/5 — no fp fraction anywhere), computed as
    the classic DISTRIBUTED rank so no task ever holds a whole
    stratum (the r8 verdict's scale-killer: row_number over
    partitionBy(lang) funnels every 'en' doc to one reducer at
    100 TB). Slices are CONTENT-DERIVED: slice = the first SLICE_HEX
    hex chars of h, so (a) slice order IS coarse h order within a
    language (fixed-width lowercase-hex prefix ⟹ slice_a < slice_b
    ⟺ every h in a < every h in b), and (b) both consumers recompute
    the IDENTICAL slice assignment from the row alone — replacing
    the r9 cache pin (spark_partition_id over repartitionByRange had
    to be cached so the two consumers saw one materialization; at
    real scale that cache is TB-sized — r9 verdict item 6). Shape:
    (1) per-(slice, lang) counts — a ≤4096×langs relation — get the
    per-lang prefix-sum offset and total via windows over that TINY
    relation; (2) local row_number within (slice, lang) — md5 is
    uniform, so a slice holds ~n_lang/4096 docs — plus the broadcast
    offset is the global rank, matching the oracle's single-window
    form exactly. Two column-pruned scans replace scan+cache."""
    from pyspark.sql.window import Window

    den = SAMPLE_EXACT_FRAC_DEN
    d = load_table(spark, sf_dir, "documents")
    parts = d.select(
        "lang", "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
    ).withColumn("slice", F.substring("h", 1, SLICE_HEX))
    cnts = parts.groupBy("slice", "lang").agg(F.count(F.lit(1)).alias("c"))
    woff = (
        Window.partitionBy("lang")
        .orderBy("slice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = cnts.select(
        "slice",
        "lang",
        F.coalesce(F.sum("c").over(woff), F.lit(0)).alias("off"),
        F.sum("c").over(Window.partitionBy("lang")).alias("n_docs"),
    )
    wloc = Window.partitionBy("slice", "lang").orderBy("h", "doc_id")
    k = ((F.col("n_docs") + (den - 1)) / den).cast("bigint")
    return (
        parts.withColumn("lrnk", F.row_number().over(wloc))
        .join(F.broadcast(offs), ["slice", "lang"])
        .where((F.col("off") + F.col("lrnk")) <= k)
        .select(
            "lang",
            "doc_id",
            (F.col("off") + F.col("lrnk")).cast("bigint").alias("rnk"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            k.alias("k_sample"),
        )
        .orderBy("lang", "rnk")
    )


# ---------------------------------------------------------------------------
# corpus_bigram_entropy_bits — per-language bigram-distribution entropy
# ---------------------------------------------------------------------------
# The corpus-diversity number next to Zipf slope on a dataset card:
# Shannon entropy of each language's word-BIGRAM distribution, in the
# repo's integer bitlen-log2 form (agg_entropy_bits' idiom lifted from
# the source-mix grain to the token grain). High entropy = varied
# combinations; low = templated/boilerplate text. All bigint until the
# final mean division.

BIGRAM_ENTROPY_ORACLE = """
WITH toks AS (
  SELECT lang, string_split(text, ' ') AS t FROM documents
), bg AS (
  SELECT lang, t[s] || ' ' || t[s+1] AS bg
  FROM (SELECT lang, t, unnest(generate_series(1, length(t) - 1)) AS s FROM toks)
), c AS (
  SELECT lang, bg, CAST(COUNT(*) AS BIGINT) AS cnt FROM bg GROUP BY lang, bg
), agg AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(cnt) AS BIGINT) AS total,
         CAST(SUM(cnt * length(printf('%b', cnt))) AS BIGINT) AS sum_cnt_bits
  FROM c GROUP BY lang
)
SELECT lang, n_bigrams, total,
       CAST(total * length(printf('%b', total)) - sum_cnt_bits AS BIGINT) AS entropy_scaled_bits,
       ROUND(CAST(total * length(printf('%b', total)) - sum_cnt_bits AS DOUBLE)
             / CAST(total AS DOUBLE), 6) AS mean_bits
FROM agg
ORDER BY lang
"""


@register("corpus_bigram_entropy_bits", BIGRAM_ENTROPY_ORACLE)
def corpus_bigram_entropy_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang bigram entropy: entropy_scaled_bits = total·bitlen(
    total) − Σ cnt·bitlen(cnt) over the (lang, bigram) count table —
    within 1 bit/term of true -Σ p·log2 p scaled by total, and
    bit-identical across engines (no float log). Plan: one token-grain
    map-side explode (docs with < 2 tokens are filtered BEFORE the
    sequence — Spark's sequence(1, 0) counts down, DuckDB's
    generate_series(1, 0) is empty; same guard as dedup_chunk_exact),
    one (lang, bigram) partial-agg shuffle, one lang-grain rollup that
    rides the same exchange family. The fact table is scanned once."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("lang", F.split("text", " ").alias("t")).where(F.size("t") >= 2)
    bg = toks.select(
        "lang",
        F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("s"),
        "t",
    ).select(
        "lang",
        F.concat_ws(
            " ", F.element_at("t", F.col("s")), F.element_at("t", F.col("s") + 1)
        ).alias("bg"),
    )
    c = bg.groupBy("lang", "bg").agg(F.count(F.lit(1)).alias("cnt"))
    agg = c.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("cnt").cast("bigint").alias("total"),
        F.sum(F.col("cnt") * F.length(F.conv(F.col("cnt").cast("string"), 10, 2)))
        .cast("bigint")
        .alias("sum_cnt_bits"),
    )
    scaled = (
        F.col("total") * F.length(F.conv(F.col("total").cast("string"), 10, 2)).cast("bigint")
        - F.col("sum_cnt_bits")
    )
    return agg.select(
        "lang",
        "n_bigrams",
        "total",
        scaled.cast("bigint").alias("entropy_scaled_bits"),
        F.round(scaled.cast("double") / F.col("total").cast("double"), 6).alias("mean_bits"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# sample_soft_dedup_weights — downweight duplicates instead of dropping
# ---------------------------------------------------------------------------
# The soft alternative to dedup_exact's keep-canonical: every copy
# survives with weight 1/n_copies, so the training mix preserves
# coverage while each duplicated CONTENT contributes exactly one unit
# of mass (the "soft dedup" used when provenance must be kept).
# Weight in exact ppm (1e6 // n_copies — floor div on positives);
# per-lang rollup reports raw vs effective counts and the mass saved.
# Same BOW fingerprint as dedup_exact (one shuffle on fp, window
# bounded by copy-group size, then a map-combined lang rollup).

from duckdb_sudan__spark.operators.text import SQL_BOW_FP, bow_fingerprint_expr  # noqa: E402

SOFT_DEDUP_ORACLE = f"""
WITH fp AS (
  SELECT doc_id, lang, {SQL_BOW_FP} AS fp FROM documents
), w AS (
  SELECT lang, CAST(1000000 // COUNT(*) OVER (PARTITION BY fp) AS BIGINT) AS w_ppm
  FROM fp
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS raw_n,
       CAST(SUM(w_ppm) AS BIGINT) AS effective_mass_ppm,
       CAST(1000000 - SUM(w_ppm) // COUNT(*) AS BIGINT) AS mass_saved_ppm_per_doc
FROM w GROUP BY lang ORDER BY lang
"""


@register("sample_soft_dedup_weights", SOFT_DEDUP_ORACLE)
def sample_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    fp = d.select("doc_id", "lang", bow_fingerprint_expr().alias("fp"))
    wfp = Window.partitionBy("fp")
    w = fp.select(
        "lang",
        F.expr("1000000").cast("bigint").alias("m"),
        F.count(F.lit(1)).over(wfp).cast("bigint").alias("n_copies"),
    ).selectExpr("lang", "cast(m div n_copies as bigint) AS w_ppm")
    return (
        w.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("raw_n"),
            F.sum("w_ppm").cast("bigint").alias("effective_mass_ppm"),
        )
        .selectExpr(
            "lang", "raw_n", "effective_mass_ppm",
            "cast(1000000 - effective_mass_ppm div raw_n as bigint)"
            " AS mass_saved_ppm_per_doc",
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# pipeline_data_card — the dataset-card summary table in one pass
# ---------------------------------------------------------------------------
# The per-language table a dataset card publishes: volume (docs,
# whitespace tokens, chars), exact-duplicate rate, and mean rule-based
# quality — all from ONE scan + the fp window. Quality is the oracled
# text_quality expression quantized per doc to exact ppm (round of an
# identical double on both engines), so the SUM is integer-exact at
# any row count and the mean is one terminal floor division.

from duckdb_sudan__spark.operators.text import (  # noqa: E402
    _sql_n_tokens,
    _sql_quality_inline,
    n_tokens_expr,
    punct_ratio_expr,
    quality_blend,
    stop_ratio_expr,
)

DATA_CARD_ORACLE = f"""
WITH per_doc AS (
  SELECT lang,
         CAST({_sql_n_tokens()} AS BIGINT) AS n_tokens,
         CAST(length(text) AS BIGINT) AS n_chars,
         COUNT(*) OVER (PARTITION BY {SQL_BOW_FP}) > 1 AS is_dup,
         CAST(round(({_sql_quality_inline()}) * 1000000) AS BIGINT) AS q_ppm
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(COUNT(*) FILTER (is_dup) AS BIGINT) AS n_dup_docs,
       CAST(1000000 * COUNT(*) FILTER (is_dup) // COUNT(*) AS BIGINT) AS dup_rate_ppm,
       CAST(SUM(q_ppm) // COUNT(*) AS BIGINT) AS mean_quality_ppm
FROM per_doc GROUP BY lang ORDER BY lang
"""


@register("pipeline_data_card", DATA_CARD_ORACLE)
def pipeline_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    n_tok = n_tokens_expr()
    quality = quality_blend(n_tok, punct_ratio_expr(), stop_ratio_expr())
    wfp = Window.partitionBy(bow_fingerprint_expr())
    per_doc = d.select(
        "lang",
        n_tok.cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        (F.count(F.lit(1)).over(wfp) > 1).alias("is_dup"),
        F.round(quality * 1000000).cast("bigint").alias("q_ppm"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.count_if(F.col("is_dup")).cast("bigint").alias("n_dup_docs"),
            F.sum("q_ppm").cast("bigint").alias("sum_q"),
        )
        .selectExpr(
            "lang", "n_docs", "total_tokens", "total_chars", "n_dup_docs",
            "cast(1000000 * n_dup_docs div n_docs as bigint) AS dup_rate_ppm",
            "cast(sum_q div n_docs as bigint) AS mean_quality_ppm",
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# dedup_source_priority — governance-aware canonical selection
# ---------------------------------------------------------------------------
# When duplicates span SOURCES, "keep the lowest doc_id" is wrong
# governance: licensed/cleaner feeds must win. Canonical per exact-dup
# cluster = argmin by (source priority, doc_id) — priority here is
# the source's numeric suffix (src0 outranks src19), standing in for
# the license/quality rank a real pipeline configures. Readout per
# source: docs, kept, dropped, keep-rate ppm — the provenance audit a
# data-governance review asks for. Same fp shuffle as dedup_exact;
# the argmin rides one min_by-style struct ordering window.

SOURCE_PRIORITY_ORACLE = f"""
WITH fp AS (
  SELECT doc_id, source,
         CAST(substr(source, 4) AS BIGINT) AS prio,
         {SQL_BOW_FP} AS fp
  FROM documents
), marked AS (
  SELECT source,
         (prio, doc_id) = MIN((prio, doc_id)) OVER (PARTITION BY fp) AS kept
  FROM fp
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (kept) AS BIGINT) AS n_kept,
       CAST(COUNT(*) FILTER (NOT kept) AS BIGINT) AS n_dropped,
       CAST(1000000 * COUNT(*) FILTER (kept) // COUNT(*) AS BIGINT) AS keep_rate_ppm
FROM marked GROUP BY source ORDER BY source
"""


@register("dedup_source_priority", SOURCE_PRIORITY_ORACLE)
def dedup_source_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id", "source",
        F.substring("source", 4, 10).cast("bigint").alias("prio"),
        bow_fingerprint_expr().alias("fp"),
    )
    wfp = Window.partitionBy("fp")
    winner = F.min(F.struct("prio", "doc_id")).over(wfp)
    marked = fp.select(
        "source",
        (F.struct("prio", "doc_id") == winner).alias("kept"),
    )
    return (
        marked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_if(F.col("kept")).cast("bigint").alias("n_kept"),
            F.count_if(~F.col("kept")).cast("bigint").alias("n_dropped"),
        )
        .selectExpr(
            "source", "n_docs", "n_kept", "n_dropped",
            "cast(1000000 * n_kept div n_docs as bigint) AS keep_rate_ppm",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# text_charclass_profile — character-class composition per language
# ---------------------------------------------------------------------------
# The encoding/noise screen a web-corpus intake runs per shard: what
# share of characters are letters / digits / spaces / punctuation?
# Explicit character classes only (never \\s / \\w — Java and RE2
# class membership differs at the edges, the r10 tokenizer rule);
# exact integer counts through the shuffle, shares in exact ppm.

CHARCLASS_ORACLE = """
WITH per_doc AS (
  SELECT lang,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit,
         CAST(len(regexp_extract_all(text, '[ ]')) AS BIGINT) AS n_space
  FROM documents
)
SELECT lang,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(1000000 * SUM(n_alpha) // NULLIF(SUM(n_chars), 0) AS BIGINT) AS alpha_ppm,
       CAST(1000000 * SUM(n_digit) // NULLIF(SUM(n_chars), 0) AS BIGINT) AS digit_ppm,
       CAST(1000000 * SUM(n_space) // NULLIF(SUM(n_chars), 0) AS BIGINT) AS space_ppm,
       CAST(1000000 * (SUM(n_chars) - SUM(n_alpha) - SUM(n_digit) - SUM(n_space))
            // NULLIF(SUM(n_chars), 0) AS BIGINT) AS other_ppm
FROM per_doc GROUP BY lang ORDER BY lang
"""


@register("text_charclass_profile", CHARCLASS_ORACLE)
def text_charclass_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "lang",
        F.length("text").cast("bigint").alias("n_chars"),
        F.regexp_count("text", F.lit("[A-Za-z]")).cast("bigint").alias("n_alpha"),
        F.regexp_count("text", F.lit("[0-9]")).cast("bigint").alias("n_digit"),
        F.regexp_count("text", F.lit("[ ]")).cast("bigint").alias("n_space"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("n_alpha").cast("bigint").alias("sa"),
            F.sum("n_digit").cast("bigint").alias("sd"),
            F.sum("n_space").cast("bigint").alias("ss"),
        )
        .selectExpr(
            "lang", "total_chars",
            "cast(1000000 * sa div nullif(total_chars, 0) as bigint) AS alpha_ppm",
            "cast(1000000 * sd div nullif(total_chars, 0) as bigint) AS digit_ppm",
            "cast(1000000 * ss div nullif(total_chars, 0) as bigint) AS space_ppm",
            "cast(1000000 * (total_chars - sa - sd - ss)"
            " div nullif(total_chars, 0) as bigint) AS other_ppm",
        )
        .orderBy("lang")
    )
