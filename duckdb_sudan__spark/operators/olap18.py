"""r10 wave: ML-evaluation metrics + audience analytics.

The training-data engine's missing back half: once a pipeline selects,
dedups, and scores data, its owners evaluate MODELS over it — confusion
matrices, calibration, KS separation, lift-style cohort splits — and
the reference's analysts run the same shapes over indicator data. Every
entry follows the repo's determinism conventions: counts and ppm ratios
in pure integer arithmetic (`1000000 * a // b`, overflow-safe), exact
DECIMAL(38,0) moment sums for anything that multiplies, doubles only as
final closed-form expressions running the SAME IEEE op sequence as the
oracle (agg_regression's idiom, olap5.py:110).

Scale notes (100 TB): every entry aggregates the fact table into a
BOUNDED relation first (single row / 10 bins / 1000 bins / days /
langs²) with map-side combine; windows only ever run over those bounded
relations, never over the raw table (the sample_exact_stratified rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# ml_confusion_matrix — binary-classifier cells + derived rates, one row
# ---------------------------------------------------------------------------
# Ground truth: the event is a purchase. Prediction: value >= τ (the
# simplest value-threshold classifier — the point is the exact cell
# arithmetic, not the model). All four cells are map-combinable
# count_ifs: ONE scan, one 1-row aggregate, rates in integer ppm so no
# float ever reaches the hash. f1 derives from the ppm integers
# (2·p·r // (p+r) — max 2e12, no overflow).

CONFUSION_TAU = 50.0

CONFUSION_ORACLE = f"""
WITH cells AS (
  SELECT
    CAST(COUNT(*) FILTER (event_type = 'purchase' AND value >= {CONFUSION_TAU}) AS BIGINT) AS tp,
    CAST(COUNT(*) FILTER (event_type <> 'purchase' AND value >= {CONFUSION_TAU}) AS BIGINT) AS fp,
    CAST(COUNT(*) FILTER (event_type = 'purchase' AND value < {CONFUSION_TAU}) AS BIGINT) AS fn,
    CAST(COUNT(*) FILTER (event_type <> 'purchase' AND value < {CONFUSION_TAU}) AS BIGINT) AS tn
  FROM events
)
SELECT tp, fp, fn, tn,
       1000000 * (tp + tn) // NULLIF(tp + fp + fn + tn, 0) AS accuracy_ppm,
       1000000 * tp // NULLIF(tp + fp, 0) AS precision_ppm,
       1000000 * tp // NULLIF(tp + fn, 0) AS recall_ppm,
       2 * (1000000 * tp // NULLIF(tp + fp, 0)) * (1000000 * tp // NULLIF(tp + fn, 0))
         // NULLIF((1000000 * tp // NULLIF(tp + fp, 0)) + (1000000 * tp // NULLIF(tp + fn, 0)), 0)
         AS f1_ppm
FROM cells
"""


@register("ml_confusion_matrix", CONFUSION_ORACLE)
def ml_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    pos = F.col("event_type") == "purchase"
    pred = F.col("value") >= CONFUSION_TAU

    def cnt(cond, alias):
        return F.count_if(cond).cast("bigint").alias(alias)

    cells = e.agg(
        cnt(pos & pred, "tp"),
        cnt(~pos & pred, "fp"),
        cnt(pos & ~pred, "fn"),
        cnt(~pos & ~pred, "tn"),
    )
    return cells.selectExpr(
        "tp", "fp", "fn", "tn",
        "1000000 * (tp + tn) div nullif(tp + fp + fn + tn, 0) AS accuracy_ppm",
        "1000000 * tp div nullif(tp + fp, 0) AS precision_ppm",
        "1000000 * tp div nullif(tp + fn, 0) AS recall_ppm",
        "2 * (1000000 * tp div nullif(tp + fp, 0)) * (1000000 * tp div nullif(tp + fn, 0))"
        " div nullif((1000000 * tp div nullif(tp + fp, 0)) + (1000000 * tp div nullif(tp + fn, 0)), 0)"
        " AS f1_ppm",
    )


# ---------------------------------------------------------------------------
# ml_calibration_bins — observed positive rate per score bin
# ---------------------------------------------------------------------------
# The reliability-diagram table: fixed-width score bins (closed domain
# — no data-dependent quantiles, so the groupBy has ≤10 keys and
# map-side combine collapses each task to ≤10 rows regardless of SF),
# per-bin support, positive rate in ppm, and the exact cents sum for
# downstream mean-score derivation.

CALIB_BIN_WIDTH = 50.0
CALIB_BINS = 10

CALIBRATION_ORACLE = f"""
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_pos,
       1000000 * COUNT(*) FILTER (event_type = 'purchase') // COUNT(*) AS pos_rate_ppm,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM (
  SELECT event_type, value,
         CAST(least({CALIB_BINS - 1}, floor(value / {CALIB_BIN_WIDTH})) AS INTEGER) AS bin
  FROM events
)
GROUP BY bin
ORDER BY bin
"""


@register("ml_calibration_bins", CALIBRATION_ORACLE)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bin_ = F.least(
        F.lit(CALIB_BINS - 1), F.floor(F.col("value") / CALIB_BIN_WIDTH)
    ).cast("int")
    return (
        e.select("event_type", "value", bin_.alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count_if(F.col("event_type") == "purchase").cast("bigint").alias("n_pos"),
            F.expr(
                "1000000 * count_if(event_type = 'purchase') div count(*)"
            ).alias("pos_rate_ppm"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("sum_value_cents"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# ml_ks_binned — Kolmogorov–Smirnov separation over a bounded bin grid
# ---------------------------------------------------------------------------
# KS over the RAW score column needs a global sort — a single-reducer
# window at 100 TB. The production form bins scores first (1000
# fixed-width bins: the KS of the binned CDFs lower-bounds the true KS
# within 1/bins of CDF resolution) so the cumulative window runs over
# a ≤1000-row relation. The CDF difference is computed in DOUBLE from
# exact bigint cumulative counts — division and subtraction are
# correctly-rounded IEEE ops, identical on both engines — and the
# statistic row is picked by (diff DESC, bin ASC) rank, so ties break
# deterministically.

KS_BINS = 1000
KS_BIN_SCALE = 2.0  # value domain [0, 500) → bin = floor(value * 2)

KS_ORACLE = f"""
WITH binned AS (
  SELECT CAST(least({KS_BINS - 1}, floor(value * {KS_BIN_SCALE})) AS INTEGER) AS bin,
         CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS np,
         CAST(COUNT(*) FILTER (event_type <> 'purchase') AS BIGINT) AS nn
  FROM events
  GROUP BY 1
), cum AS (
  SELECT bin,
         SUM(np) OVER (ORDER BY bin) AS cp,
         SUM(nn) OVER (ORDER BY bin) AS cn,
         SUM(np) OVER () AS p,
         SUM(nn) OVER () AS n
  FROM binned
), diffs AS (
  SELECT bin,
         abs(CAST(cp AS DOUBLE) / CAST(p AS DOUBLE)
             - CAST(cn AS DOUBLE) / CAST(n AS DOUBLE)) AS d,
         CAST(p AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg
  FROM cum
)
SELECT d AS ks_stat, bin AS ks_bin, n_pos, n_neg
FROM (SELECT *, row_number() OVER (ORDER BY d DESC, bin) AS rn FROM diffs)
WHERE rn = 1
"""


@register("ml_ks_binned", KS_ORACLE)
def ml_ks_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bin_ = F.least(
        F.lit(KS_BINS - 1), F.floor(F.col("value") * KS_BIN_SCALE)
    ).cast("int")
    binned = (
        e.select((F.col("event_type") == "purchase").alias("pos"), bin_.alias("bin"))
        .groupBy("bin")
        .agg(
            F.count_if(F.col("pos")).cast("bigint").alias("np"),
            F.count_if(~F.col("pos")).cast("bigint").alias("nn"),
        )
    )
    # windows over the ≤KS_BINS-row aggregate only (bounded relation)
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = binned.select(
        "bin",
        F.sum("np").over(wcum).alias("cp"),
        F.sum("nn").over(wcum).alias("cn"),
        F.sum("np").over(wall).alias("p"),
        F.sum("nn").over(wall).alias("n"),
    )
    diffs = cum.select(
        "bin",
        F.abs(
            F.col("cp").cast("double") / F.col("p").cast("double")
            - F.col("cn").cast("double") / F.col("n").cast("double")
        ).alias("d"),
        F.col("p").cast("bigint").alias("n_pos"),
        F.col("n").cast("bigint").alias("n_neg"),
    )
    wrank = Window.orderBy(F.desc("d"), "bin")
    return (
        diffs.withColumn("rn", F.row_number().over(wrank))
        .where(F.col("rn") == 1)
        .select(F.col("d").alias("ks_stat"), F.col("bin").alias("ks_bin"), "n_pos", "n_neg")
    )


# ---------------------------------------------------------------------------
# ev_new_vs_returning — daily active split by first-seen cohort
# ---------------------------------------------------------------------------
# The growth-dashboard primitive: per day, how many active users are
# NEW (first-ever activity that day) vs returning. Shape: distinct
# (user, day) → per-user min(day) (map-combinable, one shuffle on
# user) → equi-join back on user → per-day counts. No window touches
# the raw table; the day grain is calendar-bounded.

NEW_RETURNING_ORACLE = """
WITH du AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events
), firsts AS (
  SELECT user_id, MIN(day) AS first_day FROM du GROUP BY user_id
)
SELECT du.day,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(COUNT(*) FILTER (du.day = f.first_day) AS BIGINT) AS n_new,
       CAST(COUNT(*) FILTER (du.day <> f.first_day) AS BIGINT) AS n_returning
FROM du JOIN firsts f ON du.user_id = f.user_id
GROUP BY du.day
ORDER BY du.day
"""


@register("ev_new_vs_returning", NEW_RETURNING_ORACLE)
def ev_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    du = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    firsts = du.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        du.join(firsts, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_active"),
            F.count_if(F.col("day") == F.col("first_day")).cast("bigint").alias("n_new"),
            F.count_if(F.col("day") != F.col("first_day"))
            .cast("bigint")
            .alias("n_returning"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# ts_autocorr_daily — autocorrelation of daily revenue at lags 1..7
# ---------------------------------------------------------------------------
# Weekly-seasonality detector. Day keys are epoch-day INTEGERS (the
# memory-safe cross-engine form — no weekday()/interval semantics),
# revenue is exact cents; the lag pairing is an equi-join of the tiny
# daily relation against itself shifted by k (broadcast 7-row lag
# list), and Pearson r derives from DECIMAL(38,0)-exact moment sums in
# the agg_regression idiom — cents cast to DECIMAL(19,0) BEFORE the
# product so no intermediate ever overflows int64 even at 100 TB daily
# revenue. Windows: none over the raw table; the daily relation is
# calendar-bounded.

AUTOCORR_MAX_LAG = 7

_AC_DAILY = """
  SELECT CAST(CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01' AS INTEGER) AS day_num,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM events WHERE event_type = 'purchase' GROUP BY 1
"""

AUTOCORR_ORACLE = f"""
WITH daily AS ({_AC_DAILY}),
lags AS (SELECT UNNEST(range(1, {AUTOCORR_MAX_LAG + 1})) AS lag_k),
pairs AS (
  SELECT l.lag_k, a.rev_cents AS x, b.rev_cents AS y
  FROM daily a JOIN lags l ON TRUE
  JOIN daily b ON b.day_num = a.day_num + l.lag_k
), m AS (
  SELECT lag_k,
         COUNT(*) AS n,
         SUM(CAST(x AS DECIMAL(38,0))) AS sx,
         SUM(CAST(y AS DECIMAL(38,0))) AS sy,
         SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy,
         SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
         SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS syy
  FROM pairs GROUP BY lag_k
)
SELECT CAST(lag_k AS INTEGER) AS lag_k, CAST(n AS BIGINT) AS n_pairs,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       AS autocorr
FROM m
ORDER BY lag_k
"""


@register("ts_autocorr_daily", AUTOCORR_ORACLE)
def ts_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.where(F.col("event_type") == "purchase")
        .groupBy(
            F.datediff(F.date_trunc("day", F.col("ts")), F.lit("1970-01-01").cast("date"))
            .cast("int")
            .alias("day_num")
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint").alias("rev_cents"))
    )
    lags = spark.range(1, AUTOCORR_MAX_LAG + 1).select(F.col("id").cast("int").alias("lag_k"))
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("b.day_num") == F.col("a.day_num") + F.col("lag_k"))
        .select("lag_k", F.col("a.rev_cents").alias("x"), F.col("b.rev_cents").alias("y"))
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    m = pairs.groupBy("lag_k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(d19("x") * d19("y")).alias("sxy"),
        F.sum(d19("x") * d19("x")).alias("sxx"),
        F.sum(d19("y") * d19("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (F.col(c).cast("double") for c in ("sxy", "sxx", "syy"))
    return m.select(
        F.col("lag_k").cast("int").alias("lag_k"),
        F.col("n").cast("bigint").alias("n_pairs"),
        ((nd * sxy - sx * sy) / F.sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy))).alias(
            "autocorr"
        ),
    ).orderBy("lag_k")


# ---------------------------------------------------------------------------
# ev_markov_prediction_accuracy — next-event prediction readout
# ---------------------------------------------------------------------------
# The eval half of ev_transition_matrix (olap5.py:322): predict each
# transition's next event as the argmax next-type of its prev-type
# (tie → lexicographically smallest, so the predictor is
# deterministic), and report IN-SAMPLE accuracy per prev-type in
# exact integer ppm. Shape: the transition-pair aggregate (≤|types|²
# rows) is built once; the predictor is a rank-1 row per prev over
# that tiny relation; scoring is a join of the pair counts against
# the ≤|types|-row predictor — the fact table pays exactly the one
# user_id lag shuffle + one pair-grain shuffle, nothing else.

MARKOV_PRED_ORACLE = """
WITH seq AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events
), pairs AS (
  SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
), pred AS (
  SELECT prev_type, next_type AS predicted_type
  FROM (SELECT *, row_number() OVER (PARTITION BY prev_type
                                     ORDER BY cnt DESC, next_type) AS rn FROM pairs)
  WHERE rn = 1
)
SELECT p.prev_type, pr.predicted_type,
       CAST(SUM(p.cnt) AS BIGINT) AS n_transitions,
       CAST(SUM(p.cnt) FILTER (p.next_type = pr.predicted_type) AS BIGINT) AS n_correct,
       CAST(1000000 * SUM(p.cnt) FILTER (p.next_type = pr.predicted_type)
            // SUM(p.cnt) AS BIGINT) AS accuracy_ppm
FROM pairs p JOIN pred pr ON p.prev_type = pr.prev_type
GROUP BY p.prev_type, pr.predicted_type
ORDER BY p.prev_type
"""


@register("ev_markov_prediction_accuracy", MARKOV_PRED_ORACLE)
def ev_markov_prediction_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    wr = Window.partitionBy("prev_type").orderBy(F.desc("cnt"), "next_type")
    pred = (
        pairs.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select("prev_type", F.col("next_type").alias("predicted_type"))
    )
    return (
        pairs.join(F.broadcast(pred), "prev_type")
        .groupBy("prev_type", "predicted_type")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_transitions"),
            F.sum(F.when(F.col("next_type") == F.col("predicted_type"), F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("n_correct"),
            F.expr(
                "cast(1000000 * sum(case when next_type = predicted_type then cnt else 0 end)"
                " div sum(cnt) as bigint)"
            ).alias("accuracy_ppm"),
        )
        .orderBy("prev_type")
    )


# ---------------------------------------------------------------------------
# agg_bitmap_distinct — EXACT distinct counting via mergeable bitmaps
# ---------------------------------------------------------------------------
# The bitmap-index pattern (roaring-bitmap-lite on dense int keys):
# instead of shuffling raw user_ids into a COUNT(DISTINCT) (a full
# repartition of the fact's key column), each task OR-folds user
# presence into 63-bit chunk masks — bucket = user_id div 63, bit =
# user_id mod 63 (63 keeps every mask positive: bit 63 would need the
# sign bit, which DuckDB's << overflow rules reject) — so the shuffle
# carries only (type, bucket, mask) rows bounded by the KEY DOMAIN
# /63, not the event count, and bit_or partial-aggregates map-side.
# popcount(mask) sums recover the EXACT distinct count (verified in
# the same row against count(distinct)). This is the mergeable exact
# complement of the HLL sketch tier: same shuffle shape, no error.

BITMAP_ORACLE = """
WITH masks AS (
  SELECT event_type,
         user_id // 63 AS bucket,
         bit_or(1::BIGINT << CAST(user_id % 63 AS INTEGER)) AS mask
  FROM events
  GROUP BY 1, 2
), per_type AS (
  SELECT event_type,
         CAST(SUM(bit_count(mask)) AS BIGINT) AS distinct_users_bitmap,
         CAST(COUNT(*) AS BIGINT) AS n_buckets
  FROM masks GROUP BY 1
), exact AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users_exact
  FROM events GROUP BY 1
)
SELECT p.event_type, distinct_users_bitmap, distinct_users_exact, n_buckets,
       distinct_users_bitmap = distinct_users_exact AS bitmap_exact
FROM per_type p JOIN exact e ON p.event_type = e.event_type
ORDER BY p.event_type
"""


@register("agg_bitmap_distinct", BITMAP_ORACLE)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    masks = (
        # integer div, not /63-in-DOUBLE: the double quotient rounds
        # past 2^53 and truncates (vs DuckDB's floor //) on negatives;
        # exact for the whole non-negative int64 key domain (r10
        # review). Key domain is non-negative by contract (bit = id
        # mod 63 must be >= 0): DuckDB floor-// and Spark truncating
        # div DIVERGE on negatives and a negative shift is undefined —
        # raise_error makes a negative-keyed dataset fail loudly
        # instead of returning silently divergent masks (ADVICE r10).
        # The branch is codegen-cheap: one comparison per row, no
        # extra pass.
        e.groupBy(
            "event_type",
            F.expr("user_id div 63").alias("bucket"),
        )
        .agg(
            # SQL form: F.shiftleft's numBits param is Python-int-only
            F.bit_or(
                F.expr(
                    "shiftleft(cast(1 as bigint), IF(user_id >= 0,"
                    " cast(user_id % 63 as int),"
                    " cast(raise_error('agg_bitmap_distinct: negative"
                    " user_id breaks the cross-engine bitmap contract"
                    " (floor vs truncating div)') as int)))"
                )
            ).alias("mask")
        )
    )
    per_type = masks.groupBy("event_type").agg(
        F.sum(F.bit_count("mask")).cast("bigint").alias("distinct_users_bitmap"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("distinct_users_exact")
    )
    return (
        per_type.join(exact, "event_type")
        .select(
            "event_type",
            "distinct_users_bitmap",
            "distinct_users_exact",
            "n_buckets",
            (F.col("distinct_users_bitmap") == F.col("distinct_users_exact")).alias(
                "bitmap_exact"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# text_ttr_lexical_diversity — type-token ratio per language
# ---------------------------------------------------------------------------
# The dataset-card lexical-diversity number: per-doc TTR (distinct
# words / words, exact integer ppm) computed ENTIRELY map-side
# (array_distinct on the token array — no shuffle touches the token
# grain), then a per-lang rollup of doc counts and the exact
# sum-of-ppms for a mean. Unlike corpus_vocab_growth (corpus-level
# vocab curve), this is the per-document diversity screen that flags
# keyword-stuffed/templated docs individually. Tokenization splits on
# the literal space (the repo's oracled-tokenizer convention): regex
# \s classes differ between Java and RE2 (\x0B is Java-\s but not
# RE2-\s), so a \s+ split is NOT a cross-engine contract (r10 review).

TTR_ORACLE = """
WITH per_doc AS (
  SELECT lang, doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
         1000000 * len(list_distinct(toks)) // greatest(len(toks), 1) AS ttr_ppm
  FROM (
    SELECT lang, doc_id,
           list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
    FROM documents
  )
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(ttr_ppm) // COUNT(*) AS BIGINT) AS mean_ttr_ppm,
       CAST(MIN(ttr_ppm) AS BIGINT) AS min_ttr_ppm,
       CAST(MAX(ttr_ppm) AS BIGINT) AS max_ttr_ppm
FROM per_doc
GROUP BY lang
ORDER BY lang
"""


@register("text_ttr_lexical_diversity", TTR_ORACLE)
def text_ttr_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    per_doc = d.select(
        "lang",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_types"),
    ).select(
        "lang",
        "n_tokens",
        F.expr("1000000 * n_types div greatest(n_tokens, 1)").alias("ttr_ppm"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.expr("sum(ttr_ppm) div count(*)").cast("bigint").alias("mean_ttr_ppm"),
            F.min("ttr_ppm").cast("bigint").alias("min_ttr_ppm"),
            F.max("ttr_ppm").cast("bigint").alias("max_ttr_ppm"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# text_lang_confusion — langid-vs-label confusion matrix
# ---------------------------------------------------------------------------
# The language-ID QA table every corpus card needs: how often the
# n-gram heuristic (text_langid, text.py:116) agrees with the labeled
# lang, as a (labeled × predicted) matrix with per-labeled-language
# shares in integer ppm. Composes the text_langid relation (same code
# path both engines), then one groupBy into a ≤langs² relation; the
# share window runs over that tiny matrix only.

from duckdb_sudan__spark.operators.text import LANGID_ORACLE, text_langid  # noqa: E402

LANG_CONFUSION_ORACLE = f"""
WITH preds AS ({LANGID_ORACLE})
SELECT labeled_lang, predicted_lang,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(1000000 * COUNT(*) // SUM(COUNT(*)) OVER (PARTITION BY labeled_lang) AS BIGINT) AS share_ppm
FROM preds
GROUP BY labeled_lang, predicted_lang
ORDER BY labeled_lang, predicted_lang
"""


@register("text_lang_confusion", LANG_CONFUSION_ORACLE)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    preds = text_langid(spark, sf_dir)
    counts = preds.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wlab = Window.partitionBy("labeled_lang")
    return counts.select(
        "labeled_lang",
        "predicted_lang",
        "n",
        F.expr("1000000 * n").cast("bigint").alias("_num"),
        F.sum("n").over(wlab).alias("_den"),
    ).selectExpr(
        "labeled_lang", "predicted_lang", "n", "_num div _den AS share_ppm"
    ).orderBy("labeled_lang", "predicted_lang")


# ---------------------------------------------------------------------------
# ml_drift_chi2_weekly — score-distribution drift, first week vs last
# ---------------------------------------------------------------------------
# The monitoring table behind every "retrain?" decision: compare the
# value distribution of the FIRST 7 days (baseline) against the LAST
# 7 days (current) over the same fixed-width bins as
# ml_calibration_bins, entirely in integer arithmetic — shares in
# exact ppm and the chi-square-style drift contribution
# (base_ppm − cur_ppm)² // base_ppm per bin as a scaled integer, so
# no float ever reaches the hash AND the consumer's total drift
# statistic is an exact integer sum (a float Σ over bins would vary
# with partial-agg order). Horizon days derive from the data itself
# (min/max epoch-day broadcast as a 1-row scalar).

DRIFT_ORACLE = f"""
WITH spans AS (
  SELECT MIN(CAST(CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01' AS INTEGER)) AS d0,
         MAX(CAST(CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01' AS INTEGER)) AS d1
  FROM events
), binned AS (
  SELECT CAST(least({CALIB_BINS - 1}, floor(value / {CALIB_BIN_WIDTH})) AS INTEGER) AS bin,
         CAST(COUNT(*) FILTER (dn < d0 + 7) AS BIGINT) AS n_base,
         CAST(COUNT(*) FILTER (dn > d1 - 7) AS BIGINT) AS n_cur
  FROM (SELECT value,
               CAST(CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01' AS INTEGER) AS dn
        FROM events), spans
  GROUP BY 1
), tot AS (
  SELECT SUM(n_base) AS tb, SUM(n_cur) AS tc FROM binned
)
SELECT bin, n_base, n_cur,
       CAST(1000000 * n_base // NULLIF(tb, 0) AS BIGINT) AS base_ppm,
       CAST(1000000 * n_cur // NULLIF(tc, 0) AS BIGINT) AS cur_ppm,
       CAST(((1000000 * n_base // NULLIF(tb, 0)) - (1000000 * n_cur // NULLIF(tc, 0)))
            * ((1000000 * n_base // NULLIF(tb, 0)) - (1000000 * n_cur // NULLIF(tc, 0)))
            // NULLIF(1000000 * n_base // NULLIF(tb, 0), 0) AS BIGINT) AS chi2_contrib_scaled
FROM binned, tot
ORDER BY bin
"""


@register("ml_drift_chi2_weekly", DRIFT_ORACLE)
def ml_drift_chi2_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    dn = F.datediff(
        F.date_trunc("day", F.col("ts")), F.lit("1970-01-01").cast("date")
    ).cast("int")
    bin_ = F.least(
        F.lit(CALIB_BINS - 1), F.floor(F.col("value") / CALIB_BIN_WIDTH)
    ).cast("int")
    base = e.select(bin_.alias("bin"), dn.alias("dn"))
    spans = base.agg(F.min("dn").alias("d0"), F.max("dn").alias("d1"))
    binned = (
        base.crossJoin(F.broadcast(spans))
        .groupBy("bin")
        .agg(
            F.count_if(F.col("dn") < F.col("d0") + 7).cast("bigint").alias("n_base"),
            F.count_if(F.col("dn") > F.col("d1") - 7).cast("bigint").alias("n_cur"),
        )
    )
    tot = binned.agg(
        F.sum("n_base").alias("tb"), F.sum("n_cur").alias("tc")
    )
    return (
        binned.crossJoin(F.broadcast(tot))
        .selectExpr(
            "bin", "n_base", "n_cur",
            "cast(1000000 * n_base div nullif(tb, 0) as bigint) AS base_ppm",
            "cast(1000000 * n_cur div nullif(tc, 0) as bigint) AS cur_ppm",
            "cast(((1000000 * n_base div nullif(tb, 0)) - (1000000 * n_cur div nullif(tc, 0)))"
            " * ((1000000 * n_base div nullif(tb, 0)) - (1000000 * n_cur div nullif(tc, 0)))"
            " div nullif(1000000 * n_base div nullif(tb, 0), 0) as bigint) AS chi2_contrib_scaled",
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# ml_feature_importance_mi — mutual information in integer bitlen units
# ---------------------------------------------------------------------------
# Feature-selection readout: how much does the value bin know about
# the purchase label? MI = H(X) + H(Y) − H(X,Y) in the repo's
# log-free surrogate (agg_entropy_bits' idiom: entropy_scaled =
# N·bitlen(N) − Σ c·bitlen(c), all BIGINT), so the whole statistic is
# ONE exact integer — order-independent under any partial-agg
# schedule. MI_scaled = Σc_xy·bl(c_xy) + N·bl(N) − Σc_x·bl(c_x) −
# Σc_y·bl(c_y) (the N·bl(N) terms of the three entropies collapse).
# The bitlen surrogate can place the statistic slightly off true
# log2-MI (documented); what's pinned is exact cross-engine equality.

MI_ORACLE = f"""
WITH g AS (
  SELECT CAST(least({CALIB_BINS - 1}, floor(value / {CALIB_BIN_WIDTH})) AS INTEGER) AS x,
         CAST(event_type = 'purchase' AS INTEGER) AS y,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), xy AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(c * length(printf('%b', c))) AS BIGINT) AS s_xy
  FROM g
), xs AS (
  SELECT CAST(SUM(cx * length(printf('%b', cx))) AS BIGINT) AS s_x
  FROM (SELECT CAST(SUM(c) AS BIGINT) AS cx FROM g GROUP BY x)
), ys AS (
  SELECT CAST(SUM(cy * length(printf('%b', cy))) AS BIGINT) AS s_y
  FROM (SELECT CAST(SUM(c) AS BIGINT) AS cy FROM g GROUP BY y)
)
SELECT n,
       CAST(n * length(printf('%b', n)) - s_x AS BIGINT) AS h_x_scaled,
       CAST(n * length(printf('%b', n)) - s_y AS BIGINT) AS h_y_scaled,
       CAST(n * length(printf('%b', n)) - s_xy AS BIGINT) AS h_xy_scaled,
       CAST(s_xy + n * length(printf('%b', n)) - s_x - s_y AS BIGINT) AS mi_scaled_bits
FROM xy, xs, ys
"""


@register("ml_feature_importance_mi", MI_ORACLE)
def ml_feature_importance_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bin_ = F.least(
        F.lit(CALIB_BINS - 1), F.floor(F.col("value") / CALIB_BIN_WIDTH)
    ).cast("int")
    g = (
        e.select(bin_.alias("x"), (F.col("event_type") == "purchase").cast("int").alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    xy = g.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("c") * F.length(F.bin("c"))).cast("bigint").alias("s_xy"),
    )
    xs = (
        g.groupBy("x").agg(F.sum("c").cast("bigint").alias("cx"))
        .agg(F.sum(F.col("cx") * F.length(F.bin("cx"))).cast("bigint").alias("s_x"))
    )
    ys = (
        g.groupBy("y").agg(F.sum("c").cast("bigint").alias("cy"))
        .agg(F.sum(F.col("cy") * F.length(F.bin("cy"))).cast("bigint").alias("s_y"))
    )
    return (
        xy.crossJoin(F.broadcast(xs))
        .crossJoin(F.broadcast(ys))
        .selectExpr(
            "n",
            "cast(n * length(bin(n)) - s_x as bigint) AS h_x_scaled",
            "cast(n * length(bin(n)) - s_y as bigint) AS h_y_scaled",
            "cast(n * length(bin(n)) - s_xy as bigint) AS h_xy_scaled",
            "cast(s_xy + n * length(bin(n)) - s_x - s_y as bigint) AS mi_scaled_bits",
        )
    )


# ---------------------------------------------------------------------------
# text_collocation_lift — corpus collocation extraction by lift
# ---------------------------------------------------------------------------
# The lexicon/tokenizer-sizing companion to bpe_pair_counts: rank word
# bigrams by LIFT = P(w1 w2) / (P(w1)·P(w2)) = (c_xy · N) / (c_x · c_y)
# — the PMI exponent without the libm log (DETERMINISM.md rule 3). All
# counts are exact bigints; the lift is ONE double expression from
# those ints (mult/div only — the same IEEE sequence both engines), a
# min-support filter keeps noise bigrams out, and the top-20 ordering
# tiebreaks on the words so the cut is total. Shape: token explode →
# two count-grain shuffles (unigrams, bigrams) → broadcast unigram
# lookup onto the ≥MIN_COLLOC bigrams (a vocabulary-sized relation,
# not the token stream) → global top-20 of a tiny filtered set.

MIN_COLLOC = 5
COLLOC_TOP = 20

# literal-space tokenization (the \s-class cross-engine rule, see TTR)
_COLLOC_TOKS = """
  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS t
  FROM documents
"""

COLLOC_ORACLE = f"""
WITH toks AS ({_COLLOC_TOKS}),
uni AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT UNNEST(t) AS w FROM toks) GROUP BY w
), n_tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni
), bg AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_xy
  FROM (SELECT t[s] AS w1, t[s+1] AS w2
        FROM (SELECT t, UNNEST(generate_series(1, length(t) - 1)) AS s FROM toks))
  GROUP BY w1, w2
)
SELECT w1, w2, c_xy, u1.c AS c_x, u2.c AS c_y,
       (CAST(c_xy AS DOUBLE) * CAST(n AS DOUBLE))
         / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) AS lift
FROM bg JOIN uni u1 ON bg.w1 = u1.w JOIN uni u2 ON bg.w2 = u2.w, n_tot
WHERE c_xy >= {MIN_COLLOC}
ORDER BY lift DESC, w1, w2
LIMIT {COLLOC_TOP}
"""


@register("text_collocation_lift", COLLOC_ORACLE)
def text_collocation_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    t = d.select(toks.alias("t"))
    uni = (
        t.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    n_tot = uni.agg(F.sum("c").cast("bigint").alias("n"))
    bg = (
        # docs with < 2 tokens are filtered BEFORE the sequence —
        # Spark's sequence(1, 0) counts DOWN and t[s] would index out
        # of bounds under ANSI, while DuckDB's generate_series(1, 0)
        # is empty (DETERMINISM.md rule 18; r10 review)
        t.where(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, size(t) - 1), s -> struct(t[s-1] AS w1, t[s] AS w2))")
            ).alias("p")
        )
        .where(F.col("p").isNotNull())
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_xy"))
        .where(F.col("c_xy") >= MIN_COLLOC)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_x"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_y"))
    return (
        bg.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "w1", "w2", "c_xy", "c_x", "c_y",
            (
                (F.col("c_xy").cast("double") * F.col("n").cast("double"))
                / (F.col("c_x").cast("double") * F.col("c_y").cast("double"))
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "w1", "w2")
        .limit(COLLOC_TOP)
    )


# ---------------------------------------------------------------------------
# q_weekday_seasonality_index — per-weekday revenue index
# ---------------------------------------------------------------------------
# The planogram/staffing table: each weekday's share of purchase
# revenue as an index where 1,000,000 = a flat week (index_ppm =
# 1e6 · 7 · dow_rev // total_rev). Weekday from pure epoch-day
# arithmetic ((days + 3) % 7, Monday=0 — the catalogued engine
# dow-numbering split never enters), revenue in exact cents, ONE
# map-combined shuffle into ≤7 groups.

WEEKDAY_IDX_ORACLE = """
WITH by_dow AS (
  SELECT CAST((CAST(CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01' AS BIGINT) + 3) % 7 AS INTEGER) AS dow_mon0,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), tot AS (SELECT CAST(SUM(rev_cents) AS BIGINT) AS total FROM by_dow)
SELECT dow_mon0, rev_cents, total,
       CAST(1000000 * 7 * rev_cents // NULLIF(total, 0) AS BIGINT) AS index_ppm
FROM by_dow, tot
ORDER BY dow_mon0
"""


@register("q_weekday_seasonality_index", WEEKDAY_IDX_ORACLE)
def q_weekday_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    days = F.datediff(
        F.date_trunc("day", F.col("ts")), F.lit("1970-01-01").cast("date")
    ).cast("bigint")
    by_dow = (
        e.where(F.col("event_type") == "purchase")
        .groupBy(((days + 3) % 7).cast("int").alias("dow_mon0"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint").alias("rev_cents"))
    )
    tot = by_dow.agg(F.sum("rev_cents").cast("bigint").alias("total"))
    return (
        by_dow.crossJoin(F.broadcast(tot))
        .selectExpr(
            "dow_mon0", "rev_cents", "total",
            "cast(1000000 * 7 * rev_cents div nullif(total, 0) as bigint) AS index_ppm",
        )
        .orderBy("dow_mon0")
    )


# ---------------------------------------------------------------------------
# ml_pr_curve_binned — precision/recall curve over the bounded bin grid
# ---------------------------------------------------------------------------
# The threshold-picking table AUC and KS summarize away: for every
# OBSERVED score bin (≤KS_BINS rows), treat "value >= bin threshold"
# as the positive prediction and emit exact TP / predicted-positive /
# precision / recall — all integers, the cumulative-from-the-top
# window running over the bin aggregate only (the ml_ks_binned rule).
# A 100 TB scoring run pays one map-combined shuffle into ≤1000 bins.

PR_CURVE_ORACLE = f"""
WITH binned AS (
  SELECT CAST(least({KS_BINS - 1}, floor(value * {KS_BIN_SCALE})) AS INTEGER) AS bin,
         CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS np,
         CAST(COUNT(*) AS BIGINT) AS nt
  FROM events GROUP BY 1
), cum AS (
  SELECT bin,
         SUM(np) OVER (ORDER BY bin DESC) AS tp,
         SUM(nt) OVER (ORDER BY bin DESC) AS pp,
         SUM(np) OVER () AS p
  FROM binned
)
SELECT bin, CAST(tp AS BIGINT) AS tp, CAST(pp AS BIGINT) AS pp,
       CAST(1000000 * tp // pp AS BIGINT) AS precision_ppm,
       CAST(1000000 * tp // NULLIF(p, 0) AS BIGINT) AS recall_ppm
FROM cum
ORDER BY bin
"""


@register("ml_pr_curve_binned", PR_CURVE_ORACLE)
def ml_pr_curve_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bin_ = F.least(
        F.lit(KS_BINS - 1), F.floor(F.col("value") * KS_BIN_SCALE)
    ).cast("int")
    binned = (
        e.select((F.col("event_type") == "purchase").alias("pos"), bin_.alias("bin"))
        .groupBy("bin")
        .agg(
            F.count_if(F.col("pos")).cast("bigint").alias("np"),
            F.count(F.lit(1)).cast("bigint").alias("nt"),
        )
    )
    wtop = Window.orderBy(F.desc("bin")).rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        binned.select(
            "bin",
            F.sum("np").over(wtop).cast("bigint").alias("tp"),
            F.sum("nt").over(wtop).cast("bigint").alias("pp"),
            F.sum("np").over(wall).alias("p"),
        )
        .selectExpr(
            "bin", "tp", "pp",
            "cast(1000000 * tp div pp as bigint) AS precision_ppm",
            # nullif: zero positives must yield NULL (as DuckDB's //
            # does), not an ANSI DIVIDE_BY_ZERO (r10 review)
            "cast(1000000 * tp div nullif(p, 0) as bigint) AS recall_ppm",
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# ml_brier_score — calibration error as one exact statistic
# ---------------------------------------------------------------------------
# Brier = mean (p − y)² with p = the value-derived probability proxy
# (value·2000 ppm, exact: value has 2 decimals and < 500) and y ∈
# {0, 1e6} ppm. Per-row squared error ≤ 1e12 fits BIGINT; the SUM
# accumulates as DECIMAL(38,0) so the statistic is exact at ANY row
# count (a double Σ would drift with partial-agg order —
# DETERMINISM.md rule 3). The mean is one double division from two
# exact integers. One map-combined 1-row aggregate.

BRIER_ORACLE = """
WITH rows_ AS (
  SELECT CAST(round(value * 2000) AS BIGINT) AS p_ppm,
         CAST(event_type = 'purchase' AS BIGINT) * 1000000 AS y_ppm
  FROM events
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST((p_ppm - y_ppm) * (p_ppm - y_ppm) AS DECIMAL(38,0))) AS VARCHAR) AS sum_sq_ppm2,
       CAST(SUM(CAST((p_ppm - y_ppm) * (p_ppm - y_ppm) AS DECIMAL(38,0))) AS DOUBLE)
         / (CAST(COUNT(*) AS DOUBLE) * 1e12) AS brier
FROM rows_
"""


@register("ml_brier_score", BRIER_ORACLE)
def ml_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    p = F.round(F.col("value") * 2000).cast("bigint")
    y = (F.col("event_type") == "purchase").cast("bigint") * 1000000
    sq = ((p - y) * (p - y)).cast("decimal(38,0)")
    return e.select(sq.alias("sq")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("sq").cast("string").alias("sum_sq_ppm2"),
        (
            F.sum("sq").cast("double") / (F.count(F.lit(1)).cast("double") * F.lit(1e12))
        ).alias("brier"),
    )


# ---------------------------------------------------------------------------
# q_order_size_distribution — basket-size histogram
# ---------------------------------------------------------------------------
# The order-profile table (pricing, packing, fraud baselines): how
# many orders have k line items. Two distributive aggregates — one
# shuffle on the natural orderkey, then a map-combined shuffle into
# ≤|max basket| groups — shares in exact ppm. No window anywhere.

ORDER_SIZE_ORACLE = """
WITH sizes AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS order_size
  FROM lineitem GROUP BY l_orderkey
), hist AS (
  SELECT order_size, CAST(COUNT(*) AS BIGINT) AS n_orders FROM sizes GROUP BY order_size
), tot AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS total FROM hist)
SELECT order_size, n_orders,
       CAST(1000000 * n_orders // NULLIF(total, 0) AS BIGINT) AS share_ppm
FROM hist, tot
ORDER BY order_size
"""


@register("q_order_size_distribution", ORDER_SIZE_ORACLE)
def q_order_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    sizes = l.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("order_size")
    )
    hist = sizes.groupBy("order_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    tot = hist.agg(F.sum("n_orders").cast("bigint").alias("total"))
    return (
        hist.crossJoin(F.broadcast(tot))
        .selectExpr(
            "order_size", "n_orders",
            "cast(1000000 * n_orders div nullif(total, 0) as bigint) AS share_ppm",
        )
        .orderBy("order_size")
    )


# ---------------------------------------------------------------------------
# q_discount_qty_elasticity — demand response per discount band
# ---------------------------------------------------------------------------
# Does a deeper discount move more units? Per integer discount band
# (cents — l_discount has 2 decimals, so the band key is exact):
# line count, exact quantity sum, and mean quantity in integer
# milli-units (1000·Σq // n — quantities are integral doubles, so the
# milli mean is exact). ≤11 bands: the cheapest possible shuffle.

DISCOUNT_ELASTICITY_ORACLE = """
SELECT CAST(round(l_discount * 100) AS INTEGER) AS discount_pct,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(1000 * SUM(CAST(round(l_quantity) AS BIGINT)) // COUNT(*) AS BIGINT) AS mean_qty_milli
FROM lineitem
GROUP BY 1
ORDER BY 1
"""


@register("q_discount_qty_elasticity", DISCOUNT_ELASTICITY_ORACLE)
def q_discount_qty_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy(F.round(F.col("l_discount") * 100).cast("int").alias("discount_pct"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(F.round("l_quantity").cast("bigint")).cast("bigint").alias("sum_qty"),
            F.expr(
                "cast(1000 * sum(cast(round(l_quantity) as bigint)) div count(*) as bigint)"
            ).alias("mean_qty_milli"),
        )
        .orderBy("discount_pct")
    )


# ---------------------------------------------------------------------------
# ev_peak_hour_by_type — busiest hour per event type
# ---------------------------------------------------------------------------
# The capacity-planning readout: each type's peak hour-of-day with its
# count and share. Argmax via rank over the ≤types×24 aggregate (total
# order: count DESC, hour ASC), shares in exact ppm — one map-combined
# fact shuffle into ≤120 groups, windows on the tiny grid only.

PEAK_HOUR_ORACLE = """
WITH by_hour AS (
  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hr,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT event_type, hr, n,
         CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS total,
         row_number() OVER (PARTITION BY event_type ORDER BY n DESC, hr) AS rn
  FROM by_hour
)
SELECT event_type, hr AS peak_hour, n AS peak_count,
       CAST(1000000 * n // NULLIF(total, 0) AS BIGINT) AS peak_share_ppm
FROM ranked WHERE rn = 1
ORDER BY event_type
"""


@register("ev_peak_hour_by_type", PEAK_HOUR_ORACLE)
def ev_peak_hour_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    by_hour = e.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hr")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wtot = Window.partitionBy("event_type")
    wr = Window.partitionBy("event_type").orderBy(F.desc("n"), "hr")
    return (
        by_hour.select(
            "event_type", "hr", "n",
            F.sum("n").over(wtot).cast("bigint").alias("total"),
            F.row_number().over(wr).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .selectExpr(
            "event_type", "hr AS peak_hour", "n AS peak_count",
            "cast(1000000 * n div nullif(total, 0) as bigint) AS peak_share_ppm",
        )
        .orderBy("event_type")
    )
