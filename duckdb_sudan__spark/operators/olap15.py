"""r7 third OLAP wave: seasonal decomposition, robust means, a
deterministic per-group reservoir sample, KMV distinct sketches with
set algebra, and an array-function parity pack.

Determinism posture (DETERMINISM.md): every hash-compared double is a
single exactly-rounded IEEE division of exact integers (micro-unit /
cent accumulators, power-of-two hash denominators), or a FIXED short
sequence of such ops repeated verbatim in the oracle; quantiles are
DISCRETE elements selected by integer inequalities; hashes are md5
hex (lexicographic order agrees across engines on lowercase hex).

Reference parity: the reference engine exposes the generic SQL
surface (window frames, conditional aggregation, md5 — see
src/sudan/*_functions.cpp register sites); these are the analytics
compositions a user of that surface writes against it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# ts_stl_decompose — trend / weekly-seasonal / residual decomposition
# ---------------------------------------------------------------------------

STL_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         SUM(CAST(round(value * 1000000) AS BIGINT)) AS um
  FROM events GROUP BY 1, 2
), framed AS (
  SELECT event_type, day, um,
         SUM(um)   OVER w7 AS t_sum,
         COUNT(*)  OVER w7 AS t_cnt,
         (CAST(day AS DATE) - DATE '1970-01-01') % 7 AS dow
  FROM daily
  WINDOW w7 AS (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), seas AS (
  SELECT event_type, dow,
         SUM(7 * um - t_sum) AS s_num,
         7 * COUNT(*)        AS s_den
  FROM framed WHERE t_cnt = 7
  GROUP BY event_type, dow
)
SELECT f.event_type, f.day, CAST(f.um AS BIGINT) AS value_um,
       CASE WHEN f.t_cnt = 7
            THEN ROUND(CAST(f.t_sum AS DOUBLE) / 7000000.0, 6) END AS trend_value,
       ROUND(CAST(s.s_num AS DOUBLE) / CAST(s.s_den * 1000000 AS DOUBLE), 6) AS seasonal_value,
       CASE WHEN f.t_cnt = 7 THEN ROUND(
         CAST(f.um AS DOUBLE) / 1000000.0
         - CAST(f.t_sum AS DOUBLE) / 7000000.0
         - CAST(s.s_num AS DOUBLE) / CAST(s.s_den * 1000000 AS DOUBLE), 6) END AS residual_value
FROM framed f
JOIN seas s ON s.event_type = f.event_type AND s.dow = f.dow
ORDER BY f.event_type, f.day
"""


@register("ts_stl_decompose", STL_ORACLE)
def ts_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-style additive decomposition of the daily per-type totals:
    trend = centered 7-observation moving average (NULL at the edges
    where the window is short), weekly seasonal = per-day-of-week mean
    of the detrended interior, residual = value − trend − seasonal.
    The classical decomposition a capacity planner runs before
    alerting on the residual (ts_changepoint_cusum / ev_anomaly_zscore
    are its downstream consumers).

    Determinism: the daily series is exact micro-units; the detrended
    quantity is kept as the INTEGER 7·um − Σ₇um (never a per-row
    double), so the seasonal mean is one int/int division and trend
    is one int/7e6 division; residual is those divisions and two
    subtractions in a spelled order. Components are emitted in VALUE
    units (magnitude ~10³), not micro-units: ROUND(x, 6) at ~10⁹·10⁶
    sits near 2⁵³ where the engines' rounding paths (BigDecimal-exact
    vs multiply-nearbyint-divide) disagree at the last digit —
    measured at sf0.1 (DETERMINISM.md rules 2/3).
    Day-of-week is epoch-day % 7 — calendar-convention-free
    (engines disagree on whether weeks start Sunday or Monday).

    Plan: one partial-agg shuffle to the day×type grain, one window
    over that tiny aggregate, one ≤|types|·7-row seasonal relation
    joined back broadcast. The fact table is scanned once; at 100 TB
    the day×type aggregate (~36.5k rows/century/type) is the only
    state downstream."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).alias("um"))
    )
    w7 = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    )
    framed = daily.select(
        "event_type", "day", "um",
        F.sum("um").over(w7).alias("t_sum"),
        F.count(F.lit(1)).over(w7).alias("t_cnt"),
        (F.datediff(F.col("day").cast("date"), F.lit("1970-01-01").cast("date")) % 7).alias("dow"),
    )
    seas = (
        framed.where(F.col("t_cnt") == 7)
        .groupBy("event_type", "dow")
        .agg(
            F.sum(F.lit(7) * F.col("um") - F.col("t_sum")).alias("s_num"),
            (F.lit(7) * F.count(F.lit(1))).alias("s_den"),
        )
    )
    trend = F.col("t_sum").cast("double") / F.lit(7_000_000.0)
    seasonal = F.col("s_num").cast("double") / (F.col("s_den") * F.lit(1_000_000)).cast("double")
    return (
        framed.join(F.broadcast(seas), ["event_type", "dow"])
        .select(
            "event_type", "day", F.col("um").alias("value_um"),
            F.when(F.col("t_cnt") == 7, F.round(trend, 6)).alias("trend_value"),
            F.round(seasonal, 6).alias("seasonal_value"),
            F.when(
                F.col("t_cnt") == 7,
                F.round(F.col("um").cast("double") / F.lit(1_000_000.0) - trend - seasonal, 6),
            ).alias("residual_value"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# agg_winsorized_trimmed — robust means via discrete p10/p90 cutpoints
# ---------------------------------------------------------------------------

WINSOR_ORACLE = """
WITH counts AS (
  SELECT o_orderpriority AS prio,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         COUNT(*) AS cnt
  FROM orders GROUP BY 1, 2
), cum AS (
  SELECT prio, cents, cnt,
         SUM(cnt) OVER (PARTITION BY prio) AS n,
         SUM(cnt) OVER (PARTITION BY prio ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM counts
), cuts AS (
  SELECT prio, MAX(n) AS n,
         MIN(CASE WHEN cum * 10 >= n     THEN cents END) AS p10,
         MIN(CASE WHEN cum * 10 >= n * 9 THEN cents END) AS p90
  FROM cum GROUP BY prio
)
SELECT c.prio AS o_orderpriority,
       CAST(t.n AS BIGINT) AS n,
       t.p10 AS p10_cents, t.p90 AS p90_cents,
       ROUND(CAST(SUM(c.cnt * least(greatest(c.cents, t.p10), t.p90)) AS DOUBLE)
             / CAST(t.n AS DOUBLE) / 100.0, 6) AS winsorized_mean,
       CAST(SUM(CASE WHEN c.cents BETWEEN t.p10 AND t.p90 THEN c.cnt ELSE 0 END) AS BIGINT) AS trimmed_n,
       ROUND(CAST(SUM(CASE WHEN c.cents BETWEEN t.p10 AND t.p90 THEN c.cnt * c.cents ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CASE WHEN c.cents BETWEEN t.p10 AND t.p90 THEN c.cnt ELSE 0 END) AS DOUBLE)
             / 100.0, 6) AS trimmed_mean
FROM counts c JOIN cuts t ON t.prio = c.prio
GROUP BY c.prio, t.n, t.p10, t.p90
ORDER BY c.prio
"""


@register("agg_winsorized_trimmed", WINSOR_ORACLE)
def agg_winsorized_trimmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized and trimmed means of order value per priority — the
    robust-location pair every metrics pipeline reports next to the
    raw mean once heavy-tailed spend distributions start gaming it.
    Cutpoints are DISCRETE p10/p90 elements selected by the integer
    cumulative-count inequality (agg_quantile_multi's idiom — no fp
    in the selection); winsorization clamps INTO [p10, p90], trimming
    keeps the closed interval; both accumulate exact cent·count
    products and divide once (÷n, ÷100) at presentation.

    Plan: ONE partial-agg shuffle of the fact to the (priority, cents)
    domain-bounded counts relation; the cumulative window and both
    means run on that aggregate; the 5-row cutpoint relation joins
    back broadcast. The fact table is never shuffled raw and never
    scanned twice — at 100 TB the counts relation is bounded by the
    price domain (~10⁷ distinct cents), not the row count."""
    o = load_table(spark, sf_dir, "orders")
    counts = (
        o.groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_all = Window.partitionBy("prio")
    w_cum = w_all.orderBy("cents").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = counts.select(
        "prio", "cents", "cnt",
        F.sum("cnt").over(w_all).alias("n"),
        F.sum("cnt").over(w_cum).alias("cum"),
    )
    cuts = cum.groupBy("prio").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("cum") * 10 >= F.col("n"), F.col("cents"))).alias("p10"),
        F.min(F.when(F.col("cum") * 10 >= F.col("n") * 9, F.col("cents"))).alias("p90"),
    )
    clamped = F.least(F.greatest(F.col("cents"), F.col("p10")), F.col("p90"))
    in_range = F.col("cents").between(F.col("p10"), F.col("p90"))
    trimmed_n = F.sum(F.when(in_range, F.col("cnt")).otherwise(F.lit(0)))
    return (
        counts.join(F.broadcast(cuts), "prio")
        .groupBy("prio", "n", "p10", "p90")
        .agg(
            F.round(
                F.sum(F.col("cnt") * clamped).cast("double")
                / F.col("n").cast("double") / F.lit(100.0), 6,
            ).alias("winsorized_mean"),
            trimmed_n.cast("bigint").alias("trimmed_n"),
            F.round(
                F.sum(F.when(in_range, F.col("cnt") * F.col("cents")).otherwise(F.lit(0))).cast("double")
                / trimmed_n.cast("double") / F.lit(100.0), 6,
            ).alias("trimmed_mean"),
        )
        .select(
            F.col("prio").alias("o_orderpriority"),
            F.col("n").cast("bigint").alias("n"),
            F.col("p10").alias("p10_cents"), F.col("p90").alias("p90_cents"),
            "winsorized_mean", "trimmed_n", "trimmed_mean",
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# sample_reservoir_per_group — deterministic fixed-k hash-minimal sample
# ---------------------------------------------------------------------------

RESERVOIR_K = 10

RESERVOIR_ORACLE = f"""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       array_to_string(
         list_transform(
           list_slice(
             list_sort(list({{'h': md5(CAST(doc_id AS VARCHAR)), 'k': doc_id}}), 'ASC'),
             1, {RESERVOIR_K}),
           s -> CAST(s.k AS VARCHAR)),
         ',') AS sample_doc_ids
FROM documents
GROUP BY lang ORDER BY lang
"""


@register("sample_reservoir_per_group", RESERVOIR_ORACLE)
def sample_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size-k per-group sample — the deterministic replacement
    for reservoir sampling: keep the k docs with the SMALLEST md5
    hash per language. Same sample on every run, every engine, every
    partitioning (a true random reservoir is run-dependent — useless
    for reproducible eval sets); complements sample_hash_stratified,
    which thresholds a FRACTION rather than pinning a count.

    Plan: the two-phase top-k posture (agg_topk_orders): phase 1
    SHIPS only a local k-minimum per (lang, input-partition) — the
    full corpus never concentrates on |langs| reducers — and phase 2
    merges the ≤k·partitions survivors per language. Correct because
    a global k-minimum element is a local k-minimum of its partition.
    State honesty: phase 1's collect_list buffers one input
    partition's (md5, id) structs before sort_array+slice evaluates,
    so per-TASK memory is O(partition rows), not O(k) — the pruning
    bounds the post-shuffle PAYLOAD, which is the 100 TB lever
    (reducer concentration), while partition-sized task buffers are
    already the scan-batch regime. A strictly O(k)-state local pass
    would need an Arrow kernel; not worth leaving the JVM here.
    md5 hex is lowercase on both engines, so lexicographic order
    agrees."""
    d = load_table(spark, sf_dir, "documents")
    pk = F.struct(
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        F.col("doc_id").alias("k"),
    )
    local = (
        d.select("lang", pk.alias("pk"))
        .withColumn("pid", F.spark_partition_id())
        .groupBy("lang", "pid")
        .agg(
            F.slice(F.sort_array(F.collect_list("pk")), 1, RESERVOIR_K).alias("top"),
            F.count(F.lit(1)).alias("pn"),
        )
    )
    return (
        local.groupBy("lang")
        .agg(
            F.sum("pn").cast("bigint").alias("n_docs"),
            F.array_join(
                F.transform(
                    F.slice(F.sort_array(F.flatten(F.collect_list("top"))), 1, RESERVOIR_K),
                    lambda s: s["k"].cast("string"),
                ),
                ",",
            ).alias("sample_doc_ids"),
        )
        .select("lang", "n_docs", "sample_doc_ids")
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# sketch_kmv_set_ops — KMV distinct sketches with union/intersection
# ---------------------------------------------------------------------------

KMV_K = 8
_KMV_DENOM = 1 << 48  # 12 hex digits of md5 → [0, 2^48)

KMV_ORACLE = f"""
WITH users AS (
  SELECT user_id,
         CAST(MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS INTEGER) AS in_a,
         CAST(MAX(CASE WHEN event_type = 'view'  THEN 1 ELSE 0 END) AS INTEGER) AS in_b,
         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT) AS h
  FROM events WHERE event_type IN ('click', 'view')
  GROUP BY user_id
), ranked AS (
  SELECT h, in_a, in_b,
         CASE WHEN in_a = 1 THEN ROW_NUMBER() OVER (PARTITION BY in_a ORDER BY h) END AS rn_a_raw,
         CASE WHEN in_b = 1 THEN ROW_NUMBER() OVER (PARTITION BY in_b ORDER BY h) END AS rn_b_raw,
         ROW_NUMBER() OVER (ORDER BY h) AS rn_u
  FROM users
), ranked_a AS (
  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM users WHERE in_a = 1
), ranked_b AS (
  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM users WHERE in_b = 1
), scal AS (
  SELECT
    (SELECT COUNT(*) FROM users WHERE in_a = 1) AS exact_a,
    (SELECT COUNT(*) FROM users WHERE in_b = 1) AS exact_b,
    (SELECT COUNT(*) FROM users) AS exact_union,
    (SELECT COUNT(*) FROM users WHERE in_a = 1 AND in_b = 1) AS exact_inter,
    (SELECT h FROM ranked_a WHERE rn = {KMV_K}) AS hk_a,
    (SELECT h FROM ranked_b WHERE rn = {KMV_K}) AS hk_b,
    (SELECT h FROM ranked WHERE rn_u = {KMV_K}) AS hk_u,
    (SELECT COUNT(*) FROM ranked WHERE rn_u <= {KMV_K} AND in_a = 1 AND in_b = 1) AS rho
), est AS (
  SELECT *,
    CASE WHEN exact_a < {KMV_K} THEN CAST(exact_a AS DOUBLE)
         ELSE CAST({(KMV_K - 1) * _KMV_DENOM} AS DOUBLE) / CAST(hk_a AS DOUBLE) END AS est_a,
    CASE WHEN exact_b < {KMV_K} THEN CAST(exact_b AS DOUBLE)
         ELSE CAST({(KMV_K - 1) * _KMV_DENOM} AS DOUBLE) / CAST(hk_b AS DOUBLE) END AS est_b,
    CASE WHEN exact_union < {KMV_K} THEN CAST(exact_union AS DOUBLE)
         ELSE CAST({(KMV_K - 1) * _KMV_DENOM} AS DOUBLE) / CAST(hk_u AS DOUBLE) END AS est_union
  FROM scal
)
SELECT CAST(exact_a AS BIGINT) AS exact_a, CAST(exact_b AS BIGINT) AS exact_b,
       CAST(exact_union AS BIGINT) AS exact_union, CAST(exact_inter AS BIGINT) AS exact_inter,
       ROUND(est_a, 6) AS est_a, ROUND(est_b, 6) AS est_b,
       ROUND(est_union, 6) AS est_union,
       ROUND(CAST(rho AS DOUBLE) * est_union / {float(KMV_K)}, 6) AS est_inter
FROM est
"""


@register("sketch_kmv_set_ops", KMV_ORACLE)
def sketch_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketches over two audience sets
    (clickers A, viewers B) with the set algebra production dashboards
    run on sketches instead of raw sets: |A|, |B|, |A∪B| via the KMV
    estimator (k−1)/h₍k₎, and |A∩B| via the Jaccard fraction of the
    MERGED sketch that belongs to both sides — next to the exact
    answers, so the correctness gate pins the estimator arithmetic
    itself (unlike sketch_distinct, whose HLL estimate is
    error-bound-tested only). The union sketch is the k smallest of
    the MERGED hash set — the mergeability that makes KMV a
    pre-aggregable 100 TB reporting primitive (kB of state per
    (dimension, day) cell, unioned at query time).

    Determinism: h = first 12 md5 hex digits as an integer in
    [0, 2^48); the estimator is one division of exact integers
    ((k−1)·2^48 / h₍k₎ — numerator exact at 51 bits), and the
    intersection is rho·est_union/k in that spelled order.

    Plan: one partial-agg shuffle to the distinct-user grain with
    per-set membership flags, then the two-phase k-minimum merge
    (local k smallest per input partition → global k) — the same
    no-concentration posture as sample_reservoir_per_group, with the
    same state-honesty caveat (phase 1's task buffer is one input
    partition, only the shuffled payload is O(k)); the result is a
    single row."""
    e = load_table(spark, sf_dir, "events")
    users = (
        e.where(F.col("event_type").isin("click", "view"))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("in_b"),
        )
        .select(
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10)
            .cast("bigint").alias("h"),
            "in_a", "in_b",
        )
    )
    elem = F.struct(F.col("h"), F.col("in_a"), F.col("in_b"))
    local = (
        users.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            F.slice(F.sort_array(F.collect_list(F.when(F.col("in_a") == 1, elem))), 1, KMV_K).alias("ka"),
            F.slice(F.sort_array(F.collect_list(F.when(F.col("in_b") == 1, elem))), 1, KMV_K).alias("kb"),
            F.slice(F.sort_array(F.collect_list(elem)), 1, KMV_K).alias("ku"),
            F.sum(F.col("in_a")).alias("na"),
            F.sum(F.col("in_b")).alias("nb"),
            F.count(F.lit(1)).alias("nu"),
            F.sum(F.col("in_a") * F.col("in_b")).alias("ni"),
        )
    )
    merged = local.agg(
        F.slice(F.sort_array(F.flatten(F.collect_list("ka"))), 1, KMV_K).alias("ka"),
        F.slice(F.sort_array(F.flatten(F.collect_list("kb"))), 1, KMV_K).alias("kb"),
        F.slice(F.sort_array(F.flatten(F.collect_list("ku"))), 1, KMV_K).alias("ku"),
        F.sum("na").cast("bigint").alias("exact_a"),
        F.sum("nb").cast("bigint").alias("exact_b"),
        F.sum("nu").cast("bigint").alias("exact_union"),
        F.sum("ni").cast("bigint").alias("exact_inter"),
    )
    numer = F.lit((KMV_K - 1) * _KMV_DENOM).cast("double")

    def est(arr: str, exact: str):
        hk = F.element_at(F.col(arr), KMV_K)["h"].cast("double")
        return F.when(
            F.col(exact) < KMV_K, F.col(exact).cast("double")
        ).otherwise(numer / hk)

    rho = F.size(F.filter(F.col("ku"), lambda s: (s["in_a"] == 1) & (s["in_b"] == 1)))
    return merged.select(
        "exact_a", "exact_b", "exact_union", "exact_inter",
        F.round(est("ka", "exact_a"), 6).alias("est_a"),
        F.round(est("kb", "exact_b"), 6).alias("est_b"),
        F.round(est("ku", "exact_union"), 6).alias("est_union"),
        F.round(
            rho.cast("double") * est("ku", "exact_union") / F.lit(float(KMV_K)), 6
        ).alias("est_inter"),
    )


# ---------------------------------------------------------------------------
# list_funcs_parity — array-function parity pack
# ---------------------------------------------------------------------------

LIST_PARITY_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x != '') AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_tok,
       CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
       array_to_string(list_slice(list_sort(t, 'ASC'), 1, 3), ',') AS first3_sorted,
       t[-1] AS last_tok,
       CAST(list_contains(t, 'spark') AS INTEGER) AS has_spark,
       CAST(NULLIF(list_position(t, 'table'), 0) AS INTEGER) AS pos_table,
       array_to_string(list_slice(list_reverse(t), 1, 2), ',') AS last2_rev
FROM toks ORDER BY doc_id
"""


@register("list_funcs_parity", LIST_PARITY_ORACLE)
def list_funcs_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function parity pack — the list surface both engines
    expose, exercised side by side on real token arrays: size,
    distinct-count, sort+slice, negative indexing, membership,
    1-based position (absence = NULL on both once Spark's 0 sentinel
    is NULLIF-ed), and reversal. Complements array_funcs /
    list_sort_lambda (construction + lambda sorting) with the
    read-side accessors.

    Plan: map-only over documents — no shuffle, no UDF; every
    function is a JVM collection expression inside one codegen
    stage."""
    d = load_table(spark, sf_dir, "documents")
    t = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
    toks = d.select("doc_id", t.alias("t"))
    return (
        toks.select(
            "doc_id",
            F.size("t").cast("bigint").alias("n_tok"),
            F.size(F.array_distinct("t")).cast("bigint").alias("n_distinct"),
            F.array_join(F.slice(F.sort_array("t"), 1, 3), ",").alias("first3_sorted"),
            F.element_at("t", -1).alias("last_tok"),
            F.array_contains("t", "spark").cast("int").alias("has_spark"),
            F.nullif(F.array_position("t", "table"), F.lit(0)).cast("int").alias("pos_table"),
            F.array_join(F.slice(F.reverse("t"), 1, 2), ",").alias("last2_rev"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# ts_holt_linear — Holt's linear (double exponential) smoothing
# ---------------------------------------------------------------------------

HOLT_ORACLE = """
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS y_um,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY CAST(date_trunc('day', ts) AS TIMESTAMP)) AS i
  FROM events GROUP BY 1, 2
), holt AS (
  SELECT event_type, day, i, y_um, y_um AS level_um, CAST(0 AS BIGINT) AS trend_um
  FROM daily WHERE i = 1
  UNION ALL
  SELECT d.event_type, d.day, d.i, d.y_um,
         CAST(floor(CAST(d.y_um + h.level_um + h.trend_um AS DOUBLE) / 2.0) AS BIGINT),
         CAST(floor(CAST(h.trend_um
              + (CAST(floor(CAST(d.y_um + h.level_um + h.trend_um AS DOUBLE) / 2.0) AS BIGINT)
                 - h.level_um) AS DOUBLE) / 2.0) AS BIGINT)
  FROM daily d JOIN holt h ON h.event_type = d.event_type AND d.i = h.i + 1
)
SELECT event_type, day,
       level_um, trend_um,
       CAST(level_um AS DOUBLE) / 1000000.0 AS level,
       CAST(trend_um AS DOUBLE) / 1000000.0 AS trend,
       CAST(level_um + trend_um AS DOUBLE) / 1000000.0 AS forecast_next
FROM holt ORDER BY event_type, day
"""


def _holt_kernel(pdf):
    """Per-type Holt recursion with dyadic α=β=1/2 over INTEGER
    micro-unit state, replicating the oracle's recursive CTE op
    sequence verbatim: level' = ⌊(y + level + trend)/2⌋, trend' =
    ⌊(trend + (level' − level))/2⌋ — floor-halving of exact integers
    (Python // floors; the oracle spells floor()/2.0 explicitly, and
    the operands stay < 2^53 so its double detour is exact). Integer
    state ⇒ NO presentation rounding anywhere — the free-double
    version of this recursion produces shallow dyadic rationals whose
    decimal expansions tie exactly at the 6th digit, where Spark's
    HALF_UP and DuckDB's multiply-nearbyint ROUND paths disagree
    (measured at sf0.1)."""
    import pandas as pd

    pdf = pdf.sort_values("day").reset_index(drop=True)
    y = [int(v) for v in pdf["y_um"]]
    levels, trends = [], []
    lv, tr = y[0], 0
    levels.append(lv), trends.append(tr)
    for t in range(1, len(y)):
        nl = (y[t] + lv + tr) // 2
        tr = (tr + (nl - lv)) // 2
        lv = nl
        levels.append(lv), trends.append(tr)
    return pd.DataFrame(
        {"event_type": pdf["event_type"], "day": pdf["day"],
         "level_um": levels, "trend_um": trends}
    )


@register("ts_holt_linear", HOLT_ORACLE)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing of the daily
    per-type totals, with the one-step-ahead forecast level+trend —
    the trend-aware upgrade of ts_ema_smoothing every capacity
    forecast starts from. The COUPLED two-state recursion has no
    window-function closed form (unlike single EMA's lag expansion),
    so this entry is the repo's bridge case: a recursive CTE in the
    oracle ⇄ a per-group Arrow kernel in Spark, kept bit-identical by
    QUANTIZED state — dyadic α=β=1/2 as integer floor-halving of
    micro-units (the dither-free quantized smoother embedded systems
    ship for exactly this reproducibility reason). No ROUND is
    emitted at all: the integer state IS the contract, and the three
    presentation doubles are single divisions of exact ints
    (DETERMINISM.md; a free-double dyadic recursion decimal-ties at
    the 6th digit where the engines' rounding modes split — measured).

    Plan: one partial-agg shuffle of the fact to the day×type grain,
    then ONE ArrowEvalPython over that tiny aggregate (bounded by
    days×types, not row count — the same applyInPandas posture as
    emb_knn_graph's cells)."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).alias("y_um"))
    )
    smoothed = daily.groupBy("event_type").applyInPandas(
        _holt_kernel, "event_type string, day timestamp, level_um long, trend_um long"
    )
    return (
        smoothed.select(
            "event_type", "day", "level_um", "trend_um",
            (F.col("level_um").cast("double") / F.lit(1_000_000.0)).alias("level"),
            (F.col("trend_um").cast("double") / F.lit(1_000_000.0)).alias("trend"),
            ((F.col("level_um") + F.col("trend_um")).cast("double") / F.lit(1_000_000.0)).alias("forecast_next"),
        )
        .orderBy("event_type", "day")
    )
