"""r7 second OLAP wave: experimentation + time-series diagnostics —
A/B-test lift with a z-statistic, exponential smoothing, and CUSUM
changepoint detection.

Determinism posture (the repo-wide contract, see text2.py's header):
everything hashable is decided by integer arithmetic (md5-hex variant
assignment, micro-unit value sums, dyadic EMA weights, the
n-scaled CUSUM identity) and the few emitted doubles come from a FIXED
sequence of exactly-rounded IEEE ops (division, multiply, add, sqrt)
repeated verbatim in the oracle — no ln/log2 anywhere (JVM and glibc
libm disagree at the last ulp).

Reference parity: the reference engine exposes the generic SQL surface
these are built from (window frames, conditional aggregation — see
src/sudan/*_functions.cpp register sites); these entries are the
analytics compositions a user of that surface writes on day one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# ev_ab_test_lift — hash-bucketed experiment readout with z-statistic
# ---------------------------------------------------------------------------

AB_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         CAST(CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 4) AS INTEGER) % 2 AS BIGINT) AS variant,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   > SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              THEN 1 ELSE 0 END AS converted
  FROM events
  GROUP BY user_id
), agg AS (
  SELECT
    SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n_a,
    SUM(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS conv_a,
    SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n_b,
    SUM(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS conv_b
  FROM per_user
)
SELECT
  CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
  CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
  ROUND(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS cvr_a,
  ROUND(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS cvr_b,
  ROUND(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS abs_lift,
  CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b THEN
    ROUND(
      (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
       - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
      / sqrt(
          (CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
          * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
          * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))
        ), 6)
  END AS zstat
FROM agg
"""


@register("ev_ab_test_lift", AB_ORACLE)
def ev_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B readout: users hash-split into variants by
    md5 (content-independent, cluster-size-independent — the same
    cross-engine-deterministic assignment family as
    dataset_shard_assign), conversion = the user purchased more often than they clicked (an
    SF-invariant, interior-rate definition on this synthetic corpus —
    'any purchase' saturates at 100%), then
    conversion rates, absolute lift, and the pooled two-proportion
    z-statistic. The experiment readout every product-analytics stack
    recomputes hourly.

    Plan: one partial-agg shuffle on user_id (per-user converted
    flag), then ONE global conditional aggregation to a single row —
    no pivot, no second shuffle of data (the 4-counter relation is a
    scalar). At 100 TB the user-grain aggregate is the only real
    shuffle and it map-side combines; the z arithmetic is a fixed
    sequence of exactly-rounded IEEE ops repeated verbatim in the
    oracle, so the statistic hashes exactly."""
    e = load_table(spark, sf_dir, "events")
    variant = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("bigint") % 2
    )
    per_user = (
        e.groupBy("user_id")
        .agg(
            (
                F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
                > F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            ).cast("int").alias("converted")
        )
        .select(variant.alias("variant"), "converted")
    )
    agg = per_user.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted")).otherwise(0)).cast("bigint").alias("conv_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("variant") == 1, F.col("converted")).otherwise(0)).cast("bigint").alias("conv_b"),
    )
    p_a = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    p_b = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    p_pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (F.col("n_a") + F.col("n_b")).cast("double")
    se = F.sqrt(p_pool * (F.lit(1.0) - p_pool) * (F.lit(1.0) / F.col("n_a").cast("double") + F.lit(1.0) / F.col("n_b").cast("double")))
    return agg.select(
        "n_a", "conv_a", "n_b", "conv_b",
        F.round(p_a, 6).alias("cvr_a"),
        F.round(p_b, 6).alias("cvr_b"),
        F.round(p_a - p_b, 6).alias("abs_lift"),
        F.when(
            (F.col("conv_a") + F.col("conv_b") > 0)
            & (F.col("conv_a") + F.col("conv_b") < F.col("n_a") + F.col("n_b")),
            F.round((p_a - p_b) / se, 6),
        ).alias("zstat"),
    )


# ---------------------------------------------------------------------------
# ts_ema_smoothing — dyadic-weight exponential moving average
# ---------------------------------------------------------------------------

EMA_H = 8  # truncated horizon; alpha = 1/2 -> weights 2^(H-1-k), all dyadic


def _ema_sql_terms() -> tuple[str, str]:
    """num/den SQL snippets: weight 2^(H-1-k) on lag k, partial windows
    drop missing lags from BOTH sums."""
    num, den = [], []
    for k in range(EMA_H):
        w = 1 << (EMA_H - 1 - k)
        lagged = f"lag(x, {k}) OVER w" if k else "x"
        num.append(f"COALESCE({w} * {lagged}, 0)")
        den.append(f"CASE WHEN {lagged} IS NOT NULL THEN {w} ELSE 0 END")
    return " + ".join(num), " + ".join(den)


_EMA_NUM, _EMA_DEN = _ema_sql_terms()

EMA_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY event_type, day
)
SELECT event_type, day, x,
       ROUND(CAST({_EMA_NUM} AS DOUBLE) / CAST({_EMA_DEN} AS DOUBLE) / 1000000.0, 6) AS ema
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day)
ORDER BY event_type, day
"""


@register("ts_ema_smoothing", EMA_ORACLE)
def ts_ema_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential moving average over per-type daily value totals,
    alpha = 1/2 truncated at 8 observations. The dyadic alpha is
    the determinism trick: every weight is a power of two, so the
    numerator/denominator are EXACT bigint sums and the only doubles
    are one division + one scale + ROUND, repeated verbatim in the
    oracle. (A general alpha is the same plan with double weights —
    the truncation, not the weight value, is what makes it a window
    function instead of a sequential recurrence.)

    Plan: one partial-agg shuffle to the per-(type, day) relation,
    then 8 lag() calls over ONE window spec — Spark fuses same
    -spec window functions into a single Window node, so this is one
    sort within the aggregated relation, not 8 passes. At
    100 TB the daily aggregate is ~types x days rows — tiny — and the
    heavy shuffle is the map-side-combinable daily SUM."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("day")
        ).agg(F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).alias("x"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    num = F.lit(0).cast("bigint")
    den = F.lit(0).cast("bigint")
    for k in range(EMA_H):
        weight = 1 << (EMA_H - 1 - k)
        lagged = F.lag("x", k).over(w) if k else F.col("x")
        num = num + F.coalesce(F.lit(weight).cast("bigint") * lagged, F.lit(0))
        den = den + F.when(lagged.isNotNull(), weight).otherwise(0)
    return (
        daily.select(
            "event_type", "day", "x",
            F.round(num.cast("double") / den.cast("double") / F.lit(1_000_000.0), 6).alias("ema"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# ts_changepoint_cusum — integer-exact CUSUM mean-shift detection
# ---------------------------------------------------------------------------

CUSUM_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY event_type, day
), stats AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t_rows, CAST(SUM(x) AS BIGINT) AS total
  FROM daily GROUP BY event_type
), curve AS (
  SELECT d.event_type, d.day, d.x,
         CAST(s.t_rows * SUM(d.x) OVER (PARTITION BY d.event_type ORDER BY d.day)
              - (ROW_NUMBER() OVER (PARTITION BY d.event_type ORDER BY d.day)) * s.total
              AS BIGINT) AS cusum_scaled
  FROM daily d JOIN stats s ON d.event_type = s.event_type
)
SELECT event_type, day, x, cusum_scaled,
       abs(cusum_scaled) = MAX(abs(cusum_scaled)) OVER (PARTITION BY event_type) AS is_peak
FROM curve
ORDER BY event_type, day
"""


@register("ts_changepoint_cusum", CUSUM_ORACLE)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift detection on per-type daily event counts. The
    textbook statistic S_t = sum(x_i - mean) is kept EXACT by scaling
    through the row count: T*cumsum_t - t*total is the same curve
    times T, all bigint — the argmax (flagged is_peak) is the
    estimated changepoint, identical to the float CUSUM's argmax
    because scaling by T > 0 preserves order. Zero doubles anywhere.

    Plan: daily partial-agg shuffle, a broadcast-sized per-type stats
    relation joined back, one window sort per type for the cumulative
    sum, one unordered window max for the peak flag. At 100 TB the
    curve relation is days x types — the raw-event shuffle is the only
    scan-proportional stage and it map-side combines."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("t_rows"), F.sum("x").alias("total")
    )
    w_ord = Window.partitionBy("event_type").orderBy("day")
    w_all = Window.partitionBy("event_type")
    curve = (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type", "day", "x",
            (
                F.col("t_rows") * F.sum("x").over(w_ord)
                - F.row_number().over(w_ord).cast("bigint") * F.col("total")
            ).alias("cusum_scaled"),
        )
    )
    return (
        curve.select(
            "event_type", "day", "x", "cusum_scaled",
            (F.abs(F.col("cusum_scaled")) == F.max(F.abs(F.col("cusum_scaled"))).over(w_all)).alias("is_peak"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# join_bloom_runtime_filter — runtime semi-join reduction (Bloom)
# ---------------------------------------------------------------------------

BLOOM_ORACLE = """
SELECT l.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 400000
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""


@register("join_bloom_runtime_filter", BLOOM_ORACLE)
def join_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third runtime-pruning tier after static pushdown and DPP:
    when the selective dim side of a SHUFFLE join is too big to
    broadcast (the normal state at 100 TB), Spark's InjectRuntimeFilter
    builds a Bloom filter from the dim keys and applies might_contain()
    on the fact side BEFORE its shuffle — fact rows that cannot match
    never leave the map stage. The rule deliberately skips joins it
    would rather broadcast, so this entry pins the shuffle-join regime
    explicitly (autoBroadcastJoinThreshold=-1 for the query, restored
    after planning) — at scale that regime is reached naturally and no
    conf is touched. Result is layout/strategy-agnostic (plain join ⋈
    agg, oracled); the might_contain injection is pinned by a plan
    test. Integer-cents revenue for hash exactness."""
    from duckdb_sudan__spark.session import load_table as _lt

    saved_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    saved_thr = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB"
    )
    try:
        li = _lt(spark, sf_dir, "lineitem")
        o = _lt(spark, sf_dir, "orders")
        dim = o.where(
            (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 400000)
        ).select("o_orderkey")
        out = (
            li.join(dim, li.l_orderkey == dim.o_orderkey)
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
                .cast("bigint")
                .alias("revenue_cents"),
            )
            .orderBy("l_returnflag")
        )
        # force plan resolution under the pinned confs (the optimized
        # plan is cached on the DataFrame's QueryExecution)
        out._jdf.queryExecution().optimizedPlan()
        return out
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_bc)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            saved_thr,
        )


# ---------------------------------------------------------------------------
# agg_entropy_bits — log-free Shannon-entropy companion to Gini
# ---------------------------------------------------------------------------

ENTROPY_ORACLE = """
WITH c AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM documents GROUP BY lang, source
), agg AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_sources,
         CAST(SUM(cnt) AS BIGINT) AS total,
         CAST(SUM(cnt * length(printf('%b', cnt))) AS BIGINT) AS sum_cnt_bits
  FROM c GROUP BY lang
)
SELECT lang, n_sources, total,
       CAST(total * length(printf('%b', total)) - sum_cnt_bits AS BIGINT) AS entropy_scaled_bits,
       ROUND(CAST(total * length(printf('%b', total)) - sum_cnt_bits AS DOUBLE)
             / CAST(total AS DOUBLE), 6) AS mean_bits
FROM agg
ORDER BY lang
"""


@register("agg_entropy_bits", ENTROPY_ORACLE)
def agg_entropy_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon-entropy diversity of each language's source mix, in the
    same log-free integer form as text_perplexity_proxy: per-source
    surprisal log2(total/cnt) approximated by bitlen(total)−bitlen(cnt)
    (within 1 bit per term), weighted by cnt — entropy_scaled_bits =
    total·bitlen(total) − Σ cnt·bitlen(cnt), ALL bigint arithmetic.
    agg_gini_diversity ships the polynomial diversity measure because
    true entropy() is libm-unstable across engines (its docstring);
    this entry closes that gap with an oracled entropy in bit units —
    the number a training-mix dashboard actually labels 'entropy'.
    Two map-combinable aggregations, no join, no window."""
    d = load_table(spark, sf_dir, "documents")

    def bitlen(col):
        return F.length(F.conv(col.cast("string"), 10, 2)).cast("bigint")

    c = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("cnt"))
    agg = c.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sources"),
        F.sum("cnt").cast("bigint").alias("total"),
        F.sum(F.col("cnt") * bitlen(F.col("cnt"))).cast("bigint").alias("sum_cnt_bits"),
    )
    scaled = F.col("total") * bitlen(F.col("total")) - F.col("sum_cnt_bits")
    return agg.select(
        "lang", "n_sources", "total",
        scaled.cast("bigint").alias("entropy_scaled_bits"),
        F.round(scaled.cast("double") / F.col("total").cast("double"), 6).alias("mean_bits"),
    ).orderBy("lang")
