"""r13 wave: rolling retention, Lorenz concentration bands, brand
repeat-purchase rates, daily up/down streaks, weekly activity streaks.

- ev_rolling_retention is the fixed-offset retention curve (D1/D7/D14)
  the cohort triangle doesn't give directly: for each offset d, the
  share of users active again EXACTLY d days after their first day,
  restricted to users whose first day leaves room for the offset
  inside the corpus horizon (no right-censoring bias — the same
  at-risk discipline as ev_survival_km_censored).
- q_revenue_lorenz_bands is the revenue-concentration (Lorenz) curve
  sampled at power-of-two revenue bands: per band, customer count and
  revenue mass, plus cumulative customer/revenue shares in ppm. The
  window runs over the ≤ ~40-row band grid, NEVER the customer table
  (the ml_auc_exact discipline: global windows only over bounded
  aggregates — a global ntile(10) over customers would be a
  single-partition sort of the whole relation at 100 TB).
- q_brand_repeat_rate is the repeat-purchase loyalty table: per brand,
  buyers with >= 2 distinct orders containing the brand over buyers
  with >= 1, as floor-ppm. The |brands|-bounded output of a
  fact-grain pipeline.
- ts_updown_streaks is the gaps-islands run-length profile of the
  daily-revenue delta sign (up/down/flat runs, longest + counts).
  The global window runs on the CALENDAR-bounded day relation
  (~2.5k rows at any SF), aggregated first.
- ev_weekly_active_streaks is the consecutive-active-weeks histogram:
  per user the longest run of adjacent epoch-weeks with activity
  (wk - row_number() island key), rolled up to (streak_len, n_users).

Determinism: day/week indices are integer datediffs from the 1970-01-01
epoch (never timestamps arithmetic); revenue in integer cents via
round(x*100) BIGINT; band ids via integer bit_length; all ppm
emissions are nonneg BIGINT // BIGINT (rule 29) except the Lorenz
cumulative shares, which route 1e6·cum through DECIMAL(38,0) before
the floor-div (1e6 x sf100 total cents would wrap int64 — the sf1
overflow-gate lesson applied at design time); equality tests on
daily cents are exact-integer, so 'flat' runs are engine-stable.

Scale notes (100 TB): retention pays the distinct-(user,day) shuffle
plus user-grain min and one keyed join back — all hash-partitioned,
output = 3 rows; Lorenz is one customer-grain aggregate then a ≤40-row
band grid (window input is the bounded aggregate); brand repeat is the
partkey join (dim projection broadcast at small SF, shuffle-join at
scale — no hint forced) then order- and customer-grain reductions to a
|brands|-row table; updown aggregates to calendar grain BEFORE its
single-partition window (bounded ~2.5k rows, documented); weekly
streaks window per-user (key-partitioned) and emit a histogram.

Reference parity: the reference ships min/max/avg-style SQL over its
provider tables (duckdb-sudan- src/sudan_extension.cpp:141-210); these
are the OLAP layer a consumer runs on top, re-expressed Spark-first
per SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# ev_rolling_retention — D1/D7/D14 fixed-offset retention, censoring-aware
# ---------------------------------------------------------------------------

RETENTION_OFFSETS = (1, 7, 14)

ROLLING_RETENTION_ORACLE = f"""
WITH d AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS day
  FROM events GROUP BY 1, 2
), f AS (
  SELECT user_id, MIN(day) AS d0 FROM d GROUP BY 1
), mx AS (
  SELECT MAX(day) AS dmax FROM d
), offs AS (
  SELECT * FROM (VALUES {", ".join(f"({o})" for o in RETENTION_OFFSETS)}) AS t(offset_days)
), cohort AS (
  SELECT CAST(o.offset_days AS BIGINT) AS offset_days, f.user_id, f.d0
  FROM f CROSS JOIN offs o CROSS JOIN mx
  WHERE f.d0 + o.offset_days <= mx.dmax
), flags AS (
  SELECT c.offset_days, c.user_id,
         CASE WHEN d.user_id IS NULL THEN 0 ELSE 1 END AS retained
  FROM cohort c
  LEFT JOIN d ON d.user_id = c.user_id AND d.day = c.d0 + c.offset_days
)
SELECT offset_days,
       CAST(COUNT(*) AS BIGINT) AS n_cohort_users,
       CAST(SUM(retained) AS BIGINT) AS n_retained,
       CAST(1000000 * SUM(retained) // COUNT(*) AS BIGINT) AS retention_ppm
FROM flags
GROUP BY offset_days
ORDER BY offset_days
"""


@register("ev_rolling_retention", ROLLING_RETENTION_ORACLE)
def ev_rolling_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    d = (
        e.select(
            "user_id",
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("bigint")
            .alias("day"),
        )
        .groupBy("user_id", "day")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )
    f0 = d.groupBy("user_id").agg(F.min("day").alias("d0"))
    dmax = d.agg(F.max("day").alias("dmax"))
    offs = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(o).cast("bigint") for o in RETENTION_OFFSETS])
        ).alias("offset_days")
    )
    cohort = (
        f0.crossJoin(F.broadcast(offs))
        .crossJoin(F.broadcast(dmax))
        .where(F.col("d0") + F.col("offset_days") <= F.col("dmax"))
        .select("offset_days", "user_id", "d0")
    )
    ret = d.select("user_id", F.col("day").alias("rday"))
    flags = cohort.join(
        ret,
        (cohort.user_id == ret.user_id)
        & (ret.rday == cohort.d0 + cohort.offset_days),
        "left",
    ).select(
        "offset_days",
        F.when(F.col("rday").isNull(), 0).otherwise(1).alias("retained"),
    )
    return (
        flags.groupBy("offset_days")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cohort_users"),
            F.sum("retained").cast("bigint").alias("n_retained"),
        )
        .selectExpr(
            "offset_days",
            "n_cohort_users",
            "n_retained",
            "CAST(1000000 * n_retained div n_cohort_users AS BIGINT) AS retention_ppm",
        )
        .orderBy("offset_days")
    )


# ---------------------------------------------------------------------------
# q_revenue_lorenz_bands — concentration curve on power-of-two revenue bands
# ---------------------------------------------------------------------------

LORENZ_ORACLE = """
WITH cr AS (
  SELECT o_custkey AS ck,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
), banded AS (
  -- band = bitlen(cents) - 1 == floor(log2(cents)) for cents >= 1,
  -- PURE INTEGER (libm log2 of a 2^k-adjacent value is not guaranteed
  -- correctly rounded on both engines — the agg_entropy_bits idiom)
  SELECT CAST(length(printf('%b', cents)) - 1 AS BIGINT) AS band, cents
  FROM cr
), bands AS (
  SELECT band,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(cents) AS BIGINT) AS band_cents
  FROM banded GROUP BY band
), cum AS (
  SELECT band, n_customers, band_cents,
         SUM(n_customers) OVER (ORDER BY band ROWS UNBOUNDED PRECEDING) AS cum_cust,
         SUM(band_cents) OVER (ORDER BY band ROWS UNBOUNDED PRECEDING) AS cum_cents,
         SUM(n_customers) OVER () AS tot_cust,
         SUM(band_cents) OVER () AS tot_cents
  FROM bands
)
SELECT band, n_customers, band_cents,
       -- HUGEINT //, not DECIMAL //: DuckDB's DECIMAL floor-div rounds
       -- the quotient to the result scale BEFORE flooring (rule 29 —
       -- 666.67 -> 667, a real +1 divergence caught at registration);
       -- HUGEINT // is true integer division and matches Spark's
       -- DECIMAL(38,0) div exactly on nonneg operands
       CAST(1000000 * CAST(cum_cust AS HUGEINT) // CAST(tot_cust AS HUGEINT) AS BIGINT) AS cum_customers_ppm,
       CAST(1000000 * CAST(cum_cents AS HUGEINT) // CAST(tot_cents AS HUGEINT) AS BIGINT) AS cum_cents_ppm
FROM cum
ORDER BY band
"""


@register("q_revenue_lorenz_bands", LORENZ_ORACLE)
def q_revenue_lorenz_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer revenue concentration sampled at power-of-two bands:
    band = bitlen(cents) − 1 ≡ floor(log2(cents)) for cents ≥ 1,
    computed PURE-INTEGER via the agg_entropy_bits bitlen idiom
    (DuckDB length(printf('%b',x)) ≡ Spark length(conv(x,10,2)) —
    libm log2 near a power of two is not guaranteed correctly rounded
    on both engines). Window input is the ≤ ~40-row band grid, never
    the customer relation."""
    o = load_table(spark, sf_dir, "orders")
    cr = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.expr("CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)").alias(
            "cents"
        )
    )
    bands = (
        cr.select(
            (F.length(F.conv(F.col("cents").cast("string"), 10, 2)) - 1)
            .cast("bigint")
            .alias("band"),
            "cents",
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("cents").cast("bigint").alias("band_cents"),
        )
    )
    wcum = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        bands.select(
            "band",
            "n_customers",
            "band_cents",
            F.sum("n_customers").over(wcum).alias("cum_cust"),
            F.sum("band_cents").over(wcum).alias("cum_cents"),
            F.sum("n_customers").over(wall).alias("tot_cust"),
            F.sum("band_cents").over(wall).alias("tot_cents"),
        )
        .selectExpr(
            "band",
            "n_customers",
            "band_cents",
            "CAST(1000000 * CAST(cum_cust AS DECIMAL(38,0)) div CAST(tot_cust AS DECIMAL(38,0)) AS BIGINT) AS cum_customers_ppm",
            "CAST(1000000 * CAST(cum_cents AS DECIMAL(38,0)) div CAST(tot_cents AS DECIMAL(38,0)) AS BIGINT) AS cum_cents_ppm",
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# q_brand_repeat_rate — repeat-purchase loyalty per brand
# ---------------------------------------------------------------------------

BRAND_REPEAT_ORACLE = """
WITH ob AS (
  SELECT o.o_custkey AS ck, p.p_brand AS brand, l.l_orderkey AS ok
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2, 3
), cb AS (
  SELECT ck, brand, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM ob GROUP BY 1, 2
)
SELECT brand,
       CAST(COUNT(*) AS BIGINT) AS n_buyers,
       CAST(count_if(n_orders >= 2) AS BIGINT) AS n_repeat_buyers,
       CAST(SUM(n_orders) AS BIGINT) AS n_brand_orders,
       CAST(1000000 * count_if(n_orders >= 2) // COUNT(*) AS BIGINT) AS repeat_ppm
FROM cb
GROUP BY brand
ORDER BY brand
"""


@register("q_brand_repeat_rate", BRAND_REPEAT_ORACLE)
def q_brand_repeat_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    ob = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("ck"),
            F.col("p_brand").alias("brand"),
            F.col("l_orderkey").alias("ok"),
        )
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )
    cb = ob.groupBy("ck", "brand").agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    return (
        cb.groupBy("brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buyers"),
            F.count_if(F.col("n_orders") >= 2).cast("bigint").alias("n_repeat_buyers"),
            F.sum("n_orders").cast("bigint").alias("n_brand_orders"),
        )
        .selectExpr(
            "brand",
            "n_buyers",
            "n_repeat_buyers",
            "n_brand_orders",
            "CAST(1000000 * n_repeat_buyers div n_buyers AS BIGINT) AS repeat_ppm",
        )
        .orderBy("brand")
    )


# ---------------------------------------------------------------------------
# ts_updown_streaks — run-length profile of the daily revenue delta sign
# ---------------------------------------------------------------------------

UPDOWN_ORACLE = """
WITH dr AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
), s AS (
  SELECT day, cents,
         cents - lag(cents) OVER (ORDER BY day) AS delta
  FROM dr
), signed AS (
  SELECT day,
         CASE WHEN delta > 0 THEN 'up' WHEN delta < 0 THEN 'down' ELSE 'flat' END AS direction
  FROM s WHERE delta IS NOT NULL
), islands AS (
  SELECT direction,
         row_number() OVER (ORDER BY day)
           - row_number() OVER (PARTITION BY direction ORDER BY day) AS grp
  FROM signed
), runs AS (
  SELECT direction, grp, CAST(COUNT(*) AS BIGINT) AS len
  FROM islands GROUP BY 1, 2
)
SELECT direction,
       CAST(COUNT(*) AS BIGINT) AS n_runs,
       CAST(MAX(len) AS BIGINT) AS longest_run,
       CAST(SUM(len) AS BIGINT) AS total_days
FROM runs
GROUP BY direction
ORDER BY direction
"""


@register("ts_updown_streaks", UPDOWN_ORACLE)
def ts_updown_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-islands over the SIGN of the day-over-day revenue delta.
    The single-partition windows run on the calendar-bounded daily
    aggregate (~2.5k rows at ANY SF — the corpus horizon, not the
    data volume, bounds the relation), per the ml_auc_exact
    window-input-is-the-aggregate discipline. Delta compares exact
    integer cents, so 'flat' is engine-stable."""
    o = load_table(spark, sf_dir, "orders")
    dr = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.expr("CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)").alias(
            "cents"
        )
    )
    wday = Window.orderBy("day")
    signed = (
        dr.select("day", (F.col("cents") - F.lag("cents").over(wday)).alias("delta"))
        .where(F.col("delta").isNotNull())
        .select(
            "day",
            F.when(F.col("delta") > 0, "up")
            .when(F.col("delta") < 0, "down")
            .otherwise("flat")
            .alias("direction"),
        )
    )
    islands = signed.select(
        "direction",
        (
            F.row_number().over(Window.orderBy("day"))
            - F.row_number().over(Window.partitionBy("direction").orderBy("day"))
        ).alias("grp"),
    )
    runs = islands.groupBy("direction", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("len")
    )
    return (
        runs.groupBy("direction")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_runs"),
            F.max("len").cast("bigint").alias("longest_run"),
            F.sum("len").cast("bigint").alias("total_days"),
        )
        .orderBy("direction")
    )


# ---------------------------------------------------------------------------
# ev_weekly_active_streaks — consecutive-active-weeks histogram
# ---------------------------------------------------------------------------

WEEKLY_STREAKS_ORACLE = """
WITH uw AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS BIGINT) AS wk
  FROM events GROUP BY 1, 2
), g AS (
  SELECT user_id, wk,
         wk - row_number() OVER (PARTITION BY user_id ORDER BY wk) AS grp
  FROM uw
), runs AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len
  FROM g GROUP BY user_id, grp
), longest AS (
  SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_weeks
  FROM runs GROUP BY 1
)
SELECT longest_weeks, CAST(COUNT(*) AS BIGINT) AS n_users
FROM longest
GROUP BY longest_weeks
ORDER BY longest_weeks
"""


@register("ev_weekly_active_streaks", WEEKLY_STREAKS_ORACLE)
def ev_weekly_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    uw = (
        e.select(
            "user_id",
            F.expr(
                "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') div 7 AS BIGINT)"
            ).alias("wk"),
        )
        .groupBy("user_id", "wk")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )
    wuser = Window.partitionBy("user_id").orderBy("wk")
    g = uw.select(
        "user_id", "wk", (F.col("wk") - F.row_number().over(wuser)).alias("grp")
    )
    runs = g.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("len")
    )
    longest = runs.groupBy("user_id").agg(F.max("len").cast("bigint").alias("longest_weeks"))
    return (
        longest.groupBy("longest_weeks")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("longest_weeks")
    )
