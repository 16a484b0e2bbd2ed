"""r9 OLAP wave 1: the dynamic-PIVOT parity entry the r8 verdict named
as the one OLAP-surface hole a DuckDB user would notice.

DuckDB's PIVOT statement (reference engine: the duckdb PIVOT binder)
runs an EAGER first job to enumerate the distinct ON-values, then
binds one output column per value. Spark's `.pivot(col)` WITHOUT an
explicit values list is the same two-job shape: an eager distinct on
the pivot column at analysis time, then the pivoted aggregate. Both
engines therefore derive the output schema FROM THE DATA — the form
pivot_status / pivot_multi_agg deliberately avoid (they pass explicit
IN lists to skip the pre-job); this entry exists to cover the dynamic
form a DuckDB `PIVOT ... ON col` user actually runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# pivot_dynamic — engine-derived IN list (eager two-job form)
# ---------------------------------------------------------------------------
# Column-name parity: DuckDB names each pivoted column by the VALUE
# ('click', 'error', ...); Spark's dynamic pivot does the same, so the
# driver's sort-columns-by-name hash lines up with no aliasing. The
# COUNT cell for an absent (cohort, value) combo is 0 in DuckDB's
# PIVOT and NULL in Spark's — coalesced to 0 over the runtime-derived
# column list (the post-analysis schema IS the distinct job's output,
# so this stays fully dynamic).

PIVOT_DYNAMIC_ORACLE = """
PIVOT (SELECT user_id % 10 AS cohort, event_type, 1 AS one FROM events)
ON event_type USING COUNT(one)
GROUP BY cohort
ORDER BY cohort
"""


@register("pivot_dynamic", PIVOT_DYNAMIC_ORACLE)
def pivot_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic pivot of event counts by (user cohort × event_type):
    `.pivot('event_type')` with NO values list — Spark runs the same
    eager distinct pre-job DuckDB's PIVOT binder runs, and the output
    schema is derived from the data on both engines. Two jobs by
    design (documented in the plan test); the main job is one
    partial-agg shuffle on cohort."""
    e = load_table(spark, sf_dir, "events")
    p = (
        e.select((F.col("user_id") % 10).alias("cohort"), "event_type")
        .groupBy("cohort")
        .pivot("event_type")
        .count()
    )
    vals = sorted(c for c in p.columns if c != "cohort")
    return p.select(
        "cohort", *[F.coalesce(F.col(f"`{c}`"), F.lit(0)).alias(c) for c in vals]
    ).orderBy("cohort")


# ---------------------------------------------------------------------------
# unpivot_dynamic — the UNPIVOT twin of pivot_dynamic
# ---------------------------------------------------------------------------
# DuckDB's UNPIVOT ... ON COLUMNS(* EXCLUDE ...) derives the melted
# column list from the input SCHEMA; Spark's df.unpivot(ids, None, ...)
# does exactly the same (values=None melts every non-id column). The
# wide input here is the dynamic pivot itself, so the pair round-trips:
# schema-derived wide -> schema-derived long.

UNPIVOT_DYNAMIC_ORACLE = """
SELECT * FROM (
  UNPIVOT (
    PIVOT (SELECT o_orderpriority, o_orderstatus, 1 AS one FROM orders)
    ON o_orderstatus USING COUNT(one) GROUP BY o_orderpriority
  ) ON COLUMNS(* EXCLUDE (o_orderpriority)) INTO NAME status VALUE n_orders
) ORDER BY o_orderpriority, status
"""


@register("unpivot_dynamic", UNPIVOT_DYNAMIC_ORACLE)
def unpivot_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt the dynamic status pivot back to long form with a
    schema-derived column list on BOTH engines (no hand-written value
    list anywhere). Missing (priority, status) combos surface as 0 on
    both sides (coalesce before the melt mirrors PIVOT's 0-fill).
    Plan: the pivot's partial-agg exchanges plus a zero-shuffle
    Expand for the melt."""
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.select("o_orderpriority", "o_orderstatus")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus")
        .count()
    )
    vals = sorted(c for c in wide.columns if c != "o_orderpriority")
    wide = wide.select(
        "o_orderpriority", *[F.coalesce(F.col(f"`{c}`"), F.lit(0)).alias(c) for c in vals]
    )
    return (
        wide.unpivot(["o_orderpriority"], None, "status", "n_orders")
        .orderBy("o_orderpriority", "status")
    )


# ---------------------------------------------------------------------------
# orders_basket_pairs — brand co-occurrence (market-basket affinity)
# ---------------------------------------------------------------------------
# The classic "customers who bought X also bought Y" aggregate. Scale
# shape: the self-join is keyed on l_orderkey, and an order has at
# most ~7 lines, so pairs-per-order is bounded by C(7,2) — the join
# output is LINEAR in the fact table, never quadratic (the same
# bounded-group argument as the banded dedup tiers). The part dim
# broadcasts; top-20 is a fully-ordered limit.

BASKET_PAIRS_ORACLE = """
WITH lines AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM lines a JOIN lines b
  ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
GROUP BY 1, 2
ORDER BY n_orders DESC, brand_a, brand_b
LIMIT 20
"""


@register("orders_basket_pairs", BASKET_PAIRS_ORACLE)
def orders_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 co-purchased brand pairs. The part lookup is left to AQE
    (part scales with SF — broadcast at test scale, shuffle join on
    partkey at 100 TB); the distinct (order, brand) grain and the pair
    join both key on l_orderkey so the self-join output is bounded by
    C(order_size, 2) per order."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    lines = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = lines.select(F.col("l_orderkey").alias("k"), F.col("p_brand").alias("brand_a"))
    b = lines.select(F.col("l_orderkey").alias("k"), F.col("p_brand").alias("brand_b"))
    return (
        a.join(b, "k")
        .where(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "brand_a", "brand_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# ev_user_overlap_jaccard — audience overlap between event types
# ---------------------------------------------------------------------------
# Jaccard of the distinct-user audiences of every event-type pair.
# Scale shape: the self-join is keyed on user_id and a user touches at
# most |event_types| (5) types, so join output ≤ C(5,2) per user —
# linear. The similarity is emitted as a floor-ppm integer computed
# in DOUBLE (floor(1e6·num/den)) — deterministic on both engines at
# ANY scale (IEEE ops are correctly rounded; a bigint 1e6·num div
# would overflow int64 once num exceeds ~9.2e12) and exact while
# 1e6·num < 2^53; no ROUND anywhere, so no rounding-tie exposure.

USER_OVERLAP_ORACLE = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ut GROUP BY event_type),
boths AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_both, ta.n AS n_a, tb.n AS n_b,
       CAST(floor(1000000.0 * CAST(n_both AS DOUBLE) / CAST(ta.n + tb.n - n_both AS DOUBLE)) AS BIGINT) AS jaccard_ppm
FROM boths JOIN tot ta ON ta.event_type = type_a
           JOIN tot tb ON tb.event_type = type_b
ORDER BY type_a, type_b
"""


@register("ev_user_overlap_jaccard", USER_OVERLAP_ORACLE)
def ev_user_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    tot = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    boths = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    ta = tot.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    tb = tot.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        boths.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .select(
            "type_a", "type_b", "n_both", "n_a", "n_b",
            F.floor(1000000.0 * F.col("n_both").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast("double")).cast("bigint").alias("jaccard_ppm"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# ts_cumulative_distinct_users — the "total users ever" growth curve
# ---------------------------------------------------------------------------
# Cumulative COUNT(DISTINCT user) per day without ever running a
# distinct-over-window: each user contributes once at their FIRST day
# (map-combinable min), the daily grain is calendar-bounded, and the
# running sum is a window over day rows only. The global-order window
# sits on ~hundreds of rows — the raw table never sees it.

CUM_USERS_ORACLE = """
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS d
  FROM events GROUP BY user_id
), daily AS (
  SELECT d, CAST(COUNT(*) AS BIGINT) AS new_users FROM firsts GROUP BY d
)
SELECT d, new_users,
       CAST(SUM(new_users) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
FROM daily ORDER BY d
"""


@register("ts_cumulative_distinct_users", CUM_USERS_ORACLE)
def ts_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(F.date_trunc("day", F.min("ts")).alias("d"))
    daily = firsts.groupBy("d").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "d", "new_users", F.sum("new_users").over(w).cast("bigint").alias("cum_users")
    ).orderBy("d")


# ---------------------------------------------------------------------------
# ev_inter_event_gaps — per-type inter-arrival statistics
# ---------------------------------------------------------------------------
# Gap = microseconds between a user's consecutive events of the same
# type (unix_micros ≡ epoch_us — the memory-catalogued ±1s lag pitfall
# of second-truncating first). One (user, type) window, integer sums.

INTER_EVENT_ORACLE = """
WITH s AS (
  SELECT event_type,
         epoch_us(ts) - epoch_us(lag(ts) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id)) AS gap_us
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
       CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us
FROM s WHERE gap_us IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


@register("ev_inter_event_gaps", INTER_EVENT_ORACLE)
def ev_inter_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = e.select(
        "event_type",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_us").cast("bigint").alias("min_gap_us"),
            F.max("gap_us").cast("bigint").alias("max_gap_us"),
            F.sum("gap_us").cast("bigint").alias("sum_gap_us"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# dt_business_days — weekday-count arithmetic between two dates
# ---------------------------------------------------------------------------
# Business days in [o_orderdate, l_shipdate) via pure INTEGER epoch-day
# arithmetic — g(n) = 5·((n+3) div 7) + least((n+3) mod 7, 5) counts
# weekdays in [1970-01-01, day n) (the +3 aligns to the Monday
# 1969-12-29; all served dates are positive epoch days so div/mod
# agree across engines). No engine weekday() anywhere: DuckDB's dow is
# 0=Sunday, Spark's dayofweek is 1=Sunday — the formula sidesteps the
# off-by-one class entirely.

BUSINESS_DAYS_ORACLE = """
WITH j AS (
  SELECT o_orderpriority,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d0,
         CAST(CAST(l_shipdate  AS DATE) - DATE '1970-01-01' AS BIGINT) AS d1
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), b AS (
  SELECT o_orderpriority,
         (5 * ((d1 + 3) // 7) + least((d1 + 3) % 7, 5))
       - (5 * ((d0 + 3) // 7) + least((d0 + 3) % 7, 5)) AS bdays
  FROM j
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(bdays) AS BIGINT) AS sum_bdays,
       CAST(MIN(bdays) AS BIGINT) AS min_bdays,
       CAST(MAX(bdays) AS BIGINT) AS max_bdays
FROM b GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@register("dt_business_days", BUSINESS_DAYS_ORACLE)
def dt_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship business-day statistics per priority. Plan: the
    orders⋈lineitem join is left to AQE — at test SF the 3-column
    orders projection broadcasts; at 100 TB both fact tables shuffle
    on orderkey (never force-broadcast a fact table). The weekday
    arithmetic is pure codegen; one partial-agg shuffle on priority."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")

    d0 = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")).cast("bigint")
    d1 = F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date")).cast("bigint")

    def g(n):
        # epoch days are all positive here, so floor((n+3)/7) == (n+3) div 7
        return 5 * F.floor((n + 3) / 7).cast("bigint") + F.least((n + 3) % 7, F.lit(5))

    bdays = (g(d1) - g(d0)).alias("bdays")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("o_orderpriority", bdays)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("bdays").cast("bigint").alias("sum_bdays"),
            F.min("bdays").cast("bigint").alias("min_bdays"),
            F.max("bdays").cast("bigint").alias("max_bdays"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# ev_session_depth_histogram — distribution of events-per-session
# ---------------------------------------------------------------------------
# Composes the gaps-islands sessionizer (30-min inactivity, the
# ev_sessionize contract) into the downstream histogram a product
# dashboard shows. All three windows share the (user) partition so
# they ride ONE shuffle; the histogram grain is tiny.

SESSION_DEPTH_ORACLE = """
WITH s AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), t AS (
  SELECT user_id,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sess
  FROM s
), d AS (
  SELECT user_id, sess, CAST(COUNT(*) AS BIGINT) AS depth
  FROM t GROUP BY user_id, sess
)
SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM d GROUP BY depth ORDER BY depth
"""


@register("ev_session_depth_histogram", SESSION_DEPTH_ORACLE)
def ev_session_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1000000), 1).otherwise(0)
    sess = F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    depths = (
        e.select("user_id", "ts", "event_id")
        .select("user_id", sess.alias("sess"))
        .groupBy("user_id", "sess")
        .agg(F.count(F.lit(1)).alias("depth"))
    )
    return (
        depths.groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy("depth")
    )


# ---------------------------------------------------------------------------
# ml_target_encoding_loo — leakage-free leave-one-out target encoding
# ---------------------------------------------------------------------------
# The feature-engineering twin of ml_pointintime_features: encode a
# categorical column by the mean target of the OTHER rows in its
# category — the standard trick that avoids self-leakage without a
# fold split. Exact integer arithmetic: targets in micro-units
# (o_totalprice has 2 decimals), the encoded value emitted as
# numerator/denominator plus an integer-division mean — no float
# division, no rounding ties. Plan: one category aggregate (5 rows)
# broadcast back onto the fact scan; no window, no self-join.

TARGET_LOO_ORACLE = """
WITH agg AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_cat,
         CAST(SUM(CAST(round(o_totalprice * 1000000) AS BIGINT)) AS BIGINT) AS sum_micro
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderkey, o.o_orderpriority,
       CAST(sum_micro - CAST(round(o_totalprice * 1000000) AS BIGINT) AS BIGINT) AS loo_num_micro,
       CAST(n_cat - 1 AS BIGINT) AS loo_den,
       CAST((sum_micro - CAST(round(o_totalprice * 1000000) AS BIGINT)) // (n_cat - 1) AS BIGINT) AS loo_mean_micro
FROM orders o JOIN agg USING (o_orderpriority)
WHERE n_cat > 1
ORDER BY o_orderkey
"""


@register("ml_target_encoding_loo", TARGET_LOO_ORACLE)
def ml_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    micro = F.round(F.col("o_totalprice") * 1000000).cast("bigint")
    agg = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_cat"),
        F.sum(micro).cast("bigint").alias("sum_micro"),
    )
    num = (F.col("sum_micro") - micro).cast("bigint")
    return (
        o.join(F.broadcast(agg), "o_orderpriority")
        .where(F.col("n_cat") > 1)  # LOO undefined for singletons; // 0 diverges across engines
        .select(
            "o_orderkey",
            "o_orderpriority",
            num.alias("loo_num_micro"),
            (F.col("n_cat") - 1).cast("bigint").alias("loo_den"),
            F.expr(
                "(sum_micro - CAST(round(o_totalprice * 1000000) AS BIGINT)) div (n_cat - 1)"
            ).cast("bigint").alias("loo_mean_micro"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# ml_feature_crosses_hashed — the hashing-trick feature cross
# ---------------------------------------------------------------------------
# Cross (event_type × day-of-week) hashed into a fixed bucket space —
# the classic wide-model featurizer. The bucket hash rides the
# md5-hex route (dataset_shard_assign's idiom: Spark hash() and DuckDB
# hash() are different algorithms, md5 is the cross-engine-exact one);
# dow comes from epoch-day arithmetic, not engine weekday() (see
# dt_business_days). Map-side bucket id, one partial-agg shuffle.

CROSS_BUCKETS = 64

FEATURE_CROSS_ORACLE = f"""
WITH f AS (
  SELECT event_type,
         CAST((CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) + 3) % 7 AS BIGINT) AS dow,
         CAST(round(value * 1000000) AS BIGINT) AS v_micro
  FROM events
), h AS (
  SELECT event_type, dow, v_micro,
         CAST(CAST('0x' || substring(md5(event_type || '|' || CAST(dow AS VARCHAR)), 1, 8) AS BIGINT)
              % {CROSS_BUCKETS} AS BIGINT) AS bucket
  FROM f
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT event_type || '|' || CAST(dow AS VARCHAR)) AS BIGINT) AS n_crosses,
       CAST(SUM(v_micro) AS BIGINT) AS sum_value_micro
FROM h GROUP BY bucket ORDER BY bucket
"""


@register("ml_feature_crosses_hashed", FEATURE_CROSS_ORACLE)
def ml_feature_crosses_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    dow = (
        (F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).cast("bigint") + 3) % 7
    )
    cross = F.concat_ws("|", F.col("event_type"), dow.cast("string"))
    bucket = (
        F.conv(F.substring(F.md5(cross), 1, 8), 16, 10).cast("bigint") % CROSS_BUCKETS
    )
    return (
        e.select(
            bucket.alias("bucket"),
            cross.alias("cross"),
            F.round(F.col("value") * 1000000).cast("bigint").alias("v_micro"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("cross").alias("n_crosses"),
            F.sum("v_micro").cast("bigint").alias("sum_value_micro"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# win_top_movers_wow — week-over-week top movers
# ---------------------------------------------------------------------------
# Weekly per-type counts -> WoW delta (lag over the type series) ->
# top-3 movers per week by |delta| with a full deterministic
# tie-break. Both windows sit on the weeks×types grain (tiny); the
# raw table pays one partial-agg shuffle only.

TOP_MOVERS_ORACLE = """
WITH weekly AS (
  SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), delta AS (
  SELECT wk, event_type, n,
         CAST(n - lag(n) OVER (PARTITION BY event_type ORDER BY wk) AS BIGINT) AS wow
  FROM weekly
)
SELECT wk, event_type, n, wow
FROM (
  SELECT *, row_number() OVER (PARTITION BY wk ORDER BY abs(wow) DESC, event_type) AS rk
  FROM delta WHERE wow IS NOT NULL
) WHERE rk <= 3
ORDER BY wk, abs(wow) DESC, event_type
"""


@register("win_top_movers_wow", TOP_MOVERS_ORACLE)
def win_top_movers_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    weekly = (
        e.groupBy(
            F.date_trunc("week", F.col("ts")).alias("wk"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"))
    )
    wlag = Window.partitionBy("event_type").orderBy("wk")
    delta = weekly.select(
        "wk", "event_type", "n",
        (F.col("n") - F.lag("n").over(wlag)).cast("bigint").alias("wow"),
    ).where(F.col("wow").isNotNull())
    wrk = Window.partitionBy("wk").orderBy(F.abs(F.col("wow")).desc(), "event_type")
    return (
        delta.withColumn("rk", F.row_number().over(wrk))
        .where(F.col("rk") <= 3)
        .select("wk", "event_type", "n", "wow")
        .orderBy("wk", F.abs(F.col("wow")).desc(), "event_type")
    )


# ---------------------------------------------------------------------------
# ev_attribution_time_decay — dyadic time-decay multi-touch credit
# ---------------------------------------------------------------------------
# The decay cousin of ev_multitouch_attribution (linear 1/n): a touch
# age_hours before the purchase earns weight 2^(23 − age_hours) —
# halving per hour over the 24h window, INTEGER weights (no float pow,
# no rounding anywhere). The lower bound is STRICT (>) so age_hours is
# always 0..23 — a touch exactly 24h old would shift by -1, which the
# engines define differently. Same scale shape as multitouch: the time
# predicate rides the user equi-join (per-user counts bound fan-out),
# then ONE rollup by touch type; share_ppm is exact integer division.

DECAY_WINDOW_HOURS = 24

TIME_DECAY_ORACLE = f"""
WITH touches AS (
  SELECT event_id AS touch_id, user_id, event_type AS touch_type, ts AS t_ts
  FROM events WHERE event_type IN ('view', 'click')
), purch AS (
  SELECT event_id AS purchase_id, user_id, ts AS p_ts
  FROM events WHERE event_type = 'purchase'
), credited AS (
  SELECT t.touch_type,
         CAST((epoch_us(p.p_ts) - epoch_us(t.t_ts)) // 3600000000 AS BIGINT) AS age_hours
  FROM purch p JOIN touches t USING (user_id)
  WHERE t.t_ts < p.p_ts AND t.t_ts > p.p_ts - INTERVAL {DECAY_WINDOW_HOURS} HOURS
), weighted AS (
  SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS n_touches,
         CAST(SUM(1::BIGINT << (23 - age_hours)) AS BIGINT) AS total_weight
  FROM credited GROUP BY touch_type
)
SELECT touch_type, n_touches, total_weight,
       CAST(floor(1000000.0 * CAST(total_weight AS DOUBLE) / CAST((SELECT SUM(total_weight) FROM weighted) AS DOUBLE)) AS BIGINT) AS share_ppm
FROM weighted ORDER BY touch_type
"""


@register("ev_attribution_time_decay", TIME_DECAY_ORACLE)
def ev_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    touches = e.where(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("event_type").alias("touch_type"), F.col("ts").alias("t_ts")
    )
    purch = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    credited = (
        purch.join(touches, "user_id")
        .where(
            (F.col("t_ts") < F.col("p_ts"))
            & (F.col("t_ts") > F.col("p_ts") - F.expr(f"INTERVAL {DECAY_WINDOW_HOURS} HOURS"))
        )
        .select(
            "touch_type",
            ((F.unix_micros("p_ts") - F.unix_micros("t_ts")) / 3600000000)
            .cast("bigint")
            .alias("age_hours"),
        )
    )
    weighted = credited.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum(F.expr("CAST(1 AS BIGINT) << CAST(23 - age_hours AS INT)"))
        .cast("bigint")
        .alias("total_weight"),
    )
    total = weighted.agg(F.sum("total_weight").alias("tw"))
    return (
        weighted.crossJoin(F.broadcast(total))
        .select(
            "touch_type", "n_touches", "total_weight",
            F.floor(1000000.0 * F.col("total_weight").cast("double") / F.col("tw").cast("double")).cast("bigint").alias("share_ppm"),
        )
        .orderBy("touch_type")
    )


# ---------------------------------------------------------------------------
# q_churn_inactive_customers — horizon-derived inactivity segmentation
# ---------------------------------------------------------------------------
# "Churned" = last order more than 365 days before the dataset's OWN
# horizon (max order date) — the scalar-subquery-threshold surface: the
# horizon is a 1-row aggregate broadcast into the predicate (DuckDB
# binds it as a scalar subquery). Never-ordered customers surface via
# the left join's NULL.

CHURN_ORACLE = """
WITH horizon AS (SELECT MAX(o_orderdate) AS mx FROM orders),
last_order AS (
  SELECT o_custkey, MAX(o_orderdate) AS last_d FROM orders GROUP BY o_custkey
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN last_d IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_never_ordered,
       CAST(SUM(CASE WHEN last_d < mx - INTERVAL 365 DAYS THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
       CAST(SUM(CASE WHEN last_d >= mx - INTERVAL 365 DAYS THEN 1 ELSE 0 END) AS BIGINT) AS n_active
FROM customer LEFT JOIN last_order ON c_custkey = o_custkey
CROSS JOIN horizon
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


@register("q_churn_inactive_customers", CHURN_ORACLE)
def q_churn_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment churn tally. Plan: the per-customer MAX aggregate
    shuffles once on custkey and left-joins the dim (AQE picks the
    side); the horizon is a broadcast 1-row cross join; one final
    partial agg on segment."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    horizon = o.agg(F.max("o_orderdate").alias("mx"))
    last = o.groupBy("o_custkey").agg(F.max("o_orderdate").alias("last_d"))
    cutoff = F.col("mx") - F.expr("INTERVAL 365 DAYS")
    return (
        c.join(last, c.c_custkey == last.o_custkey, "left")
        .crossJoin(F.broadcast(horizon))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.when(F.col("last_d").isNull(), 1).otherwise(0)).cast("bigint").alias("n_never_ordered"),
            F.sum(F.when(F.col("last_d") < cutoff, 1).otherwise(0)).cast("bigint").alias("n_churned"),
            F.sum(F.when(F.col("last_d") >= cutoff, 1).otherwise(0)).cast("bigint").alias("n_active"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q_orders_backlog_aging — open-order aging buckets at the data horizon
# ---------------------------------------------------------------------------

BACKLOG_ORACLE = """
WITH horizon AS (SELECT CAST(MAX(o_orderdate) AS DATE) AS mx FROM orders),
aged AS (
  SELECT o_orderpriority,
         date_diff('day', CAST(o_orderdate AS DATE), mx) AS age_days
  FROM orders CROSS JOIN horizon
  WHERE o_orderstatus = 'O'
)
SELECT o_orderpriority,
       CASE WHEN age_days <= 30 THEN '0-30'
            WHEN age_days <= 90 THEN '31-90'
            WHEN age_days <= 365 THEN '91-365'
            ELSE '365+' END AS age_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MIN(age_days) AS BIGINT) AS min_age,
       CAST(MAX(age_days) AS BIGINT) AS max_age
FROM aged
GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("q_orders_backlog_aging", BACKLOG_ORACLE)
def q_orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order ('O') aging report against the dataset's own horizon
    (scalar broadcast, like q_churn); integer day buckets, one
    partial-agg shuffle. The status filter is pushed to the scan."""
    o = load_table(spark, sf_dir, "orders")
    horizon = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("mx"))
    aged = (
        o.where(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(horizon))
        .select(
            "o_orderpriority",
            F.datediff(F.col("mx"), F.col("o_orderdate").cast("date")).cast("bigint").alias("age_days"),
        )
    )
    bucket = (
        F.when(F.col("age_days") <= 30, "0-30")
        .when(F.col("age_days") <= 90, "31-90")
        .when(F.col("age_days") <= 365, "91-365")
        .otherwise("365+")
    )
    return (
        aged.groupBy("o_orderpriority", bucket.alias("age_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("age_days").cast("bigint").alias("min_age"),
            F.max("age_days").cast("bigint").alias("max_age"),
        )
        .orderBy("o_orderpriority", "age_bucket")
    )


# ---------------------------------------------------------------------------
# agg_array_agg_sorted — ARRAY-valued aggregate parity
# ---------------------------------------------------------------------------
# The one aggregate family §2.B hadn't oracled: a LIST-typed output
# column flowing through the driver's value-hash compare. DuckDB
# list(x ORDER BY x) ≡ Spark sort_array(collect_list(x)) — groups are
# DIM-SIZED (suppliers per nation), so the collect buffer is bounded
# by the dimension, not the fact table.
#
# r11: the arrays are serialized to canonical comma-joined strings on
# BOTH sides (agg_histogram's 'v:c' convention) — the DRIVER's pandas
# canonicalizer sort_values() dies on unhashable list cells, so a
# driver-hashable entry must emit scalars. Element order inside the
# string is the sorted order, so the serialization is deterministic.

ARRAY_AGG_ORACLE = """
SELECT s_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       array_to_string(list(s_suppkey ORDER BY s_suppkey), ',') AS suppkeys,
       array_to_string(list(CAST(round(s_acctbal * 100) AS BIGINT) ORDER BY round(s_acctbal * 100), s_suppkey), ',') AS balances_cents
FROM supplier
GROUP BY s_nationkey ORDER BY s_nationkey
"""


@register("agg_array_agg_sorted", ARRAY_AGG_ORACLE)
def agg_array_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    cents = F.round(F.col("s_acctbal") * 100).cast("bigint")
    as_csv = lambda col: F.array_join(  # noqa: E731 — shared serializer
        F.transform(F.sort_array(F.collect_list(col)), lambda x: x.cast("string")), ","
    )
    return (
        s.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            as_csv(F.col("s_suppkey")).alias("suppkeys"),
            as_csv(cents).alias("balances_cents"),
        )
        .orderBy("s_nationkey")
    )


# ---------------------------------------------------------------------------
# ts_rolling_corr_pairs — trailing-7-day correlation of two series
# ---------------------------------------------------------------------------
# Rolling Pearson correlation between the daily view-value and
# purchase-value series — the drift-monitoring window statistic.
# Determinism is agg_corr_matrix's idiom made ROLLING: every moment
# (Σx, Σy, Σx², Σy², Σxy) is an exact INTEGER (cents) windowed sum on
# the day grain, and the one double expression is the fixed-sequence
# n·Σxy−ΣxΣy cancellation both engines evaluate identically (division
# and sqrt are IEEE-correctly-rounded). Day-grain windows only; the
# fact table pays one partial-agg shuffle. Cents (not micros) keep
# every product inside BIGINT: day sums ≤ ~2e7 cents, 7·Σxy ≤ ~2e15.

ROLLING_CORR_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
         CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY 1
), roll AS (
  SELECT d,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(x) OVER w AS BIGINT) AS sx, CAST(SUM(y) OVER w AS BIGINT) AS sy,
         CAST(SUM(x * x) OVER w AS BIGINT) AS sxx, CAST(SUM(y * y) OVER w AS BIGINT) AS syy,
         CAST(SUM(x * y) OVER w AS BIGINT) AS sxy
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT d, n,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_7d
FROM roll WHERE n = 7
ORDER BY d
"""


@register("ts_rolling_corr_pairs", ROLLING_CORR_ORACLE)
def ts_rolling_corr_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    daily = e.groupBy(F.date_trunc("day", F.col("ts")).alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "view", cents).otherwise(0)).cast("bigint").alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", cents).otherwise(0)).cast("bigint").alias("y"),
    )
    w = Window.orderBy("d").rowsBetween(-6, Window.currentRow)
    roll = daily.select(
        "d",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("x").over(w).cast("bigint").alias("sx"),
        F.sum("y").over(w).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("bigint").alias("sxy"),
    ).where(F.col("n") == 7)
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")) * F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return roll.select("d", "n", (num / den).alias("corr_7d")).orderBy("d")


# ---------------------------------------------------------------------------
# ml_auc_exact — exact ROC-AUC via the rank-sum identity, score-grain
# ---------------------------------------------------------------------------
# AUC of "does event value predict purchase?" computed EXACTLY as the
# Mann-Whitney U statistic — but never ranking the raw table: value
# has a bounded cents domain, so the per-SCORE counts (n_pos, n_neg)
# are a domain-bounded relation and U = Σ_s n_pos(s)·(neg_below(s) +
# n_neg(s)/2) comes from one cumulative window over THAT grain.
# Everything ×2 to stay integer (tie halves); the final AUC ppm is a
# double floor-division (1e6·u2 in bigint would overflow at ~4.3M
# balanced events — far below the scale this entry targets), which is
# IEEE-deterministic across engines at any scale and exact while the
# operands sit under 2^53. No float ranks anywhere. At 100 TB: one
# partial-agg shuffle of the fact, one window over ≤|domain| rows.

AUC_ORACLE = """
WITH scored AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events
), grain AS (
  SELECT s, CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(COUNT(*) - SUM(pos) AS BIGINT) AS n_neg
  FROM scored GROUP BY s
), cum AS (
  SELECT s, n_pos, n_neg,
         CAST(COALESCE(SUM(n_neg) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS neg_below
  FROM grain
)
SELECT CAST(SUM(n_pos) AS BIGINT) AS n_pos,
       CAST(SUM(n_neg) AS BIGINT) AS n_neg,
       CAST(SUM(n_pos * (2 * neg_below + n_neg)) AS BIGINT) AS u2,
       CAST(floor(1000000.0 * CAST(SUM(n_pos * (2 * neg_below + n_neg)) AS DOUBLE)
            / (2.0 * CAST(SUM(n_pos) AS DOUBLE) * CAST(SUM(n_neg) AS DOUBLE))) AS BIGINT) AS auc_ppm
FROM cum
"""


@register("ml_auc_exact", AUC_ORACLE)
def ml_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    grain = (
        e.select(
            F.round(F.col("value") * 100).cast("bigint").alias("s"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
        )
        .groupBy("s")
        .agg(
            F.sum("pos").cast("bigint").alias("n_pos"),
            (F.count(F.lit(1)) - F.sum("pos")).cast("bigint").alias("n_neg"),
        )
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    cum = grain.select(
        "n_pos", "n_neg",
        F.coalesce(F.sum("n_neg").over(w), F.lit(0)).cast("bigint").alias("neg_below"),
    )
    u2 = F.sum(F.col("n_pos") * (2 * F.col("neg_below") + F.col("n_neg"))).cast("bigint")
    return cum.agg(
        F.sum("n_pos").cast("bigint").alias("n_pos"),
        F.sum("n_neg").cast("bigint").alias("n_neg"),
        u2.alias("u2"),
    ).select(
        "n_pos", "n_neg", "u2",
        F.floor(1000000.0 * F.col("u2").cast("double") / (2.0 * F.col("n_pos").cast("double") * F.col("n_neg").cast("double"))).cast("bigint").alias("auc_ppm"),
    )


# ---------------------------------------------------------------------------
# ml_temporal_split — leakage-safe time-based train/test assignment
# ---------------------------------------------------------------------------
# The temporal complement of dataset_split_train_valid (hash split):
# events strictly before horizon−7d are train, the last 7 days are
# test — the only split that respects causality for time-series
# models. Horizon is the data's own max (scalar broadcast), so the
# assignment is reproducible from the corpus alone.

TEMPORAL_SPLIT_ORACLE = """
WITH horizon AS (SELECT MAX(ts) AS mx FROM events)
SELECT CASE WHEN ts < mx - INTERVAL 7 DAYS THEN 'train' ELSE 'test' END AS split,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_ts_us,
       CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ts_us
FROM events CROSS JOIN horizon
GROUP BY 1, 2 ORDER BY split, event_type
"""


@register("ml_temporal_split", TEMPORAL_SPLIT_ORACLE)
def ml_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    horizon = e.agg(F.max("ts").alias("mx"))
    split = F.when(
        F.col("ts") < F.col("mx") - F.expr("INTERVAL 7 DAYS"), "train"
    ).otherwise("test")
    return (
        e.crossJoin(F.broadcast(horizon))
        .groupBy(split.alias("split"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min(F.unix_micros("ts")).cast("bigint").alias("min_ts_us"),
            F.max(F.unix_micros("ts")).cast("bigint").alias("max_ts_us"),
        )
        .orderBy("split", "event_type")
    )


# ---------------------------------------------------------------------------
# ml_class_weights — sklearn-style balanced class weights, integer form
# ---------------------------------------------------------------------------
# weight(c) = n / (k · n_c), emitted as the exact integer pair
# (n, k·n_c) plus a ppm quotient — the training-time reweighting a
# skewed-label corpus needs; one tiny aggregate.

CLASS_WEIGHTS_ORACLE = """
WITH counts AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_c FROM events GROUP BY event_type
), tot AS (
  SELECT CAST(SUM(n_c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k FROM counts
)
SELECT event_type, n_c, n, k,
       CAST(floor(1000000.0 * CAST(n AS DOUBLE) / (CAST(k AS DOUBLE) * CAST(n_c AS DOUBLE))) AS BIGINT) AS weight_ppm
FROM counts CROSS JOIN tot
ORDER BY event_type
"""


@register("ml_class_weights", CLASS_WEIGHTS_ORACLE)
def ml_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_c"))
    tot = counts.agg(
        F.sum("n_c").cast("bigint").alias("n"), F.count(F.lit(1)).alias("k")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "event_type", "n_c", "n", "k",
            F.floor(1000000.0 * F.col("n").cast("double") / (F.col("k").cast("double") * F.col("n_c").cast("double"))).cast("bigint").alias("weight_ppm"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q_nation_trade_balance — two fact aggregates full-outer-joined by dim
# ---------------------------------------------------------------------------
# Per nation: revenue flowing OUT (its suppliers' lineitems) vs IN
# (its customers' orders) and the signed balance — the two-sided
# rollup + FULL OUTER + null-fill composite a finance dashboard runs.
# Micro-unit bigint sums (dsum grid), COALESCE on both sides.

TRADE_BALANCE_ORACLE = """
WITH exports AS (
  SELECT n_name,
         CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)) AS BIGINT) AS export_um
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name
), imports AS (
  SELECT n_name,
         CAST(SUM(CAST(round(o_totalprice * 1000000) AS BIGINT)) AS BIGINT) AS import_um
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT COALESCE(e.n_name, i.n_name) AS n_name,
       CAST(COALESCE(export_um, 0) AS BIGINT) AS export_um,
       CAST(COALESCE(import_um, 0) AS BIGINT) AS import_um,
       CAST(COALESCE(export_um, 0) - COALESCE(import_um, 0) AS BIGINT) AS balance_um
FROM exports e FULL OUTER JOIN imports i USING (n_name)
ORDER BY n_name
"""


@register("q_nation_trade_balance", TRADE_BALANCE_ORACLE)
def q_nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two independent fact rollups (lineitem-by-supplier-nation,
    orders-by-customer-nation) meet in a 25-row FULL OUTER join.
    nation is a CONSTANT-size dim (25 rows at every SF) and is
    force-broadcast; supplier and customer SCALE with SF, so their
    joins are left to AQE — broadcast at test scale, shuffle join at
    100 TB (the orders_basket_pairs rule). Each fact pays exactly one
    partial-agg shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev_um = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000000
    ).cast("bigint")
    exports = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(rev_um).cast("bigint").alias("export_um"))
    )
    imports = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 1000000).cast("bigint"))
            .cast("bigint")
            .alias("import_um")
        )
    )
    return (
        exports.join(imports, "n_name", "full_outer")
        .select(
            "n_name",
            F.coalesce("export_um", F.lit(0)).cast("bigint").alias("export_um"),
            F.coalesce("import_um", F.lit(0)).cast("bigint").alias("import_um"),
            (F.coalesce("export_um", F.lit(0)) - F.coalesce("import_um", F.lit(0)))
            .cast("bigint")
            .alias("balance_um"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# ev_entry_exit_matrix — first-touch × last-touch event-type matrix
# ---------------------------------------------------------------------------
# The "entry page × exit page" product-analytics rollup: each user's
# FIRST and LAST event types (min/max over struct(ts, event_id, type)
# — argmin/argmax with total-order tiebreak, map-combinable, NO
# window), cross-tabulated. One shuffle on user, one on the 25-cell
# matrix.

ENTRY_EXIT_ORACLE = """
WITH fl AS (
  SELECT user_id,
         first(event_type ORDER BY ts, event_id) AS first_type,
         last(event_type ORDER BY ts, event_id) AS last_type
  FROM events GROUP BY user_id
)
SELECT first_type, last_type,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM fl GROUP BY first_type, last_type
ORDER BY first_type, last_type
"""


@register("ev_entry_exit_matrix", ENTRY_EXIT_ORACLE)
def ev_entry_exit_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"), F.col("event_type").alias("t"))
    fl = e.groupBy("user_id").agg(
        F.min(key).getField("t").alias("first_type"),
        F.max(key).getField("t").alias("last_type"),
    )
    return (
        fl.groupBy("first_type", "last_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("first_type", "last_type")
    )


# ---------------------------------------------------------------------------
# ev_bot_users_heuristic — rate-based anomaly flag with a data-derived
# threshold
# ---------------------------------------------------------------------------
# Users whose event count exceeds 5/4 of the corpus mean — the
# first-pass bot filter every pipeline runs before training-data
# extraction (the served corpus is near-uniform: mean ~67, p99 ~86,
# so 1.25× selects the real tail; production would use a higher
# multiple). The threshold is derived from the data (scalar
# broadcast); the comparison runs in DOUBLE so the cross product can
# never overflow int64 at any corpus size (IEEE multiply/compare are
# identical on both engines — the exact-below-2^53 contract of
# DETERMINISM #17's double-floor form).

BOT_USERS_ORACLE = """
WITH per_user AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events FROM events GROUP BY user_id
), tot AS (
  SELECT CAST(SUM(n_events) AS BIGINT) AS total_events,
         CAST(COUNT(*) AS BIGINT) AS total_users
  FROM per_user
)
SELECT user_id, n_events, total_events, total_users
FROM per_user CROSS JOIN tot
WHERE CAST(n_events AS DOUBLE) * CAST(total_users AS DOUBLE) > 1.25 * CAST(total_events AS DOUBLE)
ORDER BY n_events DESC, user_id
"""


_BOT_CACHE_HANDLES: list[DataFrame] = []


@register("ev_bot_users_heuristic", BOT_USERS_ORACLE)
def ev_bot_users_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The user-grain counts feed BOTH the totals scalar and the
    filter — cached (the ev_cohort_ltv convention) so the fact table
    is scanned once and the second consumer reads InMemoryTableScan."""
    e = load_table(spark, sf_dir, "events")
    while _BOT_CACHE_HANDLES:
        _BOT_CACHE_HANDLES.pop().unpersist()
    per_user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events")).cache()
    _BOT_CACHE_HANDLES.append(per_user)
    tot = per_user.agg(
        F.sum("n_events").cast("bigint").alias("total_events"),
        F.count(F.lit(1)).alias("total_users"),
    )
    return (
        per_user.crossJoin(F.broadcast(tot))
        .where(F.col("n_events").cast("double") * F.col("total_users").cast("double") > 1.25 * F.col("total_events").cast("double"))
        .select("user_id", F.col("n_events").cast("bigint").alias("n_events"), "total_events", "total_users")
        .orderBy(F.desc("n_events"), "user_id")
    )
