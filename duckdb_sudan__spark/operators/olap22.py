"""r11 wave 14: MRR ranking metric, session-grain co-occurrence, and
ISO-week revenue (the year-boundary week-assignment parity).

- ml_mrr_per_user completes the ranking-eval trio (NDCG olap20.py,
  AUC olap17.py): mean reciprocal rank of the first relevant item in
  each user's score-ordered feed — THE metric for "did the ranker put
  a purchase near the top for this user".
- ev_session_type_cooccurrence lifts ev_transition_matrix (adjacent
  pairs) and ev_type_affinity_pmi (user grain) to the SESSION grain:
  which behaviors co-occur within one 30-minute-gap session (the
  ev_sessionize convention, analytic.py).
- ts_iso_week_revenue pins the ISO week-assignment pitfall in an
  AGGREGATION (dt_funcs2 pins it row-wise): the first/last days of a
  calendar year belong to week 52/53/1 of a DIFFERENT ISO year; Spark
  has no isoyear(), so the Spark side derives it as
  year(thursday-of-week) = year(date_add(d, 3 − weekday(d))) — exact
  by ISO-8601 definition — against DuckDB's native isoyear().

Determinism: reciprocal ranks are integer ppm via floor (1e6 // rank
— the metric is DEFINED as floored ppm on both sides, so no rational
ever reaches the hash); co-occurrence lift multiplies in
HUGEINT/DECIMAL(38,0); revenue is exact cents.

Scale notes (100 TB): MRR's window is user-grain (a user's feed fits
a partition; the per-user reduction collapses to 2 BIGINTs before the
final 1-row rollup); co-occurrence joins at SESSION grain over the
≤5-type distinct relation (≤10 pairs/session, never the raw stream);
the ISO-week rollup is a pure map-assign + bounded groupBy (weeks are
calendar-bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# ml_mrr_per_user — mean reciprocal rank of the first purchase
# ---------------------------------------------------------------------------
# Each user's events ordered by (value DESC, event_id) are "the ranked
# feed"; the relevant item is a purchase. rr = 1e6 // rank(first
# purchase), 0 for users with none (standard MRR); mrr averages over
# ALL users. Everything integer.

MRR_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk
  FROM events
), per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'purchase' THEN rnk END) AS first_rel
  FROM ranked GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(COUNT(first_rel) AS BIGINT) AS n_with_purchase,
       CAST(SUM(COALESCE(1000000 // first_rel, 0)) AS BIGINT) AS sum_rr_ppm,
       CAST(SUM(COALESCE(1000000 // first_rel, 0)) // COUNT(*) AS BIGINT) AS mrr_ppm,
       CAST(COUNT(*) FILTER (first_rel = 1) AS BIGINT) AS n_rank1
FROM per_user
"""


@register("ml_mrr_per_user", MRR_ORACLE)
def ml_mrr_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    ranked = e.select(
        "user_id", "event_type", F.row_number().over(w).alias("rnk")
    )
    per_user = ranked.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "purchase", F.col("rnk"))).alias("first_rel")
    )
    return per_user.selectExpr(
        "CAST(COUNT(*) AS BIGINT) AS n_users",
        "CAST(COUNT(first_rel) AS BIGINT) AS n_with_purchase",
        "CAST(SUM(COALESCE(1000000 div first_rel, 0)) AS BIGINT) AS sum_rr_ppm",
        "CAST(SUM(COALESCE(1000000 div first_rel, 0)) div COUNT(*) AS BIGINT) AS mrr_ppm",
        "CAST(COUNT_IF(first_rel = 1) AS BIGINT) AS n_rank1",
    )


# ---------------------------------------------------------------------------
# ev_session_type_cooccurrence — which behaviors share a session
# ---------------------------------------------------------------------------
# 30-minute-gap sessions (the ev_sessionize convention), collapsed to
# the DISTINCT (user, session, type) relation before any pairing —
# the pair join runs at session grain with ≤5 types per session
# (≤10 pairs), never against the raw stream. Lift compares observed
# co-sessions to independence: 1e6·co·S // (n_a·n_b), products in
# HUGEINT/DECIMAL (session counts square past int64 at 100 TB).

SESSION_COOC_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sess AS (
  SELECT user_id, event_type,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), st AS (
  SELECT DISTINCT user_id, session_id, event_type FROM sess
), totals AS (
  SELECT CAST(COUNT(DISTINCT user_id || '#' || session_id) AS BIGINT) AS s FROM st
), per_type AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM st GROUP BY event_type
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_co
  FROM st a JOIN st b
    ON a.user_id = b.user_id AND a.session_id = b.session_id
   AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_co,
       CAST(1000000 * CAST(n_co AS HUGEINT) * s
            // NULLIF(CAST(ta.n AS HUGEINT) * tb.n, 0) AS BIGINT) AS lift_ppm
FROM pairs
JOIN per_type ta ON ta.event_type = type_a
JOIN per_type tb ON tb.event_type = type_b
CROSS JOIN totals
ORDER BY type_a, type_b
"""


@register("ev_session_type_cooccurrence", SESSION_COOC_ORACLE)
def ev_session_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = e.select(
        "user_id", "event_type", "ts", "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTE")),
            1,
        ).otherwise(0).alias("new_session"),
    )
    st = (
        flagged.withColumn("session_id", F.sum("new_session").over(wrun))
        .select("user_id", "session_id", "event_type")
        .distinct()
        .cache()  # 3 consumers (pair sides, per-type, totals), 1 stream scan
    )
    totals = st.select(
        F.count_distinct(F.concat_ws("#", "user_id", "session_id")).cast("bigint").alias("s")
    )
    per_type = st.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = st.alias("a")
    b = st.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.session_id") == F.col("b.session_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_co"))
    )
    ta = per_type.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    tb = per_type.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    return (
        pairs.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .crossJoin(F.broadcast(totals))
        .selectExpr(
            "type_a", "type_b", "n_co",
            "CAST(1000000 * CAST(n_co AS DECIMAL(19,0)) * s"
            " div nullif(CAST(na AS DECIMAL(19,0)) * nb, 0) AS BIGINT) AS lift_ppm",
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# ts_iso_week_revenue — weekly revenue keyed by (ISO year, ISO week)
# ---------------------------------------------------------------------------
# The aggregation-grain form of the ISO-8601 pitfall: Jan 1-3 can be
# week 52/53 of the PREVIOUS iso year, Dec 29-31 week 1 of the NEXT.
# Spark derives isoyear as year(thursday-of-week); weekofyear is ISO
# in both engines. Pure map-assign + calendar-bounded groupBy.

ISO_WEEK_ORACLE = """
SELECT CAST(isoyear(o_orderdate) AS INTEGER) AS iso_year,
       CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders
GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("ts_iso_week_revenue", ISO_WEEK_ORACLE)
def ts_iso_week_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    # ISO year = calendar year of this week's Thursday; weekday() is
    # 0=Monday, so Thursday = d + (3 - weekday(d)).
    iso_year = F.year(F.date_add(d, 3 - F.weekday(d))).cast("int")
    return (
        o.groupBy(
            iso_year.alias("iso_year"),
            F.weekofyear(d).cast("int").alias("iso_week"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).cast("bigint").alias("revenue_cents"),
        )
        .orderBy("iso_year", "iso_week")
    )
