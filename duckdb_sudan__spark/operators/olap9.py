"""Ninth wave of relational/OLAP surface (r5c): rolling regression
windows, SCD2 dimension building, and RFM quartile scoring.

Reference parity: stock-DuckDB window/aggregate SQL every
sudan-extension user has. All three follow DETERMINISM.md: window
frame sums accumulate integer-scaled values exactly (DECIMAL/BIGINT),
the statistic's combination arithmetic runs in exact DECIMAL(38,0)
with ONE double division at the end, and every ordering carries a
total tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# win_rolling_regression — trailing-window least-squares slope
# ---------------------------------------------------------------------------

REG_WINDOW = 20

ROLLING_REG_ORACLE = f"""
WITH base AS (
  SELECT event_id, ts,
         row_number() OVER (ORDER BY ts, event_id) AS x,
         CAST(round(value * 1000000) AS BIGINT) AS yi
  FROM events WHERE event_type = 'purchase'
), sums AS (
  SELECT event_id, ts, x,
         CAST(COUNT(*) OVER w AS DECIMAL(38,0)) AS n,
         CAST(SUM(x)  OVER w AS DECIMAL(38,0)) AS sx,
         CAST(SUM(yi) OVER w AS DECIMAL(38,0)) AS sy,
         SUM(CAST(x AS DECIMAL(38,0)) * x)  OVER w AS sxx,
         SUM(CAST(x AS DECIMAL(38,0)) * yi) OVER w AS sxy
  FROM base
  WINDOW w AS (ORDER BY x ROWS BETWEEN {REG_WINDOW - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_id, ts, CAST(n AS BIGINT) AS n_window,
       CASE WHEN n < 2 OR n * sxx - sx * sx = 0 THEN NULL
            ELSE CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
       END AS slope_micro
FROM sums
ORDER BY ts, event_id
"""


@register("win_rolling_regression", ROLLING_REG_ORACLE)
def win_rolling_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling least-squares slope over a trailing 20-event window
    (purchase value drift vs event index — the online trend detector
    agg_regression's whole-table moments can't give). Bit-stability:
    y is integer-scaled once (round(value·1e6), exact for identical
    doubles on both engines), every frame sum is integer-exact, and
    the slope combination n·sxy − sx·sy runs in DECIMAL(38,0) — the
    CANCELLATION matters: raw cross products reach ~4.6e15 at sf0.1
    (past exact-double territory at bigger SFs) while the differences
    are frame-local (~1e12), so subtracting in decimal and casting
    the small result is the only order-safe route (DETERMINISM.md
    rule 2). Plan: ONE unpartitioned-window sort over the filtered
    event slice — the global ORDER makes this inherently serial, the
    honest cost of a cross-series rolling statistic; per-series
    variants would partition by key (the event_type filter stands in
    for the series key here)."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    w_order = Window.orderBy("ts", "event_id")
    base = e.select(
        "event_id", "ts",
        F.row_number().over(w_order).alias("x"),
        F.round(F.col("value") * 1_000_000).cast("bigint").alias("yi"),
    )
    wf = Window.orderBy("x").rowsBetween(-(REG_WINDOW - 1), Window.currentRow)
    dec = "decimal(38,0)"
    sums = base.select(
        "event_id", "ts",
        F.count(F.lit(1)).over(wf).cast(dec).alias("n"),
        F.sum("x").over(wf).cast(dec).alias("sx"),
        F.sum("yi").over(wf).cast(dec).alias("sy"),
        # The per-row PRODUCT rides DECIMAL(38,0), not just the frame
        # sum: row_number() is int32 in Spark, so a bare x*x wraps the
        # int multiply once x > 46341 (~sf1 purchase rows — the r12
        # sf1 overflow gate caught ANSI raising exactly there), and a
        # bigint x·yi would wrap silently past ~sf5 where the oracle's
        # SUM promotes to HUGEINT. Cast-first is exact at any SF on
        # both engines (overflow would raise, not wrap).
        F.sum(F.col("x").cast(dec) * F.col("x")).over(wf).alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("yi")).over(wf).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        sums.select(
            "event_id", "ts",
            F.col("n").cast("bigint").alias("n_window"),
            F.when((F.col("n") < 2) | (den == 0), None)
            .otherwise(num.cast("double") / den.cast("double"))
            .alias("slope_micro"),
        )
        .orderBy("ts", "event_id")
    )


# ---------------------------------------------------------------------------
# ev_scd2_intervals — slowly-changing-dimension type 2 build
# ---------------------------------------------------------------------------

SCD2_ORACLE = """
WITH changes AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER w AS prev_type
  FROM events WHERE user_id % 31 = 0
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), versions AS (
  SELECT user_id, event_type, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM changes
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type, valid_from, valid_to,
       valid_to IS NULL AS is_current
FROM versions
ORDER BY user_id, valid_from
"""


@register("ev_scd2_intervals", SCD2_ORACLE)
def ev_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build — collapse an event stream into
    validity intervals (value, valid_from, valid_to, is_current), the
    warehouse-standard way to historize a changing attribute. Change
    detection is lag()≠current; interval close is lead() over the
    CHANGE rows only — so consecutive equal values merge into one
    version row, and the open version carries valid_to NULL. Both
    windows partition on user_id → ONE shuffle serves change
    detection, and the second window runs on the (much smaller)
    change relation. (ts, event_id) keeps the order total."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") % 31 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = e.select(
        "user_id", "ts", "event_id", "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    versions = changes.select(
        "user_id", "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(Window.partitionBy("user_id").orderBy("ts", "event_id")).alias("valid_to"),
    )
    return versions.select(
        "user_id", "event_type", "valid_from", "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    ).orderBy("user_id", "valid_from")


# ---------------------------------------------------------------------------
# ev_rfm_scores — recency / frequency / monetary quartile scoring
# ---------------------------------------------------------------------------

RFM_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         MAX(ts) AS last_ts,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id
), anchored AS (
  SELECT p.*, CAST(epoch_us(m.max_ts) - epoch_us(p.last_ts) AS BIGINT) AS recency_us
  FROM per_user p, (SELECT MAX(ts) AS max_ts FROM events WHERE event_type = 'purchase') m
)
SELECT user_id, recency_us, frequency, monetary_cents,
       ntile(4) OVER (ORDER BY recency_us, user_id) AS r_score,
       ntile(4) OVER (ORDER BY frequency DESC, user_id) AS f_score,
       ntile(4) OVER (ORDER BY monetary_cents DESC, user_id) AS m_score
FROM anchored
ORDER BY user_id
"""


@register("ev_rfm_scores", RFM_ORACLE)
def ev_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartile scoring — the classic customer-value segmentation:
    per purchasing user, microseconds since last purchase (anchored to
    the corpus max so the result is reproducible, not wall-clock —
    and measured in epoch micros on BOTH engines because DuckDB's
    date_diff counts boundary crossings, not truncated differences),
    purchase count, and cents spent (integer, order-independent),
    each ntile(4)'d with a user_id tie-break so quartile edges are
    deterministic. Plan: one fact shuffle into the per-user agg; the
    1-row anchor broadcasts (the q11 scalar pattern); the three
    unpartitioned ntile windows run over the per-USER relation —
    |users| ≪ |events|, the same aggregate-then-window posture as
    ngram_lm_counts (at 100 TB a two-phase percentile bucketing would
    replace global ntile)."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    per_user = e.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint").alias("monetary_cents"),
    )
    anchor = e.agg(F.max("ts").alias("max_ts"))
    anchored = per_user.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        (F.unix_micros("max_ts") - F.unix_micros("last_ts")).cast("bigint").alias("recency_us"),
        "frequency", "monetary_cents",
    )
    return anchored.select(
        "user_id", "recency_us", "frequency", "monetary_cents",
        F.ntile(4).over(Window.orderBy("recency_us", "user_id")).alias("r_score"),
        F.ntile(4).over(Window.orderBy(F.desc("frequency"), "user_id")).alias("f_score"),
        F.ntile(4).over(Window.orderBy(F.desc("monetary_cents"), "user_id")).alias("m_score"),
    ).orderBy("user_id")
