"""r11 wave 13: Cohen's kappa, exact-integer Bollinger breaches, and
signup→first-purchase conversion latency.

Rounds out the classifier-agreement and alerting families: kappa is
the chance-corrected agreement every labeling-pipeline owner quotes
next to raw accuracy; Bollinger-band breach counts are the alerting
readout on the daily revenue series (and the first thing a
volatility dashboard plots); signup→first-purchase is the canonical
cross-event-type activation funnel (ev_time_to_nth_event, olap20.py,
measures same-type latency — this one conditions the second event on
the FIRST event's type and time).

Determinism: kappa follows ml_mcc_binary's rule — ONE literal-
identical IEEE expression over exact BIGINT cells (po/pe components
also in integer ppm); the Bollinger test is rewritten so NO division
or sqrt ever happens: x > mean + 2σ over a ROWS frame is
(n·x − Σ) > 0 AND (n·x − Σ)² > 4(nΣx² − Σ²) — all exact integers,
squares in DECIMAL(38,0)/HUGEINT (a 100 TB day-series' squared cents
pass int64); latency gaps are exact epoch_us.

Scale notes (100 TB): Bollinger windows run over the calendar-bounded
(type, day) grid, never the raw table; kappa is one map-side 4-cell
aggregate; the conversion join is user-grain — signup times collapse
map-side to one BIGINT per user before joining the purchase stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.operators.olap18 import CONFUSION_TAU
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# ml_cohens_kappa — chance-corrected agreement of the τ classifier
# ---------------------------------------------------------------------------
# po = (tp+tn)/N observed agreement, pe = marginal-product expected
# agreement; κ = (po − pe)/(1 − pe) = (N(tp+tn) − PE)/(N² − PE) with
# PE = (tp+fp)(tp+fn) + (fn+tn)(fp+tn). κ's numerator can be NEGATIVE
# (worse-than-chance classifiers), where DuckDB's floor // and
# Spark's truncating div diverge — so κ is emitted as the ONE
# literal-identical IEEE double expression (the ml_mcc_binary rule)
# and only the non-negative po/pe ride as integer ppm.

_KAPPA_PE = (
    "(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)"
    " + CAST(fn + tn AS DOUBLE) * CAST(fp + tn AS DOUBLE))"
)
_KAPPA_N = "CAST(tp + fp + fn + tn AS DOUBLE)"
_KAPPA_EXPR = (
    f"({_KAPPA_N} * CAST(tp + tn AS DOUBLE) - {_KAPPA_PE})"
    f" / nullif({_KAPPA_N} * {_KAPPA_N} - {_KAPPA_PE}, 0.0)"
)

KAPPA_ORACLE = f"""
WITH cells AS (
  SELECT
    CAST(COUNT(*) FILTER (event_type = 'purchase' AND value >= {CONFUSION_TAU}) AS BIGINT) AS tp,
    CAST(COUNT(*) FILTER (event_type <> 'purchase' AND value >= {CONFUSION_TAU}) AS BIGINT) AS fp,
    CAST(COUNT(*) FILTER (event_type = 'purchase' AND value < {CONFUSION_TAU}) AS BIGINT) AS fn,
    CAST(COUNT(*) FILTER (event_type <> 'purchase' AND value < {CONFUSION_TAU}) AS BIGINT) AS tn
  FROM events
)
SELECT tp, fp, fn, tn,
       1000000 * (tp + tn) // NULLIF(tp + fp + fn + tn, 0) AS po_ppm,
       CAST(1000000 * (CAST(tp + fp AS HUGEINT) * (tp + fn) + CAST(fn + tn AS HUGEINT) * (fp + tn))
            // NULLIF(CAST(tp + fp + fn + tn AS HUGEINT) * (tp + fp + fn + tn), 0) AS BIGINT) AS pe_ppm,
       {_KAPPA_EXPR} AS kappa
FROM cells
"""


@register("ml_cohens_kappa", KAPPA_ORACLE)
def ml_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    pos = F.col("event_type") == "purchase"
    pred = F.col("value") >= CONFUSION_TAU
    cells = e.agg(
        F.count_if(pos & pred).cast("bigint").alias("tp"),
        F.count_if(~pos & pred).cast("bigint").alias("fp"),
        F.count_if(pos & ~pred).cast("bigint").alias("fn"),
        F.count_if(~pos & ~pred).cast("bigint").alias("tn"),
    )
    return cells.selectExpr(
        "tp", "fp", "fn", "tn",
        "1000000 * (tp + tn) div nullif(tp + fp + fn + tn, 0) AS po_ppm",
        "CAST(1000000 * (CAST(tp + fp AS DECIMAL(19,0)) * (tp + fn)"
        " + CAST(fn + tn AS DECIMAL(19,0)) * (fp + tn))"
        " div nullif(CAST(tp + fp + fn + tn AS DECIMAL(19,0)) * (tp + fp + fn + tn), 0)"
        " AS BIGINT) AS pe_ppm",
        f"{_KAPPA_EXPR} AS kappa",
    )


# ---------------------------------------------------------------------------
# ts_bollinger_breaches — band-breach counts with NO float anywhere
# ---------------------------------------------------------------------------
# Daily revenue cents per event type; a day breaches the ±2σ band of
# its trailing 7-row frame (6 preceding + current, population σ) iff
#   |n·x − Σ| > 2·σ·n  ⟺  (n·x − Σ)² > 4·(n·Σx² − Σ²),
# signed by (n·x − Σ). Every quantity is an exact integer: d = n·x − Σ
# stays in BIGINT (overflow needs > 1.3e18 cents/day), the squares and
# Σx² ride DECIMAL(38,0)/HUGEINT (a 100 TB corpus' squared daily cents
# pass int64). No division, no sqrt, no float — the breach flag is a
# pure integer predicate, identical on both engines.

BOLLINGER_ORACLE = """
WITH grid AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), banded AS (
  SELECT event_type, cents,
         COUNT(*) OVER w AS n,
         SUM(cents) OVER w AS s1,
         SUM(CAST(cents AS HUGEINT) * cents) OVER w AS s2
  FROM grid
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
), flagged AS (
  SELECT event_type,
         n * cents - s1 AS d,
         CAST(n * cents - s1 AS HUGEINT) * (n * cents - s1) AS d2,
         4 * (n * s2 - CAST(s1 AS HUGEINT) * s1) AS v4
  FROM banded
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(COUNT(*) FILTER (d > 0 AND d2 > v4) AS BIGINT) AS breaches_up,
       CAST(COUNT(*) FILTER (d < 0 AND d2 > v4) AS BIGINT) AS breaches_down
FROM flagged GROUP BY event_type ORDER BY event_type
"""


@register("ts_bollinger_breaches", BOLLINGER_ORACLE)
def ts_bollinger_breaches(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    grid = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint").alias("cents"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    banded = grid.select(
        "event_type",
        "cents",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("cents").over(w).alias("s1"),
        F.sum(F.col("cents").cast("decimal(19,0)") * F.col("cents")).over(w).alias("s2"),
    )
    flagged = banded.selectExpr(
        "event_type",
        "n * cents - s1 AS d",
        "CAST(n * cents - s1 AS DECIMAL(19,0)) * (n * cents - s1) AS d2",
        "4 * (n * s2 - CAST(s1 AS DECIMAL(19,0)) * s1) AS v4",
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.count_if((F.col("d") > 0) & (F.col("d2") > F.col("v4"))).cast("bigint").alias("breaches_up"),
            F.count_if((F.col("d") < 0) & (F.col("d2") > F.col("v4"))).cast("bigint").alias("breaches_down"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# ev_signup_to_first_purchase — cross-type activation funnel latency
# ---------------------------------------------------------------------------
# Per user: first signup, then the first purchase AT OR AFTER it. The
# purchase stream joins the user-grain signup relation (one BIGINT per
# user, collapsed map-side before the join); gaps are exact epoch_us,
# non-negative by construction → div ≡ //. One output row.

SIGNUP_PURCHASE_ORACLE = """
WITH s AS (
  SELECT user_id, MIN(epoch_us(ts)) AS s_us
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), conv AS (
  SELECT s.user_id, s.s_us, MIN(epoch_us(e.ts)) AS p_us
  FROM s LEFT JOIN events e
    ON e.user_id = s.user_id AND e.event_type = 'purchase'
   AND epoch_us(e.ts) >= s.s_us
  GROUP BY s.user_id, s.s_us
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_signup_users,
       CAST(COUNT(p_us) AS BIGINT) AS n_converted,
       1000000 * COUNT(p_us) // NULLIF(COUNT(*), 0) AS conversion_ppm,
       CAST(SUM(p_us - s_us) AS BIGINT) AS sum_latency_us,
       CAST(MAX(p_us - s_us) AS BIGINT) AS max_latency_us,
       CAST(SUM(p_us - s_us) // NULLIF(COUNT(p_us), 0) AS BIGINT) AS avg_latency_us
FROM conv
"""


@register("ev_signup_to_first_purchase", SIGNUP_PURCHASE_ORACLE)
def ev_signup_to_first_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    s = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("s_us"))
    )
    p = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("p_us")
    )
    conv = (
        s.join(p, (s.user_id == p.user_id) & (p.p_us >= s.s_us), "left")
        .groupBy(s.user_id, "s_us")
        .agg(F.min("p_us").alias("p_us"))
    )
    return conv.selectExpr(
        "CAST(COUNT(*) AS BIGINT) AS n_signup_users",
        "CAST(COUNT(p_us) AS BIGINT) AS n_converted",
        "1000000 * COUNT(p_us) div nullif(COUNT(*), 0) AS conversion_ppm",
        "CAST(SUM(p_us - s_us) AS BIGINT) AS sum_latency_us",
        "CAST(MAX(p_us - s_us) AS BIGINT) AS max_latency_us",
        "CAST(SUM(p_us - s_us) div nullif(COUNT(p_us), 0) AS BIGINT) AS avg_latency_us",
    )
