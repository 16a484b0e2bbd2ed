"""r11 wave 18: concordance index, XYZ demand-variability classes, and
a stratified treatment-effect estimator.

- ml_concordance_index is Harrell's C for the time-to-first-purchase
  model (the ranking metric for survival models — complements wave
  15's ev_survival_km_censored): P(score_i > score_j) over comparable
  pairs (i purchased strictly before j's observed end). The pair count
  runs over the JOINT HISTOGRAM (duration, event-flag, score) — the
  grid is calendar×2×score-domain bounded, so the pair stage never
  touches user-grain rows (the naive user×user join is quadratic in
  USERS; this is quadratic only in grid cells).
- q_demand_variability_xyz is the supply-chain XYZ classification
  (the variability axis win_pareto_abc's ABC revenue axis lacks): the
  coefficient of variation of each part's ZERO-FILLED yearly demand
  (yearly because this corpus's per-part order stream is sparse —
  weekly/monthly zero-filled CV puts every part in Z at every SF;
  the grain is a parameter of the statistic, not of the plan),
  WITHOUT materializing zero periods — zeros contribute nothing to
  Σd/Σd², so CV over the full W-period horizon is derivable from the
  observed-period moments plus the global period count
  (σ² = (W·Q − S²)/W², μ = S/W). Class thresholds compare in exact
  integers by squaring: cv < t ⟺ t⁻²·(W·Q − S²) < S² — X(0.5)/Y(1.0)
  become 4·(WQ−S²) < S² and (WQ−S²) < S².
- ml_stratified_ate is the observational-causal workhorse: ATE of
  error exposure on purchase spend, stratified by activity quartile
  (NTILE(4) on the deterministic (event-count, user) order). Per
  stratum: exact integer moments, means as identical double trees, and
  the stratum's ATE contribution in floor micro (double floor idiom —
  the per-stratum means are rationals with unrelated denominators, so
  integer-exact weighting is impossible; the floor(·1e6) quantization
  is the DEFINED statistic on both sides).

Determinism: everything hash-compared is either an exact BIGINT
(counts, cents sums) or a double produced by one literal-identical
IEEE tree from exact integers; floor-ppm only on BIGINT//BIGINT or
via the double floor idiom (never DECIMAL // — the round-then-floor
hazard).

Scale notes (100 TB): concordance reduces users → grid cells in one
partial agg (score capped at SCORE_CAP so the grid stays bounded
under any activity distribution), then an O(cells²) broadcast-able
pair join; XYZ reduces lineitem at (part, year) grain, then (part)
grain, classifies map-side with integer compares, and emits a 3-row
rollup; the ATE strata are a user-grain reduce + one NTILE window on
the reduced relation + a 4×2-cell rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# ml_concordance_index — Harrell's C over the joint histogram
# ---------------------------------------------------------------------------
# Risk score = the user's total event count, capped (higher activity →
# predicted-earlier purchase). Comparable pair: i's purchase duration
# strictly below j's observed duration. Concordant: score_i > score_j
# (counted ×2); score tie counted ×1. c = num2 / (2·den).

SCORE_CAP = 200

CONCORDANCE_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         MIN(CAST(ts AS DATE)) AS first_day,
         MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END) AS fp_day,
         LEAST(COUNT(*), {SCORE_CAP}) AS score
  FROM events GROUP BY user_id
), horizon AS (
  SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events
), durs AS (
  SELECT CAST(CASE WHEN fp_day IS NOT NULL
                   THEN date_diff('day', first_day, fp_day)
                   ELSE date_diff('day', first_day, max_day) END AS BIGINT) AS t,
         CASE WHEN fp_day IS NOT NULL THEN 1 ELSE 0 END AS ev,
         CAST(score AS BIGINT) AS score
  FROM per_user, horizon
), grid AS (
  SELECT t, ev, score, CAST(COUNT(*) AS BIGINT) AS n
  FROM durs GROUP BY t, ev, score
), pairs AS (
  SELECT SUM(CAST(a.n AS DECIMAL(38,0)) * b.n
             * CASE WHEN a.score > b.score THEN 2
                    WHEN a.score = b.score THEN 1 ELSE 0 END) AS num2,
         SUM(CAST(a.n AS DECIMAL(38,0)) * b.n) AS den
  FROM grid a JOIN grid b ON a.ev = 1 AND a.t < b.t
)
SELECT CAST(CAST(num2 AS DOUBLE) / 2 AS DOUBLE) AS concordant_weight,
       CAST(den AS DOUBLE) AS comparable_pairs,
       CASE WHEN den > 0 THEN
         CAST(FLOOR(1000000 * CAST(num2 AS DOUBLE) / (2 * CAST(den AS DOUBLE))) AS BIGINT)
       END AS c_index_ppm
FROM pairs
"""


@register("ml_concordance_index", CONCORDANCE_ORACLE)
def ml_concordance_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    per_user = e.groupBy("user_id").agg(
        F.min(day).alias("first_day"),
        F.min(F.when(F.col("event_type") == "purchase", day)).alias("fp_day"),
        F.least(F.count(F.lit(1)), F.lit(SCORE_CAP)).alias("score"),
    )
    horizon = e.agg(F.max(day).alias("max_day"))
    durs = per_user.crossJoin(F.broadcast(horizon)).select(
        F.when(F.col("fp_day").isNotNull(), F.datediff("fp_day", "first_day"))
        .otherwise(F.datediff("max_day", "first_day"))
        .cast("bigint")
        .alias("t"),
        F.when(F.col("fp_day").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("ev"),
        F.col("score").cast("bigint").alias("score"),
    )
    grid = durs.groupBy("t", "ev", "score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    grid = grid.cache()  # both pair sides read the same bounded grid
    a = grid.where(F.col("ev") == 1).select(
        F.col("t").alias("t_a"), F.col("score").alias("s_a"), F.col("n").alias("n_a")
    )
    b = grid.select(
        F.col("t").alias("t_b"), F.col("score").alias("s_b"), F.col("n").alias("n_b")
    )
    pairs = (
        a.join(b, F.col("t_a") < F.col("t_b"))
        .agg(
            F.expr(
                "SUM(CAST(n_a AS DECIMAL(38,0)) * n_b"
                " * CASE WHEN s_a > s_b THEN 2 WHEN s_a = s_b THEN 1 ELSE 0 END)"
            ).alias("num2"),
            F.expr("SUM(CAST(n_a AS DECIMAL(38,0)) * n_b)").alias("den"),
        )
    )
    return pairs.selectExpr(
        "CAST(CAST(num2 AS DOUBLE) / 2 AS DOUBLE) AS concordant_weight",
        "CAST(den AS DOUBLE) AS comparable_pairs",
        "CASE WHEN den > 0 THEN"
        " CAST(FLOOR(1000000 * CAST(num2 AS DOUBLE) / (2 * CAST(den AS DOUBLE))) AS BIGINT)"
        " END AS c_index_ppm",
    )


# ---------------------------------------------------------------------------
# q_demand_variability_xyz — CV classes of zero-filled yearly demand
# ---------------------------------------------------------------------------

XYZ_ORACLE = """
WITH pw AS (
  SELECT l_partkey AS pk,
         CAST(date_trunc('year', l_shipdate) AS TIMESTAMP) AS wk,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS d
  FROM lineitem GROUP BY 1, 2
), horizon AS (
  SELECT CAST(COUNT(DISTINCT wk) AS BIGINT) AS w FROM pw
), moments AS (
  SELECT pk,
         CAST(SUM(d) AS BIGINT) AS s,
         SUM(CAST(d AS DECIMAL(38,0)) * d) AS q
  FROM pw GROUP BY pk
), classed AS (
  SELECT pk, s,
         CASE WHEN 4 * (w * q - CAST(s AS DECIMAL(38,0)) * s) < CAST(s AS DECIMAL(38,0)) * s THEN 'X'
              WHEN (w * q - CAST(s AS DECIMAL(38,0)) * s) < CAST(s AS DECIMAL(38,0)) * s THEN 'Y'
              ELSE 'Z' END AS xyz_class
  FROM moments, horizon
)
SELECT xyz_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(s) AS BIGINT) AS total_qty
FROM classed
GROUP BY xyz_class
ORDER BY xyz_class
"""


@register("q_demand_variability_xyz", XYZ_ORACLE)
def q_demand_variability_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pw = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.date_trunc("year", "l_shipdate").alias("wk"),
    ).agg(
        F.expr("CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)").alias("d")
    )
    pw = pw.cache()  # 2 consumers: the week-count scalar and the part moments
    horizon = pw.agg(F.countDistinct("wk").cast("bigint").alias("w"))
    moments = pw.groupBy("pk").agg(
        F.sum("d").cast("bigint").alias("s"),
        F.expr("SUM(CAST(d AS DECIMAL(38,0)) * d)").alias("q"),
    )
    classed = moments.crossJoin(F.broadcast(horizon)).selectExpr(
        "pk",
        "s",
        "CASE WHEN 4 * (w * q - CAST(s AS DECIMAL(38,0)) * s) < CAST(s AS DECIMAL(38,0)) * s THEN 'X'"
        " WHEN (w * q - CAST(s AS DECIMAL(38,0)) * s) < CAST(s AS DECIMAL(38,0)) * s THEN 'Y'"
        " ELSE 'Z' END AS xyz_class",
    )
    return (
        classed.groupBy("xyz_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("s").cast("bigint").alias("total_qty"),
        )
        .orderBy("xyz_class")
    )


# ---------------------------------------------------------------------------
# ml_stratified_ate — error-exposure effect on spend, by activity quartile
# ---------------------------------------------------------------------------
# Treatment: the user saw ≥1 'error' event. Outcome: the user's total
# purchase cents. Strata: NTILE(4) on the deterministic (event-count,
# user_id) order — exact quartiles are the DEFINED statistic (at 100 TB
# a user would swap in approx-percentile cutoffs from an aggregate; the
# stratum math below is unchanged). Per-stratum means are rationals
# with unrelated denominators, so the weighted contribution is DEFINED
# as floor micro via the double floor idiom.

ATE_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS treated,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT) AS cents
  FROM events GROUP BY user_id
), tiled AS (
  SELECT treated, cents,
         CAST(ntile(4) OVER (ORDER BY n_events, user_id) AS BIGINT) AS stratum
  FROM per_user
), cells AS (
  SELECT stratum,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(treated) AS BIGINT) AS n_t,
         CAST(COUNT(*) - SUM(treated) AS BIGINT) AS n_c,
         CAST(SUM(CASE WHEN treated = 1 THEN cents ELSE 0 END) AS BIGINT) AS sum_t,
         CAST(SUM(CASE WHEN treated = 0 THEN cents ELSE 0 END) AS BIGINT) AS sum_c
  FROM tiled GROUP BY stratum
)
SELECT stratum, n, n_t, n_c,
       CASE WHEN n_t > 0 THEN CAST(sum_t AS DOUBLE) / CAST(n_t AS DOUBLE) END AS mean_t_cents,
       CASE WHEN n_c > 0 THEN CAST(sum_c AS DOUBLE) / CAST(n_c AS DOUBLE) END AS mean_c_cents,
       CASE WHEN n_t > 0 AND n_c > 0
            THEN CAST(FLOOR(1000000 * (CAST(sum_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                                       - CAST(sum_c AS DOUBLE) / CAST(n_c AS DOUBLE))
                            * CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE)) AS BIGINT)
       END AS ate_contrib_micro
FROM cells
ORDER BY stratum
"""


@register("ml_stratified_ate", ATE_ORACLE)
def ml_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("treated"),
        F.expr(
            "CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'"
            " THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT)"
        ).alias("cents"),
    )
    tiled = per_user.select(
        "treated", "cents",
        F.ntile(4).over(Window.orderBy("n_events", "user_id")).cast("bigint").alias("stratum"),
    )
    cells = tiled.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("treated").cast("bigint").alias("n_t"),
        (F.count(F.lit(1)) - F.sum("treated")).cast("bigint").alias("n_c"),
        F.expr("CAST(SUM(CASE WHEN treated = 1 THEN cents ELSE 0 END) AS BIGINT)").alias("sum_t"),
        F.expr("CAST(SUM(CASE WHEN treated = 0 THEN cents ELSE 0 END) AS BIGINT)").alias("sum_c"),
    )
    return cells.selectExpr(
        "stratum", "n", "n_t", "n_c",
        "CASE WHEN n_t > 0 THEN CAST(sum_t AS DOUBLE) / CAST(n_t AS DOUBLE) END AS mean_t_cents",
        "CASE WHEN n_c > 0 THEN CAST(sum_c AS DOUBLE) / CAST(n_c AS DOUBLE) END AS mean_c_cents",
        "CASE WHEN n_t > 0 AND n_c > 0"
        " THEN CAST(FLOOR(1000000 * (CAST(sum_t AS DOUBLE) / CAST(n_t AS DOUBLE)"
        " - CAST(sum_c AS DOUBLE) / CAST(n_c AS DOUBLE))"
        " * CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE)) AS BIGINT)"
        " END AS ate_contrib_micro",
    ).orderBy("stratum")
