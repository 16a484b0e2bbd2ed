"""r11 wave 27: Pettitt changepoint test and binned average precision.

- ts_pettitt_changepoint is the RANK-based changepoint test (the
  robust complement to ts_changepoint_cusum's value-based CUSUM and
  ts_mann_kendall's monotone-trend S): U_t over the daily revenue
  grid via the exact recurrence U_t = Σ_{s≤t} W_s with
  W_t = Σ_{j≠t} sgn(x_j − x_t) — ONE n² sign-pair aggregate on the
  CALENDAR-bounded grid (the Mann-Kendall rule: quadratic in days,
  never rows), a cumulative window, and an argmax. The significance
  exponent 6K²/(n³+n²) is emitted as floor-micro via the DOUBLE floor
  idiom — K and n are BIGINT (correctly-rounded →DOUBLE on both
  engines, rule 30) and the shared IEEE ratio tree is floored
  identically, so the emission is span-unbounded (r11 ADVICE: the old
  pure-int64 6K² wrapped once the daily grid passed ~1,500 days; the
  consumer applies exp — rule 1 keeps transcendentals out of the
  hash).
- ml_average_precision_binned completes the binned ranking family
  (PR curve, lift/gain, cost curve): AP = Σ_bins ΔTP·TP/(P·PP) with
  each bin's contribution floor-quantized to ppm BEFORE the sum (the
  bins' rationals have unrelated denominators — rule 3), over the
  same bounded KS bin grid.

Determinism: sign pairs, rank sums, and bin moments are exact
integers; floor-ppm on non-negative BIGINT products only.

Scale notes (100 TB): Pettitt's pair stage is quadratic in calendar
DAYS (SF-invariant) over the day-grain reduce; AP pays the one
map-combined shuffle into ≤1000 bins that the whole binned family
shares, then windows only the grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.operators.olap18 import KS_BIN_SCALE, KS_BINS
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# ts_pettitt_changepoint — rank-based mean-shift detection
# ---------------------------------------------------------------------------

PETTITT_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
), w AS (
  SELECT a.day,
         CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                       WHEN b.cents < a.cents THEN -1 ELSE 0 END) AS BIGINT) AS w_t
  FROM daily a JOIN daily b ON a.day <> b.day
  GROUP BY a.day
), u AS (
  SELECT day,
         CAST(SUM(w_t) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS u_t,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         row_number() OVER (ORDER BY day) AS rn
  FROM w
), peak AS (
  SELECT day, u_t, n,
         row_number() OVER (ORDER BY ABS(u_t) DESC, day) AS pk
  FROM u WHERE rn < n
)
SELECT n AS n_days,
       CAST(ABS(u_t) AS BIGINT) AS k_stat,
       day AS change_day,
       CAST(FLOOR((6000000.0 * CAST(ABS(u_t) AS DOUBLE) * CAST(ABS(u_t) AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
               + CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS BIGINT) AS exponent_micro
FROM peak WHERE pk = 1
"""


@register("ts_pettitt_changepoint", PETTITT_ORACLE)
def ts_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.expr("CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)").alias("cents")
    )
    daily = daily.cache()  # both sides of the bounded sign-pair join
    a = daily.select(F.col("day").alias("day_a"), F.col("cents").alias("c_a"))
    b = daily.select(F.col("day").alias("day_b"), F.col("cents").alias("c_b"))
    w = (
        a.join(b, F.col("day_a") != F.col("day_b"))
        .groupBy("day_a")
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN c_b > c_a THEN 1 WHEN c_b < c_a THEN -1 ELSE 0 END) AS BIGINT)"
            ).alias("w_t")
        )
        .withColumnRenamed("day_a", "day")
    )
    wrun = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    u = w.select(
        "day",
        F.sum("w_t").over(wrun).cast("bigint").alias("u_t"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n"),
        F.row_number().over(Window.orderBy("day")).alias("rn"),
    )
    peak = u.where(F.col("rn") < F.col("n")).select(
        "day", "u_t", "n",
        F.row_number().over(Window.orderBy(F.abs("u_t").desc(), "day")).alias("pk"),
    )
    return peak.where(F.col("pk") == 1).selectExpr(
        "n AS n_days",
        "CAST(ABS(u_t) AS BIGINT) AS k_stat",
        "day AS change_day",
        "CAST(FLOOR((6000000.0 * CAST(ABS(u_t) AS DOUBLE) * CAST(ABS(u_t) AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
        "    + CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS BIGINT) AS exponent_micro",
    )


# ---------------------------------------------------------------------------
# ml_average_precision_binned — AP over the bounded score-bin grid
# ---------------------------------------------------------------------------

AP_ORACLE = f"""
WITH binned AS (
  SELECT CAST(least({KS_BINS - 1}, floor(value * {KS_BIN_SCALE})) AS INTEGER) AS bin,
         CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS np,
         CAST(COUNT(*) AS BIGINT) AS nt
  FROM events GROUP BY 1
), cum AS (
  SELECT bin, np,
         SUM(np) OVER (ORDER BY bin DESC) AS tp,
         SUM(nt) OVER (ORDER BY bin DESC) AS pp,
         SUM(np) OVER () AS p
  FROM binned
), contrib AS (
  SELECT CAST(1000000 * np * tp // (p * pp) AS BIGINT) AS c_ppm, p
  FROM cum WHERE np > 0
)
SELECT CAST(MAX(p) AS BIGINT) AS n_pos,
       CAST(COUNT(*) AS BIGINT) AS n_contrib_bins,
       CAST(SUM(c_ppm) AS BIGINT) AS ap_ppm
FROM contrib
"""


@register("ml_average_precision_binned", AP_ORACLE)
def ml_average_precision_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bin_ = F.least(F.lit(KS_BINS - 1), F.floor(F.col("value") * KS_BIN_SCALE)).cast("int")
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
    cum = binned.select(
        "bin", "np",
        F.sum("np").over(wtop).alias("tp"),
        F.sum("nt").over(wtop).alias("pp"),
        F.sum("np").over(wall).alias("p"),
    )
    contrib = cum.where(F.col("np") > 0).selectExpr(
        "CAST(1000000 * np * tp div (p * pp) AS BIGINT) AS c_ppm", "p"
    )
    return contrib.agg(
        F.max("p").cast("bigint").alias("n_pos"),
        F.count(F.lit(1)).cast("bigint").alias("n_contrib_bins"),
        F.sum("c_ppm").cast("bigint").alias("ap_ppm"),
    )
