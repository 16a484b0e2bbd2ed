"""r11 wave 28: purchase-day streaks and the part adoption curve.

- ev_purchase_streaks is the engagement-streak readout (the Duolingo
  metric): each user's LONGEST run of consecutive calendar days with
  ≥1 purchase, via the classic day-index-minus-dense-rank island key
  on the distinct (user, purchase-day) relation, emitted as the
  bounded longest-streak histogram.
- q_part_adoption_curve is the product-adoption S-curve: parts by
  FIRST ship quarter, with the cumulative share of the catalog
  adopted by each quarter in floor ppm — the launch-velocity readout
  (vocab_growth's shape, on the catalog axis).

Determinism: day indices, dense ranks, island keys, and cumulative
counts are exact integers; shares are floor-ppm BIGINT divisions.

Scale notes (100 TB): streaks reduce to distinct (user, day) rows
map-side, run ONE user-grain window pair (row_number shares the
exchange), and collapse to a per-user max before the bounded
histogram; adoption reduces lineitem at part grain (min shipdate is
a partial agg), then windows ride the ≤|quarters| grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# ev_purchase_streaks — longest consecutive purchase-day run per user
# ---------------------------------------------------------------------------

STREAKS_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS d
  FROM events WHERE event_type = 'purchase'
), keyed AS (
  SELECT user_id, d,
         d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS island
  FROM ud
), runs AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS run_len
  FROM keyed GROUP BY user_id, island
), longest AS (
  SELECT user_id, CAST(MAX(run_len) AS BIGINT) AS longest_streak
  FROM runs GROUP BY user_id
)
SELECT longest_streak,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM longest
GROUP BY longest_streak
ORDER BY longest_streak
"""


@register("ev_purchase_streaks", STREAKS_ORACLE)
def ev_purchase_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ud = (
        e.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("bigint")
            .alias("d"),
        )
        .distinct()
    )
    keyed = ud.select(
        "user_id", "d",
        (F.col("d") - F.row_number().over(Window.partitionBy("user_id").orderBy("d")))
        .alias("island"),
    )
    runs = keyed.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("bigint").alias("run_len")
    )
    longest = runs.groupBy("user_id").agg(
        F.max("run_len").cast("bigint").alias("longest_streak")
    )
    return (
        longest.groupBy("longest_streak")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("longest_streak")
    )


# ---------------------------------------------------------------------------
# q_part_adoption_curve — catalog adoption by first-ship quarter
# ---------------------------------------------------------------------------

ADOPTION_ORACLE = """
WITH first_ship AS (
  SELECT l_partkey AS pk,
         CAST(date_trunc('quarter', MIN(l_shipdate)) AS TIMESTAMP) AS q0
  FROM lineitem GROUP BY 1
), per_q AS (
  SELECT q0, CAST(COUNT(*) AS BIGINT) AS n_new FROM first_ship GROUP BY q0
)
SELECT q0 AS quarter,
       n_new,
       CAST(SUM(n_new) OVER (ORDER BY q0 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_adopted,
       CAST(1000000 * SUM(n_new) OVER (ORDER BY q0 ROWS UNBOUNDED PRECEDING)
            // SUM(n_new) OVER () AS BIGINT) AS adopted_share_ppm
FROM per_q
ORDER BY quarter
"""


@register("q_part_adoption_curve", ADOPTION_ORACLE)
def q_part_adoption_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    first_ship = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.date_trunc("quarter", F.min("l_shipdate")).alias("q0")
    )
    per_q = first_ship.groupBy("q0").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new")
    )
    wrun = Window.orderBy("q0").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return per_q.select(
        F.col("q0").alias("quarter"),
        "n_new",
        F.sum("n_new").over(wrun).cast("bigint").alias("n_adopted"),
        F.expr(
            "CAST(1000000 * SUM(n_new) OVER (ORDER BY q0 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            " div SUM(n_new) OVER () AS BIGINT)"
        ).alias("adopted_share_ppm"),
    ).orderBy("quarter")
