"""r11 wave 26: customer tier-migration matrix.

- q_tier_migration_matrix is the RFM-style migration readout every
  retention team runs: tier customers by yearly spend (NTILE(3) on
  the deterministic (spend, custkey) order WITHIN each year), then
  count year-over-year tier transitions for customers active in both
  years. Upgrades live below the diagonal, churn risk above — the
  bounded (year-pair × 3 × 3) matrix is the board slide.

Determinism: integer cents; NTILE on a total order; transition counts
are exact BIGINTs.

Scale notes (100 TB): one (customer, year) reduce of orders (map-
combined), one NTILE window partitioned BY YEAR over that reduced
relation (each partition is a year's customer base, not raw orders),
and a self-join on customer across adjacent years — an equi-join on
(custkey, year+1) with AQE handling the skew-free key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

TIER_MIGRATION_ORACLE = """
WITH cy AS (
  SELECT o_custkey AS cust,
         CAST(year(o_orderdate) AS BIGINT) AS y,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
), tiered AS (
  SELECT cust, y,
         CAST(ntile(3) OVER (PARTITION BY y ORDER BY cents, cust) AS BIGINT) AS tier
  FROM cy
), paired AS (
  SELECT a.y AS y0, a.tier AS tier_from, b.tier AS tier_to
  FROM tiered a JOIN tiered b ON a.cust = b.cust AND b.y = a.y + 1
)
SELECT y0, tier_from, tier_to, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM paired
GROUP BY y0, tier_from, tier_to
ORDER BY y0, tier_from, tier_to
"""


@register("q_tier_migration_matrix", TIER_MIGRATION_ORACLE)
def q_tier_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cy = o.groupBy(
        F.col("o_custkey").alias("cust"),
        F.year("o_orderdate").cast("bigint").alias("y"),
    ).agg(
        F.expr("CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)").alias("cents")
    )
    tiered = cy.select(
        "cust", "y",
        F.ntile(3)
        .over(Window.partitionBy("y").orderBy("cents", "cust"))
        .cast("bigint")
        .alias("tier"),
    )
    tiered = tiered.cache()  # both sides of the adjacent-year self-join
    a = tiered.select("cust", F.col("y").alias("y0"), F.col("tier").alias("tier_from"))
    b = tiered.select(
        F.col("cust").alias("cust_b"), F.col("y").alias("y1"), F.col("tier").alias("tier_to")
    )
    paired = a.join(
        b, (F.col("cust") == F.col("cust_b")) & (F.col("y1") == F.col("y0") + 1)
    )
    return (
        paired.groupBy("y0", "tier_from", "tier_to")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
        .orderBy("y0", "tier_from", "tier_to")
    )
