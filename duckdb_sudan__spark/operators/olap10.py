"""Tenth wave of relational/OLAP surface (r5c): POSITIONAL JOIN and
UNION (ALL) BY NAME — two DuckDB-specific syntaxes users lean on, with
their deterministic Spark re-expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# join_positional — POSITIONAL JOIN of two ordered daily series
# ---------------------------------------------------------------------------

POSITIONAL_ORACLE = """
SELECT a.order_day, a.n_orders, b.ship_day, b.n_ships
FROM (
  SELECT o_orderdate AS order_day, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders WHERE o_orderdate < TIMESTAMP '1995-03-01'
  GROUP BY 1 ORDER BY 1
) a
POSITIONAL JOIN (
  SELECT l_shipdate AS ship_day, CAST(COUNT(*) AS BIGINT) AS n_ships
  FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-02-01'
  GROUP BY 1 ORDER BY 1
) b
ORDER BY COALESCE(a.order_day, TIMESTAMP '9999-01-01'),
         COALESCE(b.ship_day, TIMESTAMP '9999-01-01')
"""


@register("join_positional", POSITIONAL_ORACLE)
def join_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSITIONAL JOIN parity — zip two ORDERED series row-by-row (the
    k-th earliest order day next to the k-th earliest ship day; the
    paired-series alignment DuckDB gives as syntax). Spark
    re-expression: row_number over each side's explicit order, FULL
    OUTER join on the position — which reproduces DuckDB's NULL
    padding of the shorter side exactly. The position key is dense and
    collision-free, and both sides are already aggregated (≤ days
    rows), so the join is tiny regardless of fact size; the fact
    tables pay one pushed-filter scan + partial agg each. Determinism:
    position is defined BY the ORDER BY (day), never by file order."""
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < F.lit("1995-03-01").cast("timestamp"))
        .groupBy(F.col("o_orderdate").alias("order_day"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    l = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") < F.lit("1995-02-01").cast("timestamp"))
        .groupBy(F.col("l_shipdate").alias("ship_day"))
        .agg(F.count(F.lit(1)).alias("n_ships"))
    )
    a = o.withColumn("pos", F.row_number().over(Window.orderBy("order_day")))
    b = l.withColumn("pos", F.row_number().over(Window.orderBy("ship_day")))
    far = F.lit("9999-01-01").cast("timestamp")
    return (
        a.join(b, "pos", "full_outer")
        .select("order_day", "n_orders", "ship_day", "n_ships")
        .orderBy(F.coalesce("order_day", far), F.coalesce("ship_day", far))
    )


# ---------------------------------------------------------------------------
# setops_by_name — UNION ALL BY NAME with missing-column padding
# ---------------------------------------------------------------------------

UNION_BY_NAME_ORACLE = """
SELECT * FROM (
  SELECT o_orderpriority AS segment, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total_price
  FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
  GROUP BY 1
  UNION ALL BY NAME
  SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n
  FROM customer
  GROUP BY 1
)
ORDER BY segment, n
"""


@register("setops_by_name", UNION_BY_NAME_ORACLE)
def setops_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL BY NAME parity — combine two differently-shaped
    summaries by COLUMN NAME, padding the missing column with NULL
    (DuckDB syntax ⇄ Spark `unionByName(allowMissingColumns=True)`;
    a positional UNION here would silently mis-align columns, which is
    the bug this operator exists to avoid). Both inputs are pre-
    aggregated, so the union is trivially small; the decimal price
    sum keeps the only double bit-stable."""
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
        .groupBy(F.col("o_orderpriority").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(27,6)")).cast("double").alias("total_price"),
        )
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return o.unionByName(c, allowMissingColumns=True).orderBy("segment", "n")


# ---------------------------------------------------------------------------
# sudan_wb_pivot — reference provider data composed with the OLAP layer
# ---------------------------------------------------------------------------


def _wb_pivot_oracle() -> str:
    from duckdb_sudan__spark.providers import api

    inner = api.worldbank_oracle("SP.POP.TOTL", ["SDN", "EGY", "ETH"])
    return f"""
SELECT country_name,
       MAX(CASE WHEN year = 2000 THEN CAST(value AS BIGINT) END) AS y2000,
       MAX(CASE WHEN year = 2010 THEN CAST(value AS BIGINT) END) AS y2010,
       MAX(CASE WHEN year = 2020 THEN CAST(value AS BIGINT) END) AS y2020,
       MAX(CASE WHEN year = 2023 THEN CAST(value AS BIGINT) END) AS y2023,
       CAST(SUM(CAST(value AS BIGINT)) AS BIGINT) AS person_years,
       CAST(COUNT(value) AS BIGINT) AS n_years
FROM ({inner})
GROUP BY country_name ORDER BY country_name
"""


def _register_wb_pivot() -> None:
    @register("sudan_wb_pivot", _wb_pivot_oracle())
    def sudan_wb_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The reference surface composed with the OLAP layer: the
        SUDAN_WorldBank table function's output pivoted into a
        per-country wide comparison (selected census years + total
        person-years) — exactly the query shape extension users write
        around the table functions, proving provider DataFrames drop
        into groupBy/pivot like any other relation. Population values
        are integral doubles, so the BIGINT casts are exact on both
        engines (DuckDB rounds double→bigint, Spark truncates — only
        integral values make the two agree, which the sample data
        guarantees). The provider relation is tiny; at scale the same
        pivot over a big fact table is the conditional-agg one-pass
        pivot_status already pins."""
        from duckdb_sudan__spark.providers import api

        wb = api.sudan_worldbank(spark, "SP.POP.TOTL", ["SDN", "EGY", "ETH"])
        v = F.col("value").cast("bigint")
        return (
            wb.groupBy("country_name")
            .agg(
                F.max(F.when(F.col("year") == 2000, v)).alias("y2000"),
                F.max(F.when(F.col("year") == 2010, v)).alias("y2010"),
                F.max(F.when(F.col("year") == 2020, v)).alias("y2020"),
                F.max(F.when(F.col("year") == 2023, v)).alias("y2023"),
                F.sum(v).cast("bigint").alias("person_years"),
                F.count("value").cast("bigint").alias("n_years"),
            )
            .orderBy("country_name")
        )


_register_wb_pivot()
