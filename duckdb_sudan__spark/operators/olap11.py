"""r6 wave: DuckDB convenience-SQL parity users hit constantly.

DuckDB popularized `GROUP BY ALL` / `ORDER BY ALL` and the star
modifiers `SELECT * EXCLUDE (...) REPLACE (...)` (docs: Friendly SQL).
Spark 4 speaks the first pair natively (GROUP BY ALL since 3.4, same
resolution rule: every non-aggregate select item becomes a grouping
key) and covers the star modifiers with `* EXCEPT (...)` plus
positional `withColumn` replacement — so both entries run the idiom on
BOTH engines rather than emulating it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# groupby_all_sales — GROUP BY ALL / ORDER BY ALL parity
# ---------------------------------------------------------------------------

GROUPBY_ALL_ORACLE = """
SELECT o_orderstatus,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ALL
ORDER BY ALL
"""


@register("groupby_all_sales", GROUPBY_ALL_ORACLE)
def groupby_all_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`GROUP BY ALL` + `ORDER BY ALL` run NATIVELY on both engines —
    the same SQL text modulo dialect casts (both resolve the grouping
    keys from the non-aggregate select items, and ORDER BY ALL sorts by
    every output column left-to-right). The price sum goes through the
    repo's DECIMAL(27,6) accumulator convention, so the final double is
    bit-identical (DETERMINISM.md rule 2). Plan: one pruned scan, one
    partial-agg shuffle on the two derived keys — GROUP BY ALL is sugar,
    Catalyst plans it exactly like the explicit form."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_gba_orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               CAST(year(o_orderdate) AS INT) AS yr,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total_price
        FROM _gba_orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )


# ---------------------------------------------------------------------------
# select_exclude_replace — SELECT * EXCLUDE (...) REPLACE (...) parity
# ---------------------------------------------------------------------------

EXCLUDE_REPLACE_ORACLE = """
SELECT * EXCLUDE (c_name)
         REPLACE (CAST(round(CAST(c_acctbal AS DECIMAL(18,2)), 0) AS BIGINT) AS c_acctbal,
                  upper(c_mktsegment) AS c_mktsegment)
FROM customer
ORDER BY c_custkey
"""


@register("select_exclude_replace", EXCLUDE_REPLACE_ORACLE)
def select_exclude_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB's star modifiers: `* EXCLUDE (c_name)` maps to Spark's
    native `* EXCEPT (c_name)` (same semantics, dialect keyword), and
    `REPLACE (expr AS col)` maps to in-place withColumn substitution
    (identical column set and positions). The replaced expressions are
    decimal-exact on both engines: round() half-away-from-zero on
    DECIMAL(18,2), then CAST BIGINT so the hashed value is an integer
    (raw DECIMAL output renders differently across the two fetch
    modes — DETERMINISM.md), upper() pure ASCII here. Map-only — the star
    modifiers never change the plan shape, which is the point: users
    get projection sugar without a single extra operator."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_ser_customer")
    return (
        spark.sql("SELECT * EXCEPT (c_name) FROM _ser_customer")
        .withColumn("c_acctbal", F.round(F.col("c_acctbal").cast("decimal(18,2)"), 0).cast("bigint"))
        .withColumn("c_mktsegment", F.upper("c_mktsegment"))
        .orderBy("c_custkey")
    )
