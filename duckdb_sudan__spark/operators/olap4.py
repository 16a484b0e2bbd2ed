"""Fourth wave of relational/OLAP surface (r5): lambda-comparator list
sort, arg_max top-K (DuckDB ``max_by(x, y, k)``), and table-function
series generation (DuckDB ``generate_series`` ⇄ Spark ``range()``).

Closes the r4 verdict's remaining DuckDB-surface sweep (item 8). Every
entry is a JVM-side expression pipeline; scale shape noted per
operator (reference parity: DuckDB list/aggregate/TVF surface the
sudan extension ships with, docs/functions.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# list_sort_lambda — array_sort with a CUSTOM comparator lambda
# (DuckDB expresses the same order as a decorate-sort-undecorate over
# a named struct; Spark runs the comparator directly). Order: token
# length ascending, ties lexicographic ascending — not the natural
# string order, so a default sort cannot fake it.
# ---------------------------------------------------------------------------

LIST_SORT_LAMBDA_ORACLE = """
SELECT doc_id,
       array_to_string(
         list_slice(
           list_transform(
             list_sort(list_transform(string_split(text, ' '),
                                      t -> {'len': length(t), 'tok': t})),
             s -> s.tok),
           1, 5),
         ' ') AS first5_by_len
FROM documents
ORDER BY doc_id
"""


@register("list_sort_lambda", LIST_SORT_LAMBDA_ORACLE)
def list_sort_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparator-lambda sort: tokens ordered by (length, value) via
    array_sort's two-argument lambda — a pure JVM expression, map-only,
    no shuffle beyond the output sort. The comparator defines a total
    order (falls back to string compare on equal lengths), so the
    result is deterministic regardless of split order."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    def by_len_then_lex(l, r):  # noqa: E741 - comparator convention
        return (
            F.when(F.length(l) < F.length(r), F.lit(-1))
            .when(F.length(l) > F.length(r), F.lit(1))
            .when(l < r, F.lit(-1))
            .when(l > r, F.lit(1))
            .otherwise(F.lit(0))
        )

    return (
        d.select(
            "doc_id",
            F.array_join(F.slice(F.array_sort(toks, by_len_then_lex), 1, 5), " ").alias(
                "first5_by_len"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# agg_topk_orders — arg_max top-K (DuckDB `max_by(x, y, k)` semantics).
# DuckDB's native 3-arg max_by leaves ties unspecified, so BOTH sides
# spell the deterministic form: top-k by (value, key) struct order —
# ties broken by the key itself, a total order either engine can hash.
# ---------------------------------------------------------------------------

TOPK_ORDERS_ORACLE = """
SELECT o_orderpriority,
       array_to_string(
         list_transform(
           list_slice(list_sort(list({'p': o_totalprice, 'k': o_orderkey}), 'DESC'), 1, 3),
           s -> CAST(s.k AS VARCHAR)),
         ',') AS top3_orderkeys,
       max(o_totalprice) AS max_price,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("agg_topk_orders", TOPK_ORDERS_ORACLE)
def agg_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by(x, y, k): per-priority top-3 order keys by totalprice.
    Scale shape: the naive groupBy(priority).collect_list would
    concentrate the ENTIRE fact table onto 5 reducers — a skew stall
    at 100 TB. The two-phase form shuffles the fact ONCE on the
    balanced (priority, input-partition) key (~5·num_partitions evenly
    sized groups), prunes each to its local top-3 there, and only the
    ≤3-per-partition survivors plus scalar partials reach the 5-key
    final shuffle (same posture as qualify_top_orders; correct because
    every global top-k element is a local top-k element of its
    partition)."""
    o = load_table(spark, sf_dir, "orders")
    pk = F.struct(F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k"))
    # phase 1: per (group, input-partition) top-3 + partial max/count
    local = (
        o.select("o_orderpriority", "o_totalprice", "o_orderkey")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("o_orderpriority", "pid")
        .agg(
            F.slice(F.sort_array(F.collect_list(pk), asc=False), 1, 3).alias("top"),
            F.max("o_totalprice").alias("pmax"),
            F.count(F.lit(1)).alias("pn"),
        )
    )
    # phase 2: merge the ≤3·partitions survivors per group (flatten the
    # per-pid top arrays — no explode, so pmax/pn stay one row per pid
    # and sum/max recover the exact group aggregates)
    return (
        local.groupBy("o_orderpriority")
        .agg(
            F.array_join(
                F.transform(
                    F.slice(F.sort_array(F.flatten(F.collect_list("top")), asc=False), 1, 3),
                    lambda s: s["k"].cast("string"),
                ),
                ",",
            ).alias("top3_orderkeys"),
            F.max("pmax").alias("max_price"),
            F.sum("pn").alias("n"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# series_calendar — table-function series generation: Spark's range()
# TVF ⇄ DuckDB generate_series, driving a calendar LEFT JOIN against
# daily order counts (the TVF is the *source*, not derived from data —
# distinct from ts_gapfill_days, whose grid comes from observed rows).
# ---------------------------------------------------------------------------

_SERIES_SPARK_SQL = """
WITH cal AS (
  SELECT date_add(DATE '1995-01-01', CAST(id AS INT)) AS d
  FROM range(0, 365)
),
oc AS (
  SELECT to_date(o_orderdate) AS d, COUNT(*) AS n_orders
  FROM {orders}
  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
  GROUP BY to_date(o_orderdate)
)
SELECT CAST(cal.d AS TIMESTAMP) AS d, weekday(cal.d) + 1 AS isodow,
       COALESCE(oc.n_orders, 0) AS n_orders
FROM cal LEFT JOIN oc ON cal.d = oc.d
ORDER BY cal.d
"""

SERIES_CALENDAR_ORACLE = """
WITH cal AS (
  SELECT CAST(DATE '1995-01-01' + INTERVAL (i) DAY AS DATE) AS d
  FROM generate_series(0, 364) t(i)
),
oc AS (
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
  GROUP BY CAST(o_orderdate AS DATE)
)
SELECT CAST(cal.d AS TIMESTAMP) AS d, isodow(cal.d) AS isodow,
       COALESCE(oc.n_orders, 0) AS n_orders
FROM cal LEFT JOIN oc ON cal.d = oc.d
ORDER BY cal.d
"""


@register("series_calendar", SERIES_CALENDAR_ORACLE)
def series_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """generate_series parity through Spark's native range() TVF — the
    365-row generated side is tiny and broadcasts to the aggregated
    daily counts; the only fact work is one pushed-filter scan + one
    partial agg shuffle on the date. At 100 TB the calendar side is
    still 365 rows — the plan never materializes a big generated
    relation."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_cal")
    return spark.sql(_SERIES_SPARK_SQL.format(orders="orders_cal"))
