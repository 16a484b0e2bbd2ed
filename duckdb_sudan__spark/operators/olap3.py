"""Third wave of relational/OLAP surface (r4): QUALIFY-style window
filtering, map-type functions, lambda-over-array aggregation, native
recursive CTEs, and boolean aggregates.

Closes the remaining commonly-hit DuckDB surface the reference engine
exposes "for free" (QUALIFY, map_from_entries / map_extract /
cardinality, list_filter / list_transform / list_aggregate,
WITH RECURSIVE, bool_and/bool_or) — re-expressed as Catalyst plans.
Every entry is a JVM-side expression pipeline with the scale shape
noted per operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# qualify_top_orders — QUALIFY rn <= 3 (filter on a window function).
# DuckDB spells the filter QUALIFY; Spark expresses it as a post-window
# predicate — same semantics, and Catalyst pushes the rank limit into
# the window sort (WindowGroupLimit) where possible.
# ---------------------------------------------------------------------------

QUALIFY_ORACLE = """
SELECT c_mktsegment, o_orderkey, o_totalprice,
       ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rn
FROM orders JOIN customer ON o_custkey = c_custkey
QUALIFY rn <= 3
ORDER BY c_mktsegment, rn
"""


@register("qualify_top_orders", QUALIFY_ORACLE)
def qualify_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase top-k: a local row_number per (segment, input
    partition) prunes to ≤k rows per partition BEFORE the per-segment
    shuffle, so the global window sees ≤ k·num_partitions rows per
    segment instead of ALL of them. With 5 segments at 100 TB, a naive
    single window would concentrate the whole orders table onto 5
    reducers — the two-phase shape is the difference between a skew
    stall and an even shuffle. Correct for any partitioning: every
    global top-k row is a local top-k row of its own partition."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("pid", F.spark_partition_id())
    )
    order_cols = [F.desc("o_totalprice"), F.asc("o_orderkey")]
    local_w = Window.partitionBy("c_mktsegment", "pid").orderBy(*order_cols)
    survivors = (
        joined.withColumn("lrn", F.row_number().over(local_w))
        .where(F.col("lrn") <= 3)
        .drop("pid", "lrn")
    )
    global_w = Window.partitionBy("c_mktsegment").orderBy(*order_cols)
    return (
        survivors.withColumn("rn", F.row_number().over(global_w))
        .where(F.col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    )


# ---------------------------------------------------------------------------
# map_event_counts — map_from_entries / element_at / cardinality
# (DuckDB map_from_entries / map_extract[1] / cardinality)
# ---------------------------------------------------------------------------

MAP_ORACLE = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events WHERE user_id % 97 = 0 GROUP BY 1, 2
)
SELECT user_id,
       COALESCE(map_extract(m, 'click')[1], 0) AS n_click,
       COALESCE(map_extract(m, 'purchase')[1], 0) AS n_purchase,
       CAST(cardinality(m) AS INT) AS n_types
FROM (
  SELECT user_id, map_from_entries(list_sort(list((event_type, n)))) AS m
  FROM c GROUP BY user_id
)
ORDER BY user_id
"""


@register("map_event_counts", MAP_ORACLE)
def map_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map columns as first-class values: per-user event-type count
    map built with map_from_entries over a collected struct list, then
    element_at lookups. Scale shape: one partial-agg shuffle on
    (user_id, event_type), then one on user_id; the map is bounded by
    event-type cardinality, never by row count."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") % 97 == 0)
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    m = c.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    return (
        m.select(
            "user_id",
            F.coalesce(F.element_at("m", F.lit("click")), F.lit(0)).alias("n_click"),
            F.coalesce(F.element_at("m", F.lit("purchase")), F.lit(0)).alias("n_purchase"),
            F.size(F.map_keys("m")).cast("int").alias("n_types"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# list_lambda_docs — lambda-over-array beyond array_funcs
# (DuckDB list_filter / list_transform / list_aggregate)
# ---------------------------------------------------------------------------

LIST_LAMBDA_ORACLE = """
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 5)) AS BIGINT) AS n_long,
       CAST(list_aggregate(list_transform(string_split(text, ' '), t -> length(t)), 'sum') AS BIGINT) AS total_len,
       CAST(list_aggregate(list_transform(string_split(text, ' '), t -> length(t)), 'max') AS BIGINT) AS max_len
FROM documents
ORDER BY doc_id
"""


@register("list_lambda_docs", LIST_LAMBDA_ORACLE)
def list_lambda_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions over the token array: filter / transform
    / aggregate — all JVM expressions in one map stage, no explode and
    no shuffle beyond the output sort."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    lens = F.transform(toks, lambda t: F.length(t))
    return (
        d.select(
            "doc_id",
            F.size(F.filter(toks, lambda t: F.length(t) > 5)).cast("long").alias("n_long"),
            F.aggregate(lens, F.lit(0).cast("long"), lambda acc, x: acc + x).alias("total_len"),
            F.array_max(lens).cast("long").alias("max_len"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# recursive_cte_chain — WITH RECURSIVE parity (Spark 4 executes
# recursive CTEs natively via UnionLoop; DuckDB has had them forever)
# ---------------------------------------------------------------------------

RECURSIVE_SQL = """
WITH RECURSIVE walk(custkey, node, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM {customer} WHERE c_custkey % 37 = 0
  UNION ALL
  SELECT custkey, CAST(FLOOR(node / 10) AS BIGINT), depth + 1
  FROM walk WHERE node > 0
)
SELECT custkey,
       MAX(depth) AS depth_to_root,
       CAST(SUM(node) AS BIGINT) AS path_sum
FROM walk
GROUP BY custkey
ORDER BY custkey
"""

RECURSIVE_ORACLE = RECURSIVE_SQL.format(customer="customer")


@register("recursive_cte_chain", RECURSIVE_ORACLE)
def recursive_cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native recursive CTE on BOTH engines — identical SQL text (the
    decimal-digit parent chain custkey → custkey/10 → … → 0 recurses
    ~7 levels over the selected keys). Spark executes the recursion as
    an iterated UnionLoop of joins — the engine-native version of the
    iterative min-label propagation dedup_components hand-rolls, with
    per-step work bounded by the frontier, not the table."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_rc")
    return spark.sql(RECURSIVE_SQL.format(customer="customer_rc"))


# ---------------------------------------------------------------------------
# agg_bool — bool_and / bool_or aggregates (DuckDB bool_and/bool_or,
# Spark every/some — ANSI names bool_and/bool_or on both)
# ---------------------------------------------------------------------------

BOOL_ORACLE = """
SELECT l_returnflag,
       bool_and(l_quantity > 5) AS all_qty_gt5,
       bool_or(l_discount > 0.09) AS any_big_disc,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("agg_bool", BOOL_ORACLE)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates are associative+commutative → full map-side
    partial aggregation, one tiny shuffle on the group key."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.bool_and(F.col("l_quantity") > 5).alias("all_qty_gt5"),
            F.bool_or(F.col("l_discount") > 0.09).alias("any_big_disc"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )
