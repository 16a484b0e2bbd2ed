"""Sixth wave of relational/OLAP surface (r5c): mode / discrete
quantile aggregates, running COUNT(DISTINCT) emulation, explicit
SEMI/ANTI join syntax parity, GROUPING() markers over grouping sets,
a forward as-of join, and histogram() aggregate parity.

Reference parity: stock-DuckDB SQL surface available to every
sudan-extension user (the extension registers only table functions —
src/sudan_extension.cpp:30-44); mode()/quantile_disc()/histogram()
and SEMI/ANTI JOIN are documented DuckDB aggregates/syntax. Each
entry spells its tie-breaks explicitly so both engines are forced to
the same deterministic answer (DETERMINISM.md: no engine-internal
tie-break or fp accumulation order is relied on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# agg_mode_quantile — mode() + quantile_disc() with explicit tie-breaks
# ---------------------------------------------------------------------------

MODE_QUANTILE_ORACLE = """
WITH counts AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty, COUNT(*) AS cnt
  FROM lineitem GROUP BY 1, 2
), stats AS (
  SELECT l_returnflag, qty, cnt,
         SUM(cnt) OVER (PARTITION BY l_returnflag) AS n,
         SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY qty
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY cnt DESC, qty) AS mode_rn
  FROM counts
)
SELECT l_returnflag,
       CAST(MAX(n) AS BIGINT) AS n,
       MAX(CASE WHEN mode_rn = 1 THEN qty END) AS mode_qty,
       MAX(CASE WHEN mode_rn = 1 THEN cnt END) AS mode_cnt,
       MIN(CASE WHEN cum >= (n + 1) // 2 THEN qty END) AS median_disc
FROM stats GROUP BY l_returnflag ORDER BY l_returnflag
"""


@register("agg_mode_quantile", MODE_QUANTILE_ORACLE)
def agg_mode_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mode() and quantile_disc(0.5) parity, tie-broken deterministically:
    mode = the SMALLEST value among the most frequent (DuckDB's own
    mode() tie-break is first-seen, i.e. nondeterministic — so both
    sides spell rank-by-(cnt DESC, qty)); the discrete median is the
    element at position ceil(n/2) of the sorted multiset (lower
    median, quantile_disc semantics — an actual element, never an
    interpolation, so there is no fp arithmetic at all).

    Plan: ONE fact shuffle into the (flag, qty) partial-agg counts
    (50 distinct quantities × 3 flags after map-side combine), then
    all three statistics — total n, mode, cumulative-count median —
    come from window functions over that ≤150-row relation sharing
    one partition key. Scale: the count relation is bounded by the
    value-domain cardinality, not the row count, so 100× the fact
    rows changes only the scan stage."""
    l = load_table(spark, sf_dir, "lineitem")
    counts = (
        l.groupBy("l_returnflag", F.col("l_quantity").cast("bigint").alias("qty"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_all = Window.partitionBy("l_returnflag")
    w_cum = w_all.orderBy("qty").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_mode = w_all.orderBy(F.desc("cnt"), "qty")
    stats = counts.select(
        "l_returnflag", "qty", "cnt",
        F.sum("cnt").over(w_all).alias("n"),
        F.sum("cnt").over(w_cum).alias("cum"),
        F.row_number().over(w_mode).alias("mode_rn"),
    )
    return (
        stats.groupBy("l_returnflag")
        .agg(
            F.max("n").alias("n"),
            F.max(F.when(F.col("mode_rn") == 1, F.col("qty"))).alias("mode_qty"),
            F.max(F.when(F.col("mode_rn") == 1, F.col("cnt"))).alias("mode_cnt"),
            F.min(F.when(F.col("cum") >= F.expr("(n + 1) DIV 2"), F.col("qty"))).alias("median_disc"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# win_running_distinct — COUNT(DISTINCT) OVER emulation
# ---------------------------------------------------------------------------

RUNNING_DISTINCT_ORACLE = """
WITH e AS (
  SELECT event_id, user_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn_type
  FROM events WHERE user_id % 19 = 0
)
SELECT event_id, user_id, ts, event_type,
       CAST(SUM(CASE WHEN rn_type = 1 THEN 1 ELSE 0 END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS distinct_types_so_far
FROM e
ORDER BY user_id, ts, event_id
"""


@register("win_running_distinct", RUNNING_DISTINCT_ORACLE)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT event_type) per user — a window shape
    neither engine supports natively (Spark rejects DISTINCT in window
    aggregates outright), emulated exactly: flag each (user, type)'s
    FIRST occurrence with a row_number, then running-sum the flags.
    Tie-break (ts, event_id) makes both windows total orders, so the
    running counts are deterministic. Plan: two window shuffles —
    (user, type) then (user) — both on bounded per-user data; at
    100 TB the per-user partition is the natural unit and neither
    window ever sees cross-user data."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") % 19 == 0)
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = e.select(
        "event_id", "user_id", "ts", "event_type",
        F.row_number().over(w_first).alias("rn_type"),
    )
    return (
        flagged.select(
            "event_id", "user_id", "ts", "event_type",
            F.sum(F.when(F.col("rn_type") == 1, 1).otherwise(0)).over(w_run)
            .cast("bigint").alias("distinct_types_so_far"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


# ---------------------------------------------------------------------------
# join_semi_anti — explicit SEMI / ANTI join syntax parity
# ---------------------------------------------------------------------------

SEMI_ANTI_ORACLE = """
WITH o95 AS (
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
), s AS (
  SELECT c_nationkey, COUNT(*) AS n_with FROM (
    SELECT c_custkey, c_nationkey FROM customer SEMI JOIN o95 ON c_custkey = o_custkey
  ) GROUP BY 1
), a AS (
  SELECT c_nationkey, COUNT(*) AS n_without FROM (
    SELECT c_custkey, c_nationkey FROM customer ANTI JOIN o95 ON c_custkey = o_custkey
  ) GROUP BY 1
)
SELECT n.n_name,
       CAST(COALESCE(s.n_with, 0) AS BIGINT) AS n_with_orders,
       CAST(COALESCE(a.n_without, 0) AS BIGINT) AS n_without_orders
FROM nation n
LEFT JOIN s ON n.n_nationkey = s.c_nationkey
LEFT JOIN a ON n.n_nationkey = a.c_nationkey
ORDER BY n_name
"""


@register("join_semi_anti", SEMI_ANTI_ORACLE)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB's explicit SEMI JOIN / ANTI JOIN syntax ⇄ Spark's
    leftsemi / leftanti join types: per nation, customers WITH at
    least one 1995 order and customers WITHOUT. Semi/anti never
    multiply rows, so the counts are exact without dedup. Plan: the
    1995 order filter pushes to the orders scan; both joins shuffle
    on custkey (or AQE-broadcast the filtered order side when small);
    nation is broadcast onto the ≤25-row aggregates. Scale: semi/anti
    are Spark's cheapest join shapes — build side carries keys only."""
    o95 = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .select("o_custkey")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    cond = c["c_custkey"] == o95["o_custkey"]
    semi = c.join(o95, cond, "leftsemi").groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_with"))
    anti = c.join(o95, cond, "leftanti").groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_without"))
    return (
        n.join(F.broadcast(semi), n["n_nationkey"] == semi["c_nationkey"], "left")
        .drop("c_nationkey")
        .join(F.broadcast(anti), n["n_nationkey"] == anti["c_nationkey"], "left")
        .select(
            "n_name",
            F.coalesce("n_with", F.lit(0)).cast("bigint").alias("n_with_orders"),
            F.coalesce("n_without", F.lit(0)).cast("bigint").alias("n_without_orders"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# grouping_id_sets — GROUPING() markers over GROUPING SETS
# ---------------------------------------------------------------------------

GROUPING_ID_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INTEGER) AS gid,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@register("grouping_id_sets", GROUPING_ID_ORACLE)
def grouping_id_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() marker parity: the function that disambiguates a
    real NULL group key from a grouping-set subtotal NULL. The packed
    id is spelled g_flag·2+g_status on BOTH engines rather than
    trusting each engine's grouping_id bit packing to agree. One
    Expand + one shuffle (the grouping-set one-pass plan); the price
    sum is decimal-exact so the double presentation is
    order-independent (DETERMINISM.md rule 3)."""
    l = load_table(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("_gid_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
        FROM _gid_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


# ---------------------------------------------------------------------------
# ev_asof_forward — forward as-of join (next purchase after each click)
# ---------------------------------------------------------------------------

ASOF_FORWARD_ORACLE = """
SELECT c.event_id, c.user_id, c.ts,
       MIN(p.ts) AS next_purchase_ts
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
  ON p.user_id = c.user_id AND p.ts >= c.ts
GROUP BY c.event_id, c.user_id, c.ts
ORDER BY c.user_id, c.ts, c.event_id
"""


@register("ev_asof_forward", ASOF_FORWARD_ORACLE)
def ev_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — for every click, the EARLIEST purchase at
    or after it by the same user (ev_asof_join's time-reversed twin;
    DuckDB expresses it as ASOF with a <= condition, the oracle
    spells the equivalent min-over-range join). Spark plan: the
    union-marker trick run in DESCENDING time order — union clicks
    (marker 0) with purchases (marker 1), window per user ordered by
    (ts DESC, marker DESC) so an equal-timestamp purchase sorts
    before the click and is visible to it (inclusive >= semantics),
    and take MIN(purchase ts) over the frame: among purchases already
    seen in a descending scan — exactly those with ts >= current —
    the minimum IS the next one. ONE shuffle on user_id, no range
    join, no n·m pair blowup (the oracle's join is quadratic per
    user; this plan is linear after the sort). Scale: per-user state
    is one running min — the same shape ev_asof_join already proved."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(0).alias("marker")
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.lit(None).cast("long").alias("event_id"), "user_id", "ts", F.lit(1).alias("marker")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("marker"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("next_purchase_ts", F.min(F.when(F.col("marker") == 1, F.col("ts"))).over(w))
        .where(F.col("marker") == 0)
        .select("event_id", "user_id", "ts", "next_purchase_ts")
        .orderBy("user_id", "ts", "event_id")
    )


# ---------------------------------------------------------------------------
# agg_histogram — histogram() aggregate parity (serialized, ordered)
# ---------------------------------------------------------------------------

HISTOGRAM_ORACLE = """
WITH counts AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty, COUNT(*) AS cnt
  FROM lineitem GROUP BY 1, 2
)
SELECT l_returnflag,
       string_agg(CAST(qty AS VARCHAR) || ':' || CAST(cnt AS VARCHAR), ',' ORDER BY qty) AS hist,
       CAST(COUNT(*) AS BIGINT) AS n_bins
FROM counts GROUP BY l_returnflag ORDER BY l_returnflag
"""


@register("agg_histogram", HISTOGRAM_ORACLE)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram() aggregate parity: per group, the full value→count
    map. DuckDB's histogram() returns a MAP whose stringification is
    engine-specific, so BOTH sides serialize the same canonical form —
    'value:count' entries joined in ascending value order (map
    iteration order is never relied on). Plan: (flag, qty) partial-agg
    shuffle bounds the data at value-domain size, then the serialize
    step is a tiny per-flag sort of ≤50 entries — collect_list stays
    safe because the histogram domain, not the row count, bounds it."""
    l = load_table(spark, sf_dir, "lineitem")
    counts = (
        l.groupBy("l_returnflag", F.col("l_quantity").cast("bigint").alias("qty"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    entries = F.array_sort(F.collect_list(F.struct("qty", "cnt")))
    return (
        counts.groupBy("l_returnflag")
        .agg(
            F.array_join(
                F.transform(
                    entries,
                    lambda s: F.concat_ws(":", s.qty.cast("string"), s.cnt.cast("string")),
                ),
                ",",
            ).alias("hist"),
            F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# agg_quantile_multi — discrete quantile vector (p25/p50/p75)
# ---------------------------------------------------------------------------

QUANTILE_MULTI_ORACLE = """
WITH counts AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty, COUNT(*) AS cnt
  FROM lineitem GROUP BY 1, 2
), cum AS (
  SELECT l_returnflag, qty,
         SUM(cnt) OVER (PARTITION BY l_returnflag) AS n,
         SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY qty
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM counts
)
SELECT l_returnflag,
       MIN(CASE WHEN cum * 4 >= n     THEN qty END) AS p25,
       MIN(CASE WHEN cum * 2 >= n     THEN qty END) AS p50,
       MIN(CASE WHEN cum * 4 >= n * 3 THEN qty END) AS p75
FROM cum GROUP BY l_returnflag ORDER BY l_returnflag
"""


@register("agg_quantile_multi", QUANTILE_MULTI_ORACLE)
def agg_quantile_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quantile_disc([0.25, 0.5, 0.75]) parity — three discrete cut
    points from ONE cumulative-count pass (each p-quantile is the
    smallest value whose cumulative count reaches ⌈p·n⌉, spelled as
    the integer inequality cum·(1/p-denominator) ≥ n·numerator so no
    fp enters the selection at all). Same domain-bounded counts
    relation as agg_mode_quantile: the fact table pays one partial-agg
    shuffle, every window runs on ≤150 rows. Returning actual ELEMENTS
    (never interpolations) is what makes the multi-quantile
    hash-stable — quantile_cont's (1−d)·a + d·b interpolation orders
    differently across engines."""
    l = load_table(spark, sf_dir, "lineitem")
    counts = (
        l.groupBy("l_returnflag", F.col("l_quantity").cast("bigint").alias("qty"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_all = Window.partitionBy("l_returnflag")
    w_cum = w_all.orderBy("qty").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = counts.select(
        "l_returnflag", "qty",
        F.sum("cnt").over(w_all).alias("n"),
        F.sum("cnt").over(w_cum).alias("cum"),
    )
    return (
        cum.groupBy("l_returnflag")
        .agg(
            F.min(F.when(F.col("cum") * 4 >= F.col("n"), F.col("qty"))).alias("p25"),
            F.min(F.when(F.col("cum") * 2 >= F.col("n"), F.col("qty"))).alias("p50"),
            F.min(F.when(F.col("cum") * 4 >= F.col("n") * 3, F.col("qty"))).alias("p75"),
        )
        .orderBy("l_returnflag")
    )
