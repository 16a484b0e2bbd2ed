"""Window functions, grouping sets, set operations, pivots, and
event-time analytics (batch form) — the rest of the DuckDB-grade SQL
surface on the DataFrame API.

Float determinism: same DECIMAL(27,6)-exact-sum convention as
relational.py. Window running sums accumulate in DECIMAL so frame
order cannot introduce float drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.operators.relational import _sql_dsum, dsum
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# w1 — rank within partition (top-3 parts by revenue per brand)
# ---------------------------------------------------------------------------

W1_ORACLE = f"""
SELECT p_brand, p_partkey, revenue, rnk
FROM (
  SELECT p_brand, p_partkey, revenue,
         CAST(rank() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS INTEGER) AS rnk
  FROM (
    SELECT p.p_brand, p.p_partkey,
           {_sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand, p.p_partkey
  )
)
WHERE rnk <= 3
ORDER BY p_brand, rnk, p_partkey
"""


@register("w1_window_rank", W1_ORACLE)
def w1_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), "p_partkey")
    return (
        rev.withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") <= 3)
        .orderBy("p_brand", "rnk", "p_partkey")
    )


# ---------------------------------------------------------------------------
# w2 — running total + lag over an ordered per-customer window
# ---------------------------------------------------------------------------

W2_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
       lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
FROM orders
WHERE o_custkey < 100
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


@register("w2_window_running", W2_ORACLE)
def w2_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.sum(F.col("o_totalprice").cast("decimal(27,6)")).over(wsum).cast("double").alias("running_total"),
            F.lag("o_totalprice").over(w).alias("prev_price"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# rollup / cube
# ---------------------------------------------------------------------------

ROLLUP_ORACLE = f"""
SELECT r.r_name, n.n_name,
       COUNT(*) AS n_orders,
       {_sql_dsum("o.o_totalprice", "total_sales")}
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
"""


@register("rollup_sales", ROLLUP_ORACLE)
def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum(F.col("o_totalprice"), "total_sales"))
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


CUBE_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       {_sql_dsum("o_totalprice", "total_sales")}
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


@register("cube_sales", CUBE_ORACLE)
def cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum(F.col("o_totalprice"), "total_sales"))
        .orderBy(F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# set operations: (BUILDING ∩ positive-balance) ∪ nation-0 ∖ deep-negative
# ---------------------------------------------------------------------------

SETOPS_ORACLE = """
SELECT c_custkey FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT c_custkey FROM customer WHERE c_acctbal > 0.0
  UNION
  SELECT c_custkey FROM customer WHERE c_nationkey = 0
  EXCEPT
  SELECT c_custkey FROM customer WHERE c_acctbal < -500.0
)
ORDER BY c_custkey
"""


@register("setops_customers", SETOPS_ORACLE)
def setops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    building = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    positive = c.where(F.col("c_acctbal") > 0.0).select("c_custkey")
    nation0 = c.where(F.col("c_nationkey") == 0).select("c_custkey")
    deep_neg = c.where(F.col("c_acctbal") < -500.0).select("c_custkey")
    # SQL set-op chain is left-associative: ((A ∩ B) ∪ C) ∖ D, distinct semantics
    return (
        building.intersect(positive)
        .union(nation0)
        .distinct()
        .exceptAll(deep_neg)
        .distinct()
        .orderBy("c_custkey")
    )


DISTINCT_ORACLE = """
SELECT DISTINCT p_brand, p_type FROM part ORDER BY p_brand, p_type
"""


@register("distinct_types", DISTINCT_ORACLE)
def distinct_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "part").select("p_brand", "p_type").distinct().orderBy("p_brand", "p_type")


# ---------------------------------------------------------------------------
# CTE: top-50 customers by lifetime value, summarized per nation
# ---------------------------------------------------------------------------

CTE_ORACLE = f"""
WITH top_cust AS (
  SELECT o_custkey, {_sql_dsum("o_totalprice", "lifetime_value")}
  FROM orders
  GROUP BY o_custkey
  ORDER BY lifetime_value DESC, o_custkey
  LIMIT 50
)
SELECT n.n_name, COUNT(*) AS n_top_customers, {_sql_dsum("t.lifetime_value", "nation_value")}
FROM top_cust t
JOIN customer c ON t.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY nation_value DESC, n_name
"""


@register("cte_topn", CTE_ORACLE)
def cte_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    top_cust = (
        o.groupBy("o_custkey")
        .agg(dsum(F.col("o_totalprice"), "lifetime_value"))
        .orderBy(F.desc("lifetime_value"), "o_custkey")
        .limit(50)
    )
    return (
        top_cust.join(c, top_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_top_customers"), dsum(F.col("lifetime_value"), "nation_value"))
        .orderBy(F.desc("nation_value"), "n_name")
    )


# ---------------------------------------------------------------------------
# pivot: order counts by priority × status
# ---------------------------------------------------------------------------

PIVOT_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS cnt_open,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS cnt_filled,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS cnt_pending
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("pivot_status", PIVOT_ORACLE)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("cnt_open"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("cnt_filled"),
            F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("cnt_pending"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# events: batch tumbling window (the streaming twin lives in streaming/)
# ---------------------------------------------------------------------------

TUMBLING_ORACLE = f"""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       {_sql_dsum("value", "total_value")}
FROM events
GROUP BY date_trunc('hour', ts), event_type
ORDER BY window_start, event_type
"""


@register("ev_tumbling", TUMBLING_ORACLE)
def ev_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("window_start"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value"), "total_value"))
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# events: sessionization (30-min inactivity gap) via window functions
# ---------------------------------------------------------------------------

SESSIONIZE_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WHERE user_id < 200
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts, event_id, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS INTEGER) AS session_id,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       {_sql_dsum("value", "session_value")}
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


@register("ev_sessionize", SESSIONIZE_ORACLE)
def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") < 200)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_prev = e.select("user_id", "ts", "event_id", "value", F.lag("ts").over(w).alias("prev_ts"))
    new_session = F.when(
        F.col("prev_ts").isNull() | (F.col("ts") > F.col("prev_ts") + F.expr("INTERVAL 30 MINUTE")), 1
    ).otherwise(0)
    flagged = with_prev.select("user_id", "ts", "event_id", "value", new_session.alias("new_session"))
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(wrun).cast("int"))
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            dsum(F.col("value"), "session_value"),
        )
        .orderBy("user_id", "session_id")
    )


# ---------------------------------------------------------------------------
# events: funnel detection (view → click → purchase, first completion
# per user). The iterated-min structure (first click AFTER the first
# view, first purchase AFTER that click) is a sequential pattern that
# plain windowed aggs can't express; here it's three agg+join passes —
# each one a hash-shuffle on user_id, dims-free, linear at 100 TB. The
# streaming twin (streaming/events.py funnel_stream) is the
# applyInPandasWithState form of the same state machine.
# ---------------------------------------------------------------------------

FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS view_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, v.view_ts, MIN(e.ts) AS click_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.view_ts
  GROUP BY e.user_id, v.view_ts
), p AS (
  SELECT e.user_id, c.view_ts, c.click_ts, MIN(e.ts) AS purchase_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
  GROUP BY e.user_id, c.view_ts, c.click_ts
)
SELECT user_id, view_ts, click_ts, purchase_ts,
       CAST(epoch_us(purchase_ts) - epoch_us(view_ts) AS BIGINT) AS funnel_micros
FROM p
ORDER BY user_id
"""


@register("ev_funnel", FUNNEL_ORACLE)
def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = e.where(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("view_ts"))
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id", "view_ts")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id", "view_ts", "click_ts")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return p.select(
        "user_id",
        "view_ts",
        "click_ts",
        "purchase_ts",
        (F.unix_micros("purchase_ts") - F.unix_micros("view_ts")).alias("funnel_micros"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# events: JSON column processing (props is a JSON string)
# ---------------------------------------------------------------------------

JSON_ORACLE = f"""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST((SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) * 1000000)
         // COUNT(*) AS BIGINT) AS avg_k_micros
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 10
GROUP BY event_type
ORDER BY event_type
"""


@register("ev_json_props", JSON_ORACLE)
def ev_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction stays JVM-side (get_json_object), so the
    scan→parse→filter→agg pipeline is one codegen stage at scale.

    avg is reported as exact micro-units (truncating integer division —
    Spark ``div`` ≡ DuckDB ``//`` for the non-negative sums here) so the
    row holds only integers: nothing float-canonicalization-sensitive
    survives into the driver's value hash (r1 red row)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .where(F.col("k") >= 10)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.expr("sum(k) * 1000000 div count(1)").alias("avg_k_micros"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# grouping sets — arbitrary multi-level aggregation in one pass
# ---------------------------------------------------------------------------

GROUPING_SETS_ORACLE = f"""
SELECT l_returnflag, l_linestatus, {_sql_dsum("l_quantity", "sum_qty")}, COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@register("grouping_sets_sales", GROUPING_SETS_ORACLE)
def grouping_sets_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


# ---------------------------------------------------------------------------
# w3 — window-frame coverage: ntile / percent_rank / cume_dist and a
# RANGE frame running aggregate (DuckDB-grade window surface)
# ---------------------------------------------------------------------------

W3_ORACLE = """
SELECT s_suppkey, s_nationkey,
       ntile(4)       OVER (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey) AS quartile,
       percent_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey) AS pr,
       cume_dist()    OVER (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey) AS cd,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(27,6))) OVER (
         PARTITION BY s_nationkey ORDER BY s_acctbal
         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_bal
FROM supplier
ORDER BY s_suppkey
"""


@register("w3_window_frames", W3_ORACLE)
def w3_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    wrow = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    # RANGE frame: peers (equal s_acctbal) are included together
    wrange = Window.partitionBy("s_nationkey").orderBy("s_acctbal").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        s.select(
            "s_suppkey",
            "s_nationkey",
            F.ntile(4).over(wrow).alias("quartile"),
            F.percent_rank().over(wrow).alias("pr"),
            F.cume_dist().over(wrow).alias("cd"),
            F.sum(F.col("s_acctbal").cast("decimal(27,6)")).over(wrange).cast("double").alias("running_bal"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# scalar string-function surface (identical semantics both engines)
# ---------------------------------------------------------------------------

STRFUNC_ORACLE = """
SELECT p_partkey,
       upper(p_name) AS up,
       length(p_name) AS len,
       substr(p_name, 1, 3) AS pre,
       replace(p_name, ' ', '_') AS snake,
       split_part(p_name, ' ', 1) AS first_word,
       levenshtein(p_name, p_type) AS lev,
       concat(p_brand, ':', p_type) AS tag,
       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word
FROM part
WHERE p_partkey < 100
ORDER BY p_partkey
"""


@register("str_funcs", STRFUNC_ORACLE)
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < 100)
    return (
        p.select(
            "p_partkey",
            F.upper("p_name").alias("up"),
            F.length("p_name").alias("len"),
            F.substring("p_name", 1, 3).alias("pre"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
            F.levenshtein("p_name", "p_type").alias("lev"),
            # concat (not concat_ws): NULL-in → NULL-out, matching the oracle
            F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("tag"),
            F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# scalar date/time-function surface
# ---------------------------------------------------------------------------

DTFUNC_ORACLE = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS y,
       CAST(quarter(o_orderdate) AS INTEGER) AS q,
       CAST(month(o_orderdate) AS INTEGER) AS m,
       CAST(day(o_orderdate) AS INTEGER) AS d,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       o_orderdate + INTERVAL 30 DAY AS due,
       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch_start
FROM orders
WHERE o_orderkey < 200
ORDER BY o_orderkey
"""


@register("dt_funcs", DTFUNC_ORACLE)
def dt_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 200)
    return (
        o.select(
            "o_orderkey",
            F.year("o_orderdate").cast("int").alias("y"),
            F.quarter("o_orderdate").cast("int").alias("q"),
            F.month("o_orderdate").cast("int").alias("m"),
            F.dayofmonth("o_orderdate").cast("int").alias("d"),
            F.date_trunc("month", "o_orderdate").alias("month_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due"),
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
            .cast("bigint")
            .alias("days_since_epoch_start"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# merge/upsert (DML-equivalent): latest-wins merge of an updates set
# into customer, plus inserts — the Spark-first recompute form of
# DuckDB's INSERT ... ON CONFLICT DO UPDATE
# ---------------------------------------------------------------------------

MERGE_ORACLE = """
WITH updates AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100.0 AS c_acctbal,
         'UPDATED' AS c_mktsegment, 1 AS prio
  FROM customer WHERE c_custkey % 7 = 0
), inserts AS (
  SELECT c_custkey + 1000000 AS c_custkey, c_name, c_nationkey, 0.0 AS c_acctbal,
         'NEW' AS c_mktsegment, 1 AS prio
  FROM customer WHERE c_custkey % 97 = 0
), unioned AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, 0 AS prio FROM customer
  UNION ALL SELECT * FROM updates
  UNION ALL SELECT * FROM inserts
)
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
FROM (
  SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY prio DESC) AS rn
  FROM unioned
)
WHERE rn = 1
ORDER BY c_custkey
"""


@register("merge_upsert", MERGE_ORACLE)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    base = c.select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment").withColumn(
        "prio", F.lit(0)
    )
    updates = (
        c.where(F.col("c_custkey") % 7 == 0)
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
            F.lit("UPDATED").alias("c_mktsegment"),
        )
        .withColumn("prio", F.lit(1))
    )
    inserts = (
        c.where(F.col("c_custkey") % 97 == 0)
        .select(
            (F.col("c_custkey") + 1000000).alias("c_custkey"),
            "c_name",
            "c_nationkey",
            F.lit(0.0).alias("c_acctbal"),
            F.lit("NEW").alias("c_mktsegment"),
        )
        .withColumn("prio", F.lit(1))
    )
    unioned = base.unionByName(updates).unionByName(inserts)
    w = Window.partitionBy("c_custkey").orderBy(F.desc("prio"))
    return (
        unioned.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# stats_moments — single-pass moment sums → stddev / covariance / corr.
# The scalable form of statistical aggregation: five DECIMAL-exact
# partial sums per group (map-side combined), moments derived in DOUBLE
# from identical inputs on both engines — engine-native corr()/stddev()
# implementations differ numerically (Welford vs naive) and would not
# hash-match.
# ---------------------------------------------------------------------------

MOMENTS_ORACLE = """
SELECT l_returnflag, n,
       sx / n AS mean_qty,
       sy / n AS mean_price,
       sxx, syy_k,
       sxy / n - (sx / n) * (sy / n) AS covar_qty_price
FROM (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST((l_extendedprice / 1000.0) * (l_extendedprice / 1000.0) AS DECIMAL(27,6))) AS DOUBLE) AS syy_k,
         CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(27,4))) AS DOUBLE) AS sxy
  FROM lineitem
  GROUP BY l_returnflag
)
ORDER BY l_returnflag
"""


@register("stats_moments", MOMENTS_ORACLE)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    g = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q.cast("decimal(27,6)")).cast("double").alias("sx"),
        F.sum(p.cast("decimal(27,6)")).cast("double").alias("sy"),
        F.sum((q * q).cast("decimal(27,4)")).cast("double").alias("sxx"),
        F.sum(((p / 1000.0) * (p / 1000.0)).cast("decimal(27,6)")).cast("double").alias("syy_k"),
        F.sum((q * p).cast("decimal(27,4)")).cast("double").alias("sxy"),
    )
    n, sx, sy, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxy"))
    covar = sxy / n - (sx / n) * (sy / n)
    return (
        g.select(
            "l_returnflag",
            "n",
            (sx / n).alias("mean_qty"),
            (sy / n).alias("mean_price"),
            "sxx",
            "syy_k",
            covar.alias("covar_qty_price"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# setops_multiset — INTERSECT ALL / EXCEPT ALL bag semantics
# (setops_customers above covers the DISTINCT forms). Multiplicities
# matter: a customer with 3 urgent orders and 1 finished order keeps
# 2 copies under EXCEPT ALL. Spark's intersectAll/exceptAll implement
# the same min/difference-of-multiplicities semantics as SQL ALL ops
# via a counted hash aggregation — one shuffle each, no join.
# ---------------------------------------------------------------------------

SETOPS_ALL_ORACLE = """
SELECT op, custkey FROM (
  SELECT 'except_all' AS op, custkey FROM (
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
  )
  UNION ALL
  SELECT 'intersect_all' AS op, custkey FROM (
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
  )
)
ORDER BY op, custkey
"""


@register("setops_multiset", SETOPS_ALL_ORACLE)
def setops_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("custkey"))
    finished = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    ex = urgent.exceptAll(finished).select(F.lit("except_all").alias("op"), "custkey")
    inter = urgent.intersectAll(finished).select(F.lit("intersect_all").alias("op"), "custkey")
    return ex.unionByName(inter).orderBy("op", "custkey")


# ---------------------------------------------------------------------------
# array_funcs — the list/array scalar surface (DuckDB list_* ≙ Spark
# array functions): split, length, element access, sort, join,
# membership. All map-only JVM expressions over one pruned column.
# ---------------------------------------------------------------------------

ARRAY_ORACLE = """
SELECT p_partkey,
       CAST(len(w) AS INTEGER) AS n_words,
       w[1] AS first_word,
       w[-1] AS last_word,
       array_to_string(list_sort(w), '|') AS sorted_joined,
       list_contains(w, 'green') AS has_green,
       CAST(list_position(w, 'green') AS INTEGER) AS green_pos
FROM (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part)
WHERE p_partkey <= 100
ORDER BY p_partkey
"""


@register("array_funcs", ARRAY_ORACLE)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") <= 100)
    w = F.split(F.col("p_name"), " ")
    return (
        p.select(
            "p_partkey",
            F.size(w).alias("n_words"),
            F.element_at(w, 1).alias("first_word"),
            F.element_at(w, -1).alias("last_word"),
            F.array_join(F.sort_array(w), "|").alias("sorted_joined"),
            F.array_contains(w, "green").alias("has_green"),
            # both engines return 0 when the element is absent
            F.array_position(w, "green").cast("int").alias("green_pos"),
        )
        .orderBy("p_partkey")
    )
