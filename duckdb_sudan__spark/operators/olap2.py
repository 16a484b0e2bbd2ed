"""Second wave of relational/OLAP surface (r3): list aggregation,
unpivot, unnest-with-ordinality, arg-max/min, bitwise aggregates,
exact quantiles, calendar gap-fill, and LOCF forward-fill.

These close out DuckDB scalar/aggregate/table-function surface the
reference engine exposes "for free" (string_agg, arg_max, bit_and,
median/quantile_cont, generate_series, UNPIVOT, UNNEST WITH
ORDINALITY, IGNORE NULLS window frames) re-expressed as Catalyst
plans. Every entry is a JVM-side expression pipeline — no Python in
any hot path — with the scale shape noted per operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# listagg_nations — ordered string aggregation (DuckDB string_agg /
# Spark 4 listagg semantics via array_sort+array_join: deterministic
# order is part of the contract, which listagg alone does not give)
# ---------------------------------------------------------------------------

LISTAGG_ORACLE = """
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


@register("listagg_nations", LISTAGG_ORACLE)
def listagg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: groupBy on the (tiny) region key after a broadcast
    dim join — one shuffle, map-side partial collect_list."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .orderBy("r_name")
    )


# ---------------------------------------------------------------------------
# unpivot_nation_counts — wide→long (DuckDB UNPIVOT / Spark unpivot)
# ---------------------------------------------------------------------------

UNPIVOT_ORACLE = """
WITH c AS (SELECT c_nationkey AS k, COUNT(*) AS customers FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS k, COUNT(*) AS suppliers FROM supplier GROUP BY 1),
     w AS (
       SELECT n_name,
              COALESCE(c.customers, 0) AS customers,
              COALESCE(s.suppliers, 0) AS suppliers
       FROM nation
       LEFT JOIN c ON c.k = n_nationkey
       LEFT JOIN s ON s.k = n_nationkey
     )
SELECT n_name, 'customers' AS metric, customers AS cnt FROM w
UNION ALL
SELECT n_name, 'suppliers' AS metric, suppliers AS cnt FROM w
ORDER BY n_name, metric
"""


@register("unpivot_nation_counts", UNPIVOT_ORACLE)
def unpivot_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Dataset.unpivot (the melt DuckDB spells UNPIVOT). Two
    partial-agg shuffles on nationkey; nation stays broadcast."""
    nation = load_table(spark, sf_dir, "nation")
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("customers"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("suppliers"))
    )
    wide = (
        nation.join(c, nation.n_nationkey == c.k, "left")
        .join(s, nation.n_nationkey == s.k, "left")
        .select(
            "n_name",
            F.coalesce("customers", F.lit(0)).alias("customers"),
            F.coalesce("suppliers", F.lit(0)).alias("suppliers"),
        )
    )
    return (
        wide.unpivot("n_name", ["customers", "suppliers"], "metric", "cnt")
        .orderBy("n_name", "metric")
    )


# ---------------------------------------------------------------------------
# tok_positions — UNNEST WITH ORDINALITY (posexplode)
# ---------------------------------------------------------------------------

TOK_POSITIONS_ORACLE = """
SELECT doc_id,
       CAST(generate_subscripts(string_split(text, ' '), 1) AS INTEGER) AS pos,
       unnest(string_split(text, ' ')) AS tok
FROM documents
WHERE doc_id < 20
ORDER BY doc_id, pos
"""


@register("tok_positions", TOK_POSITIONS_ORACLE)
def tok_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode == UNNEST WITH ORDINALITY (1-based to match
    generate_subscripts). Pure map stage — explode never shuffles."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok"))
        .select("doc_id", (F.col("pos0") + 1).cast("int").alias("pos"), "tok")
        .orderBy("doc_id", "pos")
    )


# ---------------------------------------------------------------------------
# agg_argmax — arg_max/arg_min (Spark max_by/min_by with struct
# tie-break, vs a window-rank oracle)
# ---------------------------------------------------------------------------

ARGMAX_ORACLE = """
WITH ranked AS (
  SELECT n_name, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey DESC) AS rmax,
         ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY c_acctbal ASC, c_custkey ASC) AS rmin
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
SELECT a.n_name,
       a.c_custkey AS top_custkey, a.c_acctbal AS top_acctbal,
       b.c_custkey AS bottom_custkey, b.c_acctbal AS bottom_acctbal
FROM (SELECT * FROM ranked WHERE rmax = 1) a
JOIN (SELECT * FROM ranked WHERE rmin = 1) b USING (n_name)
ORDER BY n_name
"""


@register("agg_argmax", ARGMAX_ORACLE)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by with a struct ordering key — one partial-agg
    shuffle (the window-free argmax, the shape that wins at 100 TB:
    the oracle's double window sort is what it replaces)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    key = F.struct(F.col("c_acctbal"), F.col("c_custkey"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.max_by(F.col("c_custkey"), key).alias("top_custkey"),
            F.max(key).getField("c_acctbal").alias("top_acctbal"),
            F.min_by(F.col("c_custkey"), key).alias("bottom_custkey"),
            F.min(key).getField("c_acctbal").alias("bottom_acctbal"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# agg_bitwise — bit_and / bit_or / bit_xor aggregates
# ---------------------------------------------------------------------------

BITWISE_ORACLE = """
SELECT event_type,
       bit_and(user_id) AS band,
       bit_or(user_id) AS bor,
       bit_xor(user_id) AS bxor,
       COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("agg_bitwise", BITWISE_ORACLE)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates are associative+commutative → full map-side
    partial aggregation, one tiny shuffle on event_type."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.bit_and("user_id").alias("band"),
            F.bit_or("user_id").alias("bor"),
            F.bit_xor("user_id").alias("bxor"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# agg_median — exact quantiles (Spark percentile == DuckDB
# quantile_cont; l_quantity is integral-valued so the 0.25-step
# interpolation is dyadic-exact in both engines)
# ---------------------------------------------------------------------------

MEDIAN_ORACLE = """
SELECT l_returnflag,
       median(l_quantity) AS median_qty,
       quantile_cont(l_quantity, 0.25) AS q1_qty,
       quantile_cont(l_quantity, 0.75) AS q3_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("agg_median", MEDIAN_ORACLE)
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile — the expensive exact form (per-group sort
    inside the agg). At 100 TB you'd reach for percentile_approx
    (sketch_quantiles is that entry); this one is the exact-tier
    parity with DuckDB quantile_cont."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.lit(0.5)).alias("median_qty"),
            F.percentile("l_quantity", F.lit(0.25)).alias("q1_qty"),
            F.percentile("l_quantity", F.lit(0.75)).alias("q3_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# ts_gapfill_days — calendar densification (generate_series ⟷
# sequence+explode), missing (day, type) cells emitted as 0
# ---------------------------------------------------------------------------

GAPFILL_ORACLE = """
WITH bounds AS (
  SELECT date_trunc('day', MIN(ts)) AS lo, date_trunc('day', MAX(ts)) AS hi FROM events
),
days AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds),
types AS (SELECT DISTINCT event_type FROM events),
agg AS (
  SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT t.event_type, d.day, COALESCE(a.n, 0) AS n_events
FROM days d
CROSS JOIN types t
LEFT JOIN agg a ON a.day = d.day AND a.event_type = t.event_type
ORDER BY t.event_type, d.day
"""


@register("ts_gapfill_days", GAPFILL_ORACLE)
def ts_gapfill_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill: the day×type grid is bounded by calendar span ×
    cardinality (tiny, broadcast both); the only data-sized stage is
    the one partial-agg shuffle on (day, type). The big fact table
    never joins the grid — the grid left-joins the aggregate, and the
    bounds + type list are derived from that SAME tiny aggregate (not
    from re-scanning events). Column pruning diverges the three agg
    subtrees so ReuseExchange alone can't dedupe them; persisting the
    bounded-size aggregate (|days|×|types| rows — calendar span ×
    type cardinality, ~365k rows even for 10 years × 100 types at
    100 TB) makes the fact scan physically happen once (asserted as
    3× InMemoryTableScan over one cached relation in
    tests/test_plans.py). The cache manager keys on the canonical
    plan, so repeated calls reuse one entry — no unbounded growth."""
    e = load_table(spark, sf_dir, "events")
    agg = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    ).persist()
    bounds = agg.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    days = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    types = agg.select("event_type").distinct()
    grid = F.broadcast(days).crossJoin(F.broadcast(types))
    return (
        grid.join(agg, ["day", "event_type"], "left")
        .select("event_type", "day", F.coalesce("n", F.lit(0)).alias("n_events"))
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# ts_locf_fill — last-observation-carried-forward (IGNORE NULLS
# running window; DuckDB last_value ... IGNORE NULLS parity)
# ---------------------------------------------------------------------------

LOCF_ORACLE = """
SELECT event_id, user_id, ts,
       last_value(CASE WHEN event_type IN ('purchase', 'click') THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
FROM events
WHERE user_id % 53 = 0
ORDER BY user_id, ts, event_id
"""


@register("ts_locf_fill", LOCF_ORACLE)
def ts_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill: ONE shuffle on user_id, running frame, no
    self-join — the linear LOCF shape (an as-of self-join would pay a
    second shuffle for nothing)."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") % 53 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    observed = F.when(F.col("event_type").isin("purchase", "click"), F.col("value"))
    return (
        e.select(
            "event_id",
            "user_id",
            "ts",
            F.last(observed, ignorenulls=True).over(w).alias("value_filled"),
        )
        .orderBy("user_id", "ts", "event_id")
    )
