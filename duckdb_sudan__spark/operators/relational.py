"""Relational/OLAP queries (TPC-H-style, adapted to the test schema).

This is the DuckDB-grade SQL surface re-expressed with the DataFrame
API — scan → filter → project → join → aggregate → window → sort/limit.
Every query here has a DuckDB oracle (exact ANSI SQL) in ORACLES.

Float determinism convention (so value hashes match DuckDB exactly):
per-row arithmetic stays in DOUBLE (IEEE, engine-independent); every
SUM over a float expression is accumulated exactly — as DECIMAL(27,6)
(`dsum`), or as BIGINT micro-units (`dsum_micro`) where the value
domain provably has ≤ 4 fractional digits (bit-identical to `dsum`,
~1.3× faster: the long sum stays on whole-stage codegen) — and only
the final result is cast back to DOUBLE; averages are exact-sum /
count in double. The same structure is mirrored in the oracle SQL.

Scale notes (100 TB): dims (region 5, nation 25, supplier, part) are
broadcast — no shuffle on the build side; fact⋈fact joins
(orders⋈lineitem) hash-shuffle on the key with AQE skew handling; all
filters are declarative so they reach the parquet scan as
PushedFilters (asserted in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table


def dsum(expr: Column, alias: str) -> Column:
    """Exact SUM of a float expression: DECIMAL(27,6) accumulate → DOUBLE."""
    return F.sum(expr.cast("decimal(27,6)")).cast("double").alias(alias)


def dsum_micro(expr: Column, alias: str) -> Column:
    """Exact SUM via BIGINT micro-units — bit-identical to `dsum` and
    ~1.3× faster (the long sum stays on the codegen path; DECIMAL(37,6)
    sums go through BigDecimal) WHEN the expression's exact decimal
    value has ≤ 4 fractional digits (2-digit prices × 2-digit
    discounts: round(v·1e6) then lands exactly on the decimal cast's
    HALF_UP grid — see q9's derivation) and per-group sums stay under
    2^53 micro-units (~9e9 in value units; revisit beyond ~sf5)."""
    return (
        F.sum(F.round(expr * 1_000_000).cast("bigint")).cast("double") / F.lit(1e6)
    ).alias(alias)


def davg(expr: Column, alias: str) -> Column:
    """Exact-sum average: CAST(SUM(dec) AS DOUBLE) / COUNT(*)."""
    return (F.sum(expr.cast("decimal(27,6)")).cast("double") / F.count(F.lit(1))).alias(alias)


def _ts(s: str) -> Column:
    return F.lit(s).cast("timestamp")


# SQL fragments mirroring dsum/davg for the oracles
def _sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE) AS {alias}"


def _sql_davg(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS {alias}"


# ---------------------------------------------------------------------------
# q1 — pricing summary (scan → filter → groupBy multi-agg → sort)
# ---------------------------------------------------------------------------

Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {_sql_dsum("l_quantity", "sum_qty")},
       {_sql_dsum("l_extendedprice", "sum_base_price")},
       {_sql_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
       {_sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
       {_sql_davg("l_quantity", "avg_qty")},
       {_sql_davg("l_extendedprice", "avg_price")},
       {_sql_davg("l_discount", "avg_disc")},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.where(F.col("l_shipdate") <= _ts("2000-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg(F.col("l_quantity"), "avg_qty"),
            davg(F.col("l_extendedprice"), "avg_price"),
            davg(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q1_pricing_decimal — q1's sums with DECIMAL presentation, the sf1 gate
# ---------------------------------------------------------------------------
# SF1_FLOATCHECK.md proved the decimal-accumulate layer exact at sf1
# but found the final CAST(decimal AS DOUBLE) diverges by 1 ulp once
# sums reach ~17 significant digits (DuckDB's int128 scale-divide vs
# Spark's correctly-rounded BigDecimal.doubleValue). This entry closes
# that presentation class: the sums never touch DOUBLE — they ship as
# the exact decimal digit string (canonical scale-6 rendering, equal
# across engines AND across both fetch modes; raw DECIMAL objects
# break the pandas mode because duckdb's .df() converts wide DECIMAL
# to float64) plus exact BIGINT micro-units. Gated at sf1 row counts
# by tools/sf1_float_check.py and CORRECTNESS_LOCAL's sf1 section.

Q1_DECIMAL_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS VARCHAR) AS sum_qty_dec,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS VARCHAR) AS sum_base_price_dec,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS VARCHAR) AS sum_disc_price_dec,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(27,6))) AS VARCHAR) AS sum_charge_dec,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(27,6))) * 1000000 AS BIGINT) AS sum_charge_micro,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_decimal", Q1_DECIMAL_ORACLE)
def q1_pricing_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")

    def dec_str(expr: Column, alias: str) -> Column:
        return F.sum(expr.cast("decimal(27,6)")).cast("string").alias(alias)

    charge = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    return (
        l.where(F.col("l_shipdate") <= _ts("2000-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_str(F.col("l_quantity"), "sum_qty_dec"),
            dec_str(F.col("l_extendedprice"), "sum_base_price_dec"),
            dec_str(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price_dec"),
            dec_str(charge, "sum_charge_dec"),
            (F.sum(charge.cast("decimal(27,6)")) * F.lit(1000000))
            .cast("bigint")
            .alias("sum_charge_micro"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q3 — shipping priority (3-way join, group, top-N)
# ---------------------------------------------------------------------------

Q3_ORACLE = f"""
SELECT l.l_orderkey,
       {_sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < _ts("1998-03-15"))
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > _ts("1998-03-15"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum_micro(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q4 — order priority with EXISTS semi-join
# ---------------------------------------------------------------------------

Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("q4_order_priority", Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-07-01")) & (F.col("o_orderdate") < _ts("1997-10-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    cond = (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > F.expr("o_orderdate + INTERVAL 90 DAY"))
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q5 — local supplier volume (6-way join, broadcast dims)
# ---------------------------------------------------------------------------

Q5_ORACLE = f"""
SELECT n.n_name,
       {_sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
WHERE r.r_name = 'AFRICA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
"""


@register("q5_local_supplier", Q5_ORACLE)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AFRICA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (l.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum_micro(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# q6 — forecast revenue (tight filter + single agg; pushdown showcase)
# ---------------------------------------------------------------------------

Q6_ORACLE = f"""
SELECT {_sql_dsum("l_extendedprice * l_discount", "revenue")}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


# ---------------------------------------------------------------------------
# q7 — volume shipping between two nations
# ---------------------------------------------------------------------------

Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year, {_sql_dsum("volume", "revenue")}
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register("q7_volume_shipping", Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        l.where(F.col("l_shipdate").between(_ts("1996-01-01"), _ts("1997-12-31")))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("volume"), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# q10 — returned items (join + filter + top-N by revenue)
# ---------------------------------------------------------------------------

Q10_ORACLE = f"""
SELECT c.c_custkey, c.c_name,
       {_sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01' AND o.o_orderdate < TIMESTAMP '1997-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-01-01")) & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q12 — late lines by priority class (conditional aggregation)
# ---------------------------------------------------------------------------

Q12_ORACLE = """
SELECT l.l_linestatus,
       COUNT(*) FILTER (WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
       COUNT(*) FILTER (WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
"""


@register("q12_late_lines", Q12_ORACLE)
def q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(F.expr("l_shipdate > o_orderdate + INTERVAL 60 DAY"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# q14 — promo effect (ratio of conditional aggregates)
# ---------------------------------------------------------------------------

Q14_ORACLE = """
SELECT CAST(SUM(CAST(CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END AS DECIMAL(27,6))) AS DOUBLE)
       * 100.0
       / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS promo_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01' AND l.l_shipdate < TIMESTAMP '1997-10-01'
"""


@register("q14_promo_effect", Q14_ORACLE)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-09-01")) & (F.col("l_shipdate") < _ts("1997-10-01"))
    )
    p = load_table(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.sum(promo.cast("decimal(27,6)")).cast("double")
                * 100.0
                / F.sum(disc_price.cast("decimal(27,6)")).cast("double")
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# q16 — supplier count by part attributes (anti-join + count distinct)
# ---------------------------------------------------------------------------

Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 20
"""


@register("q16_supplier_cnt", Q16_ORACLE)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    bad_supp = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(F.broadcast(bad_supp), l.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q18 — large-volume orders (HAVING via groupBy + filter + join back)
# ---------------------------------------------------------------------------

Q18_ORACLE = f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       {_sql_dsum("l.l_quantity", "sum_qty")}
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(27,6))) > 250
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


@register("q18_large_orders", Q18_ORACLE)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass shape (r4): the oracle's outer GROUP BY is keyed on
    o_orderkey, so its SUM(l_quantity) over the joined lines IS the
    HAVING aggregate — one lineitem scan + one agg, then the (tiny,
    post-filter) big-order relation joins orders/customer. The naive
    translation scans and aggregates lineitem twice; at 100 TB that's
    the difference between one shuffle of the fact table and two.

    The POST-FILTER side is force-broadcast (r5): without the hint the
    planner sizes the agg subtree by its input and broadcasts
    orders/customer instead — at the sf1 bench that is a 1.5M-row
    build each (measured 6-8 s, dominated by the builds) versus
    broadcasting the few-hundred-row HAVING survivors and streaming
    both big tables map-side. The >250-of-~7-lines predicate keeps the
    broadcast side data-dependently tiny at any scale; if the
    threshold were loosened the right fallback is dropping the hint,
    not shuffling — AQE then picks sides from runtime stats."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        # narrow decimal accumulator (r5): quantities are ≤ 50 with ≤ 6
        # frac digits, so DECIMAL(8,6) input → DECIMAL(18,6) sum stays
        # on Spark's compact-long Decimal path — ~1.5× faster at the
        # sf1 bench than the (27,6) BigDecimal path — and is exactly
        # equal to the oracle's DECIMAL(27,6) sum (both are exact; this
        # is DuckDB's own trick of sizing decimal accumulators to the
        # value domain)
        .agg(F.sum(F.col("l_quantity").cast("decimal(8,6)")).cast("double").alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    joined = F.broadcast(big).join(o, big.l_orderkey == o.o_orderkey)
    return (
        F.broadcast(joined).join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q19 — disjunctive predicate join
# ---------------------------------------------------------------------------

Q19_ORACLE = f"""
SELECT {_sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5 AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
"""


@register("q19_disjunctive", Q19_ORACLE)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    pred = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(pred)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# ---------------------------------------------------------------------------
# q21 — suppliers who were the only late supplier on a multi-supplier order
# ---------------------------------------------------------------------------

Q21_ORACLE = """
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@register("q21_waiting_supplier", Q21_ORACLE)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass shape (r4, min/max algebra r5): both EXISTS branches
    are per-order facts — "another supplier exists" ⟺ the order's
    suppkeys aren't all equal ⟺ min(suppkey) ≠ max(suppkey); "no OTHER
    supplier was late" ⟺ the late lines all belong to one supplier ⟺
    min/max over late-line suppkeys coincide (and late lines exist).
    That turns both distinct-counts into plain min/max/count_if
    aggregates — ONE codegen HashAggregate pass — where the r4 version
    collected a per-order struct list (ObjectHashAggregate: object-
    backed, no whole-stage codegen, ~40% slower at the 6M-row sf1
    bench) and the naive translation runs semi + anti self-joins
    (three fact shuffles). numwait counts late LINES of the lone late
    supplier, which count_if(is_late) preserves exactly."""
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem")

    lo = (
        l.join(o.select("o_orderkey", "o_orderdate"), l.l_orderkey == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            F.expr("l_shipdate > o_orderdate + INTERVAL 30 DAY").alias("is_late"),
        )
    )
    late_supp = F.when(F.col("is_late"), F.col("l_suppkey"))
    qualifying = (
        lo.groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("min_supp"),
            F.max("l_suppkey").alias("max_supp"),
            F.min(late_supp).alias("min_late_supp"),
            F.max(late_supp).alias("max_late_supp"),
            F.count_if(F.col("is_late")).alias("n_late_lines"),
        )
        .where(
            (F.col("min_supp") != F.col("max_supp"))
            & (F.col("n_late_lines") > 0)
            & (F.col("min_late_supp") == F.col("max_late_supp"))
        )
        .select(F.col("min_late_supp").alias("w_suppkey"), "n_late_lines")
    )
    return (
        qualifying.join(F.broadcast(s), qualifying.w_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q22 — customers with above-average balance and no orders
# ---------------------------------------------------------------------------

Q22_ORACLE = f"""
SELECT c.c_nationkey,
       COUNT(*) AS numcust,
       {_sql_dsum("c.c_acctbal", "totacctbal")}
FROM customer c
WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
  AND c.c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)
    FROM customer WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
  )
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
"""


@register("q22_global_sales", Q22_ORACLE)
def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dormant high-balance customers (TPC-H q22 shape): every customer in
    this synthetic data has *some* order, so the anti-join is scoped to
    recent orders (>= 2000-01-01) — 16 rows at sf0.01, 181 at sf0.1, all 7
    nation groups populated. The avg-acctbal scalar is a 1-row broadcast
    crossJoin (same pattern as q11/q15), never a driver collect: the whole
    query stays one lazy plan on a 1000-executor cluster."""
    nations = [1, 3, 5, 7, 9, 11, 13]
    c = load_table(spark, sf_dir, "customer").where(F.col("c_nationkey").isin(nations))
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    threshold = c.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(27,6)")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(threshold))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"), dsum(F.col("c_acctbal"), "totacctbal"))
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# q2 — min-cost supplier per part (correlated-min via window; the
# reference schema's partsupp role is played by observed lineitem unit
# prices). Dims broadcast; the one shuffle is the (part, supp) agg.
# ---------------------------------------------------------------------------

Q2_ORACLE = """
WITH cost AS (
  SELECT l.l_partkey, l.l_suppkey, n.n_name, s.s_name, s.s_acctbal,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
           / CAST(SUM(CAST(l.l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS unit_cost
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region rg ON rg.r_regionkey = n.n_regionkey
  WHERE rg.r_name = 'ASIA'
  GROUP BY l.l_partkey, l.l_suppkey, n.n_name, s.s_name, s.s_acctbal
),
ranked AS (
  SELECT *, MIN(unit_cost) OVER (PARTITION BY l_partkey) AS min_cost
  FROM cost
)
SELECT r.s_acctbal, r.s_name, r.n_name, p.p_partkey, p.p_name, r.unit_cost
FROM ranked r
JOIN part p ON p.p_partkey = r.l_partkey
WHERE r.unit_cost = r.min_cost
  AND p.p_size = 9 AND p.p_type = 'STANDARD'
ORDER BY r.s_acctbal DESC, r.n_name, r.s_name, p.p_partkey
LIMIT 20
"""


@register("q2_min_cost_supp", Q2_ORACLE)
def q2_min_cost_supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where((F.col("p_size") == 9) & (F.col("p_type") == "STANDARD"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(rg), n.n_regionkey == rg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        l.join(F.broadcast(asia_supp), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey", "n_name", "s_name", "s_acctbal")
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(27,6)")).cast("double")
                / F.sum(F.col("l_quantity").cast("decimal(27,6)")).cast("double")
            ).alias("unit_cost")
        )
    )
    w = Window.partitionBy("l_partkey")
    ranked = cost.withColumn("min_cost", F.min("unit_cost").over(w)).where(
        F.col("unit_cost") == F.col("min_cost")
    )
    return (
        ranked.join(F.broadcast(p), ranked.l_partkey == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q8 — national market share (ratio of conditional aggregates per year)
# ---------------------------------------------------------------------------

Q8_ORACLE = """
SELECT o_year,
       CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0.0 END AS DECIMAL(27,6))) AS DOUBLE)
         / CAST(SUM(CAST(volume AS DECIMAL(27,6))) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n1.n_regionkey
  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'AFRICA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@register("q8_market_share", Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AFRICA")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    nat_vol = F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(F.lit(0.0))
    return (
        joined.groupBy("o_year")
        .agg(
            (
                F.sum(nat_vol.cast("decimal(27,6)")).cast("double")
                / F.sum(F.col("volume").cast("decimal(27,6)")).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# q9 — product-type profit by supplier nation and year
# ---------------------------------------------------------------------------

Q9_ORACLE = f"""
SELECT nation, o_year, {_sql_dsum("amount", "sum_profit")}
FROM (
  SELECT n.n_name AS nation,
         CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%bolt%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@register("q9_product_profit", Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with every dim broadcast; the profit sum accumulates
    as BIGINT micro-units instead of DECIMAL(27,6) (r5c): amount =
    price·(1−discount) has ≤ 4 true decimal digits (2-digit prices ×
    2-digit discounts), so round(amount·1e6) reproduces the decimal
    cast's HALF_UP rounding EXACTLY (the value sits ≥ 10² micro-steps
    from any .5 boundary — fp multiply error ~1e-5 can't flip it), the
    long sum stays on the codegen path (the decimal sum's precision 37
    forces BigDecimal — measured 1.16-1.55 → 1.10-1.20 s at the sf1
    bench, values bit-identical across all 175 groups), and the
    sum/1e6 presentation matches DuckDB's int128→double→÷10^6 decimal
    cast while group sums stay under 2^53 micro-units (safe through
    ~sf5 per group; beyond that, return to the decimal accumulator)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(
            (F.sum(F.round(F.col("amount") * 1_000_000).cast("bigint")).cast("double") / F.lit(1e6))
            .alias("sum_profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# q11 — important parts by revenue share (scalar-subquery threshold; the
# scalar lives in a 1-row broadcast crossJoin, no driver collect).
# Threshold is 2× the MEAN per-part value — scale-free, unlike TPC-H's
# 0.0001/SF fraction-of-total: a fixed fraction returns 0 rows once the
# part count outgrows it (the r4 verdict caught exactly that at sf0.1,
# where max share is 0.00037 < 0.001), and a 0-row contract can't catch
# value regressions. 2×mean selects ~10% of parts at every SF.
# ---------------------------------------------------------------------------

Q11_ORACLE = """
WITH val AS (
  SELECT l.l_partkey,
         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_3'
  GROUP BY l.l_partkey
)
SELECT l_partkey, value
FROM val
WHERE value > (SELECT CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) * 2.0 FROM val)
ORDER BY value DESC, l_partkey
"""


@register("q11_important_parts", Q11_ORACLE)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    val = (
        l.join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)), l.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "value"))
    )
    # same fp-op order as the oracle: decimal sum → double, ÷ count, ×2
    threshold = val.agg(
        (F.sum(F.col("value").cast("decimal(27,6)")).cast("double") / F.count(F.lit(1)) * F.lit(2.0)).alias("thresh")
    )
    return (
        val.crossJoin(F.broadcast(threshold))
        .where(F.col("value") > F.col("thresh"))
        .select("l_partkey", "value")
        .orderBy(F.desc("value"), "l_partkey")
    )


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution (outer join + double agg)
# ---------------------------------------------------------------------------

Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q13_cust_distribution", Q13_ORACLE)
def q13_cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# q15 — top supplier(s) by quarterly revenue (window max, float-exact)
# ---------------------------------------------------------------------------

Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


@register("q15_top_supplier", Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q17 — small-quantity-order revenue (per-part avg via broadcast join)
# ---------------------------------------------------------------------------

Q17_ORACLE = """
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (
  SELECT l_partkey,
         0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)) AS qty_thresh
  FROM lineitem GROUP BY l_partkey
) a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3' AND p.p_size = 5 AND l.l_quantity < a.qty_thresh
"""


@register("q17_small_qty", Q17_ORACLE)
def q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where((F.col("p_brand") == "Brand#3") & (F.col("p_size") == 5))
    avg_qty = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.2) * (F.sum(F.col("l_quantity").cast("decimal(27,6)")).cast("double") / F.count(F.lit(1)))).alias(
            "qty_thresh"
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(avg_qty, l.l_partkey == F.col("a_partkey"))
        .where(F.col("l_quantity") < F.col("qty_thresh"))
        .agg((F.sum(F.col("l_extendedprice").cast("decimal(27,6)")).cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# q20 — suppliers with heavy shipments of a part class (semi-join chain)
# ---------------------------------------------------------------------------

Q20_ORACLE = """
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_7'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE 'red%'
      AND l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(27,6))) > 45
  )
ORDER BY s.s_name
"""


@register("q20_heavy_shippers", Q20_ORACLE)
def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    heavy = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(27,6)")).alias("qty"))
        .where(F.col("qty") > 45)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(heavy), s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
