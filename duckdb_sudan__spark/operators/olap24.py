"""r11 wave 16: price indices, weekly growth accounting, and
duplicate-order audit pairs.

- q_price_index_laspeyres is the economics workhorse the TPC-H family
  lacks: Laspeyres (base-year basket), Paasche (current basket) and
  Fisher price indices per ship year vs the base (first) year, on
  per-(part, year) unit prices. Unit prices are floor-quantized ONCE
  to 1e-4-cent units (1e4·cents // qty — BIGINT // BIGINT, the exact
  floor both engines share; 1e4 not 1e8 so the Σ price·weight
  accumulators stay under 2^63 through sf1 and under 2^53 through
  sf0.1 — rule 30's hugeint→double misround made the finer grid a
  1-ulp hazard), so the sums are exact DECIMAL(38,0) routed to DOUBLE
  THROUGH BIGINT (the correctly-rounded conversion on both engines);
  the ppm indices come out of the DOUBLE floor idiom because
  DECIMAL // BIGINT is the round-then-floor hazard (rule 29).
- ev_growth_accounting is the standard startup-metrics decomposition:
  each ISO week's actives split into new / retained / resurrected, and
  churned = last week's actives − this week's retained, with the quick
  ratio (new+resurrected)/churned in floor ppm (BIGINT div — exact).
- q_duplicate_order_suspects is the billing-audit classic: pairs of
  orders by the SAME customer with near-identical totals (same $10k
  quantization — the blocking key; exact cents never collide in this
  continuous-double corpus) within 7 days — an equi-join on
  (custkey, bucket) so the pair stage only ever compares within tiny
  hash groups, never a date-range blowup.

Determinism: cents via round(x·100); 1e-4-cent unit prices and all
shares as floor divisions of non-negative BIGINTs (// ≡ div); index
ppm via the double floor idiom; weeks emitted as TIMESTAMP (rule 4).

Scale notes (100 TB): the index reduces lineitem at (part, year) grain
in one partial-agg pass, then joins year-slices against the base-year
basket part-to-part (shuffle on partkey, AQE-coalesced; no pairwise
year×year blowup — base is fixed); growth accounting reduces events to
the distinct (user, week) relation map-side, runs ONE user-grain lag
window, and every later window rides the bounded calendar-week grid;
duplicate suspects self-join on (custkey, bucket) — the key carries the
selectivity, so skew is bounded by a customer's same-bucket order count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# q_price_index_laspeyres — Laspeyres / Paasche / Fisher per ship year
# ---------------------------------------------------------------------------
# Basket weights are base-year part quantities (exact BIGINTs — the
# corpus quantities are integral, pinned by round()); matched parts
# only (inner join base ⋈ year). Fisher = sqrt(L·P) on the ppm pair.

PRICE_INDEX_ORACLE = """
WITH py AS (
  SELECT l_partkey AS pk,
         CAST(year(l_shipdate) AS BIGINT) AS y,
         CAST(10000 * SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
              // SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS up_micro,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1, 2
), base AS (
  SELECT pk, up_micro AS up0, qty AS q0
  FROM py WHERE y = (SELECT MIN(y) FROM py)
), joined AS (
  SELECT py.y, py.up_micro AS upy, py.qty AS qy, base.up0, base.q0
  FROM py JOIN base USING (pk)
), sums AS (
  SELECT y,
         CAST(COUNT(*) AS BIGINT) AS n_parts,
         SUM(CAST(upy AS DECIMAL(38,0)) * q0) AS l_num,
         SUM(CAST(up0 AS DECIMAL(38,0)) * q0) AS l_den,
         SUM(CAST(upy AS DECIMAL(38,0)) * qy) AS p_num,
         SUM(CAST(up0 AS DECIMAL(38,0)) * qy) AS p_den
  FROM joined GROUP BY y
)
SELECT y, n_parts,
       CAST(FLOOR(1000000 * CAST(CAST(l_num AS BIGINT) AS DOUBLE) / CAST(CAST(l_den AS BIGINT) AS DOUBLE)) AS BIGINT) AS laspeyres_ppm,
       CAST(FLOOR(1000000 * CAST(CAST(p_num AS BIGINT) AS DOUBLE) / CAST(CAST(p_den AS BIGINT) AS DOUBLE)) AS BIGINT) AS paasche_ppm,
       CAST(FLOOR(SQRT((1000000 * CAST(CAST(l_num AS BIGINT) AS DOUBLE) / CAST(CAST(l_den AS BIGINT) AS DOUBLE))
                       * (1000000 * CAST(CAST(p_num AS BIGINT) AS DOUBLE) / CAST(CAST(p_den AS BIGINT) AS DOUBLE)))) AS BIGINT) AS fisher_ppm
FROM sums
ORDER BY y
"""


@register("q_price_index_laspeyres", PRICE_INDEX_ORACLE)
def q_price_index_laspeyres(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    py = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.year("l_shipdate").cast("bigint").alias("y"),
    ).agg(
        F.expr(
            "CAST(10000 * SUM(CAST(round(l_extendedprice * 100) AS BIGINT))"
            " div SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)"
        ).alias("up_micro"),
        F.expr("CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)").alias("qty"),
    )
    py = py.cache()  # 3 consumers: base-year slice, year slices, MIN(y) scalar
    y0 = py.agg(F.min("y").alias("y0"))
    base = (
        py.crossJoin(F.broadcast(y0))
        .where(F.col("y") == F.col("y0"))
        .select("pk", F.col("up_micro").alias("up0"), F.col("qty").alias("q0"))
    )
    joined = py.join(base, "pk").select(
        "y", F.col("up_micro").alias("upy"), F.col("qty").alias("qy"), "up0", "q0"
    )
    sums = joined.groupBy("y").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.expr("SUM(CAST(upy AS DECIMAL(38,0)) * q0)").alias("l_num"),
        F.expr("SUM(CAST(up0 AS DECIMAL(38,0)) * q0)").alias("l_den"),
        F.expr("SUM(CAST(upy AS DECIMAL(38,0)) * qy)").alias("p_num"),
        F.expr("SUM(CAST(up0 AS DECIMAL(38,0)) * qy)").alias("p_den"),
    )
    return sums.selectExpr(
        "y",
        "n_parts",
        "CAST(FLOOR(1000000 * CAST(CAST(l_num AS BIGINT) AS DOUBLE) / CAST(CAST(l_den AS BIGINT) AS DOUBLE)) AS BIGINT) AS laspeyres_ppm",
        "CAST(FLOOR(1000000 * CAST(CAST(p_num AS BIGINT) AS DOUBLE) / CAST(CAST(p_den AS BIGINT) AS DOUBLE)) AS BIGINT) AS paasche_ppm",
        "CAST(FLOOR(SQRT((1000000 * CAST(CAST(l_num AS BIGINT) AS DOUBLE) / CAST(CAST(l_den AS BIGINT) AS DOUBLE))"
        " * (1000000 * CAST(CAST(p_num AS BIGINT) AS DOUBLE) / CAST(CAST(p_den AS BIGINT) AS DOUBLE)))) AS BIGINT) AS fisher_ppm",
    ).orderBy("y")


# ---------------------------------------------------------------------------
# ev_growth_accounting — new / retained / resurrected / churned per week
# ---------------------------------------------------------------------------
# distinct (user, week) → per-user lag window → per-week state counts →
# churned via a lag over the bounded calendar-week grid. A user is
# retained iff active exactly 7 days prior (date_trunc weeks are
# Monday-aligned on both engines), resurrected iff active before but
# with a gap, new iff this is the first week ever.

GROWTH_ORACLE = """
WITH uw AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
  FROM events
), lagged AS (
  SELECT user_id, week,
         lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_week
  FROM uw
), states AS (
  SELECT week,
         CAST(COUNT(*) AS BIGINT) AS active,
         CAST(COUNT(*) FILTER (prev_week IS NULL) AS BIGINT) AS new_users,
         CAST(COUNT(*) FILTER (date_diff('day', CAST(prev_week AS DATE), CAST(week AS DATE)) = 7) AS BIGINT) AS retained,
         CAST(COUNT(*) FILTER (date_diff('day', CAST(prev_week AS DATE), CAST(week AS DATE)) > 7) AS BIGINT) AS resurrected
  FROM lagged GROUP BY week
), grid AS (
  SELECT week, active, new_users, retained, resurrected,
         CAST(COALESCE(lag(active) OVER (ORDER BY week), 0) - retained AS BIGINT) AS churned
  FROM states
)
SELECT week, active, new_users, retained, resurrected, churned,
       CASE WHEN churned > 0
            THEN CAST(1000000 * (new_users + resurrected) // churned AS BIGINT)
       END AS quick_ratio_ppm
FROM grid
ORDER BY week
"""


@register("ev_growth_accounting", GROWTH_ORACLE)
def ev_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    uw = e.select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).distinct()
    wlag = Window.partitionBy("user_id").orderBy("week")
    lagged = uw.select(
        "user_id", "week", F.lag("week").over(wlag).alias("prev_week")
    )
    gap = F.datediff(F.col("week").cast("date"), F.col("prev_week").cast("date"))
    states = lagged.groupBy("week").agg(
        F.count(F.lit(1)).cast("bigint").alias("active"),
        F.count_if(F.col("prev_week").isNull()).cast("bigint").alias("new_users"),
        F.count_if(gap == 7).cast("bigint").alias("retained"),
        F.count_if(gap > 7).cast("bigint").alias("resurrected"),
    )
    wgrid = Window.orderBy("week")
    grid = states.select(
        "week", "active", "new_users", "retained", "resurrected",
        (F.coalesce(F.lag("active").over(wgrid), F.lit(0)) - F.col("retained"))
        .cast("bigint")
        .alias("churned"),
    )
    return grid.selectExpr(
        "week", "active", "new_users", "retained", "resurrected", "churned",
        "CASE WHEN churned > 0"
        " THEN CAST(1000000 * (new_users + resurrected) div churned AS BIGINT)"
        " END AS quick_ratio_ppm",
    ).orderBy("week")


# ---------------------------------------------------------------------------
# q_duplicate_order_suspects — same customer, near-same total, ≤7 days
# ---------------------------------------------------------------------------
# The pair relation is an equi-join on (custkey, total_bucket) — date
# windows only filter WITHIN those tiny groups. The blocking key is the
# $10k quantization of the total (this corpus's totals are continuous
# doubles, so exact-cents collisions are empty at every SF; production
# invoices would block on exact cents with the same plan). Pairs are
# canonically ordered by (orderdate, orderkey) so each suspect pair
# appears once; the bounded emission is the day-gap histogram with
# affected-customer counts.

DUP_ORDERS_ORACLE = """
WITH o AS (
  SELECT o_orderkey AS okey, o_custkey AS cust,
         CAST(round(o_totalprice * 100) AS BIGINT) // 1000000 AS bucket,
         CAST(o_orderdate AS DATE) AS od
  FROM orders
), pairs AS (
  SELECT a.cust,
         CAST(date_diff('day', a.od, b.od) AS BIGINT) AS gap_days
  FROM o a JOIN o b
    ON a.cust = b.cust AND a.bucket = b.bucket
   AND (a.od < b.od OR (a.od = b.od AND a.okey < b.okey))
  WHERE date_diff('day', a.od, b.od) <= 7
)
SELECT gap_days,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT cust) AS BIGINT) AS n_customers
FROM pairs
GROUP BY gap_days
ORDER BY gap_days
"""


@register("q_duplicate_order_suspects", DUP_ORDERS_ORACLE)
def q_duplicate_order_suspects(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_custkey").alias("cust"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT) div 1000000").alias("bucket"),
        F.col("o_orderdate").cast("date").alias("od"),
    )
    a = o.select(
        F.col("okey").alias("okey_a"), "cust", "bucket", F.col("od").alias("od_a")
    )
    b = o.select(
        F.col("okey").alias("okey_b"),
        F.col("cust").alias("cust_b"),
        F.col("bucket").alias("bucket_b"),
        F.col("od").alias("od_b"),
    )
    pairs = a.join(
        b,
        (F.col("cust") == F.col("cust_b"))
        & (F.col("bucket") == F.col("bucket_b"))
        & (
            (F.col("od_a") < F.col("od_b"))
            | ((F.col("od_a") == F.col("od_b")) & (F.col("okey_a") < F.col("okey_b")))
        ),
    ).where(F.datediff("od_b", "od_a") <= 7).select(
        "cust", F.datediff("od_b", "od_a").cast("bigint").alias("gap_days")
    )
    return (
        pairs.groupBy("gap_days")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.countDistinct("cust").cast("bigint").alias("n_customers"),
        )
        .orderBy("gap_days")
    )
