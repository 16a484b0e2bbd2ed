"""r7 OLAP wave: marketing/event analytics — multi-touch attribution
and conversion-lag quantiles.

Same determinism posture as the rest of the OLAP surface: integer
arithmetic decides everything hashable (lags in integer microseconds,
counts, integer cumulative-count quantile selection); the single ROUND(1/n, 6)
credit is tie-free for any realistic touch count (a .XXXXXX5 tie needs
n >= 128 with only 2/5 prime factors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# cte_reused_aggregate's materialized-CTE cache, released on the next
# invocation (same handle-list discipline as dedup._CONTAIN_CACHE_HANDLES
# — repeated calls in one process must not accumulate cached relations).
_CTE_CACHE_HANDLES: list[DataFrame] = []

# ---------------------------------------------------------------------------
# ev_multitouch_attribution — linear credit across pre-purchase views
# ---------------------------------------------------------------------------

ATTRIB_WINDOW_HOURS = 24

MULTITOUCH_ORACLE = f"""
WITH views AS (
  SELECT event_id AS view_id, user_id, ts AS v_ts FROM events WHERE event_type = 'view'
),
purch AS (
  SELECT event_id AS purchase_id, user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT p.purchase_id, v.view_id
  FROM purch p JOIN views v USING (user_id)
  WHERE v.v_ts < p.p_ts AND v.v_ts >= p.p_ts - INTERVAL {ATTRIB_WINDOW_HOURS} HOURS
)
SELECT purchase_id, view_id,
       CAST(n_touches AS BIGINT) AS n_touches,
       ROUND(1.0 / n_touches, 6) AS credit
FROM (SELECT purchase_id, view_id,
             COUNT(*) OVER (PARTITION BY purchase_id) AS n_touches
      FROM touch)
ORDER BY purchase_id, view_id
"""


@register("ev_multitouch_attribution", MULTITOUCH_ORACLE)
def ev_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every view in the 24h before a
    purchase by the same user shares the credit equally (1/n per
    touch, summing to 1 per purchase) — the marketing-analytics
    relation one step past last-touch (ev_asof_join) and funnel
    counting (ev_funnel). Plan: the time predicate rides on a USER
    equi-join (per-user event counts bound the pair fan-out — the same
    argument as ev_funnel's shape, no grid bucketing needed because
    user_id is already the natural co-partition key), then ONE window
    on purchase_id for the touch count. At 100 TB this is one shuffle
    on user_id and one on purchase_id, both combinable."""
    e = load_table(spark, sf_dir, "events")
    views = e.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("v_ts")
    )
    purch = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    touch = purch.join(views, "user_id").where(
        (F.col("v_ts") < F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {ATTRIB_WINDOW_HOURS} HOURS"))
    )
    w = Window.partitionBy("purchase_id")
    return (
        touch.select("purchase_id", "view_id")
        .withColumn("n_touches", F.count(F.lit(1)).over(w))
        .select(
            "purchase_id",
            "view_id",
            "n_touches",
            F.round(F.lit(1.0) / F.col("n_touches"), 6).alias("credit"),
        )
        .orderBy("purchase_id", "view_id")
    )


# ---------------------------------------------------------------------------
# ev_conversion_lag_quantiles — signup → first purchase lag distribution
# ---------------------------------------------------------------------------

CONVERSION_LAG_ORACLE = """
WITH first_signup AS (
  SELECT user_id, MIN(ts) AS s_ts FROM events WHERE event_type = 'signup' GROUP BY user_id
),
first_purchase AS (
  SELECT f.user_id,
         MIN(e.ts) AS p_ts
  FROM first_signup f JOIN events e
    ON e.user_id = f.user_id AND e.event_type = 'purchase' AND e.ts >= f.s_ts
  GROUP BY f.user_id
),
lags AS (
  SELECT epoch_us(p.p_ts) - epoch_us(f.s_ts) AS lag_us
  FROM first_signup f JOIN first_purchase p USING (user_id)
),
counts AS (
  SELECT lag_us, COUNT(*) AS cnt FROM lags GROUP BY lag_us
),
cum AS (
  SELECT lag_us,
         SUM(cnt) OVER () AS n,
         SUM(cnt) OVER (ORDER BY lag_us
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM counts
)
SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
       MIN(CASE WHEN cum * 4 >= n      THEN lag_us END) AS p25_us,
       MIN(CASE WHEN cum * 2 >= n      THEN lag_us END) AS p50_us,
       MIN(CASE WHEN cum * 4 >= n * 3  THEN lag_us END) AS p75_us,
       MIN(CASE WHEN cum * 10 >= n * 9 THEN lag_us END) AS p90_us
FROM cum
"""


@register("ev_conversion_lag_quantiles", CONVERSION_LAG_ORACLE)
def ev_conversion_lag_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, first signup to first
    subsequent purchase, in integer MICROSECONDS (unix_micros ≡ DuckDB
    epoch_us exactly — whole-second truncation disagrees with
    fractional epoch subtraction by ±1s); p25/p50/p75/p90 as DISCRETE
    quantiles via the integer cumulative-count inequality (the
    agg_quantile_multi idiom — the smallest lag whose cumulative count
    reaches ceil(p*n); no fp enters selection, so both engines pick
    the identical element). Plan: two per-user MIN aggregates (one
    shuffle each on user_id, map-combinable), a tiny user-level join,
    then the quantile windows over the lag-value counts — bounded by
    distinct lag values, not users."""
    e = load_table(spark, sf_dir, "events")
    first_signup = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    first_purchase = (
        e.where(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .join(first_signup, "user_id")
        .where(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    lags = (
        first_signup.join(first_purchase, "user_id")
        .select(
            (F.unix_micros("p_ts") - F.unix_micros("s_ts")).alias("lag_us")
        )
    )
    counts = lags.groupBy("lag_us").agg(F.count(F.lit(1)).alias("cnt"))
    w_all = Window.partitionBy()
    w_cum = w_all.orderBy("lag_us").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = counts.select(
        "lag_us",
        F.sum("cnt").over(w_all).alias("n"),
        F.sum("cnt").over(w_cum).alias("cum"),
    )

    def pick(mult_cum: int, mult_n: int, name: str):
        return F.min(
            F.when(F.col("cum") * mult_cum >= F.col("n") * mult_n, F.col("lag_us"))
        ).alias(name)

    return cum.agg(
        F.max("n").cast("bigint").alias("n_converted"),
        pick(4, 1, "p25_us"),
        pick(2, 1, "p50_us"),
        pick(4, 3, "p75_us"),
        pick(10, 9, "p90_us"),
    )


# ---------------------------------------------------------------------------
# ev_dau_wau_mau — rolling active-user counts + stickiness
# ---------------------------------------------------------------------------

DAU_ORACLE = """
WITH day_users AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id FROM events
),
bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM day_users),
dau AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM day_users GROUP BY day
),
wau AS (
  SELECT w_day AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
  FROM (SELECT user_id, day + INTERVAL (o) DAY AS w_day
        FROM day_users, unnest(generate_series(0, 6)) AS t(o))
  WHERE w_day <= (SELECT hi FROM bounds)
  GROUP BY w_day
),
mau AS (
  SELECT m_day AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
  FROM (SELECT user_id, day + INTERVAL (o) DAY AS m_day
        FROM day_users, unnest(generate_series(0, 27)) AS t(o))
  WHERE m_day <= (SELECT hi FROM bounds)
  GROUP BY m_day
)
SELECT d.day, d.dau, w.wau, m.mau
FROM dau d JOIN wau w USING (day) JOIN mau m USING (day)
ORDER BY d.day
"""


@register("ev_dau_wau_mau", DAU_ORACLE)
def ev_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / rolling-7d WAU / rolling-28d MAU per day, plus the
    DAU/MAU stickiness ratio — the product-analytics headline. Rolling
    DISTINCT counts can't ride a window frame (distinct isn't
    decomposable), so each (day, user) row is EXPLODED into the 7/28
    window-end days it contributes to and deduped there — linear
    fan-out (7x/28x the per-day-user relation, which is already the
    small distinct aggregate), never a per-day self-join over the raw
    events. Window-end days past the corpus horizon are dropped;
    early days aggregate partial windows (industry convention).
    Plan: one distinct shuffle on (day, user), two explode+distinct
    aggregates, three broadcastable day-level joins. Emits the
    INTEGER dau/wau/mau columns only — the DAU/MAU stickiness ratio
    is left to the consumer because dau/mau reduces to denominators
    up to 2^7·5^7, where ROUND(x, 6) hits true .XXXXXX5 ties and
    Spark HALF_UP disagrees with DuckDB half-even (ADVICE r7;
    DETERMINISM.md)."""
    e = load_table(spark, sf_dir, "events")
    day_users = e.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    hi = day_users.agg(F.max("day").alias("hi"))
    dau = day_users.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))

    def rolling(n_days: int, name: str) -> DataFrame:
        return (
            day_users.select(
                F.explode(
                    F.expr(
                        f"transform(sequence(0, {n_days - 1}), "
                        f"o -> day + make_interval(0, 0, 0, o, 0, 0, 0))"
                    )
                ).alias("day"),
                "user_id",
            )
            .crossJoin(F.broadcast(hi))
            .where(F.col("day") <= F.col("hi"))
            .groupBy("day")
            .agg(F.countDistinct("user_id").alias(name))
        )

    return (
        dau.join(rolling(7, "wau"), "day")
        .join(rolling(28, "mau"), "day")
        .select("day", "dau", "wau", "mau")
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# cte_reused_aggregate — one expensive aggregate consumed twice
# ---------------------------------------------------------------------------

CTE_REUSE_ORACLE = """
WITH nation_rev AS (
  SELECT n.n_name,
         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  GROUP BY n.n_name
)
SELECT a.n_name, a.revenue,
       ROUND(a.revenue / t.total, 6) AS revenue_share,
       a.revenue >= t.avg_rev AS above_average
FROM nation_rev a
CROSS JOIN (SELECT SUM(revenue) AS total, AVG(revenue) AS avg_rev FROM nation_rev) t
ORDER BY a.n_name
"""


@register("cte_reused_aggregate", CTE_REUSE_ORACLE)
def cte_reused_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One expensive aggregate (per-nation revenue over lineitem)
    consumed TWICE — as the detail rows and as the grand-total/average
    divisor — the report-query shape where engines must not recompute
    the fact scan. Spark reuses the aggregate's exchange for both
    consumers. Spark's compile-time ReuseExchange does NOT fire across
    the two independent consumers under AQE (verified: two compiled
    lineitem scans), so the aggregate is explicitly CACHED — the
    MATERIALIZED-CTE semantic, same discipline as the minhash sig
    cache: both consumers read InMemoryTableScan (pinned by a plan
    test) and the fact-side join computes once. Caching a
    nation-cardinality aggregate is bytes at any corpus size.
    share/above_average derive from the SAME relation, so the two
    consumers can never disagree. The 1-row total side broadcasts."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    from duckdb_sudan__spark.operators.relational import dsum_micro

    rev = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            dsum_micro(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), "revenue"
            )
        )
    )
    while _CTE_CACHE_HANDLES:
        _CTE_CACHE_HANDLES.pop().unpersist()
    rev.cache()
    _CTE_CACHE_HANDLES.append(rev)
    totals = rev.agg(
        F.sum("revenue").alias("total"), F.avg("revenue").alias("avg_rev")
    )
    return (
        rev.crossJoin(F.broadcast(totals))
        .select(
            "n_name",
            "revenue",
            F.round(F.col("revenue") / F.col("total"), 6).alias("revenue_share"),
            (F.col("revenue") >= F.col("avg_rev")).alias("above_average"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# str_funcs2 / num_funcs_parity — second wave of scalar-function parity
# ---------------------------------------------------------------------------

STR_FUNCS2_ORACLE = """
SELECT p_partkey,
       left(p_name, 4) AS l4,
       right(p_name, 4) AS r4,
       lpad(p_name, 25, '*') AS lp,
       rpad(p_name, 25, '*') AS rp,
       translate(p_name, 'ae', '@3') AS tr,
       repeat(left(p_name, 2), 3) AS rep,
       reverse(p_name) AS rev,
       CAST(ascii(p_name) AS INTEGER) AS asc_first,
       starts_with(p_name, 'b') AS sw,
       contains(p_name, 'an') AS has_an,
       ltrim(p_name, 'abc') AS lt,
       rtrim(p_name, 'abc') AS rt,
       CAST(position('a' IN p_name) AS INTEGER) AS pos_a
FROM part WHERE p_partkey < 100
ORDER BY p_partkey
"""


@register("str_funcs2", STR_FUNCS2_ORACLE)
def str_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-function parity pack (str_funcs covers upper/
    length/substring/replace/split_part/levenshtein/concat): left,
    right, lpad, rpad, translate, repeat, reverse, ascii, starts_with,
    contains, char-class ltrim/rtrim, position — every one verified
    value-identical across engines through the hash gate. initcap is
    deliberately absent (DuckDB has no initcap). Map-only projection;
    parity entries exist so a user porting DuckDB SQL knows precisely
    which scalar calls translate 1:1."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < 100)
    return p.select(
        "p_partkey",
        F.expr("left(p_name, 4)").alias("l4"),
        F.expr("right(p_name, 4)").alias("r4"),
        F.lpad("p_name", 25, "*").alias("lp"),
        F.rpad("p_name", 25, "*").alias("rp"),
        F.translate("p_name", "ae", "@3").alias("tr"),
        F.repeat(F.expr("left(p_name, 2)"), 3).alias("rep"),
        F.reverse("p_name").alias("rev"),
        F.ascii("p_name").cast("int").alias("asc_first"),
        F.startswith(F.col("p_name"), F.lit("b")).alias("sw"),
        F.contains(F.col("p_name"), F.lit("an")).alias("has_an"),
        F.ltrim(F.col("p_name"), F.lit("abc")).alias("lt"),
        F.rtrim(F.col("p_name"), F.lit("abc")).alias("rt"),
        F.expr("position('a' IN p_name)").cast("int").alias("pos_a"),
    ).orderBy("p_partkey")


NUM_FUNCS_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST(abs(l_discount - 0.05) AS DOUBLE) AS adist,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS sgn,
       CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
       CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
       CAST(l_quantity AS BIGINT) % 7 AS qmod,
       CAST(greatest(l_quantity, l_discount * 100) AS DOUBLE) AS g,
       CAST(least(l_quantity, l_discount * 100) AS DOUBLE) AS lst,
       sqrt(l_quantity) AS sq,
       power(l_discount, 2) AS d2
FROM lineitem WHERE l_orderkey < 100
ORDER BY l_orderkey, l_linenumber
"""


@register("num_funcs_parity", NUM_FUNCS_ORACLE)
def num_funcs_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric scalar parity: abs, sign, ceil, floor, %, greatest,
    least, sqrt, power — every op here is IEEE-exact or integer
    (numeric trunc is absent: Spark's trunc is date-only, and for the
    positive domain floor already covers it)
    (sqrt and a single power are correctly-rounded per IEEE 754 on
    both JVMs and DuckDB; no transcendentals, per DETERMINISM.md),
    so the pack hash-matches with zero rounding in the oracle. % keeps
    the dividend's sign on both engines (DETERMINISM-relevant for
    negative keys)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("adist"),
        F.signum(F.col("l_discount") - 0.05).alias("sgn"),
        F.ceil(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_k_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_k_floor"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qmod"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("g"),
        F.least(F.col("l_quantity"), F.col("l_discount") * 100).alias("lst"),
        F.sqrt("l_quantity").alias("sq"),
        F.pow(F.col("l_discount"), F.lit(2)).alias("d2"),
    ).orderBy("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# dt_funcs2 — second date/time parity pack (calendar conventions)
# ---------------------------------------------------------------------------

DT_FUNCS2_ORACLE = """
SELECT o_orderkey,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow_sun1,
       CAST(isodow(o_orderdate) - 1 AS INTEGER) AS wd_mon0,
       CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
       CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS TIMESTAMP) AS plus_month
FROM orders WHERE o_orderkey < 200
ORDER BY o_orderkey
"""


@register("dt_funcs2", DT_FUNCS2_ORACLE)
def dt_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date parity pack — the CONVENTION traps (dt_funcs covers
    year/quarter/month/day/trunc/interval/datediff): weekday numbering
    (Spark dayofweek is 1=Sunday vs DuckDB dayofweek 0=Sunday — the
    oracle shifts by 1; Spark weekday 0=Monday ≡ DuckDB isodow-1),
    ISO week numbers (both ISO — equal as-is), day-of-year, last_day,
    and end-of-month-clamped month addition (Spark add_months ≡
    DuckDB + INTERVAL 1 MONTH: Jan 31 + 1 → Feb 29, verified both).
    DATE results cast to TIMESTAMP per DETERMINISM.md #4 (DATE
    columns hash differently per fetch mode)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 200)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.dayofweek("o_orderdate").cast("int").alias("dow_sun1"),
        F.weekday("o_orderdate").cast("int").alias("wd_mon0"),
        F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
        F.dayofyear("o_orderdate").cast("int").alias("doy"),
        F.add_months(d, 1).cast("timestamp").alias("plus_month"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# sudan_wb_yoy — provider surface composed with the YoY operator
# ---------------------------------------------------------------------------


def _wb_yoy_oracle() -> str:
    from duckdb_sudan__spark.providers import api

    return f"""
WITH wb AS ({api.worldbank_oracle("SP.POP.TOTL", ["SDN", "EGY", "ETH"])}),
yearly AS (
  SELECT country_name, CAST(year AS INTEGER) AS yr, CAST(value AS BIGINT) AS pop
  FROM wb
)
SELECT c.country_name, c.yr, c.pop,
       p.pop AS prev_pop,
       ROUND(CAST(c.pop - p.pop AS DOUBLE) / p.pop, 6) AS yoy_pct
FROM yearly c LEFT JOIN yearly p
  ON p.country_name = c.country_name AND p.yr = c.yr - 1
ORDER BY c.country_name, c.yr
"""


def _register_wb_yoy() -> None:
    @register("sudan_wb_yoy", _wb_yoy_oracle())
    def sudan_wb_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Provider ∘ OLAP composition #2 (after sudan_wb_pivot): the
        SUDAN_WorldBank table function's population series run through
        the same join-on-previous-period YoY shape as ts_yoy_growth —
        per-country annual growth rates, the first chart every
        consumer of the reference extension draws. Values are integral
        doubles → exact BIGINT on both engines; the per-country
        prev-year alignment is the gap-correct self-join, broadcast
        (the provider relation is year×country-bounded)."""
        from duckdb_sudan__spark.providers import api

        wb = api.sudan_worldbank(spark, "SP.POP.TOTL", ["SDN", "EGY", "ETH"])
        yearly = wb.select(
            "country_name",
            F.col("year").cast("int").alias("yr"),
            F.col("value").cast("bigint").alias("pop"),
        )
        prev = yearly.select(
            "country_name",
            (F.col("yr") + 1).alias("yr"),
            F.col("pop").alias("prev_pop"),
        )
        return (
            yearly.join(F.broadcast(prev), ["country_name", "yr"], "left")
            .select(
                "country_name",
                "yr",
                "pop",
                "prev_pop",
                F.round(
                    (F.col("pop") - F.col("prev_pop")).cast("double")
                    / F.col("prev_pop"),
                    6,
                ).alias("yoy_pct"),
            )
            .orderBy("country_name", "yr")
        )


_register_wb_yoy()


# ---------------------------------------------------------------------------
# num_try_arith — error-free arithmetic parity (try_divide / nullif)
# ---------------------------------------------------------------------------

TRY_ARITH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST(l_extendedprice / nullif(l_quantity - 10, 0) AS DOUBLE) AS per_over10,
       CAST(CAST(l_quantity AS BIGINT) // nullif(CAST(l_tax * 100 AS BIGINT), 0) AS BIGINT) AS q_div_tax,
       coalesce(CAST(l_quantity AS BIGINT) % nullif(CAST(l_tax * 100 AS BIGINT), 0), -1) AS q_mod_tax
FROM lineitem WHERE l_orderkey < 100
ORDER BY l_orderkey, l_linenumber
"""


@register("num_try_arith", TRY_ARITH_ORACLE)
def num_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-free arithmetic parity: Spark try_divide / div-with-
    nullif ≡ DuckDB x / nullif(y, 0) — division by zero yields NULL
    (never an exception, never Inf) on both engines, integer floor
    division (Spark `div` ≡ DuckDB `//` for non-negative operands)
    and guarded modulo included. The pattern every robust pipeline
    uses instead of wrapping queries in try/except."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 100)
    qty = F.col("l_quantity").cast("bigint")
    tax100 = (F.col("l_tax") * 100).cast("bigint")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 10).alias("per_over10"),
        F.expr("CAST(l_quantity AS BIGINT) div nullif(CAST(l_tax * 100 AS BIGINT), 0)").alias("q_div_tax"),
        F.coalesce(qty % F.nullif(tax100, F.lit(0)), F.lit(-1)).cast("bigint").alias("q_mod_tax"),
    ).orderBy("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# agg_weighted_avg — quantity-weighted average price per return flag
# ---------------------------------------------------------------------------

WEIGHTED_AVG_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(27,6))) AS DOUBLE)
         / CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS wavg_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS total_qty,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("agg_weighted_avg", WEIGHTED_AVG_ORACLE)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-averaged price per return flag — SUM(p*q)/SUM(q) with
    BOTH sums accumulated as DECIMAL(27,6) (order-independent; the
    product cast to decimal BEFORE summing per DETERMINISM.md #14)
    and ONE double division at the end. The aggregate every pricing
    dashboard computes; one partial-agg shuffle on a 3-value key."""
    li = load_table(spark, sf_dir, "lineitem")
    pq = (F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(27,6)")
    q = F.col("l_quantity").cast("decimal(27,6)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(pq).cast("double").alias("sum_pq"),
            F.sum(q).cast("double").alias("total_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            "l_returnflag",
            (F.col("sum_pq") / F.col("total_qty")).alias("wavg_price"),
            "total_qty",
            "n_lines",
        )
        .orderBy("l_returnflag")
    )
