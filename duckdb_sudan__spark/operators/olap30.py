"""r11 wave 22: two-proportion z-test, Neyman allocation, and
interval-union coverage.

- ml_two_proportion_ztest is the conversion-rate A/B readout (the
  continuous-outcome Welch test's binary sibling, run after
  ev_ab_srm_check clears the split): unit = ACTIVE USER-DAY (this
  corpus's hyper-active users all convert at least once over the
  month, so user-grain conversion is degenerate-1 at small SFs; daily
  conversion is the standard dashboard metric anyway), arms by user
  parity, pooled-variance z as ONE shared IEEE tree over exact
  integer counts, NULL on a degenerate pooled rate.
- sample_stratified_neyman is the survey-sampling allocation planner:
  distribute a fixed interview budget over market-segment strata
  ∝ N_h·σ_h (Neyman optimal). σ_h comes from exact hecto-dollar
  moments ($100 quantization keeps n²σ² inside int64 through sf1 —
  the welch bound, rule 30); the weights are floor-quantized to
  BIGINT BEFORE the cross-strata sum (a Σ of doubles would be
  partial-agg-order nondeterministic, rule 3), the div/% allocation
  runs on KILO-quantized weights (w_q div 1000 — budget·w_k stays
  ~1000× inside int64: ~3e15 at sf1, wrapping only past ~sf1000;
  r11 ADVICE flagged the raw-ppm product at ~3e18 with 3× headroom —
  and integer // truncates identically on both engines, rule 29,
  where a DECIMAL(38,0) ride would hit the DECIMAL-// round-then-
  floor divergence), and the floored allocations are topped up to
  the exact budget by largest-remainder with a deterministic
  (remainder DESC, segment) rank.
- ev_interval_union_coverage is the sweep-line classic (billed-time /
  sensor-uptime union): each event opens a 10-minute activity
  interval; overlapping intervals per user merge into islands via the
  running-max-end window, and the emission is the bounded islands-
  per-user histogram plus exact total covered microseconds — the
  measure of the interval UNION, not the naive Σ durations.

Determinism: every statistic is exact-integer or a single shared
IEEE tree from BIGINT-routed integers; interval arithmetic is pure
epoch_us (rule 10); the Neyman topping ranks on exact integer
remainders with a total-order tiebreak.

Scale notes (100 TB): the z-test reduces to 2×2 integer cells
map-side; Neyman reduces orders⋈customer to 5 strata cells and every
later op (weights, ranks, top-up) runs on the 5-row relation; the
sweep-line partitions by user — one window exchange at user grain,
then a user-grain reduce and a bounded histogram rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# ml_two_proportion_ztest — conversion-rate A/B readout
# ---------------------------------------------------------------------------

_Z_FINAL = [
    "n1", "x1", "n2", "x2",
    "CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS rate1",
    "CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS rate2",
    # degenerate pooled rate (0 or 1) => NULL, not a divide-by-zero
    "CASE WHEN x1 + x2 > 0 AND x1 + x2 < n1 + n2 THEN"
    " (CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
    " / SQRT((CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))"
    "        * (1 - CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))"
    "        * (1 / CAST(n1 AS DOUBLE) + 1 / CAST(n2 AS DOUBLE))) END AS z_stat",
]

ZTEST_ORACLE = """
WITH per_unit AS (
  SELECT user_id, CAST(ts AS DATE) AS day, user_id % 2 AS arm,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id, CAST(ts AS DATE)
), cells AS (
  SELECT CAST(COUNT(*) FILTER (arm = 0) AS BIGINT) AS n1,
         CAST(SUM(converted) FILTER (arm = 0) AS BIGINT) AS x1,
         CAST(COUNT(*) FILTER (arm = 1) AS BIGINT) AS n2,
         CAST(SUM(converted) FILTER (arm = 1) AS BIGINT) AS x2
  FROM per_unit
)
SELECT """ + ",\n       ".join(_Z_FINAL) + "\nFROM cells"


@register("ml_two_proportion_ztest", ZTEST_ORACLE)
def ml_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    per_unit = e.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("converted")
    ).select((F.col("user_id") % 2).alias("arm"), "converted")
    cells = per_unit.agg(
        F.count_if(F.col("arm") == 0).cast("bigint").alias("n1"),
        F.expr("CAST(SUM(converted) FILTER (WHERE arm = 0) AS BIGINT)").alias("x1"),
        F.count_if(F.col("arm") == 1).cast("bigint").alias("n2"),
        F.expr("CAST(SUM(converted) FILTER (WHERE arm = 1) AS BIGINT)").alias("x2"),
    )
    return cells.selectExpr(*_Z_FINAL)


# ---------------------------------------------------------------------------
# sample_stratified_neyman — optimal allocation of a fixed budget
# ---------------------------------------------------------------------------

NEYMAN_BUDGET = 10_000

NEYMAN_ORACLE = f"""
WITH oc AS (
  SELECT c.c_mktsegment AS seg,
         CAST(round(o.o_totalprice) AS BIGINT) // 100 AS v
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), cells AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_h,
         CAST(SUM(v) AS BIGINT) AS s_h,
         SUM(CAST(v AS DECIMAL(38,0)) * v) AS q_h
  FROM oc GROUP BY seg
), weighted AS (
  SELECT seg, n_h,
         CAST(FLOOR(1000000 * CAST(n_h AS DOUBLE)
              * SQRT(CAST(CAST(n_h * q_h - CAST(s_h AS DECIMAL(38,0)) * s_h AS BIGINT) AS DOUBLE)
                     / CAST(n_h * (n_h - 1) AS DOUBLE))) AS BIGINT) AS w_q
  FROM cells
), alloc AS (
  -- GREATEST(..., 1): a zero-variance (or sub-kilo-weight) stratum
  -- quantizes to 0; if EVERY stratum does, the total is 0 and the two
  -- engines diverge (DuckDB raises on //0, Spark's div returns NULL).
  -- The 1-floor keeps the denominator positive on both sides and gives
  -- degenerate strata the minimal uniform weight instead of none.
  SELECT seg, n_h, w_q,
         CAST({NEYMAN_BUDGET} * GREATEST(w_q // 1000, 1) // SUM(GREATEST(w_q // 1000, 1)) OVER () AS BIGINT) AS base_n,
         CAST({NEYMAN_BUDGET} * GREATEST(w_q // 1000, 1) % SUM(GREATEST(w_q // 1000, 1)) OVER () AS BIGINT) AS rem
  FROM weighted
), topped AS (
  SELECT seg, n_h, w_q, base_n,
         CASE WHEN row_number() OVER (ORDER BY rem DESC, seg)
                   <= {NEYMAN_BUDGET} - SUM(base_n) OVER ()
              THEN base_n + 1 ELSE base_n END AS alloc_n
  FROM alloc
)
SELECT seg, n_h, w_q, CAST(alloc_n AS BIGINT) AS alloc_n
FROM topped
ORDER BY seg
"""


@register("sample_stratified_neyman", NEYMAN_ORACLE)
def sample_stratified_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    oc = o.join(c, o.o_custkey == c.c_custkey).selectExpr(
        "c_mktsegment AS seg",
        "CAST(round(o_totalprice) AS BIGINT) div 100 AS v",
    )
    cells = oc.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        F.sum("v").cast("bigint").alias("s_h"),
        F.expr("SUM(CAST(v AS DECIMAL(38,0)) * v)").alias("q_h"),
    )
    weighted = cells.selectExpr(
        "seg", "n_h",
        "CAST(FLOOR(1000000 * CAST(n_h AS DOUBLE)"
        " * SQRT(CAST(CAST(n_h * q_h - CAST(s_h AS DECIMAL(38,0)) * s_h AS BIGINT) AS DOUBLE)"
        " / CAST(n_h * (n_h - 1) AS DOUBLE))) AS BIGINT) AS w_q",
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    alloc = weighted.select(
        "seg", "n_h", "w_q",
        # GREATEST(..., 1) mirrors the oracle's zero-total guard exactly
        F.expr(f"CAST({NEYMAN_BUDGET} * GREATEST(w_q div 1000, 1) AS BIGINT)").alias("scaled"),
        F.expr("GREATEST(w_q div 1000, 1)").alias("w_k"),
    ).select(
        "seg", "n_h", "w_q", "scaled",
        F.sum("w_k").over(wall).alias("tot_w"),
    ).selectExpr(
        "seg", "n_h", "w_q",
        "CAST(scaled div tot_w AS BIGINT) AS base_n",
        "CAST(scaled % tot_w AS BIGINT) AS rem",
    )
    wrank = Window.orderBy(F.desc("rem"), "seg")
    topped = alloc.select(
        "seg", "n_h", "w_q", "base_n", "rem",
        F.row_number().over(wrank).alias("rk"),
        F.sum("base_n").over(wall).alias("base_total"),
    ).selectExpr(
        "seg", "n_h", "w_q",
        f"CAST(CASE WHEN rk <= {NEYMAN_BUDGET} - base_total"
        " THEN base_n + 1 ELSE base_n END AS BIGINT) AS alloc_n",
    )
    return topped.orderBy("seg")


# ---------------------------------------------------------------------------
# ev_interval_union_coverage — merged activity-interval measure per user
# ---------------------------------------------------------------------------

COVER_WINDOW_US = 10 * 60 * 1_000_000  # each event covers [ts, ts + 10 min)

COVERAGE_ORACLE = f"""
WITH iv AS (
  SELECT user_id,
         CAST(epoch_us(ts) AS BIGINT) AS s,
         CAST(epoch_us(ts) AS BIGINT) + {COVER_WINDOW_US} AS e
  FROM events
), flagged AS (
  SELECT user_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -9223372036854775808)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
), islands AS (
  SELECT user_id, s, e,
         SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                               ROWS UNBOUNDED PRECEDING) AS island_id
  FROM flagged
), merged AS (
  SELECT user_id, island_id,
         CAST(MAX(e) - MIN(s) AS BIGINT) AS span_us
  FROM islands GROUP BY user_id, island_id
), per_user AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_islands,
         CAST(SUM(span_us) AS BIGINT) AS covered_us
  FROM merged GROUP BY user_id
)
SELECT n_islands,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(covered_us) AS BIGINT) AS covered_us
FROM per_user
GROUP BY n_islands
ORDER BY n_islands
"""


@register("ev_interval_union_coverage", COVERAGE_ORACLE)
def ev_interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(COVER_WINDOW_US)).alias("e"),
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id", "s", "e",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(wprev), F.lit(-(2**63))), 1
        ).otherwise(0).alias("new_island"),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.select(
        "user_id", "s", "e", F.sum("new_island").over(wrun).alias("island_id")
    )
    merged = islands.groupBy("user_id", "island_id").agg(
        (F.max("e") - F.min("s")).cast("bigint").alias("span_us")
    )
    per_user = merged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum("span_us").cast("bigint").alias("covered_us"),
    )
    return (
        per_user.groupBy("n_islands")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("covered_us").cast("bigint").alias("covered_us"),
        )
        .orderBy("n_islands")
    )
