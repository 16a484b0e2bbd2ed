"""r11 wave 23: CUPED adjustment, per-group AUC audit, and the fiscal
calendar rollup.

- ev_cuped_adjustment is the experimentation-platform variance killer
  (CUPED: Deng et al.'s pre-period covariate adjustment, public
  method): θ = cov(X,Y)/var(X) from pre-period spend X (first 15
  days) and experiment spend Y (rest), pooled across arms; the
  adjusted per-arm means Ȳ−θ(X̄−X̄_all) shrink the arm-difference
  noise. All second moments are exact integer cents products in
  DECIMAL(38,0), BIGINT-routed (rule 30); θ and the adjusted lift are
  shared IEEE trees.
- ml_auc_by_group is the fairness-audit slice of ml_auc_exact: the
  rank-based AUC (Σ pos-ranks − P(P+1)/2)/(P·N) computed WITHIN each
  user-activity quartile, emitted in exact floor-ppm per group plus
  the macro average — per-group AUCs are ppm BIGINTs BEFORE the
  macro mean, so the cross-group aggregate is exact (rule 3: never
  average raw doubles across rows).
- dt_fiscal_calendar_rollup is the July-start fiscal calendar (AU/
  gov convention): FY = year + (month ≥ 7), FQ = ((month−7) mod 12)
  div 3 + 1 — pure integer calendar maps — with revenue and order
  counts per (FY, FQ). The integer mod idiom keeps Jan-Jun in the
  prior FY without engine-specific date functions.

Determinism: integer moments + shared trees throughout; the fiscal
map is pure integer arithmetic; AUC rank sums are exact BIGINTs
(ranks within a quartile stay < 2^31.5 of the int64 bound through
sf100 — ranks·P products ride DECIMAL and route through BIGINT).

Scale notes (100 TB): CUPED reduces events to user-grain (X, Y)
pairs in ONE conditional aggregation pass, then 2-arm cells; the AUC
window ranks value within quartile (one exchange on the quartile
key after a user-grain reduce — never the raw stream), and each
group collapses to 3 integers; the fiscal rollup is map-assign +
bounded groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# ev_cuped_adjustment — pre-period covariate variance reduction
# ---------------------------------------------------------------------------
# Pre-period: first 15 calendar days of the corpus. X = pre-period
# purchase cents, Y = experiment-period purchase cents, per user
# (0 when absent). θ pooled across arms; emitted: arm cells, θ, the
# raw and CUPED-adjusted arm difference.

_CUPED_FINAL = [
    "n0", "n1",
    # pooled θ = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²) over exact integers
    "CAST(CAST(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS BIGINT) AS DOUBLE)"
    " / CAST(CAST(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS BIGINT) AS DOUBLE) AS theta",
    "CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS raw_diff_cents",
    "(CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
    " - (CAST(CAST(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS BIGINT) AS DOUBLE)"
    "    / CAST(CAST(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS BIGINT) AS DOUBLE))"
    "   * (CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE)) AS cuped_diff_cents",
]

CUPED_ORACLE = """
WITH bounds AS (
  SELECT CAST(MIN(CAST(ts AS DATE)) AS DATE) + INTERVAL 15 DAY AS cutoff FROM events
), per_user AS (
  SELECT user_id, user_id % 2 AS arm,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' AND ts < CAST(cutoff AS TIMESTAMP)
                                THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT) AS x,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' AND ts >= CAST(cutoff AS TIMESTAMP)
                                THEN CAST(round(value * 100) AS BIGINT) END), 0) AS BIGINT) AS y
  FROM events, bounds GROUP BY user_id, bounds.cutoff
), cells AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
         SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
         CAST(COUNT(*) FILTER (arm = 0) AS BIGINT) AS n0,
         CAST(COUNT(*) FILTER (arm = 1) AS BIGINT) AS n1,
         CAST(SUM(x) FILTER (arm = 0) AS BIGINT) AS sx0,
         CAST(SUM(x) FILTER (arm = 1) AS BIGINT) AS sx1,
         CAST(SUM(y) FILTER (arm = 0) AS BIGINT) AS sy0,
         CAST(SUM(y) FILTER (arm = 1) AS BIGINT) AS sy1
  FROM per_user
)
SELECT """ + ",\n       ".join(_CUPED_FINAL) + "\nFROM cells"


@register("ev_cuped_adjustment", CUPED_ORACLE)
def ev_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_add(F.min(F.col("ts").cast("date")), 15).alias("cutoff")
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    per_user = (
        e.crossJoin(F.broadcast(bounds))
        .groupBy("user_id", "cutoff")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("event_type") == "purchase")
                        & (F.col("ts") < F.col("cutoff").cast("timestamp")),
                        cents,
                    )
                ),
                F.lit(0),
            ).cast("bigint").alias("x"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("event_type") == "purchase")
                        & (F.col("ts") >= F.col("cutoff").cast("timestamp")),
                        cents,
                    )
                ),
                F.lit(0),
            ).cast("bigint").alias("y"),
        )
        .select((F.col("user_id") % 2).alias("arm"), "x", "y")
    )
    cells = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.expr("SUM(CAST(x AS DECIMAL(38,0)) * y)").alias("sxy"),
        F.expr("SUM(CAST(x AS DECIMAL(38,0)) * x)").alias("sxx"),
        F.count_if(F.col("arm") == 0).cast("bigint").alias("n0"),
        F.count_if(F.col("arm") == 1).cast("bigint").alias("n1"),
        F.expr("CAST(SUM(x) FILTER (WHERE arm = 0) AS BIGINT)").alias("sx0"),
        F.expr("CAST(SUM(x) FILTER (WHERE arm = 1) AS BIGINT)").alias("sx1"),
        F.expr("CAST(SUM(y) FILTER (WHERE arm = 0) AS BIGINT)").alias("sy0"),
        F.expr("CAST(SUM(y) FILTER (WHERE arm = 1) AS BIGINT)").alias("sy1"),
    )
    return cells.selectExpr(*_CUPED_FINAL)


# ---------------------------------------------------------------------------
# ml_auc_by_group — rank-based AUC per activity quartile + macro average
# ---------------------------------------------------------------------------

AUC_GROUP_ORACLE = """
WITH per_user AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
), tiled AS (
  SELECT user_id, CAST(ntile(4) OVER (ORDER BY n_events, user_id) AS BIGINT) AS quartile
  FROM per_user
), scored AS (
  SELECT t.quartile,
         CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
         row_number() OVER (PARTITION BY t.quartile ORDER BY e.value, e.event_id) AS rnk
  FROM events e JOIN tiled t ON e.user_id = t.user_id
), cells AS (
  SELECT quartile,
         CAST(SUM(pos) AS BIGINT) AS p,
         CAST(COUNT(*) - SUM(pos) AS BIGINT) AS neg,
         CAST(SUM(CASE WHEN pos = 1 THEN rnk ELSE 0 END) AS BIGINT) AS rank_sum
  FROM scored GROUP BY quartile
), per_group AS (
  SELECT quartile, p, neg,
         CASE WHEN p > 0 AND neg > 0 THEN
           CAST(FLOOR(1000000 * CAST(CAST(2 * (rank_sum - p * (p + 1) // 2) AS BIGINT) AS DOUBLE)
                      / (2 * CAST(p AS DOUBLE) * CAST(neg AS DOUBLE))) AS BIGINT)
         END AS auc_ppm
  FROM cells
)
SELECT quartile, p, neg, auc_ppm,
       CAST(SUM(auc_ppm) OVER () // 4 AS BIGINT) AS macro_auc_ppm
FROM per_group
ORDER BY quartile
"""


@register("ml_auc_by_group", AUC_GROUP_ORACLE)
def ml_auc_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    tiled = per_user.select(
        "user_id",
        F.ntile(4).over(Window.orderBy("n_events", "user_id")).cast("bigint").alias("quartile"),
    )
    scored = e.join(tiled, "user_id").select(
        "quartile",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
        F.row_number()
        .over(Window.partitionBy("quartile").orderBy("value", "event_id"))
        .alias("rnk"),
    )
    cells = scored.groupBy("quartile").agg(
        F.sum("pos").cast("bigint").alias("p"),
        (F.count(F.lit(1)) - F.sum("pos")).cast("bigint").alias("neg"),
        F.expr("CAST(SUM(CASE WHEN pos = 1 THEN rnk ELSE 0 END) AS BIGINT)").alias("rank_sum"),
    )
    per_group = cells.selectExpr(
        "quartile", "p", "neg",
        "CASE WHEN p > 0 AND neg > 0 THEN"
        " CAST(FLOOR(1000000 * CAST(CAST(2 * (rank_sum - p * (p + 1) div 2) AS BIGINT) AS DOUBLE)"
        " / (2 * CAST(p AS DOUBLE) * CAST(neg AS DOUBLE))) AS BIGINT)"
        " END AS auc_ppm",
    )
    return per_group.selectExpr(
        "quartile", "p", "neg", "auc_ppm",
        "CAST(SUM(auc_ppm) OVER () div 4 AS BIGINT) AS macro_auc_ppm",
    ).orderBy("quartile")


# ---------------------------------------------------------------------------
# dt_fiscal_calendar_rollup — July-start fiscal year / quarter revenue
# ---------------------------------------------------------------------------

FISCAL_ORACLE = """
WITH mapped AS (
  SELECT CAST(year(o_orderdate) + CASE WHEN month(o_orderdate) >= 7 THEN 1 ELSE 0 END AS BIGINT) AS fy,
         CAST((month(o_orderdate) + 5) % 12 // 3 + 1 AS BIGINT) AS fq,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT fy, fq,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM mapped
GROUP BY fy, fq
ORDER BY fy, fq
"""


@register("dt_fiscal_calendar_rollup", FISCAL_ORACLE)
def dt_fiscal_calendar_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.selectExpr(
            "CAST(year(o_orderdate) + CASE WHEN month(o_orderdate) >= 7 THEN 1 ELSE 0 END AS BIGINT) AS fy",
            "CAST((month(o_orderdate) + 5) % 12 div 3 + 1 AS BIGINT) AS fq",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .groupBy("fy", "fq")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
        .orderBy("fy", "fq")
    )
