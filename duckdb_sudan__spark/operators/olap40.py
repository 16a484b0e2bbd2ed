"""r14 wave (part 1): Pareto frontier (skyline), Kruskal–Wallis
rank test, Brown–Forsythe variance test, and A/B power analysis.

- q_pareto_frontier_parts is the 2-D SKYLINE operator (minimize
  price, maximize size over parts): the classic multi-objective
  dominance query no single ORDER BY can express. Reduced to the
  per-price best point, the frontier is a strict-improvement scan —
  a point survives iff its size beats every strictly-cheaper point's
  best size.
- stats_kruskal_wallis is the rank-based k-sample location test
  (values need not be normal) over event value cents by event_type,
  with the exact tie correction. Ranks come from the bounded
  VALUE-HISTOGRAM (doubled average ranks are exact integers:
  2·rank = 2·cum_before + cnt + 1), never from a global sort of the
  fact table.
- stats_levene_bf is the Brown–Forsythe robust variance-homogeneity
  test (ANOVA F on |x − group median|): group medians are exact
  order statistics read off the same bounded histogram (doubled
  medians are integers), deviations are exact integers, and the F
  statistic is one shared IEEE tree over int64 moments.
- ev_power_mde is the experiment-design power table: for a grid of
  relative MDEs, the required per-arm sample size at α=0.05 (two-
  sided) / 80% power from the observed fast-conversion baseline —
  the two-proportion z formula with the z-quantiles as spelled
  literals (no transcendentals at query time).

Determinism: value cents via round(value·100) BIGINT; doubled ranks
and doubled medians keep every order statistic integer (rule 28's
`div` for rank thresholds); per-group rank sums and z-moments are
int64 at every tested SF and < 2^53 (cents ≤ ~5.6e4: Q = Σz2² ≈
2.5e15 at sf1; R2 ≤ 2N² ≈ 2e12), so every double is BIGINT-routed
(rule 30); H and F are shared expression trees with EXPLICIT 5-term
additions (rule 3 — no double SUM across rows); tie-correction cubes
Σ(t³−t) ≤ N³ stay int64 through sf1 (scale note: coarsen the cents
grid past ~sf50); all ppm emissions are BIGINT div BIGINT (rule 29);
division-by-zero and missing-group cases CASE-guarded identically on
both engines.

Scale notes (100 TB): the skyline reduces parts to the ≤|price-grid|
best-point relation map-side (retail price domain ≈ 1.2e5 distinct
cents), so its window is bounded-domain, not data-sized; both stats
tests reduce the fact table to a 5×|cents-grid| histogram (≤ 2.8e5
rows at ANY SF) before any window, join medians back as a 5-row
broadcast, and finish in 1-row selects; the power table is one
user-grain partial-agg plus a 5-row literal grid.

Reference parity: the reference ships min/max/avg-style SQL over its
provider tables (duckdb-sudan- src/sudan_extension.cpp:141-210);
these are the OLAP/stats layer a consumer runs on top, re-expressed
Spark-first per SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# q_pareto_frontier_parts — 2-D skyline: cheapest-for-the-size parts
# ---------------------------------------------------------------------------

PARETO_ORACLE = """
WITH pp AS (
  SELECT CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS sz
  FROM part
), mx AS (
  SELECT price_cents, CAST(MAX(sz) AS BIGINT) AS best_size
  FROM pp GROUP BY price_cents
), pts AS (
  SELECT m.price_cents, m.best_size, CAST(COUNT(*) AS BIGINT) AS n_parts
  FROM mx m JOIN pp ON pp.price_cents = m.price_cents AND pp.sz = m.best_size
  GROUP BY m.price_cents, m.best_size
)
SELECT price_cents, best_size, n_parts
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.price_cents < p.price_cents AND q.best_size >= p.best_size
)
ORDER BY price_cents
"""


@register("q_pareto_frontier_parts", PARETO_ORACLE)
def q_pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (minimize price, maximize size). The oracle is the
    independently-formulated NOT EXISTS dominance anti-join; the Spark
    plan is the O(n log n) reduction: per-price best size (map-side
    partial agg), then a running-max scan over the price-ordered
    best-point relation — a point is on the frontier iff its best
    size strictly exceeds the running max of all strictly-cheaper
    points. The window input is bounded by the retail-price cents
    grid, never by |part|."""
    pp = load_table(spark, sf_dir, "part").select(
        F.expr("CAST(round(p_retailprice * 100) AS BIGINT)").alias("price_cents"),
        F.col("p_size").cast("bigint").alias("sz"),
    )
    mx = pp.groupBy("price_cents").agg(F.max("sz").cast("bigint").alias("best_size"))
    pts = (
        pp.join(mx, ["price_cents"])
        .where(F.col("sz") == F.col("best_size"))
        .groupBy("price_cents", "best_size")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
    )
    # strictly-cheaper running max (exclusive frame); RANGE not ROWS is
    # unnecessary because price_cents is unique after the groupBy
    wprev = Window.orderBy("price_cents").rowsBetween(Window.unboundedPreceding, -1)
    return (
        pts.select(
            "price_cents", "best_size", "n_parts",
            F.max("best_size").over(wprev).alias("prev_best"),
        )
        .where(F.col("prev_best").isNull() | (F.col("best_size") > F.col("prev_best")))
        .select("price_cents", "best_size", "n_parts")
        .orderBy("price_cents")
    )


# ---------------------------------------------------------------------------
# stats_kruskal_wallis — rank-based k-sample test with tie correction
# ---------------------------------------------------------------------------

_KW_GROUPS = ("click", "error", "purchase", "signup", "view")

# doubled-rank-sum terms and the H tree, spelled ONCE so Spark and the
# oracle share the exact IEEE expression text (rule 3: the 5-term
# addition is explicit, never a SUM over rows)
_KW_TERM = {
    g: (
        f"CASE WHEN COALESCE(n_{g}, 0) = 0 THEN 0.0"
        f" ELSE CAST(r2_{g} AS DOUBLE) * CAST(r2_{g} AS DOUBLE)"
        f" / (4.0 * CAST(n_{g} AS DOUBLE)) END"
    )
    for g in _KW_GROUPS
}
_KW_L2 = (
    [f"COALESCE(n_{g}, 0) AS n_{g}" for g in _KW_GROUPS]
    + [f"COALESCE(r2_{g}, 0) AS r2_{g}" for g in _KW_GROUPS]
    + [
        "CAST(" + " + ".join(f"COALESCE(n_{g}, 0)" for g in _KW_GROUPS) + " AS BIGINT) AS n_total",
        "CAST("
        + " + ".join(f"CASE WHEN COALESCE(n_{g}, 0) = 0 THEN 0 ELSE 1 END" for g in _KW_GROUPS)
        + " AS BIGINT) AS k_groups",
        "(" + " + ".join(_KW_TERM[g] for g in _KW_GROUPS) + ") AS rank_term",
        "tie_cubes",
    ]
)
_KW_ND = "CAST(n_total AS DOUBLE)"
_KW_H = f"12.0 * rank_term / ({_KW_ND} * ({_KW_ND} + 1.0)) - 3.0 * ({_KW_ND} + 1.0)"
_KW_L3 = [
    "n_total", "k_groups",
    *[f"n_{g}" for g in _KW_GROUPS],
    *[f"r2_{g}" for g in _KW_GROUPS],
    f"CASE WHEN n_total >= 2 THEN {_KW_H} ELSE CAST(NULL AS DOUBLE) END AS h_stat",
    "CASE WHEN n_total >= 2 AND tie_cubes < n_total * n_total * n_total - n_total"
    f" THEN ({_KW_H}) / (1.0 - CAST(tie_cubes AS DOUBLE)"
    f" / ({_KW_ND} * {_KW_ND} * {_KW_ND} - {_KW_ND}))"
    " ELSE CAST(NULL AS DOUBLE) END AS h_tie_adj",
]

_KW_PIVOT = ", ".join(
    f"MAX(CASE WHEN grp = '{g}' THEN n END) AS n_{g},"
    f" MAX(CASE WHEN grp = '{g}' THEN r2 END) AS r2_{g}"
    for g in _KW_GROUPS
)

KRUSKAL_ORACLE = f"""
WITH x AS (
  SELECT event_type AS grp, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), h AS (
  SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt FROM x GROUP BY cents
), r AS (
  SELECT cents, cnt,
         CAST(2 * (SUM(cnt) OVER (ORDER BY cents) - cnt) + cnt + 1 AS BIGINT) AS rank2
  FROM h
), gc AS (
  SELECT grp, cents, CAST(COUNT(*) AS BIGINT) AS gcnt FROM x GROUP BY grp, cents
), g AS (
  SELECT gc.grp,
         CAST(SUM(gc.gcnt) AS BIGINT) AS n,
         CAST(SUM(gc.gcnt * r.rank2) AS BIGINT) AS r2
  FROM gc JOIN r ON gc.cents = r.cents
  GROUP BY gc.grp
), ties AS (
  SELECT CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_cubes FROM h
), pivoted AS (
  SELECT {_KW_PIVOT}, (SELECT tie_cubes FROM ties) AS tie_cubes FROM g
), l2 AS (
  SELECT {", ".join(_KW_L2)} FROM pivoted
)
SELECT {", ".join(_KW_L3)} FROM l2
"""


@register("stats_kruskal_wallis", KRUSKAL_ORACLE)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H over event value cents by event_type. Ranks
    are computed on the bounded cents-grid histogram (≤ ~5.6e4 rows
    at any SF — the window never sees the fact table); doubled
    average ranks keep every rank integer; the tie-corrected H is a
    shared IEEE tree over exact int64 moments."""
    e = load_table(spark, sf_dir, "events")
    x = e.select(
        F.col("event_type").alias("grp"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    h = x.groupBy("cents").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    wcum = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    r = h.select(
        "cents", "cnt",
        (2 * (F.sum("cnt").over(wcum) - F.col("cnt")) + F.col("cnt") + 1)
        .cast("bigint")
        .alias("rank2"),
    )
    gc = x.groupBy("grp", "cents").agg(F.count(F.lit(1)).cast("bigint").alias("gcnt"))
    g = (
        gc.join(r.select("cents", "rank2"), ["cents"])
        .groupBy("grp")
        .agg(
            F.sum("gcnt").cast("bigint").alias("n"),
            F.sum(F.col("gcnt") * F.col("rank2")).cast("bigint").alias("r2"),
        )
    )
    ties = h.agg(
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("bigint")
        .alias("tie_cubes")
    )
    pivoted = g.agg(
        *[
            c
            for grp in _KW_GROUPS
            for c in (
                F.expr(f"MAX(CASE WHEN grp = '{grp}' THEN n END)").alias(f"n_{grp}"),
                F.expr(f"MAX(CASE WHEN grp = '{grp}' THEN r2 END)").alias(f"r2_{grp}"),
            )
        ]
    ).crossJoin(F.broadcast(ties))
    return pivoted.selectExpr(*_KW_L2).selectExpr(*_KW_L3)


# ---------------------------------------------------------------------------
# stats_levene_bf — Brown–Forsythe variance-homogeneity test
# ---------------------------------------------------------------------------

_BF_MEAN = {g: f"CAST(s_{g} AS DOUBLE) / CAST(n_{g} AS DOUBLE)" for g in _KW_GROUPS}
_BF_GRAND = (
    "(" + " + ".join(f"CAST(COALESCE(s_{g}, 0) AS DOUBLE)" for g in _KW_GROUPS) + ")"
    " / " + _KW_ND
)
_BF_SSB_TERM = {
    g: (
        f"CASE WHEN COALESCE(n_{g}, 0) = 0 THEN 0.0"
        f" ELSE CAST(n_{g} AS DOUBLE) * ({_BF_MEAN[g]} - grand_mean)"
        f" * ({_BF_MEAN[g]} - grand_mean) END"
    )
    for g in _KW_GROUPS
}
_BF_SSW_TERM = {
    g: (
        f"CASE WHEN COALESCE(n_{g}, 0) = 0 THEN 0.0"
        f" ELSE CAST(q_{g} AS DOUBLE)"
        f" - CAST(s_{g} AS DOUBLE) * CAST(s_{g} AS DOUBLE) / CAST(n_{g} AS DOUBLE) END"
    )
    for g in _KW_GROUPS
}
_BF_L2 = (
    [f"COALESCE(n_{g}, 0) AS n_{g}" for g in _KW_GROUPS]
    + [f"COALESCE(med2_{g}, 0) AS med2_{g}" for g in _KW_GROUPS]
    + [f"COALESCE(s_{g}, 0) AS s_{g}" for g in _KW_GROUPS]
    + [f"COALESCE(q_{g}, 0) AS q_{g}" for g in _KW_GROUPS]
    + [
        "CAST(" + " + ".join(f"COALESCE(n_{g}, 0)" for g in _KW_GROUPS) + " AS BIGINT) AS n_total",
        "CAST("
        + " + ".join(f"CASE WHEN COALESCE(n_{g}, 0) = 0 THEN 0 ELSE 1 END" for g in _KW_GROUPS)
        + " AS BIGINT) AS k_groups",
        _BF_GRAND + " AS grand_mean",
    ]
)
_BF_L3 = (
    ["n_total", "k_groups"]
    + [f"n_{g}" for g in _KW_GROUPS]
    + [f"med2_{g}" for g in _KW_GROUPS]
    + [
        "(" + " + ".join(_BF_SSB_TERM[g] for g in _KW_GROUPS) + ") AS ssb",
        "(" + " + ".join(_BF_SSW_TERM[g] for g in _KW_GROUPS) + ") AS ssw",
    ]
)
_BF_L4 = [
    "n_total", "k_groups",
    *[f"n_{g}" for g in _KW_GROUPS],
    *[f"med2_{g}" for g in _KW_GROUPS],
    "ssb", "ssw",
    "CASE WHEN k_groups >= 2 AND n_total > k_groups AND ssw > 0.0"
    " THEN (ssb / (CAST(k_groups AS DOUBLE) - 1.0))"
    " / (ssw / (CAST(n_total AS DOUBLE) - CAST(k_groups AS DOUBLE)))"
    " ELSE CAST(NULL AS DOUBLE) END AS f_stat",
]

_BF_PIVOT = ", ".join(
    f"MAX(CASE WHEN grp = '{g}' THEN n END) AS n_{g},"
    f" MAX(CASE WHEN grp = '{g}' THEN med2 END) AS med2_{g},"
    f" MAX(CASE WHEN grp = '{g}' THEN s END) AS s_{g},"
    f" MAX(CASE WHEN grp = '{g}' THEN q END) AS q_{g}"
    for g in _KW_GROUPS
)

LEVENE_ORACLE = f"""
WITH x AS (
  SELECT event_type AS grp, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), h AS (
  SELECT grp, cents, CAST(COUNT(*) AS BIGINT) AS cnt FROM x GROUP BY grp, cents
), tot AS (
  SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n FROM h GROUP BY grp
), cum AS (
  SELECT grp, cents, cnt,
         CAST(SUM(cnt) OVER (PARTITION BY grp ORDER BY cents) AS BIGINT) AS c
  FROM h
), med AS (
  SELECT c.grp,
         CAST(MIN(CASE WHEN c.c >= (t.n + 1) // 2 THEN c.cents END)
              + MIN(CASE WHEN c.c >= (t.n + 2) // 2 THEN c.cents END) AS BIGINT) AS med2
  FROM cum c JOIN tot t ON c.grp = t.grp
  GROUP BY c.grp
), z AS (
  SELECT x.grp, ABS(2 * x.cents - m.med2) AS z2
  FROM x JOIN med m ON x.grp = m.grp
), mo AS (
  SELECT grp,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(z2) AS BIGINT) AS s,
         CAST(SUM(z2 * z2) AS BIGINT) AS q
  FROM z GROUP BY grp
), withmed AS (
  SELECT mo.grp, mo.n, mo.s, mo.q, med.med2
  FROM mo JOIN med ON mo.grp = med.grp
), pivoted AS (
  SELECT {_BF_PIVOT} FROM withmed
), l2 AS (
  SELECT {", ".join(_BF_L2)} FROM pivoted
), l3 AS (
  SELECT {", ".join(_BF_L3)} FROM l2
)
SELECT {", ".join(_BF_L4)} FROM l3
"""


@register("stats_levene_bf", LEVENE_ORACLE)
def stats_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe F over event value cents by event_type. Group
    medians are exact order statistics off the bounded per-group
    cents histogram (doubled medians stay integer for even counts);
    |2·x − med2| deviations and their moments are exact int64 at
    every tested SF (< 2^53 — rule 30 safe); F is one shared IEEE
    tree with explicit 5-term sums."""
    e = load_table(spark, sf_dir, "events")
    x = e.select(
        F.col("event_type").alias("grp"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    h = x.groupBy("grp", "cents").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    tot = h.groupBy("grp").agg(F.sum("cnt").cast("bigint").alias("n"))
    wg = Window.partitionBy("grp").orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = h.select("grp", "cents", "cnt", F.sum("cnt").over(wg).cast("bigint").alias("c"))
    med = (
        cum.join(tot, ["grp"])
        .groupBy("grp")
        .agg(
            (
                F.min(F.expr("CASE WHEN c >= (n + 1) div 2 THEN cents END"))
                + F.min(F.expr("CASE WHEN c >= (n + 2) div 2 THEN cents END"))
            )
            .cast("bigint")
            .alias("med2")
        )
    )
    z = x.join(F.broadcast(med), ["grp"]).select(
        "grp", F.abs(2 * F.col("cents") - F.col("med2")).alias("z2")
    )
    mo = z.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("z2").cast("bigint").alias("s"),
        F.sum(F.col("z2") * F.col("z2")).cast("bigint").alias("q"),
    )
    withmed = mo.join(med, ["grp"])
    pivoted = withmed.agg(
        *[
            c
            for grp in _KW_GROUPS
            for c in (
                F.expr(f"MAX(CASE WHEN grp = '{grp}' THEN n END)").alias(f"n_{grp}"),
                F.expr(f"MAX(CASE WHEN grp = '{grp}' THEN med2 END)").alias(f"med2_{grp}"),
                F.expr(f"MAX(CASE WHEN grp = '{grp}' THEN s END)").alias(f"s_{grp}"),
                F.expr(f"MAX(CASE WHEN grp = '{grp}' THEN q END)").alias(f"q_{grp}"),
            )
        ]
    )
    l3 = pivoted.selectExpr(*_BF_L2).selectExpr(*_BF_L3)
    return l3.selectExpr(*_BF_L4)


# ---------------------------------------------------------------------------
# ev_power_mde — required per-arm sample size across an MDE grid
# ---------------------------------------------------------------------------

# z_{0.975} + z_{0.80} spelled as literals: no quantile function runs
# at query time, and both engines parse decimal literals to the same
# correctly-rounded doubles (α=0.05 two-sided, 80% power)
_POWER_ZSUM = "(1.959963984540054 + 0.8416212335729143)"
_POWER_MDES = (10000, 25000, 50000, 100000, 200000)
_POWER_P2 = "p1 * (1.0 + CAST(mde_ppm AS DOUBLE) / 1000000.0)"
# the ppm floor-div spells per-engine (`div` vs `//`); everything else
# is shared text
_POWER_EXPRS = [
    "mde_ppm",
    "n_users",
    "n_conv",
    "CAST(1000000 * n_conv {intdiv} n_users AS BIGINT) AS conv_rate_ppm",
    f"CASE WHEN n_conv > 0 AND {_POWER_P2} < 1.0"
    f" THEN CAST(ceil({_POWER_ZSUM} * {_POWER_ZSUM}"
    f" * (p1 * (1.0 - p1) + {_POWER_P2} * (1.0 - {_POWER_P2}))"
    f" / ((({_POWER_P2}) - p1) * (({_POWER_P2}) - p1))) AS BIGINT)"
    " ELSE CAST(NULL AS BIGINT) END AS n_required_per_arm",
]

POWER_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         MIN(CAST(ts AS DATE)) AS first_day,
         MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END) AS fp_day
  FROM events GROUP BY user_id
), base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(CASE WHEN fp_day IS NOT NULL
                        AND date_diff('day', first_day, fp_day) <= 3
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_conv
  FROM u
), grid AS (
  SELECT CAST(mde_ppm AS BIGINT) AS mde_ppm
  FROM (VALUES {", ".join(f"({m})" for m in _POWER_MDES)}) t(mde_ppm)
), joined AS (
  SELECT g.mde_ppm, b.n_users, b.n_conv,
         CAST(b.n_conv AS DOUBLE) / CAST(b.n_users AS DOUBLE) AS p1
  FROM grid g CROSS JOIN base b
)
SELECT {", ".join(e.format(intdiv="//") for e in _POWER_EXPRS)} FROM joined ORDER BY mde_ppm
"""


@register("ev_power_mde", POWER_ORACLE)
def ev_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion power analysis: required n per arm to detect a
    relative lift of mde_ppm on the observed ≤3-day fast-conversion
    baseline at α=0.05 / 80% power. One user-grain partial agg, a
    5-row literal grid, and a shared IEEE tree from exact counts —
    the z-quantile sum is a spelled literal, so no transcendental
    runs at query time."""
    e = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    u = e.groupBy("user_id").agg(
        F.min(day).alias("first_day"),
        F.min(F.when(F.col("event_type") == "purchase", day)).alias("fp_day"),
    )
    base = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(
            F.when(
                F.col("fp_day").isNotNull()
                & (F.datediff("fp_day", "first_day") <= 3),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_conv"),
    )
    grid = spark.range(1).select(
        F.explode(F.array(*[F.lit(m).cast("bigint") for m in _POWER_MDES])).alias("mde_ppm")
    )
    joined = grid.crossJoin(F.broadcast(base)).select(
        "mde_ppm", "n_users", "n_conv",
        (F.col("n_conv").cast("double") / F.col("n_users").cast("double")).alias("p1"),
    )
    return joined.selectExpr(*[e.format(intdiv="div") for e in _POWER_EXPRS]).orderBy("mde_ppm")
