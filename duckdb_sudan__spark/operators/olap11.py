"""r6 wave: DuckDB convenience-SQL parity users hit constantly.

DuckDB popularized `GROUP BY ALL` / `ORDER BY ALL` and the star
modifiers `SELECT * EXCLUDE (...) REPLACE (...)` (docs: Friendly SQL).
Spark 4 speaks the first pair natively (GROUP BY ALL since 3.4, same
resolution rule: every non-aggregate select item becomes a grouping
key) and covers the star modifiers with `* EXCEPT (...)` plus
positional `withColumn` replacement — so both entries run the idiom on
BOTH engines rather than emulating it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# groupby_all_sales — GROUP BY ALL / ORDER BY ALL parity
# ---------------------------------------------------------------------------

GROUPBY_ALL_ORACLE = """
SELECT o_orderstatus,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ALL
ORDER BY ALL
"""


@register("groupby_all_sales", GROUPBY_ALL_ORACLE)
def groupby_all_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`GROUP BY ALL` + `ORDER BY ALL` run NATIVELY on both engines —
    the same SQL text modulo dialect casts (both resolve the grouping
    keys from the non-aggregate select items, and ORDER BY ALL sorts by
    every output column left-to-right). The price sum goes through the
    repo's DECIMAL(27,6) accumulator convention, so the final double is
    bit-identical (DETERMINISM.md rule 2). Plan: one pruned scan, one
    partial-agg shuffle on the two derived keys — GROUP BY ALL is sugar,
    Catalyst plans it exactly like the explicit form."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_gba_orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               CAST(year(o_orderdate) AS INT) AS yr,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total_price
        FROM _gba_orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )


# ---------------------------------------------------------------------------
# select_exclude_replace — SELECT * EXCLUDE (...) REPLACE (...) parity
# ---------------------------------------------------------------------------

EXCLUDE_REPLACE_ORACLE = """
SELECT * EXCLUDE (c_name)
         REPLACE (CAST(round(CAST(c_acctbal AS DECIMAL(18,2)), 0) AS BIGINT) AS c_acctbal,
                  upper(c_mktsegment) AS c_mktsegment)
FROM customer
ORDER BY c_custkey
"""


@register("select_exclude_replace", EXCLUDE_REPLACE_ORACLE)
def select_exclude_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB's star modifiers: `* EXCLUDE (c_name)` maps to Spark's
    native `* EXCEPT (c_name)` (same semantics, dialect keyword), and
    `REPLACE (expr AS col)` maps to in-place withColumn substitution
    (identical column set and positions). The replaced expressions are
    decimal-exact on both engines: round() half-away-from-zero on
    DECIMAL(18,2), then CAST BIGINT so the hashed value is an integer
    (raw DECIMAL output renders differently across the two fetch
    modes — DETERMINISM.md), upper() pure ASCII here. Map-only — the star
    modifiers never change the plan shape, which is the point: users
    get projection sugar without a single extra operator."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_ser_customer")
    return (
        spark.sql("SELECT * EXCEPT (c_name) FROM _ser_customer")
        .withColumn("c_acctbal", F.round(F.col("c_acctbal").cast("decimal(18,2)"), 0).cast("bigint"))
        .withColumn("c_mktsegment", F.upper("c_mktsegment"))
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# agg_mad_robust — median + median-absolute-deviation per group
# ---------------------------------------------------------------------------

MAD_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(median(value) AS DOUBLE) AS med,
       CAST(mad(value) AS DOUBLE) AS mad
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("agg_mad_robust", MAD_ORACLE)
def agg_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust location/scale per event_type: median + MAD (the
    outlier-resistant stddev replacement every data-quality monitor
    uses — one corrupt 1e12 value moves mean/stddev arbitrarily, moves
    median/MAD not at all). DuckDB ships mad() natively; Spark composes
    it as percentile(.,0.5) → join the group median back → percentile
    of |x − med|. Determinism: both engines define the even-count
    median as the mean of the two middle values — one rounded add +
    one rounded halving on identical doubles — and |x − med| is a
    single rounded subtract, so the hashed doubles are bit-identical
    (DETERMINISM.md rule 2). Plan: two exact-percentile aggregations
    (sort-based within group) + one BROADCAST join of the tiny
    per-group medians — the fact table shuffles on event_type twice,
    never more; at 100 TB exact percentiles per group are the honest
    cost (approx_percentile is the cheap tier, sketch_quantiles)."""
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(value, 0.5D)").alias("med"),
    )
    return (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("n").alias("n"),
            F.first("med").alias("med"),
            F.expr("percentile(abs(value - med), 0.5D)").alias("mad"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# ev_asof_tolerance — LEFT as-of join with a max-gap tolerance
# ---------------------------------------------------------------------------

ASOF_TOL_MIN = 30  # minutes

ASOF_TOL_ORACLE = f"""
SELECT click_id, user_id, click_ts,
       CASE WHEN gap_micros <= {ASOF_TOL_MIN} * 60 * 1000000 THEN view_ts END AS view_ts,
       CASE WHEN gap_micros <= {ASOF_TOL_MIN} * 60 * 1000000 THEN gap_micros END AS gap_micros
FROM (
  SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts, v.ts AS view_ts,
         CAST(epoch_us(c.ts) - epoch_us(v.ts) AS BIGINT) AS gap_micros
  FROM (SELECT * FROM events WHERE event_type = 'click') c
  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
    ON c.user_id = v.user_id AND c.ts >= v.ts
)
ORDER BY click_id
"""


@register("ev_asof_tolerance", ASOF_TOL_ORACLE)
def ev_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT as-of join with tolerance — pandas merge_asof's
    `tolerance=` / QuestDB's bounded ASOF: every click keeps its row;
    the matched prior view is NULLed when it's farther than 30 minutes
    back. Key property making this a post-filter instead of a
    different join: the as-of match is the LATEST prior view, so if IT
    is outside the tolerance, every other prior view is too — bounded
    as-of ≡ plain as-of + gap CASE. Same union-marker single-shuffle
    plan as ev_asof_join (one window over (user, ts, kind)), LEFT
    semantics by keeping unmatched probe rows."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_type").isin("click", "view"))
    tagged = e.select(
        "event_id", "user_id", "ts",
        F.when(F.col("event_type") == "view", 0).otherwise(1).alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = tagged.withColumn(
        "view_ts", F.last(F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True).over(w)
    )
    gap = F.unix_micros("ts") - F.unix_micros("view_ts")
    within = gap <= ASOF_TOL_MIN * 60 * 1_000_000
    return (
        matched.where(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
            F.when(F.col("view_ts").isNotNull() & within, F.col("view_ts")).alias("view_ts"),
            F.when(F.col("view_ts").isNotNull() & within, gap).alias("gap_micros"),
        )
        .orderBy("click_id")
    )


# ---------------------------------------------------------------------------
# pivot_multi_agg — PIVOT with multiple aggregates per pivot value
# ---------------------------------------------------------------------------

PIVOT_MULTI_ORACLE = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS F_n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) FILTER (o_orderstatus = 'F') AS DOUBLE) AS F_total,
       CAST(COUNT(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS O_n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) FILTER (o_orderstatus = 'O') AS DOUBLE) AS O_total,
       CAST(COUNT(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS P_n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) FILTER (o_orderstatus = 'P') AS DOUBLE) AS P_total
FROM orders
GROUP BY yr
ORDER BY yr
"""


@register("pivot_multi_agg", PIVOT_MULTI_ORACLE)
def pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with MULTIPLE aggregates per pivot value (count + revenue
    per order status) — the form pivot_status doesn't cover: Spark's
    native `pivot(col, values).agg(a1, a2)` emits `{value}_{alias}`
    columns, which the oracle reproduces as FILTERed aggregates with
    the same names. The explicit values list matters at 100 TB:
    omitting it makes Spark run a distinct-values job before planning
    — an extra full scan. Decimal accumulator → double presentation,
    bit-identical (DETERMINISM.md). Pivot cells with NO rows differ
    between the engines — Spark's pivot emits NULL for both aggregates
    while the oracle's COUNT(*) FILTER emits 0 (SUM FILTER stays
    NULL) — so the count columns are coalesced to 0 to pin the
    COUNT-of-empty-set convention on data where a (yr, status) combo
    is absent (true of real TPC-H, where 'P' exists only near the
    1995 cutover). Plan: ONE scan, one partial-agg shuffle on yr; the
    pivot is just 6 conditional aggregates."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.select(
            F.year("o_orderdate").cast("int").alias("yr"),
            "o_orderstatus",
            F.col("o_totalprice").cast("decimal(27,6)").alias("price"),
        )
        .groupBy("yr")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("price").cast("double").alias("total"),
        )
    )
    return piv.select(
        "yr",
        *[
            F.coalesce(F.col(c), F.lit(0)).alias(c) if c.endswith("_n") else F.col(c)
            for c in piv.columns
            if c != "yr"
        ],
    ).orderBy("yr")


# ---------------------------------------------------------------------------
# ev_anomaly_zscore — per-group z-score outliers from exact moments
# ---------------------------------------------------------------------------

Z_CUT = 3.0

ZSCORE_ORACLE = f"""
WITH m AS (
  SELECT event_id, event_type, CAST(round(value * 1000000) AS BIGINT) AS um FROM events
), stats AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(CAST(um AS DECIMAL(38,0))) AS s1,
         SUM(CAST(um AS DECIMAL(38,0)) * CAST(um AS DECIMAL(38,0))) AS s2
  FROM m GROUP BY event_type
), z AS (
  SELECT m.event_id, m.event_type, m.um,
         CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE) AS mean_um,
         sqrt(CAST(s.n * s.s2 - s.s1 * s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE) / CAST(s.n AS DOUBLE)) AS std_um
  FROM m JOIN stats s ON m.event_type = s.event_type
)
SELECT event_id, event_type,
       CAST(um AS DOUBLE) / 1000000.0 AS value,
       (CAST(um AS DOUBLE) - mean_um) / std_um AS zscore
FROM z
WHERE std_um > 0 AND abs((CAST(um AS DOUBLE) - mean_um) / std_um) >= {Z_CUT}
ORDER BY event_id
"""


@register("ev_anomaly_zscore", ZSCORE_ORACLE)
def ev_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score anomaly flags — the parametric companion to
    agg_mad_robust: events whose value sits ≥ 3σ from their type's
    mean. Bit-stability is the whole design: value is integer-scaled
    ONCE (round(v·1e6), exact for identical doubles), mean and
    variance come from exact DECIMAL(38,0) moment sums with the
    n·s2 − s1² cancellation done in decimal (the stats_moments /
    agg_regression pattern — bigint would wrap at this SF), and the
    z-score is a FIXED sequence of exactly-rounded double ops repeated
    verbatim in the oracle. Plan: one partial-agg shuffle for the
    5-row stats relation, broadcast back, map-side z + filter — the
    anomaly scan itself never shuffles."""
    e = load_table(spark, sf_dir, "events")
    m = e.select(
        "event_id", "event_type",
        F.round(F.col("value") * 1_000_000).cast("bigint").alias("um"),
    )
    dec = "decimal(38,0)"
    stats = m.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("um").cast(dec)).alias("s1"),
        F.sum(F.col("um").cast(dec) * F.col("um").cast(dec)).alias("s2"),
    )
    joined = m.join(F.broadcast(stats), "event_type")
    mean_um = F.col("s1").cast("double") / F.col("n").cast("double")
    std_um = F.sqrt(
        (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
        / F.col("n").cast("double")
        / F.col("n").cast("double")
    )
    z = (F.col("um").cast("double") - mean_um) / std_um
    return (
        joined.where((std_um > 0) & (F.abs(z) >= Z_CUT))
        .select(
            "event_id", "event_type",
            (F.col("um").cast("double") / F.lit(1_000_000.0)).alias("value"),
            z.alias("zscore"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# rollup_share_of_parent — hierarchy shares (nation-of-region,
# region-of-total) from one base aggregate
# ---------------------------------------------------------------------------

SHARE_ORACLE = """
WITH base AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS rev_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
), region_t AS (
  SELECT region, SUM(rev_cents) AS rev_cents FROM base GROUP BY region
), grand AS (
  SELECT SUM(rev_cents) AS rev_cents FROM region_t
)
SELECT * FROM (
  SELECT 'nation' AS level, b.region, b.nation,
         CAST(b.rev_cents AS BIGINT) AS rev_cents,
         CAST(b.rev_cents AS DOUBLE) / CAST(rt.rev_cents AS DOUBLE) AS share_of_parent
  FROM base b JOIN region_t rt ON b.region = rt.region
  UNION ALL
  SELECT 'region', rt.region, NULL,
         CAST(rt.rev_cents AS BIGINT),
         CAST(rt.rev_cents AS DOUBLE) / CAST(g.rev_cents AS DOUBLE)
  FROM region_t rt, grand g
)
ORDER BY level, region, nation
"""


@register("rollup_share_of_parent", SHARE_ORACLE)
def rollup_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy contribution analysis — every nation's share of its
    region and every region's share of the total, the drill-down
    normalization ROLLUP alone can't produce (GROUPING SETS gives the
    levels; the SHARE needs each level joined to its parent). Revenue
    is integer cents end-to-end (round(price·100), exact on identical
    doubles); each share is one int/int double division. Plan: ONE
    fact aggregation at the finest level (nation), then the parent
    levels re-aggregate the TINY base relation (≤ |nations| rows) —
    the fact table is scanned and shuffled exactly once, parents are
    broadcast joins; the 1-row grand total crossJoins broadcast-style
    (never a cartesian)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    base = (
        o.select("o_custkey", F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"))
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name", "n_regionkey")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.select("r_regionkey", "r_name")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum("cents").alias("rev_cents"))
        .persist()  # parent levels re-aggregate this tiny relation
    )
    region_t = base.groupBy("region").agg(F.sum("rev_cents").alias("r_rev"))
    grand = region_t.agg(F.sum("r_rev").alias("g_rev"))
    nation_rows = (
        base.join(F.broadcast(region_t), "region")
        .select(
            F.lit("nation").alias("level"), "region", "nation",
            F.col("rev_cents").cast("bigint").alias("rev_cents"),
            (F.col("rev_cents").cast("double") / F.col("r_rev").cast("double")).alias("share_of_parent"),
        )
    )
    region_rows = (
        region_t.crossJoin(F.broadcast(grand))
        .select(
            F.lit("region").alias("level"), "region", F.lit(None).cast("string").alias("nation"),
            F.col("r_rev").cast("bigint").alias("rev_cents"),
            (F.col("r_rev").cast("double") / F.col("g_rev").cast("double")).alias("share_of_parent"),
        )
    )
    return nation_rows.unionByName(region_rows).orderBy("level", "region", "nation")


# ---------------------------------------------------------------------------
# win_gaps_islands — consecutive-day activity islands per user
# ---------------------------------------------------------------------------

GAPS_ISLANDS_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day
  FROM events WHERE user_id < 100
), anchored AS (
  SELECT user_id, day,
         day - to_days(CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER)) AS anchor
  FROM days
)
SELECT user_id, MIN(day) AS island_start, MAX(day) AS island_end,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM anchored
GROUP BY user_id, anchor
ORDER BY user_id, island_start
"""


@register("win_gaps_islands", GAPS_ISLANDS_ORACLE)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands — maximal runs of CONSECUTIVE active days per
    user (streak analytics: retention teams live on this shape). The
    classic row_number anchor trick: day − row_number() is constant
    exactly within a consecutive run, so one window + one groupBy
    finds all islands without self-joins or iteration. Days are
    emitted as TIMESTAMP (DETERMINISM.md: DATE diverges between fetch
    modes). Plan: distinct (user, day) partial-agg shuffle, ONE
    user-partitioned window, one island groupBy — linear, and the
    window key matches the groupBy key so AQE reuses the
    partitioning."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") < 100)
    days = e.select("user_id", F.date_trunc("DAY", "ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    anchored = (
        days.withColumn("rn", F.row_number().over(w).cast("int"))
        .withColumn("anchor", F.expr("day - make_interval(0, 0, 0, rn)"))
        .drop("rn")
    )
    return (
        anchored.groupBy("user_id", "anchor")
        .agg(
            F.min("day").alias("island_start"),
            F.max("day").alias("island_end"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .drop("anchor")
        .select("user_id", "island_start", "island_end", "n_days")
        .orderBy("user_id", "island_start")
    )


# ---------------------------------------------------------------------------
# ev_concurrency_curve — open-session concurrency over time
# ---------------------------------------------------------------------------

CONCURRENCY_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WHERE user_id < 200
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id,
         ts
  FROM flagged
), intervals AS (
  SELECT user_id, session_id, MIN(ts) AS s, MAX(ts) AS e
  FROM sessions GROUP BY user_id, session_id
), points AS (
  SELECT user_id, CAST(session_id AS INTEGER) AS session_id, s AS ts, 1 AS delta FROM intervals
  UNION ALL
  SELECT user_id, CAST(session_id AS INTEGER), e, -1 FROM intervals
)
SELECT ts, delta, user_id, session_id,
       CAST(SUM(delta) OVER (ORDER BY ts, delta, user_id, session_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS concurrency
FROM points
ORDER BY ts, delta, user_id, session_id
"""


@register("ev_concurrency_curve", CONCURRENCY_ORACLE)
def ev_concurrency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-session concurrency curve — how many gap-based sessions
    (the ev_sessionize intervals) are simultaneously open at every
    change point: the capacity-planning statistic behind "peak
    concurrent users". Interval stabbing without a join: each session
    emits (+1 at start, −1 at end) and one running sum over the
    deterministic global order (ts, delta, user, session — ends sort
    before starts at the same instant, a defined convention) yields
    the concurrency level. The global-order window is inherently
    serial but runs over 2·|sessions| tiny rows, not events — the
    same honest cost as win_rolling_regression; per-key variants
    would partition the window."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") < 200)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_prev = e.select("user_id", "ts", "event_id", F.lag("ts").over(w).alias("prev_ts"))
    new_session = F.when(
        F.col("prev_ts").isNull() | (F.col("ts") > F.col("prev_ts") + F.expr("INTERVAL 30 MINUTE")), 1
    ).otherwise(0)
    sessions = with_prev.withColumn("session_id", F.sum(new_session).over(wrun).cast("int"))
    intervals = sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    points = intervals.select(
        "user_id", "session_id", F.col("s").alias("ts"), F.lit(1).alias("delta")
    ).unionByName(
        intervals.select("user_id", "session_id", F.col("e").alias("ts"), F.lit(-1).alias("delta"))
    )
    wg = Window.orderBy("ts", "delta", "user_id", "session_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        points.select(
            "ts", "delta", "user_id", "session_id",
            F.sum("delta").over(wg).cast("bigint").alias("concurrency"),
        )
        .orderBy("ts", "delta", "user_id", "session_id")
    )


# ---------------------------------------------------------------------------
# str_format_parity — printf / padding / repetition scalar surface
# ---------------------------------------------------------------------------

FORMAT_ORACLE = """
SELECT c_custkey,
       printf('%s-%05d', c_mktsegment, c_custkey) AS tag,
       printf('%x', c_custkey * 2654435761 % 4294967296) AS hex_bucket,
       lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_pad,
       rpad(c_mktsegment, 12, '.') AS seg_pad,
       repeat('*', CAST(c_custkey % 5 AS INTEGER)) AS stars,
       reverse(c_mktsegment) AS seg_rev,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_xlat
FROM customer
ORDER BY c_custkey
"""


@register("str_format_parity", FORMAT_ORACLE)
def str_format_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-style formatting parity: DuckDB printf ⇄ Spark format_string
    (both %s/%05d/%x), plus lpad/rpad/repeat/reverse/translate — the
    scalar string surface report builders depend on. All-integer /
    pure-ASCII inputs, so formatting is deterministic; map-only with
    projection pruning to the 3 touched columns."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.format_string("%s-%05d", F.col("c_mktsegment"), F.col("c_custkey")).alias("tag"),
            F.format_string(
                "%x", (F.col("c_custkey") * F.lit(2654435761) % F.lit(4294967296)).cast("bigint")
            ).alias("hex_bucket"),
            F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nation_pad"),
            F.rpad("c_mktsegment", 12, ".").alias("seg_pad"),
            F.repeat(F.lit("*"), (F.col("c_custkey") % 5).cast("int")).alias("stars"),
            F.reverse("c_mktsegment").alias("seg_rev"),
            F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_xlat"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# join_scd2_lookup — point-in-time dimension lookup against SCD2 intervals
# ---------------------------------------------------------------------------

SCD2_LOOKUP_ORACLE = """
WITH dimev AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER w AS prev_type
  FROM events WHERE event_type IN ('signup', 'error') AND user_id % 31 = 0
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), versions AS (
  SELECT user_id, event_type AS status, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM dimev WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       v.status, v.valid_from
FROM (SELECT * FROM events WHERE event_type = 'purchase' AND user_id % 31 = 0) p
LEFT JOIN versions v
  ON p.user_id = v.user_id AND v.valid_from <= p.ts
 AND (v.valid_to IS NULL OR p.ts < v.valid_to)
ORDER BY purchase_id
"""


@register("join_scd2_lookup", SCD2_LOOKUP_ORACLE)
def join_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup — the read side of ev_scd2:
    every purchase is stamped with the account-status version (built
    from signup/error state changes) VALID AT ITS TIMESTAMP; purchases
    before the user's first status event keep NULL (left semantics).
    The oracle joins fact × intervals on BETWEEN; Spark avoids the
    range join entirely — interval validity at ts is exactly "the
    last version start ≤ ts", so one union-marker window (dim change
    points sort before same-ts purchases) resolves the lookup with a
    single shuffle on user_id. At 100 TB this is the difference
    between an O(fact·versions-per-user) interval join and one sorted
    window pass."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") % 31 == 0)
    dim = e.where(F.col("event_type").isin("signup", "error"))
    wd = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        dim.withColumn("prev_type", F.lag("event_type").over(wd))
        .where(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .select(
            "user_id", "ts", "event_id",
            F.lit(0).alias("kind"),
            F.col("event_type").alias("status"),
            F.col("ts").alias("valid_from"),
        )
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.lit(1).alias("kind"),
        F.lit(None).cast("string").alias("status"),
        F.lit(None).cast("timestamp").alias("valid_from"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = changes.unionByName(purchases).select(
        "user_id", "ts", "event_id", "kind",
        F.last("status", ignorenulls=True).over(w).alias("status"),
        F.last("valid_from", ignorenulls=True).over(w).alias("valid_from"),
    )
    return (
        merged.where(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "status",
            "valid_from",
        )
        .orderBy("purchase_id")
    )


# ---------------------------------------------------------------------------
# agg_corr_matrix — pairwise Pearson correlations from exact moments
# ---------------------------------------------------------------------------

CORR_ORACLE = """
WITH m AS (
  SELECT CAST(round(l_quantity * 1000000) AS HUGEINT) AS q,
         CAST(round(l_extendedprice * 1000000) AS HUGEINT) AS p,
         CAST(round(l_discount * 1000000) AS HUGEINT) AS d
  FROM lineitem
), s AS (
  SELECT COUNT(*) AS n,
         SUM(q) AS sq, SUM(p) AS sp, SUM(d) AS sd,
         SUM(q * q) AS sqq, SUM(p * p) AS spp, SUM(d * d) AS sdd,
         SUM(q * p) AS sqp, SUM(q * d) AS sqd, SUM(p * d) AS spd
  FROM m
)
SELECT * FROM (
  SELECT 'quantity' AS var1, 'extendedprice' AS var2, CAST(n AS BIGINT) AS n,
         CAST(n * sqp - sq * sp AS DOUBLE)
           / (sqrt(CAST(n * sqq - sq * sq AS DOUBLE)) * sqrt(CAST(n * spp - sp * sp AS DOUBLE))) AS corr
  FROM s
  UNION ALL
  SELECT 'quantity', 'discount', CAST(n AS BIGINT),
         CAST(n * sqd - sq * sd AS DOUBLE)
           / (sqrt(CAST(n * sqq - sq * sq AS DOUBLE)) * sqrt(CAST(n * sdd - sd * sd AS DOUBLE)))
  FROM s
  UNION ALL
  SELECT 'extendedprice', 'discount', CAST(n AS BIGINT),
         CAST(n * spd - sp * sd AS DOUBLE)
           / (sqrt(CAST(n * spp - sp * sp AS DOUBLE)) * sqrt(CAST(n * sdd - sd * sd AS DOUBLE)))
  FROM s
)
ORDER BY var1, var2
"""


@register("agg_corr_matrix", CORR_ORACLE)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over three lineitem measures
    — the profiling step before feature selection / drift monitoring.
    Built-in corr() accumulates doubles in engine-private order (not
    cross-engine reproducible), so all ten moments come from ONE pass
    of integer-scaled DECIMAL(38,0) sums (the stats_moments pattern:
    micros products reach ~3e24 at sf0.1, decimal never wraps), and
    each correlation is the n·sxy − sx·sy cancellation in decimal with
    a FIXED double op sequence mirrored by the oracle. Plan: one scan,
    one 1-row partial agg, three projections of that row unioned —
    nothing shuffles but 10 numbers."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    m = li.select(
        F.round(F.col("l_quantity") * 1_000_000).cast(dec).alias("q"),
        F.round(F.col("l_extendedprice") * 1_000_000).cast(dec).alias("p"),
        F.round(F.col("l_discount") * 1_000_000).cast(dec).alias("d"),
    )
    s = m.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sq"), F.sum("p").alias("sp"), F.sum("d").alias("sd"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
        F.sum(F.col("p") * F.col("p")).alias("spp"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum(F.col("q") * F.col("p")).alias("sqp"),
        F.sum(F.col("q") * F.col("d")).alias("sqd"),
        F.sum(F.col("p") * F.col("d")).alias("spd"),
    ).persist()

    def corr_row(name1, name2, sxy, sx, sy, sxx, syy):
        num = (F.col("n") * F.col(sxy) - F.col(sx) * F.col(sy)).cast("double")
        den = F.sqrt((F.col("n") * F.col(sxx) - F.col(sx) * F.col(sx)).cast("double")) * F.sqrt(
            (F.col("n") * F.col(syy) - F.col(sy) * F.col(sy)).cast("double")
        )
        return s.select(
            F.lit(name1).alias("var1"), F.lit(name2).alias("var2"),
            F.col("n").cast("bigint").alias("n"),
            (num / den).alias("corr"),
        )

    return (
        corr_row("quantity", "extendedprice", "sqp", "sq", "sp", "sqq", "spp")
        .unionByName(corr_row("quantity", "discount", "sqd", "sq", "sd", "sqq", "sdd"))
        .unionByName(corr_row("extendedprice", "discount", "spd", "sp", "sd", "spp", "sdd"))
        .orderBy("var1", "var2")
    )


# ---------------------------------------------------------------------------
# win_pareto_abc — cumulative-share ABC classification
# ---------------------------------------------------------------------------

ABC_A, ABC_B = 0.5, 0.8

PARETO_ORACLE = f"""
WITH rev AS (
  SELECT l_partkey, SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
  FROM lineitem GROUP BY l_partkey
), ranked AS (
  SELECT l_partkey, cents,
         SUM(cents) OVER (ORDER BY cents DESC, l_partkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents,
         SUM(cents) OVER () AS total_cents
  FROM rev
)
SELECT l_partkey, CAST(cents AS BIGINT) AS cents,
       CAST(cum_cents AS DOUBLE) / CAST(total_cents AS DOUBLE) AS cum_share,
       CASE WHEN CAST(cum_cents AS DOUBLE) / CAST(total_cents AS DOUBLE) <= {ABC_A} THEN 'A'
            WHEN CAST(cum_cents AS DOUBLE) / CAST(total_cents AS DOUBLE) <= {ABC_B} THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked
ORDER BY cents DESC, l_partkey
"""


@register("win_pareto_abc", PARETO_ORACLE)
def win_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC analysis: parts ranked by revenue with cumulative
    share and A/B/C class (top-50%-of-revenue parts are 'A', …) — the
    80/20 inventory-analytics staple. Revenue is exact integer cents;
    cum_share is one int/int double division per row, and the class
    thresholds compare those exact doubles. Plan: one fact aggregation
    to per-part cents, then ONE global-order running sum (the honest
    serial step — it runs over |parts| rows, not lineitem; per-category
    variants would partition it) sharing its sort with the total
    window and the output order."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.select("l_partkey", F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"))
        .groupBy("l_partkey")
        .agg(F.sum("cents").alias("cents"))
    )
    w_run = Window.orderBy(F.desc("cents"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    share = F.col("cum_cents").cast("double") / F.col("total_cents").cast("double")
    return (
        rev.select(
            "l_partkey",
            F.col("cents").cast("bigint").alias("cents"),
            F.sum("cents").over(w_run).alias("cum_cents"),
            F.sum("cents").over(w_all).alias("total_cents"),
        )
        .select(
            "l_partkey", "cents",
            share.alias("cum_share"),
            F.when(share <= ABC_A, "A").when(share <= ABC_B, "B").otherwise("C").alias("abc_class"),
        )
        .orderBy(F.desc("cents"), "l_partkey")
    )


# ---------------------------------------------------------------------------
# ev_funnel_rates — step-conversion summary of the view→click→purchase funnel
# ---------------------------------------------------------------------------

FUNNEL_RATES_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS v_ts FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS c_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.v_ts
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
  GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view_users,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click_users,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase_users,
       CAST((SELECT COUNT(*) FROM c) AS DOUBLE) / CAST((SELECT COUNT(*) FROM v) AS DOUBLE) AS view_to_click,
       CAST((SELECT COUNT(*) FROM p) AS DOUBLE) / CAST((SELECT COUNT(*) FROM c) AS DOUBLE) AS click_to_purchase
"""


@register("ev_funnel_rates", FUNNEL_RATES_ORACLE)
def ev_funnel_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel DASHBOARD number: how many users reached each step of
    view → later click → later purchase, with step conversion rates —
    the aggregate ev_funnel's per-user rows feed. Step timestamps use
    the same first-completion semantics as ev_funnel (first view, first
    click AFTER it, any purchase after THAT). Plan: three per-user
    aggregations, each consuming the previous step's (user, min_ts)
    relation via an equi-join on user_id (AQE broadcasts the shrinking
    step relations), then three 1-row counts crossJoined — broadcast
    1-row sides, never a cartesian. Rates are int/int double
    divisions."""
    e = load_table(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("v_ts"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id").agg(F.min("ts").alias("c_ts"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("c_ts"))
        .select("user_id").distinct()
    )
    nv = v.agg(F.count(F.lit(1)).cast("bigint").alias("n_view_users"))
    nc = c.agg(F.count(F.lit(1)).cast("bigint").alias("n_click_users"))
    np_ = p.agg(F.count(F.lit(1)).cast("bigint").alias("n_purchase_users"))
    return (
        nv.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(np_))
        .select(
            "n_view_users", "n_click_users", "n_purchase_users",
            (F.col("n_click_users").cast("double") / F.col("n_view_users").cast("double")).alias("view_to_click"),
            (F.col("n_purchase_users").cast("double") / F.col("n_click_users").cast("double")).alias("click_to_purchase"),
        )
    )
