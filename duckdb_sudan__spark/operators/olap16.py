"""r8 OLAP/ML wave: cohort LTV curves, event-sequence pattern match,
drawdown, IQR outlier fences, point-in-time training features, map
function parity.

Reference parity: the reference engine (DuckDB core) runs these as
plain SQL over the same tables (window functions:
duckdb/src/function/window/*, regex: re2 via
src/function/scalar/string/regexp.cpp, MAP:
src/function/scalar/map/); each entry's oracle is that SQL. The Spark
forms below are the shuffle-minimal shapes the repo's conventions
prescribe (integer-exact money/time units through the hash gate,
one-shuffle window stacks, aggregate-grain windows instead of
event-grain self-joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

_UM = "CAST(round(value * 1000000) AS BIGINT)"  # exact micro-units (repo convention)

# persisted-relation release lists (module-level handle discipline —
# repeated invocations in one process must not accumulate cached copies)
_LTV_CACHE_HANDLES: list[DataFrame] = []
_IQR_CACHE_HANDLES: list[DataFrame] = []


# ---------------------------------------------------------------------------
# ev_cohort_ltv — cohort lifetime-value curves (cohort week × age week)
# ---------------------------------------------------------------------------

COHORT_LTV_ORACLE = f"""
WITH purchases AS (
  SELECT user_id, ts, {_UM} AS um FROM events WHERE event_type = 'purchase'
), firsts AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
  FROM purchases GROUP BY user_id
), sized AS (
  SELECT cohort_week, COUNT(*) AS n_users FROM firsts GROUP BY cohort_week
), aged AS (
  SELECT f.cohort_week,
         CAST(date_diff('day', CAST(f.cohort_week AS DATE),
                        CAST(date_trunc('week', p.ts) AS DATE)) / 7 AS BIGINT) AS age_weeks,
         SUM(p.um) AS revenue_um
  FROM purchases p JOIN firsts f USING (user_id)
  GROUP BY 1, 2
)
SELECT a.cohort_week, a.age_weeks, s.n_users,
       CAST(a.revenue_um AS BIGINT) AS revenue_um,
       CAST(SUM(a.revenue_um) OVER (PARTITION BY a.cohort_week ORDER BY a.age_weeks
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_revenue_um
FROM aged a JOIN sized s USING (cohort_week)
ORDER BY cohort_week, age_weeks
"""


@register("ev_cohort_ltv", COHORT_LTV_ORACLE)
def ev_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV: users cohorted by first-purchase week, revenue
    accumulated per cohort age (weeks since cohort) — the
    product-analytics curve behind every retention-payback decision.
    Money stays in exact micro-units end-to-end (no fp through the
    hash gate). Plan: the fact table is scanned ONCE into the
    (user, week) grain; firsts, cohort sizes, and the aged revenue
    grain all derive from that aggregate (plan-pinned single scan —
    the naive spelling re-scanned purchases for the firsts side). The
    cumulative window runs on the (cohort, age) AGGREGATE — weeks ×
    cohorts rows, never per-event — and the cohort-size join is a
    broadcast (cohort-week cardinality)."""
    uw = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("week", F.col("ts")).alias("week"))
        .agg(F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).alias("um"))
    )
    # three consumers (firsts, sized-via-firsts, aged) — materialize the
    # compacted user-week grain once (AQE never reuses the exchange
    # across independent consumers; same discipline as
    # cte_reused_aggregate). user×active-week rows: orders of magnitude
    # under event grain at any scale.
    while _LTV_CACHE_HANDLES:
        _LTV_CACHE_HANDLES.pop().unpersist()
    uw = uw.persist()
    _LTV_CACHE_HANDLES.append(uw)
    firsts = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sized = firsts.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("n_users"))
    aged = (
        uw.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("week").cast("date"), F.col("cohort_week").cast("date"))
                / 7
            )
            .cast("bigint")
            .alias("age_weeks"),
        )
        .agg(F.sum("um").alias("revenue_um"))
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        aged.join(F.broadcast(sized), "cohort_week")
        .select(
            "cohort_week",
            "age_weeks",
            "n_users",
            F.col("revenue_um").cast("bigint").alias("revenue_um"),
            F.sum("revenue_um").over(w).cast("bigint").alias("cum_revenue_um"),
        )
        .orderBy("cohort_week", "age_weeks")
    )


# ---------------------------------------------------------------------------
# ev_pattern_match_regex — MATCH_RECOGNIZE-style sequence patterns
# ---------------------------------------------------------------------------
# Each user's journey becomes a character string (one char per event,
# time-ordered) and the funnel pattern is a REGEX over it — the
# poor-engine's MATCH_RECOGNIZE, and the form both engines can run
# identically (re2 / java.util.regex agree on this POSIX-safe
# pattern). Non-overlapping match count = conversion episodes.

_EV_CHARS = "CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p' WHEN 'error' THEN 'e' ELSE 'x' END"
_PATTERN = "v c*p"  # a view, any clicks, then a purchase
_PATTERN_RE = "vc*p"
# Journey bound: only the LAST _JOURNEY_CAP events per user enter the
# collect (row_number DESC <= cap BEFORE the aggregate, both engines),
# so no aggregation buffer ever holds an unbounded bot history. 512 >>
# any served per-user event count, so results are unchanged on the
# corpus; the semantics ("match within the most recent cap events") are
# part of the operator contract.
_JOURNEY_CAP = 512

PATTERN_MATCH_ORACLE = f"""
WITH capped AS (
  SELECT user_id, ts, event_id, {_EV_CHARS} AS ch,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
), seqs AS (
  SELECT user_id,
         string_agg(ch, '' ORDER BY ts, event_id) AS journey
  FROM capped WHERE rn <= {_JOURNEY_CAP} GROUP BY user_id
)
SELECT user_id, journey,
       CAST(length(journey) AS BIGINT) AS seq_len,
       CAST(length(list_filter(regexp_extract_all(journey, '{_PATTERN_RE}'), x -> x != '')) AS BIGINT) AS n_conversions
FROM seqs
WHERE regexp_matches(journey, '{_PATTERN_RE}')
ORDER BY user_id
"""


@register("ev_pattern_match_regex", PATTERN_MATCH_ORACLE)
def ev_pattern_match_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users whose journey matches the view->cart->purchase episode
    regex (see _PATTERN) with the count of non-overlapping conversion
    episodes. ONE shuffle on user_id into
    sort_array(collect_list(struct(ts, event_id, char))) — the
    deterministic-order journey build (ties broken by event_id on
    both engines) — then pure JVM string/regex ops. Scale bound: the
    per-user journey is capped at the LAST _JOURNEY_CAP (512) events
    on BOTH engines via row_number DESC <= cap BEFORE the aggregate,
    so the collect buffer itself is O(cap) per user — a 10^8-event
    bot costs a bounded task, not an executor OOM."""
    e = load_table(spark, sf_dir, "events")
    ch = F.expr(_EV_CHARS)
    wcap = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    seqs = (
        e.select("user_id", "ts", "event_id", ch.alias("ch"))
        .withColumn("rn", F.row_number().over(wcap))
        .where(F.col("rn") <= _JOURNEY_CAP)
        .select("user_id", F.struct(F.col("ts"), F.col("event_id"), F.col("ch")).alias("s"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(F.sort_array(F.collect_list("s")), lambda s: s["ch"]), ""
            ).alias("journey")
        )
    )
    return (
        seqs.where(F.col("journey").rlike(_PATTERN_RE))
        .select(
            "user_id",
            "journey",
            F.length("journey").cast("bigint").alias("seq_len"),
            F.regexp_count("journey", F.lit(_PATTERN_RE)).cast("bigint").alias("n_conversions"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# ts_drawdown — running peak and drawdown of the daily revenue curve
# ---------------------------------------------------------------------------

DRAWDOWN_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         SUM({_UM}) AS day_um
  FROM events GROUP BY 1, 2
), cumd AS (
  SELECT event_type, day, day_um,
         SUM(day_um) OVER (PARTITION BY event_type ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_um
  FROM daily
), curve AS (
  SELECT event_type, day, day_um, cum_um,
         MAX(cum_um) OVER (PARTITION BY event_type ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak_um
  FROM cumd
)
SELECT event_type, day, CAST(day_um AS BIGINT) AS day_um,
       CAST(cum_um AS BIGINT) AS cum_um,
       CAST(peak_um AS BIGINT) AS peak_um,
       CAST(peak_um - cum_um AS BIGINT) AS drawdown_um
FROM curve
ORDER BY event_type, day
"""


@register("ts_drawdown", DRAWDOWN_ORACLE)
def ts_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-drawdown decomposition of the cumulative daily value curve
    per event_type: running total, running peak of that total, and
    the gap — the risk metric every monitoring dashboard computes,
    exact in integer micro-units. peak consumes cum's output, so the
    two Window nodes CANNOT fuse — but they share (partition, order)
    and compile back-to-back over one sort with no exchange between
    (plan-pinned), over the DAILY aggregate (days × types rows); the
    event table pays a single partial-agg shuffle."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).alias("day_um"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("day_um").over(w)
    curve = daily.select(
        "event_type", "day", "day_um",
        cum.alias("cum_um"), F.max(cum).over(w).alias("peak_um"),
    )
    return curve.select(
        "event_type", "day",
        F.col("day_um").cast("bigint").alias("day_um"),
        F.col("cum_um").cast("bigint").alias("cum_um"),
        F.col("peak_um").cast("bigint").alias("peak_um"),
        (F.col("peak_um") - F.col("cum_um")).cast("bigint").alias("drawdown_um"),
    ).orderBy("event_type", "day")


# ---------------------------------------------------------------------------
# ts_outlier_iqr — Tukey fences, all-integer (agg_quantile_multi's
# discrete-quantile trick: the p-quantile is the smallest value whose
# cumulative count reaches ⌈p·n⌉; the 1.5×IQR fences are scaled by 2
# so no fraction ever materializes)
# ---------------------------------------------------------------------------

_CENTS = "CAST(round(value * 100) AS BIGINT)"

OUTLIER_IQR_ORACLE = f"""
WITH counts AS (
  SELECT event_type, {_CENTS} AS cents, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
), cum AS (
  SELECT event_type, cents, cnt,
         SUM(cnt) OVER (PARTITION BY event_type) AS n,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM counts
), q AS (
  SELECT event_type, MAX(n) AS n,
         MIN(CASE WHEN cum * 4 >= n     THEN cents END) AS p25,
         MIN(CASE WHEN cum * 4 >= n * 3 THEN cents END) AS p75
  FROM cum GROUP BY event_type
)
SELECT c.event_type, CAST(q.n AS BIGINT) AS n, q.p25, q.p75,
       CAST(q.p75 - q.p25 AS BIGINT) AS iqr,
       CAST(SUM(CASE WHEN 2 * c.cents < 2 * q.p25 - 3 * (q.p75 - q.p25) THEN c.cnt ELSE 0 END) AS BIGINT) AS n_low,
       CAST(SUM(CASE WHEN 2 * c.cents > 2 * q.p75 + 3 * (q.p75 - q.p25) THEN c.cnt ELSE 0 END) AS BIGINT) AS n_high
FROM counts c JOIN q USING (event_type)
GROUP BY 1, 2, 3, 4, 5
ORDER BY event_type
"""


@register("ts_outlier_iqr", OUTLIER_IQR_ORACLE)
def ts_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier counts per event_type. Everything after the
    one partial-agg shuffle runs on the DOMAIN-BOUNDED (type, cents)
    counts relation, which is cached for its two consumers — the
    fence test re-joins counts to the 1-row-per-type quantile table
    (broadcast), so the raw event table is scanned once (plan-pinned)
    and never windowed. 2·x < 2·p25 − 3·IQR is the fence inequality
    in integers (×2 clears the 1.5 factor)."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    # two consumers (quantile derivation + fence test) — materialize
    # the domain-bounded counts (≤ types × cent values) once
    while _IQR_CACHE_HANDLES:
        _IQR_CACHE_HANDLES.pop().unpersist()
    counts = counts.persist()
    _IQR_CACHE_HANDLES.append(counts)
    w_all = Window.partitionBy("event_type")
    w_cum = w_all.orderBy("cents").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = counts.select(
        "event_type", "cents", "cnt",
        F.sum("cnt").over(w_all).alias("n"),
        F.sum("cnt").over(w_cum).alias("cum"),
    )
    q = cum.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("cum") * 4 >= F.col("n"), F.col("cents"))).alias("p25"),
        F.min(F.when(F.col("cum") * 4 >= F.col("n") * 3, F.col("cents"))).alias("p75"),
    )
    iqr = F.col("p75") - F.col("p25")
    return (
        counts.join(F.broadcast(q), "event_type")
        .groupBy(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            "p25",
            "p75",
            iqr.cast("bigint").alias("iqr"),
        )
        .agg(
            F.sum(
                F.when(2 * F.col("cents") < 2 * F.col("p25") - 3 * iqr, F.col("cnt")).otherwise(0)
            ).cast("bigint").alias("n_low"),
            F.sum(
                F.when(2 * F.col("cents") > 2 * F.col("p75") + 3 * iqr, F.col("cnt")).otherwise(0)
            ).cast("bigint").alias("n_high"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# ml_pointintime_features — leakage-free training-set assembly
# ---------------------------------------------------------------------------
# THE correctness contract of feature engineering for ML: every label
# row (a purchase) gets features computed ONLY from events STRICTLY
# BEFORE the label's timestamp — same-instant and later events are
# leakage. One user-partitioned RANGE window over unix micros
# (UNBOUNDED PRECEDING .. 1 PRECEDING) gives every feature the exact
# strictly-before frame; all features share the one window = one
# shuffle, one sort, one Window node. The feature-store industry calls
# this a point-in-time-correct join; here it needs no join at all.

PIT_FEATURES_ORACLE = f"""
WITH feat AS (
  SELECT event_id, user_id, ts, event_type,
         COUNT(CASE WHEN event_type = 'view'  THEN 1 END)
           OVER w AS n_prior_views,
         COUNT(CASE WHEN event_type = 'click' THEN 1 END)
           OVER w AS n_prior_clicks,
         COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN {_UM} END) OVER w, 0)
           AS prior_purchase_um,
         MAX(epoch_us(ts)) OVER w AS prev_any_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, ts AS label_ts,
       CAST(n_prior_views AS BIGINT) AS n_prior_views,
       CAST(n_prior_clicks AS BIGINT) AS n_prior_clicks,
       CAST(prior_purchase_um AS BIGINT) AS prior_purchase_um,
       CAST(epoch_us(ts) - prev_any_us AS BIGINT) AS recency_us
FROM feat
WHERE event_type = 'purchase'
ORDER BY event_id
"""


@register("ml_pointintime_features", PIT_FEATURES_ORACLE)
def ml_pointintime_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct features for purchase labels: prior view/
    click counts, prior purchase revenue, recency — every aggregate
    over the strictly-before RANGE frame (ties at the label's own
    microsecond are EXCLUDED on both engines: the frame bound is the
    ORDER value, not the row). recency_us is NULL for a user's first
    event — a first-touch label has no recency, and NULL must survive
    the gate (not be COALESCEd away)."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    um = F.round(F.col("value") * 1_000_000).cast("bigint")
    feat = e.select(
        "event_id", "user_id", "ts", "event_type",
        F.count(F.when(F.col("event_type") == "view", 1)).over(w).alias("n_prior_views"),
        F.count(F.when(F.col("event_type") == "click", 1)).over(w).alias("n_prior_clicks"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", um)).over(w), F.lit(0)
        ).alias("prior_purchase_um"),
        F.max(us).over(w).alias("prev_any_us"),
    )
    return (
        feat.where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("label_ts"),
            F.col("n_prior_views").cast("bigint").alias("n_prior_views"),
            F.col("n_prior_clicks").cast("bigint").alias("n_prior_clicks"),
            F.col("prior_purchase_um").cast("bigint").alias("prior_purchase_um"),
            (F.unix_micros("label_ts") - F.col("prev_any_us")).cast("bigint").alias("recency_us"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# map_funcs_parity — the MAP-type function surface (completes the
# str/num/dt/list parity family). Spark builds real MapType values
# (map_from_entries over the aggregate) and exercises size /
# element_at / map_keys / map_values / map_concat; the oracle computes
# the same VALUES from the flat aggregate (both engines' map layouts
# hash differently, so the gate compares the EXTRACTED scalars and the
# key-sorted entry string, never a raw map column).
# ---------------------------------------------------------------------------

MAP_FUNCS_ORACLE = """
WITH flat AS (
  SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
  FROM lineitem GROUP BY 1, 2
)
SELECT l_returnflag,
       CAST(COUNT(*) AS INTEGER) AS map_size,
       CAST(COALESCE(MAX(CASE WHEN l_linestatus = 'F' THEN cnt END), -1) AS BIGINT) AS f_count,
       string_agg(l_linestatus, ',' ORDER BY l_linestatus) AS keys_sorted,
       CAST(SUM(cnt) AS BIGINT) AS values_total,
       string_agg(l_linestatus || ':' || CAST(cnt AS VARCHAR), ',' ORDER BY l_linestatus)
         AS entries_sorted
FROM flat
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("map_funcs_parity", MAP_FUNCS_ORACLE)
def map_funcs_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a real map<string,bigint> per return flag and read every
    scalar back out through the map API: size(), element_at() (with
    the missing-key NULL contract made explicit via coalesce(-1)),
    sorted map_keys(), aggregate() over map_values(), and the
    key-sorted entry rendering. The map is built from the DOMAIN
    aggregate (≤ flags × statuses rows) — map construction never
    touches fact-table grain."""
    l = load_table(spark, sf_dir, "lineitem")
    flat = l.groupBy("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("cnt"))
    m = flat.groupBy("l_returnflag").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct(F.col("l_linestatus"), F.col("cnt"))))
        ).alias("m")
    )
    entries = F.sort_array(F.map_entries(F.col("m")))
    return m.select(
        "l_returnflag",
        F.size("m").alias("map_size"),
        F.coalesce(F.element_at(F.col("m"), F.lit("F")), F.lit(-1)).cast("bigint").alias("f_count"),
        F.array_join(F.sort_array(F.map_keys("m")), ",").alias("keys_sorted"),
        F.aggregate(
            F.map_values("m"), F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("values_total"),
        F.array_join(
            F.transform(entries, lambda kv: F.concat_ws(":", kv["key"], kv["value"].cast("string"))),
            ",",
        ).alias("entries_sorted"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# ev_heatmap_dow_hour — the day-of-week × hour activity grid
# ---------------------------------------------------------------------------
# Calendar-axis parity trap made explicit: Spark dayofweek() is
# 1=Sunday..7 while DuckDB dayofweek() is 0=Sunday..6 — the portable
# spelling is Spark weekday() ≡ DuckDB isodow()-1 (0=Monday..6), which
# is what both sides use here.

HEATMAP_ORACLE = f"""
SELECT CAST(isodow(ts) - 1 AS INTEGER) AS dow,
       CAST(hour(ts) AS INTEGER) AS hod,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM({_UM}) AS BIGINT) AS value_um
FROM events
GROUP BY 1, 2
ORDER BY dow, hod
"""


@register("ev_heatmap_dow_hour", HEATMAP_ORACLE)
def ev_heatmap_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ops-dashboard activity heatmap: events, distinct users and
    exact micro-unit value per (weekday, hour) cell. One partial-agg
    shuffle onto a ≤168-cell grid; the distinct-user count makes it a
    two-phase aggregate (partial dedup on (cell, user) before the
    count) — still map-combinable, never a window."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.weekday("ts").cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hod"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).alias("value_um"),
        )
        .orderBy("dow", "hod")
    )
