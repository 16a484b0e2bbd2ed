"""Time-series join operators Spark lacks natively, re-expressed with
scalable plan shapes (reference engine: DuckDB's ASOF JOIN and
IEJoin-backed range joins over the same `events` table).

- ev_asof_join: backward as-of join (each purchase ↦ the most recent
  view at-or-before it, per user). DuckDB: `ASOF JOIN`. Spark has no
  as-of join; the scalable form is the union-marker trick — tag both
  sides, union, ONE shuffle on user_id, and a running `last(view_ts)`
  window. Linear at 100 TB; no per-row probe joins, no ranges.
- ev_range_join: band join (error → clicks within the next 2 hours,
  per user). DuckDB plans this as an IEJoin; Spark would nested-loop
  it, so the scalable form is bucket-join: floor event times to
  band-width buckets, explode the left side to (bucket, bucket+1), join
  on (user_id, bucket) — every true pair lands in one of the two
  buckets (band width == bucket width), then filter the exact band.
  Candidates are bounded by bucket occupancy, never n².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

ASOF_ORACLE = """
SELECT p.event_id, p.user_id, p.ts AS purchase_ts, v.ts AS view_ts,
       CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS gap_micros
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
ORDER BY p.event_id
"""


@register("ev_asof_join", ASOF_ORACLE)
def ev_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").where(F.col("event_type").isin("purchase", "view"))
    # kind 0 = view (build side), 1 = purchase (probe side); ordering by
    # (ts, kind) makes a view at ts T visible to a purchase at the same
    # T — exactly ASOF's >= bound
    tagged = e.select(
        "event_id",
        "user_id",
        "ts",
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
    return (
        matched.where((F.col("kind") == 1) & F.col("view_ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "view_ts",
            (F.unix_micros("ts") - F.unix_micros("view_ts")).alias("gap_micros"),
        )
        .orderBy("event_id")
    )


RANGE_BAND_SEC = 7200

RANGE_ORACLE = f"""
SELECT a.event_id AS error_id, b.event_id AS click_id, a.user_id,
       CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS gap_micros
FROM (SELECT * FROM events WHERE event_type = 'error') a
JOIN (SELECT * FROM events WHERE event_type = 'click') b
  ON a.user_id = b.user_id
 AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL {RANGE_BAND_SEC} SECOND
ORDER BY error_id, click_id
"""


@register("ev_range_join", RANGE_ORACLE)
def ev_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bucket = lambda c: (F.unix_micros(c) / F.lit(RANGE_BAND_SEC * 1_000_000)).cast("long")  # noqa: E731
    a = (
        e.where(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            "user_id",
            F.col("ts").alias("a_ts"),
            F.explode(F.array(bucket(F.col("ts")), bucket(F.col("ts")) + 1)).alias("bk"),
        )
    )
    b = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        bucket(F.col("ts")).alias("bk"),
    )
    # b carries ONE bucket, a is exploded to (bk, bk+1): every true pair
    # (gap ≤ band == bucket width) meets in exactly one bucket — the
    # equi-join on (user, bucket) is duplicate-free by construction
    return (
        a.join(b, (F.col("user_id") == F.col("b_user")) & (a.bk == b.bk))
        .where((F.col("b_ts") > F.col("a_ts")) & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {RANGE_BAND_SEC} SECOND")))
        .select(
            "error_id",
            "click_id",
            "user_id",
            (F.unix_micros("b_ts") - F.unix_micros("a_ts")).alias("gap_micros"),
        )
        .orderBy("error_id", "click_id")
    )


# ---------------------------------------------------------------------------
# ts_ohlc_hourly — hypertable-style OHLC rollup (the time_bucket +
# first/last aggregation a timescale-ish user runs constantly)
# ---------------------------------------------------------------------------

OHLC_ORACLE = """
WITH ranked AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, value,
         ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_open,
         ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_close
  FROM events
),
agg AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         MAX(value) AS high, MIN(value) AS low, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT a.event_type, a.hour, o.value AS open, a.high, a.low, c.value AS close, a.n_events
FROM agg a
JOIN (SELECT * FROM ranked WHERE rn_open = 1) o
  ON o.event_type IS NOT DISTINCT FROM a.event_type AND o.hour = a.hour
JOIN (SELECT * FROM ranked WHERE rn_close = 1) c
  ON c.event_type IS NOT DISTINCT FROM a.event_type AND c.hour = a.hour
ORDER BY a.event_type, a.hour
"""
# ^ IS NOT DISTINCT FROM keeps NULL event_type groups in the oracle —
# the Spark implementation's groupBy retains NULL keys, and a plain
# equi-join would silently drop them (r5 ADVICE; current testdata has
# no NULL event_type, so values are unchanged).


@register("ts_ohlc_hourly", OHLC_ORACLE)
def ts_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable rollup: open/close via min_by/max_by with a
    (ts, event_id) struct ordering key — ONE window-free partial-agg
    shuffle on (type, hour). The oracle needs two window sorts plus a
    double self-join to express the same thing; the max_by shape is
    what survives 100 TB (map-side combine, no per-group sort). The
    (ts, event_id) composite makes open/close deterministic under
    exact-timestamp ties."""
    e = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.min_by(F.col("value"), key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by(F.col("value"), key).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type", "hour")
    )


# ---------------------------------------------------------------------------
# w4_value_windows — first_value / last_value / nth_value frames
# ---------------------------------------------------------------------------

VALUE_WINDOWS_ORACLE = """
SELECT event_id, user_id, ts,
       first_value(value) OVER w AS first_val,
       last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_val,
       nth_value(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_val
FROM events
WHERE user_id % 101 = 0
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY user_id, ts, event_id
"""


@register("w4_value_windows", VALUE_WINDOWS_ORACLE)
def w4_value_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value frames: all three windows share ONE
    partitioning+ordering, so Catalyst plans a single Exchange + Sort
    and evaluates the frames in one Window operator."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") % 101 == 0)
    running = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    full = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            "ts",
            F.first("value").over(running).alias("first_val"),
            F.last("value").over(full).alias("last_val"),
            F.nth_value("value", 2).over(full).alias("second_val"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


# ---------------------------------------------------------------------------
# ev_retention_cohorts — weekly cohort retention (first-seen cohort ×
# week offset × active users), the standard product-analytics rollup
# ---------------------------------------------------------------------------

RETENTION_ORACLE = """
WITH first_seen AS (
  SELECT user_id, CAST(MIN(date_trunc('week', ts)) AS TIMESTAMP) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week FROM events
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.week) / 7 AS INT) AS week_offset,
       COUNT(*) AS active_users
FROM activity a JOIN first_seen f USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("ev_retention_cohorts", RETENTION_ORACLE)
def ev_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention in ONE fact shuffle: a single groupBy on
    user_id computes the first-seen week AND the distinct active-week
    set together (collect_set dedups (user, week) in the same partial
    agg — bounded by calendar weeks per user, never raw events), then
    a map-side explode feeds the tiny (cohort, offset) rollup. The
    two-relation formulation (first_seen ⋈ distinct activity) the
    oracle spells would shuffle the fact table twice on different keys
    and re-shuffle for the join."""
    e = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", "ts")
    per_user = e.groupBy("user_id").agg(
        F.min(week).alias("cohort_week"),
        F.collect_set(week).alias("weeks"),
    )
    return (
        per_user.select("cohort_week", F.explode("weeks").alias("week"))
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# ev_funnel_windowed — conversion funnel with an attribution window
# ---------------------------------------------------------------------------

FUNNEL_WINDOW_HOURS = 72

FUNNEL_WINDOWED_ORACLE = f"""
WITH v AS (
  SELECT user_id, MIN(ts) AS view_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, v.view_ts, MIN(e.ts) AS click_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.view_ts
    AND e.ts <= v.view_ts + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
  GROUP BY e.user_id, v.view_ts
), p AS (
  SELECT e.user_id, c.view_ts, c.click_ts, MIN(e.ts) AS purchase_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
    AND e.ts <= c.view_ts + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
  GROUP BY e.user_id, c.view_ts, c.click_ts
)
SELECT user_id, view_ts, click_ts, purchase_ts,
       CAST(epoch_us(purchase_ts) - epoch_us(view_ts) AS BIGINT) AS funnel_micros
FROM p
ORDER BY user_id
"""


@register("ev_funnel_windowed", FUNNEL_WINDOWED_ORACLE)
def ev_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-window funnel — ev_funnel's sequential pattern with
    the constraint real attribution uses (72 h here — sized to the sparse synthetic event stream; a real click log would use minutes-to-hours): every step must land within
    FUNNEL_WINDOW_HOURS of the FIRST view, or the journey doesn't
    count (an unbounded funnel credits purchases weeks later; this one
    answers "did the session convert"). Note the window anchors at the
    view for BOTH steps — a per-step gap window would be a different
    (also valid) contract; anchoring is the one streaming watermarks
    can enforce, which keeps this batch form alignable with a
    watermark-bounded streaming twin. Same plan shape as ev_funnel:
    three user-keyed agg+join passes, each pushed-filter scan feeding
    a hash shuffle on user_id — linear at any scale, and the window
    predicate prunes join rows EARLY (the bounded-state property the
    unbounded funnel lacks)."""
    e = load_table(spark, sf_dir, "events")
    win = F.expr(f"INTERVAL {FUNNEL_WINDOW_HOURS} HOUR")
    v = e.where(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("view_ts"))
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where((F.col("ts") > F.col("view_ts")) & (F.col("ts") <= F.col("view_ts") + win))
        .groupBy("user_id", "view_ts")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where((F.col("ts") > F.col("click_ts")) & (F.col("ts") <= F.col("view_ts") + win))
        .groupBy("user_id", "view_ts", "click_ts")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return p.select(
        "user_id", "view_ts", "click_ts", "purchase_ts",
        (F.unix_micros("purchase_ts") - F.unix_micros("view_ts")).cast("bigint").alias("funnel_micros"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# ev_asof_native_oracle — the as-of family checked against DuckDB's
# NATIVE ASOF LEFT JOIN (r7 verdict item 6: the family's other oracles
# use window-emulation SQL, i.e. the repo's own technique transliterated;
# this entry pins parity against the reference engine's OPERATOR itself,
# reference: duckdb ASOF JOIN — src/planner/binder/tableref docs).
# LEFT variant on purpose: the unmatched leg (purchases with no prior
# view) is where emulations usually diverge, and no other family member
# oracles it natively.
# ---------------------------------------------------------------------------

ASOF_NATIVE_ORACLE = """
SELECT p.event_id, p.user_id, p.ts AS purchase_ts, v.ts AS view_ts,
       CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS gap_micros,
       v.ts IS NOT NULL AS matched
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
ORDER BY p.event_id
"""


@register("ev_asof_native_oracle", ASOF_NATIVE_ORACLE)
def ev_asof_native_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of LEFT join: every purchase row survives; view_ts /
    gap_micros are NULL when the user has no view at-or-before. Same
    union-marker single-shuffle plan as ev_asof_join (one window over
    (user_id; ts, kind) — kind 0 = view sorts first at equal ts, which
    is exactly ASOF's >= bound), minus the matched-only filter."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_type").isin("purchase", "view"))
    tagged = e.select(
        "event_id",
        "user_id",
        "ts",
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
    return (
        matched.where(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "view_ts",
            (F.unix_micros("ts") - F.unix_micros("view_ts")).alias("gap_micros"),
            F.col("view_ts").isNotNull().alias("matched"),
        )
        .orderBy("event_id")
    )
