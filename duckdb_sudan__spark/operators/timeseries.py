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
