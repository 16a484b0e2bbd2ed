"""Approximate (sketch) aggregates — the single-pass, fixed-memory
tier for 100 TB interactive answers.

- sketch_distinct: HyperLogLog++ distinct users per event type
  (`approx_count_distinct`). At scale the sketch merges map-side: one
  shuffle of K sketches instead of a shuffle of every distinct key.
- sketch_quantiles: Greenwald-Khanna `percentile_approx` p50/p95/p99
  of extended price per return flag — no global sort, bounded error.

Both are rows-only driver entries (DuckDB's approx implementations use
different sketch parameters, so cross-engine value hashes can't match);
tests instead bound the relative error against the exact answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table


@register("sketch_distinct")  # rows-only: HLL params differ across engines
def sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


@register("sketch_quantiles")  # rows-only: GK sketch params differ across engines
def sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    pct = F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000)
    return (
        l.groupBy("l_returnflag")
        .agg(
            pct[0].alias("p50"),
            pct[1].alias("p95"),
            pct[2].alias("p99"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )
