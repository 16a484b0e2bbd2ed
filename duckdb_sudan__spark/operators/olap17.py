"""r9 OLAP wave 1: the dynamic-PIVOT parity entry the r8 verdict named
as the one OLAP-surface hole a DuckDB user would notice.

DuckDB's PIVOT statement (reference engine: the duckdb PIVOT binder)
runs an EAGER first job to enumerate the distinct ON-values, then
binds one output column per value. Spark's `.pivot(col)` WITHOUT an
explicit values list is the same two-job shape: an eager distinct on
the pivot column at analysis time, then the pivoted aggregate. Both
engines therefore derive the output schema FROM THE DATA — the form
pivot_status / pivot_multi_agg deliberately avoid (they pass explicit
IN lists to skip the pre-job); this entry exists to cover the dynamic
form a DuckDB `PIVOT ... ON col` user actually runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# pivot_dynamic — engine-derived IN list (eager two-job form)
# ---------------------------------------------------------------------------
# Column-name parity: DuckDB names each pivoted column by the VALUE
# ('click', 'error', ...); Spark's dynamic pivot does the same, so the
# driver's sort-columns-by-name hash lines up with no aliasing. The
# COUNT cell for an absent (cohort, value) combo is 0 in DuckDB's
# PIVOT and NULL in Spark's — coalesced to 0 over the runtime-derived
# column list (the post-analysis schema IS the distinct job's output,
# so this stays fully dynamic).

PIVOT_DYNAMIC_ORACLE = """
PIVOT (SELECT user_id % 10 AS cohort, event_type, 1 AS one FROM events)
ON event_type USING COUNT(one)
GROUP BY cohort
ORDER BY cohort
"""


@register("pivot_dynamic", PIVOT_DYNAMIC_ORACLE)
def pivot_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic pivot of event counts by (user cohort × event_type):
    `.pivot('event_type')` with NO values list — Spark runs the same
    eager distinct pre-job DuckDB's PIVOT binder runs, and the output
    schema is derived from the data on both engines. Two jobs by
    design (documented in the plan test); the main job is one
    partial-agg shuffle on cohort."""
    e = load_table(spark, sf_dir, "events")
    p = (
        e.select((F.col("user_id") % 10).alias("cohort"), "event_type")
        .groupBy("cohort")
        .pivot("event_type")
        .count()
    )
    vals = sorted(c for c in p.columns if c != "cohort")
    return p.select(
        "cohort", *[F.coalesce(F.col(f"`{c}`"), F.lit(0)).alias(c) for c in vals]
    ).orderBy("cohort")
