"""Physical-plan-shape assertions — the 100 TB posture, checked.

These don't execute queries; they assert the optimized plan is the one
we'd want on a 1000-executor cluster:

- filters/projections reach the parquet scan (PushedFilters, pruned
  ReadSchema) — a scan reading 11 columns for a 4-column agg is wrong;
- small dims join via BroadcastHashJoin (no shuffle on the build side);
- aggregations are partial (map-side combine: two HashAggregate nodes);
- no plan anywhere degenerates to CartesianProduct (the only sanctioned
  cross join is a broadcast of a 1-row scalar or a tiny query set,
  which Spark plans as BroadcastNestedLoopJoin).
"""

from __future__ import annotations

import contextlib
import io

import pytest

from duckdb_sudan__spark import operators
from duckdb_sudan__spark.operators import QUERIES

from conftest import SF_DIR

operators.load_all()


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q6_filters_pushed_and_columns_pruned(spark):
    plan = plan_of(QUERIES["q6_forecast_revenue"](spark, SF_DIR))
    assert "PushedFilters:" in plan
    # the tight WHERE reaches the scan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].splitlines()[0]
    # projection pruning: the scan must NOT read the unused wide columns
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    for col in ("l_returnflag", "l_linestatus", "l_partkey", "l_orderkey"):
        assert col not in read_schema, f"scan reads unused column {col}"


@pytest.mark.parametrize("key", ["q2_min_cost_supp", "q5_local_supplier", "q9_product_profit"])
def test_dims_are_broadcast(spark, key):
    plan = plan_of(QUERIES[key](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, f"{key}: dims should broadcast, got\n{plan[:2000]}"


def test_q1_has_partial_aggregation(spark):
    plan = plan_of(QUERIES["q1_pricing_summary"](spark, SF_DIR))
    # map-side combine: a partial HashAggregate below the exchange and a
    # final one above it
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_q1_wholestage_codegen(spark):
    # Under AQE the pre-execution plan hides codegen spans, so compile
    # once with AQE off: every q1 stage must be whole-stage-codegen-able
    # (decimal-accumulate sums are codegen-supported expressions).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(QUERIES["q1_pricing_summary"](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # formatted explain marks codegen stages as "[codegen id : N]"
    assert "[codegen id :" in plan


def test_minhash_lsh_is_equi_join(spark):
    plan = plan_of(QUERIES["dedup_minhash_lsh"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # candidate generation joins on (band, bucket) — an equi-join
    assert "band" in plan and "bucket" in plan


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_no_query_plans_a_cartesian_product(spark, key):
    plan = plan_of(QUERIES[key](spark, SF_DIR))
    assert "CartesianProduct" not in plan, f"{key} degenerates to a cartesian product"
