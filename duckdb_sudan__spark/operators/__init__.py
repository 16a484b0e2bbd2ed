"""Operator registry: every module registers (query, oracle) pairs here."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query, with an
    optional DuckDB oracle SQL (omit for non-SQL-expressible ops —
    the driver then records a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registrations run."""
    from duckdb_sudan__spark.operators import (  # noqa: F401
        analytic,
        dedup,
        graph,
        multimodal,
        olap2,
        olap3,
        olap4,
        olap5,
        olap6,
        olap7,
        olap8,
        olap9,
        olap10,
        olap11,
        olap12,
        olap13,
        olap14,
        olap15,
        olap16,
        olap17,
        olap18,
        olap19,
        olap20,
        olap21,
        olap22,
        olap23,
        olap24,
        olap25,
        olap26,
        olap27,
        olap28,
        olap29,
        olap30,
        olap31,
        olap32,
        olap33,
        olap34,
        olap35,
        olap36,
        olap37,
        olap38,
        olap39,
        olap40,
        olap41,
        relational,
        similarity,
        sketches,
        skew,
        text,
        text2,
        text3,
        text4,
        text5,
        text6,
        timeseries,
    )
    from duckdb_sudan__spark.geo import spatial as geo_spatial  # noqa: F401
    from duckdb_sudan__spark.sources import files as sources_files  # noqa: F401
    from duckdb_sudan__spark.streaming import register as streaming_register  # noqa: F401
    from duckdb_sudan__spark.streaming import sinks as streaming_sinks  # noqa: F401
