"""Seventh wave of relational/OLAP surface (r5c): IGNORE NULLS
lag/lead parity, regexp_extract_all, and correlated LATERAL top-n.

Reference parity: stock-DuckDB window/regex/join syntax available to
every sudan-extension user (the extension registers only table
functions — src/sudan_extension.cpp:30-44). Regex patterns stay inside
the RE2 ∩ java.util.regex common subset (the text_pii_scrub
precedent), and every window carries a total-order tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# win_ignore_nulls — lag/lead IGNORE NULLS ⇄ last/first over open frames
# ---------------------------------------------------------------------------

WIN_IGNORE_NULLS_ORACLE = """
WITH e AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
  FROM events WHERE user_id % 23 = 0
)
SELECT event_id, user_id, ts, v,
       lag(v IGNORE NULLS)  OVER w AS prev_v,
       lead(v IGNORE NULLS) OVER w AS next_v
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, ts, event_id
"""


@register("win_ignore_nulls", WIN_IGNORE_NULLS_ORACLE)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead IGNORE NULLS parity — the gap-jumping window DuckDB
    spells with a modifier and Spark spells with frames:
    lag(v IGNORE NULLS) ≡ last_value(v, ignoreNulls) over
    [unbounded preceding, 1 preceding] and lead ≡ first_value over
    [1 following, unbounded following] (the same frame identity
    ts_locf_fill uses for forward fill). NULLs are injected
    deterministically (event_id % 7) because the synthetic events have
    none — the operator is pointless on a NULL-free column. One window
    shuffle on user_id serves both directions; (ts, event_id) makes
    the order total."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") % 23 == 0).select(
        "event_id", "user_id", "ts",
        F.when(F.col("event_id") % 7 == 0, None).otherwise(F.col("value")).alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "event_id", "user_id", "ts", "v",
            F.last("v", ignorenulls=True)
            .over(w.rowsBetween(Window.unboundedPreceding, -1))
            .alias("prev_v"),
            F.first("v", ignorenulls=True)
            .over(w.rowsBetween(1, Window.unboundedFollowing))
            .alias("next_v"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


# ---------------------------------------------------------------------------
# str_regex_extract_all — regexp_extract_all + derived list stats
# ---------------------------------------------------------------------------

# RE2 ∩ java.regex subset: character class + bounded repetition only
_LONG_TOKEN_RE = "[a-z]{6,}"

REGEX_EXTRACT_ALL_ORACLE = f"""
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '{_LONG_TOKEN_RE}')) AS INTEGER) AS n_long,
       COALESCE(array_to_string(regexp_extract_all(text, '{_LONG_TOKEN_RE}')[1:3], ','), '') AS first3
FROM documents
WHERE doc_id < 200
ORDER BY doc_id
"""


@register("str_regex_extract_all", REGEX_EXTRACT_ALL_ORACLE)
def str_regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all parity: all matches as a list, plus derived
    list stats (count, first-3 join) so the whole extract→slice→join
    chain is exercised. The pattern stays in the RE2 ∩ java.regex
    subset so both engines match identical spans; a zero-match list
    stringifies to NULL in DuckDB but '' in Spark, so the oracle
    COALESCEs (measured at sf0.01, where 2 short docs have no ≥6-char
    token). Pure map stage — extraction never shuffles; the only
    exchange is the output sort."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    matches = F.expr(f"regexp_extract_all(text, '{_LONG_TOKEN_RE}', 0)")
    return (
        d.select(
            "doc_id",
            F.size(matches).cast("int").alias("n_long"),
            F.array_join(F.slice(matches, 1, 3), ",").alias("first3"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# join_lateral_topn — correlated LATERAL subquery with LIMIT
# ---------------------------------------------------------------------------

JOIN_LATERAL_ORACLE = """
SELECT n.n_name, c.c_name, c.c_acctbal
FROM nation n,
LATERAL (SELECT c_name, c_acctbal FROM customer c
         WHERE c.c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_name LIMIT 2) c
ORDER BY n_name, c_acctbal DESC, c_name
"""


@register("join_lateral_topn", JOIN_LATERAL_ORACLE)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL top-n — "for each nation, its 2 richest
    customers" — written as the SAME `JOIN LATERAL (... ORDER BY ...
    LIMIT 2)` SQL on both engines. Spark's decorrelator compiles it to
    the plan you'd hand-write: a two-phase WindowGroupLimit top-k
    (partial per input partition, final after ONE customer shuffle —
    the skew-safe shape qualify_top_orders pins) joined to a broadcast
    nation; the per-nation re-execution a naive lateral implies never
    happens. Tie-break (c_acctbal DESC, c_name) makes the LIMIT
    deterministic on both engines."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("_lat_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    return spark.sql(
        """
        SELECT n.n_name, c.c_name, c.c_acctbal
        FROM _lat_nation n
        JOIN LATERAL (SELECT c_name, c_acctbal FROM _lat_customer c
                      WHERE c.c_nationkey = n.n_nationkey
                      ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        ORDER BY n_name, c_acctbal DESC, c_name
        """
    )
