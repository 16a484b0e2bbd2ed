"""r11 wave 21: cost-optimal threshold, A/B sample-ratio-mismatch, and
a compression-ratio quality proxy.

- ml_threshold_cost_curve closes the threshold-picking family
  (best-F1 olap19, PR curve olap18) with the BUSINESS objective: given
  asymmetric error costs (C_FP=1, C_FN=5 — the fraud/abuse shape where
  a miss costs 5× a false alarm), emit expected cost per observed
  score bin and flag the argmin. All integers on the bounded KS bin
  grid; cost literals are part of the statistic's definition.
- ev_ab_srm_check is the experimentation-platform guardrail run before
  ANY A/B readout: did the 50/50 assignment actually split 50/50?
  Assignment = user parity (the deterministic stand-in for the hash
  bucketer); per event-type exposure, the one-df chi-square
  (n₀−n₁)²/n from exact integers, flagged against the 0.05 critical
  value. A true bucketer imbalance shows up here before it poisons
  the lift estimate (ev_ab_test_lift).
- text_compression_ratio is the zlib quality proxy LLM-pipeline
  filters use (near-random text ≈ 1.0, templated/repetitive text →
  0.2-0.5): deflate each doc on the executors (mapInPandas, level 6),
  floor-ppm ratio, per-language ratio-decile histogram. ROWS-ONLY:
  zlib output depends on the library build, so no SQL oracle can
  exist by design — determinism within this environment (same
  zlib) plus the monotonicity property (repetitive < random) is
  asserted in tests/test_llm_ops.py.

Determinism: cost and chi-square are exact-integer statistics (the
chi-square double is one shared IEEE tree; the 3.841459 critical
value is a literal on both sides); the compression entry never enters
an oracle hash.

Scale notes (100 TB): the cost curve pays one map-combined shuffle
into ≤1000 bins and windows only the grid; SRM reduces events to
(type, user-parity) cells map-side — 10 cells total; compression is
embarrassingly parallel map work with a ≤(langs×10)-row rollup.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.operators.olap18 import KS_BIN_SCALE, KS_BINS
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# ml_threshold_cost_curve — expected-cost minimizing threshold
# ---------------------------------------------------------------------------

COST_FP = 1
COST_FN = 5

COST_CURVE_ORACLE = f"""
WITH binned AS (
  SELECT CAST(least({KS_BINS - 1}, floor(value * {KS_BIN_SCALE})) AS INTEGER) AS bin,
         CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS np,
         CAST(COUNT(*) AS BIGINT) AS nt
  FROM events GROUP BY 1
), cum AS (
  SELECT bin,
         SUM(np) OVER (ORDER BY bin DESC) AS tp,
         SUM(nt) OVER (ORDER BY bin DESC) AS pp,
         SUM(np) OVER () AS p
  FROM binned
), costed AS (
  SELECT bin, CAST(tp AS BIGINT) AS tp,
         CAST(pp - tp AS BIGINT) AS fp,
         CAST(p - tp AS BIGINT) AS fn,
         CAST({COST_FP} * (pp - tp) + {COST_FN} * (p - tp) AS BIGINT) AS cost
  FROM cum
)
SELECT bin, tp, fp, fn, cost,
       cost = MIN(cost) OVER () AS is_optimal
FROM costed
ORDER BY bin
"""


@register("ml_threshold_cost_curve", COST_CURVE_ORACLE)
def ml_threshold_cost_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bin_ = F.least(F.lit(KS_BINS - 1), F.floor(F.col("value") * KS_BIN_SCALE)).cast("int")
    binned = (
        e.select((F.col("event_type") == "purchase").alias("pos"), bin_.alias("bin"))
        .groupBy("bin")
        .agg(
            F.count_if(F.col("pos")).cast("bigint").alias("np"),
            F.count(F.lit(1)).cast("bigint").alias("nt"),
        )
    )
    wtop = Window.orderBy(F.desc("bin")).rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    costed = (
        binned.select(
            "bin",
            F.sum("np").over(wtop).alias("tp_raw"),
            F.sum("nt").over(wtop).alias("pp_raw"),
            F.sum("np").over(wall).alias("p_raw"),
        )
        .selectExpr(
            "bin",
            "CAST(tp_raw AS BIGINT) AS tp",
            "CAST(pp_raw - tp_raw AS BIGINT) AS fp",
            "CAST(p_raw - tp_raw AS BIGINT) AS fn",
            f"CAST({COST_FP} * (pp_raw - tp_raw) + {COST_FN} * (p_raw - tp_raw) AS BIGINT) AS cost",
        )
    )
    return costed.select(
        "bin", "tp", "fp", "fn", "cost",
        (F.col("cost") == F.min("cost").over(wall)).alias("is_optimal"),
    ).orderBy("bin")


# ---------------------------------------------------------------------------
# ev_ab_srm_check — sample-ratio mismatch guardrail per event type
# ---------------------------------------------------------------------------
# Exposure grain: distinct (type, user). Arm = user parity. One-df
# chi-square (n0−n1)²/(n0+n1) — the exact-integer reduction of
# Σ(obs−n/2)²/(n/2) for two arms. Critical value 3.841459 (α=0.05)
# as an identical literal.

SRM_ORACLE = """
WITH exposure AS (
  SELECT DISTINCT event_type, user_id, user_id % 2 AS arm
  FROM events
), cells AS (
  SELECT event_type,
         CAST(COUNT(*) FILTER (arm = 0) AS BIGINT) AS n0,
         CAST(COUNT(*) FILTER (arm = 1) AS BIGINT) AS n1
  FROM exposure GROUP BY event_type
)
SELECT event_type, n0, n1,
       CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / CAST(n0 + n1 AS DOUBLE) AS chi2,
       CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / CAST(n0 + n1 AS DOUBLE) > 3.841459 AS srm_flag
FROM cells
ORDER BY event_type
"""


@register("ev_ab_srm_check", SRM_ORACLE)
def ev_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    exposure = e.select(
        "event_type", "user_id", (F.col("user_id") % 2).alias("arm")
    ).distinct()
    cells = exposure.groupBy("event_type").agg(
        F.count_if(F.col("arm") == 0).cast("bigint").alias("n0"),
        F.count_if(F.col("arm") == 1).cast("bigint").alias("n1"),
    )
    return cells.selectExpr(
        "event_type", "n0", "n1",
        "CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / CAST(n0 + n1 AS DOUBLE) AS chi2",
        "CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / CAST(n0 + n1 AS DOUBLE) > 3.841459 AS srm_flag",
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# text_compression_ratio — zlib deflate ratio as a quality proxy
# ---------------------------------------------------------------------------

COMP_OUT_SCHEMA = "lang STRING, ratio_decile INT, n_docs BIGINT, sum_ratio_ppm BIGINT"


def _compress_ratio(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Executor-side deflate: ratio_ppm = 1e6·compressed//raw (UTF-8
    bytes, zlib level 6). Emits partial (lang, decile) cells so the
    shuffle carries ≤ langs×10 rows per task, not per-doc rows."""
    import zlib  # noqa: PLC0415 — runs on executors

    for pdf in batches:
        rows = []
        for lang, text in zip(pdf["lang"], pdf["text"]):
            raw = text.encode("utf-8")
            if not raw:
                continue
            ratio_ppm = 1_000_000 * len(zlib.compress(raw, 6)) // len(raw)
            rows.append((lang, min(9, ratio_ppm * 10 // 1_000_000), ratio_ppm))
        if rows:
            cells = pd.DataFrame(rows, columns=["lang", "ratio_decile", "ratio_ppm"])
            agg = cells.groupby(["lang", "ratio_decile"], as_index=False).agg(
                n_docs=("ratio_ppm", "size"), sum_ratio_ppm=("ratio_ppm", "sum")
            )
            agg["ratio_decile"] = agg["ratio_decile"].astype("int32")
            yield agg


@register("text_compression_ratio")  # rows-only: zlib output is library-build-specific
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language histogram of zlib deflate ratios (the redundancy
    quality proxy: templated/boilerplate docs compress far below 1.0).
    No SQL oracle CAN exist — deflate bytes depend on the zlib build —
    so the entry is rows-only with in-environment determinism and
    monotonicity (repetitive < random) asserted in tests."""
    d = load_table(spark, sf_dir, "documents")
    partial = d.select("lang", "text").mapInPandas(_compress_ratio, COMP_OUT_SCHEMA)
    return (
        partial.groupBy("lang", "ratio_decile")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("sum_ratio_ppm").cast("bigint").alias("sum_ratio_ppm"),
        )
        .orderBy("lang", "ratio_decile")
    )
