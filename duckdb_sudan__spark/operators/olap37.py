"""r11 wave 29: calibration slope/intercept, Flesch–Kincaid
readability, and the ABC×XYZ inventory matrix.

- ml_calibration_slope is the regression view of calibration (the
  scalar pair behind the reliability diagram; ECE is the binned L1
  view): OLS of the outcome on the predicted probability at ROW
  grain — with per-mille quantization of both axes every moment is an
  exact integer (x ≤ 1000 ⇒ n·Σx² − (Σx)² ≈ n²·var stays inside
  int64 through sf1 — the welch bound), BOTH cross-moment
  accumulators (Σx², Σxy) ride DECIMAL(38,0) so neither wraps at any
  SF (r11 ADVICE: a BIGINT Σxy reaches ~1e18·SF and wraps silently in
  non-ANSI Spark past ~sf5 while DuckDB errors), the cancellation
  rides DECIMAL(38,0) and routes through BIGINT (rule 30), and
  slope/intercept are shared IEEE trees. Perfect
  calibration ⇒ slope 1, intercept 0.
- text_readability_fk is the Flesch–Kincaid grade per language — the
  readability filter LLM pipelines run next to quality scores: words
  = explicit [A-Za-z]+ runs, sentences = [.!?]+ runs (min 1/doc),
  syllables = [aeiouyAEIOUY]+ vowel groups (the standard heuristic),
  all via explicit character classes (never \\w/\\s — the Java-vs-RE2
  class-divergence rule); the grade 0.39·w/s + 11.8·sy/w − 15.59 is
  one shared IEEE tree over corpus-level integer totals, floor-micro.
- q_abc_xyz_cross crosses the revenue axis (ABC by cumulative share;
  the win_pareto_abc thresholds as exact cross-multiplied rational
  compares — 5·cum < 4·tot ⇔ share < 80% — after the r12 sf1 overflow
  gate caught 1e6·cum passing int64 at sf1 on BOTH engines) with
  wave 18's
  variability axis (XYZ by zero-filled yearly-demand CV, squared
  integer compares) into the 9-cell inventory-strategy matrix with
  per-cell part counts and exact revenue.

Determinism: per-mille quantization through round() (rule 8); DECIMAL
cancellations routed through BIGINT (rule 30); regex counts are
integers; ABC thresholds are exact BIGINT cross-multiplications
(equivalent to the floor-ppm compare: floor(1e6·c/t) < k ⇔ 1e6·c <
k·t, reduced to lowest terms — int64-safe through ~sf400,000).

Scale notes (100 TB): the calibration moments are one map-combined
1-row aggregate; readability is a map-only regex projection into a
≤|langs|-cell rollup; ABC×XYZ reduces lineitem at part grain, runs
the cumulative-share window over the part aggregate,
and joins the two class columns part-to-part before a 9-cell rollup
(the raw fact is re-scanned per reduction, never cached — a fact-table
cache is wrong at 100 TB and pollutes unrelated plans in-session).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# ml_calibration_slope — row-grain calibration regression
# ---------------------------------------------------------------------------

_CAL_FINAL = [
    "n",
    "CAST(CAST(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS BIGINT) AS DOUBLE)"
    " / CAST(CAST(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS BIGINT) AS DOUBLE) AS cal_slope",
    "(CAST(sy AS DOUBLE) - (CAST(CAST(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS BIGINT) AS DOUBLE)"
    " / CAST(CAST(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS BIGINT) AS DOUBLE)) * CAST(sx AS DOUBLE))"
    " / CAST(n AS DOUBLE) AS cal_intercept_permille",
]

CAL_SLOPE_ORACLE = """
WITH xy AS (
  SELECT CAST(round(value * 2) AS BIGINT) AS x,
         CASE WHEN event_type = 'purchase' THEN 1000 ELSE 0 END AS y
  FROM events
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
         SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx
  FROM xy
)
SELECT """ + ",\n       ".join(_CAL_FINAL) + "\nFROM m"


@register("ml_calibration_slope", CAL_SLOPE_ORACLE)
def ml_calibration_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    xy = e.selectExpr(
        "CAST(round(value * 2) AS BIGINT) AS x",
        "CASE WHEN event_type = 'purchase' THEN 1000 ELSE 0 END AS y",
    )
    m = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.expr("SUM(CAST(x AS DECIMAL(38,0)) * y)").alias("sxy"),
        F.expr("SUM(CAST(x AS DECIMAL(38,0)) * x)").alias("sxx"),
    )
    return m.selectExpr(*_CAL_FINAL)


# ---------------------------------------------------------------------------
# text_readability_fk — Flesch–Kincaid grade per language
# ---------------------------------------------------------------------------

FK_ORACLE = """
WITH per_doc AS (
  SELECT lang,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS words,
         GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1) AS sentences,
         CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT) AS syllables
  FROM documents
), totals AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(words) AS BIGINT) AS words,
         CAST(SUM(sentences) AS BIGINT) AS sentences,
         CAST(SUM(syllables) AS BIGINT) AS syllables
  FROM per_doc GROUP BY lang
)
SELECT lang, n_docs, words, sentences, syllables,
       CAST(FLOOR(1000000 * (0.39 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
                             + 11.8 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE))
                             - 15.59)) AS BIGINT) AS fk_grade_micro
FROM totals
ORDER BY lang
"""


@register("text_readability_fk", FK_ORACLE)
def text_readability_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.selectExpr(
        "lang",
        "CAST(size(regexp_extract_all(text, '[A-Za-z]+', 0)) AS BIGINT) AS words",
        "GREATEST(CAST(size(regexp_extract_all(text, '[.!?]+', 0)) AS BIGINT), CAST(1 AS BIGINT)) AS sentences",
        "CAST(size(regexp_extract_all(text, '[aeiouyAEIOUY]+', 0)) AS BIGINT) AS syllables",
    )
    totals = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("words").cast("bigint").alias("words"),
        F.sum("sentences").cast("bigint").alias("sentences"),
        F.sum("syllables").cast("bigint").alias("syllables"),
    )
    return totals.selectExpr(
        "lang", "n_docs", "words", "sentences", "syllables",
        "CAST(FLOOR(1000000 * (0.39 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))"
        " + 11.8 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE))"
        " - 15.59)) AS BIGINT) AS fk_grade_micro",
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# q_abc_xyz_cross — the 9-cell inventory-strategy matrix
# ---------------------------------------------------------------------------

ABC_XYZ_ORACLE = """
WITH per_part AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem GROUP BY 1
), abc AS (
  SELECT pk, cents,
         CASE WHEN 5 * SUM(cents) OVER (ORDER BY cents DESC, pk
                    ROWS UNBOUNDED PRECEDING) < 4 * SUM(cents) OVER () THEN 'A'
              WHEN 20 * SUM(cents) OVER (ORDER BY cents DESC, pk
                    ROWS UNBOUNDED PRECEDING) < 19 * SUM(cents) OVER () THEN 'B'
              ELSE 'C' END AS abc_class
  FROM per_part
), pw AS (
  SELECT l_partkey AS pk,
         CAST(date_trunc('year', l_shipdate) AS TIMESTAMP) AS wk,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS d
  FROM lineitem GROUP BY 1, 2
), horizon AS (
  SELECT CAST(COUNT(DISTINCT wk) AS BIGINT) AS w FROM pw
), xyz AS (
  SELECT pk,
         CASE WHEN 4 * (w * q - CAST(s AS DECIMAL(38,0)) * s) < CAST(s AS DECIMAL(38,0)) * s THEN 'X'
              WHEN (w * q - CAST(s AS DECIMAL(38,0)) * s) < CAST(s AS DECIMAL(38,0)) * s THEN 'Y'
              ELSE 'Z' END AS xyz_class
  FROM (SELECT pk, CAST(SUM(d) AS BIGINT) AS s, SUM(CAST(d AS DECIMAL(38,0)) * d) AS q
        FROM pw GROUP BY pk), horizon
)
SELECT abc.abc_class, xyz.xyz_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(abc.cents) AS BIGINT) AS revenue_cents
FROM abc JOIN xyz ON abc.pk = xyz.pk
GROUP BY abc.abc_class, xyz.xyz_class
ORDER BY abc.abc_class, xyz.xyz_class
"""


@register("q_abc_xyz_cross", ABC_XYZ_ORACLE)
def q_abc_xyz_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # NOTE: the two reductions deliberately re-scan parquet rather than
    # cache the raw fact — caching a 100 TB fact is wrong at scale, and
    # a bare-table cache pollutes every later plan that scans lineitem
    # (measured: the q6 pushed-filters plan pin went red in-suite)
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.expr("CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)").alias("cents")
    )
    wcum = Window.orderBy(F.desc("cents"), "pk").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    abc = per_part.select(
        "pk", "cents",
        F.expr(
            "CASE WHEN 5 * SUM(cents) OVER (ORDER BY cents DESC, pk"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            " < 4 * SUM(cents) OVER () THEN 'A'"
            " WHEN 20 * SUM(cents) OVER (ORDER BY cents DESC, pk"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            " < 19 * SUM(cents) OVER () THEN 'B'"
            " ELSE 'C' END"
        ).alias("abc_class"),
    )
    pw = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.date_trunc("year", "l_shipdate").alias("wk"),
    ).agg(F.expr("CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)").alias("d"))
    pw = pw.cache()  # horizon scalar + part moments
    horizon = pw.agg(F.countDistinct("wk").cast("bigint").alias("w"))
    moments = pw.groupBy("pk").agg(
        F.sum("d").cast("bigint").alias("s"),
        F.expr("SUM(CAST(d AS DECIMAL(38,0)) * d)").alias("q"),
    )
    xyz = moments.crossJoin(F.broadcast(horizon)).selectExpr(
        "pk",
        "CASE WHEN 4 * (w * q - CAST(s AS DECIMAL(38,0)) * s) < CAST(s AS DECIMAL(38,0)) * s THEN 'X'"
        " WHEN (w * q - CAST(s AS DECIMAL(38,0)) * s) < CAST(s AS DECIMAL(38,0)) * s THEN 'Y'"
        " ELSE 'Z' END AS xyz_class",
    )
    return (
        abc.join(xyz, "pk")
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
        .orderBy("abc_class", "xyz_class")
    )
