"""r6 wave 3: interpolating gap-fill, embedding-space decontamination,
and LTTB series downsampling.

Reference scope: the reference engine's analytics surface (DuckDB SQL,
`src/sudan/*`) covers windowed time-series repair and similarity
filtering generically; these entries re-express three shapes its users
build on that surface — linear interpolation between observed
neighbors (the companion to ts_locf_fill's forward fill), an
eval-embedding contamination screen (the semantic tier of the
decontaminate_* ladder), and largest-triangle-three-buckets
downsampling for dashboard-scale series.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# ts_gapfill_interpolate — linear interpolation between observed days
# ---------------------------------------------------------------------------

INTERP_ORACLE = """
WITH um AS (
  SELECT date_trunc('day', ts) AS day, event_type,
         SUM(CAST(round(value * 1000000) AS BIGINT)) AS s,
         COUNT(*) AS n
  FROM events
  WHERE (day(ts) + length(event_type)) % 4 <> 0
  GROUP BY 1, 2
), bounds AS (
  SELECT MIN(day) AS lo, MAX(day) AS hi FROM um
), days AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
), types AS (
  SELECT DISTINCT event_type FROM um
), grid AS (
  SELECT d.day, t.event_type FROM days d CROSS JOIN types t
), j AS (
  SELECT g.event_type, g.day,
         CAST(u.s AS DOUBLE) / CAST(u.n AS DOUBLE) AS mean_um,
         CASE WHEN u.n IS NOT NULL THEN g.day END AS obs_day
  FROM grid g LEFT JOIN um u USING (day, event_type)
), neigh AS (
  SELECT event_type, day, mean_um,
         last_value(mean_um IGNORE NULLS) OVER wprev AS prev_v,
         last_value(obs_day IGNORE NULLS) OVER wprev AS prev_d,
         first_value(mean_um IGNORE NULLS) OVER wnext AS next_v,
         first_value(obs_day IGNORE NULLS) OVER wnext AS next_d
  FROM j
  WINDOW wprev AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wnext AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, day,
       CASE WHEN mean_um IS NOT NULL THEN mean_um / 1000000.0
            WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
              ((prev_v * CAST(date_diff('day', day, next_d) AS DOUBLE)
                + next_v * CAST(date_diff('day', prev_d, day) AS DOUBLE))
               / CAST(date_diff('day', prev_d, next_d) AS DOUBLE)) / 1000000.0
       END AS value_filled,
       CASE WHEN mean_um IS NOT NULL THEN 'obs'
            WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN 'interp'
            ELSE 'edge' END AS kind
FROM neigh
ORDER BY event_type, day
"""


@register("ts_gapfill_interpolate", INTERP_ORACLE)
def ts_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across daily gaps — the middle rung of the
    series-repair ladder (ts_gapfill_days emits 0s, ts_locf_fill
    carries the last value; interpolation is what metric pipelines
    actually want between sparse observations). Gaps are simulated as
    day-keyed outages — (day-of-month + len(type)) % 4 == 0 days are
    dropped BEFORE aggregation — because gap structure must be
    SF-INVARIANT: thinning by event modulus stops producing gaps the
    moment per-day density outgrows the modulus (measured: no gaps
    left at sf0.1), while an outage pattern keyed on the calendar
    yields the same obs/interp/edge mix at every SF; the per-type
    offset staggers first-observation days so 'edge' rows exist too.

    Bit-stability: the daily metric is an exact integer pair
    (SUM(round(v·1e6)), COUNT) and every double op after that is a
    FIXED sequence repeated verbatim in the oracle — one s/n division,
    the two-product interpolation over exact integer day distances,
    one /1e6 presentation division (the ev_anomaly_zscore discipline).
    Days before the first / after the last observation emit NULL with
    kind='edge' (extrapolation is a policy choice, not a default).

    Plan: ONE data-sized stage (the partial-agg shuffle to the
    day×type aggregate, persisted — it feeds bounds, the type list and
    the grid join, same shape ts_gapfill_days pins in test_plans); the
    grid is calendar × type cardinality (tiny, broadcast), and both
    neighbor frames share (partition, order) so Spark fuses all four
    window expressions into ONE Window node over grid-sized input —
    at 100 TB the window sees ~365k rows, never the fact table."""
    e = load_table(spark, sf_dir, "events").where(
        (F.dayofmonth("ts") + F.length("event_type")) % 4 != 0
    )
    agg = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(
            F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    ).persist()
    bounds = agg.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    days = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    types = agg.select("event_type").distinct()
    grid = F.broadcast(days).crossJoin(F.broadcast(types))
    j = grid.join(agg, ["day", "event_type"], "left").select(
        "event_type",
        "day",
        (F.col("s").cast("double") / F.col("n").cast("double")).alias("mean_um"),
        F.when(F.col("n").isNotNull(), F.col("day")).alias("obs_day"),
    )
    wprev = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wnext = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    neigh = j.select(
        "event_type",
        "day",
        "mean_um",
        F.last("mean_um", ignorenulls=True).over(wprev).alias("prev_v"),
        F.last("obs_day", ignorenulls=True).over(wprev).alias("prev_d"),
        F.first("mean_um", ignorenulls=True).over(wnext).alias("next_v"),
        F.first("obs_day", ignorenulls=True).over(wnext).alias("next_d"),
    )
    interp = (
        (
            F.col("prev_v") * F.datediff("next_d", "day").cast("double")
            + F.col("next_v") * F.datediff("day", "prev_d").cast("double")
        )
        / F.datediff("next_d", "prev_d").cast("double")
    ) / F.lit(1_000_000.0)
    return (
        neigh.select(
            "event_type",
            "day",
            F.when(F.col("mean_um").isNotNull(), F.col("mean_um") / F.lit(1_000_000.0))
            .when(
                F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(), interp
            )
            .alias("value_filled"),
            F.when(F.col("mean_um").isNotNull(), F.lit("obs"))
            .when(F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(), F.lit("interp"))
            .otherwise(F.lit("edge"))
            .alias("kind"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# decontaminate_embedding — semantic eval-contamination screen
# ---------------------------------------------------------------------------

# The eval set is a FIXED slice (modulus + id bound), exactly the
# decontaminate_substring contract: at 100 TB the scan is
# |corpus| × |eval| with |eval| CONSTANT — eval sets don't grow with
# training corpora (SCALING.md measured the unbounded variant of the
# substring tier at 116× wall for 16× data).
DECON_EMB_MOD = 17
DECON_EMB_EVAL_MAX = 5000
# τ tuned to the synthetic random-vector corpus (cos p99 ≈ 0.30,
# max ≈ 0.51): 0.35 flags the extreme tail at every SF while leaving
# both flag values populated. Real corpora would use ~0.9.
DECON_EMB_TAU = 0.35

_DECON_EMB_IS_EVAL = f"(vec_id % {DECON_EMB_MOD} = 0 AND vec_id < {DECON_EMB_EVAL_MAX})"

DECON_EMB_ORACLE = f"""
WITH ev AS (
  SELECT vec_id, embedding FROM embeddings WHERE {_DECON_EMB_IS_EVAL}
), cand AS (
  SELECT c.vec_id,
         list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                CAST(e.embedding AS DOUBLE[])) AS cos
  FROM embeddings c, ev e
  WHERE NOT {_DECON_EMB_IS_EVAL.replace('vec_id', 'c.vec_id')}
)
SELECT vec_id,
       round(MAX(cos), 6) AS max_cos,
       CAST(SUM(CASE WHEN cos >= {DECON_EMB_TAU} THEN 1 ELSE 0 END) AS BIGINT) AS n_eval_hits,
       MAX(cos) >= {DECON_EMB_TAU} AS contaminated
FROM cand
GROUP BY vec_id
ORDER BY vec_id
"""


@register("decontaminate_embedding", DECON_EMB_ORACLE)
def decontaminate_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination — the embedding-space tier of the
    eval-overlap ladder (ngram_overlap = shingle tier, substring =
    verbatim tier): every corpus vector is scored against the FIXED
    eval slice and emits its max eval cosine, the count of eval
    vectors above τ, and the contamination flag. Paraphrased eval
    leakage survives both lexical tiers; this is the screen that
    catches it.

    Plan: the eval matrix is eval-set-sized (bounded by construction)
    and rides to executors as a closed-over driver model — the corpus
    STREAMS through one mapInPandas scorer computing per-row max/count
    INSIDE the Arrow kernel, so the output is one row per corpus
    vector with ZERO shuffle and zero join (ann_range_search posture;
    a pair-explode + groupBy would shuffle |corpus|×|eval| rows for
    nothing). Bit-stability: the kernel reuses the _foldmul_acc /
    _fold_sq_norm sequential folds (bit-identical to DuckDB's
    list_cosine_similarity), max/count aggregate RAW doubles on both
    sides (max commutes with the final round; thresholding pre-round
    avoids boundary flips), and the single round(·,6) happens JVM-side
    on the aggregated max."""
    from duckdb_sudan__spark.operators.similarity import _fold_sq_norm, _foldmul_acc

    e = load_table(spark, sf_dir, "embeddings")
    is_eval = (F.col("vec_id") % DECON_EMB_MOD == 0) & (
        F.col("vec_id") < DECON_EMB_EVAL_MAX
    )
    ev_rows = e.where(is_eval).select("embedding").collect()
    corpus = e.where(~is_eval).select("vec_id", "embedding")
    out_schema = "vec_id long, max_cos double, n_eval_hits long"
    if not ev_rows:
        return spark.createDataFrame([], out_schema + ", contaminated boolean")
    EV = np.array([r.embedding for r in ev_rows], dtype=np.float64)
    ev_norm = np.sqrt(_fold_sq_norm(EV))

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            dots = _foldmul_acc(X, EV)
            denom = np.sqrt(_fold_sq_norm(X))[:, None] * ev_norm[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(denom == 0.0, 0.0, dots / np.where(denom == 0.0, 1.0, denom))
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "max_cos": cos.max(axis=1),
                    "n_eval_hits": (cos >= DECON_EMB_TAU).sum(axis=1).astype(np.int64),
                }
            )

    return (
        corpus.mapInPandas(score, out_schema)
        .select(
            "vec_id",
            F.round(F.col("max_cos"), 6).alias("max_cos"),
            "n_eval_hits",
            (F.col("max_cos") >= DECON_EMB_TAU).alias("contaminated"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# ts_downsample_lttb — largest-triangle-three-buckets downsampling
# ---------------------------------------------------------------------------

LTTB_N_OUT = 30  # points kept per series


def _lttb_select(x: np.ndarray, y: np.ndarray, n_out: int) -> np.ndarray:
    """Indices kept by largest-triangle-three-buckets (Steinarsson
    2013, public algorithm): endpoints fixed; each interior bucket
    keeps the point maximizing the triangle area with the PREVIOUSLY
    SELECTED point and the next bucket's centroid. Sequential by
    construction (each choice depends on the last), which is why this
    runs per-series inside one task rather than as a window. Ties →
    lowest index (np.argmax convention, deterministic)."""
    n = len(x)
    if n_out >= n or n_out < 3:
        return np.arange(n)
    # bucket boundaries over the interior points, endpoints excluded
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    keep = np.empty(n_out, dtype=np.int64)
    keep[0] = 0
    prev = 0
    for b in range(n_out - 2):
        lo, hi = edges[b], edges[b + 1]
        nlo, nhi = (edges[b + 1], edges[b + 2]) if b + 2 <= n_out - 2 else (n - 1, n)
        cx, cy = x[nlo:nhi].mean(), y[nlo:nhi].mean()
        # 2×triangle area with apex candidates in [lo, hi)
        area = np.abs(
            (x[prev] - cx) * (y[lo:hi] - y[prev]) - (x[prev] - x[lo:hi]) * (cy - y[prev])
        )
        prev = lo + int(np.argmax(area))
        keep[b + 1] = prev
    keep[n_out - 1] = n - 1
    return keep


def _lttb_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-series LTTB over the daily-mean points, ordered by day.
    Module-level so the test's independent reference can be compared
    against the exact kernel the operator ships."""
    pdf = pdf.sort_values("day").reset_index(drop=True)
    x = pdf["day"].astype("int64").to_numpy().astype(np.float64)
    y = pdf["mean_value"].to_numpy()
    keep = _lttb_select(x, y, LTTB_N_OUT)
    out = pdf.iloc[keep][["event_type", "day", "mean_value"]].copy()
    out["pt_rank"] = np.arange(len(keep), dtype=np.int64)
    return out


@register("ts_downsample_lttb")  # rows-only: sequential per-series selection
def ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visual series downsampling: each event_type's daily-mean series
    reduced to LTTB_N_OUT points that preserve the visual shape
    (spikes survive; uniform strides would average them away) — the
    standard dashboard/monitoring reduction before plotting millions
    of points. Selection is sequential per series (each kept point
    depends on the previous one), so it is NOT SQL-expressible — the
    per-series kernel runs via applyInPandas and an independent
    reference implementation in tests is the contract.

    Plan: the fact table collapses to daily means first (ONE
    partial-agg shuffle — the only data-sized stage), so the kernel's
    per-group state is calendar-bounded (~365 points/series/year),
    NOT corpus-bounded: at 100 TB each task holds a few KB. The
    applyInPandas groupBy reuses the aggregate's event_type hash
    partitioning."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            (
                F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(1_000_000.0)
            ).alias("mean_value")
        )
    )
    return (
        daily.groupBy("event_type")
        .applyInPandas(
            _lttb_kernel,
            "event_type string, day timestamp, mean_value double, pt_rank long",
        )
        .orderBy("event_type", "pt_rank")
    )


# ---------------------------------------------------------------------------
# win_sliding_median — exact sliding-window median
# ---------------------------------------------------------------------------

SLIDING_MEDIAN_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         SUM(CAST(round(value * 1000000) AS BIGINT)) AS day_um
  FROM events GROUP BY 1, 2
)
SELECT event_type, day,
       CAST(day_um AS DOUBLE) / 1000000.0 AS day_total,
       quantile_cont(CAST(day_um AS DOUBLE), 0.5) OVER
         (PARTITION BY event_type ORDER BY day
          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) / 1000000.0 AS med7
FROM daily
ORDER BY event_type, day
"""


@register("win_sliding_median", SLIDING_MEDIAN_ORACLE)
def win_sliding_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 7-day sliding median of daily totals — the robust trend
    line monitoring dashboards overlay on spiky series (a sliding MEAN
    follows every outlier; the median doesn't). Exactness across
    engines: the daily total is an exact integer (micro-unit SUM), the
    windowed median interpolates the two middle values of ≤7 integers
    — (a+b)/2 on integers < 2^52 is exact in double under BOTH
    engines' interpolation formulas — and the /1e6 presentation
    division is the single shared rounding step.

    Plan: the fact table collapses to the day×type aggregate first
    (ONE partial-agg shuffle — the only data-sized stage); the sliding
    median runs over calendar-bounded input, so the per-frame sort of
    7 values × ~365 rows/type is trivia at any corpus size."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).alias("day_um"))
    )
    # percentile() accepts window frames (median() refuses them) and
    # interpolates the two middle values exactly like quantile_cont
    med = F.expr(
        "percentile(CAST(day_um AS DOUBLE), 0.5) OVER "
        "(PARTITION BY event_type ORDER BY day "
        "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"
    )
    return (
        daily.select(
            "event_type",
            "day",
            (F.col("day_um").cast("double") / F.lit(1_000_000.0)).alias("day_total"),
            (med / F.lit(1_000_000.0)).alias("med7"),
        )
        .orderBy("event_type", "day")
    )
