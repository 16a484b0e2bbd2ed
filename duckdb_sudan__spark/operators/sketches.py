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


# ---------------------------------------------------------------------------
# sketch_heavy_hitters — Misra-Gries candidates + exact verify pass
# ---------------------------------------------------------------------------

MG_SLOTS = 50          # per-partition summary size k
HH_FRACTION = 0.02     # report tokens with freq > 2% of their language

def _mg_add(s: dict, t: str, k: int) -> None:
    """One Misra-Gries update: increment if tracked, claim a free slot,
    else decrement-all (dropping zeroed slots). Module-level so the
    frequency guarantee is hypothesis-testable without Spark."""
    if t in s:
        s[t] += 1
    elif len(s) < k:
        s[t] = 1
    else:
        dead = []
        for key in s:
            s[key] -= 1
            if s[key] == 0:
                dead.append(key)
        for key in dead:
            del s[key]


def _misra_gries(tokens, k: int) -> dict:
    s: dict = {}
    for t in tokens:
        _mg_add(s, t, k)
    return s


HEAVY_HITTERS_ORACLE = f"""
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
), totals AS (
  SELECT lang, COUNT(*) AS n_lang FROM tok GROUP BY lang
)
SELECT t.lang, t.tok, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) AS DOUBLE) / CAST(MAX(tt.n_lang) AS DOUBLE) AS freq
FROM tok t JOIN totals tt ON t.lang = tt.lang
GROUP BY t.lang, t.tok
HAVING COUNT(*) > {HH_FRACTION} * MAX(tt.n_lang)
ORDER BY t.lang, n DESC, t.tok
"""


@register("sketch_heavy_hitters", HEAVY_HITTERS_ORACLE)
def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-token heavy hitters via the production two-pass shape:
    a Misra-Gries summary (k=50 slots) per input partition generates
    CANDIDATES, then one exact recount of the candidate set yields the
    final answer. The MG guarantee makes the output exact-deterministic
    despite the sketch: every token with true frequency > n_p/(k+1) in
    a partition survives that partition's summary, so any token with
    GLOBAL freq > n/(k+1) ≈ 2% is guaranteed a candidate — the final
    `freq > 2%` filter then returns exactly the true heavy hitters
    (extra low-count candidates are recounted exactly and filtered),
    which is why this sketch entry CAN carry a SQL oracle while
    HLL/GK cannot. The completeness arithmetic: per (partition, lang)
    stream MG undercounts any token by ≤ n_p/(k+1), so summed over
    partitions a token missed by EVERY summary has global count
    ≤ n_lang/(k+1) = n_lang·0.0196 < the 0.02·n_lang report bar —
    HH_FRACTION > 1/(MG_SLOTS+1) is the load-bearing inequality
    (hypothesis-tested on `_misra_gries` in tests/test_properties.py).
    Scale: the full token stream is only ever scanned (twice,
    map-side); the only shuffled relations are the ≤ k·P candidate
    rows and the per-candidate exact counts — never the whole
    vocabulary."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.split("text", " ")).alias("tok"))

    def mg_partial(batches):
        # one Misra-Gries summary per (partition, lang)
        summaries: dict[str, dict[str, int]] = {}
        for pdf in batches:
            for lang, t in zip(pdf["lang"], pdf["tok"]):
                _mg_add(summaries.setdefault(lang, {}), t, MG_SLOTS)
        rows = [
            {"lang": lang, "tok": t}
            for lang, s in summaries.items()
            for t in s
        ]
        if rows:
            yield pd.DataFrame(rows)

    candidates = tok.mapInPandas(mg_partial, "lang string, tok string").distinct()
    # exact verify pass: recount ONLY the candidates (broadcast — the
    # candidate set is ≤ k · P rows by construction)
    totals = tok.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    exact = (
        tok.join(F.broadcast(candidates), ["lang", "tok"], "leftsemi")
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        exact.join(F.broadcast(totals), "lang")
        .where(F.col("n") > HH_FRACTION * F.col("n_lang"))
        .select(
            "lang", "tok", "n",
            (F.col("n").cast("double") / F.col("n_lang").cast("double")).alias("freq"),
        )
        .orderBy("lang", F.desc("n"), "tok")
    )


# ---------------------------------------------------------------------------
# sketch_hll_partitioned_union — MERGEABLE distinct sketches
# ---------------------------------------------------------------------------

HLL_LG_K = 14  # 2^14 registers — DataSketches default accuracy tier


@register("sketch_hll_partitioned_union")  # rows-only: sketch bytes aren't cross-engine
def sketch_hll_partitioned_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-aggregated-distinct pattern every 100 TB metrics stack
    runs on: per-(type, day) DataSketches HLL sketches built ONCE
    (hll_sketch_agg — in production these persist in a daily rollup
    table), then per-type totals come from hll_union_agg over the
    daily sketches — merging KB-sized register arrays instead of
    re-shuffling every distinct user for every reporting window.
    Mergeability is lossless at fixed lgK (union of the daily register
    arrays equals the registers of a direct whole-type sketch), so the
    unioned estimate must EQUAL the direct single-pass estimate —
    asserted exactly in tests, alongside the usual error bound vs the
    exact count. Plan: one partial-agg shuffle to daily sketches
    (sketches merge map-side), one tiny shuffle of |days| sketches per
    type; the fact table is scanned once per leg."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id", F.lit(HLL_LG_K)).alias("sk"))
    )
    unioned = (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users_unioned"),
            F.count(F.lit(1)).alias("n_daily_sketches"),
        )
    )
    direct = (
        e.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(HLL_LG_K))).alias("approx_users_direct"))
    )
    return (
        unioned.join(direct, "event_type")
        .select("event_type", "n_daily_sketches", "approx_users_unioned", "approx_users_direct")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# sketch_countmin — Count-Min frequency estimates, exact-deterministic
# ---------------------------------------------------------------------------
# The mergeable fixed-size counter table for "how often does X occur"
# at stream/corpus scale: d hash rows x w buckets of bigint counts,
# updated map-side, merged by +. Unlike HLL register bytes, the whole
# construction here is md5-hex integer arithmetic — identical in both
# engines — so the ESTIMATES themselves carry a SQL oracle: estimate =
# min over rows of the bucket counter, always >= the true count.

CMS_ROWS = 4
CMS_WIDTH = 256
CMS_PROBES = 30  # top-N exact tokens, deterministic (n DESC, tok) order

CMS_ORACLE = f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), cms AS (
  SELECT r, CAST(CAST('0x' || substring(md5(CAST(r AS VARCHAR) || '|' || tok), 1, 4) AS INTEGER) % {CMS_WIDTH} AS BIGINT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM tok, unnest([0, 1, 2, 3]) AS t(r)
  GROUP BY r, bucket
), probes AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_n
  FROM tok GROUP BY tok
  ORDER BY exact_n DESC, tok LIMIT {CMS_PROBES}
), est AS (
  SELECT p.tok, p.exact_n, MIN(c.n) AS cms_est
  FROM probes p
  CROSS JOIN unnest([0, 1, 2, 3]) AS t(r)
  JOIN cms c
    ON c.r = t.r
   AND c.bucket = CAST(CAST('0x' || substring(md5(CAST(t.r AS VARCHAR) || '|' || p.tok), 1, 4) AS INTEGER) % {CMS_WIDTH} AS BIGINT)
  GROUP BY p.tok, p.exact_n
)
SELECT tok, exact_n, CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - exact_n AS BIGINT) AS overcount
FROM est
ORDER BY exact_n DESC, tok
"""


def _cms_bucket(r: int, tok_col):
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(str(r)), F.lit("|"), tok_col)), 1, 4), 16, 10
        ).cast("bigint") % CMS_WIDTH
    )


@register("sketch_countmin", CMS_ORACLE)
def sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over the corpus token stream, probed with the
    top-30 exact tokens: build the d x w counter table with ONE
    map-side explode (token -> d (row, bucket) updates) and a
    partial-agg shuffle bounded by d*w = 1024 rows, then answer each
    probe with min over its d buckets. The CM guarantee (estimate >=
    truth; overcount <= 2N/w w.h.p.) is visible in the emitted
    `overcount` column and property-tested. At 100 TB the sketch IS
    the shuffle: a KB-sized mergeable relation regardless of corpus
    size — the frequency analogue of sketch_hll_partitioned_union."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("tok"))
    updates = tok.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(r).alias("r"), _cms_bucket(r, F.col("tok")).alias("bucket"))
                for r in range(CMS_ROWS)
            ])
        ).alias("u")
    ).select(F.col("u.r").alias("r"), F.col("u.bucket").alias("bucket"))
    cms = updates.groupBy("r", "bucket").agg(F.count(F.lit(1)).alias("n"))
    probes = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), "tok")
        .limit(CMS_PROBES)
    )
    probe_buckets = probes.select(
        "tok", "exact_n",
        F.explode(
            F.array(*[
                F.struct(F.lit(r).alias("r"), _cms_bucket(r, F.col("tok")).alias("bucket"))
                for r in range(CMS_ROWS)
            ])
        ).alias("u"),
    ).select("tok", "exact_n", F.col("u.r").alias("r"), F.col("u.bucket").alias("bucket"))
    est = (
        probe_buckets.join(F.broadcast(cms), ["r", "bucket"])
        .groupBy("tok", "exact_n")
        .agg(F.min("n").alias("cms_est"))
    )
    return est.select(
        "tok", "exact_n",
        F.col("cms_est").cast("bigint").alias("cms_est"),
        (F.col("cms_est") - F.col("exact_n")).cast("bigint").alias("overcount"),
    ).orderBy(F.desc("exact_n"), "tok")
