"""r12 wave 1: cohort retention triangle, market-basket pair lift,
exact rank-based AUC, and bigram conditional entropy.

- q_cohort_retention_triangle is the subscription-analytics classic
  the growth-accounting / DAU entries don't cover: customers cohorted
  by FIRST-order month, activity counted per (cohort, months-since)
  cell, retention as floor-ppm of the cohort size. Month arithmetic
  runs on the integer month index y·12+m (never months_between — its
  fractional day semantics diverge across engines), and the index is
  decomposed back to (year, month) with nonneg BIGINT div/% (rule 29:
  integer // truncates identically on both engines).
- q_market_basket_pairs is the co-occurrence/affinity operator at
  ORDER grain (text_collocation_lift's twin over baskets instead of
  token windows): distinct (order, brand) pairs within an order,
  support counts, and lift = P(ab)/(P(a)P(b)) emitted as floor-ppm
  via the BIGINT-routed double-floor idiom (all four counts are
  < 2^53 at any plausible SF; a pure-int64 1e6·n_ab·N product would
  wrap past ~sf100 — the r12 sf1-overflow-gate lesson applied at
  design time).
- ml_auc_exact_rank is the EXACT Mann-Whitney AUC (the binned ROC
  entry's exact complement): per-mille score grid, U-statistic in
  2x units (2·pos·neg_below + pos·neg ties term — all integer), AUC
  floor-ppm from the shared IEEE double tree. Tie handling is the
  standard 1/2 credit, exact in the 2x integer form.
- text_bigram_cond_entropy is the next-token-predictability measure
  (the conditional complement of agg_entropy_bits' unigram mix
  entropy): H(w2|w1) in the same log-free bitlen surrogate —
  Σ_x c(x)·bitlen(c(x)) − Σ_xy c(xy)·bitlen(c(xy)), all BIGINT
  (surprisal log2(c(x)/c(xy)) ≈ bitlen diff within 1 bit/term);
  c(x) is derived FROM the bigram table so Σ_y c(xy) = c(x) holds
  exactly.

Determinism: month indices, basket counts, U-statistics and bitlen
sums are exact integers; the two ppm emissions are BIGINT-routed
shared IEEE trees (rule 30) with one terminal FLOOR; retention ppm is
nonneg BIGINT // BIGINT (rule 29).

Scale notes (100 TB): the cohort triangle pays ONE customer-grain
shuffle (collect_set of month indices, bounded by calendar months per
key) and explodes the distinct (cohort, age) cells map-side — the
month×age result is bounded by calendar²; baskets pay ONE order-grain shuffle
(collect_set bounded by |brands| per key) and generate the i<j pairs
MAP-SIDE from the sorted set (A/B: 3× faster than the ob⋈ob self-join
at sf1 rows), with every later op on the ≤|brands|² pair relation;
the AUC grid reduces
the corpus map-side into ≤2001 per-mille cells and windows only the
grid; the entropy scan is one bigram explode → (w1,w2) partial-agg
shuffle, with the context rollup re-aggregating the count table, not
the corpus.

Reference parity: the reference ships min/max/avg-style SQL over its
provider tables (duckdb-sudan- src/sudan_extension.cpp:141-210);
these are the OLAP layer a consumer runs on top, re-expressed
Spark-first per SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# q_cohort_retention_triangle — cohort-month × age retention matrix
# ---------------------------------------------------------------------------

COHORT_ORACLE = """
WITH fo AS (
  SELECT o_custkey AS ck,
         CAST(MIN(year(o_orderdate) * 12 + month(o_orderdate)) AS BIGINT) AS cm
  FROM orders GROUP BY 1
), act AS (
  SELECT fo.cm,
         CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - fo.cm AS BIGINT) AS age,
         o.o_custkey AS ck
  FROM orders o JOIN fo ON o.o_custkey = fo.ck
  GROUP BY 1, 2, 3
), tri AS (
  SELECT cm, age, CAST(COUNT(*) AS BIGINT) AS active_customers
  FROM act GROUP BY 1, 2
), cs AS (
  SELECT cm, CAST(COUNT(*) AS BIGINT) AS cohort_size FROM fo GROUP BY 1
)
SELECT CAST((tri.cm - 1) // 12 AS BIGINT) AS cohort_year,
       CAST((tri.cm - 1) % 12 + 1 AS BIGINT) AS cohort_month,
       tri.age AS age_months,
       tri.active_customers,
       cs.cohort_size,
       CAST(1000000 * tri.active_customers // cs.cohort_size AS BIGINT) AS retention_ppm
FROM tri JOIN cs ON tri.cm = cs.cm
ORDER BY cohort_year, cohort_month, age_months
"""


@register("q_cohort_retention_triangle", COHORT_ORACLE)
def q_cohort_retention_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE customer-grain shuffle: collect_set of month indices per
    customer — per-key state is bounded by the CALENDAR, not the data:
    one int64 per distinct active month, so ~84 at the sf1 corpus's
    7-year window and ~360 even at a 30-year production horizon
    (~3 KB/customer worst case; same explicit-bound discipline as
    q_market_basket_pairs' |brands|) — then
    cohort = array_min and the distinct (cohort, age) cells explode
    MAP-SIDE; cohort sizes are the age=0 cells of the same relation.
    A/B-measured at sf1 rows against the first-order-join + DISTINCT
    formulation (3 shuffles): 1.5 s vs 2.3 s, identical 2646 rows."""
    o = load_table(spark, sf_dir, "orders")
    months = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("bigint").alias("m"),
    )
    per_cust = months.groupBy("o_custkey").agg(F.collect_set("m").alias("ms"))
    # compute the O(m) array_min ONCE per customer and reference the
    # outer column inside the lambda (r12 review: array_min inside the
    # transform re-scans the array per element — O(m²) per customer)
    cells = per_cust.select(F.expr("array_min(ms)").alias("cm"), "ms").select(
        "cm",
        F.explode(F.expr("transform(ms, x -> x - cm)")).alias("age"),
    )
    tri = cells.groupBy("cm", "age").agg(
        F.count(F.lit(1)).cast("bigint").alias("active_customers")
    )
    # r15: tri is consumed twice (join left side + the cs broadcast
    # branch) — unpersisted, the customer-grain collect_set aggregate
    # and explode compiled and ran once per consumer (the r14 after-plan
    # was structurally unchanged: Exchange 6->6, ObjHashAgg 4->4).
    # localCheckpoint the calendar-bounded triangle (≤ months² rows) so
    # the heavy aggregate runs exactly once (guide §2.4/§5).
    tri = tri.localCheckpoint()
    # r14: cohort size ≡ the age-0 cell of the SAME triangle (every
    # customer is active in their own cohort month, so the age-0 row
    # counts exactly the cohort's customers). Deriving cs from tri's
    # calendar-bounded output removes the second consumer of the
    # customer-grain collect_set aggregate — the r13 shape re-ran the
    # per-customer aggregation + explode for the cs branch (the
    # exchange was reused but the ObjectHashAggregate pass was not).
    cs = tri.where(F.col("age") == 0).select(
        "cm", F.col("active_customers").alias("cohort_size")
    )
    # the cohort-size side is calendar-bounded (months) — broadcast it
    return (
        tri.join(F.broadcast(cs), "cm")
        .selectExpr(
            "CAST((cm - 1) div 12 AS BIGINT) AS cohort_year",
            "CAST((cm - 1) % 12 + 1 AS BIGINT) AS cohort_month",
            "age AS age_months",
            "active_customers",
            "cohort_size",
            "CAST(1000000 * active_customers div cohort_size AS BIGINT) AS retention_ppm",
        )
        .orderBy("cohort_year", "cohort_month", "age_months")
    )


# ---------------------------------------------------------------------------
# q_market_basket_pairs — within-order brand co-occurrence and lift
# ---------------------------------------------------------------------------

BASKET_ORACLE = """
WITH ob AS (
  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), tot AS (
  SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM ob
), bn AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS nb FROM ob GROUP BY b
), pairs AS (
  SELECT x.b AS brand_a, y.b AS brand_b, CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM ob x JOIN ob y ON x.ok = y.ok AND x.b < y.b
  GROUP BY 1, 2
)
SELECT pairs.brand_a, pairs.brand_b, pairs.n_ab,
       na.nb AS n_a, nc.nb AS n_b, tot.n_orders,
       CAST(FLOOR((1000000.0 * CAST(pairs.n_ab AS DOUBLE) * CAST(tot.n_orders AS DOUBLE))
            / (CAST(na.nb AS DOUBLE) * CAST(nc.nb AS DOUBLE))) AS BIGINT) AS lift_ppm
FROM pairs
JOIN bn na ON pairs.brand_a = na.b
JOIN bn nc ON pairs.brand_b = nc.b
CROSS JOIN tot
ORDER BY brand_a, brand_b
"""


@register("q_market_basket_pairs", BASKET_ORACLE)
def q_market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE order-grain shuffle, pairs map-side: collect_set per order
    (bounded by |brands| — safe per-key state), array_sort, then the
    i<j pairs via a transform/slice explode. A/B-measured at sf1 rows
    against the ob⋈ob self-join formulation (which pays the DISTINCT
    shuffle + two join repartitions): 5.2 s vs 15.8 s, identical 300
    rows. The sorted array makes pair order a < b by construction
    (binary string collation ≡ the oracle's x.b < y.b)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    ob = li.join(p, li.l_partkey == p.p_partkey).select(
        F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("b")
    )
    sets = ob.groupBy("ok").agg(F.array_sort(F.collect_set("b")).alias("bs"))
    # r14 single-consumer rewrite: the r13 shape consumed `sets` three
    # times (tot, bn, pairs) — the order-grain exchange was reused but
    # the collect_set final aggregation re-ran per consumer. One
    # explode now emits, per order, the i<j pair structs PLUS one
    # (NULL, brand) marker per member brand PLUS one (NULL, NULL)
    # order marker; a single count-grain aggregate then holds all
    # three relations (pairs / per-brand order counts / total orders),
    # each read back by a null-pattern filter over the tiny reused
    # count table. The heavy order-grain aggregate runs exactly once.
    exploded = sets.select(
        F.explode(
            F.expr(
                "concat("
                "flatten(transform(bs, (x, i) -> transform("
                "slice(bs, i + 2, size(bs) - i - 1), y -> struct(x AS a, y AS b)))), "
                "transform(bs, x -> struct(CAST(NULL AS STRING) AS a, x AS b)), "
                "array(struct(CAST(NULL AS STRING) AS a, CAST(NULL AS STRING) AS b)))"
            )
        ).alias("pr")
    )
    counts = exploded.groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # r15: the r14 rewrite moved the fan-out instead of removing it —
    # `counts` was consumed 4x unpersisted (tot, bn via na AND nc,
    # pairs), so the heavy join+explode+aggregate pipeline compiled and
    # ran once per consumer (after-plan ObjectHashAggregate copies went
    # 6 -> 8). localCheckpoint the count-grain relation — it is tiny
    # (|brands|^2/2 + |brands| + 1 rows) — so the order-grain aggregate
    # runs exactly once and every reader scans the materialized rows
    # (guide §2.4/§5; the assortativity idiom).
    counts = counts.localCheckpoint()
    tot = (
        counts.where(F.col("a").isNull() & F.col("b").isNull())
        .select(F.col("n").alias("n_orders"))
    )
    bn = counts.where(F.col("a").isNull() & F.col("b").isNotNull()).select(
        F.col("b"), F.col("n").alias("nb")
    )
    pairs = counts.where(F.col("a").isNotNull()).select(
        F.col("a").alias("brand_a"), F.col("b").alias("brand_b"), F.col("n").alias("n_ab")
    )
    # bn and tot are |brands|-bounded — broadcast both into the pair side
    na = bn.select(F.col("b").alias("brand_a"), F.col("nb").alias("n_a"))
    nc = bn.select(F.col("b").alias("brand_b"), F.col("nb").alias("n_b"))
    return (
        pairs.join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nc), "brand_b")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "brand_a", "brand_b", "n_ab", "n_a", "n_b", "n_orders",
            "CAST(FLOOR((1000000.0 * CAST(n_ab AS DOUBLE) * CAST(n_orders AS DOUBLE))"
            " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) AS BIGINT) AS lift_ppm",
        )
        .orderBy("brand_a", "brand_b")
    )


# ---------------------------------------------------------------------------
# ml_auc_exact_rank — exact Mann-Whitney AUC on the per-mille grid
# ---------------------------------------------------------------------------

AUC_EXACT_ORACLE = """
WITH g AS (
  SELECT CAST(round(value * 1000) AS BIGINT) AS s,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END) AS BIGINT) AS neg
  FROM events GROUP BY 1
), cum AS (
  SELECT s, pos, neg,
         COALESCE(SUM(neg) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS neg_lt
  FROM g
), agg AS (
  SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(SUM(neg) AS BIGINT) AS n_neg,
         CAST(SUM(2 * pos * neg_lt + pos * neg) AS BIGINT) AS u2
  FROM cum
)
SELECT n_pos, n_neg, u2,
       CAST(FLOOR((1000000.0 * CAST(u2 AS DOUBLE))
            / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))) AS BIGINT) AS auc_ppm
FROM agg
"""


@register("ml_auc_exact_rank", AUC_EXACT_ORACLE)
def ml_auc_exact_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 = Σ 2·pos·neg_below + pos·neg ≤ 2·n_pos·n_neg ≈ 2.7e13·SF² —
    int64 through ~sf500, where the CAST raises (not wraps) on both
    engines; the per-mille grid keeps the window ≤2001 rows."""
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy(F.expr("CAST(round(value * 1000) AS BIGINT)").alias("s")).agg(
        F.expr(
            "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("pos"),
        F.expr(
            "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END) AS BIGINT)"
        ).alias("neg"),
    )
    wlt = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    cum = g.select(
        "s", "pos", "neg",
        F.coalesce(F.sum("neg").over(wlt), F.lit(0)).alias("neg_lt"),
    )
    agg = cum.agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum("neg").cast("bigint").alias("n_neg"),
        F.expr("CAST(SUM(2 * pos * neg_lt + pos * neg) AS BIGINT)").alias("u2"),
    )
    return agg.selectExpr(
        "n_pos", "n_neg", "u2",
        "CAST(FLOOR((1000000.0 * CAST(u2 AS DOUBLE))"
        " / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))) AS BIGINT) AS auc_ppm",
    )


# ---------------------------------------------------------------------------
# text_bigram_cond_entropy — next-token predictability per language
# ---------------------------------------------------------------------------

COND_ENTROPY_ORACLE = """
WITH tok AS (
  SELECT lang, string_split(text, ' ') AS toks FROM documents
), bg AS (
  SELECT lang, toks[s] AS w1, toks[s + 1] AS w2
  FROM (SELECT lang, toks, unnest(generate_series(1, length(toks) - 1)) AS s FROM tok)
), c AS (
  SELECT lang, w1, w2, CAST(COUNT(*) AS BIGINT) AS cxy FROM bg GROUP BY 1, 2, 3
), ctx AS (
  SELECT lang, w1, CAST(SUM(cxy) AS BIGINT) AS cx,
         CAST(SUM(cxy * length(printf('%b', cxy))) AS BIGINT) AS sum_cxy_bits
  FROM c GROUP BY 1, 2
), agg AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS vocab_ctx,
         CAST(SUM(cx) AS BIGINT) AS n_bigrams,
         CAST(SUM(cx * length(printf('%b', cx)) - sum_cxy_bits) AS BIGINT) AS cond_scaled_bits
  FROM ctx GROUP BY 1
)
SELECT lang, vocab_ctx, n_bigrams, cond_scaled_bits,
       CAST(FLOOR(1000000.0 * CAST(cond_scaled_bits AS DOUBLE)
            / CAST(n_bigrams AS DOUBLE)) AS BIGINT) AS mean_cond_bits_micro
FROM agg
ORDER BY lang
"""


@register("text_bigram_cond_entropy", COND_ENTROPY_ORACLE)
def text_bigram_cond_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")

    def bitlen(col):
        return F.length(F.conv(col.cast("string"), 10, 2)).cast("bigint")

    # rule 18: sequence(1, size-1) fabricates [1, 0] on a single-token
    # doc (Spark steps -1 when stop < start) where DuckDB's
    # generate_series(1, 0) is empty — filter size >= 2 first (the
    # text_collocation_lift guard)
    toks = d.select("lang", F.split("text", " ").alias("toks")).where(
        F.size("toks") >= 2
    )
    bg = toks.select(
        "lang",
        F.explode(F.sequence(F.lit(1), F.size("toks") - 1)).alias("s"),
        "toks",
    ).select(
        "lang",
        F.element_at("toks", F.col("s")).alias("w1"),
        F.element_at("toks", F.col("s") + 1).alias("w2"),
    )
    c = bg.groupBy("lang", "w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("cxy"))
    ctx = c.groupBy("lang", "w1").agg(
        F.sum("cxy").cast("bigint").alias("cx"),
        F.sum(F.col("cxy") * bitlen(F.col("cxy"))).cast("bigint").alias("sum_cxy_bits"),
    )
    agg = ctx.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab_ctx"),
        F.sum("cx").cast("bigint").alias("n_bigrams"),
        F.sum(F.col("cx") * bitlen(F.col("cx")) - F.col("sum_cxy_bits"))
        .cast("bigint")
        .alias("cond_scaled_bits"),
    )
    return agg.selectExpr(
        "lang", "vocab_ctx", "n_bigrams", "cond_scaled_bits",
        # floor-micro, not ROUND(,6): a rounded ratio with a corpus-
        # scale denominator can hit a representation-tie where the two
        # engines' rounding paths diverge (rule 12); floor of the
        # shared BIGINT-routed IEEE tree is tie-free (rule 17)
        "CAST(FLOOR(1000000.0 * CAST(cond_scaled_bits AS DOUBLE)"
        " / CAST(n_bigrams AS DOUBLE)) AS BIGINT) AS mean_cond_bits_micro",
    ).orderBy("lang")
