"""Fifth wave of relational/OLAP surface (r5): distribution window
functions, width_bucket histograms, regression aggregates, time_bucket
parity, Gini diversity, event-transition matrix, and string-distance
functions.

Reference parity: DuckDB's window/aggregate/string surface available
to every sudan-extension user (docs/functions.md; the extension rides
on stock DuckDB SQL, reference src/sudan_extension.cpp:30-44 registers
only the table functions). Each entry is a JVM-side expression
pipeline; fp-sensitive outputs are computed with an identical IEEE op
sequence in the Spark plan and the oracle (decimal-exact sums first,
then the same double arithmetic), so hashes are bit-stable without
rounding fudges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# win_distribution — percent_rank / cume_dist / ntile
# ---------------------------------------------------------------------------

WIN_DISTRIBUTION_ORACLE = """
SELECT o_orderkey,
       o_orderpriority,
       percent_rank() OVER w AS pr,
       cume_dist()    OVER w AS cd,
       ntile(4)       OVER w AS quartile
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-02-01'
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
ORDER BY o_orderpriority, pr, o_orderkey
"""


@register("win_distribution", WIN_DISTRIBUTION_ORACLE)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions over one month of orders: ONE
    window shuffle on o_orderpriority serves all three functions (the
    ORDER BY total_price, orderkey tiebreak makes rank/ntile total, so
    results are deterministic). percent_rank = (rank-1)/(n-1) and
    cume_dist = peers/n are exact double divisions of integers —
    bit-identical across engines. Scale: the filter is pushed to the
    parquet scan; the single window partitioning survives 100× (5
    priority partitions is coarse, but each is a linear pass — and at
    real scale the month filter bounds the input, not the key count).
    """
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-02-01").cast("timestamp"))
    )
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("o_orderpriority", "pr", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# agg_width_bucket_hist — equi-width histogram via width_bucket
# ---------------------------------------------------------------------------

WIDTH_BUCKET_ORACLE = """
SELECT CASE WHEN l_quantity < 0.0 THEN 0
            WHEN l_quantity >= 50.0 THEN 11
            ELSE CAST(FLOOR(l_quantity / 5.0) AS BIGINT) + 1 END AS bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
FROM lineitem
GROUP BY bucket
ORDER BY bucket
"""


@register("agg_width_bucket_hist", WIDTH_BUCKET_ORACLE)
def agg_width_bucket_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of l_quantity (10 buckets over [0, 50),
    Postgres width_bucket semantics: value == hi lands in bucket 11;
    DuckDB has no width_bucket, so the oracle spells the same
    floor(v / width) + 1 arithmetic — bit-identical here because the
    bucket width (50−0)/10 = 5.0 is exact and the quantities are
    integral doubles). Map-side combine into ≤11 groups — the
    cheapest possible shuffle — and the price sum is decimal-exact so
    the double presentation is order-independent. Scale: partial
    aggregation makes this a pure scan; no skew possible with a
    closed bucket domain."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy(F.width_bucket("l_quantity", F.lit(0.0), F.lit(50.0), F.lit(10)).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(30,6)")).cast("double").alias("sum_price"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# agg_regression — least-squares slope/intercept/r² from exact moments
# ---------------------------------------------------------------------------

_REG_MOMENTS = """
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(qi AS DECIMAL(38,0)))      AS sx,
         SUM(CAST(ki AS DECIMAL(38,0)))      AS sy,
         SUM(CAST(qi * qi AS DECIMAL(38,0))) AS sxx,
         SUM(CAST(qi * ki AS DECIMAL(38,0))) AS sxy,
         SUM(CAST(ki * ki AS DECIMAL(38,0))) AS syy
  FROM (SELECT l_returnflag,
               CAST(round(l_quantity) AS BIGINT) AS qi,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS ki
        FROM lineitem)
  GROUP BY l_returnflag
"""

_REG_SELECT = """
SELECT l_returnflag,
       n AS regr_count,
       ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) / 100.0
         AS regr_slope,
       ((CAST(sy AS DOUBLE) / 100.0)
        - (((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) / 100.0)
          * CAST(sx AS DOUBLE))
         / CAST(n AS DOUBLE)
         AS regr_intercept,
       ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
         / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         AS regr_r2
FROM m
ORDER BY l_returnflag
"""

AGG_REGRESSION_ORACLE = f"WITH m AS ({_REG_MOMENTS})\n{_REG_SELECT}"


@register("agg_regression", AGG_REGRESSION_ORACLE)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regr_slope / regr_intercept / regr_r2 per return flag, DuckDB's
    regr_* semantics re-derived from DECIMAL-exact moment sums
    (Σx, Σy, Σx², Σxy, Σy²) so the result is independent of partial-agg
    order — the built-in double-accumulating regr_* aggs are
    nondeterministic at the last ulp under parallel reduce, which a
    hash gate cannot tolerate. The closed-form arithmetic then runs the
    SAME IEEE op sequence as the oracle. One map-combined shuffle into
    3 groups; scales as a pure scan.

    The moments are INTEGER-scaled (quantity as-is — it is integral —
    and price × 100, exact because prices are 2-decimal) and summed as
    DECIMAL(38,0): a fractional-scale decimal is NOT cross-engine
    hash-safe here — DuckDB converts double→decimal via a scaled
    double multiply (y² × 10^scale overflows exact-integer doubles at
    scale 6) and decimal→double via int128→double THEN ÷10^scale
    (double rounding once the scaled sum tops 2^53, measured at
    sf0.1) — whereas an integer sum is converted with a single
    correctly-rounded step by both engines. The 100× price scale then
    cancels symbolically in r² and divides out of slope/intercept with
    the same explicit /100.0 double op on both sides."""
    l = load_table(spark, sf_dir, "lineitem")
    qi = F.round(F.col("l_quantity")).cast("bigint")
    ki = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    base = l.select("l_returnflag", qi.alias("qi"), ki.alias("ki"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    x, y = F.col("qi"), F.col("ki")
    m = base.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(x)).alias("sx"),
        F.sum(dec(y)).alias("sy"),
        F.sum(dec(x * x)).alias("sxx"),
        F.sum(dec(x * y)).alias("sxy"),
        F.sum(dec(y * y)).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, sxy, syy = (F.col(c).cast("double") for c in ("sxx", "sxy", "syy"))
    cov_s = nd * sxy - sx * sy  # n·Σxy − Σx·Σy, price-scale ×100
    var_xs = nd * sxx - sx * sx
    var_ys = nd * syy - sy * sy
    slope = (cov_s / var_xs) / F.lit(100.0)
    return (
        m.select(
            "l_returnflag",
            F.col("n").alias("regr_count"),
            slope.alias("regr_slope"),
            (((sy / F.lit(100.0)) - slope * sx) / nd).alias("regr_intercept"),
            ((cov_s * cov_s) / (var_xs * var_ys)).alias("regr_r2"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# ts_time_bucket — DuckDB time_bucket ⇄ Spark epoch-floor arithmetic
# ---------------------------------------------------------------------------

TS_TIME_BUCKET_ORACLE = """
SELECT time_bucket(INTERVAL 15 MINUTES, ts) AS bucket_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY bucket_start, event_type
ORDER BY bucket_start, event_type
"""


@register("ts_time_bucket", TS_TIME_BUCKET_ORACLE)
def ts_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB ``time_bucket(INTERVAL 15 MINUTES, ts)`` parity: for
    sub-day widths DuckDB's bucket origin (2000-01-01) is itself a
    multiple of 900 s since the Unix epoch, so
    ``floor(epoch/900)·900`` produces identical bucket boundaries —
    a pure JVM cast/floor expression, no UDF. One map-combined shuffle
    on (bucket, type); at 100 TB this is the canonical pre-aggregation
    shape (bounded key domain per time range). Timestamps keep their
    sub-second fraction through the double cast, matching DuckDB's
    epoch()."""
    e = load_table(spark, sf_dir, "events")
    bucket = F.timestamp_seconds(
        (F.floor(F.col("ts").cast("double") / F.lit(900.0)) * F.lit(900)).cast("long")
    ).alias("bucket_start")
    return (
        e.groupBy(bucket, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("sum_value"),
        )
        .orderBy("bucket_start", "event_type")
    )


# ---------------------------------------------------------------------------
# agg_gini_diversity — Gini impurity of source mix per language
# ---------------------------------------------------------------------------

AGG_GINI_ORACLE = """
WITH c AS (
  SELECT lang, source, COUNT(*) AS cnt
  FROM documents
  GROUP BY lang, source
)
SELECT lang,
       COUNT(*) AS n_sources,
       1.0 - CAST(SUM(CAST(cnt * cnt AS DECIMAL(38,0))) AS DOUBLE)
             / (CAST(SUM(cnt) AS DOUBLE) * CAST(SUM(cnt) AS DOUBLE)) AS gini
FROM c
GROUP BY lang
ORDER BY lang
"""


@register("agg_gini_diversity", AGG_GINI_ORACLE)
def agg_gini_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-diversity (Gini impurity, 1 − Σp²) of each language's
    corpus slice — the transcendental-free cousin of DuckDB's
    ``entropy()`` (ln/log2 are not guaranteed to round identically
    across libm implementations, so a hash gate needs the polynomial
    form). Because p = cnt/total is rational, Σp² = Σcnt²/total² —
    both numerator and denominator are EXACT integer sums (DECIMAL(38,0)
    for the squares), so the whole statistic reduces to one fixed
    double division with no double→fractional-decimal cast anywhere
    (the r5-first formulation summed p² as DECIMAL(20,18), which obeys
    DETERMINISM.md #2 only while p²·10¹⁸ < 2^53 — true for this data,
    but a single-source-dominated language would cross it).

    Single corpus scan, two map-combined aggregations (counts, then
    per-lang moments) — no join, no window."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("cnt"))
    cnt = F.col("cnt")
    return (
        c.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sources"),
            (
                F.lit(1.0)
                - F.sum((cnt * cnt).cast("decimal(38,0)")).cast("double")
                / (F.sum(cnt).cast("double") * F.sum(cnt).cast("double"))
            ).alias("gini"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# ev_transition_matrix — Markov transitions between event types
# ---------------------------------------------------------------------------

EV_TRANSITION_ORACLE = """
WITH seq AS (
  SELECT user_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events
), pairs AS (
  SELECT prev_type, next_type, COUNT(*) AS cnt
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, cnt,
       CAST(cnt AS DOUBLE) / CAST(SUM(cnt) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
FROM pairs
ORDER BY prev_type, next_type
"""


@register("ev_transition_matrix", EV_TRANSITION_ORACLE)
def ev_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: lag() within (user_id, ts, event_id) order — the
    event_id tiebreak makes the sequence total —, count each
    (prev → next) pair, then normalize rows of the matrix with a
    window over the tiny pairs relation. One fact shuffle on user_id
    (the lag window), one map-combined shuffle into ≤|types|² groups,
    and the normalizing window runs on ≤25 rows. The probability is a
    single exact double division. Scale: user_id partitioning is the
    natural session key; no skew beyond a power user's own history."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wn = Window.partitionBy("prev_type")
    return (
        pairs.select(
            "prev_type",
            "next_type",
            "cnt",
            (F.col("cnt").cast("double") / F.sum("cnt").over(wn).cast("double")).alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )


# ---------------------------------------------------------------------------
# str_distance — levenshtein + character-bigram Jaccard
# ---------------------------------------------------------------------------

STR_DISTANCE_ORACLE = """
WITH g AS (
  SELECT p_partkey, p_name, lower(p_type) AS p_type_lc,
         list_distinct(list_transform(generate_series(1, length(p_name) - 1),
                                      i -> substring(p_name, i, 2))) AS bg_a,
         list_distinct(list_transform(generate_series(1, length(lower(p_type)) - 1),
                                      i -> substring(lower(p_type), i, 2))) AS bg_b
  FROM part
)
SELECT p_partkey,
       levenshtein(p_name, p_type_lc) AS lev,
       CAST(length(list_intersect(bg_a, bg_b)) AS DOUBLE)
         / CAST(length(list_distinct(list_concat(bg_a, bg_b))) AS DOUBLE) AS bigram_jaccard
FROM g
ORDER BY p_partkey
"""


@register("str_distance", STR_DISTANCE_ORACLE)
def str_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-distance functions over part names: Levenshtein edit
    distance (JVM built-in on both engines) and character-bigram
    Jaccard similarity built from the same sequence→substring→distinct
    expression pipeline DuckDB's list functions express. Map-only —
    no shuffle except the output sort; the bigram arrays are bounded
    by name length. The Jaccard ratio is one exact int/int double
    division. Scale: embarrassingly parallel scan."""
    p = load_table(spark, sf_dir, "part")
    # F.substring does not accept a Column start — use expr for the
    # positional slice so the plan stays a JVM expression.
    a = F.expr("array_distinct(transform(sequence(1, length(p_name) - 1), i -> substring(p_name, i, 2)))")
    b = F.expr(
        "array_distinct(transform(sequence(1, length(lower(p_type)) - 1), i -> substring(lower(p_type), i, 2)))"
    )
    g = p.select(
        "p_partkey",
        "p_name",
        F.lower("p_type").alias("p_type_lc"),
        a.alias("bg_a"),
        b.alias("bg_b"),
    )
    return (
        g.select(
            "p_partkey",
            F.levenshtein("p_name", "p_type_lc").alias("lev"),
            (
                F.size(F.array_intersect("bg_a", "bg_b")).cast("double")
                / F.size(F.array_union("bg_a", "bg_b")).cast("double")
            ).alias("bigram_jaccard"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# summarize_stats — SUMMARIZE-style per-column statistics
# ---------------------------------------------------------------------------

_SUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

SUMMARIZE_ORACLE = "\nUNION ALL\n".join(
    f"""
SELECT '{c}' AS column_name,
       COUNT(*) AS n,
       MIN({c}) AS min_v,
       MAX({c}) AS max_v,
       CAST(SUM(CAST({c} AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS mean_v,
       CAST(SUM(CAST({c} AS DECIMAL(27,6))) AS DOUBLE) AS sum_v
FROM lineitem"""
    for c in _SUM_COLS
) + "\nORDER BY column_name"


@register("summarize_stats", SUMMARIZE_ORACLE)
def summarize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB ``SUMMARIZE``-style column statistics for the numeric
    lineitem columns (count / min / max / decimal-exact mean / sum),
    one output row per column. The oracle spells it as a 4-way UNION
    (4 scans — DuckDB's own shape for SUMMARIZE); Spark computes ALL
    columns' stats in ONE partial+final aggregate over ONE scan, then
    unpivots the single stats row with stack() — the shape that wins
    at 100 TB, where each extra scan is the cost driver. approx-unique
    is deliberately omitted: sketch estimates are not cross-engine
    comparable (sketch_distinct covers that surface with error-bound
    tests)."""
    l = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _SUM_COLS:
        col = F.col(c)
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.min(col).alias(f"{c}__min"),
            F.max(col).alias(f"{c}__max"),
            (F.sum(col.cast("decimal(27,6)")).cast("double") / F.count(F.lit(1))).alias(f"{c}__mean"),
            F.sum(col.cast("decimal(27,6)")).cast("double").alias(f"{c}__sum"),
        ]
    one = l.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__min, {c}__max, {c}__mean, {c}__sum" for c in _SUM_COLS
    )
    return (
        one.select(
            F.expr(
                f"stack({len(_SUM_COLS)}, {stack_args}) AS "
                "(column_name, n, min_v, max_v, mean_v, sum_v)"
            )
        )
        .orderBy("column_name")
    )


# ---------------------------------------------------------------------------
# win_lead_lag — lead/lag with explicit offsets and defaults
# ---------------------------------------------------------------------------

WIN_LEAD_LAG_ORACLE = """
SELECT user_id, event_id,
       lag(value, 2, -1.0)  OVER w AS lag2_value,
       lead(value, 3, -1.0) OVER w AS lead3_value,
       lag(event_type, 1, 'none') OVER w AS prev_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id
"""


@register("win_lead_lag", WIN_LEAD_LAG_ORACLE)
def win_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag with non-unit offsets and explicit defaults (the
    boundary rows take the default, not NULL) over per-user event
    sequences — one window shuffle on user_id serves all three
    functions; the (ts, event_id) order is total so frames are
    deterministic. Values pass through untouched (no fp arithmetic),
    so hashes are trivially stable. Scale: the canonical sessionized
    window — partitions by the natural session key."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "event_id",
            F.lag("value", 2, -1.0).over(w).alias("lag2_value"),
            F.lead("value", 3, -1.0).over(w).alias("lead3_value"),
            F.lag("event_type", 1, "none").over(w).alias("prev_type"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# join_full_outer — FULL OUTER JOIN with COALESCE'd keys
# ---------------------------------------------------------------------------

JOIN_FULL_OUTER_ORACLE = """
WITH day_orders AS (
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-03-01'
  GROUP BY 1
),
day_urgent AS (
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_urgent
  FROM orders
  WHERE o_orderpriority = '1-URGENT'
    AND o_orderdate >= TIMESTAMP '1995-02-01' AND o_orderdate < TIMESTAMP '1995-04-01'
  GROUP BY 1
)
SELECT CAST(COALESCE(a.d, b.d) AS TIMESTAMP) AS d,
       COALESCE(a.n_orders, 0) AS n_orders,
       COALESCE(b.n_urgent, 0) AS n_urgent
FROM day_orders a FULL OUTER JOIN day_urgent b ON a.d = b.d
ORDER BY d
"""


@register("join_full_outer", JOIN_FULL_OUTER_ORACLE)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER JOIN semantics over two overlapping daily aggregates
    (Jan-Feb orders vs Feb-Mar urgent orders): unmatched sides
    survive with COALESCE'd keys and zero-filled measures. Both
    inputs aggregate before joining, so the outer join runs on
    day-cardinality relations — the 100 TB rule for outer joins:
    never full-outer-join two facts, join their pre-aggregates. The
    day key is emitted as TIMESTAMP (DETERMINISM.md #4: DATE hashes
    differently per fetch mode)."""
    o = load_table(spark, sf_dir, "orders")
    ts = lambda s: F.lit(s).cast("timestamp")  # noqa: E731
    a = (
        o.where((F.col("o_orderdate") >= ts("1995-01-01")) & (F.col("o_orderdate") < ts("1995-03-01")))
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    b = (
        o.where(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= ts("1995-02-01"))
            & (F.col("o_orderdate") < ts("1995-04-01"))
        )
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_urgent"))
    )
    return (
        a.join(b, a.d == b.d, "full_outer")
        .select(
            F.coalesce(a.d, b.d).cast("timestamp").alias("d"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_urgent", F.lit(0)).alias("n_urgent"),
        )
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# agg_filter_clause — SQL:2003 FILTER clause aggregates
# ---------------------------------------------------------------------------

AGG_FILTER_ORACLE = """
SELECT l_returnflag,
       COUNT(*) AS n_all,
       COUNT(*) FILTER (WHERE l_quantity >= 25) AS n_bulk,
       COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) FILTER (WHERE l_tax > 0.04) AS DOUBLE) AS taxed_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("agg_filter_clause", AGG_FILTER_ORACLE)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2003 ``agg(...) FILTER (WHERE ...)`` parity — four
    differently-filtered aggregates from ONE scan and ONE
    partial+final aggregate (Spark SQL supports the FILTER clause
    natively; the DataFrame twin is conditional aggregation). The
    alternative — one subquery per predicate — would scan lineitem
    four times. Decimal-exact taxed sum; filtered COUNTs are exact
    ints. Pure scan at any scale."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_all"),
            F.count_if(F.col("l_quantity") >= 25).alias("n_bulk"),
            F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
            F.sum(
                F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice").cast("decimal(27,6)"))
            ).cast("double").alias("taxed_price"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# str_try_parse — TRY_CAST error-handling parity
# ---------------------------------------------------------------------------

STR_TRY_PARSE_ORACLE = """
WITH raw AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 3 = 0 THEN CAST(p_size AS VARCHAR)
              WHEN p_partkey % 3 = 1 THEN p_name
              ELSE '  ' || CAST(p_size * 10 AS VARCHAR) END AS maybe_num,
         CASE WHEN p_partkey % 2 = 0
              THEN '1995-0' || CAST((p_partkey % 9) + 1 AS VARCHAR) || '-15'
              ELSE p_type END AS maybe_date
  FROM part
)
SELECT p_partkey,
       TRY_CAST(trim(maybe_num) AS INTEGER) AS as_int,
       CAST(TRY_CAST(maybe_date AS DATE) AS TIMESTAMP) AS as_ts,
       TRY_CAST(trim(maybe_num) AS INTEGER) IS NULL AS int_failed
FROM raw
ORDER BY p_partkey
"""


@register("str_try_parse", STR_TRY_PARSE_ORACLE)
def str_try_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_CAST parity — malformed values yield NULL, not errors, on
    both engines (the ingestion-hardening contract: a 100 TB load
    must quarantine bad rows, not die on row 3 billion). The probe
    mixes deterministic valid/invalid numeric and date strings from
    part columns; dates flow out as TIMESTAMP (DETERMINISM.md #4).
    Map-only, whole-stage codegen; one output-sort exchange."""
    p = load_table(spark, sf_dir, "part")
    key = F.col("p_partkey")
    maybe_num = (
        F.when(key % 3 == 0, F.col("p_size").cast("string"))
        .when(key % 3 == 1, F.col("p_name"))
        .otherwise(F.concat(F.lit("  "), (F.col("p_size") * 10).cast("string")))
    )
    maybe_date = F.when(
        key % 2 == 0,
        F.concat(F.lit("1995-0"), ((key % 9) + 1).cast("string"), F.lit("-15")),
    ).otherwise(F.col("p_type"))
    as_int = F.try_to_number(F.trim(maybe_num), F.lit("999999")).cast("int")
    return (
        p.select(
            "p_partkey",
            as_int.alias("as_int"),
            F.try_to_timestamp(maybe_date, F.lit("yyyy-MM-dd")).alias("as_ts"),
            as_int.isNull().alias("int_failed"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# win_time_range_sliding — RANGE-frame sliding aggregates over event time
# ---------------------------------------------------------------------------

WIN_TIME_RANGE_ORACLE = """
SELECT event_id, user_id, ts,
       COUNT(*) OVER w AS n_10min,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE) AS sum_10min
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)
ORDER BY user_id, ts, event_id
"""


@register("win_time_range_sliding", WIN_TIME_RANGE_ORACLE)
def win_time_range_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame sliding window over EVENT TIME (each row aggregates
    its user's trailing 10 minutes — value-based frame bounds, not row
    counts, so bursts widen the frame member set). Spark's DataFrame
    rangeBetween needs a numeric ORDER BY, so the frame orders by the
    epoch-second double (`ts` cast — identical fractional seconds to
    DuckDB's epoch()) with a [-600, 0] range; frame MEMBERSHIP is
    therefore identical to the oracle's INTERVAL frame. The windowed
    sum is DECIMAL-exact so in-frame accumulation order can't leak
    into the hash. One window shuffle on user_id (the session key);
    ties in ts share a frame in BOTH engines because RANGE frames are
    peer-inclusive. Scale: the canonical trailing-window fraud/rate
    metric — partitions by user, no global state."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("double"))
        .rangeBetween(-600, Window.currentRow)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            "ts",
            F.count(F.lit(1)).over(w).alias("n_10min"),
            F.sum(F.col("value").cast("decimal(27,6)")).over(w).cast("double").alias("sum_10min"),
        )
        .orderBy("user_id", "ts", "event_id")
    )
