"""Eighth wave of relational/OLAP surface (r5c): EXCLUDE CURRENT ROW
frame emulation and the nearest-either-direction as-of join.

Reference parity: stock-DuckDB window-frame modifiers and ASOF-family
joins available to every sudan-extension user. Both entries follow
DETERMINISM.md — decimal-exact sums with one presentation cast, and
explicit tie-breaks on every ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# win_exclude_current — frame EXCLUDE CURRENT ROW emulation
# ---------------------------------------------------------------------------

WIN_EXCLUDE_ORACLE = """
SELECT o_orderkey, o_orderpriority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) OVER (
         PARTITION BY o_orderpriority ORDER BY o_orderkey
         ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW) AS DOUBLE) AS neighbor_sum
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-06-01' AND o_orderdate < TIMESTAMP '1995-07-01'
ORDER BY o_orderpriority, o_orderkey
"""


@register("win_exclude_current", WIN_EXCLUDE_ORACLE)
def win_exclude_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame EXCLUDE CURRENT ROW parity — the peer-comparison window
    (each order vs the sum of its ±2 neighbors, itself excluded) that
    DuckDB spells with a frame modifier and Spark lacks. Emulation:
    SUM over the INCLUSIVE frame minus the current row's value — exact
    because both are the same DECIMAL(27,6) accumulator, so the
    subtraction is integer-scaled decimal arithmetic with ONE double
    presentation cast at the end (DETERMINISM.md rule 2). A frame that
    contains only the current row must yield NULL (DuckDB sums an
    EMPTY frame), not 0 — the count-over-frame − 1 = 0 guard handles
    single-row partitions. ONE window shuffle; the month filter is
    pushed to the scan."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-06-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderkey")
        .rowsBetween(-2, 2)
    )
    dec = F.col("o_totalprice").cast("decimal(27,6)")
    frame_sum = F.sum(dec).over(w)
    n_others = F.count(F.lit(1)).over(w) - 1
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.when(n_others == 0, F.lit(None))
            .otherwise((frame_sum - dec).cast("double"))
            .alias("neighbor_sum"),
        )
        .orderBy("o_orderpriority", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# ev_asof_nearest — nearest-either-direction as-of join
# ---------------------------------------------------------------------------

ASOF_NEAREST_ORACLE = """
SELECT c.event_id, c.user_id, c.ts,
       (SELECT p.ts
        FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
        WHERE p.user_id = c.user_id
        ORDER BY abs(epoch_us(p.ts) - epoch_us(c.ts)), p.ts
        LIMIT 1) AS nearest_purchase_ts
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
ORDER BY c.user_id, c.ts, c.event_id
"""


@register("ev_asof_nearest", ASOF_NEAREST_ORACLE)
def ev_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join — for every click, the purchase closest in
    time in EITHER direction (ties → the earlier purchase): the
    sensor-alignment shape backward (ev_asof_join) and forward
    (ev_asof_forward) as-ofs can't express alone. Plan: ONE union of
    pushed-filter scans feeds TWO frame windows over the SAME user_id
    partitioning — ascending scan carries "latest purchase ≤ t"
    (prev), descending frame carries "earliest purchase ≥ t" (next) —
    then the nearest pick is a pure projection: |t−prev| ≤ |next−t|
    chooses prev (ties inclusive, matching the oracle's (diff, ts)
    order), NULLs fall through to the other side. Spark plans both
    windows after a single user_id exchange (the second Window reuses
    the partitioning), so the whole query is one shuffle + the output
    sort — the oracle's correlated subquery is a per-user quadratic
    the union-marker plan never pays."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(0).alias("marker")
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.lit(None).cast("long").alias("event_id"), "user_id", "ts", F.lit(1).alias("marker")
    )
    both = clicks.unionByName(purchases)
    p_ts = F.when(F.col("marker") == 1, F.col("ts"))
    # ascending: purchases at the same ts sort BEFORE the click
    # (marker desc) so prev is inclusive (p.ts <= c.ts)
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("marker"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # descending: same inclusivity for next (p.ts >= c.ts)
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("marker"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_us = F.unix_micros(F.max(p_ts).over(w_prev))
    next_us = F.unix_micros(F.min(p_ts).over(w_next))
    t_us = F.unix_micros(F.col("ts"))
    nearest_us = (
        F.when(prev_us.isNull(), next_us)
        .when(next_us.isNull(), prev_us)
        .when(t_us - prev_us <= next_us - t_us, prev_us)
        .otherwise(next_us)
    )
    return (
        both.select("event_id", "user_id", "ts", "marker", nearest_us.alias("nearest_us"))
        .where(F.col("marker") == 0)
        .select(
            "event_id", "user_id", "ts",
            F.timestamp_micros(F.col("nearest_us")).alias("nearest_purchase_ts"),
        )
        .orderBy("user_id", "ts", "event_id")
    )
