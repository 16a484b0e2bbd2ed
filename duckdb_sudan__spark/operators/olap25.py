"""r11 wave 17: timezone-localization parity and the 2-hop graph
frontier.

- dt_tz_localize_ny validates Spark's NATIVE from_utc_timestamp
  ('America/New_York') against an INDEPENDENTLY-CODED oracle: the
  corpus's 1995-2001 order dates fall in the stable 1987-2006 US DST
  era (first Sunday of April 02:00 → last Sunday of October 02:00), so
  the oracle derives the UTC−5/UTC−4 offset from first principles
  (dayofweek arithmetic, no tzdata, no session-timezone dependence).
  A hash match means Spark's JVM tzdata agrees with the era rule on
  every one of the ~2,400 distinct order dates — the same
  independent-implementation oracle style as the geometry entries.
  Midnight-UTC order stamps sit 19:00/20:00 local, far from the 02:00
  transition, so no ambiguous/skipped wall times are sampled.
- graph_two_hop_neighborhood is the friend-of-friend frontier over the
  emb_knn_graph edge set (similarity.py): strict 2-hop = reachable in
  exactly 2 directed hops, not a direct neighbor, not self. Emitted as
  the bounded frontier-size histogram (per-node strict-2-hop count ≤
  k² = 9, so ≤ 11 rows at any scale). The oracle inlines the k-NN
  oracle as a CTE — the edge relation itself is already
  driver-verified, this entry verifies the composition.

Determinism: the tz entry compares TIMESTAMP values produced by two
implementations of the same calendar function — integer calendar
arithmetic on both sides, no floats at all; the graph entry is pure
set algebra on (id, id) BIGINT pairs (counts only — the float cosines
never reach this hash).

Scale notes (100 TB): tz localization is a map-only expression folded
into the scan projection, then a ≤(years×24)-group hash aggregate;
two-hop joins the k-NN edge list to itself on the hop vertex — degree
is capped at k=3 by construction, so the join fans out ≤ k per row
(never quadratic in nodes), and the anti-join against direct edges
shares the same (node, node) key distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.operators.similarity import KNN_K, emb_knn_graph
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# dt_tz_localize_ny — from_utc_timestamp vs first-principles DST rule
# ---------------------------------------------------------------------------
# Oracle offset rule (valid 1987-2006, corpus spans 1995-2001):
# DST while  first-Sunday-of-April 07:00 UTC  <= ts <
#            last-Sunday-of-October 06:00 UTC
# (02:00 local at each edge: EST=UTC-5 entering, EDT=UTC-4 leaving).
# DuckDB dayofweek(): Sunday=0 — first Sunday of April is
# Apr 1 + ((7 - dow(Apr 1)) % 7) days; last Sunday of October is
# Oct 31 - dow(Oct 31) days.

TZ_NY_ORACLE = """
WITH base AS (
  SELECT o_orderdate AS ts,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(year(o_orderdate) AS BIGINT) AS utc_year,
         make_date(CAST(year(o_orderdate) AS INTEGER), 4, 1) AS apr1,
         make_date(CAST(year(o_orderdate) AS INTEGER), 10, 31) AS oct31
  FROM orders
), rule AS (
  SELECT ts, cents, utc_year,
         CAST(apr1 + INTERVAL ((7 - dayofweek(apr1)) % 7) DAY AS TIMESTAMP)
           + INTERVAL 7 HOUR AS dst_start_utc,
         CAST(oct31 - INTERVAL (dayofweek(oct31)) DAY AS TIMESTAMP)
           + INTERVAL 6 HOUR AS dst_end_utc
  FROM base
), localized AS (
  SELECT utc_year, cents,
         ts - INTERVAL 5 HOUR
            + CASE WHEN ts >= dst_start_utc AND ts < dst_end_utc
                   THEN INTERVAL 1 HOUR ELSE INTERVAL 0 HOUR END AS local_ts
  FROM rule
)
SELECT utc_year,
       CAST(hour(local_ts) AS BIGINT) AS local_hour,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM localized
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("dt_tz_localize_ny", TZ_NY_ORACLE)
def dt_tz_localize_ny(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    local = F.from_utc_timestamp("o_orderdate", "America/New_York")
    return (
        o.select(
            F.year("o_orderdate").cast("bigint").alias("utc_year"),
            F.hour(local).cast("bigint").alias("local_hour"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("utc_year", "local_hour")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
        .orderBy("utc_year", "local_hour")
    )


# ---------------------------------------------------------------------------
# graph_two_hop_neighborhood — strict friend-of-friend frontier histogram
# ---------------------------------------------------------------------------

TWO_HOP_ORACLE = f"""
WITH ranked AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         row_number() OVER (PARTITION BY a.vec_id ORDER BY
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) DESC,
           b.vec_id) AS rn
  FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id <> b.vec_id
), knn AS (
  SELECT id_a, id_b FROM ranked WHERE rn <= {KNN_K}
), two AS (
  SELECT DISTINCT e1.id_a AS a, e2.id_b AS c
  FROM knn e1 JOIN knn e2 ON e1.id_b = e2.id_a
  WHERE e2.id_b <> e1.id_a
), strict AS (
  SELECT a, c FROM two
  WHERE NOT EXISTS (SELECT 1 FROM knn WHERE knn.id_a = two.a AND knn.id_b = two.c)
), per_node AS (
  SELECT n.id_a AS node, CAST(COALESCE(s.n2, 0) AS BIGINT) AS n2
  FROM (SELECT DISTINCT id_a FROM knn) n
  LEFT JOIN (SELECT a, COUNT(*) AS n2 FROM strict GROUP BY a) s ON n.id_a = s.a
)
SELECT n2 AS strict_two_hop, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM per_node
GROUP BY n2
ORDER BY n2
"""


@register("graph_two_hop_neighborhood", TWO_HOP_ORACLE)
def graph_two_hop_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = emb_knn_graph(spark, sf_dir).select("id_a", "id_b")
    edges = edges.cache()  # 4 consumers: both hop sides, anti-join, node list
    # r15: materialize before the 4-consumer fan-out (the assortativity
    # effect — the consumers race the uncached k-NN kernel partitions
    # inside one action otherwise). A/B table in OPTIMIZATION_r15.md.
    edges.count()
    hop2 = (
        edges.alias("e1")
        .join(edges.alias("e2"), F.col("e1.id_b") == F.col("e2.id_a"))
        .where(F.col("e2.id_b") != F.col("e1.id_a"))
        .select(F.col("e1.id_a").alias("a"), F.col("e2.id_b").alias("c"))
        .distinct()
    )
    strict = hop2.join(
        edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("c")),
        ["a", "c"],
        "left_anti",
    )
    nodes = edges.select(F.col("id_a").alias("node")).distinct()
    per_node = (
        nodes.join(
            strict.groupBy("a").agg(F.count(F.lit(1)).alias("n2")),
            nodes.node == F.col("a"),
            "left",
        )
        .select(F.coalesce(F.col("n2"), F.lit(0)).cast("bigint").alias("n2"))
    )
    return (
        per_node.groupBy(F.col("n2").alias("strict_two_hop"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .orderBy("strict_two_hop")
    )
