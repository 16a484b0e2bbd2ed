"""Skew-mitigation join strategies.

AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles most runtime skew; `salted_join` is the explicit
form for keys so hot that even split partitions overwhelm an executor
(the classic null-key / celebrity-key case at 100 TB):

- the probe (fact) side gets a deterministic salt in [0, n_salt) from
  a high-cardinality tiebreak column;
- the build side is exploded n_salt ways so every (key, salt) pair
  still matches;
- the join key becomes (key, salt), spreading one hot key over n_salt
  shuffle partitions at the cost of replicating the build side n_salt×.

`skew_salted_join` is the oracle-checked demo: revenue per order
priority via a salted orders⋈lineitem — the result must be identical
to the plain join (salting changes the physical distribution, never
the semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.operators.relational import _sql_dsum, dsum
from duckdb_sudan__spark.session import load_table


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    n_salt: int = 8,
    salt_from: Column | None = None,
) -> DataFrame:
    """Inner equi-join on `key` with the hot-key shuffle spread over
    `n_salt` sub-keys. `salt_from` must be a probe-side expression with
    enough cardinality to spread rows (defaults to the whole-row hash).
    Result columns = probe ⋈ build minus the helper salt columns."""
    if salt_from is None:
        salt_from = F.xxhash64(*[F.col(c) for c in probe.columns])
    salted_probe = probe.withColumn("_salt", F.pmod(salt_from, F.lit(n_salt)).cast("int"))
    salted_build = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return salted_probe.join(salted_build, [key, "_salt"]).drop("_salt")


SKEW_SALTED_ORACLE = f"""
SELECT o.o_orderpriority,
       COUNT(*) AS n_lines,
       {_sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@register("skew_salted_join", SKEW_SALTED_ORACLE)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    l = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice", "l_discount", "l_linenumber"
    )
    joined = salted_join(l, o, "o_orderkey", n_salt=8, salt_from=F.col("l_linenumber"))
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
        .orderBy("o_orderpriority")
    )
