"""Graph analytics over the embedding k-NN graph: PageRank.

Rows-only by design: PageRank is an ITERATIVE fixed point — a SQL
oracle would need a recursive CTE carrying double state through a
nondeterministic join order, exactly the cross-engine fp hazard
DETERMINISM.md rule 3 forbids. The contract is instead a numpy
power-iteration reference (tests/test_graph.py) plus the invariants
every PageRank must satisfy (Σrank = 1, rank > 0, |V| rows).

Reference parity: the reference engine exposes relational joins +
aggregation (src/sudan/*_functions.cpp register sites); PageRank is
the canonical composition a graph-curious user writes over that
surface — and the workload class (iterative joins with cached
intermediate state) where Spark's execution model earns its keep
over single-pass engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.operators.similarity import emb_knn_graph

PR_ITERS = 5
PR_DAMPING = 0.85

# persisted relations from the previous invocation, released at the next
# entry call (the earliest provably-consumed point — same discipline as
# similarity._KNN_CACHE_HANDLES: bench runs the entry N+1 times per
# process and would otherwise accumulate a cached copy per run)
_PR_CACHE_HANDLES: list[DataFrame] = []


@register("graph_pagerank")  # rows-only: ≡ numpy power iteration, tested
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the k-NN similarity graph (edges = emb_knn_graph,
    each vector pointing at its top-K most-similar neighbors within
    its label cell): the centrality score that ranks "most
    representative" documents for curriculum ordering, dedup-keeper
    election, and diversity-aware sampling — same shape as running
    PageRank over a citation or hyperlink graph at crawl scale.

    Semantics: damping d=0.85, uniform teleport 1/N, dangling mass
    (nodes with no out-edges — possible here only for singleton label
    cells) redistributed uniformly each iteration, PR_ITERS=5 fixed
    iterations from the uniform start — a deterministic, bounded
    computation, not convergence-tested (production runs fix the
    iteration budget for exactly this reproducibility reason).

    Plan: out-degrees and the edge list are computed ONCE and cached;
    each iteration is one broadcast-or-shuffle hash join
    (edges ⋈ ranks on src) + one groupBy(dst) partial-agg — the
    map-side-combining shape that moves O(|E|) rows per iteration —
    plus a 1-row dangling aggregate. Ranks are persisted per
    iteration and the previous iteration unpersisted, so lineage
    stays one-iteration deep (at 100 TB with checkpointing this is
    the textbook Pregel-on-DataFrames loop; 5 iterations = 5
    bounded shuffles, no driver-side data).
    """
    while _PR_CACHE_HANDLES:
        _PR_CACHE_HANDLES.pop().unpersist()
    edges = emb_knn_graph(spark, sf_dir).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    nodes = edges.select(F.col("src").alias("vec_id")).unionByName(
        edges.select(F.col("dst").alias("vec_id"))
    ).distinct()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # contribution relation reused every iteration: (src, dst, 1/out_deg)
    contrib_edges = edges.join(deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("out_deg").cast("double")).alias("w")
    ).persist()
    _PR_CACHE_HANDLES.append(contrib_edges)
    n = nodes.count()
    ranks = nodes.select("vec_id", (F.lit(1.0) / F.lit(float(n))).alias("rank")).persist()
    ranks.count()  # materialize before the loop so each iteration starts cached

    teleport = (1.0 - PR_DAMPING) / n
    for _ in range(PR_ITERS):
        # dangling mass: rank held by nodes with no out-edges
        dangling = (
            ranks.join(deg, ranks["vec_id"] == deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
        )
        flowed = (
            contrib_edges.join(ranks, contrib_edges["src"] == ranks["vec_id"])
            .groupBy("dst")
            .agg(F.sum(F.col("w") * F.col("rank")).alias("inflow"))
        )
        new_ranks = (
            nodes.join(flowed, nodes["vec_id"] == flowed["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "vec_id",
                (
                    F.lit(teleport)
                    + F.lit(PR_DAMPING)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.col("m") / F.lit(float(n)))
                ).alias("rank"),
            )
            .persist()
        )
        new_ranks.count()
        ranks.unpersist()
        ranks = new_ranks

    _PR_CACHE_HANDLES.append(ranks)
    return ranks.select("vec_id", F.round("rank", 9).alias("rank")).orderBy(
        F.desc("rank"), "vec_id"
    )
