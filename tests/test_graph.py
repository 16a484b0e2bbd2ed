"""graph_pagerank: numpy power-iteration reference + invariants."""

import numpy as np

from duckdb_sudan__spark import operators
from duckdb_sudan__spark.operators import QUERIES
from tests.conftest import SF_DIR

operators.load_all()


def _reference_pagerank(edges, n_iters, d):
    """Dense numpy power iteration with uniform teleport and uniform
    dangling redistribution — independent of the Spark join loop."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        inflow = np.zeros(n)
        for s, t in edges:
            inflow[idx[t]] += r[idx[s]] / out_deg[idx[s]]
        dangling = r[out_deg == 0].sum()
        r = (1.0 - d) / n + d * (inflow + dangling / n)
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_numpy_reference(spark):
    from duckdb_sudan__spark.operators.graph import PR_DAMPING, PR_ITERS
    from duckdb_sudan__spark.operators.similarity import emb_knn_graph

    edges = [(r.id_a, r.id_b) for r in emb_knn_graph(spark, SF_DIR).collect()]
    expect = _reference_pagerank(edges, PR_ITERS, PR_DAMPING)
    got = {r.vec_id: r.rank for r in QUERIES["graph_pagerank"](spark, SF_DIR).collect()}
    assert set(got) == set(expect)
    for v, rank in got.items():
        assert abs(rank - expect[v]) < 1e-9, (v, rank, expect[v])


def test_pagerank_invariants(spark):
    rows = QUERIES["graph_pagerank"](spark, SF_DIR).collect()
    total = sum(r.rank for r in rows)
    # rounded to 9dp per row, so the sum tolerance is |V|·5e-10
    assert abs(total - 1.0) < len(rows) * 5e-10 + 1e-9
    assert all(r.rank > 0 for r in rows)
    # output is sorted by rank desc (ties vec_id asc)
    ranks = [(r.rank, r.vec_id) for r in rows]
    assert ranks == sorted(ranks, key=lambda t: (-t[0], t[1]))
