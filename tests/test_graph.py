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


def _reference_lpa(edges, n_iters):
    """Pure-Python synchronous label propagation with the IDENTICAL
    rule (most frequent neighbor community, ties -> smallest id),
    independent of the Spark join loop."""
    from collections import Counter

    und = set()
    for a, b in edges:
        u, v = (a, b) if a <= b else (b, a)
        und.add((u, v))
    neigh = {}
    for u, v in und:
        neigh.setdefault(u, set()).add(v)
        neigh.setdefault(v, set()).add(u)
    labels = {v: v for v in neigh}
    for _ in range(n_iters):
        new = {}
        for v, ns in neigh.items():
            c = Counter(labels[x] for x in ns)
            # most frequent, ties by smallest community id
            new[v] = min(c, key=lambda k: (-c[k], k))
        labels = new
    return labels


def test_label_propagation_matches_local_replay(spark):
    from duckdb_sudan__spark.operators.graph import LPA_ITERS
    from duckdb_sudan__spark.operators.similarity import emb_knn_graph

    edges = [(r.id_a, r.id_b) for r in emb_knn_graph(spark, SF_DIR).collect()]
    expect = _reference_lpa(edges, LPA_ITERS)
    got = {r.vec_id: r.community for r in QUERIES["graph_label_propagation"](spark, SF_DIR).collect()}
    assert got == expect


def test_label_propagation_invariants(spark):
    rows = QUERIES["graph_label_propagation"](spark, SF_DIR).collect()
    nodes = {r.vec_id for r in rows}
    comms = {r.community for r in rows}
    # every community id is a member node's id, count within [1, |V|]
    assert comms <= nodes
    assert 1 <= len(comms) <= len(nodes)
    # deterministic: a second run labels identically
    again = {(r.vec_id, r.community) for r in QUERIES["graph_label_propagation"](spark, SF_DIR).collect()}
    assert again == {(r.vec_id, r.community) for r in rows}
