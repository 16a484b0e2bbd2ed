"""Property-based tests (hypothesis) for the pure numpy/python kernels
behind the Pandas-UDF operators — no SparkSession needed, so hundreds
of generated examples run in milliseconds.

These pin the invariants the distributed operators rely on:
- shingle codes are an injective encoding of byte 5-grams,
- the per-dim numpy fold is bit-identical to a scalar left fold
  (the whole basis of the ANN oracle's exactness),
- MinHash signatures are deterministic, set-based, and their band
  collisions estimate Jaccard from above for identical sets.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_sudan__spark.operators.dedup import (
    SHINGLE_K,
    _byte_shingle_hashes,
)
from duckdb_sudan__spark.operators.similarity import _fold_sq_norm, _foldmul_acc

texts = st.text(min_size=0, max_size=200)


@given(texts)
@settings(max_examples=200, deadline=None)
def test_shingle_codes_injective(t):
    """Every distinct byte 5-gram of the text maps to a distinct code,
    and the code count equals the distinct-shingle count."""
    b = (t or " ").encode("utf-8")
    if len(b) < SHINGLE_K:
        b = b + b"\x00" * (SHINGLE_K - len(b))
    want = {b[i : i + SHINGLE_K] for i in range(len(b) - SHINGLE_K + 1)}
    codes = _byte_shingle_hashes(t)
    assert len(codes) == len(want)
    # codes are sorted unique and never the zero padding sentinel
    assert np.all(np.diff(codes.astype(np.int64)) > 0)
    assert np.all(codes != 0)


@given(texts)
@settings(max_examples=100, deadline=None)
def test_shingle_codes_deterministic(t):
    a = _byte_shingle_hashes(t)
    b = _byte_shingle_hashes(t)
    assert np.array_equal(a, b)


vecs = st.lists(
    st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, width=64),
    min_size=1,
    max_size=32,
)


@given(st.lists(vecs, min_size=1, max_size=8).filter(lambda vs: len({len(v) for v in vs}) == 1))
@settings(max_examples=100, deadline=None)
def test_foldmul_matches_scalar_left_fold_bitwise(vs):
    """_foldmul_acc must reproduce the EXACT fp-operation sequence of a
    scalar left-to-right fold — this is what makes the vectorized ANN
    scorer hash-identical to the JVM/DuckDB folds."""
    X = np.array(vs, dtype=np.float64)
    Q = X[::-1].copy()
    got = _foldmul_acc(X, Q)
    for r in range(X.shape[0]):
        for q in range(Q.shape[0]):
            acc = 0.0
            for d in range(X.shape[1]):
                acc += X[r, d] * Q[q, d]
            assert got[r, q] == acc  # bitwise, not approx
    sq = _fold_sq_norm(X)
    for r in range(X.shape[0]):
        acc = 0.0
        for d in range(X.shape[1]):
            acc += X[r, d] * X[r, d]
        assert sq[r] == acc


@given(texts, texts)
@settings(max_examples=50, deadline=None)
def test_minhash_signature_is_set_based(t1, t2):
    """Signatures depend only on the shingle SET: texts with equal
    shingle sets (e.g. a text and itself) get equal signatures, and
    any signature position is the min over the permuted codes."""
    from duckdb_sudan__spark.operators.dedup import _MH_A

    for t in (t1, t2):
        codes = _byte_shingle_hashes(t)
        grid = _MH_A[:, None] * codes[None, :]
        sig = grid.min(axis=1)
        sig2 = (_MH_A[:, None] * _byte_shingle_hashes(t)[None, :]).min(axis=1)
        assert np.array_equal(sig, sig2)
        # each position is attained by some code under that permutation
        for k in (0, len(_MH_A) // 2, len(_MH_A) - 1):
            assert sig[k] in (_MH_A[k] * codes)


# ---------------------------------------------------------------------------
# r4: trigram-code and Gram-matrix Jaccard kernel invariants
# ---------------------------------------------------------------------------

from duckdb_sudan__spark.operators.dedup import (  # noqa: E402
    JACCARD_TAU,
    _jaccard_block_pairs,
    _trigram_codes,
)


def _trigram_set(t: str) -> set:
    """Reference semantics: substring(i, 3) over 1..max(len-2, 1)."""
    return {t[i : i + 3] for i in range(max(len(t) - 2, 1))}


@given(texts)
@settings(max_examples=200, deadline=None)
def test_trigram_codes_count_matches_distinct_trigrams(t):
    assert len(_trigram_codes(t)) == len(_trigram_set(t))


@given(texts, texts)
@settings(max_examples=200, deadline=None)
def test_trigram_code_sets_equal_iff_trigram_sets_equal(t1, t2):
    codes_eq = np.array_equal(_trigram_codes(t1), _trigram_codes(t2))
    sets_eq = _trigram_set(t1) == _trigram_set(t2)
    assert codes_eq == sets_eq


def test_trigram_codes_nul_pad_injective():
    """Regression (r5 ADVICE): short-text padding must use a sentinel
    outside Unicode, not 0 — '' vs '\\x00' and 'a' vs 'a\\x00' are
    distinct shingle strings and must get distinct codes. With
    zero-padding they collided and _jaccard_block_pairs emitted a
    false (0, 1, 1.0) pair."""
    import pandas as pd

    for a, b in [("", "\x00"), ("a", "a\x00"), ("\x00", "\x00\x00")]:
        assert not np.array_equal(_trigram_codes(a), _trigram_codes(b))
    pdf = pd.DataFrame({"doc_id": np.array([0, 1], dtype=np.int64), "text": ["", "\x00"]})
    assert len(_jaccard_block_pairs(pdf)) == 0


# ---------------------------------------------------------------------------
# r5: embedding-cosine block kernel must be bit-exact vs the scalar fold
# ---------------------------------------------------------------------------

from duckdb_sudan__spark.operators.similarity import (  # noqa: E402
    NEAR_DUP_TAU,
    _emb_block_pairs,
)


def _scalar_fold_cos(a, b):
    """The JVM aggregate(zip_with(...)) semantics: one rounded multiply
    + one rounded add per dimension, strictly left-to-right, then
    dot / (sqrt(na) * sqrt(nb))."""
    import math

    dot = na = nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
    for x in a:
        na += x * x
    for y in b:
        nb += y * y
    denom = math.sqrt(na) * math.sqrt(nb)
    return dot / denom if denom else float("nan")


@given(
    st.integers(min_value=1, max_value=8).flatmap(
        lambda dim: st.lists(
            st.lists(
                st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, width=32),
                min_size=dim,
                max_size=dim,
            ),
            min_size=0,
            max_size=8,
        )
    )
)
@settings(max_examples=100, deadline=None)
def test_emb_block_pairs_bit_exact_vs_scalar_fold(vecs):
    """The chunked numpy fold kernel must emit BIT-IDENTICAL raw cosine
    doubles to the scalar left-to-right fold it replaced, and exactly
    the pairs surviving the τ - 1e-6 pre-filter (NaN kept)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(vecs), dtype=np.int64), "embedding": vecs}
    )
    got = {
        (int(a), int(b)): c
        for a, b, c in _emb_block_pairs(pdf).itertuples(index=False, name=None)
    }
    want = {}
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            cos = _scalar_fold_cos(vecs[i], vecs[j])
            if not (cos < NEAR_DUP_TAU - 1e-6):  # keeps NaN, like the kernel
                want[(i, j)] = cos
    assert set(got) == set(want)
    for k, v in want.items():
        g = got[k]
        assert (np.isnan(g) and np.isnan(v)) or np.float64(g) == np.float64(v), (k, g, v)


@given(st.lists(st.text(min_size=0, max_size=60), min_size=0, max_size=12))
@settings(max_examples=100, deadline=None)
def test_gram_matrix_pairs_equal_naive_set_loop(docs):
    """The chunked float32 Gram matrix must produce EXACTLY the pairs
    (ids and IEEE jac values) of the per-pair Python set loop it
    replaced — intersection counts are integers ≪ 2^24, so float32
    matmul is exact and the division identical."""
    import pandas as pd

    pdf = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs})
    got = _jaccard_block_pairs(pdf)
    got_pairs = {(int(a), int(b)): float(j) for a, b, j in got.itertuples(index=False, name=None)}
    want = {}
    sets = [_trigram_set(t) for t in docs]
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            inter = len(sets[i] & sets[j])
            jac = inter / (len(sets[i]) + len(sets[j]) - inter)
            if jac >= JACCARD_TAU:
                want[(i, j)] = jac
    assert got_pairs == want


from duckdb_sudan__spark.operators.similarity import KNN_K, _emb_block_knn  # noqa: E402


def _guarded_fold_cos(a, b):
    """Scalar left-fold cosine with the kernel's zero-norm guard
    (cos = 0.0 when either norm is 0, never NaN)."""
    import math

    dot = na = nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
    for x in a:
        na += x * x
    for y in b:
        nb += y * y
    denom = math.sqrt(na) * math.sqrt(nb)
    return dot / denom if denom != 0.0 else 0.0


@given(
    st.integers(min_value=1, max_value=6).flatmap(
        lambda dim: st.lists(
            st.lists(
                st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, width=32),
                min_size=dim,
                max_size=dim,
            ),
            min_size=0,
            max_size=10,
        )
    )
)
@settings(max_examples=100, deadline=None)
def test_emb_block_knn_selection_equals_full_rerank(vecs):
    """Ranking the kernel's slack-band candidates (round→desc,
    id-tiebreak→top-K) must select EXACTLY the same neighbor set, in
    the same order, as ranking ALL pairs — i.e. the band never drops a
    candidate the rounded ordering could promote — and every emitted
    raw cosine must be bit-identical to the scalar fold."""
    import pandas as pd

    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(vecs), dtype=np.int64), "embedding": vecs}
    )
    out = _emb_block_knn(pdf)
    got = {
        (int(a), int(b)): c for a, b, c in out.itertuples(index=False, name=None)
    }
    for (i, j), c in got.items():
        ref = _guarded_fold_cos(vecs[i], vecs[j])
        assert np.float64(c) == np.float64(ref), ((i, j), c, ref)

    def topk(cands):
        ranked = sorted(cands, key=lambda jc: (-round(jc[1], 6), jc[0]))
        return [j for j, _ in ranked[:KNN_K]]

    for i in range(len(vecs)):
        full = [(j, _guarded_fold_cos(vecs[i], vecs[j])) for j in range(len(vecs)) if j != i]
        if not full:
            continue
        mine = [(j, c) for (a, j), c in got.items() if a == i]
        assert topk(mine) == topk(full), (i, sorted(mine), sorted(full))


from collections import Counter  # noqa: E402

from duckdb_sudan__spark.operators.sketches import _misra_gries  # noqa: E402


@given(
    st.lists(st.integers(min_value=0, max_value=30).map(str), min_size=0, max_size=400),
    st.integers(min_value=1, max_value=10),
)
@settings(max_examples=200, deadline=None)
def test_misra_gries_keeps_every_heavy_hitter(tokens, k):
    """The MG frequency guarantee sketch_heavy_hitters' exactness rests
    on: every token with count > n/(k+1) survives the k-slot summary —
    the merged candidate set can therefore never miss a true heavy
    hitter, only carry extras (which the exact recount filters)."""
    summary = _misra_gries(tokens, k)
    n = len(tokens)
    for tok, cnt in Counter(tokens).items():
        if cnt > n / (k + 1):
            assert tok in summary, (tok, cnt, n, k, summary)
    assert len(summary) <= k


@given(
    st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=120),
    st.integers(min_value=3, max_value=40),
)
@settings(max_examples=200, deadline=None)
def test_lttb_select_invariants(ys, n_out):
    """LTTB selection on arbitrary series: endpoints always kept,
    indices strictly increasing (a subsequence), output length is
    min(n_out, n) for n_out >= 3, and a constant series is handled
    (all-zero triangle areas -> first index per bucket, no crash)."""
    from duckdb_sudan__spark.operators.olap12 import _lttb_select

    x = np.arange(len(ys), dtype=np.float64)
    y = np.array(ys, dtype=np.float64)
    keep = _lttb_select(x, y, n_out)
    assert np.all(np.diff(keep) > 0) or len(keep) == 1
    if n_out >= len(ys):
        assert list(keep) == list(range(len(ys)))
    else:
        assert len(keep) == n_out
        assert keep[0] == 0 and keep[-1] == len(ys) - 1


_iv = st.tuples(st.integers(0, 500), st.integers(0, 60)).map(lambda t: (t[0], t[0] + t[1]))


@given(st.lists(_iv, min_size=0, max_size=25), st.lists(_iv, min_size=0, max_size=25))
@settings(max_examples=200, deadline=None)
def test_interval_grid_bucketing_exactly_once(a_ivs, b_ivs):
    """The grid-bucketing rule join_interval_overlap relies on, checked
    exhaustively in pure python against the O(n·m) reference: exploding
    each interval over its cells, equi-joining on cell, and keeping only
    the cell containing max(start_a, start_b) yields EVERY overlapping
    pair EXACTLY once — for any cell width and any interval lengths
    (including zero-length and multi-cell intervals)."""
    for width in (7, 61):
        cells = lambda lo, hi: range(lo // width, hi // width + 1)  # noqa: E731
        got = []
        for ai, (alo, ahi) in enumerate(a_ivs):
            for bi, (blo, bhi) in enumerate(b_ivs):
                for c in set(cells(alo, ahi)) & set(cells(blo, bhi)):
                    if alo <= bhi and blo <= ahi and c == max(alo, blo) // width:
                        got.append((ai, bi))
        want = [
            (ai, bi)
            for ai, (alo, ahi) in enumerate(a_ivs)
            for bi, (blo, bhi) in enumerate(b_ivs)
            if alo <= bhi and blo <= ahi
        ]
        assert sorted(got) == sorted(want)  # no duplicates, no misses


def test_kmeans_lloyd_inertia_monotone_and_matches_local(spark):
    """Distributed Lloyd == the textbook algorithm: (1) the
    per-iteration inertia sequence never increases; (2) replaying the
    same seeded iterations in local numpy on the same data reproduces
    the final centroids and per-cluster counts."""
    import numpy as np

    from duckdb_sudan__spark.operators.similarity import (
        KMEANS_K,
        KMEANS_LLOYD_ITERS,
        kmeans_lloyd_history,
    )
    from duckdb_sudan__spark.session import load_table

    sf = "/root/testdata/sf0.001"
    summary, hist, cent = kmeans_lloyd_history(spark, sf)
    assert all(hist[i + 1] <= hist[i] + 1e-9 for i in range(len(hist) - 1)), hist

    rows = load_table(spark, sf, "embeddings").select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r.vec_id)
    x = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    c = x[:KMEANS_K].copy()
    for _ in range(KMEANS_LLOYD_ITERS):
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        for k in range(KMEANS_K):
            if (a == k).any():
                c[k] = x[a == k].mean(axis=0)
    # final distributed assignment was taken BEFORE the last update —
    # recompute the local assignment against the pre-update model
    c_pre = x[:KMEANS_K].copy()
    for _ in range(KMEANS_LLOYD_ITERS - 1):
        d2 = ((x[:, None, :] - c_pre[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        for k in range(KMEANS_K):
            if (a == k).any():
                c_pre[k] = x[a == k].mean(axis=0)
    d2 = ((x[:, None, :] - c_pre[None, :, :]) ** 2).sum(axis=2)
    a_final = np.argmin(d2, axis=1)
    want_counts = {k: int((a_final == k).sum()) for k in range(KMEANS_K) if (a_final == k).any()}
    got_counts = {r.cluster: r.n_vecs for r in summary.collect()}
    assert got_counts == want_counts
    assert np.allclose(cent, c, atol=1e-9)


def test_countmin_never_undercounts_and_bounded(spark, duck):
    """CM guarantee on the shipped relation: estimate >= exact for
    every probe, and overcount <= 2N/w for at least 3 of the 4 rows'
    min (here: assert the reported min-estimate is within 4N/w — a
    loose deterministic bound that would catch a broken hash or a
    dropped update immediately)."""
    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.operators.sketches import CMS_WIDTH

    from tests.conftest import SF_DIR

    rows = QUERIES["sketch_countmin"](spark, SF_DIR).collect()
    assert rows
    n_total = duck.execute(
        "SELECT COUNT(*) FROM (SELECT unnest(string_split(text,' ')) FROM documents)"
    ).fetchone()[0]
    for r in rows:
        assert r.cms_est >= r.exact_n, r
        assert r.overcount <= 4 * n_total / CMS_WIDTH, (r, n_total)


def test_semantic_dedup_matches_local_replay(spark):
    """dedup_semantic_clusters == a straight-line local replay: same
    trained centroids, same blockwise assignment arithmetic, and the
    SAME per-cluster decision code (_semdedup_decide) driven locally
    over pandas groups — the distribution (Arrow batching, shuffle,
    task placement) must not change a single keep/drop decision."""
    import numpy as np
    import pandas as pd

    from duckdb_sudan__spark.operators.similarity import (
        _semdedup_decide,
        kmeans_lloyd_history,
        semantic_dedup,
    )
    from duckdb_sudan__spark.session import load_table

    sf = "/root/testdata/sf0.001"
    _, _, cent = kmeans_lloyd_history(spark, sf)
    got = sorted(map(tuple, semantic_dedup(spark, sf, cent=cent).collect()))

    rows = load_table(spark, sf, "embeddings").select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    X = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    d2 = (X * X).sum(axis=1, keepdims=True) - 2.0 * (X @ cent.T) + (cent * cent).sum(axis=1)[None, :]
    a = np.argmin(d2, axis=1).astype(np.int32)
    sq = d2[np.arange(len(X)), a]
    want = []
    for k in sorted(set(a.tolist())):
        m = a == k
        pdf = pd.DataFrame(
            {
                "vec_id": ids[m],
                "embedding": [X[i] for i in np.nonzero(m)[0]],
                "cluster": a[m],
                "sqdist": sq[m],
            }
        )
        out = _semdedup_decide(pdf)
        want.extend(map(tuple, out.itertuples(index=False)))
    assert got == sorted(want)
    drops = sum(1 for t in got if not t[4])
    assert 0 < drops < len(got)  # some dups found, not everything merged


def test_semantic_dedup_oversized_cluster_subblocked(spark, tmp_path):
    """Adversarial SemDeDup fixture (r8 verdict item 4): 1000 IDENTICAL
    vectors all land in ONE k-means cluster; with the cap patched tiny
    the decide stage must split it into hash-mod sub-blocks so no task
    ever sees the whole cluster (Gram bound ~cap², not |cluster|²),
    while the per-sub contract still holds: every vector keeps exactly
    one row, each sub-component names exactly one canonical, and the
    total canonical count equals the sub-block count (identical
    vectors: one τ-component per sub). A healthy second cluster under
    the cap must keep sub = 0 semantics (single canonical)."""
    import numpy as np

    from duckdb_sudan__spark.operators.similarity import semantic_dedup

    n = 1000
    hot = [1.0] + [0.0] * 15
    cold = [0.0] * 15 + [1.0]
    rows = [(i, hot, 0) for i in range(n)] + [(n + j, cold, 1) for j in range(5)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(4).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")

    cent = np.array([hot, cold], dtype=np.float64)
    cap = 64
    out = semantic_dedup(spark, str(tmp_path), cent=cent, cluster_cap=cap).collect()
    assert len(out) == n + 5
    assert len({r.vec_id for r in out}) == n + 5  # one row per vector

    hot_rows = [r for r in out if r.vec_id < n]
    canons = [r for r in hot_rows if r.is_canonical]
    n_sub = -(-n // cap)  # ceil(1000/64) = 16 sub-blocks
    assert len(canons) == n_sub, len(canons)
    # hash-mod spread is multinomial around n/n_sub; a 4x-cap group
    # would mean the sub-salt never fired
    from collections import Counter

    sizes = Counter(r.canonical_id for r in hot_rows)
    assert max(sizes.values()) <= 4 * cap, sizes.most_common(3)
    for r in hot_rows:  # every member's canonical is in its own group
        assert (r.canonical_id in sizes) and not (r.is_canonical ^ (r.vec_id == r.canonical_id))

    cold_rows = [r for r in out if r.vec_id >= n]
    assert sum(1 for r in cold_rows if r.is_canonical) == 1  # healthy path intact


def test_pq_adc_recall_vs_exact_topk(spark):
    """The PQ/ADC tier's configured recall bound (r8 verdict item 5):
    top-5 recall vs the exact brute-force tier must hold on the served
    corpus (measured 1.0 at sf0.01 and 0.94 at sf0.1 with K=32, R=200;
    pinned with headroom), and the reranked cosines of every agreed
    pair must be IDENTICAL to the exact tier's (same JVM fold, same
    rounding — the rerank is exact, only candidate selection is
    approximate)."""
    from duckdb_sudan__spark.operators import QUERIES
    from tests.conftest import SF_DIR as sf

    exact = {(r.query_id, r.neighbor_id): r.cos for r in QUERIES["ann_topk_cosine"](spark, sf).collect()}
    pq = {(r.query_id, r.neighbor_id): r.cos for r in QUERIES["ann_pq_adc"](spark, sf).collect()}
    assert len(pq) == len(exact)
    hits = set(exact) & set(pq)
    assert len(hits) / len(exact) >= 0.9, len(hits) / len(exact)
    for k in hits:
        assert exact[k] == pq[k], k


def test_business_days_formula_matches_calendar():
    """The integer weekday-count formula dt_business_days evaluates in
    SQL — g(n) = 5·((n+3) div 7) + least((n+3) mod 7, 5), bdays(a, b)
    = g(b) − g(a) — must equal a brute-force weekday walk for every
    epoch-day pair in a 60-year span (sampled start days × offsets).
    Pure Python: pins the FORMULA, independent of either engine."""
    from datetime import date, timedelta

    def g(n: int) -> int:
        return 5 * ((n + 3) // 7) + min((n + 3) % 7, 5)

    epoch = date(1970, 1, 1)
    for start in range(0, 22000, 367):  # ~60 years of start days, all weekdays hit
        for off in (0, 1, 2, 3, 6, 7, 13, 30, 365, 1000):
            a, b = start, start + off
            brute = sum(
                1
                for i in range(a, b)
                if (epoch + timedelta(days=i)).weekday() < 5
            )
            assert g(b) - g(a) == brute, (a, b, g(b) - g(a), brute)


def test_ivfpq_recall_vs_ivf_and_exact_rerank_values(spark):
    """IVFADC isolates its losses: candidate cells are the SAME probe
    set as ann_ivf_cosine (same seeded coarse trainer), so recall vs
    the plain-IVF tier measures only the PQ truncation (measured 1.0
    at sf0.01, 0.92 at sf0.1 with residual books K=32, R=200); agreed
    pairs carry IDENTICAL exact cosines (the rerank is exact)."""
    from duckdb_sudan__spark.operators import QUERIES
    from tests.conftest import SF_DIR as sf

    ivf = {(r.query_id, r.neighbor_id): r.cos for r in QUERIES["ann_ivf_cosine"](spark, sf).collect()}
    ivfpq = {(r.query_id, r.neighbor_id): r.cos for r in QUERIES["ann_ivfpq"](spark, sf).collect()}
    assert len(ivfpq) == len(ivf)
    hits = set(ivf) & set(ivfpq)
    assert len(hits) / len(ivf) >= 0.9, len(hits) / len(ivf)
    for k in hits:
        assert ivf[k] == ivfpq[k], k


@given(
    st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=300, unique=True),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=60, deadline=None)
def test_md5_prefix_slice_rank_equals_single_window_rank(doc_ids, prefix_len):
    """The FORMULA behind the r10 cache-free sample_exact_stratified:
    rank-by-(md5, id) computed as (count in strictly-smaller hash-
    prefix slices) + (local rank within the slice) must equal the
    single-window global rank, for ANY prefix length — because a
    fixed-width lowercase-hex prefix orders exactly like the full
    hash. Pure Python; independent of either engine."""
    import hashlib

    rows = [(hashlib.md5(str(i).encode()).hexdigest(), i) for i in doc_ids]
    global_rank = {r: k + 1 for k, r in enumerate(sorted(rows))}
    slices = {}
    for h, i in rows:
        slices.setdefault(h[:prefix_len], []).append((h, i))
    # offset = total count in strictly-smaller slices (prefix order)
    off, offsets = 0, {}
    for s in sorted(slices):
        offsets[s] = off
        off += len(slices[s])
    for s, members in slices.items():
        for local_rank, r in enumerate(sorted(members), start=1):
            assert offsets[s] + local_rank == global_rank[r], (s, r)


# ---------------------------------------------------------------------------
# r11 geometry kernels: the two independently-coded exact clippers
# ---------------------------------------------------------------------------

@given(
    # random axis-aligned rectangles as the subject polygon (exact
    # containment algebra is checkable), random clip boxes
    x0=st.integers(-20, 20), y0=st.integers(-20, 20),
    w=st.integers(1, 25), h=st.integers(1, 25),
    bx0=st.integers(-15, 15), by0=st.integers(-15, 15),
    bw=st.integers(1, 20), bh=st.integers(1, 20),
)
@settings(max_examples=200, deadline=None)
def test_clippers_agree_and_match_rect_algebra(x0, y0, w, h, bx0, by0, bw, bh):
    """For rectangle ∩ box the exact intersection area is computable
    by interval algebra — BOTH Sutherland–Hodgman implementations
    (query-side determinant form, oracle-side trapezoid form) must
    return exactly 2·that, for every random configuration including
    touching edges and zero-overlap cases."""
    from duckdb_sudan__spark.geo.spatial import _clip_2area, _oracle_clip_2area

    M = 1_000_000
    rect = {"type": "Polygon", "coordinates": [[
        (x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h), (x0, y0),
    ]]}
    box = (bx0 * M, (bx0 + bw) * M, by0 * M, (by0 + bh) * M)
    ix = max(0, min(x0 + w, bx0 + bw) - max(x0, bx0))
    iy = max(0, min(y0 + h, by0 + bh) - max(y0, by0))
    want = 2 * (ix * M) * (iy * M)
    got_q = _clip_2area(rect, box)
    got_o = _oracle_clip_2area(rect, box)
    assert got_q == got_o == want


@given(
    # random simple rectilinear "staircase" polygons: x-monotone, so
    # vertices built from sorted xs with random heights are simple
    xs=st.lists(st.integers(-12, 12), min_size=3, max_size=6, unique=True),
    hs=st.lists(st.integers(1, 15), min_size=2, max_size=5),
    bx0=st.integers(-10, 10), by0=st.integers(-5, 10),
    bw=st.integers(1, 15), bh=st.integers(1, 15),
)
@settings(max_examples=150, deadline=None)
def test_clippers_agree_on_staircase_polygons(xs, hs, bx0, by0, bw, bh):
    """Non-convex subjects: both independently coded clippers must
    agree exactly on x-monotone staircase polygons against random
    boxes, and the clipped area can never exceed the unclipped area
    or the box area."""
    from duckdb_sudan__spark.geo.spatial import (
        _clip_2area,
        _geom_2area_and_parts,
        _oracle_clip_2area,
    )

    xs = sorted(xs)
    n = len(xs) - 1
    heights = [hs[i % len(hs)] for i in range(n)]
    top = []
    for i in range(n):
        top.append((xs[i], heights[i]))
        top.append((xs[i + 1], heights[i]))
    ring = [(xs[0], -2)] + top + [(xs[-1], -2), (xs[0], -2)]
    poly = {"type": "Polygon", "coordinates": [ring]}
    M = 1_000_000
    box = (bx0 * M, (bx0 + bw) * M, by0 * M, (by0 + bh) * M)
    got_q = _clip_2area(poly, box)
    got_o = _oracle_clip_2area(poly, box)
    assert got_q == got_o >= 0
    full, _, _ = _geom_2area_and_parts(poly)
    assert got_q <= full
    assert got_q <= 2 * (bw * M) * (bh * M)
