"""LLM-data-pipeline operators: oracle parity where SQL-expressible,
semantic invariants for the rest."""

import pytest

from duckdb_sudan__spark import operators
from duckdb_sudan__spark.operators import ORACLES, QUERIES
from tests.conftest import SF_DIR, assert_matches_oracle

operators.load_all()

ORACLED = ["text_tokens", "text_langid", "text_quality", "text_fingerprint",
           "dedup_exact", "dedup_ngram_jaccard", "ann_topk_cosine", "dedup_embedding"]
ROWS_ONLY = ["dedup_minhash_lsh", "dedup_simhash", "ann_lsh_cosine", "mm_decode_stub"]


@pytest.mark.parametrize("key", ORACLED)
def test_llm_op_matches_oracle(spark, duck, key):
    assert_matches_oracle(QUERIES[key](spark, SF_DIR), duck, ORACLES[key])


@pytest.mark.parametrize("key", ROWS_ONLY)
def test_rows_only_ops_run(spark, key):
    df = QUERIES[key](spark, SF_DIR)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) >= 2


def test_minhash_estimates_close_to_exact(spark):
    """LSH candidates' estimated jaccard should correlate with exact
    3-gram jaccard for the pairs both methods surface."""
    mh = {(r.id_a, r.id_b): r.est_jaccard for r in QUERIES["dedup_minhash_lsh"](spark, SF_DIR).collect()}
    exact = {(r.id_a, r.id_b): r.jac for r in QUERIES["dedup_ngram_jaccard"](spark, SF_DIR).collect()}
    common = set(mh) & set(exact)
    for k in common:
        assert abs(mh[k] - exact[k]) < 0.35, f"pair {k}: est {mh[k]} vs exact {exact[k]}"


def test_ann_lsh_is_subset_quality(spark):
    """LSH top-k cosine scores can't exceed brute-force top-k scores."""
    brute = {}
    for r in QUERIES["ann_topk_cosine"](spark, SF_DIR).collect():
        brute.setdefault(r.query_id, []).append(r.cos)
    lsh = {}
    for r in QUERIES["ann_lsh_cosine"](spark, SF_DIR).collect():
        lsh.setdefault(r.query_id, []).append(r.cos)
    for q, scores in lsh.items():
        assert max(scores) <= max(brute[q]) + 1e-9


def test_simhash_identical_docs_zero_hamming(spark):
    from duckdb_sudan__spark.operators.dedup import simhash64
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "a b c d"), (2, "a b c d"), (3, "x y z w")], ["id", "text"])
    sims = {r.id: r.s for r in df.select("id", simhash64(F.col("text")).alias("s")).collect()}
    assert sims[1] == sims[2]
    assert sims[1] != sims[3]


def test_multimodal_schema_and_determinism(spark):
    df = QUERIES["mm_decode_stub"](spark, SF_DIR)
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "media_format", "n_bytes", "width", "height", "feat_mean", "feat_std"
    ]
    a = df.limit(5).collect()
    b = df.limit(5).collect()
    assert a == b
    assert all(r.n_bytes > 0 and r.width >= 16 for r in a)


def test_ann_ivf_quality(spark):
    """IVF probes N_PROBE of N_CENTROIDS cells: scores must be a subset
    of brute-force quality, and recall must beat the random-scan floor
    (on structureless random embeddings recall ~= fraction probed)."""
    from duckdb_sudan__spark.operators.similarity import N_CENTROIDS, N_PROBE

    brute, ivf = {}, {}
    bmax = {}
    for r in QUERIES["ann_topk_cosine"](spark, SF_DIR).collect():
        brute.setdefault(r.query_id, set()).add(r.neighbor_id)
        bmax[r.query_id] = max(bmax.get(r.query_id, -2.0), r.cos)
    for r in QUERIES["ann_ivf_cosine"](spark, SF_DIR).collect():
        ivf.setdefault(r.query_id, set()).add(r.neighbor_id)
        assert r.cos <= bmax[r.query_id] + 1e-9
    recalls = [len(brute[q] & ivf.get(q, set())) / len(brute[q]) for q in brute]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall > N_PROBE / N_CENTROIDS, f"recall {mean_recall} no better than random scan"


def test_sketch_distinct_within_error(spark, duck):
    """HLL approx distinct must be within 5% of the exact count."""
    approx = {r.event_type: r.approx_users for r in QUERIES["sketch_distinct"](spark, SF_DIR).collect()}
    exact = dict(duck.sql("SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY 1").fetchall())
    assert set(approx) == set(exact)
    for et in exact:
        assert abs(approx[et] - exact[et]) <= max(1, 0.05 * exact[et]), (et, approx[et], exact[et])


def test_sketch_quantiles_within_error(spark, duck):
    """percentile_approx must land within 2% relative error of exact."""
    rows = {r.l_returnflag: (r.p50, r.p95, r.p99) for r in QUERIES["sketch_quantiles"](spark, SF_DIR).collect()}
    exact = {
        r[0]: (r[1], r[2], r[3])
        for r in duck.sql(
            "SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5), "
            "quantile_cont(l_extendedprice, 0.95), quantile_cont(l_extendedprice, 0.99) "
            "FROM lineitem GROUP BY 1"
        ).fetchall()
    }
    for flag, (a50, a95, a99) in rows.items():
        for a, b in zip((a50, a95, a99), exact[flag]):
            assert abs(a - b) <= 0.02 * abs(b), (flag, a, b)


def test_salted_join_matches_plain(spark, duck):
    """Salting redistributes the shuffle; the result must be identical."""
    assert_matches_oracle(QUERIES["skew_salted_join"](spark, SF_DIR), duck, ORACLES["skew_salted_join"])


def test_mm_resize_shape_and_determinism(spark):
    a = QUERIES["mm_resize"](spark, SF_DIR).collect()
    b = QUERIES["mm_resize"](spark, SF_DIR).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert all(len(r.thumb) == 64 for r in a)


def test_mm_frame_sample_fanout(spark):
    """Every doc emits ceil(n_frames / stride) rows — the 1→N contract."""
    import math

    from duckdb_sudan__spark.operators.multimodal import FRAME_STRIDE

    rows = QUERIES["mm_frame_sample"](spark, SF_DIR).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in per_doc.items():
        expect = math.ceil(rs[0].n_frames / FRAME_STRIDE)
        assert len(rs) == expect, (doc, len(rs), expect)


def test_mm_audio_chunks_energy(spark):
    rows = QUERIES["mm_audio_chunks"](spark, SF_DIR).collect()
    assert len(rows) > 0
    assert all(r.rms >= 0 for r in rows)
    assert all(0 <= r.zero_crossings < 256 for r in rows)


def test_mm_dedup_phash_catches_exact_dups(spark):
    """Band-pigeonhole completeness at hamming 0: every pair whose
    payloads hash to the SAME 64-bit phash (computed locally with the
    operator's own kernels) must survive the (band, chunk) equi-join —
    the blocking may add candidates, but it must never lose an
    identical-hash pair."""
    from itertools import combinations

    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.operators.multimodal import _fake_decode, _phash64
    from duckdb_sudan__spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    groups: dict[int, list[int]] = {}
    for r in docs:
        ph = _phash64(_fake_decode((r.text or "").encode("utf-8"))[2])
        groups.setdefault(ph, []).append(r.doc_id)
    want = {
        (a, b)
        for ids in groups.values()
        if len(ids) > 1
        for a, b in combinations(sorted(ids), 2)
    }
    assert want, "corpus should contain equal-phash payload pairs"
    got = {
        (r.id_a, r.id_b)
        for r in QUERIES["mm_dedup_phash"](spark, SF_DIR).where("hamming = 0").collect()
    }
    assert want == got


def test_emb_random_projection_deterministic_and_distance_preserving(spark):
    """Fixed-seed projection: identical output across runs, output dim
    PROJ_DIM, and pairwise cosine roughly preserved on average
    (Johnson-Lindenstrauss at k=16 is loose — assert a weak bound)."""
    import numpy as np

    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.operators.similarity import PROJ_DIM

    a = QUERIES["emb_random_projection"](spark, SF_DIR).collect()
    b = QUERIES["emb_random_projection"](spark, SF_DIR).collect()
    assert [(r.vec_id, tuple(r.proj)) for r in a] == [(r.vec_id, tuple(r.proj)) for r in b]
    assert all(len(r.proj) == PROJ_DIM for r in a)

    from duckdb_sudan__spark.session import load_table

    orig = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in load_table(spark, SF_DIR, "embeddings").collect()}
    proj = {r.vec_id: np.asarray(r.proj) for r in a}
    rng = np.random.default_rng(7)
    ids = sorted(orig)
    cos = lambda x, y: float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y)))  # noqa: E731
    errs = []
    for _ in range(200):
        i, j = rng.choice(ids, 2, replace=False)
        errs.append(abs(cos(orig[i], orig[j]) - cos(proj[i], proj[j])))
    assert np.mean(errs) < 0.25  # k=16 JL: loose but real preservation


def test_brute_cosine_zero_norm_guard(spark):
    """An all-zero embedding must yield cos=0 rows, never NaN/±inf
    (NaN compares false against thresholds but inf survives top-k —
    both diverge from the oracle; ADVICE r2)."""
    import math

    from duckdb_sudan__spark.operators.similarity import _brute_cosine_scored

    rows = [(0, [1.0, 0.0, 2.0]), (1, [0.0, 0.0, 0.0]), (50, [3.0, 1.0, 0.5])]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    scored = _brute_cosine_scored(spark, e).collect()
    assert scored  # the corpus row still pairs with both queries
    assert all(math.isfinite(r.cos) for r in scored)
    zero_rows = [r for r in scored if r.query_id == 1 or r.neighbor_id == 1]
    assert zero_rows and all(r.cos == 0.0 for r in zero_rows)


def test_emb_pca_matches_numpy_exact_pca(spark):
    """The one-pass partial-moment PCA must agree with a direct numpy
    PCA over the collected corpus: same top-8 eigenvalues of the
    sample covariance (rtol 1e-9 — accumulation order differs, values
    must not) and a valid explained-ratio simplex."""
    import numpy as np

    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.session import load_table

    out = QUERIES["emb_pca_covariance"](spark, SF_DIR).collect()
    X = np.stack(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in load_table(spark, SF_DIR, "embeddings").select("embedding").collect()
        ]
    )
    cov = np.cov(X, rowvar=False, ddof=1)
    ref = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert len(out) == 8
    for r in out:
        assert np.isclose(r["eigenvalue"], ref[r["component"]], rtol=1e-9)
    ratios = [r["explained_ratio"] for r in out]
    assert all(ratios[i] >= ratios[i + 1] for i in range(len(ratios) - 1))
    assert 0 < sum(ratios) <= 1.0 + 1e-12


def test_chunk_overlap_invariants_and_reconstruction(spark):
    """Semantic correctness of the chunker (the oracle only proves
    Spark ≡ DuckDB, not that both are right): every chunk except a
    ragged tail is exactly CHUNK_SIZE tokens; consecutive chunks of a
    doc overlap by CHUNK_SIZE − CHUNK_STRIDE tokens; and dropping the
    overlap from every chunk after the first reconstructs the original
    token stream exactly (no token lost or duplicated)."""
    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.operators.text2 import CHUNK_SIZE, CHUNK_STRIDE
    from duckdb_sudan__spark.session import load_table

    chunks = QUERIES["text_chunk_overlap"](spark, SF_DIR).collect()
    originals = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(originals)
    overlap = CHUNK_SIZE - CHUNK_STRIDE
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        toks = originals[doc_id]
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        rebuilt: list[str] = []
        for r in rows:
            ctoks = r["chunk_text"].split(" ") if r["chunk_text"] else []
            assert r["n_tokens"] == len(ctoks)
            if r["chunk_idx"] < len(rows) - 1 and len(toks) >= CHUNK_SIZE:
                if r["chunk_idx"] * CHUNK_STRIDE + CHUNK_SIZE <= len(toks):
                    assert len(ctoks) == CHUNK_SIZE
            rebuilt.extend(ctoks if not rebuilt else ctoks[overlap:] if len(ctoks) >= overlap else [])
        # tail chunks shorter than the overlap add nothing new — they
        # are fully contained in the previous window
        assert rebuilt == toks, f"doc {doc_id}: reconstruction mismatch"


def test_bm25_matches_pure_python_reference(spark):
    """The BM25 entry must agree with an independent from-scratch
    Python implementation of Robertson BM25 (rational idf variant) on
    the real corpus — the DuckDB oracle only proves both ENGINES run
    the same formula, not that the formula is BM25."""
    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.operators.text2 import BM25_B, BM25_K1, BM25_TERMS
    from duckdb_sudan__spark.session import load_table

    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    }
    n = float(len(docs))
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {t: float(sum(1 for toks in docs.values() if t in toks)) for t in BM25_TERMS}

    def score(toks):
        s = 0.0
        for t in BM25_TERMS:
            tf = float(toks.count(t))
            idf = (n - df[t] + 0.5) / (df[t] + 0.5)
            s += idf * (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * (len(toks) / avgdl))
            )
        return s

    expected = sorted(
        ((score(toks), doc_id) for doc_id, toks in docs.items()),
        key=lambda x: (-x[0], x[1]),
    )[:10]
    got = QUERIES["bm25_rank"](spark, SF_DIR).collect()
    assert [r["doc_id"] for r in got] == [d for _, d in expected]
    for r, (s, _) in zip(got, expected):
        assert abs(r["score"] - s) < 1e-9 * max(1.0, abs(s))


def test_tfidf_matches_pure_python_reference(spark):
    """tfidf_topk's top-3 terms per doc must match an independent
    Python tf·(N/df) computation with the same (score desc, token asc)
    tie-break."""
    from collections import Counter

    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.session import load_table

    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    }
    n = float(len(docs))
    df: Counter = Counter()
    for toks in docs.values():
        df.update(set(toks))
    expected = {}
    for doc_id, toks in docs.items():
        tf = Counter(toks)
        scored = sorted(
            ((float(c) * (n / float(df[t])), t, c) for t, c in tf.items()),
            key=lambda x: (-x[0], x[1]),
        )[:3]
        expected[doc_id] = [(t, c, s) for s, t, c in scored]
    got: dict[int, list] = {}
    for r in QUERIES["tfidf_topk"](spark, SF_DIR).collect():
        got.setdefault(r["doc_id"], []).append((r["tok"], r["tf"], r["score"]))
    assert set(got) == set(expected)
    for doc_id in expected:
        assert [(t, c) for t, c, _ in expected[doc_id]] == [(t, c) for t, c, _ in got[doc_id]]
        for (_, _, se), (_, _, sg) in zip(expected[doc_id], got[doc_id]):
            assert abs(se - sg) < 1e-9 * max(1.0, abs(se))


def test_gini_matches_pure_python_reference(spark):
    """agg_gini_diversity must equal 1 − Σ(cnt/total)² computed
    independently in Python per language."""
    from collections import Counter

    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.session import load_table

    rows = load_table(spark, SF_DIR, "documents").select("lang", "source").collect()
    per_lang: dict[str, Counter] = {}
    for r in rows:
        per_lang.setdefault(r["lang"], Counter())[r["source"]] += 1
    got = {r["lang"]: r for r in QUERIES["agg_gini_diversity"](spark, SF_DIR).collect()}
    assert set(got) == set(per_lang)
    for lang, counts in per_lang.items():
        total = sum(counts.values())
        gini = 1.0 - sum((c / total) ** 2 for c in counts.values())
        assert got[lang]["n_sources"] == len(counts)
        assert abs(got[lang]["gini"] - gini) < 1e-12


def test_emb_outlier_centroid_matches_numpy_reference(spark):
    """The per-cell outlier kernel must agree with an independent
    numpy computation: per label, the OUTLIER_TOP vectors with the
    smallest cosine to the label mean, ties on vec_id."""
    import numpy as np

    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.operators.similarity import OUTLIER_TOP
    from duckdb_sudan__spark.session import load_table
    from tests.conftest import SF_DIR

    got = [
        (r.label, r.vec_id, r.cos_to_centroid)
        for r in QUERIES["emb_outlier_centroid"](spark, SF_DIR).collect()
    ]
    rows = load_table(spark, SF_DIR, "embeddings").select("vec_id", "label", "embedding").collect()
    by_label: dict = {}
    for r in rows:
        by_label.setdefault(r.label, []).append((r.vec_id, np.asarray(r.embedding, dtype=np.float64)))
    expect = []
    for label in sorted(by_label):
        vecs = sorted(by_label[label])
        X = np.stack([v for _, v in vecs])
        ids = np.array([i for i, _ in vecs])
        c = X.mean(axis=0)
        cos = (X @ c) / (np.linalg.norm(X, axis=1) * np.linalg.norm(c))
        order = np.lexsort((ids, cos))[:OUTLIER_TOP]
        expect.extend((label, int(ids[k]), cos[k]) for k in order)
    expect.sort(key=lambda t: (t[0], t[2], t[1]))
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        assert g[0] == e[0] and g[1] == e[1], (g, e)
        assert abs(g[2] - e[2]) < 1e-9, (g, e)


def test_est_calibration_recall_and_gap(spark):
    """The calibration audit's own quality bars: every exact-tier
    near-dup pair must also be found by the LSH tier (recall 1.0 at
    τ=0.8 — the s-curve puts est≈0.9+ pairs in some band with
    near-certainty), and on the overlap the MinHash estimate must sit
    within 0.05 of the exact Jaccard on average."""
    from duckdb_sudan__spark.operators import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["dedup_est_calibration"](spark, SF_DIR).collect()
    assert sum(r.n_exact for r in rows) > 0, "no exact pairs — the audit is vacuous"
    for r in rows:
        assert r.n_both == r.n_exact, (
            f"{r.lang}: LSH missed {r.n_exact - r.n_both} exact-tier pairs"
        )
        if r.n_both:
            assert r.mean_abs_gap <= 0.05, (r.lang, r.mean_abs_gap)


def test_short_doc_sequence_guard(spark, tmp_path):
    """Regression for the r5 advice item: documents shorter than the
    n-gram width must yield NO rows (matching the oracle's empty
    generate_series) instead of a descending-sequence runtime error in
    lm_oov_rate / text_ngram_novelty."""
    import duckdb

    from duckdb_sudan__spark.operators import ORACLES, QUERIES
    from tests.conftest import assert_matches_oracle

    docs = [
        (0, "one", "en", "syn", 3),                     # 1 token: below bigram width
        (10, "a b", "en", "syn", 3),                    # 2 tokens: bigram ok, below 5-gram
        (20, "a b c d e f g", "en", "syn", 13),         # held-out (doc_id%10==0)
        (3, "a b c d e f g h", "en", "syn", 15),        # train
        (7, "w x", "en", "syn", 3),                     # train, 1 bigram
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'")
    for key in ("lm_oov_rate", "text_ngram_novelty"):
        df = QUERIES[key](spark, sf_dir)
        assert_matches_oracle(df, con, ORACLES[key])
    con.close()


def test_minhash_degenerate_bucket_guard(spark, tmp_path, monkeypatch):
    """Adversarial corpus for the r5 verdict item: 1000 IDENTICAL
    documents put every doc into one (band, bucket) per band. Without
    the sub-salt guard the candidate join is C(1000,2) ≈ 500k pairs;
    with it each hot bucket is tiled into ≤CAP sub-groups, bounding
    candidates at ~bands·(n/CAP)·C(CAP,2) — while the emitted pairs
    must STILL connect all 1000 docs into one component (the band-
    varying sub-group permutations guarantee connectivity w.h.p.)."""
    from duckdb_sudan__spark.operators import dedup

    n = 1000
    text = "the same boilerplate document body repeated verbatim across the crawl " * 3
    rows = [(i, text, "en", "syn", len(text)) for i in range(n)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(4).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    monkeypatch.setattr(dedup, "BUCKET_CAP", 8)
    counts = dedup.minhash_candidate_counts(spark, str(tmp_path))
    assert counts["docs"] == n
    assert counts["capped_buckets"] == 16, counts  # one hot bucket per band
    # hash-mod sub-groups of expected size 8: expected pairs/band is
    # C(n,2)/n_sub ≈ 4k, so 16 bands ≈ 64k — assert well under the
    # unguarded C(1000,2) = 499500 (3× headroom over the expectation)
    assert counts["candidate_pairs"] < n * (n - 1) // 2 // 3, counts

    pairs = dedup.dedup_minhash_lsh(spark, str(tmp_path)).collect()
    assert all(r.est_jaccard == 1.0 for r in pairs)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        a, b = find(int(r.id_a)), find(int(r.id_b))
        if a != b:
            parent[a] = b
    assert len({find(i) for i in range(n)}) == 1, "cluster split by the cap"


def test_knn_graph_tiled_path_oracle_exact_on_skewed_cells(spark, tmp_path, monkeypatch):
    """Skewed fixture for the r6 cell-tiling guard: one label holds
    most of the corpus, CELL_CAP is patched tiny so that label runs
    through the tile×tile kernel while small labels keep the
    single-task path — and the merged result must STILL be exactly the
    DuckDB oracle (same rounded ranks, same doubles)."""
    import duckdb
    import numpy as np

    from duckdb_sudan__spark.operators import similarity
    from duckdb_sudan__spark.operators import ORACLES, QUERIES
    from tests.conftest import assert_matches_oracle

    rng = np.random.default_rng(11)
    rows = []
    for vid in range(300):
        label = 0 if vid < 260 else (1 + vid % 3)  # label 0 is the skew cell
        rows.append((vid, [float(x) for x in rng.standard_normal(16).astype(np.float32)], label))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(2).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")

    monkeypatch.setattr(similarity, "CELL_CAP", 32)  # 260-vector cell → 9 tiles
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{tmp_path}/embeddings.parquet/*.parquet'")
    df = QUERIES["emb_knn_graph"](spark, str(tmp_path))
    assert_matches_oracle(df, con, ORACLES["emb_knn_graph"])
    con.close()


def test_dedup_incremental_superset_recall_on_hot_buckets(spark, tmp_path, monkeypatch):
    """Adversarial identical-docs fixture for the incremental dedup's
    documented divergence regime: when hot buckets trigger the guard,
    the full run's sub-salt drops cross-sub pairs, but the ingest
    (shard⋈corpus) leg of dedup_incremental is unsalted — it must find
    EVERY shard×corpus duplicate pair (recall 1.0 on the ingest path),
    strictly more than the full run restricted to the same pairs."""
    from duckdb_sudan__spark.operators import dedup

    n = 200
    text = "identical crawl boilerplate body repeated across every mirror " * 3
    rows = [(i, text, "en", "syn", len(text)) for i in range(n)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(2).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    monkeypatch.setattr(dedup, "BUCKET_CAP", 8)
    shard = {i for i in range(n) if i % dedup.INCR_SHARD_MOD == 0}
    corpus = set(range(n)) - shard
    want_ingest = {(min(a, b), max(a, b)) for a in shard for b in corpus}

    inc = dedup.dedup_incremental(spark, str(tmp_path)).collect()
    inc_ingest = {
        (r.id_a, r.id_b) for r in inc
        if (r.id_a in shard) != (r.id_b in shard)  # exactly one side in the shard
    }
    assert inc_ingest == want_ingest, "ingest leg must be recall-1.0 (unsalted)"
    assert all(r.est_jaccard == 1.0 for r in inc)

    full = dedup.dedup_minhash_lsh(spark, str(tmp_path)).collect()
    full_ingest = {
        (r.id_a, r.id_b) for r in full
        if (r.id_a in shard) != (r.id_b in shard)
    }
    # the sub-salt MUST have dropped some cross-sub pairs here, or the
    # fixture isn't exercising the divergence regime at all
    assert full_ingest < inc_ingest, (len(full_ingest), len(inc_ingest))


def test_dedup_incremental_equals_full_run_on_shard_pairs(spark):
    """The incremental-shard dedup (persisted index + shard-only
    signatures) must emit exactly the full-corpus run's pairs that
    touch the new shard — same ids, same estimates."""
    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.operators.dedup import INCR_SHARD_MOD

    inc = {(r.id_a, r.id_b, r.est_jaccard)
           for r in QUERIES["dedup_incremental"](spark, SF_DIR).collect()}
    full = QUERIES["dedup_minhash_lsh"](spark, SF_DIR).collect()
    want = {(r.id_a, r.id_b, r.est_jaccard) for r in full
            if r.id_a % INCR_SHARD_MOD == 0 or r.id_b % INCR_SHARD_MOD == 0}
    assert want, "fixture should contain shard-touching near-dup pairs"
    assert inc == want


def test_mm_scene_cuts_match_local_reference(spark):
    """Scene-cut rows must equal a local recompute over the same fake
    decode (per-doc frame diffs are task-local, so stream == local),
    and the corpus must exercise both cut and non-cut flags."""
    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.operators.multimodal import _frame_diffs
    from duckdb_sudan__spark.session import load_table

    got = [
        (r.doc_id, r.frame_idx, r.diff_mean, r.is_cut)
        for r in QUERIES["mm_video_scene_cuts"](spark, SF_DIR).collect()
    ]
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    want = []
    for r in sorted(docs, key=lambda x: x.doc_id):
        for idx, diff, flag in _frame_diffs((r.text or "").encode("utf-8")):
            want.append((r.doc_id, idx, diff, flag))
    assert got == sorted(want)
    flags = {f for *_, f in got}
    assert flags == {True, False}, f"degenerate threshold: {flags}"


def test_lttb_matches_independent_reference(spark):
    """ts_downsample_lttb against an INDEPENDENT straightforward LTTB
    implementation (written here, not imported from the operator):
    same kept days per series, endpoints fixed, kept points a strict
    subsequence of the input series."""
    import numpy as np

    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.operators.olap12 import LTTB_N_OUT
    from duckdb_sudan__spark.session import load_table
    from pyspark.sql import functions as F

    got = {}
    for r in QUERIES["ts_downsample_lttb"](spark, SF_DIR).collect():
        got.setdefault(r.event_type, []).append((r.pt_rank, r.day, r.mean_value))

    daily = (
        load_table(spark, SF_DIR, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(
            (
                F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(1_000_000.0)
            ).alias("mean_value")
        )
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r.mean_value))

    def reference_lttb(pts, n_out):
        # plain-python LTTB: endpoints kept; each interior bucket keeps
        # the max-triangle-area point vs (previous kept, next-bucket mean)
        pts = sorted(pts)
        n = len(pts)
        if n_out >= n:
            return pts
        xs = [p[0].timestamp() * 1e9 for p in pts]
        ys = [p[1] for p in pts]
        edges = np.linspace(1, n - 1, n_out - 1).astype(int)
        keep = [0]
        for b in range(n_out - 2):
            lo, hi = edges[b], edges[b + 1]
            if b + 2 <= n_out - 2:
                nlo, nhi = edges[b + 1], edges[b + 2]
            else:
                nlo, nhi = n - 1, n
            cx = sum(xs[nlo:nhi]) / (nhi - nlo)
            cy = sum(ys[nlo:nhi]) / (nhi - nlo)
            prev = keep[-1]
            best, best_area = lo, -1.0
            for i in range(lo, hi):
                area = abs((xs[prev] - cx) * (ys[i] - ys[prev]) - (xs[prev] - xs[i]) * (cy - ys[prev]))
                if area > best_area:
                    best, best_area = i, area
            keep.append(best)
        keep.append(n - 1)
        return [pts[i] for i in keep]

    assert set(got) == set(series)
    for etype, rows in got.items():
        rows.sort()
        kept_days = [d for _, d, _ in rows]
        want = reference_lttb(series[etype], LTTB_N_OUT)
        assert kept_days == [d for d, _ in want], etype
        assert [v for *_, v in rows] == [v for _, v in want], etype
        full = sorted(series[etype])
        assert kept_days[0] == full[0][0] and kept_days[-1] == full[-1][0]
        assert len(kept_days) == min(LTTB_N_OUT, len(full))
        assert kept_days == sorted(set(kept_days)), "not a strict subsequence"


def test_decontaminate_embedding_flags_both_ways(spark):
    """The τ calibration must leave both flag values populated (an
    all-False screen tests nothing), every flagged row's max_cos must
    clear τ after rounding slack, and eval vectors must be absent
    from the output."""
    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.operators.olap12 import (
        DECON_EMB_EVAL_MAX,
        DECON_EMB_MOD,
        DECON_EMB_TAU,
    )

    rows = QUERIES["decontaminate_embedding"](spark, SF_DIR).collect()
    flags = {r.contaminated for r in rows}
    assert flags == {True, False}, flags
    for r in rows:
        assert not (r.vec_id % DECON_EMB_MOD == 0 and r.vec_id < DECON_EMB_EVAL_MAX)
        if r.contaminated:
            assert r.max_cos >= DECON_EMB_TAU - 1e-6
            assert r.n_eval_hits >= 1
        else:
            assert r.n_eval_hits == 0


def test_gapfill_interpolate_all_kinds_and_exact_midpoints(spark):
    """All three kinds (obs/interp/edge) must appear at the test SF —
    the outage pattern is designed to be SF-invariant — and each
    interpolated value must lie between its neighbors (weak sanity on
    top of the exact-hash oracle gate)."""
    from duckdb_sudan__spark.operators import QUERIES

    rows = QUERIES["ts_gapfill_interpolate"](spark, SF_DIR).collect()
    kinds = {r.kind for r in rows}
    assert kinds == {"obs", "interp", "edge"}, kinds
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for rs in by_type.values():
        rs.sort(key=lambda r: r.day)
        for i, r in enumerate(rs):
            if r.kind == "edge":
                assert r.value_filled is None
            elif r.kind == "interp":
                obs_before = [q.value_filled for q in rs[:i] if q.kind == "obs"]
                obs_after = [q.value_filled for q in rs[i + 1:] if q.kind == "obs"]
                lo = min(obs_before[-1], obs_after[0])
                hi = max(obs_before[-1], obs_after[0])
                assert lo - 1e-9 <= r.value_filled <= hi + 1e-9


def test_hll_union_equals_direct_and_bounds_error(spark, duck):
    """Mergeability is lossless at fixed lgK: the per-type estimate
    from unioning daily sketches must EQUAL the direct whole-type
    sketch's estimate (same items -> same registers), and both must be
    within 5% of the exact distinct count."""
    rows = QUERIES["sketch_hll_partitioned_union"](spark, SF_DIR).collect()
    exact = dict(duck.sql(
        "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY 1"
    ).fetchall())
    assert {r.event_type for r in rows} == set(exact)
    for r in rows:
        assert r.approx_users_unioned == r.approx_users_direct, r
        assert r.n_daily_sketches > 1, "fixture must actually partition by day"
        assert abs(r.approx_users_unioned - exact[r.event_type]) <= max(
            1, 0.05 * exact[r.event_type]
        ), (r, exact[r.event_type])


def test_minhash_components_cover_pairs_and_respect_exact_clusters(spark):
    """Approximate-tier clustering invariants: every LSH pair's
    endpoints share a component; component ids are the min doc_id of
    their member set; and no exact-tier cluster splits across minhash
    components on this corpus (LSH recall 1.0 vs the exact tier is
    pinned separately by the calibration test)."""
    comp = {r.doc_id: r.component
            for r in QUERIES["dedup_minhash_components"](spark, SF_DIR).collect()}
    pairs = QUERIES["dedup_minhash_lsh"](spark, SF_DIR).collect()
    assert pairs
    for r in pairs:
        assert comp[r.id_a] == comp[r.id_b], (r.id_a, r.id_b)
    members = {}
    for doc, c in comp.items():
        members.setdefault(c, []).append(doc)
    for c, docs in members.items():
        assert c == min(docs), (c, min(docs))
    exact = {r.doc_id: r.component
             for r in QUERIES["dedup_components"](spark, SF_DIR).collect()}
    by_exact = {}
    for doc, c in exact.items():
        by_exact.setdefault(c, set()).add(doc)
    for c, docs in by_exact.items():
        got = {comp.get(d) for d in docs}
        assert len(got) == 1 and None not in got, (c, got)


def _brute_common_spans(tok_a, tok_b, min_len):
    """Quadratic token-level common-substring finder (independent
    reference for dedup_repeated_spans): all maximal common runs of
    >= min_len tokens between two token lists, as 0-based (start_a,
    start_b, length) triples — classic DP over match diagonals."""
    spans = []
    for off in range(-(len(tok_b) - 1), len(tok_a)):
        run = 0
        for j in range(len(tok_b)):
            i = off + j
            if 0 <= i < len(tok_a) and tok_a[i] == tok_b[j]:
                run += 1
            else:
                if run >= min_len:
                    spans.append((off + j - run, j - run, run))
                run = 0
        if run >= min_len:
            spans.append((off + len(tok_b) - run, len(tok_b) - run, run))
    return spans


def _repeated_spans_fixture(spark, sf_dir):
    """Corpus with planted verbatim passages: a 60-token passage shared
    by docs 0/1 at different offsets, a 55-token passage shared by
    docs 2/3/4, a sub-threshold 20-token passage in docs 5/6, unique
    filler everywhere else (uniq-<doc>-<i> tokens can never cross-doc
    match), and a doc shorter than the gram size."""
    passage_a = " ".join(f"alpha{w}" for w in range(60))
    passage_b = " ".join(f"beta{w}" for w in range(55))
    short = " ".join(f"gamma{w}" for w in range(20))

    def filler(doc, n, tag):
        return " ".join(f"uniq-{doc}-{tag}-{i}" for i in range(n))

    docs = [
        (0, f"{filler(0, 7, 'h')} {passage_a} {filler(0, 9, 't')}"),
        (1, f"{filler(1, 13, 'h')} {passage_a}"),
        (2, f"{passage_b} {filler(2, 11, 't')}"),
        (3, f"{filler(3, 5, 'h')} {passage_b} {filler(3, 3, 't')}"),
        (4, f"{passage_b}"),
        (5, f"{filler(5, 30, 'h')} {short} {filler(5, 30, 't')}"),
        (6, f"{short} {filler(6, 40, 't')}"),
        (7, filler(7, 80, 'o')),
        (8, "tiny doc"),
    ]
    rows = [(i, t, "en", "syn", len(t)) for i, t in docs]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    return {i: t.lower().split() for i, t in docs}


def test_repeated_spans_vs_quadratic_reference(spark, tmp_path):
    """Completeness + soundness of dedup_repeated_spans against an
    independent quadratic reference:
    - completeness: every maximal pairwise common token run >= MIN_SPAN
      found by brute-force DP is CONTAINED in an emitted span;
    - soundness: every emitted span consists solely of positions whose
      K-gram occurs in >= 2 distinct docs, and is >= MIN_SPAN long;
    - below-threshold and unique docs emit nothing."""
    from duckdb_sudan__spark.operators.dedup import MIN_SPAN, SPAN_GRAM_K

    toks = _repeated_spans_fixture(spark, str(tmp_path))
    got = {
        (r.doc_id, r.span_start, r.span_len)
        for r in QUERIES["dedup_repeated_spans"](spark, str(tmp_path)).collect()
    }
    # spans are 1-based token offsets; convert to 0-based [start, end) sets
    covered = {d: set() for d in toks}
    for d, s, ln in got:
        assert ln >= MIN_SPAN
        covered[d].update(range(s - 1, s - 1 + ln))

    # completeness vs brute force over all doc pairs
    ids = sorted(toks)
    expected_docs = set()
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            for sa, sb, ln in _brute_common_spans(toks[a], toks[b], MIN_SPAN):
                expected_docs |= {a, b}
                assert set(range(sa, sa + ln)) <= covered[a], (a, sa, ln)
                assert set(range(sb, sb + ln)) <= covered[b], (b, sb, ln)
    assert expected_docs == {0, 1, 2, 3, 4}
    assert {d for d, _, _ in got} == expected_docs  # no spurious docs

    # soundness: every emitted position's K-gram is cross-doc shared
    gram_docs = {}
    for d, ts in toks.items():
        for i in range(len(ts) - SPAN_GRAM_K + 1):
            gram_docs.setdefault(" ".join(ts[i : i + SPAN_GRAM_K]), set()).add(d)
    for d, s, ln in got:
        for p in range(s - 1, s - 1 + ln - SPAN_GRAM_K + 1):
            g = " ".join(toks[d][p : p + SPAN_GRAM_K])
            assert len(gram_docs[g]) >= 2, (d, p, g)


def test_repeated_spans_oracle_on_planted_fixture(spark, tmp_path):
    """The DuckDB oracle agrees with the Spark plan on the planted
    fixture (not just the driver's generated corpus) — exercises the
    exact span boundaries, the multi-doc passage, and the
    shorter-than-K doc through both engines."""
    import duckdb

    _repeated_spans_fixture(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet/*.parquet'"
    )
    df = QUERIES["dedup_repeated_spans"](spark, str(tmp_path))
    assert_matches_oracle(df, con, ORACLES["dedup_repeated_spans"])
    con.close()


def test_chunk_exact_short_doc_no_phantom_chunks(spark, tmp_path):
    """Docs with < CHUNK_EXACT_TOKENS tokens must emit ZERO chunks on
    both engines. Spark's F.sequence(1, 0) counts DOWN ([1, 0] — the
    step defaults to -1 when start > stop) while DuckDB's
    generate_series(1, 0) is empty, so without the size guard the
    'tiny doc' row (2 tokens) produces phantom partial/negative-slice
    chunks and the engines diverge (ADVICE r8, medium). The fixture
    reuses the repeated-spans corpus, which plants exactly such a doc."""
    import duckdb

    _repeated_spans_fixture(spark, str(tmp_path))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet/*.parquet'"
    )
    df = QUERIES["dedup_chunk_exact"](spark, str(tmp_path))
    assert_matches_oracle(df, con, ORACLES["dedup_chunk_exact"])
    con.close()


def _reference_bpe(word_counts, n_merges, min_pair):
    """Independent BPE trainer for the equivalence test: Counter-based
    pair tally + rebuild-the-list merge apply (different code path from
    the operator's in-place splice loop)."""
    from collections import Counter

    vocab = {tuple(w): n for w, n in word_counts if len(w) >= 2}
    merges = []
    for rank in range(1, n_merges + 1):
        tally = Counter()
        for syms, n in vocab.items():
            for pair in zip(syms, syms[1:]):
                tally[pair] += n
        if not tally:
            break
        pair, n_best = sorted(tally.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if n_best < min_pair:
            break
        merges.append((rank, pair[0], pair[1], pair[0] + pair[1], n_best))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    out.append(pair[0] + pair[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def test_bpe_train_matches_independent_reference(spark, duck):
    """Spark-side word counting + the operator's merge loop must equal
    DuckDB-side word counting + an independently coded trainer —
    pinning both the cluster aggregation and the iteration exactly
    (the rows-only stand-in for a SQL oracle: BPE is iterative, and
    the SFs share no documents so a VALUES oracle cannot hold)."""
    from duckdb_sudan__spark.operators.text5 import (
        BPE_MIN_PAIR,
        BPE_N_MERGES,
        BPE_WORDS_CAP,
    )

    counts = duck.execute(
        f"""
        SELECT w, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE length(w) >= 1
        GROUP BY w ORDER BY n DESC, w LIMIT {BPE_WORDS_CAP}
        """
    ).fetchall()
    expected = _reference_bpe(counts, BPE_N_MERGES, BPE_MIN_PAIR)
    got = [
        (r.merge_rank, r.left, r.right, r.merged, r.pair_count)
        for r in QUERIES["bpe_train_merges"](spark, SF_DIR).collect()
    ]
    assert got == expected


def test_bpe_first_merge_is_global_top_pair(spark, duck):
    """Merge 1 must be exactly the corpus-global argmax adjacent pair —
    the bpe_pair_counts relation (text4) without the lang partition."""
    top = duck.execute(
        """
        SELECT substr(t, s, 2) AS pair, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT t, unnest(generate_series(1, length(t) - 1)) AS s
              FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
              WHERE length(t) >= 2)
        GROUP BY pair ORDER BY n DESC, pair LIMIT 1
        """
    ).fetchone()
    first = QUERIES["bpe_train_merges"](spark, SF_DIR).orderBy("merge_rank").first()
    assert first.left + first.right == top[0]
    assert first.pair_count == top[1]


def test_bpe_encode_roundtrip_and_invariants(spark):
    """bpe_apply_word concatenates back to the word for every corpus
    word (lossless segmentation); encode respects
    n_ws_tokens <= n_bpe_tokens <= n_word_chars; zero merges degrade
    to character count; and a pure-Python recount of sample docs
    matches the Arrow stage exactly."""
    from duckdb_sudan__spark.operators.text5 import (
        BPE_N_MERGES,
        _corpus_word_counts,
        _train_merges_on_counts,
        bpe_apply_word,
    )

    counts = _corpus_word_counts(spark, SF_DIR)
    merges = _train_merges_on_counts(counts, BPE_N_MERGES)
    assert 0 < len(merges) <= BPE_N_MERGES
    ranks = {(m[1], m[2]): m[0] for m in merges}
    for w, _ in counts:
        assert "".join(bpe_apply_word(w, ranks)) == w, w
        assert bpe_apply_word(w, {}) == list(w), w

    rows = QUERIES["bpe_encode"](spark, SF_DIR).orderBy("doc_id").collect()
    assert all(r.n_ws_tokens <= r.n_bpe_tokens <= r.n_word_chars for r in rows)

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .orderBy("doc_id")
        .limit(20)
        .collect()
    }
    for r in rows[:20]:
        expect = sum(
            len(bpe_apply_word(w, ranks)) for w in docs[r.doc_id].split(" ") if w
        )
        assert r.n_bpe_tokens == expect, r.doc_id


def test_bpe_encode_monotone_in_merges(spark):
    """More trained merges can only shorten an encoding (each merge is
    a contraction) — checked per corpus word across merge prefixes."""
    from duckdb_sudan__spark.operators.text5 import (
        _corpus_word_counts,
        _train_merges_on_counts,
        bpe_apply_word,
    )

    counts = _corpus_word_counts(spark, SF_DIR)[:200]
    merges = _train_merges_on_counts(counts, 30)
    for k in (0, 5, 15, len(merges)):
        ranks_k = {(m[1], m[2]): m[0] for m in merges[:k]}
        ranks_all = {(m[1], m[2]): m[0] for m in merges}
        for w, _ in counts[:100]:
            assert len(bpe_apply_word(w, ranks_all)) <= len(bpe_apply_word(w, ranks_k))


def test_quality_classifier_matches_pure_python_and_dot_product(spark):
    """The JVM score must equal an independent pure-Python recompute,
    and per-bigram summation must equal the explicit hashed-count-
    vector dot weight-vector formulation (the linear-classifier view);
    keep == (score_sum >= 0) and the corpus splits non-trivially."""
    import hashlib
    import re

    from duckdb_sudan__spark.operators.text5 import QC_A, QC_DIM, QC_MOD

    def feat(bg):
        return int(hashlib.md5(bg.encode()).hexdigest()[:4], 16) % QC_DIM

    def weight(f):
        return (f * QC_A) % QC_MOD - 500

    rows = QUERIES["text_quality_classifier"](spark, SF_DIR).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    n_keep = 0
    for r in rows[:200]:
        toks = [t for t in re.split(r"\s+", docs[r.doc_id].lower()) if t]
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        assert r.n_bigrams == len(bigrams)
        direct = sum(weight(feat(bg)) for bg in bigrams)
        counts = [0] * QC_DIM
        for bg in bigrams:
            counts[feat(bg)] += 1
        dot = sum(c * weight(i) for i, c in enumerate(counts))
        assert r.score_sum == direct == dot, r.doc_id
        assert r.keep == (r.score_sum >= 0)
        n_keep += r.keep
    assert 0 < n_keep < 200  # mean-zero weights split the corpus


def test_dataset_token_budget_bpe_matches_recount(spark):
    """Per-source BPE budget must equal an independent recount: train
    ranks once, pure-Python encode every doc, aggregate by source;
    inflation ratio > 1 everywhere (BPE with 30 merges still splits
    most words) and ws_tokens matches the whitespace budget."""
    from duckdb_sudan__spark.operators.text5 import (
        BPE_N_MERGES,
        _corpus_word_counts,
        _train_merges_on_counts,
        bpe_apply_word,
    )

    ranks = {
        (m[1], m[2]): m[0]
        for m in _train_merges_on_counts(_corpus_word_counts(spark, SF_DIR), BPE_N_MERGES)
    }
    want = {}
    for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect():
        words = [w for w in r.text.split(" ") if w]
        agg = want.setdefault(r.source, [0, 0, 0])
        agg[0] += 1
        agg[1] += len(words)
        agg[2] += sum(len(bpe_apply_word(w, ranks)) for w in words)
    rows = QUERIES["dataset_token_budget_bpe"](spark, SF_DIR).collect()
    assert len(rows) == len(want)
    for r in rows:
        n, ws, bpe = want[r.source]
        assert (r.n_docs, r.ws_tokens, r.bpe_tokens) == (n, ws, bpe), r.source
        assert r.bpe_per_ws == round(bpe / ws, 6)
        assert r.bpe_per_ws > 1.0


def test_ppm_encode_decode_roundtrip_exact():
    """decode_ppm(encode_ppm(x)) == x bitwise, including non-square
    sizes; header comments and multi-whitespace parse; malformed
    inputs raise — the real-decoder contract mm_decode_ppm rides."""
    import numpy as np
    import pytest

    from duckdb_sudan__spark.operators.multimodal import decode_ppm, encode_ppm

    rng = np.arange(7 * 5 * 3, dtype=np.uint8).reshape(5, 7, 3)
    w, h, back = decode_ppm(encode_ppm(rng))
    assert (w, h) == (7, 5)
    assert np.array_equal(back, rng)

    # comments + arbitrary header whitespace
    weird = b"P6\n# a comment\n  7\t5 # trailing\n255\n" + rng.tobytes()
    w2, h2, back2 = decode_ppm(weird)
    assert (w2, h2) == (7, 5) and np.array_equal(back2, rng)

    for bad in (
        b"P5\n7 5\n255\n" + rng.tobytes(),            # wrong magic
        b"P6\n7 5\n65535\n" + rng.tobytes() * 2,      # 16-bit maxval
        encode_ppm(rng)[:-1],                          # truncated raster
        b"P6\n# no end",                               # unterminated
    ):
        with pytest.raises(ValueError):
            decode_ppm(bad)


def test_mm_decode_ppm_matches_local_pixels(spark):
    """The Spark pipeline's per-doc (width, height, gray_mean, phash)
    equals a local decode of the same fixture bytes — REAL pixels flow
    through decode -> grayscale -> resize -> phash."""
    import numpy as np

    from duckdb_sudan__spark.operators.multimodal import (
        _phash64,
        _ppm_fixture,
        decode_ppm,
    )

    got = {r.doc_id: r for r in QUERIES["mm_decode_ppm"](spark, SF_DIR).collect()}
    assert len(got) > 0
    for doc_id in list(got)[:25]:
        w, h, rgb = decode_ppm(_ppm_fixture(doc_id))
        gray = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        r = got[doc_id]
        assert (r.width, r.height) == (w, h)
        assert r.gray_mean == float(np.round(gray.mean(), 6))
        assert r.phash == _phash64(gray)


def test_mm_decode_wav_matches_local_and_rejects_malformed(spark):
    """REAL RIFF/WAVE parsing end-to-end: the Spark pipeline's per-doc
    (rate, n_samples, n_frames, peak_frame, total_energy) equals a
    local decode of the same fixture bytes (which plant an odd-length
    JUNK chunk + pad byte before fmt, exercising the chunk walk), and
    the decoder raises on the malformed-input classes a real decoder
    must reject."""
    import numpy as np
    import pytest as _pytest

    from duckdb_sudan__spark.operators.multimodal import (
        WAV_FRAME,
        _wav_fixture,
        decode_wav,
        encode_wav,
    )

    got = {r.doc_id: r for r in QUERIES["mm_decode_wav"](spark, SF_DIR).collect()}
    assert len(got) > 0
    for doc_id in list(got)[:25]:
        rate, samples = decode_wav(_wav_fixture(doc_id))
        nf = len(samples) // WAV_FRAME
        s64 = samples[: nf * WAV_FRAME].astype(np.int64).reshape(nf, WAV_FRAME)
        energies = (s64 * s64).sum(axis=1)
        r = got[doc_id]
        assert (r.rate, r.n_samples, r.n_frames) == (rate, len(samples), nf)
        assert r.peak_frame == int(np.argmax(energies))
        assert r.total_energy == int(energies.sum())

    ok = encode_wav(np.zeros(16, dtype=np.int16))
    with _pytest.raises(ValueError):
        decode_wav(b"RIFX" + ok[4:])  # bad magic
    with _pytest.raises(ValueError):
        decode_wav(ok[:-2])  # truncated data chunk (and RIFF size lie)
    with _pytest.raises(ValueError):
        decode_wav(ok[:12])  # no chunks at all
    bad_fmt = bytearray(ok)
    bad_fmt[22] = 2  # channels = 2 (only mono PCM16 supported)
    fixed = bytes(bad_fmt)
    with _pytest.raises(ValueError):
        decode_wav(fixed)
    # fmt chunk DECLARING fewer than 16 bytes must raise ValueError,
    # not escape as struct.error (review r9)
    import struct as _s

    short_fmt = b"fmt " + _s.pack("<I", 12) + b"\x01\x00\x01\x00" + _s.pack("<II", 8000, 16000)
    data = b"data" + _s.pack("<I", 4) + b"\x00\x00\x00\x00"
    body = short_fmt + data
    payload = b"RIFF" + _s.pack("<I", 4 + len(body)) + b"WAVE" + body
    with _pytest.raises(ValueError):
        decode_wav(payload)


def test_mm_dedup_phash_real_matches_local_reference(spark):
    """The real-bytes media dedup tier (r8 verdict item 6): the Spark
    pairs equal a local decode-EVERYTHING reference that replicates the
    band-pigeonhole candidate semantics (candidates share a 16-bit
    band; emit if hamming <= PHASH_HAMMING_MAX) — real pixels flow
    decode -> phash -> band join, and the planted near-dup groups must
    both produce pairs and never pair across groups."""
    from duckdb_sudan__spark.operators.multimodal import (
        PHASH_HAMMING_MAX,
        PPM_DEDUP_GROUP,
        _phash_of_ppm,
        _ppm_near_dup_fixture,
    )
    from duckdb_sudan__spark.session import load_table

    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in QUERIES["mm_dedup_phash_real"](spark, SF_DIR).collect()
    }
    doc_ids = [r.doc_id for r in load_table(spark, SF_DIR, "documents").select("doc_id").collect()]
    ph = {i: _phash_of_ppm(_ppm_near_dup_fixture(int(i))) for i in doc_ids}
    want = set()
    ids = sorted(ph)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            x = (ph[a] ^ ph[b]) & (2**64 - 1)
            shares_band = any(((x >> (16 * band)) & 0xFFFF) == 0 for band in range(4))
            ham = bin(x).count("1")
            if shares_band and ham <= PHASH_HAMMING_MAX:
                want.add((a, b, ham))
    assert got == want
    assert got, "fixture planted near-dups but none were found"
    for a, b, _ in got:  # pairs only within a planted group
        assert a // PPM_DEDUP_GROUP == b // PPM_DEDUP_GROUP, (a, b)


def test_collocation_lift_short_doc_guard(spark, tmp_path):
    """A corpus containing empty and single-token documents must not
    crash the bigram explode (Spark sequence(1, 0) counts DOWN and
    t[s] would index out of bounds under ANSI — DETERMINISM.md rule
    18; the r10 review reproduced the crash before the size >= 2
    guard landed)."""
    import duckdb

    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.operators import QUERIES

    operators.load_all()
    con = duckdb.connect()
    # 6 copies of a two-token doc (c_xy >= MIN_COLLOC), one single-token
    # doc, one empty doc — the latter two exercise the guard
    con.execute(
        f"""
        COPY (
          SELECT * FROM (VALUES
            (1::BIGINT, 'alpha beta', 'en', 'web', 10::BIGINT),
            (2::BIGINT, 'alpha beta', 'en', 'web', 10::BIGINT),
            (3::BIGINT, 'alpha beta', 'en', 'web', 10::BIGINT),
            (4::BIGINT, 'alpha beta', 'en', 'web', 10::BIGINT),
            (5::BIGINT, 'alpha beta', 'en', 'web', 10::BIGINT),
            (6::BIGINT, 'alpha beta', 'en', 'web', 10::BIGINT),
            (7::BIGINT, 'solo', 'en', 'web', 4::BIGINT),
            (8::BIGINT, '', 'en', 'web', 0::BIGINT)
          ) t(doc_id, text, lang, source, n_chars)
        ) TO '{tmp_path}/documents.parquet' (FORMAT parquet)
        """
    )
    con.close()
    rows = QUERIES["text_collocation_lift"](spark, str(tmp_path)).collect()
    assert [(r.w1, r.w2, r.c_xy) for r in rows] == [("alpha", "beta", 6)]


def test_bitmap_distinct_negative_key_fails_loudly(spark, tmp_path):
    """ADVICE r10: the bitmap tier is cross-engine-exact only for
    non-negative user_id (DuckDB floor-// vs Spark truncating div
    diverge on negatives; a negative shift amount is undefined). The
    contract is now ENFORCED — a negative key must raise, never return
    silently divergent masks. Batch operator and streaming building
    block both carry the guard."""
    from datetime import datetime

    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.streaming.events import bitmap_distinct_stream

    rows = [
        (1, datetime(2024, 1, 1, 10, 0), 5, "view", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 10, 1), -7, "view", 1.0, "{}"),
    ]
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    with pytest.raises(SparkRuntimeException, match="negative user_id"):
        QUERIES["agg_bitmap_distinct"](spark, str(tmp_path)).collect()
    with pytest.raises(SparkRuntimeException, match="negative user_id"):
        bitmap_distinct_stream(df).collect()

    # the positive-key rows still aggregate fine through the guard
    ok = spark.createDataFrame([rows[0]], schema)
    assert bitmap_distinct_stream(ok).count() == 1


def test_theil_sen_even_pair_count(spark, tmp_path):
    """Regression: the median rank (n_pairs+1)//2 must use INTEGRAL
    division on the Spark side — a double (n+1)/2 never equals any
    row_number when n_pairs is even (4 days -> 6 pairs here), silently
    dropping the group. Exact-match vs the oracle on the even case."""
    from datetime import datetime

    import duckdb

    from duckdb_sudan__spark.operators import ORACLES, QUERIES

    rows = [
        (i, datetime(2024, 1, 1 + d, 10), 1, "view", float(v), "{}")
        for i, (d, v) in enumerate([(0, 1.0), (1, 3.0), (2, 2.0), (3, 7.0)])
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = [
        (r.event_type, r.n_pairs, r.theil_sen_slope_micro)
        for r in QUERIES["ts_theil_sen_slope"](spark, str(tmp_path)).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet/*.parquet'"
    )
    want = [tuple(r) for r in con.execute(ORACLES["ts_theil_sen_slope"]).fetchall()]
    con.close()
    assert got == want and got[0][1] == 6


def test_brightness_histogram_equals_local_replay(spark):
    """mm_brightness_histogram over the sf0.001 fixtures must equal a
    pure-Python decode-everything replay exactly (bincount over every
    pixel's 16-band luma bucket)."""
    import numpy as np

    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.operators.multimodal import _ppm_fixture, decode_ppm

    sf_dir = "/root/testdata/sf0.001"
    got = {r.luma_bucket: r.n_pixels
           for r in QUERIES["mm_brightness_histogram"](spark, sf_dir).collect()}

    import duckdb

    ids = [r[0] for r in duckdb.sql(
        f"SELECT doc_id FROM '{sf_dir}/documents.parquet'").fetchall()]
    want = np.zeros(16, dtype=np.int64)
    for i in ids:
        _w, _h, rgb = decode_ppm(_ppm_fixture(int(i)))
        gray = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        want += np.bincount(
            np.minimum((gray // 16).astype(np.int64), 15).ravel(), minlength=16
        )
    assert {b: int(n) for b, n in enumerate(want) if n} == {
        b: n for b, n in got.items() if n
    }
    assert sum(got.values()) == int(want.sum()) > 0


def test_compression_ratio_deterministic_and_monotone(spark, tmp_path):
    """The zlib quality proxy must (a) be identical across two runs in
    the same environment, (b) rank a highly repetitive doc strictly
    below a high-entropy doc, and (c) conserve the doc count."""
    import duckdb

    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.operators.olap29 import _compress_ratio
    import pandas as pd

    operators.load_all()
    r1 = sorted(tuple(r) for r in QUERIES["text_compression_ratio"](spark, SF_DIR).collect())
    r2 = sorted(tuple(r) for r in QUERIES["text_compression_ratio"](spark, SF_DIR).collect())
    assert r1 == r2 and len(r1) > 0
    n_docs = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
        " WHERE length(text) > 0"
    ).fetchone()[0]
    assert sum(r[2] for r in r1) == n_docs
    # kernel-level monotonicity: repetitive compresses far below random-ish
    import hashlib

    high_entropy = "".join(
        hashlib.sha256(str(i).encode()).hexdigest() for i in range(40)
    )
    probe = pd.DataFrame(
        {"lang": ["xx", "xx"], "text": ["spam " * 400, high_entropy]}
    )
    cells = pd.concat(list(_compress_ratio(iter([probe]))), ignore_index=True)
    ratios = sorted(cells["sum_ratio_ppm"] // cells["n_docs"])
    assert ratios[0] < 100_000 and ratios[-1] > 500_000


def test_bigram_cond_entropy_single_token_doc_guard(spark, duck):
    """r12 review finding (rule 18): a single-token document must
    contribute NO bigram on either engine — Spark's sequence(1, 0)
    fabricates [1, 0] without the size >= 2 filter, while DuckDB's
    generate_series(1, 0) is empty. Drive both sides over a fixture
    containing 1-token and empty docs and compare with the driver's
    hash (the static corpora happen to contain no such doc)."""
    import duckdb as _duckdb

    from duckdb_sudan__spark.operators import ORACLES
    from duckdb_sudan__spark.operators.olap38 import text_bigram_cond_entropy
    from tests.conftest import assert_matches_oracle

    import os
    import tempfile

    rows = [
        (1, "one", "en", "s", 3),
        (2, "", "en", "s", 0),
        (3, "a b b", "en", "s", 5),
        (4, "solo", "fr", "s", 4),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
        ).coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
        df = text_bigram_cond_entropy(spark, tmp)
        con = _duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp}/documents.parquet/*.parquet')"
        )
        assert_matches_oracle(df, con, ORACLES["text_bigram_cond_entropy"])
        got = {r.lang: r for r in df.collect()}
        assert "fr" not in got  # the 1-token fr doc yields no bigram row
        assert got["en"].n_bigrams == 2  # only doc 3's (a,b) and (b,b)


def test_jpeg_capabilities_probe_is_honest():
    """r13 permanent adjudication: the codec probe reports all three
    JPEG codecs absent in this container — and never raises (mirrors
    test_merge_capabilities_probe_is_honest)."""
    from duckdb_sudan__spark.operators.multimodal import jpeg_capabilities

    caps = jpeg_capabilities()
    assert set(caps) == {"PIL", "imageio", "cv2", "any"}
    assert caps["any"] == any(caps[m] for m in ("PIL", "imageio", "cv2"))


def test_jpeg_decode_fails_loud_without_codec():
    """Without a codec, decode_jpeg must raise the documented install
    guidance — never a silent fake (the gate IS the tested contract,
    like the lakehouse MERGE leg)."""
    import pytest

    from duckdb_sudan__spark.operators.multimodal import (
        decode_jpeg,
        jpeg_capabilities,
    )

    if jpeg_capabilities()["any"]:
        pytest.skip("a JPEG codec is installed here; the raise leg is moot")
    with pytest.raises(RuntimeError, match="Pillow"):
        decode_jpeg(b"\xff\xd8\xff\xe0 not really a jpeg")


def test_jpeg_entry_registered_iff_codec_present():
    """The conditionally-registered mm_decode_jpeg entry appears in
    queries() exactly when a codec exists — so the driver never hashes
    a raising entry in THIS container, and the tier lights up with zero
    code changes where Pillow ships."""
    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.operators.multimodal import jpeg_capabilities

    assert ("mm_decode_jpeg" in QUERIES) == jpeg_capabilities()["any"]


def test_jpeg_decode_execution_leg(spark):
    """Execution leg: runs only where a codec is installed (skipped in
    this container). The JPEG tier must agree with the PPM tier on
    dimensions and be phash-close on content (lossy quality=95)."""
    import pytest

    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.operators.multimodal import jpeg_capabilities

    if not jpeg_capabilities()["any"]:
        pytest.skip("no JPEG codec in this container (permanent gate, r13)")
    jpeg = {r["doc_id"]: r for r in QUERIES["mm_decode_jpeg"](spark, SF_DIR).collect()}
    ppm = {r["doc_id"]: r for r in QUERIES["mm_decode_ppm"](spark, SF_DIR).collect()}
    assert set(jpeg) == set(ppm)
    for doc_id, jr in jpeg.items():
        pr = ppm[doc_id]
        assert (jr["width"], jr["height"]) == (pr["width"], pr["height"])
        assert bin(jr["phash"] ^ pr["phash"]).count("1") <= 10
