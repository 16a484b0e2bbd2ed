"""Fifth wave of LLM-data-pipeline operators (r7): real-tokenizer
accounting (iterated BPE train + greedy encode) and learned-quality
classifier scoring.

Same determinism posture as text2-text4 (DETERMINISM.md): integer
counts first, exactly-rounded double ops only in hashed output, no
transcendentals. The BPE pair (train, encode) extends bpe_pair_counts
(text4.py:46 — the FIRST merge decision) to the full loop a tokenizer
trainer runs, which is what turns dataset_token_budget/pack_sequences'
whitespace-token approximations into real-tokenizer numbers.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duckdb_sudan__spark.operators import register
from duckdb_sudan__spark.session import load_table

# ---------------------------------------------------------------------------
# bpe_train_merges — iterated BPE merge-table training on the corpus.
#
# The scalable-trainer decomposition every production tokenizer uses
# (HuggingFace tokenizers, SentencePiece): BPE training only reads the
# DISTINCT-WORD frequency table, never the raw corpus — so the cluster
# does ONE map-side-combinable groupBy(word).count() over 100 TB, and
# the merge iteration runs driver-side over that bounded aggregate
# (capped at BPE_WORDS_CAP rows by (count desc, word) — top-50k words
# carry essentially all pair mass in a Zipfian corpus; the cap is the
# same boundedness argument as vocab_coverage_rate's broadcast).
#
# Rows-only BY DESIGN: the merge table is data-dependent and the loop
# is inherently iterative (each merge re-counts pairs under the
# previous merge), which recursive SQL cannot express with engine
# parity — and a VALUES oracle cannot adapt across SFs (the sf0.01 and
# sf0.1 corpora share zero documents, verified r7). Equivalence is
# pinned in pytest instead: DuckDB independently computes the word
# counts and a pure-Python reference trainer must produce the
# IDENTICAL merge table (tests/test_llm_ops.py).
# ---------------------------------------------------------------------------

BPE_WORDS_CAP = 50_000
BPE_N_MERGES = 30
BPE_MIN_PAIR = 2  # stop when the best pair occurs fewer than 2 times


def _train_merges_on_counts(word_counts: list[tuple[str, int]], n_merges: int) -> list[tuple]:
    """The driver-side merge loop: greedy argmax over corpus-weighted
    adjacent symbol pairs, ties broken (left, right) lexicographic
    ascending — fully deterministic. Returns
    (merge_rank, left, right, merged, pair_count) rows."""
    words = [(list(w), int(n)) for w, n in word_counts if len(w) >= 2]
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        pair_n: dict[tuple[str, str], int] = {}
        for syms, n in words:
            for a, b in zip(syms, syms[1:]):
                pair_n[(a, b)] = pair_n.get((a, b), 0) + n
        if not pair_n:
            break
        best = min(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), n_best = best
        if n_best < BPE_MIN_PAIR:
            break
        merged = left + right
        merges.append((rank, left, right, merged, n_best))
        for syms, _ in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == left and syms[i + 1] == right:
                    syms[i : i + 2] = [merged]
                else:
                    i += 1
    return merges


def _corpus_word_counts(spark: SparkSession, sf_dir: str) -> list[tuple[str, int]]:
    """(word, corpus_count) for the top BPE_WORDS_CAP distinct words —
    the one cluster-side stage of BPE training. Same whitespace token
    definition as bpe_pair_counts (split on ' ', len >= 1)."""
    d = load_table(spark, sf_dir, "documents")
    rows = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "w")
        .limit(BPE_WORDS_CAP)
        .collect()
    )
    return [(r.w, r.n) for r in rows]


@register("bpe_train_merges")  # rows-only: iterative, not SQL-expressible
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge table: (merge_rank, left, right, merged,
    pair_count), rank ascending — merge 1 is exactly bpe_pair_counts'
    global top pair (pinned in tests). Plan: one distinct-word count
    shuffle (partial agg absorbs the Zipf head map-side) + a
    TakeOrderedAndProject cap; the iteration is driver-side over the
    bounded word table, O(cap * n_merges) — constant in corpus size."""
    merges = _train_merges_on_counts(_corpus_word_counts(spark, sf_dir), BPE_N_MERGES)
    schema = (
        "merge_rank int, left string, right string, merged string, pair_count bigint"
    )
    return spark.createDataFrame(merges, schema).orderBy("merge_rank")


# ---------------------------------------------------------------------------
# bpe_encode — greedy-encode every document under the learned merges
# ---------------------------------------------------------------------------


def bpe_apply_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Standard BPE apply: repeatedly merge the present pair with the
    LOWEST training rank (all leftmost-nonoverlapping occurrences per
    step) until no trained pair remains. Deterministic; identical for
    train-corpus and unseen words."""
    syms = list(word)
    while len(syms) >= 2:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        left, right = syms[best_i], syms[best_i + 1]
        merged = left + right
        i = 0
        while i < len(syms) - 1:
            if syms[i] == left and syms[i + 1] == right:
                syms[i : i + 2] = [merged]
            else:
                i += 1
    return syms


@register("bpe_encode")  # rows-only: the learned vocab is not SQL-expressible
def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token accounting under the LEARNED tokenizer:
    (doc_id, n_ws_tokens, n_bpe_tokens, n_word_chars) — the numbers a
    training-mix/packing decision actually uses (dataset_token_budget
    and pack_sequences approximate these with whitespace tokens; this
    entry is the real-tokenizer re-base). Plan: the merge table is
    trained once (driver-side over the bounded word-count aggregate)
    and closed over by ONE Arrow-batched map stage — zero joins, zero
    shuffles on the document scan; invariants n_ws_tokens <=
    n_bpe_tokens <= n_word_chars are property-tested."""
    ranks = {
        (left, right): rank
        for rank, left, right, _, _ in _train_merges_on_counts(
            _corpus_word_counts(spark, sf_dir), BPE_N_MERGES
        )
    }

    @F.pandas_udf(T.LongType())
    def n_bpe(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            total = 0
            for w in (t or "").split(" "):
                if w:
                    total += len(bpe_apply_word(w, ranks))
            out.append(total)
        return pd.Series(out, dtype="int64")

    d = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda x: x != "")
    return (
        d.select(
            "doc_id",
            F.size(words).cast("bigint").alias("n_ws_tokens"),
            n_bpe(F.col("text")).alias("n_bpe_tokens"),
            F.aggregate(
                words, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)
            ).alias("n_word_chars"),
        )
        .orderBy("doc_id")
    )
