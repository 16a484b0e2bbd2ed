"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop-format write (full
compute, no driver collect overhead, no disk sink).

Per-query time is the MEDIAN of N_RUNS=3 runs: round-1 driver runs
measured 69 s for a set this machine executes in ~18 s solo — per-run
times under concurrent load swing 3-4×, and a single sample reports
scheduler contention, not query cost. The median of 3 keeps one cold
plan-compile run from defining the number while staying cheap (the
2nd/3rd runs reuse warm workers and FS cache, which is the steady
state a long-lived cluster actually sees).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from duckdb_sudan__spark import operators
from duckdb_sudan__spark.operators import QUERIES
from duckdb_sudan__spark.session import get_spark

operators.load_all()

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q13_cust_distribution",
    "q18_large_orders",
    "q21_waiting_supplier",
    "w1_window_rank",
    "ev_sessionize",
    "text_quality",
    "dedup_exact",
    "dedup_minhash_lsh",
    # exact-tier pairwise Jaccard: the applyInPandas block pairing runs
    # this ~8x FASTER than the DuckDB oracle at sf0.1 (9 s vs 73 s) —
    # the one headline query where the distributed engine wins outright
    # even single-node
    "dedup_ngram_jaccard",
    "ann_topk_cosine",
]


N_RUNS = 3


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def median3(samples: list[float]) -> float:
    return sorted(samples)[len(samples) // 2]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen + Python-worker warmup on the smallest SF so headline
    # times measure steady-state execution, not first-stage classloading
    # or per-worker numpy/pandas import.
    force(QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001"))
    force(QUERIES["dedup_minhash_lsh"](spark, "/root/testdata/sf0.001"))

    timings: dict[str, float] = {}
    for key in HEADLINE:
        samples = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            force(QUERIES[key](spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        timings[key] = round(median3(samples), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
