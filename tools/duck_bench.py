"""Cross-engine bench: time DuckDB on the SAME oracle SQL bench.py's
headline queries are verified against, at the same SF and thread
count — the ratio the per-round verdicts previously recomputed by
hand (r7 verdict item 7).

Usage: python tools/duck_bench.py [--sf-dir=/root/testdata/sf0.1]
                                  [--threads=32] [--runs=3]

Prints ONE JSON line and (unless --no-artifact) writes it to
DUCK_BENCH.json at the repo root, where bench.py picks it up and
ships the Spark/DuckDB ratio inside its own JSON line (so the
driver-recorded BENCH_r{N}.json carries the ratio computed by this
committed tool, at the commit recorded in the artifact).

Methodology mirrors bench.py: one untimed warm-up pass (FS cache +
catalog warm), then median of --runs timed executions fetching all
rows. A query whose FIRST timed run exceeds SINGLE_RUN_BUDGET_SEC is
measured once and flagged in `single_run` (DuckDB's serial quadratic
list_intersect makes dedup_ngram_jaccard ~87 s at sf0.1 — re-running
it twice more adds nothing but wall time). Rows-only headline entries
(no oracle) are listed in `skipped_rows_only`.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.correctness_report import TABLES  # noqa: E402

SINGLE_RUN_BUDGET_SEC = 30.0


def main() -> None:
    import duckdb

    import __spark_entry__ as entry
    from bench import HEADLINE, median3

    sf_dir = "/root/testdata/sf0.1"
    threads = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs, write_artifact = 3, True
    for a in sys.argv[1:]:
        if a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--threads="):
            threads = int(a.split("=", 1)[1])
        elif a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        elif a == "--no-artifact":
            write_artifact = False

    oracles = entry.oracle_sql()
    con = duckdb.connect()
    con.execute(f"SET threads = {threads}")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    keys = [k for k in HEADLINE if k in oracles]
    skipped = [k for k in HEADLINE if k not in oracles]

    for k in keys:  # warm-up (FS cache; mirrors bench.py's untimed pass)
        con.execute(oracles[k]).fetchall()

    timings: dict[str, float] = {}
    single_run: list[str] = []
    for k in keys:
        samples: list[float] = []
        for _ in range(runs):
            t0 = time.perf_counter()
            con.execute(oracles[k]).fetchall()
            samples.append(time.perf_counter() - t0)
            if samples[0] > SINGLE_RUN_BUDGET_SEC:
                single_run.append(k)
                break
        timings[k] = round(median3(samples) if len(samples) >= 3 else samples[-1], 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        commit = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        commit = None
    result = {
        "metric": "duckdb_oracle_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "single_run": single_run,
        "skipped_rows_only": skipped,
        "threads": threads,
        "runs": runs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "duckdb_version": duckdb.__version__,
        "commit": commit,
    }
    print(json.dumps(result))
    if write_artifact:
        with open(os.path.join(REPO, "DUCK_BENCH.json"), "w") as fh:
            fh.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
