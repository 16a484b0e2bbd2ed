"""Matched-window before/after timing: for each key, wait for a quiet
host (hypervisor steal < 0.05 cores over 8 s), then time the NEW code
and the OLD code back-to-back inside the same window, each via
ab_bench in its own process. A pair counts only when BOTH sides got at
least one quiet sample (steal < 0.1 cores); otherwise the key is
re-queued. OLD code is restored per pair with `git checkout OLD_REF --
<operator files>` and the tree is put back with `git checkout HEAD`.

Usage: python tools/matched_ab.py OUT.json BUDGET_SEC KEY[:N] ...

r14 measurement harness only — changes no query, writes no driver
artifact; requires a clean operator tree (all changes committed).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# override per experiment: AB_OLD_REF=<ref> AB_FILES=a.py,b.py
OLD_REF = os.environ.get("AB_OLD_REF", "dbdcc6d")
FILES = (
    [p.strip() for p in os.environ["AB_FILES"].split(",") if p.strip()]
    if os.environ.get("AB_FILES")
    else [
        "duckdb_sudan__spark/operators/dedup.py",
        "duckdb_sudan__spark/operators/graph.py",
        "duckdb_sudan__spark/operators/olap38.py",
        "duckdb_sudan__spark/operators/olap41.py",
        "duckdb_sudan__spark/operators/text6.py",
    ]
)


def steal_cores(window: float = 8.0) -> float:
    def read() -> float:
        with open("/proc/stat") as fh:
            p = fh.readline().split()
        return int(p[8]) / (os.sysconf("SC_CLK_TCK") or 100)

    s0, t0 = read(), time.time()
    time.sleep(window)
    return (read() - s0) / (time.time() - t0)


def run_ab(key: str, n: int) -> dict | None:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "ab_bench.py"), key, "--n", str(n)],
        capture_output=True, text=True, timeout=1800, cwd=REPO,
    )
    got = None
    for line in proc.stdout.splitlines():
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if key in d:
            got = d[key]
    if got is None:
        print(f"!! {key}: no result rc={proc.returncode}", flush=True)
        print(proc.stderr[-1500:], file=sys.stderr, flush=True)
    return got


def git(*args: str) -> None:
    subprocess.run(["git", *args], cwd=REPO, check=True, capture_output=True)


def quiet_min(res: dict | None) -> float | None:
    if not res:
        return None
    qs = [s["sec"] for s in res["samples"] if s["steal_cores"] < 0.1]
    return min(qs) if qs else None


def main() -> None:
    out_path, budget = sys.argv[1], float(sys.argv[2])
    specs = []
    for a in sys.argv[3:]:
        k, _, n = a.partition(":")
        specs.append((k, int(n) if n else 3))
    t_end = time.time() + budget
    results: dict[str, dict] = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            results = json.load(fh)
    pending = [s for s in specs if results.get(s[0], {}).get("ok") is not True]
    while pending and time.time() < t_end:
        sc = steal_cores()
        if sc >= 0.05:
            print(f"hot ({sc:.2f}), waiting", flush=True)
            time.sleep(40)
            continue
        key, n = pending[0]
        print(f"quiet ({sc:.2f}) -> pair for {key}", flush=True)
        try:
            new_res = run_ab(key, n)
            git("checkout", OLD_REF, "--", *FILES)
            try:
                old_res = run_ab(key, n)
            finally:
                git("checkout", "HEAD", "--", *FILES)
        except Exception as exc:  # keep the tree restored no matter what
            git("checkout", "HEAD", "--", *FILES)
            print(f"!! pair failed: {exc}", flush=True)
            time.sleep(20)
            continue
        qn, qo = quiet_min(new_res), quiet_min(old_res)
        entry = {
            "ok": qn is not None and qo is not None,
            "new_quiet_min": qn,
            "old_quiet_min": qo,
            "new": new_res,
            "old": old_res,
        }
        # keep the best (lowest) quiet pair across retries
        prev = results.get(key)
        if prev and prev.get("ok") and entry["ok"]:
            entry["new_quiet_min"] = min(qn, prev["new_quiet_min"])
            entry["old_quiet_min"] = min(qo, prev["old_quiet_min"])
        results[key] = entry
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1, sort_keys=True)
        print(key, "new", qn, "old", qo, "ok", entry["ok"], flush=True)
        if entry["ok"]:
            pending.pop(0)
        else:
            pending.append(pending.pop(0))
    print("pending at exit:", [p[0] for p in pending], flush=True)


if __name__ == "__main__":
    main()
