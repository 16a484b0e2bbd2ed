"""Quiet-window wrapper around ab_bench: wait for hypervisor steal to
read quiet, then time ONE key at a time, re-queueing keys until each
has a quiet sample (steal < 0.1 cores) or the wall budget runs out.

Usage: python tools/quiet_ab.py OUT.json BUDGET_SEC KEY [KEY...]

Writes OUT.json {key: {"quiet_min": s, "samples": [...]}} incrementally
so a killed run keeps its completed keys. r14 measurement harness only —
changes no query, writes no driver artifact.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def steal_cores(window: float = 8.0) -> float:
    def read() -> float:
        with open("/proc/stat") as fh:
            p = fh.readline().split()
        return int(p[8]) / (os.sysconf("SC_CLK_TCK") or 100)

    s0, t0 = read(), time.time()
    time.sleep(window)
    return (read() - s0) / (time.time() - t0)


def main() -> None:
    out_path, budget = sys.argv[1], float(sys.argv[2])
    keys = sys.argv[3:]
    t_end = time.time() + budget
    results: dict[str, dict] = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            results = json.load(fh)
    pending = [k for k in keys if results.get(k, {}).get("quiet_min") is None]
    while pending and time.time() < t_end:
        sc = steal_cores()
        if sc >= 0.05:
            print(f"hot ({sc:.2f} cores), waiting...", flush=True)
            time.sleep(45)
            continue
        key = pending[0]
        print(f"quiet ({sc:.2f}), running {key}", flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "ab_bench.py"), key, "--n", "3"],
            capture_output=True, text=True, timeout=1200,
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
            print(f"!! {key} produced no result (rc={proc.returncode})", flush=True)
            print(proc.stderr[-2000:], file=sys.stderr, flush=True)
            pending.pop(0)
            continue
        prev = results.get(key, {})
        merged_samples = prev.get("samples", []) + got["samples"]
        qs = [s["sec"] for s in merged_samples if s["steal_cores"] < 0.1]
        results[key] = {
            "quiet_min": min(qs) if qs else None,
            "min": min(s["sec"] for s in merged_samples),
            "samples": merged_samples,
        }
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1, sort_keys=True)
        print(key, "->", results[key]["quiet_min"], flush=True)
        if results[key]["quiet_min"] is not None:
            pending.pop(0)
        else:
            pending.append(pending.pop(0))  # retry later
    print("pending at exit:", pending, flush=True)


if __name__ == "__main__":
    main()
