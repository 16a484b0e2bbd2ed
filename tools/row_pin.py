"""Pin (or verify) exact output hashes for named queries.

Usage:
  python tools/row_pin.py pin FILE KEY [KEY...]     # write hashes
  python tools/row_pin.py check FILE KEY [KEY...]   # compare + report

Hash = the driver's order-insensitive value hash (columns sorted by
name, rows sorted by stringified tuple — same as
tools/correctness_report.value_hash) at each SF dir in
$SPARK_GRAFT_SF_DIRS (default sf0.001,sf0.01,sf0.1).

Round-14 optimization harness: used to prove a rows-only entry's
output is BIT-IDENTICAL before/after an internals-only optimization
(oracled entries get the stronger oracle comparison instead).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = os.environ.get(
    "SPARK_GRAFT_SF_DIRS", "/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1"
).split(",")


def value_hash(rows, cols) -> str:
    m = hashlib.sha256()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    for r in sorted(tuple(str(r[i]) for i in order) for r in rows):
        m.update(("|".join(r)).encode())
    return m.hexdigest()


def main() -> None:
    mode, path, *keys = sys.argv[1:]
    from duckdb_sudan__spark import operators
    from duckdb_sudan__spark.session import get_spark

    operators.load_all()
    import __spark_entry__ as entry

    every = entry.queries()
    spark = get_spark("row_pin")
    spark.sparkContext.setLogLevel("ERROR")

    got: dict[str, dict[str, str]] = {}
    for key in keys:
        got[key] = {}
        for sf_dir in SF_DIRS:
            df = every[key](spark, sf_dir)
            rows = df.collect()
            got[key][sf_dir] = f"{len(rows)}:{value_hash(rows, df.columns)}"

    if mode == "pin":
        with open(path, "w") as fh:
            json.dump(got, fh, indent=1, sort_keys=True)
        print("pinned", len(got), "keys ->", path)
    else:
        with open(path) as fh:
            want = json.load(fh)
        bad = 0
        for key in keys:
            for sf_dir in SF_DIRS:
                w, g = want.get(key, {}).get(sf_dir), got[key][sf_dir]
                status = "OK" if w == g else "MISMATCH"
                bad += status != "OK"
                print(f"{status} {key} @ {sf_dir}: {g}" + ("" if status == "OK" else f" != pinned {w}"))
        sys.exit(1 if bad else 0)
    spark.stop()


if __name__ == "__main__":
    main()
