"""Ad-hoc oracle check for a subset of entries (fast iteration loop).

Usage: python tools/check_keys.py key1 key2 ... [--sf sf0.001,sf0.01]
Runs the driver's comparison (rows / cols / value hash, both fetch
modes) for just the named keys.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.correctness_report import TABLES, value_hash  # noqa: E402


def main() -> None:
    import duckdb

    from duckdb_sudan__spark.session import get_spark
    import __spark_entry__ as entry

    args = [a for a in sys.argv[1:] if not a.startswith("--sf")]
    sfs = ["sf0.001", "sf0.01"]
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sfs = a.split("=", 1)[1].split(",")

    spark = get_spark("check_keys")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()
    oracles = entry.oracle_sql()
    keys = args or list(queries)

    fails = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        for key in keys:
            t0 = time.time()
            try:
                df = queries[key](spark, sf_dir).persist()
                srows = [tuple(r) for r in df.collect()]
                scols = df.columns
                spd = [tuple(r) for r in df.toPandas().itertuples(index=False, name=None)]
                df.unpersist()
                ores = con.execute(oracles[key]).fetchall()
                ocols = [d[0] for d in con.description]
                opd = [tuple(r) for r in con.execute(oracles[key]).df().itertuples(index=False, name=None)]
                ok_rows = len(srows) == len(ores)
                ok_cols = sorted(scols) == sorted(ocols)
                ok_hash = value_hash(srows, scols) == value_hash(ores, ocols)
                ok_pd = value_hash(spd, scols) == value_hash(opd, ocols)
                ok = ok_rows and ok_cols and ok_hash and ok_pd
                fails += 0 if ok else 1
                print(f"{sf} {key}: rows={len(srows)}/{len(ores)} cols={ok_cols} "
                      f"hash={ok_hash} hash_pd={ok_pd} ({time.time()-t0:.1f}s)"
                      + ("" if ok else "  <-- FAIL"))
                if not ok_hash and ok_rows and srows:
                    # print first differing row pair for debugging
                    so = sorted(tuple(str(v) for v in r) for r in srows)
                    oo_order = sorted(range(len(ocols)), key=lambda i: ocols[i])
                    ss_order = sorted(range(len(scols)), key=lambda i: scols[i])
                    so = sorted(tuple(str(r[i]) for i in ss_order) for r in srows)
                    oo = sorted(tuple(str(r[i]) for i in oo_order) for r in ores)
                    for a, b in zip(so, oo):
                        if a != b:
                            print("   spark :", a)
                            print("   oracle:", b)
                            break
            except Exception as exc:
                fails += 1
                print(f"{sf} {key}: ERROR {str(exc)[:300]}")
        con.close()
    print("FAILS:", fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
