"""Generate CORRECTNESS_LOCAL.md: the driver's oracle comparison run
over ALL oracled `queries()` entries — not just the 50 the driver's
window reaches — at $SPARK_GRAFT_SF_DIR (default sf0.01, the driver's
correctness SF).

For each entry: run the Spark query and the DuckDB oracle on the same
parquet, compare row count, column-name set, and an order-insensitive
value hash (columns sorted by name, rows sorted by stringified tuple —
the driver's comparison, re-implemented) in TWO fetch modes:

- ``hash``: Spark ``collect()`` vs DuckDB ``fetchall()`` (Python-native
  values — HUGEINT arrives as int).
- ``hash(pd)``: Spark ``toPandas()`` vs DuckDB ``.df()`` (Arrow/pandas
  canonicalization — DuckDB HUGEINT arrives as float64, so an oracle
  with an uncast ``SUM(BIGINT)`` hashes ``"60.0"`` against Spark's
  ``"60"`` and goes red HERE before the driver sees it; r2 VERDICT #2).

Run: python tools/correctness_report.py  (writes CORRECTNESS_LOCAL.md)
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = os.environ.get(
    "SPARK_GRAFT_SF_DIRS", "/root/testdata/sf0.01,/root/testdata/sf0.1"
).split(",")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(rows, cols) -> str:
    m = hashlib.sha256()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    for r in sorted(tuple(str(r[i]) for i in order) for r in rows):
        m.update(("|".join(r)).encode())
    return m.hexdigest()


def main() -> None:
    import duckdb

    from duckdb_sudan__spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark("correctness_report")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()
    oracles = entry.oracle_sql()

    sections = []
    for sf_dir in SF_DIRS:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        results = []
        for key, fn in queries.items():
            if key not in oracles:
                continue
            t0 = time.time()
            try:
                df = fn(spark, sf_dir).persist()
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
                results.append((key, len(srows), len(ores), ok_rows, ok_cols, ok_hash, ok_pd, time.time() - t0, None))
            except Exception as exc:  # pragma: no cover - report, don't die
                results.append((key, -1, -1, False, False, False, False, time.time() - t0, str(exc)[:120]))
        sections.append((sf_dir, results))
        con.close()

    # sf1 gate (r9 verdict item 8): the DECIMAL-presentation entry runs
    # additionally at sf1 row counts (the perturbed 6M-row corpus from
    # tools/sf1_float_check.py), where the decimal→DOUBLE presentation
    # class it closes actually bites. Same comparison, same report.
    from tools import sf1_float_check as sfc

    SF1_GATED = ["q1_pricing_decimal"]
    if not os.path.exists(os.path.join(sfc.BIG, "lineitem.parquet")):
        sfc.build_sf1()
    con = duckdb.connect()
    for t in sfc.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfc.BIG}/{t}.parquet')"
        )
    results = []
    for key in SF1_GATED:
        t0 = time.time()
        try:
            df = queries[key](spark, sfc.BIG).persist()
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
            results.append((key, len(srows), len(ores), ok_rows, ok_cols, ok_hash, ok_pd, time.time() - t0, None))
        except Exception as exc:  # pragma: no cover - report, don't die
            results.append((key, -1, -1, False, False, False, False, time.time() - t0, str(exc)[:120]))
    sections.append((f"{sfc.BIG} (sf1 rows)", results))
    con.close()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "CORRECTNESS_LOCAL.md"), "w") as f:
        f.write("# CORRECTNESS_LOCAL — all oracled entries vs DuckDB "
                "(generated by tools/correctness_report.py)\n\n")
        f.write("The driver's CORRECTNESS gate covers the first 50 `queries()` entries; "
                "this report runs the identical comparison (row count + column names + "
                "order-insensitive value hash) over EVERY oracled entry, including the "
                "rotated-out ones, at every listed SF — sf0.1 guards float contracts "
                "that could pass at sf0.01 by luck.\n\n")
        for sf_dir, results in sections:
            n_ok = sum(1 for r in results if r[3] and r[4] and r[5] and r[6])
            f.write(f"## `{sf_dir}` — **{n_ok}/{len(results)} exact (both fetch modes)**\n\n")
            f.write("| entry | spark rows | oracle rows | rows | cols | hash | hash(pd) | sec |\n")
            f.write("|---|---|---|---|---|---|---|---|\n")
            for key, sr, orr, okr, okc, okh, okp, dt, err in results:
                mark = lambda b: "ok" if b else "**FAIL**"  # noqa: E731
                f.write(f"| {key} | {sr} | {orr} | {mark(okr)} | {mark(okc)} | {mark(okh)} | {mark(okp)} | {dt:.1f} |\n")
                if err:
                    f.write(f"| | | | | | error: {err} | | |\n")
    for sf_dir, results in sections:
        n_ok = sum(1 for r in results if r[3] and r[4] and r[5] and r[6])
        print(f"{sf_dir}: {n_ok}/{len(results)} exact (both modes)")


if __name__ == "__main__":
    main()
