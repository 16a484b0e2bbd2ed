import math
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from duckdb_sudan__spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return v


def canon_rows(cols, rows):
    """Order-insensitive canonical form: columns sorted by name, rows sorted."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def assert_matches_oracle(spark_df, duck_con, oracle_sql, approx_places=None):
    """Replicates the driver's compare: row count + sorted column names +
    order-insensitive values."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.sql(oracle_sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"schema mismatch: {sorted(s_cols)} vs {sorted(d_cols)}"
    assert len(s_rows) == len(d_rows), f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"

    if approx_places is not None:
        def rnd(rows, cols):
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            out = []
            for r in rows:
                out.append(tuple(
                    round(r[i], approx_places) if isinstance(r[i], float) and not math.isnan(r[i]) else _canon(r[i])
                    for i in order
                ))
            return sorted(out, key=repr)
        a, b = rnd(s_rows, s_cols), rnd(d_rows, d_cols)
    else:
        a, b = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert a == b, f"value mismatch; first diffs: {mismatches[:3]}"
