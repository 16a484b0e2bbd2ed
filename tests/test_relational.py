"""Every registered relational/analytic query hash-matches its DuckDB
oracle at sf0.01 — the same comparison the driver runs."""

import pytest

from duckdb_sudan__spark import operators
from duckdb_sudan__spark.operators import ORACLES, QUERIES
from tests.conftest import SF_DIR, assert_matches_oracle

operators.load_all()

RELATIONAL_KEYS = [k for k in QUERIES if k.startswith(("q", "w", "rollup", "cube", "setops", "distinct", "cte", "pivot", "ev_"))]


@pytest.mark.parametrize("key", RELATIONAL_KEYS)
def test_query_matches_oracle(spark, duck, key):
    if key not in ORACLES:
        pytest.skip("rows-only operator")
    df = QUERIES[key](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLES[key])
    assert df.count() >= 0
