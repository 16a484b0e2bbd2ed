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


def test_regression_matches_numpy_reference(spark, duck):
    """agg_regression's closed-form slope/intercept/r2 must match a
    from-scratch numpy least-squares on the collected data (rtol 1e-9)
    — the oracle only proves both engines run the same arithmetic."""
    import numpy as np

    from duckdb_sudan__spark.operators import QUERIES
    from duckdb_sudan__spark.session import load_table

    rows = QUERIES["agg_regression"](spark, SF_DIR).collect()
    data = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .collect()
    )
    by_flag: dict[str, list] = {}
    for r in data:
        by_flag.setdefault(r["l_returnflag"], []).append((r["l_quantity"], r["l_extendedprice"]))
    assert len(rows) == len(by_flag)
    for r in rows:
        xy = np.asarray(by_flag[r["l_returnflag"]], dtype=np.float64)
        x, y = xy[:, 0], xy[:, 1]
        slope, intercept = np.polyfit(x, y, 1)
        corr = np.corrcoef(x, y)[0, 1]
        assert r["regr_count"] == len(x)
        assert np.isclose(r["regr_slope"], slope, rtol=1e-9)
        assert np.isclose(r["regr_intercept"], intercept, rtol=1e-9)
        assert np.isclose(r["regr_r2"], corr * corr, rtol=1e-9)


def test_not_in_null_semantics_shape(spark):
    """The three variants must relate exactly as ANSI tri-valued logic
    dictates: clean NOT IN > 0; the same list with one NULL filters
    EVERYTHING (0); NOT EXISTS recovers clean + the nulled key's rows."""
    from duckdb_sudan__spark.operators import QUERIES
    from tests.conftest import SF_DIR

    got = {r.variant: r.n_orders for r in
           QUERIES["setops_not_in_null_semantics"](spark, SF_DIR).collect()}
    assert got["not_in_list_with_null"] == 0
    assert got["not_in_clean_list"] > 0
    assert got["not_exists_rewrite"] > got["not_in_clean_list"]
