"""Driver-contract test: every queries() entry runs; every oracle_sql()
entry hash-matches at sf0.01 — exactly what the driver will do."""

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR, assert_matches_oracle

ALL_QUERIES = entry_mod.queries()
ALL_ORACLES = entry_mod.oracle_sql()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.schema.fields) > 0


def test_every_oracle_key_has_query():
    assert set(ALL_ORACLES) <= set(ALL_QUERIES)


@pytest.mark.parametrize("key", sorted(ALL_QUERIES))
def test_query_contract(spark, duck, key):
    df = ALL_QUERIES[key](spark, SF_DIR)
    if key in ALL_ORACLES:
        assert_matches_oracle(df, duck, ALL_ORACLES[key])
    else:
        assert df.collect() is not None
