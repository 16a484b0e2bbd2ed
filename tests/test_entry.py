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


def test_correctness_window_is_full_and_oracled():
    """The driver hashes only the FIRST 50 queries() entries: that
    window must stay exactly 50 unique keys, every one oracled —
    otherwise a rotation edit silently wastes driver coverage."""
    import __spark_entry__ as E

    keys = list(E.queries())
    oracles = E.oracle_sql()
    window = keys[:50]
    assert len(set(window)) == 50
    missing = [k for k in window if k not in oracles]
    assert not missing, f"non-oracled entries inside the window: {missing}"
    # every oracle key must correspond to a registered query
    assert set(oracles) <= set(keys)


def test_r13_window_plan_executed_verbatim():
    """r13 open (VERDICT r12 item 1): the live window must BE the
    committed machine-checked r13 plan — 50 unique names, every one a
    registered ORACLED entry, zero overlap with the executed r12 window
    (a rotation, not a repeat), and the leading 39 never driver-hashed
    before this round."""
    import __spark_entry__ as E

    import json

    plan = E._R13_WINDOW_PLAN
    oracles = E.oracle_sql()
    queries = E.queries()
    assert E._WINDOW_PRIORITY == plan, "r13 window differs from the committed plan"
    assert len(plan) == 50 and len(set(plan)) == 50
    missing_q = [k for k in plan if k not in queries]
    missing_o = [k for k in plan if k not in oracles]
    assert not missing_q, f"r13 plan names unregistered entries: {missing_q}"
    assert not missing_o, f"r13 plan names rows-only entries: {missing_o}"
    assert not set(plan) & set(E._R12_WINDOW), "r13 plan repeats the r12 window"
    # composition: the leading 39 are exactly entries NO committed
    # driver CORRECTNESS file BEFORE r13 had ever hashed — the
    # definition of window debt (r13's own JSON will contain them once
    # the driver runs, so exclude it from the debt scan).
    import glob

    driver_checked: set[str] = set()
    for path in glob.glob("CORRECTNESS_r*.json"):
        rnd = int(path.split("_r")[1].split(".")[0])
        if rnd < 13:
            driver_checked.update(json.load(open(path)))
    already = [k for k in plan[:39] if k in driver_checked]
    assert not already, f"r13 plan's overflow block holds driver-checked keys: {already}"


def test_r14_window_plan_is_valid():
    """The committed r14 window literal must be executable as-is at r14
    open: 50 unique registered ORACLED entries, zero overlap with the
    live r13 window (a rotation, not a repeat), led by exactly the
    entries NO committed driver CORRECTNESS file (r13 included, once it
    lands) will have hashed — the r13 additions — then the oldest
    stale classes in order (machine-derived, not hand-claimed)."""
    import glob
    import json

    import __spark_entry__ as E

    plan = E._R14_WINDOW_PLAN
    oracles = E.oracle_sql()
    queries = E.queries()
    assert len(plan) == 50 and len(set(plan)) == 50
    missing_q = [k for k in plan if k not in queries]
    missing_o = [k for k in plan if k not in oracles]
    assert not missing_q, f"r14 plan names unregistered entries: {missing_q}"
    assert not missing_o, f"r14 plan names rows-only entries: {missing_o}"
    assert not set(plan) & set(E._WINDOW_PRIORITY), "r14 plan repeats the r13 window"
    # recompute the composition from the committed driver files: the
    # leading block must be exactly the never-driver-checked oracled
    # entries (treating the live r13 window as checked — its JSON lands
    # when the driver runs), and the tail must drain oldest-first.
    latest: dict[str, int] = {}
    for path in glob.glob("CORRECTNESS_r*.json"):
        rnd = int(path.split("_r")[1].split(".")[0])
        for k in json.load(open(path)):
            latest[k] = max(latest.get(k, 0), rnd)
    for k in E._WINDOW_PRIORITY:
        latest[k] = max(latest.get(k, 0), 13)
    never = sorted(k for k in oracles if k not in latest)
    assert plan[: len(never)] == never, (
        f"r14 plan must lead with the never-checked entries {never}"
    )
    fill = plan[len(never):]
    fill_rounds = [latest[k] for k in fill]
    assert fill_rounds == sorted(fill_rounds), "r14 fill must drain oldest-first"
    oldest = min(r for k, r in latest.items() if k in oracles)
    stale_oldest = sorted(k for k, r in latest.items() if r == oldest and k in oracles)
    n_old = min(len(stale_oldest), len(fill))
    assert fill[:n_old] == stale_oldest[:n_old], (
        "r14 fill must take the oldest class alphabetically"
    )
