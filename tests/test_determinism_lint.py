"""Static determinism lints over every oracle SQL string (r12).

The sf1 overflow gate (tools/correctness_report.py) catches these
classes by EXECUTION at sf1 row counts; these lints catch them at
registration time, before any corpus exists, for the two classes the
repo has actually measured:

- rule 29 (DETERMINISM.md): DuckDB `DECIMAL // x` computes a rounded
  scaled quotient then floors — off-by-one vs Spark `div` truncation
  near boundaries. No oracle may floor-divide a DECIMAL cast.
- the r12 ABC lesson: `<big-const> * SUM(col) OVER ...` rides the
  window sum in BIGINT, and a currency/micro-quantized sum crosses
  int64 once the constant multiplies it (1e6 * cumulative cents
  overflowed at sf1 on BOTH engines). Flagged unless the operand's
  magnitude is argued in ALLOWED_BIGCONST_WINSUM.
"""

from __future__ import annotations

import re

import __spark_entry__ as entry_mod

ORACLES = entry_mod.oracle_sql()

# entries whose big-const × window-sum operand is bounded far inside
# int64 (document the bound when adding here):
ALLOWED_BIGCONST_WINSUM = {
    # cumulative count of DISTINCT PARTS (~2e5·SF): 1e6·cum stays in
    # int64 through ~sf40,000 — a count, not a currency/micro sum
    "q_part_adoption_curve",
}


def test_no_decimal_floordiv_in_oracles():
    p = re.compile(r"DECIMAL\(\d+,\d+\)\)[^,\n]*//", re.I)
    bad = {k: p.search(sql).group(0) for k, sql in ORACLES.items() if p.search(sql)}
    assert not bad, f"rule-29 DECIMAL floor-div in oracles: {bad}"


def test_bigconst_window_sum_products_are_allowlisted():
    p = re.compile(r"\d{6,}\s*\*\s*SUM\([a-z_0-9.]+\)\s*OVER", re.I)
    bad = {
        k: p.search(sql).group(0)
        for k, sql in ORACLES.items()
        if p.search(sql) and k not in ALLOWED_BIGCONST_WINSUM
    }
    assert not bad, (
        "big-constant × window-sum products risk int64 overflow as SF "
        f"grows (the r12 ABC class) — cross-multiply the compare, use "
        f"the DECIMAL-mul + integral-div idiom for emissions, or "
        f"allowlist with a documented bound: {bad}"
    )


def test_allowlist_entries_still_exist():
    stale = ALLOWED_BIGCONST_WINSUM - set(ORACLES)
    assert not stale, f"allowlisted entries no longer registered: {stale}"
