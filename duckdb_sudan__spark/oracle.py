"""Helpers for building DuckDB oracle SQL from embedded Python data.

Functions whose data is embedded (geo tables, provider registry,
offline samples) get exact oracles: the same Python rows rendered as a
`VALUES` table. Float literals use repr() (shortest round-trip form),
which DuckDB parses back to the identical binary64 — so value hashes
match bit-for-bit.
"""

from __future__ import annotations


def sql_literal(v: object, duck_type: str) -> str:
    if v is None:
        return f"CAST(NULL AS {duck_type})"
    if duck_type in ("INTEGER", "BIGINT"):
        return f"CAST({int(v)} AS {duck_type})"
    if duck_type == "DOUBLE":
        return f"CAST({v!r} AS DOUBLE)"
    if duck_type == "BOOLEAN":
        return "TRUE" if v else "FALSE"
    # VARCHAR
    s = str(v).replace("'", "''")
    return f"'{s}'"


def values_sql(rows: list[tuple], columns: list[str], duck_types: list[str]) -> str:
    """Render rows as `SELECT * FROM (VALUES ...) t(cols)` for DuckDB.

    Empty row sets produce a typed empty relation via WHERE FALSE.
    """
    col_list = ", ".join(columns)
    if not rows:
        nulls = ", ".join(f"CAST(NULL AS {t})" for t in duck_types)
        return f"SELECT * FROM (SELECT {nulls}) t({col_list}) WHERE FALSE"
    rendered = ",\n    ".join(
        "(" + ", ".join(sql_literal(v, t) for v, t in zip(row, duck_types)) + ")" for row in rows
    )
    return f"SELECT * FROM (VALUES\n    {rendered}\n) t({col_list})"
