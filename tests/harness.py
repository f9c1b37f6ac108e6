"""Local replica of the driver's duckdb-oracle comparison: run a Spark
DataFrame and an oracle SQL on the same tables, sort columns by name,
compare row multisets (float-tolerant)."""

from __future__ import annotations

import math
from typing import Any


def _norm_cell(x: Any) -> Any:
    if isinstance(x, float):
        if math.isnan(x):
            return "NaN"
        return round(x, 6)
    if hasattr(x, "timestamp"):  # datetime
        return x.isoformat()
    if isinstance(x, list):
        return tuple(_norm_cell(v) for v in x)
    return x


def _row_key(row: tuple) -> tuple:
    # type-stable total order: rows may contain NULLs and mixed types
    return tuple((repr(type(c)), repr(c)) for c in row)


def df_rows(df) -> list[tuple]:
    cols = sorted(df.columns)
    return sorted(
        (tuple(_norm_cell(r[c]) for c in cols) for r in df.collect()),
        key=_row_key,
    )


def duck_rows(con, sql: str) -> list[tuple]:
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    return sorted(
        (tuple(_norm_cell(row[i]) for i in order) for row in cur.fetchall()),
        key=_row_key,
    )


def assert_matches_oracle(df, con, sql: str, name: str = "query") -> None:
    a = df_rows(df)
    b = duck_rows(con, sql)
    assert len(a) == len(b), f"{name}: row count {len(a)} != oracle {len(b)}"
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: "
        f"spark={a[mism[0]]} oracle={b[mism[0]]}"
    )
