"""Shared constants/parsers for the external correctness-driver
contract — the single source of truth for "how big is the driver's
hash window" and "what counts as a green driver row", imported by
``tests/test_window_policy.py``, ``scripts/gen_driver_green.py`` and
``scripts/driver_sim.py`` so the rotation policy, its CI guard, and
the generated COVERAGE audit can never silently disagree (reviewer
r8: the three had independent copies of both).
"""

from __future__ import annotations

import json
import re
from pathlib import Path

#: number of registry-ordered queries the external driver hash-checks
WINDOW = 50


def correctness_artifacts(repo_root: str | Path) -> list[Path]:
    return sorted(
        p
        for p in Path(repo_root).glob("CORRECTNESS_r*.json")
        if re.fullmatch(r"CORRECTNESS_r\d+\.json", p.name)
    )


def row_is_green(row: dict) -> bool:
    """All-green driver row: rows + schema + hash all match (an err
    row has these unset/false)."""
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
    )


def driver_green_rounds(repo_root: str | Path) -> dict[str, list[int]]:
    """Per query: the rounds with an all-green driver row."""
    out: dict[str, list[int]] = {}
    for f in correctness_artifacts(repo_root):
        rnd = int(re.search(r"r0*(\d+)", f.stem).group(1))
        for q, row in json.loads(f.read_text()).items():
            if row_is_green(row):
                out.setdefault(q, []).append(rnd)
    return out


def driver_rows(repo_root: str | Path) -> dict[str, dict[int, str]]:
    """Per query: round → 'green' | 'red' | 'err' for every driver row."""
    out: dict[str, dict[int, str]] = {}
    for f in correctness_artifacts(repo_root):
        rnd = int(re.search(r"r0*(\d+)", f.stem).group(1))
        for q, row in json.loads(f.read_text()).items():
            if row.get("err"):
                st = "err"
            elif row_is_green(row):
                st = "green"
            else:
                st = "red"
            out.setdefault(q, {})[rnd] = st
    return out
