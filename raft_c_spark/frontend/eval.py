"""Constant-fold time-unit expression trees to epoch nanoseconds.

Mirrors the reference's resolution pass (statement_execute.c:177-217 +
eval_op :118-175): every TimeUnit resolves to an int64 ns before the
plan is built — Catalyst then sees plain literals.

Semantics notes:
- TU_VALUE ints are used as-is (caller-supplied epoch; unit ambiguity
  is the caller's problem — SURVEY §1.2);
- date literals → epoch ns, midnight default, UTC;
- ``*`` multiplies two ns quantities (dimensionally nonsensical but
  defined, eval_op src/statement_execute.c:158-170) — replicated.
"""

from __future__ import annotations

from raft_c_spark.frontend import ast
from raft_c_spark.frontend.ast import BinOp
from raft_c_spark.functions.timefn import datetime_to_ns, now_ns, span_to_ns


def eval_timeunit(tu: ast.TimeUnit, now: int | None = None) -> int:
    """Fold a TimeUnit tree to epoch ns. ``now`` pins now() for
    deterministic tests; defaults to the current clock."""
    if isinstance(tu, ast.TuValue):
        return int(tu.value)
    if isinstance(tu, ast.TuDate):
        return datetime_to_ns(tu.date)
    if isinstance(tu, ast.TuSpan):
        return span_to_ns(tu.value, tu.unit)
    if isinstance(tu, ast.TuFunc):
        return now if now is not None else now_ns()
    if isinstance(tu, ast.TuOps):
        left = eval_timeunit(tu.left, now)
        right = eval_timeunit(tu.right, now)
        if tu.op is BinOp.ADD:
            return left + right
        if tu.op is BinOp.SUB:
            return left - right
        if tu.op is BinOp.MUL:
            return left * right
    raise TypeError(f"unknown timeunit node {tu!r}")
