"""Deterministic (engine-independent) aggregate expressions.

Parallel double summation is order-dependent: Spark's partial/final
aggregation and DuckDB's single-threaded sum can differ in the last
ulps, which breaks value-hash comparison. Summing exact DECIMALs is
associative — identical in any engine and any execution order — and
the final cast back to double is deterministic.

Crucial rule: **cast to decimal at the leaves, never on computed
doubles.** The driver's synthetic columns are 2-decimal values, so a
leaf cast at scale 2-4 is ≥3 orders of magnitude away from any
rounding tie; a *computed* double (e.g. price*(1-discount)) can land
exactly on a tie, where Spark (HALF_UP) and DuckDB round differently.
All arithmetic after the leaf cast stays in decimal (exact in both
engines); keep operand precisions small enough that products stay
under precision 38, where Spark starts rounding (allowPrecisionLoss).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scale 10: value quantization ≤ 5e-11 (immaterial next to the
# reference's double semantics — a hypothesis test pins the bound)
# while leaving 28 integer digits of exact-sum headroom
DEC = "decimal(38,10)"
DEC_SQL = "DECIMAL(38,10)"


def dec(col: Column | str, spec: str = "9,2") -> Column:
    """Leaf cast of an input column to DECIMAL(spec)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({spec})")


def sql_dec(expr: str, spec: str = "9,2") -> str:
    return f"CAST({expr} AS DECIMAL({spec}))"


def exact_sum(col: Column | str) -> Column:
    """Sum of a leaf column (auto-cast) or an already-decimal
    expression, as double."""
    c = F.col(col).cast(DEC) if isinstance(col, str) else col
    return F.sum(c).cast("double")


def exact_avg(col: Column | str) -> Column:
    """Exact-sum / count — deterministic double division at the end."""
    c = F.col(col).cast(DEC) if isinstance(col, str) else col
    return F.sum(c).cast("double") / F.count(c)


def sql_sum(expr: str) -> str:
    """Oracle-side sum of a leaf column (auto-cast to the default
    decimal). For computed expressions, pass an already-decimal expr
    built with sql_dec to sql_sum_expr instead."""
    return f"CAST(SUM(CAST({expr} AS {DEC_SQL})) AS DOUBLE)"


def sql_avg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {DEC_SQL})) AS DOUBLE) / COUNT({expr})"


def sql_sum_expr(expr: str) -> str:
    """Oracle-side sum of an already-decimal expression, as double."""
    return f"CAST(SUM({expr}) AS DOUBLE)"
