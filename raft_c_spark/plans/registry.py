"""Central registry of driver-facing queries and their DuckDB oracles.

``__spark_entry__.queries()`` / ``oracle_sql()`` read from here; each
plans module contributes its QUERIES/ORACLES dicts. A query without an
oracle entry is checked rows-only by the driver (reserved for
genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from raft_c_spark.plans import parity, tpch

    mods = [parity, tpch]
    for name in (
        "tpch2",
        "tpch3",
        "tpch4",
        "language",
        "dedup",
        "text",
        "similarity",
        "streaming",
        "multimodal",
        "semistructured",
        "events_analytics",
        "sampling",
    ):
        try:
            mods.append(
                __import__(f"raft_c_spark.plans.{name}", fromlist=[name])
            )
        except ImportError:
            pass
    return mods


def _with_cache_hygiene(fn: Callable) -> Callable:
    """Several operators cache intermediate frames (shingles,
    signatures) that stay referenced by the returned plan; clearing
    the cache *before* each query stops those from accumulating across
    a long session (the driver runs all ~50 queries in one session —
    unbounded storage-memory growth degrades later queries)."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for mod in _modules():
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {sorted(overlap)}")
        out.update({k: _with_cache_hygiene(v) for k, v in mod.QUERIES.items()})
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(getattr(mod, "ORACLES", {}))
    return out
