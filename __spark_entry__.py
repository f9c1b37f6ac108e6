"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``raft_c_spark``; this module only adapts it
to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: hourly tumbling-window
    averages per series (the reference's SAMPLE BY, its only window op)
    over the canonical points frame."""
    from raft_c_spark.plans.parity import q_sample_1h

    return q_sample_1h(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from raft_c_spark.plans.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from raft_c_spark.plans.registry import all_oracles

    return all_oracles()
