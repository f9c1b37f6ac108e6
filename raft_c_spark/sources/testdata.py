"""Readers for the driver-provided synthetic tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}/``.

``events.ts`` is parquet INT64 TIMESTAMP(NANOS) — read as a plain long
(nanoseconds) via ``spark.sql.legacy.parquet.nanosAsLong``, which is
exactly the engine's canonical timestamp representation
(reference: uint64 ns, src/timeseries.h:52).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raft_c_spark.session import ensure_runtime_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_runtime_confs(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def events_as_points(
    spark: SparkSession,
    sf_dir: str,
    t0: int | None = None,
    t1: int | None = None,
) -> DataFrame:
    """The ``events`` table reshaped to the engine's canonical point
    schema ``(series, timestamp, value)`` — one series per event_type.

    This is the bridge between the driver's synthetic data and the
    reference's data model (one named series of (ts_ns, double) points,
    src/timeseries.h:101-110): series name ≙ event_type, timestamp ≙
    event time in ns, value ≙ the event's double payload.

    ``t0``/``t1`` (inclusive ns bounds on the *truncated* timestamp)
    are applied to the **raw physical column** so they reach the
    parquet scan as PushedFilters — a filter on the derived truncated
    column cannot push down. Truncation is monotone, giving exact
    raw-column bounds: ``trunc(ts) ≥ t0 ⇔ ts ≥ ceil_µs(t0)`` and
    ``trunc(ts) ≤ t1 ⇔ ts ≤ floor_µs(t1) + 999``.
    """
    ev = load_table(spark, sf_dir, "events")
    raw = F.col("ts").cast("long")
    if t0 is not None:
        ev = ev.filter(raw >= F.lit(((t0 + 999) // 1000) * 1000))
    if t1 is not None:
        ev = ev.filter(raw <= F.lit((t1 // 1000) * 1000 + 999))
    # Truncate ns → µs-resolution ns values: DuckDB (the correctness
    # oracle) reads parquet TIMESTAMP(NANOS) as µs TIMESTAMP, so its
    # epoch_ns(ts) is truncated to µs; match it exactly. Full-ns
    # resolution paths are exercised by the pytest suite on
    # self-generated data instead.
    t = F.col("ts").cast("long")
    return ev.select(
        F.col("event_type").alias("series"),
        (t - (t % F.lit(1000))).alias("timestamp"),
        F.col("value").cast("double").alias("value"),
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL surface)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
