"""Bucketed (pre-shuffled) table layout — the co-located-join storage
strategy for 100 TB fact tables.

A join or aggregation on a bucketed table's bucket keys needs NO
exchange: the writer hash-partitions rows into a fixed number of
bucket files per partition (``bucketBy``), the reader reports that
hashpartitioning as the scan's output distribution, and Catalyst
drops the shuffle it would otherwise insert. For the workloads this
engine targets — repeated joins of ``orders ⋈ lineitem``-shaped fact
pairs, repeated per-key aggregation over a fact table — paying ONE
write-time shuffle instead of one per query is the standard
deployment move; this module is the engine's supported path to it
(Spark bucketing is metastore-backed, so tables land in the
session's warehouse via ``saveAsTable``).

Caveats the tests pin:
- both sides of an exchange-free join must share bucket COUNT and
  KEYS (mismatched counts re-shuffle one side);
- ``sortBy`` at write time additionally removes the SortMergeJoin's
  per-partition sorts;
- Spark splits each bucket's files one-task-per-bucket at read time,
  so ``n_buckets`` is the join's parallelism floor — size it to
  ~2-4x the executor count at deployment, exactly like
  ``spark.sql.shuffle.partitions``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    sort_keys: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed on ``keys`` (and
    optionally sorted within buckets) in the session warehouse."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    if not keys:
        raise ValueError("at least one bucket key required")
    # the name is interpolated into DROP TABLE SQL and joined into an
    # rmtree path below — enforce the simple-unqualified-name
    # convention instead of just documenting it (advisor r11: a name
    # containing '/' or '..' would delete outside the warehouse)
    import re

    # leading digit excluded too (advisor r12): '1tbl' is not a valid
    # unquoted identifier in the DROP TABLE path and would otherwise
    # surface later as a confusing SQL parse error
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", table):
        raise ValueError(
            f"table name must be a simple identifier "
            f"([A-Za-z_][A-Za-z0-9_]*), got {table!r}"
        )
    if mode == "overwrite":
        # a fresh (in-memory-metastore) session may not know the
        # table while its MANAGED location survives from an earlier
        # session — saveAsTable then fails LOCATION_ALREADY_EXISTS
        # instead of overwriting. Drop both the catalog entry and the
        # orphaned default location (simple, unqualified names only —
        # the engine's warehouse convention).
        import os
        import shutil

        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        shutil.rmtree(os.path.join(wh, table.lower()), ignore_errors=True)
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *keys)
    )
    if sort_keys:
        w = w.sortBy(*sort_keys)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; the scan carries the bucket
    distribution so downstream joins/aggregations on the bucket keys
    plan without an exchange."""
    return spark.table(table)
