"""Point-frame interchange: read/write the canonical
``(series, timestamp, value)`` schema as parquet, ORC, CSV, or JSON
lines.

Parquet is the engine's native store (tsstore.py handles the
partitioned layout); CSV/JSON are the interchange formats — explicit
schema on read (never inferSchema: a sampling pass over 100 TB, and
long-vs-double ambiguity would corrupt ns timestamps), written with
exact ns longs (no float round-trip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raft_c_spark.sources.tsstore import POINT_SCHEMA

FORMATS = ("parquet", "orc", "csv", "json")


def write_points(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    out = df.select(
        F.col("series").cast("string"),
        F.col("timestamp").cast("long"),
        F.col("value").cast("double"),
    )
    writer = out.write.mode("overwrite")
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "orc":
        writer.orc(path)
    elif fmt == "csv":
        writer.option("header", "true").csv(path)
    else:
        writer.json(path)


def read_points(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    if fmt == "parquet":
        return spark.read.schema(POINT_SCHEMA).parquet(path)
    if fmt == "orc":
        return spark.read.schema(POINT_SCHEMA).orc(path)
    if fmt == "csv":
        return (
            spark.read.schema(POINT_SCHEMA)
            .option("header", "true")
            .csv(path)
        )
    return spark.read.schema(POINT_SCHEMA).json(path)
