"""Driver-facing streaming queries: a REAL Structured Streaming
execution (file micro-batch source → watermarked window agg → memory
sink) whose final result is deterministic and oracle-checkable —
replaying the whole events table in arrival order yields the same
windows a batch engine computes (no row is later than the watermark
when the file arrives as one batch)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F
from pyspark.sql import types as Ty

from raft_c_spark.functions.exact import exact_avg, sql_avg
from raft_c_spark.session import ensure_runtime_confs
from raft_c_spark.streaming.ingest import WATERMARK

HOUR_NS = 3_600_000_000_000

#: the driver's events parquet carries ns timestamps — streamed as
#: longs (nanosAsLong) and converted to a µs TimestampType column for
#: watermark/window mechanics (window bounds are hour-aligned, so µs
#: truncation cannot move a point across a bucket)
_NS_EVENT_SCHEMA = Ty.StructType(
    [
        Ty.StructField("event_id", Ty.LongType()),
        Ty.StructField("ts", Ty.LongType()),
        Ty.StructField("user_id", Ty.LongType()),
        Ty.StructField("event_type", Ty.StringType()),
        Ty.StructField("value", Ty.DoubleType()),
        Ty.StructField("props", Ty.StringType()),
    ]
)


def q_stream_tumbling_avg(spark, sf_dir):
    """Hourly tumbling averages per series, computed by a streaming
    query over the events parquet (complete output mode so the final
    state is the full history), returned as the finished batch frame
    with ns-long window bounds."""
    ensure_runtime_confs(spark)
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(_NS_EVENT_SCHEMA)
        # file stream sources need a directory basePath; select just
        # the events file from the shared testdata dir
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
    )
    agg = (
        stream.withWatermark("event_time", WATERMARK)
        .groupBy(
            F.window("event_time", "1 hour").alias("win"),
            F.col("event_type").alias("series"),
        )
        .agg(
            exact_avg("value").alias("avg_value"),
            F.count(F.lit(1)).alias("n_points"),
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table(name)
    return out.select(
        "series",
        (F.unix_micros(F.col("win.start")) * 1000).alias("window_start"),
        (F.unix_micros(F.col("win.end")) * 1000).alias("window_end"),
        "avg_value",
        "n_points",
    )


QUERIES = {"stream_tumbling_avg": q_stream_tumbling_avg}

ORACLES = {
    "stream_tumbling_avg": f"""
        SELECT event_type AS series,
               epoch_ns(ts) - epoch_ns(ts) % {HOUR_NS} AS window_start,
               epoch_ns(ts) - epoch_ns(ts) % {HOUR_NS} + {HOUR_NS} AS window_end,
               {sql_avg('value')} AS avg_value,
               COUNT(*) AS n_points
        FROM events
        GROUP BY series, window_start, window_end
    """,
}
