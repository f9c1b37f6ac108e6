"""Structured Streaming ingest — the Spark mapping of the reference's
write path (SURVEY §2.9):

| reference                                   | here                        |
|---------------------------------------------|-----------------------------|
| head chunk absorbing in-order inserts       | current micro-batch         |
| prev chunk absorbing ≤15-min-late points    | in-window rows of the batch |
| older-than-prev forced flush that KEEPS the | policy-aware batch append   |
|   old data (src/timeseries.c:545-582)       |   into the old partitions   |
| WAL durability (src/wal.c:70-83)            | checkpoint + idempotent     |
|                                             |   foreachBatch sink         |
| chunk rotation every 900 s                  | tumbling window state       |

The 15-minute lateness window is exactly the reference's one-chunk
window (TS_CHUNK_SIZE=900 s, src/timeseries.h:13). Two consumers with
different lateness semantics:

- **store ingest** (``stream_ingest_to_store``): nothing is dropped.
  Rows older than the running high-water-mark − window are routed
  through the duplication-policy merge into their historical
  (series, day) partitions — the reference's forced-flush-and-reinit
  corner collapses to an ordinary partitioned append here, because
  the store has no in-memory head/prev buffers to protect.
- **streaming aggregates** (``stream_tumbling_avg``): watermark
  semantics — late rows beyond the window are excluded from the
  *incremental* result (bounded state, each window emitted once).
  Because the store keeps them, a batch SAMPLE BY over the store
  reconciles exactly (the lambda read-path; engine.py SELECT).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as Ty
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: schema of the events stream (TESTDATA.md), ts as TimestampType for
#: watermarking (µs precision is sufficient for window bounds; the
#: store keeps ns longs)
EVENT_SCHEMA = Ty.StructType(
    [
        Ty.StructField("event_id", Ty.LongType()),
        Ty.StructField("ts", Ty.TimestampType()),
        Ty.StructField("user_id", Ty.LongType()),
        Ty.StructField("event_type", Ty.StringType()),
        Ty.StructField("value", Ty.DoubleType()),
        Ty.StructField("props", Ty.StringType()),
    ]
)

WATERMARK = "15 minutes"  # ≙ prev-chunk lateness window (900 s)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-based micro-batch source over a directory of parquet drops
    (one file per arrival batch — the test harness's replay mechanism;
    production would be Kafka with the same downstream graph)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


#: prev-chunk lateness window in ns (TS_CHUNK_SIZE=900 s)
LATENESS_NS = 900 * 10**9


def stream_ingest_to_store(
    stream: DataFrame,
    store,
    db: str,
    checkpoint: str,
    duplication: str = "insert",
    lateness_ns: int = LATENESS_NS,
    stats: dict | None = None,
):
    """Checkpointed ingest: foreachBatch appends each micro-batch to
    the partitioned store — the WAL/flush story of the reference,
    storage-layer durability.

    Delivery contract (reviewer r8 — the old docstring over-claimed
    "idempotent per epoch"): foreachBatch is AT-LEAST-ONCE. A crash
    between an epoch's append and its checkpoint commit replays the
    epoch, and under ``duplication='insert'`` (the default, matching
    the reference's DP_INSERT) the replay appends the same rows
    again. Effective exactly-once requires ``duplication='ignore'``
    (replayed timestamps anti-join away against the already-written
    partitions) or ``'update'`` (replays overwrite themselves) —
    pick the policy by the series' semantics, exactly as the
    reference's duplication option chooses.

    Rows with a NULL event time are rejected in the sink (counted in
    ``stats['n_null_ts']``): a point without a timestamp can't be
    routed, and the old behavior depended on arrival order (inserted
    when they landed in the first batch, silently dropped by the
    null-rejecting watermark filters afterwards).

    Late data is never dropped. Each batch splits at the running
    event-time high-water-mark minus ``lateness_ns``: in-window rows
    take the normal append (the head/prev-chunk route), while
    older-than-watermark rows take the same *policy-aware* append into
    their historical (series, day) partitions — the reference's
    older-than-prev forced flush, which re-inits the prev chunk at the
    older base and KEEPS the data (src/timeseries.c:545-582). In a
    day-partitioned store that corner is just a partitioned write to
    old directories; ``duplication='ignore'`` merges against only the
    touched partitions (anti-join pruned by (series, day)).

    ``stats`` (optional dict) accumulates ``n_late`` and the current
    ``watermark_ts`` for observability/tests."""
    pts = stream.select(
        F.col("event_type").alias("series"),
        (F.unix_micros("ts") * 1000).alias("timestamp"),
        F.col("value").cast("double").alias("value"),
    )
    hwm: dict = {"max_ts": None}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist()
        try:
            n_null = batch_df.filter(F.col("timestamp").isNull()).count()
            if n_null:
                if stats is not None:
                    stats["n_null_ts"] = stats.get("n_null_ts", 0) + n_null
                batch_df = batch_df.filter(F.col("timestamp").isNotNull())
            hi = batch_df.agg(F.max("timestamp").alias("m")).first()["m"]
            if hi is None:
                return
            if hwm["max_ts"] is None:
                store.insert_df(db, batch_df, duplication)
                n_late = 0
            else:
                cutoff = hwm["max_ts"] - lateness_ns
                store.insert_df(
                    db,
                    batch_df.filter(F.col("timestamp") >= F.lit(cutoff)),
                    duplication,
                )
                n_late = store.insert_df(
                    db,
                    batch_df.filter(F.col("timestamp") < F.lit(cutoff)),
                    duplication,
                )
            hwm["max_ts"] = max(hwm["max_ts"] or hi, hi)
            if stats is not None:
                stats["n_late"] = stats.get("n_late", 0) + n_late
                stats["watermark_ts"] = hwm["max_ts"] - lateness_ns
        finally:
            batch_df.unpersist()

    return (
        pts.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def stream_dedup(
    stream: DataFrame,
    key_cols: list[str],
    watermark: str = WATERMARK,
) -> DataFrame:
    """Streaming exact dedup — the ingest-time guard of a training
    pipeline (duplicate events/documents arriving within the lateness
    window are dropped before they reach the store). State holds one
    entry per key only until the event-time watermark passes it
    (``dropDuplicatesWithinWatermark``), so memory is bounded by key
    arrival rate × window, not by stream history — the property that
    lets this run forever at ingest scale. Exact-once per key within
    the window; duplicates farther apart than the window are the
    batch dedup pass's job (dedup.exact_duplicates over the store)."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def stream_enrich(
    stream: DataFrame, static_df: DataFrame, key: str | list[str]
) -> DataFrame:
    """Stream-static enrichment join — attach dimension attributes
    (user profile, document metadata) to a stream. Stateless: each
    micro-batch joins against the static side's CURRENT snapshot, so
    no streaming state accumulates; small dimensions broadcast, large
    ones shuffle per batch — exactly the batch join economics."""
    return stream.join(static_df, key, "left")


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    lookback: str = "1 hour",
    watermark: str = WATERMARK,
) -> DataFrame:
    """Watermarked stream-stream inner join: each right-side row joins
    left-side rows with the same key whose event time falls in
    ``[right.ts - lookback, right.ts]`` — the streaming form of the
    attribution join (click within the hour before a purchase).

    Both sides carry watermarks and the join condition bounds event
    time in BOTH directions, so Spark can expire buffered state for
    either side once the watermark passes its reach — the state-bound
    requirement that makes this runnable forever. Without the range
    condition the left buffer would grow without bound.

    Columns from both sides are returned with ``l_`` / ``r_``
    prefixes (the inputs share a schema in the common self-join
    case)."""
    l = left.withWatermark(ts_col, watermark).select(
        *[F.col(c).alias(f"l_{c}") for c in left.columns]
    )
    r = right.withWatermark(ts_col, watermark).select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns]
    )
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col(f"l_{ts_col}") >= F.expr(f"r_{ts_col} - INTERVAL {lookback}"))
        & (F.col(f"l_{ts_col}") <= F.col(f"r_{ts_col}"))
    )
    return l.join(r, cond, "inner")


def stream_session_agg(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = WATERMARK,
) -> DataFrame:
    """Streaming sessionization via native session windows
    (``F.session_window`` — dynamic-gap merging state, closed and
    emitted once the watermark passes the gap): the streaming dual of
    the batch sessionize operator. State per (user, open session),
    bounded by the watermark."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def stream_tumbling_avg(
    stream: DataFrame, window: str = "1 hour"
) -> DataFrame:
    """Watermarked tumbling-window average per series — the streaming
    SAMPLE BY (§2.6). Late data beyond 15 min is dropped (bounded
    lateness ≙ the prev-chunk mechanism); append mode emits each
    window once its watermark passes."""
    return (
        stream.withWatermark("ts", WATERMARK)
        .groupBy(
            F.window("ts", window).alias("win"),
            F.col("event_type").alias("series"),
        )
        .agg(
            F.avg("value").alias("avg_value"),
            F.count(F.lit(1)).alias("n_points"),
        )
        .select(
            "series",
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "avg_value",
            "n_points",
        )
    )


_STATE_SCHEMA = "last_ts long, n_points long, n_ooo long"
_OUT_SCHEMA = (
    "series string, last_ts long, n_points long, n_ooo long"
)


def _series_state_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Custom stateful operator: per-series ingest accounting — last
    timestamp seen, total points, out-of-order arrivals (points older
    than the running max). This is the reference's head/prev chunk
    bookkeeping (src/timeseries.c:621-682) as an explicit state
    machine."""
    import numpy as np

    if state.exists:
        last_ts, n_points, n_ooo = state.get
    else:
        last_ts, n_points, n_ooo = 0, 0, 0
    for pdf in pdfs:
        ts = pdf["timestamp"].to_numpy()
        if len(ts):
            # a point is OOO if older than the running max (incl. the
            # carried state) — the reference's prev-chunk routing test
            # (sec < head.base_offset, src/timeseries.c:663)
            running_max = np.maximum.accumulate(
                np.concatenate(([last_ts], ts))
            )[:-1]
            n_ooo += int((ts < running_max).sum())
            n_points += len(ts)
            last_ts = max(last_ts, int(ts.max()))
    state.update((last_ts, n_points, n_ooo))
    yield pd.DataFrame(
        [[key[0], last_ts, n_points, n_ooo]],
        columns=["series", "last_ts", "n_points", "n_ooo"],
    )


def stream_series_state(stream: DataFrame) -> DataFrame:
    """applyInPandasWithState over the point stream: per-series
    (last_ts, n_points, n_ooo) — the custom-stateful-operator surface
    (§2.10 / SURVEY §7 M4)."""
    pts = stream.select(
        F.col("event_type").alias("series"),
        (F.unix_micros("ts") * 1000).alias("timestamp"),
    )
    return pts.groupBy("series").applyInPandasWithState(
        _series_state_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
