#!/usr/bin/env python
"""Quiet-window phase decomposition of stream_session_window (judge
r11 ask #8): the streaming family's most expensive query (2.46 s
driver / 2.01 s committed in r11) never had the progress-metrics
treatment stream_click_attribution got. This script replays the
registered query's exact machinery with ``recentProgress`` captured
before stop and sums the per-batch phase durations, so the answer to
"where do the ~2 s go" is measured, not narrated: if
queryPlanning + walCommit + commitOffsets (serial driver-side
micro-batch fixed costs) dominate addBatch (the actual stateful
work), the r8 ephemeral-conf scoping is already the ceiling — the
cost is Structured Streaming's per-batch machinery, not the session
state store.

    python scripts/ab_stream_session_phase.py [--samples 4]

Prints one JSON line; paste the phase table into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_PHASES = (
    "addBatch",
    "queryPlanning",
    "walCommit",
    "commitOffsets",
    "getBatch",
    "latestOffset",
    "triggerExecution",
)
_STATE = ("commitTimeMs", "allUpdatesTimeMs", "allRemovalsTimeMs")


def run_once(spark) -> dict:
    """One full session-window stream over the events corpus;
    returns wall + summed per-phase durationMs + state-store ms
    (replicates plans.streaming.q_stream_session_window with
    recentProgress captured before stop)."""
    from pyspark.sql import functions as F

    from raft_c_spark.functions.exact import exact_avg
    from raft_c_spark.plans.streaming import (
        _EVENT_SCHEMA,
        _ephemeral_stream_confs,
        _state_partitions,
        SESSION_GAP,
        WATERMARK,
    )

    name = f"ab_sess_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(_EVENT_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF_DIR)
        .withColumn("event_time", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("event_time", WATERMARK)
        .groupBy(
            F.session_window("event_time", SESSION_GAP).alias("win"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_avg("value").alias("avg_value"),
        )
    )
    t0 = time.perf_counter()
    with _ephemeral_stream_confs(spark, _state_partitions(spark, SF_DIR)):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
            progress = [json.loads(p.json) for p in q.recentProgress]
        finally:
            q.stop()
    wall = round(time.perf_counter() - t0, 3)
    out = {"wall_s": wall, "n_batches": len(progress)}
    for ph in _PHASES:
        out[ph] = sum(p.get("durationMs", {}).get(ph, 0) for p in progress)
    for sm in _STATE:
        out[sm] = sum(
            op.get(sm, 0)
            for p in progress
            for op in p.get("stateOperators", [])
        )
    spark.sql(f"DROP VIEW IF EXISTS {name}")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from raft_c_spark.session import get_spark

    spark = get_spark(app_name="ab_stream_session_phase")

    def calib() -> float:
        t0 = time.perf_counter()
        spark.range(0, 50_000_000, 1, 32).agg(
            F.sum(F.pmod(F.xxhash64("id"), F.lit(1_000_000)))
        ).collect()
        return round(time.perf_counter() - t0, 4)

    # one discarded warm-up (JVM/codegen startup not billed)
    run_once(spark)
    cals = [calib()]
    runs = []
    for _ in range(args.samples):
        runs.append(run_once(spark))
        cals.append(calib())

    result = {
        "metric": "stream_session_window_phase_decomposition",
        "sf_dir": SF_DIR,
        "calib": cals,
        "calib_median": round(statistics.median(cals), 4),
        "runs": runs,
        "epoch_utc": time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime()),
    }
    for k in ("wall_s", *_PHASES, *_STATE):
        result[f"{k}_min"] = min(r[k] for r in runs)
    accounted = sum(
        result[f"{k}_min"]
        for k in ("addBatch", "queryPlanning", "walCommit",
                  "commitOffsets", "getBatch", "latestOffset")
    )
    result["serial_fixed_share"] = round(
        sum(result[f"{k}_min"] for k in
            ("queryPlanning", "walCommit", "commitOffsets",
             "getBatch", "latestOffset"))
        / max(accounted, 1),
        3,
    )
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
