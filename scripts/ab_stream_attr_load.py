#!/usr/bin/env python
"""Under-load phase decomposition of stream_click_attribution (judge
r10 "what's wrong" #3): the driver has twice read this query high
(r7 3.25 s, r10 4.80 s vs committed 1.67 s), each time attributed to
epoch noise on fixed-cost-heavy micro-batch machinery. This settles
WHERE the inflation lands: run the query with per-batch progress
metrics (the r8 decomposition) in a quiet window, then again under a
CONTROLLED memory-bandwidth interference wave (W background workers
streaming large numpy arrays — the same contention class the
collocations dissection identified), and compare phase-by-phase.
Two probe classes classify the wave like the r10 methodology: the
register-bound calib probe should stay ~flat (bandwidth waves don't
charge registers) while the bandwidth probe inflates.

    python scripts/ab_stream_attr_load.py [--workers 16] [--samples 3]

Prints one JSON line; paste the phase table into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
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
    "triggerExecution",
)
_STATE = ("commitTimeMs", "allUpdatesTimeMs", "allRemovalsTimeMs")

#: each worker streams 2 x LOAD_MB of float64 through the memory
#: controllers in a tight loop; few workers x large arrays makes a
#: BANDWIDTH-dominant wave (calib probe ~flat), many workers x small
#: arrays adds CPU steal on top (calib inflates too) — pass --workers
#: and --load-mb to pick the wave class, and read the two probe
#: ratios in the output to see which class actually materialized
_LOAD_SRC = (
    "import sys, numpy as np\n"
    "n = int(sys.argv[1]) * 1024 * 1024 // 8\n"
    "a = np.ones(n, dtype=np.float64)\n"
    "b = np.ones_like(a)\n"
    "while True:\n"
    "    np.add(b, a, out=b)\n"
)


def run_once(spark) -> dict:
    """One full click-attribution stream; returns wall + summed
    per-phase durationMs + state-store ms across all micro-batches
    (replicates plans.streaming.q_stream_click_attribution with
    recentProgress captured before stop)."""
    from pyspark.sql import functions as F

    from raft_c_spark.plans.streaming import (
        _EVENT_SCHEMA,
        _ephemeral_stream_confs,
        _state_partitions,
    )
    from raft_c_spark.streaming.ingest import stream_stream_join

    name = f"ab_attr_{uuid.uuid4().hex[:8]}"

    def _stream(event_type):
        return (
            spark.readStream.schema(_EVENT_SCHEMA)
            .option("pathGlobFilter", "events.parquet")
            .parquet(SF_DIR)
            .filter(F.col("event_type") == event_type)
            .select(
                "event_id",
                "user_id",
                F.col("ts").cast("timestamp").alias("event_time"),
            )
        )

    joined = stream_stream_join(
        _stream("click"), _stream("purchase"),
        key="user_id", ts_col="event_time", lookback="1 hour",
    )
    t0 = time.perf_counter()
    with _ephemeral_stream_confs(spark, _state_partitions(spark, SF_DIR)):
        q = (
            joined.writeStream.outputMode("append")
            .format("memory").queryName(name).start()
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
    ap.add_argument("--workers", type=int, default=16)
    ap.add_argument("--load-mb", type=int, default=256)
    ap.add_argument("--samples", type=int, default=3)
    args = ap.parse_args()

    import numpy as np
    from pyspark.sql import functions as F

    from raft_c_spark.session import get_spark

    spark = get_spark(app_name="ab_stream_attr_load")

    def calib() -> float:
        t0 = time.perf_counter()
        spark.range(0, 50_000_000, 1, 32).agg(
            F.sum(F.pmod(F.xxhash64("id"), F.lit(1_000_000)))
        ).collect()
        return round(time.perf_counter() - t0, 4)

    bw_a = np.ones(64 * 1024 * 1024, dtype=np.float64)
    bw_b = np.ones_like(bw_a)

    def bw_probe() -> float:
        t0 = time.perf_counter()
        for _ in range(4):
            np.add(bw_b, bw_a, out=bw_b)
        return round(time.perf_counter() - t0, 4)

    def phase(tag: str) -> dict:
        rows = []
        cals, bws = [], []
        for _ in range(args.samples):
            cals.append(calib())
            bws.append(bw_probe())
            rows.append(run_once(spark))
        cals.append(calib())
        bws.append(bw_probe())
        agg = {"calib": cals, "bw_probe": bws, "runs": rows}
        for k in ("wall_s", *_PHASES, *_STATE):
            agg[f"{k}_min"] = min(r[k] for r in rows)
        return agg

    result = {"metric": "stream_click_attribution_load_decomposition",
              "sf_dir": SF_DIR, "workers": args.workers,
              "load_mb": args.load_mb}
    # one discarded warm-up (JVM/codegen/Arrow startup not billed)
    run_once(spark)
    result["quiet"] = phase("quiet")

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _LOAD_SRC, str(args.load_mb)],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        for _ in range(args.workers)
    ]
    try:
        time.sleep(3)  # let the wave establish
        result["loaded"] = phase("loaded")
    finally:
        for p in procs:
            p.kill()
        for p in procs:
            p.wait()

    q, l = result["quiet"], result["loaded"]
    result["summary"] = {
        "calib_ratio": round(
            statistics.median(l["calib"]) / statistics.median(q["calib"]), 2
        ),
        "bw_ratio": round(
            statistics.median(l["bw_probe"])
            / statistics.median(q["bw_probe"]), 2
        ),
        "wall_ratio": round(l["wall_s_min"] / q["wall_s_min"], 2),
        "phase_ratios": {
            k: round(l[f"{k}_min"] / max(q[f"{k}_min"], 1), 2)
            for k in (*_PHASES, *_STATE)
        },
    }
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
