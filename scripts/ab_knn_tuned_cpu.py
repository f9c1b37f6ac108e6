#!/usr/bin/env python
"""Fixed-thread CPU A/B for sim_knn_recall_tuned (judge r11 "what's
wrong" #3): the registry's costliest query grew 3.72 s (r10 committed)
→ 5.59 s (r11 committed) → 6.90 s (r11 driver epoch) on byte-identical
code, and unlike sim_knn_join_lsh it had no local[4] JVM-CPU bracket —
only wall-clock epoch evidence. Same methodology as
scripts/ab_knn_lsh_cpu.py: a FIXED small thread count (a
memory-bandwidth convoy can't form at 4 threads), JVM CPU from /proc
(utime+stime — a noisy neighbor inflates wall, not the JVM's own CPU
accounting), register-bound calib probes interleaved.

Two extra dimensions specific to this query:

- **per-rung decomposition**: the tuning walk tries the ladder rungs
  (12,4) → (10,8) → (8,16) until one certifies; each rung builds (or
  disk-cache-reads) its OWN LSH index — rungs share nothing by
  construction (different ``bits`` → different hyperplanes → different
  signatures), so "reuse across the ladder" is structurally
  impossible and the reuse that CAN exist — one index build per
  (corpus, bits, tables) ever, via functions/diskcache — is what this
  script verifies, by timing the walk with the rung caches present
  (warm) vs removed (AB_COLD=1).
- **index-cache state**: a bench session's first tuned run pays three
  parquet index writes; every later run reads them back. If two
  "warm" committed artifacts were cut with different .cache page
  state, that alone moves the number — the cold/warm split quantifies
  exactly how much.

    SPARK_GRAFT_CPUS=4 python scripts/ab_knn_tuned_cpu.py
    AB_COLD=1 SPARK_GRAFT_CPUS=4 python scripts/ab_knn_tuned_cpu.py

Run twice in different epochs for the bracket. Prints one JSON line;
paste the summary into BASELINE.md.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SAMPLES = int(os.environ.get("AB_SAMPLES", "4"))
COLD = os.environ.get("AB_COLD", "0") == "1"
_TICK = os.sysconf("SC_CLK_TCK")


def _java_pids() -> list[int]:
    me = os.getpid()
    pids = []
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat") as fh:
                parts = fh.read().split()
            if int(parts[3]) == me and "java" in parts[1]:
                pids.append(int(p))
        except OSError:
            continue
    return pids


def _jvm_cpu_s(pids: list[int]) -> float:
    total = 0
    for p in pids:
        try:
            with open(f"/proc/{p}/stat") as fh:
                parts = fh.read().split()
            total += int(parts[13]) + int(parts[14])
        except OSError:
            continue
    return total / _TICK


def _rung_cache_dirs() -> list[str]:
    """The tuned walk's per-rung index caches for this corpus."""
    from raft_c_spark.functions import diskcache
    from raft_c_spark.plans.dedup import _data_cache_key

    key = _data_cache_key(SF_DIR, "embeddings")
    return sorted(
        glob.glob(os.path.join(diskcache.cache_root(), f"lshidx_{key}_*"))
    )


def _drop_rung_caches() -> int:
    dirs = _rung_cache_dirs()
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)
    return len(dirs)


def main() -> int:
    from pyspark.sql import functions as F

    from raft_c_spark.plans.extras import q_sim_knn_recall_tuned
    from raft_c_spark.session import get_spark

    spark = get_spark(app_name="ab_knn_tuned_cpu")
    pids = _java_pids()
    assert pids, "driver JVM not found under /proc"

    calib: list[float] = []

    def probe() -> None:
        t0 = time.perf_counter()
        spark.range(0, 50_000_000, 1, 8).agg(
            F.sum(F.pmod(F.xxhash64("id"), F.lit(1_000_000)))
        ).collect()
        calib.append(round(time.perf_counter() - t0, 4))

    wall: list[float] = []
    cpu: list[float] = []
    dropped: list[int] = []
    probe()
    for _ in range(SAMPLES):
        spark.catalog.clearCache()
        dropped.append(_drop_rung_caches() if COLD else 0)
        c0 = _jvm_cpu_s(pids)
        t0 = time.perf_counter()
        rows = q_sim_knn_recall_tuned(spark, SF_DIR).collect()
        wall.append(round(time.perf_counter() - t0, 3))
        cpu.append(round(_jvm_cpu_s(pids) - c0, 2))
        probe()

    out = {
        "metric": "sim_knn_recall_tuned_fixed_thread_cpu",
        "mode": "cold_index" if COLD else "warm_index",
        "master": spark.sparkContext.master,
        "sf_dir": SF_DIR,
        "rungs_tried": len(rows),
        "chosen": [
            (r["bits"], r["tables"]) for r in rows if r["chosen"]
        ],
        "caches_dropped_per_sample": dropped,
        "rung_caches_present_now": len(_rung_cache_dirs()),
        "wall_s": wall,
        "jvm_cpu_s": cpu,
        "wall_min": min(wall),
        "cpu_min": min(cpu),
        "calib": calib,
        "calib_median": round(statistics.median(calib), 4),
        "epoch_utc": time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime()),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
