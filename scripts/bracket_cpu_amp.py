#!/usr/bin/env python
"""Fixed-thread CPU-amplification bracket (judge r13 next-round #3).

The r13 driver artifacts show the sim/embedding family burning 3-5x
more process CPU at 32 threads than at 8 for identical work,
consistently across three epochs (sim_knn_recall_tuned 64.9-68.1
CPU-s at 32 vs 13.6 at 8). This script attributes the amplification:
for each core count (and optional env overrides), a FRESH process
runs the family min-of-N and records

  wall, process-tree CPU, JVM GC time, and a per-process-class CPU
  breakdown (python driver / JVM / Python workers)

so GC-bound (guide §5) separates mechanically from Python-worker
spin (BLAS oversubscription) and from partition-count-proportional
fixed cost (guide §2.2).

Usage:
  python scripts/bracket_cpu_amp.py [--cpus 8,16,32] [--reps 2]
      [--env K=V[,K=V...]] [query ...]
Writes one JSON line per (cpus, env) arm to stdout and the full
result to plans/r14/cpu_bracket.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
    "sim_knn_recall_tuned",
    "sim_knn_recall",
    "dedup_embedding_lsh",
    "text_novelty",
]

CHILD = r"""
import json, os, sys, time
REPO = os.environ["BRACKET_REPO"]
sys.path.insert(0, REPO)
os.environ.setdefault(
    "RAFT_C_SPARK_CACHE_DIR", os.path.join(REPO, ".cache", "bench")
)
from raft_c_spark.session import get_spark
from raft_c_spark.plans.registry import all_queries
from raft_c_spark.sources.testdata import load_table
from bench import _tree_cpu_seconds

spark = get_spark(app_name="cpu_bracket")
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
load_table(spark, SF, "lineitem").count()
spark.range(8).mapInPandas(lambda it: it, "id long").count()


def gc_ms():
    beans = (
        spark.sparkContext._jvm.java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans()
    )
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


def cpu_by_class():
    # (python-driver, jvm, workers) CPU seconds: classify every live
    # descendant by cmdline
    clk = os.sysconf("SC_CLK_TCK")
    me = os.getpid()
    procs = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat", "rb") as fh:
                s = fh.read().decode("ascii", "replace")
            with open(f"/proc/{pid}/cmdline", "rb") as fh:
                cmd = fh.read().decode("utf-8", "replace")
        except OSError:
            continue
        try:
            rest = s[s.rindex(")") + 2:].split()
            procs[int(pid)] = (
                int(rest[1]), (int(rest[11]) + int(rest[12])) / clk, cmd
            )
        except (ValueError, IndexError):
            continue
    kids = {}
    for pid, (ppid, _, _) in procs.items():
        kids.setdefault(ppid, []).append(pid)
    out = {"pydriver": 0.0, "jvm": 0.0, "worker": 0.0}
    stack, seen = [me], set()
    while stack:
        p = stack.pop()
        if p in seen or p not in procs:
            continue
        seen.add(p)
        _, cpu, cmd = procs[p]
        if p == me:
            out["pydriver"] += cpu
        elif "java" in cmd.split("\x00")[0]:
            out["jvm"] += cpu
        else:
            out["worker"] += cpu
        stack.extend(kids.get(p, []))
    return out


qs = all_queries()
names = json.loads(os.environ["BRACKET_QUERIES"])
reps = int(os.environ.get("BRACKET_REPS", "2"))
out = {}
for name in names:
    fn = qs[name]
    best, allreps = None, []
    for rep in range(reps):
        g0, b0 = gc_ms(), cpu_by_class()
        c0, t0 = _tree_cpu_seconds(), time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        dc = _tree_cpu_seconds() - c0
        dg, b1 = gc_ms() - g0, cpu_by_class()
        rec = {
            "wall": round(dt, 3),
            "cpu": round(dc, 2),
            "gc_ms": int(dg),
            "cpu_jvm": round(b1["jvm"] - b0["jvm"], 2),
            "cpu_worker": round(b1["worker"] - b0["worker"], 2),
            "cpu_pydriver": round(b1["pydriver"] - b0["pydriver"], 2),
        }
        allreps.append(rec)
        if best is None or dt < best["wall"]:
            best = rec
    out[name] = dict(best, reps=allreps)
spark.stop()
print("BRACKET_JSON:" + json.dumps(out), flush=True)
"""


def run_arm(cpus: int, env_over: dict, queries, reps: int) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_CPUS": str(cpus),
            "BRACKET_REPO": REPO,
            "BRACKET_QUERIES": json.dumps(queries),
            "BRACKET_REPS": str(reps),
        }
    )
    env.update(env_over)
    proc = subprocess.run(
        [sys.executable, "-c", CHILD],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("BRACKET_JSON:"):
            return json.loads(line[len("BRACKET_JSON:"):])
    raise RuntimeError(
        f"arm cpus={cpus} env={env_over} failed:\n{proc.stdout[-2000:]}\n"
        f"{proc.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", default="8,32")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--env", default="")
    ap.add_argument("--out", default=os.path.join(REPO, "plans", "r14", "cpu_bracket.json"))
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    queries = args.queries or DEFAULT_QUERIES
    env_over = {}
    if args.env:
        for kv in args.env.split(","):
            k, v = kv.split("=", 1)
            env_over[k] = v
    results = {}
    for c in [int(x) for x in args.cpus.split(",")]:
        arm = run_arm(c, env_over, queries, args.reps)
        results[str(c)] = arm
        print(json.dumps({"cpus": c, "env": env_over, "result": arm}))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    payload = {"env": env_over, "queries": queries, "reps": args.reps,
               "by_cpus": results}
    # append-merge: keep prior arms (different env tags) in one file
    if os.path.exists(args.out):
        try:
            with open(args.out) as fh:
                prior = json.load(fh)
        except Exception:
            prior = []
        if isinstance(prior, dict):
            prior = [prior]
    else:
        prior = []
    prior.append(payload)
    with open(args.out, "w") as fh:
        json.dump(prior, fh, indent=1)


if __name__ == "__main__":
    main()
