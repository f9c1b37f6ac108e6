#!/usr/bin/env python
"""Dump explain('formatted') for the r13-touched queries into
plans/r13/<query>_<tag>.txt (tag = before|after). The judge checks
plan-shape claims against these files.

Usage: python scripts/dump_r13_plans.py <tag> [query ...]
Run with tag=before on the pre-change tree (git stash), tag=after on
the optimized tree.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "ts_lttb",
    "sim_topk_lsh",
    "sim_knn_join",
    "sim_knn_join_lsh",
    "sim_knn_recall",
    "sim_knn_recall_tuned",
    "dedup_semantic",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    os.environ.setdefault(
        "RAFT_C_SPARK_CACHE_DIR", os.path.join(REPO, ".cache", "bench")
    )
    from raft_c_spark.session import get_spark
    from raft_c_spark.plans.registry import all_queries

    spark = get_spark(app_name="raft_c_spark_dump_r13")
    outdir = os.path.join(REPO, "plans", "r13")
    os.makedirs(outdir, exist_ok=True)
    qs = all_queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
