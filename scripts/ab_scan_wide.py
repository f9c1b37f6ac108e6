#!/usr/bin/env python
"""Same-session interleaved A/B of the text-family _scan_wide guard.

For each query, alternates RAFT_C_SPARK_SCAN_WIDE=0 (off) and =1 (on)
reps in ONE Spark session (disk caches shared, epoch noise hits both
arms), timing plan-build + noop-sink execute per rep. Reports min and
median per arm. Cross-session/epoch A/Bs on this box are untrustworthy
(the r13 profile measured the identical walk 4.4 vs 49.9 s minutes
apart); interleaving is the repo's standard remedy.

Usage: python scripts/ab_scan_wide.py [reps] [query ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "text_analyze",
    "text_lang_profile",
    "text_clean_corpus",
    "text_redact_pii",
    "text_tfidf_terms",
    "text_heavy_hitters",
    "text_chunks",
    "text_repetition",
    "text_quality_model",
    "text_gopher_rules",
    "text_lm_score",
    "text_bm25_topk",
    "text_char_entropy",
    "text_collocations",
    "text_vocab_growth",
    "text_novelty",
    "ds_decontaminate",
    "ds_bloom_decontaminate",
    "ds_lang_kl",
]


def main() -> None:
    os.environ.setdefault(
        "RAFT_C_SPARK_CACHE_DIR", os.path.join(REPO, ".cache", "bench")
    )
    args = sys.argv[1:]
    reps = int(args[0]) if args and args[0].isdigit() else 4
    names = [a for a in args if not a.isdigit()] or DEFAULT

    from raft_c_spark.session import get_spark
    from raft_c_spark.plans.registry import all_queries
    from raft_c_spark.sources.testdata import load_table

    spark = get_spark(app_name="raft_c_spark_ab_scan_wide")
    load_table(spark, SF_DIR, "documents").count()
    spark.range(8).mapInPandas(lambda it: it, "id long").count()

    qs = all_queries()
    out: dict[str, dict[str, list[float]]] = {}
    for name in names:
        fn = qs[name]
        t: dict[str, list[float]] = {"off": [], "on": []}
        for rep in range(reps):
            for arm in ("off", "on"):
                os.environ["RAFT_C_SPARK_SCAN_WIDE"] = (
                    "0" if arm == "off" else "1"
                )
                spark.sparkContext.setJobDescription(
                    f"ab_scan_wide {name} {arm} rep{rep}"
                )
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                t[arm].append(time.perf_counter() - t0)
                spark.catalog.clearCache()
        out[name] = t
        off_m, on_m = min(t["off"]), min(t["on"])
        print(
            f"{name:28} off min {off_m:6.3f} med "
            f"{statistics.median(t['off']):6.3f} | on min {on_m:6.3f} med "
            f"{statistics.median(t['on']):6.3f} | on/off {on_m / off_m:5.2f}",
            flush=True,
        )
    os.environ["RAFT_C_SPARK_SCAN_WIDE"] = "1"
    with open("/tmp/ab_scan_wide.json", "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()


