#!/usr/bin/env python
"""Same-epoch A/B: dedup_exact's join-back shapes (judge r10 ask #5
— generalize the spans pipeline's over-cap treatment). Three shapes,
interleaved in ONE session with calib probes, on a duplicated corpus
(the soak generator's 150k docs unioned with three id-shifted clone
copies of a 100k slice -> 450k rows / 150k distinct contents, dup
factor 4 on the cloned slice) — the boilerplate-heavy shape this
operator exists for:

  tier1  — the NEW default: dup-groups-only broadcast LEFT join
           (unique contents never consult the join; cap applies to
           duplicated contents, not distinct ones)
  old    — the pre-r11 above-cap fallback: bare shuffle equi-join of
           the full-row corpus stream against the all-survivors set
  bloom  — the r11 above-cap fallback: composite (content-key, id)
           bloom prefilter + exact equi-join (cap forced to 0)

All three must return identical survivor sets. Local[32] caveat: a
local shuffle is ~a memcpy, so `old` under-prices what a network
exchange costs — read the bloom row with the in-code regime note.

    python scripts/ab_dedup_exact_bloom.py [--docs .soak/docs150000]

Prints one JSON line; paste the summary row into SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SAMPLES = int(os.environ.get("AB_SAMPLES", "3"))


def old_plan(df, dedup_mod):
    """The pre-r11 above-cap shape: survivor min-id aggregate joined
    back WITHOUT broadcast — the bare SMJ/shuffle-hash equi-join that
    moves every full corpus row through the exchange. Reconstructed
    here for measurement only."""
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    hashed = df.withColumn("_h1", F.xxhash64(norm)).withColumn(
        "_h2", F.xxhash64(norm, F.lit(1))
    )
    survivors = (
        hashed.groupBy("_h1", "_h2")
        .agg(F.min(F.col("doc_id")).alias("_keep"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    survivors.count()
    return (
        hashed.join(survivors, ["_h1", "_h2"])
        .filter(F.col("doc_id") == F.col("_keep"))
        .drop("_h1", "_h2", "_keep")
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", default=os.path.join(REPO, ".soak/docs150000"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from raft_c_spark.operators import dedup
    from raft_c_spark.session import get_spark

    spark = get_spark(app_name="ab_dedup_exact_bloom")
    docs = spark.read.parquet(
        os.path.join(args.docs, "documents.parquet")
    ).select("doc_id", "text")
    clones = docs.filter(F.col("doc_id") < 100_000)
    corpus = docs
    for i in (1, 2, 3):
        corpus = corpus.unionByName(
            clones.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)
            )
        )
    corpus = corpus.repartition(32).persist()
    n_rows = corpus.count()

    calib: list[float] = []

    def probe() -> None:
        t0 = time.perf_counter()
        spark.range(0, 50_000_000, 1, 32).agg(
            F.sum(F.pmod(F.xxhash64("id"), F.lit(1_000_000)))
        ).collect()
        calib.append(round(time.perf_counter() - t0, 4))

    def run(fn) -> tuple[float, int]:
        spark.catalog.clearCache()
        corpus.persist().count()
        t0 = time.perf_counter()
        n = fn().count()
        return round(time.perf_counter() - t0, 3), n

    # warm-up run (parquet/page-cache + codegen) not billed to a shape
    _, ref_n = run(lambda: dedup.dedup_exact(corpus, "doc_id", "text"))

    tier1_t: list[float] = []
    old_t: list[float] = []
    bloom_t: list[float] = []
    real_cap = dedup._BROADCAST_MAX_BANDED_ROWS
    probe()
    for _ in range(SAMPLES):
        t, n_t1 = run(lambda: dedup.dedup_exact(corpus, "doc_id", "text"))
        tier1_t.append(t)
        t, n_old = run(lambda: old_plan(corpus, dedup))
        old_t.append(t)
        dedup._BROADCAST_MAX_BANDED_ROWS = 0
        try:
            t, n_bloom = run(
                lambda: dedup.dedup_exact(corpus, "doc_id", "text")
            )
            bloom_t.append(t)
        finally:
            dedup._BROADCAST_MAX_BANDED_ROWS = real_cap
        probe()
        assert n_t1 == ref_n and n_old == ref_n and n_bloom == ref_n, (
            n_t1, n_old, n_bloom, ref_n,
        )

    out = {
        "metric": "dedup_exact_joinback_ab",
        "rows": n_rows,
        "survivors": ref_n,
        "tier1_dup_broadcast_sec": tier1_t,
        "old_bare_join_sec": old_t,
        "overcap_bloom_sec": bloom_t,
        "tier1_min": min(tier1_t),
        "old_min": min(old_t),
        "bloom_min": min(bloom_t),
        "tier1_vs_old_min": round(min(old_t) / min(tier1_t), 2),
        "calib": calib,
        "calib_median": round(statistics.median(calib), 4),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
