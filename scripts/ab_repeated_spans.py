#!/usr/bin/env python
"""Same-epoch A/B: dedup_repeated_spans NEW aggregate plan vs the OLD
r7 Window.partitionBy(gram-hash) plan, at one scale, in ONE session,
samples interleaved so both variants see the same epochs (judge r8
ask #4 — the driver read 2.2 s → 3.0 s across the r7→r8 plan swap
while the 50k/10x soak said the new plan was faster; this pins the
comparison with calib brackets instead of cross-epoch driver rows).

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/ab_repeated_spans.py

Prints one JSON line; paste the summary row into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SAMPLES = int(os.environ.get("AB_SAMPLES", "3"))
L = 40


def old_plan(df):
    """The r7 shape: corpus-wide gram occurrence count via
    Window.partitionBy over the 128-bit gram hash (hot boilerplate
    gram → one partition — the skew hazard the r8 aggregate removed).
    Reconstructed here for measurement only; test_plan_quality.py
    forbids this shape in the shipped operator."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    base = df.select(F.col("doc_id").alias("doc"), norm.alias("t")).filter(
        F.length("t") >= L
    )
    grams = base.select(
        "doc",
        F.explode(
            F.expr(
                f"transform(sequence(1, length(t) - {L - 1}),"
                f" i -> struct(i as pos, substring(t, i, {L}) as gram))"
            )
        ).alias("pg"),
    ).select("doc", F.col("pg.pos").cast("long").alias("pos"), "pg.gram")
    hashed = grams.select(
        "doc",
        "pos",
        F.xxhash64("gram").alias("h1"),
        F.xxhash64("gram", F.lit(1)).alias("h2"),
    )
    hits = (
        hashed.withColumn(
            "c", F.count(F.lit(1)).over(Window.partitionBy("h1", "h2"))
        )
        .filter(F.col("c") >= 2)
        .select("doc", "pos")
    )
    w_prev = (
        Window.partitionBy("doc")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = hits.withColumn(
        "prev_end", F.max(F.col("pos") + L).over(w_prev)
    ).withColumn(
        "new_island",
        F.when(
            F.col("prev_end").isNull() | (F.col("pos") > F.col("prev_end")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn("island", F.sum("new_island").over(w_run))
    return islands.groupBy("doc", "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(L)).alias("span_end"),
        F.count(F.lit(1)).alias("n_grams"),
    )


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    from raft_c_spark.operators.dedup import repeated_substring_spans
    from raft_c_spark.session import get_spark
    from raft_c_spark.sources.testdata import load_table

    spark = get_spark("ab_repeated_spans")
    docs = load_table(spark, SF_DIR, "documents")
    docs.count()  # warm scan

    calib: list[float] = []

    def calib_probe() -> None:
        c0 = time.perf_counter()
        spark.range(0, 50_000_000, 1, 32).agg(
            F.sum(F.pmod(F.xxhash64("id"), F.lit(1_000_000)))
        ).collect()
        calib.append(round(time.perf_counter() - c0, 4))

    def run(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 4)

    new_s: list[float] = []
    old_s: list[float] = []
    calib_probe()
    for _ in range(SAMPLES):
        spark.catalog.clearCache()
        new_s.append(
            run(repeated_substring_spans(docs, "doc_id", "text"))
        )
        spark.catalog.clearCache()
        old_s.append(run(old_plan(docs)))
        calib_probe()
    out = {
        "metric": "ab_repeated_spans",
        "sf_dir": SF_DIR,
        "new_plan_sec": new_s,
        "old_plan_sec": old_s,
        "new_min": min(new_s),
        "old_min": min(old_s),
        "new_median": statistics.median(new_s),
        "old_median": statistics.median(old_s),
        "calib_samples": calib,
        "calib_median": statistics.median(calib),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
