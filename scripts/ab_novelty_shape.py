#!/usr/bin/env python
"""Same-session interleaved A/B: text_novelty's r13 three-aggregate
shape vs the r9-r12 vocab-join-back shape (judge r13 next-round #4 —
the driver read the query 1.9→4.4 s across rounds while the plan
evidence improved; this settles whether the new shape genuinely loses
at sf0.1 or the reading was epoch).

The OLD shape is reconstructed here (it no longer exists in product
code): first-occurrence aggregate shuffle-hash-joined back against
the full (doc, h1, h2) gram stream. Both shapes are asserted
result-identical once, then interleaved min-of-N with process CPU.

Usage: python scripts/ab_novelty_shape.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_shape(spark, sf_dir, n=3):
    """The r9-r12 novelty plan: vocab aggregate joined back against
    the raw gram stream (shuffle_hash hint, as committed then)."""
    from pyspark.sql import functions as F
    from raft_c_spark.operators.text import _scan_wide
    from raft_c_spark.sources.testdata import load_table

    df = load_table(spark, sf_dir, "documents")
    id_col, text_col = "doc_id", "text"
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0)
    )
    base = _scan_wide(df).select(F.col(id_col).alias("doc"), toks.alias("toks"))
    g = F.transform(
        F.sequence(F.lit(1), F.size("toks") - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice("toks", i, n)),
    )
    hs = F.array_distinct(
        F.transform(
            g,
            lambda s: F.struct(
                F.xxhash64(s).alias("h1"),
                F.xxhash64(s, F.lit(1)).alias("h2"),
            ),
        )
    )
    grams = (
        base.filter(F.size("toks") >= n)
        .select("doc", F.explode(hs).alias("h"))
        .select("doc", F.col("h.h1").alias("h1"), F.col("h.h2").alias("h2"))
    )
    firsts_vocab = grams.groupBy("h1", "h2").agg(
        F.min("doc").alias("first_doc")
    )
    joined = grams.join(
        firsts_vocab.hint("shuffle_hash"), ["h1", "h2"]
    )
    per_doc = grams.groupBy("doc").agg(F.count(F.lit(1)).alias("n_grams"))
    firsts = (
        joined.filter(F.col("doc") == F.col("first_doc"))
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_first"))
    )
    scored = per_doc.join(firsts, "doc", "left").select(
        "doc",
        "n_grams",
        F.coalesce("n_first", F.lit(0)).alias("n_first"),
    )
    return (
        df.select(F.col(id_col).alias("doc"))
        .join(scored, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_first", F.lit(0)).cast("long").alias("n_first"),
            F.when(
                F.col("n_grams") > 0,
                F.round(
                    F.col("n_first").cast("double") / F.col("n_grams"), 8
                ),
            ).alias("novelty"),
        )
        .orderBy(id_col)
    )


def main() -> None:
    os.environ.setdefault(
        "RAFT_C_SPARK_CACHE_DIR", os.path.join(REPO, ".cache", "bench")
    )
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    from raft_c_spark.session import get_spark
    from raft_c_spark.plans.registry import all_queries
    from raft_c_spark.sources.testdata import load_table
    from bench import _tree_cpu_seconds

    spark = get_spark(app_name="ab_novelty_shape")
    load_table(spark, SF_DIR, "documents").count()
    spark.range(8).mapInPandas(lambda it: it, "id long").count()

    new_fn = all_queries()["text_novelty"]

    # result identity, asserted once
    a = [tuple(r) for r in new_fn(spark, SF_DIR).collect()]
    b = [tuple(r) for r in old_shape(spark, SF_DIR).collect()]
    assert a == b, "old/new novelty shapes disagree!"
    print(f"shapes identical on {len(a)} rows", flush=True)

    t = {"old": [], "new": []}
    c = {"old": [], "new": []}
    for rep in range(reps):
        for arm in ("old", "new"):
            df = (
                old_shape(spark, SF_DIR)
                if arm == "old"
                else new_fn(spark, SF_DIR)
            )
            spark.sparkContext.setJobDescription(f"novelty {arm} rep{rep}")
            c0, t0 = _tree_cpu_seconds(), time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t[arm].append(time.perf_counter() - t0)
            c[arm].append(_tree_cpu_seconds() - c0)
    for arm in ("old", "new"):
        print(
            f"{arm}: walls={[round(x,3) for x in t[arm]]} min={min(t[arm]):.3f}"
            f" med={statistics.median(t[arm]):.3f}"
            f" | cpus={[round(x,1) for x in c[arm]]} mincpu={min(c[arm]):.1f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
