"""End-to-end training-data pipeline: the full prep a user would run
on this engine, chained over the driver's documents table —

    quality-clean → exact-dedup survivors → decontaminate against a
    held-out set → deterministic mixture sample → sequence packing →
    partitioned parquet writeback → re-read

Each stage is an operator under test elsewhere; this test pins that
they COMPOSE (schemas line up, determinism survives chaining, the
writeback round-trips losslessly).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from raft_c_spark.operators import sampling, text
from raft_c_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"


def _run_pipeline(spark, out_dir: str):
    docs = load_table(spark, SF_DIR, "documents")

    # 1. quality clean: keep confident-language, long-enough docs
    ana = text.analyze(docs).filter(
        (F.col("quality") >= 0.3) & (F.col("n_tokens") >= 10)
    )

    # 2. exact dedup: min doc_id survives per content fingerprint
    survivors = ana.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    kept = docs.join(survivors.select("doc_id"), "doc_id")

    # 3. decontaminate against the held-out set (drop flagged docs)
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    flagged = text.decontaminate(kept, ev, "doc_id", "text", n=4)
    clean = kept.join(flagged.select("doc_id"), "doc_id", "left_anti").filter(
        F.col("doc_id") % 97 != 0
    )

    # 4. deterministic mixture sample (hash-Bernoulli per language)
    mixed = sampling.hash_fraction_sample(
        clean, "doc_id", strata_col="lang",
        fractions={"en": 0.9, "de": 0.9, "es": 0.9, "fr": 0.9, "zh": 0.9},
    )

    # 5. pack into 4096-char training bins
    packed = sampling.pack_sequences(mixed, "doc_id", "n_chars", 4096)

    # 6. writeback: bin-partitioned parquet (the training-shard layout)
    out = packed.select("doc_id", "n_chars", "seq_start", "bin", "bin_offset")
    out.write.mode("overwrite").partitionBy("bin").parquet(out_dir)
    return out


def test_pipeline_composes_and_roundtrips(spark, tmp_path):
    out_dir = str(tmp_path / "shards")
    expected = _run_pipeline(spark, out_dir)
    back = spark.read.parquet(out_dir)

    exp = {tuple(r) for r in expected.select(sorted(expected.columns)).collect()}
    got = {tuple(r) for r in back.select(sorted(back.columns)).collect()}
    assert exp and got == exp

    # packing invariant survives the chain: offsets are a prefix sum
    # over doc_id order within the sampled set
    rows = sorted(back.collect(), key=lambda r: r["seq_start"])
    acc = 0
    for r in rows:
        assert r["seq_start"] == acc
        assert r["bin"] == acc // 4096 and r["bin_offset"] == acc % 4096
        acc += r["n_chars"]


def test_pipeline_is_deterministic(spark, tmp_path):
    a = _run_pipeline(spark, str(tmp_path / "a"))
    b = _run_pipeline(spark, str(tmp_path / "b"))
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb
