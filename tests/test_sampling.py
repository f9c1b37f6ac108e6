"""Deterministic sampling + dedup clustering (training-pipeline ops):
hash-Bernoulli mixtures, per-stratum top-k, sequence packing,
connected components — including hypothesis properties (nesting over
arbitrary rate pairs, packing vs the sequential fold over arbitrary
length lists)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from raft_c_spark.operators import dedup, sampling
from raft_c_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").cache()


def test_hash_sample_deterministic_and_partition_stable(spark, docs):
    a = {r["doc_id"] for r in sampling.hash_fraction_sample(docs, "doc_id", 0.3).collect()}
    b = {
        r["doc_id"]
        for r in sampling.hash_fraction_sample(
            docs.repartition(7), "doc_id", 0.3
        ).collect()
    }
    assert a == b and a, "selection must not depend on partitioning"


def test_hash_sample_rate_is_approximate(docs):
    n = docs.count()
    k = sampling.hash_fraction_sample(docs, "doc_id", 0.5).count()
    assert abs(k / n - 0.5) < 0.15  # md5 uniformity at small n


def test_hash_sample_nested(docs):
    """Raising the rate must keep every previously selected row — the
    property that makes scaling a mixture up reproducible."""
    small = {r["doc_id"] for r in sampling.hash_fraction_sample(docs, "doc_id", 0.2).collect()}
    big = {r["doc_id"] for r in sampling.hash_fraction_sample(docs, "doc_id", 0.6).collect()}
    assert small <= big


def test_stratified_fractions(docs):
    out = sampling.hash_fraction_sample(
        docs, "doc_id", strata_col="lang", fractions={"en": 1.0}
    )
    got = dict(
        out.groupBy("lang").count().collect()
    )
    n_en = docs.filter(F.col("lang") == "en").count()
    assert got == {"en": n_en}  # en kept fully, everything else dropped


def test_stratified_topk_exact_counts(docs):
    out = sampling.stratified_topk_sample(docs, "doc_id", "source", 3)
    sizes = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    expect = {
        r["source"]: min(r["count"], 3)
        for r in docs.groupBy("source").count().collect()
    }
    assert sizes == expect
    again = sampling.stratified_topk_sample(docs.repartition(5), "doc_id", "source", 3)
    assert {r["doc_id"] for r in out.collect()} == {
        r["doc_id"] for r in again.collect()
    }


def test_pack_sequences_matches_python_fold(spark):
    """Two-phase distributed prefix sum must equal the sequential
    python fold, on any input partitioning."""
    rows = [(i, (i * 37) % 900 + 10) for i in range(500)]
    expect = {}
    acc = 0
    for i, ln in rows:
        expect[i] = (acc, acc // 1000, acc % 1000)
        acc += ln
    for parts in (1, 7):
        df = spark.createDataFrame(rows, "doc long, toks long").repartition(parts)
        out = sampling.pack_sequences(df, "doc", "toks", 1000)
        got = {
            r["doc"]: (r["seq_start"], r["bin"], r["bin_offset"])
            for r in out.collect()
        }
        assert got == expect


def test_pack_sequences_bins_are_contiguous(docs):
    out = sampling.pack_sequences(docs, "doc_id", "n_chars", 4096)
    bins = sorted(r["bin"] for r in out.select("bin").distinct().collect())
    assert bins == list(range(bins[-1] + 1))  # no gaps
    total = docs.agg(F.sum("n_chars")).first()[0]
    assert bins[-1] <= total // 4096


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    f1=st.floats(min_value=0.0, max_value=1.0),
    f2=st.floats(min_value=0.0, max_value=1.0),
)
def test_hash_sample_nested_property(spark, docs, f1, f2):
    """For ANY pair of rates, the lower-rate selection is a subset of
    the higher-rate one (hash thresholding is monotone)."""
    lo, hi = sorted([f1, f2])
    a = {r["doc_id"] for r in sampling.hash_fraction_sample(docs, "doc_id", lo).collect()}
    b = {r["doc_id"] for r in sampling.hash_fraction_sample(docs, "doc_id", hi).collect()}
    assert a <= b


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lens=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=60),
    budget=st.integers(min_value=1, max_value=700),
)
def test_pack_sequences_property(spark, lens, budget):
    """Distributed packing equals the sequential fold for arbitrary
    length lists and budgets."""
    rows = list(enumerate(lens))
    acc, expect = 0, {}
    for i, ln in rows:
        expect[i] = (acc, acc // budget, acc % budget)
        acc += ln
    df = spark.createDataFrame(rows, "doc long, toks long").repartition(3)
    got = {
        r["doc"]: (r["seq_start"], r["bin"], r["bin_offset"])
        for r in sampling.pack_sequences(df, "doc", "toks", budget).collect()
    }
    assert got == expect


def test_connected_components_vs_union_find(spark):
    """Label propagation must match a driver-side union-find on the
    same pair list (random-ish graph incl. a chain, a triangle and
    isolated pairs)."""
    pairs = [
        (1, 2), (2, 3), (3, 4),          # chain
        (10, 11), (11, 12), (10, 12),    # triangle
        (20, 21),                        # isolated pair
        (30, 31), (31, 32), (30, 33),    # star
    ]
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {
        (r["doc"], r["component"])
        for r in dedup.connected_components(df).collect()
    }
    # the distributed label-propagation path must agree with the
    # driver-side union-find shortcut
    got_dist = {
        (r["doc"], r["component"])
        for r in dedup.connected_components(df, driver_max_edges=0).collect()
    }
    assert got_dist == got

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        parent[find(x)] = find(y)

    for a, b in pairs:
        union(a, b)
    roots = {n: find(n) for n in parent}
    comp_min: dict[int, int] = {}
    for n, r in roots.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    want = {(n, comp_min[roots[n]]) for n in roots}
    assert got == want


def test_components_over_exact_pairs_ground_truth(spark, duck):
    """The registered ``dedup_components`` query rides the LSH pair
    graph (the scale path — the exact input measured 15.2x per 10x
    data in the round-4 soak); this test keeps the exact-all-pairs
    composition as the ground truth, pinned against recursive-CTE
    reachability, so the swap can never hide a clustering regression."""
    from raft_c_spark.plans.dedup import (
        COSINE_THRESHOLD,
        ORACLES,
        _components_oracle,
    )
    from tests.harness import assert_matches_oracle

    emb = load_table(spark, SF_DIR, "embeddings")
    pairs = dedup.embedding_neardup_pairs(
        emb, "vec_id", "embedding", threshold=COSINE_THRESHOLD
    )
    out = dedup.connected_components(pairs)
    assert_matches_oracle(
        out,
        duck,
        _components_oracle(ORACLES["dedup_embedding"]),
        "components_exact_pairs",
    )


def test_connected_components_chain_needs_iterations(spark):
    """A long chain exercises the multi-round convergence path (each
    round propagates the min one hop... doubling via the carried
    label, so rounds ≈ diameter)."""
    n = 17
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "a long, b long"
    )
    out = dedup.connected_components(df, driver_max_edges=0).collect()
    assert {r["component"] for r in out} == {0}
    assert len(out) == n + 1


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """The distributed loop with ``checkpoint_dir`` uses RELIABLE
    checkpoints (survive executor loss — the cluster-scale setting)
    instead of localCheckpoint; forced past the driver union-find cap
    it must produce the same clustering and leave checkpoint data in
    the given directory."""
    import os

    pairs = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)]
    df = spark.createDataFrame(pairs, "a long, b long")
    want = {
        (r["doc"], r["component"])
        for r in dedup.connected_components(df).collect()
    }
    ckpt = str(tmp_path / "cc_ckpt")
    got = {
        (r["doc"], r["component"])
        for r in dedup.connected_components(
            df, driver_max_edges=0, checkpoint_dir=ckpt
        ).collect()
    }
    assert got == want
    assert any(os.scandir(ckpt)), "reliable checkpoint dir must be used"


def test_write_shards_roundtrip(spark, sf_dir, tmp_path):
    """write_shards lays the corpus out as size-balanced shard
    directories whose manifest matches the id-ordered row ranks, and
    the shards together hold exactly the input rows."""
    from raft_c_spark.operators.sampling import write_shards
    from raft_c_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    path = str(tmp_path / "shards")
    manifest = {
        r["shard"]: r for r in write_shards(docs, "doc_id", path, 40).collect()
    }
    assert sum(r["n_rows"] for r in manifest.values()) == n
    full = [manifest[s] for s in sorted(manifest)[:-1]]
    assert all(r["n_rows"] == 40 for r in full), "only the tail may be short"
    # shard boundaries follow id order: max of shard k < min of k+1
    ss = sorted(manifest)
    for a, b in zip(ss, ss[1:]):
        assert manifest[a]["max_id"] < manifest[b]["min_id"]
    back = spark.read.parquet(path)
    assert back.count() == n
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }


@pytest.fixture(scope="module")
def doc_pairs(spark, docs):
    from raft_c_spark.plans.dedup import JACCARD_THRESHOLD

    return dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_perm=64, bands=8,
        threshold=JACCARD_THRESHOLD,
    ).cache()


def test_leakage_safe_split_no_straddle(docs, doc_pairs):
    """The defining invariant: no near-dup pair (and no cluster) ever
    straddles a split boundary."""
    out = sampling.leakage_safe_split(
        docs, "doc_id", doc_pairs, {"train": 0.9, "val": 0.1}
    ).select("doc_id", "dedup_group", "split").cache()
    assert doc_pairs.count() > 0, "vacuous: corpus has no near-dup pairs"
    a = out.select(F.col("doc_id").alias("a"), F.col("split").alias("sa"))
    b = out.select(F.col("doc_id").alias("b"), F.col("split").alias("sb"))
    straddle = (
        doc_pairs.join(a, "a").join(b, "b")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert straddle == 0
    multi = (
        out.groupBy("dedup_group")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert multi == 0
    # partition: every doc exactly once, both splits non-empty
    assert out.count() == docs.count()
    counts = dict(
        (r["split"], r["count"]) for r in out.groupBy("split").count().collect()
    )
    assert set(counts) == {"train", "val"} and min(counts.values()) > 0


def test_leakage_safe_split_partition_stable_and_nested(docs, doc_pairs):
    base = {
        (r["doc_id"], r["split"])
        for r in sampling.leakage_safe_split(
            docs, "doc_id", doc_pairs, {"train": 0.8, "val": 0.2}
        ).collect()
    }
    rep = {
        (r["doc_id"], r["split"])
        for r in sampling.leakage_safe_split(
            docs.repartition(7), "doc_id", doc_pairs.repartition(3),
            {"train": 0.8, "val": 0.2},
        ).collect()
    }
    assert base == rep
    # nested: growing the first split keeps its members
    train_small = {d for d, s in base if s == "train"}
    train_big = {
        r["doc_id"]
        for r in sampling.leakage_safe_split(
            docs, "doc_id", doc_pairs, {"train": 0.95, "val": 0.05}
        ).filter(F.col("split") == "train").collect()
    }
    assert train_small <= train_big


def test_leakage_safe_split_validates_fractions(docs, doc_pairs):
    with pytest.raises(ValueError):
        sampling.leakage_safe_split(
            docs, "doc_id", doc_pairs, {"train": 0.5, "val": 0.2}
        )
    with pytest.raises(ValueError):
        sampling.leakage_safe_split(
            docs, "doc_id", doc_pairs, {"train": 1.5, "val": -0.5}
        )


def test_dsir_importance_ranks_target_like_docs(spark):
    """Raw docs written in the target's vocabulary must out-score raw
    docs written in a disjoint vocabulary, and every doc gets scored
    (targets included)."""
    from pyspark.sql import functions as F

    from raft_c_spark.operators import sampling as s

    rows = []
    for i in range(40):  # target: 'alpha beta gamma' style
        rows.append((i, "alpha beta gamma delta alpha beta", True))
    for i in range(40, 60):  # raw, target-like
        rows.append((i, "beta gamma alpha delta beta gamma", False))
    for i in range(60, 80):  # raw, disjoint vocabulary
        rows.append((i, "omega sigma tau rho omega sigma", False))
    df = spark.createDataFrame(rows, "doc_id long, text string, t boolean")
    out = s.importance_weights(df, "doc_id", "text", "t").collect()
    got = {r["doc_id"]: r["log_weight"] for r in out}
    assert len(got) == 80
    like = [got[i] for i in range(40, 60)]
    unlike = [got[i] for i in range(60, 80)]
    assert min(like) > max(unlike)


def test_dsir_importance_partition_stable(spark):
    from raft_c_spark.operators import sampling as s

    rows = [
        (i, f"w{i % 7} w{(i + 1) % 7} w{(i + 2) % 5}", i % 5 == 0)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, t boolean")
    a = sorted(
        (r["doc_id"], r["n_feats"], r["log_weight"])
        for r in s.importance_weights(df, "doc_id", "text", "t").collect()
    )
    b = sorted(
        (r["doc_id"], r["n_feats"], r["log_weight"])
        for r in s.importance_weights(
            df.repartition(7), "doc_id", "text", "t"
        ).collect()
    )
    assert a == b and a


def test_gumbel_topk_exact_k_partition_stable_and_weight_sensitive(spark):
    """Exactly k rows; the draw is identical after repartitioning;
    and with extreme weight separation every selected row comes from
    the heavy group (softmax odds e^20 : 1)."""
    from raft_c_spark.operators import sampling as s

    rows = [(i, 10.0 if i < 50 else -10.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    a = s.gumbel_topk(df, "doc_id", "w", 20).collect()
    b = s.gumbel_topk(df.repartition(7), "doc_id", "w", 20).collect()
    assert len(a) == 20
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    assert all(r["doc_id"] < 50 for r in a)
    # flat weights: the draw is a uniform k-subset keyed on md5 —
    # nested determinism means it differs from the weighted draw
    flat = s.gumbel_topk(
        df.withColumn("w", df.w * 0), "doc_id", "w", 20
    ).collect()
    assert len(flat) == 20 and any(r["doc_id"] >= 50 for r in flat)


def test_dsir_importance_scores_tokenless_docs_neutral(spark):
    """Docs with no [a-z0-9] tokens must appear with the neutral
    weight (empty product -> log w = 0), not vanish from the output
    (reviewer r8)."""
    from raft_c_spark.operators import sampling as s

    rows = [(1, "alpha beta", True), (2, "alpha gamma", False),
            (3, "!!! ???", False), (4, "", False)]
    df = spark.createDataFrame(rows, "doc_id long, text string, t boolean")
    got = {r["doc_id"]: (r["n_feats"], r["log_weight"])
           for r in s.importance_weights(df, "doc_id", "text", "t").collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[3] == (0, 0.0) and got[4] == (0, 0.0)
