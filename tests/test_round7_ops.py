"""Round-7 operators: temperature mixture sampling, k-center cosine
cluster assignment, bigram-LM cross-entropy scoring, and n-gram
containment pairs. Semantics pinned against hand fixtures / pure-python
folds; engine-independence (the oracle side) is covered by
tests/test_entry_contract.py like every registered query."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from raft_c_spark.operators import dedup, sampling, similarity, text
from raft_c_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


# ---------------------------------------------------------------- temperature


def test_temperature_partition_stable_and_deterministic(spark, docs):
    a = {
        r["doc_id"]
        for r in sampling.temperature_sample(docs, "doc_id", "source").collect()
    }
    b = {
        r["doc_id"]
        for r in sampling.temperature_sample(
            docs.repartition(7), "doc_id", "source"
        ).collect()
    }
    assert a == b and a


def test_temperature_alpha1_is_flat_budget(spark, docs):
    """α=1 ⇒ every stratum keeps the same rate = budget_frac: the
    per-stratum thresholds must all equal floor(budget_frac·4096)."""
    out = sampling.temperature_sample(
        docs, "doc_id", "source", alpha=1.0, budget_frac=0.5
    )
    thrs = {r["thr"] for r in out.select("thr").distinct().collect()}
    assert thrs == {2048}


def test_temperature_upweights_tail(spark):
    """α=0.5 keep-rates must be monotone DECREASING in stratum size
    (that is the point of temperature sampling); a 10-row stratum next
    to a 1000-row one should keep rate 1 vs ~budgeted."""
    rows = [Row(id=i, s="big") for i in range(1000)] + [
        Row(id=1000 + i, s="small") for i in range(10)
    ]
    df = spark.createDataFrame(rows)
    out = sampling.temperature_sample(
        df, "id", "s", alpha=0.5, budget_frac=0.5
    )
    thr = {
        r["s"]: r["thr"]
        for r in out.select("s", "thr").distinct().collect()
    }
    # expected: w_big=sqrt(1000), w_small=sqrt(10); budget=505
    w_big, w_small = math.sqrt(1000.0), math.sqrt(10.0)
    tot = w_big + w_small
    f_big = min(1.0, 505.0 * w_big / (tot * 1000.0))
    f_small = min(1.0, 505.0 * w_small / (tot * 10.0))
    assert f_small == 1.0 and thr["small"] == 4096
    assert thr["big"] == math.floor(f_big * 4096)


def test_temperature_budget_roughly_met(spark, docs):
    n = docs.count()
    k = sampling.temperature_sample(
        docs, "doc_id", "source", budget_frac=0.5
    ).count()
    assert abs(k / n - 0.5) < 0.15


def test_temperature_nested_in_budget(spark, docs):
    """Raising the budget keeps previously selected rows (hash-
    Bernoulli nesting — reproducible mixture scale-ups)."""
    lo = {
        r["doc_id"]
        for r in sampling.temperature_sample(
            docs, "doc_id", "source", budget_frac=0.3
        ).collect()
    }
    hi = {
        r["doc_id"]
        for r in sampling.temperature_sample(
            docs, "doc_id", "source", budget_frac=0.7
        ).collect()
    }
    assert lo <= hi


def test_temperature_tiny_rate_clamps_not_drops(spark):
    """Advisor r7: a stratum whose keep-rate floors below the 1/4096
    grid must NOT silently contribute zero rows when its exact
    expected draw count n_s >= 1 — the threshold clamps to the
    minimum grid cell instead (thr = 1 > 0)."""
    # 20k-row stratum, tiny budget: rate ≈ 0.0001 < 1/4096 but
    # n_s = rate·20000 ≈ 2 ≥ 1
    rows = [Row(id=i, s="big") for i in range(20_000)]
    out = sampling.temperature_sample(
        spark.createDataFrame(rows), "id", "s",
        alpha=1.0, budget_frac=0.0001,
    )
    thr = out.select("thr").distinct().collect()
    # clamped to 1, and the selection is non-empty with high
    # probability (expected ≈ 20000/4096 ≈ 5 rows at thr=1)
    assert [r["thr"] for r in thr] == [1]
    assert out.count() > 0


def test_epoch_repeats_sub_epoch_stratum_not_dropped(spark):
    """Same clamp on epoch_repeats' fractional part: a base=0 stratum
    whose fraction floors to 0 keeps frac_thr = 1 when it still owes
    n_s >= 1 expected draws."""
    rows = [Row(id=i, s="big") for i in range(20_000)] + [
        Row(id=100_000 + i, s="tiny") for i in range(4)
    ]
    rep = sampling.epoch_repeats(
        spark.createDataFrame(rows), "id", "s",
        alpha=0.0, budget_epochs=0.0001,
    )
    big = rep.filter("s = 'big'").select("base_epochs", "frac_thr").distinct().collect()
    assert [(r["base_epochs"], r["frac_thr"]) for r in big] == [(0, 1)]


# ------------------------------------------------------------------- clusters


def test_cluster_assign_total_and_k(spark, emb):
    out = similarity.cluster_assign(emb, k=8).cache()
    assert out.count() == emb.count()
    clusters = {r["cluster"] for r in out.select("cluster").distinct().collect()}
    assert 1 <= len(clusters) <= 8


def test_cluster_assign_seed_maps_to_itself(spark, emb):
    """Every chosen center has cosine 1.0 with itself — it must be
    assigned to its own cluster (no other center can beat 1.0; a tie
    falls to the lower rank only among exact duplicates)."""
    out = similarity.cluster_assign(emb, k=8)
    seeds = {r["cluster"] for r in out.select("cluster").distinct().collect()}
    own = out.filter(F.col("vec_id").isin(*seeds) & (F.col("cosine") < 1.0 - 1e-12))
    assert own.count() == 0


def test_cluster_assign_partition_stable(spark, emb):
    a = sorted(
        (r["vec_id"], r["cluster"]) for r in similarity.cluster_assign(emb, k=8).collect()
    )
    b = sorted(
        (r["vec_id"], r["cluster"])
        for r in similarity.cluster_assign(emb.repartition(7), k=8).collect()
    )
    assert a == b


def test_cluster_assign_matches_numpy_argmax(spark, emb):
    import hashlib

    import numpy as np

    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = sorted(range(len(ids)), key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(), ids[i]))
    seed_idx = order[:8]
    norms = np.linalg.norm(mat, axis=1)
    sims = (mat @ mat[seed_idx].T) / np.outer(norms, norms[seed_idx])
    best = sims.argmax(axis=1)  # ties: first (lowest rank) — same rule
    expected = {int(ids[i]): int(ids[seed_idx[best[i]]]) for i in range(len(ids))}
    got = {r["vec_id"]: r["cluster"] for r in similarity.cluster_assign(emb, k=8).collect()}
    assert got == expected


# ------------------------------------------------------------------- LM score


def test_lm_score_hand_fixture(spark):
    """Corpus: 'a b a b', 'a b c'. Contexts: doc1 a→b, b→a, a→b;
    doc2 a→b, b→c. c1(a)=3, c1(b)=2; c12(a,b)=3, c12(b,a)=1,
    c12(b,c)=1; V = |{a,b,c}| = 3."""
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b a b"), Row(doc_id=2, text="a b c")]
    )
    out = {r["doc_id"]: r for r in text.ngram_lm_score(df).collect()}
    p_ab = (3 + 1) / (3 + 3)
    p_ba = (1 + 1) / (2 + 3)
    p_bc = (1 + 1) / (2 + 3)

    def bits(p):
        return round(-math.log2(p), 8)

    exp1 = (bits(p_ab) + bits(p_ba) + bits(p_ab)) / 3
    exp2 = (bits(p_ab) + bits(p_bc)) / 2
    assert out[1]["n_bigrams"] == 3 and out[2]["n_bigrams"] == 2
    assert abs(out[1]["xent"] - exp1) < 1e-9
    assert abs(out[2]["xent"] - exp2) < 1e-9


def test_lm_score_short_docs_excluded(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="single"), Row(doc_id=2, text=""), Row(doc_id=3, text="two words")]
    )
    out = text.ngram_lm_score(df)
    assert [r["doc_id"] for r in out.collect()] == [3]


def test_lm_score_predictable_scores_lower(spark, docs):
    """The filter's discriminating direction: a document made of one
    endlessly repeated transition (maximally predictable under its
    own statistics) must score far below the corpus median, and below
    a same-length all-novel-transitions document. (The synthetic
    corpus is near-uniform random text, so the classic 'gibberish >
    median' direction is not testable here — predictability is.)"""
    extra = docs.sparkSession.createDataFrame(
        [
            Row(doc_id=10**9, text=" ".join(["loop"] * 30)),
            Row(doc_id=10**9 + 1, text="zq xv qj vk wz kx jq vx zk qw"),
        ]
    )
    corpus = docs.select("doc_id", "text").unionByName(extra)
    out = text.ngram_lm_score(corpus).cache()
    med = out.filter(F.col("doc_id") < 10**9).agg(
        F.expr("percentile_approx(xent, 0.5)")
    ).first()[0]
    loop = out.filter(F.col("doc_id") == 10**9).first()["xent"]
    novel = out.filter(F.col("doc_id") == 10**9 + 1).first()["xent"]
    assert loop < med and loop < novel


# ---------------------------------------------------------------- containment


def test_containment_detects_quote_jaccard_misses(spark):
    """A 6-word doc embedded verbatim in a 60-word doc: containment
    (a→b) = 1.0 while Jaccard is far below any dedup threshold."""
    short = "the quick brown fox jumps high"
    long = (
        "filler one two three four five six seven eight nine ten "
        + short
        + " more filler words follow here in a long tail that keeps going "
        "with additional unique content padding the container document out"
    )
    df = spark.createDataFrame(
        [Row(doc_id=1, text=short), Row(doc_id=2, text=long)]
    )
    pairs = dedup.ngram_containment_pairs(
        df, "doc_id", "text", n=3, threshold=0.9, unit="word"
    ).collect()
    assert [(p["a"], p["b"]) for p in pairs] == [(1, 2)]
    assert pairs[0]["containment"] == 1.0
    jac = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.5, strategy="prefix", unit="word"
    )
    assert jac.count() == 0


def test_containment_exact_dup_is_bidirectional(spark):
    t = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [Row(doc_id=1, text=t), Row(doc_id=2, text=t), Row(doc_id=3, text="totally different words here entirely unrelated")]
    )
    got = sorted(
        (p["a"], p["b"])
        for p in dedup.ngram_containment_pairs(
            df, "doc_id", "text", n=3, threshold=0.9, unit="word"
        ).collect()
    )
    assert got == [(1, 2), (2, 1)]


def test_containment_matches_naive_python(spark, docs):
    """Exactness: the prefix-probe candidate generation must equal the
    all-pairs fold on a real corpus slice."""
    sub = docs.filter(F.col("doc_id") < 120).select("doc_id", "text")
    got = sorted(
        (p["a"], p["b"], p["common"])
        for p in dedup.ngram_containment_pairs(
            sub, "doc_id", "text", n=5, threshold=0.8, unit="word"
        ).collect()
    )
    rows = sub.collect()

    def grams(t, n=5):
        toks = " ".join(t.lower().split()).split(" ")
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sets = {r["doc_id"]: grams(r["text"]) for r in rows}
    exp = sorted(
        (a, b, len(sa & sets[b]))
        for a, sa in sets.items()
        for b in sets
        if a != b and sa and len(sa & sets[b]) / len(sa) >= 0.8
    )
    assert got == exp


# ------------------------------------------------------------------ semdedup


def test_semantic_dedup_subset_of_global_pairs(spark, emb):
    """Every within-cluster pair must appear in the global exact pair
    set at the same threshold (SemDeDup only *misses* pairs — across
    cluster boundaries — it never invents them), and both members must
    share the reported cluster."""
    from raft_c_spark.operators import dedup as dd

    got = similarity.semantic_dedup_pairs(emb, k=8, threshold=0.3).collect()
    assert got, "expected some within-cluster pairs"
    global_pairs = {
        (r["a"], r["b"])
        for r in dd.embedding_neardup_pairs(
            emb, "vec_id", "embedding", threshold=0.3
        ).collect()
    }
    assign = {
        r["vec_id"]: r["cluster"]
        for r in similarity.cluster_assign(emb, k=8).collect()
    }
    for r in got:
        assert (r["a"], r["b"]) in global_pairs
        assert assign[r["a"]] == assign[r["b"]] == r["cluster"]
        assert r["cosine"] >= 0.3


# --------------------------------------------------------------- epoch mixing


def test_epoch_upsample_matches_temperature_when_sub_epoch(spark, docs):
    """budget_epochs < 1 degenerates to temperature_sample exactly:
    base 0 everywhere, and the +1 fraction is the SAME md5 selection
    (same key, same grid) as the keep set."""
    kept = {
        r["doc_id"]
        for r in sampling.temperature_sample(
            docs, "doc_id", "source", budget_frac=0.5
        ).collect()
    }
    rep = sampling.epoch_repeats(
        docs, "doc_id", "source", budget_epochs=0.5
    ).collect()
    assert all(r["base_epochs"] == 0 for r in rep)
    assert {r["doc_id"] for r in rep if r["n_repeats"] == 1} == kept


def test_epoch_upsample_total_near_budget(spark, docs):
    n = docs.count()
    rep = sampling.epoch_repeats(
        docs, "doc_id", "source", budget_epochs=1.5
    )
    total = rep.agg(F.sum("n_repeats")).first()[0]
    assert abs(total / (1.5 * n) - 1.0) < 0.1


def test_epoch_upsample_tail_gets_more_epochs(spark):
    """α=0.5: the small stratum's epoch target must exceed the big
    stratum's (that is the upsampling direction)."""
    rows = [Row(id=i, s="big") for i in range(1000)] + [
        Row(id=1000 + i, s="small") for i in range(10)
    ]
    df = spark.createDataFrame(rows)
    out = sampling.epoch_repeats(df, "id", "s", alpha=0.5, budget_epochs=1.0)
    eff = {
        r["s"]: r["base_epochs"] + r["frac_thr"] / 4096.0
        for r in out.select("s", "base_epochs", "frac_thr")
        .distinct()
        .collect()
    }
    assert eff["small"] > 1.0 > eff["big"]


# ------------------------------------------------------- hypothesis: LM fold


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = st.lists(
    st.sampled_from(["a", "b", "c", "dd", "e9"]), min_size=0, max_size=12
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_WORDS, min_size=1, max_size=8))
def test_lm_score_matches_python_fold(spark, texts):
    """For ANY tiny corpus, the distributed score equals a sequential
    pure-python replay of the same add-one bigram LM (counts, V, and
    the round-to-8 decimal quantization)."""
    from collections import Counter

    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(t)) for i, t in enumerate(texts)]
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["xent"])
        for r in text.ngram_lm_score(df).collect()
    }
    occ = {
        i: list(zip(t, t[1:])) for i, t in enumerate(texts) if len(t) >= 2
    }
    c12 = Counter(bg for bgs in occ.values() for bg in bgs)
    c1 = Counter(bg[0] for bgs in occ.values() for bg in bgs)
    vocab = len({bg[1] for bgs in occ.values() for bg in bgs})
    exp = {}
    for i, bgs in occ.items():
        if not bgs:
            continue
        bits = [
            round(-math.log2((c12[bg] + 1) / (c1[bg[0]] + vocab)), 8)
            for bg in bgs
        ]
        exp[i] = (len(bgs), sum(bits) / len(bgs))
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][0] == exp[i][0]
        assert abs(got[i][1] - exp[i][1]) < 1e-9


# -------------------------------------------------------------- MAD anomalies


def test_mad_flags_planted_outlier_classical_z_misses_direction(spark):
    """A giant outlier among small values must be flagged, and the
    MEDIAN/MAD the flags are computed from must be unmoved by the
    outlier itself (the robustness property that motivates MAD over
    mean/stddev)."""
    from raft_c_spark.operators import window as w

    rows = [Row(s="a", t=i, v=float(10 + (i % 5))) for i in range(100)]
    rows.append(Row(s="a", t=1000, v=10_000.0))
    df = spark.createDataFrame(rows)
    out = w.mad_anomalies(df, "s", "t", "v", k=8.0).collect()
    assert [r["t"] for r in out] == [1000]
    assert out[0]["med"] == 12.0 and out[0]["mad"] == 1.0


def test_mad_no_flags_on_tight_series(spark):
    from raft_c_spark.operators import window as w

    df = spark.createDataFrame(
        [Row(s="a", t=i, v=float(i % 3)) for i in range(60)]
    )
    assert w.mad_anomalies(df, "s", "t", "v", k=8.0).count() == 0


def test_mad_zero_series_excluded_not_all_flagged(spark):
    """Advisor r7: a series where >=50% of values equal the median has
    MAD = 0 — |x−med| > k·0 would flag EVERY non-median point and
    robust_z would divide by zero. Such series are excluded from
    flagging entirely; a healthy series in the same frame still
    flags its outlier."""
    from raft_c_spark.operators import window as w

    rows = [Row(s="deg", t=i, v=5.0) for i in range(50)]
    rows += [Row(s="deg", t=100 + i, v=float(1000 + i)) for i in range(10)]
    rows += [Row(s="ok", t=i, v=float(10 + (i % 5))) for i in range(100)]
    rows.append(Row(s="ok", t=1000, v=10_000.0))
    out = w.mad_anomalies(
        spark.createDataFrame(rows), "s", "t", "v", k=8.0
    ).collect()
    assert [(r["s"], r["t"]) for r in out] == [("ok", 1000)]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    b1=st.floats(min_value=0.05, max_value=3.0),
    b2=st.floats(min_value=0.05, max_value=3.0),
)
def test_epoch_repeats_monotone_in_budget(spark, docs, b1, b2):
    """For ANY budget pair, every row's n_repeats is monotone
    non-decreasing in the budget (floor + nested hash carry are both
    monotone) — raising a mixture's epoch budget never drops data."""
    lo, hi = sorted([b1, b2])
    a = {
        r["doc_id"]: r["n_repeats"]
        for r in sampling.epoch_repeats(
            docs, "doc_id", "source", budget_epochs=lo
        ).collect()
    }
    b = {
        r["doc_id"]: r["n_repeats"]
        for r in sampling.epoch_repeats(
            docs, "doc_id", "source", budget_epochs=hi
        ).collect()
    }
    assert all(b[k] >= v for k, v in a.items())


def test_asof_join_deterministic_on_duplicate_right_ts(spark):
    """Two right rows at the same (key, ts) with different values:
    the carried row must be the lexicographic max of the value struct
    — identical across partitionings (reviewer r8)."""
    from raft_c_spark.operators import window as w

    left = spark.createDataFrame([("k", 100)], "key string, timestamp long")
    right = spark.createDataFrame(
        [("k", 100, 5.0), ("k", 100, 9.0)],
        "key string, timestamp long, price double",
    )
    outs = []
    for parts in (1, 7):
        out = w.asof_join(
            left, right.repartition(parts), key="key"
        ).collect()
        outs.append([(r["key"], r["right_price"]) for r in out])
    assert outs[0] == outs[1] == [("k", 9.0)]
