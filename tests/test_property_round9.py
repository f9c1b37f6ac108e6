"""Hypothesis properties for the round-9 operators, each checked
against a brute-force pure-python replay on random small corpora —
independent implementation, random inputs, the strongest evidence
after the DuckDB oracle."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

WORDS = ["a", "bb", "ccc", "dd", "e"]

_texts = st.lists(
    st.lists(st.sampled_from(WORDS), max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)


def _brute_segment_dedup(texts: list[str], k: int):
    """Reference replay: first corpus-wide occurrence per distinct
    k-word segment, ordered by (doc, pos)."""
    seen: set[str] = set()
    out = {}
    for doc, t in enumerate(texts):
        toks = t.split()
        segs = [
            " ".join(toks[i : i + k]) for i in range(0, len(toks), k)
        ]
        kept = []
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        out[doc] = (len(segs), len(kept), " ".join(kept))
    return out


@given(texts=_texts, k=st.integers(1, 4))
@settings(**SETTINGS)
def test_segment_dedup_matches_brute_force(spark, texts, k):
    from raft_c_spark.operators.dedup import segment_dedup

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_segments"], r["n_kept"], r["clean_text"])
        for r in segment_dedup(df, "doc_id", "text", k).collect()
    }
    assert got == _brute_segment_dedup(texts, k)


def _brute_overlap(train: list[str], ev: list[str], n: int):
    def grams(t):
        toks = t.lower().split()
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    eg = set().union(*(grams(t) for t in ev)) if ev else set()
    out = {}
    for doc, t in enumerate(train):
        g = grams(t)
        if g:
            out[doc] = (len(g), len(g & eg))
    return out


@given(train=_texts, ev=_texts, n=st.integers(1, 3))
@settings(**SETTINGS)
def test_overlap_contamination_matches_brute_force(spark, train, ev, n):
    from raft_c_spark.operators.text import ngram_overlap_contamination

    tdf = spark.createDataFrame(
        list(enumerate(train)), "doc_id long, text string"
    )
    edf = spark.createDataFrame(
        [(i + 1000, t) for i, t in enumerate(ev)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_hit"])
        for r in ngram_overlap_contamination(tdf, edf, n=n).collect()
    }
    assert got == _brute_overlap(train, ev, n)


@given(texts=_texts)
@settings(**SETTINGS)
def test_gopher_rules_match_python_replay(spark, texts):
    """Every rule boolean recomputed with an independent pure-python
    tokenizer must agree (same thresholds as the registry query)."""
    import re

    from raft_c_spark.operators.text import gopher_rules

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r for r in gopher_rules(df, min_words=2).collect()
    }
    for doc, t in enumerate(texts):
        words = re.findall(r"\S+", t)
        n = len(words)
        mean_wl = sum(len(w) for w in words) / max(n, 1)
        symbols = len(re.findall(r"#|\.\.\.", t))
        alpha = len([w for w in words if re.search("[A-Za-z]", w)])
        sw = len(
            re.findall(
                r"\b(?:the|be|to|of|and|that|have|with)\b", t.lower()
            )
        )
        r = rows[doc]
        assert r["n_words"] == n
        assert r["rule_word_count"] == (2 <= n <= 100_000)
        assert r["rule_mean_word_len"] == (3.0 <= mean_wl <= 10.0)
        assert r["rule_symbol_ratio"] == (symbols / max(n, 1) <= 0.1)
        assert r["rule_alpha_words"] == (alpha / max(n, 1) >= 0.8)
        assert r["rule_stopwords"] == (sw >= 2)
        assert r["passes_gopher"] == all(
            (
                r["rule_word_count"],
                r["rule_mean_word_len"],
                r["rule_symbol_ratio"],
                r["rule_alpha_words"],
                r["rule_stopwords"],
            )
        )


@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    rows=st.integers(1, 7),
)
@settings(**SETTINGS)
def test_training_order_matches_brute_force(spark, ids, rows):
    """The md5 permutation + shard cut must equal the pure-python
    replay: sort ids by md5(str(id)), shard = rank // rows_per_shard —
    and be independent of input partitioning."""
    import hashlib

    from raft_c_spark.operators.sampling import training_order

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: (r["shuffle_key"], r["shard"])
        for r in training_order(df.repartition(5), "doc_id", rows).collect()
    }
    order = sorted(ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    want = {
        i: (hashlib.md5(str(i).encode()).hexdigest(), rank // rows)
        for rank, i in enumerate(order)
    }
    assert got == want
