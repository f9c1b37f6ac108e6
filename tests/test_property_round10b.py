"""Hypothesis properties for the round-10 continuation operators
(BM25 retrieval, char entropy), each checked against a brute-force
pure-python replay on random small corpora — independent
implementation, random inputs, the strongest evidence after the
DuckDB oracle."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from raft_c_spark.operators import text

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

WORDS = ["alpha", "bb", "ccc", "dd", "e"]

_texts = st.lists(
    st.lists(st.sampled_from(WORDS), max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def _brute_bm25(texts, terms, k1=1.2, b=0.75):
    """Reference replay with the operator's quantization points:
    round(idf, 8) and round(tfpart, 8) per (doc, term), fsum per doc.
    Python float products differ from the decimal-exact Spark sum
    only below ~1e-12 — compared with approx."""
    toks = [t.split() for t in texts]
    n_docs = len(texts)
    dl = [len(ts) for ts in toks]
    avgdl = sum(dl) / n_docs
    tf: dict[tuple[int, str], int] = {}
    for d, ts in enumerate(toks):
        for w in ts:
            if w in terms:
                tf[(d, w)] = tf.get((d, w), 0) + 1
    df: dict[str, int] = {}
    for (d, w) in tf:
        df[w] = df.get(w, 0) + 1
    scores: dict[int, float] = {}
    nterms: dict[int, int] = {}
    for (d, w), f in tf.items():
        idf = round(math.log(1 + (n_docs - df[w] + 0.5) / (df[w] + 0.5)), 8)
        tfp = round(
            (f * (k1 + 1.0))
            / (f + k1 * (1.0 - b + b * dl[d] / avgdl)),
            8,
        )
        scores[d] = scores.get(d, 0.0) + idf * tfp
        nterms[d] = nterms.get(d, 0) + 1
    return {d: (nterms[d], round(s, 8)) for d, s in scores.items()}


@given(texts=_texts, terms=st.sets(st.sampled_from(WORDS), min_size=1, max_size=3))
@settings(**SETTINGS)
def test_bm25_matches_brute(spark, texts, terms):
    got = {
        r["doc_id"]: (r["n_terms"], r["score"])
        for r in text.bm25_topk(
            _docs(spark, texts), sorted(terms), k=len(texts)
        ).collect()
    }
    want = _brute_bm25(texts, terms)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert got[d][1] == pytest.approx(want[d][1], abs=1e-6)


def _brute_entropy(texts):
    out = {}
    for d, t in enumerate(texts):
        if not t:
            continue
        counts: dict[str, int] = {}
        for ch in t:
            counts[ch] = counts.get(ch, 0) + 1
        n = len(t)
        ent = math.fsum(
            round(-(c / n) * math.log2(c / n), 8) for c in counts.values()
        )
        out[d] = (n, len(counts), round(ent, 8))
    return out


@given(texts=_texts)
@settings(**SETTINGS)
def test_char_entropy_matches_brute(spark, texts):
    got = {
        r["doc_id"]: (
            r["n_chars_counted"],
            r["n_distinct_chars"],
            r["entropy_bits"],
        )
        for r in text.char_entropy(_docs(spark, texts)).collect()
    }
    want = _brute_entropy(texts)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert got[d][1] == want[d][1]
        assert got[d][2] == pytest.approx(want[d][2], abs=1e-7)
