"""Hypothesis properties for the round-8 operators: each is checked
against a brute-force pure-python replay (the strongest correctness
evidence after the DuckDB oracle — random inputs, independent
implementation) or against an algebraic invariant of the method.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

WORDS = ["alpha", "beta", "gamma", "delta", "omega", "zz9"]


def _brute_spans(texts: dict[int, str], L: int) -> dict[int, list]:
    """Reference implementation of ExactSubstr spans: corpus-wide
    L-gram counts over the normalized text, maximal merged intervals
    of positions whose gram occurs >= 2 times anywhere."""
    import re

    norm = {
        d: re.sub(r"\s+", " ", t).strip().lower() for d, t in texts.items()
    }
    counts: Counter = Counter()
    for t in norm.values():
        for i in range(len(t) - L + 1):
            counts[t[i : i + L]] += 1
    out: dict[int, list] = {}
    for d, t in norm.items():
        hits = [
            i + 1
            for i in range(len(t) - L + 1)
            if counts[t[i : i + L]] >= 2
        ]
        spans = []
        for p in hits:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + L)
                spans[-1][2] += 1
            else:
                spans.append([p, p + L, 1])
        if spans:
            out[d] = [tuple(s) for s in spans]
    return out


@settings(**SETTINGS)
@given(
    st.lists(
        st.text(alphabet="abcxy ", min_size=0, max_size=120),
        min_size=2,
        max_size=8,
    ),
    st.integers(min_value=0, max_value=6),
)
def test_repeated_spans_match_bruteforce(spark, texts, clone_at):
    """Random small-alphabet corpora (collision-rich) with one planted
    clone: Spark spans == the pure-python replay exactly."""
    if clone_at < len(texts) and len(texts) >= 2:
        texts = list(texts)
        texts[clone_at] = texts[0]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from raft_c_spark.operators import dedup

    got: dict[int, list] = {}
    for r in dedup.repeated_substring_spans(
        df, "doc_id", "text", min_len=12
    ).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["n_grams"])
        )
    got = {d: sorted(v) for d, v in got.items()}
    want = {
        d: sorted(v)
        for d, v in _brute_spans(dict(rows), 12).items()
    }
    assert got == want


def _brute_dsir(rows, B=4096):
    occ = []
    for doc, text, tgt in rows:
        toks = []
        w = ""
        for ch in text.lower():
            if ch.isalnum() and ord(ch) < 128:
                w += ch
            else:
                if w:
                    toks.append(w)
                w = ""
        if w:
            toks.append(w)
        grams = toks + [
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        ]
        for g in grams:
            h = int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B
            occ.append((doc, tgt, h))
    c_raw: Counter = Counter(b for _, _, b in occ)
    c_tgt: Counter = Counter(b for _, t, b in occ if t)
    n_raw, n_tgt = sum(c_raw.values()), sum(c_tgt.values())
    lr = {
        b: round(
            math.log((c_tgt.get(b, 0) + 1) / (n_tgt + B))
            - math.log((c_raw[b] + 1) / (n_raw + B)),
            8,
        )
        for b in c_raw
    }
    out = {}
    for doc, _, b in occ:
        n, s = out.get(doc, (0, 0.0))
        out[doc] = (n + 1, round(s + lr[b], 10))
    for doc, text, _ in rows:
        if doc not in out:
            out[doc] = (0, 0.0)
    return out


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.lists(st.sampled_from(WORDS), min_size=0, max_size=6),
            st.booleans(),
        ),
        min_size=2,
        max_size=10,
    )
)
def test_dsir_weights_match_bruteforce(spark, docs):
    """importance_weights == a pure-python replay (md5 buckets,
    add-one smoothing, 8-decimal rounding) on random tiny corpora —
    including docs with zero tokens (neutral weight)."""
    rows = [(i, " ".join(ws), t) for i, (ws, t) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, t boolean")
    from raft_c_spark.operators import sampling as s

    got = {
        r["doc_id"]: (r["n_feats"], round(r["log_weight"], 6))
        for r in s.importance_weights(df, "doc_id", "text", "t").collect()
    }
    want = {
        d: (n, round(v, 6)) for d, (n, v) in _brute_dsir(rows).items()
    }
    assert got == want


@settings(**SETTINGS)
@given(
    st.lists(
        st.floats(min_value=-5, max_value=5, allow_nan=False),
        min_size=5,
        max_size=30,
    ),
    st.floats(min_value=-100, max_value=100, allow_nan=False),
)
def test_gumbel_topk_shift_invariant(spark, weights, shift):
    """Softmax is shift-invariant, so adding any constant to every
    weight must select the SAME rows (keys all move by the constant;
    order and ties preserved up to the 1e-8 rounding grid)."""
    from pyspark.sql import functions as F

    from raft_c_spark.operators import sampling as s

    rows = [(i, float(w)) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    k = max(1, len(rows) // 3)
    a = [r["doc_id"] for r in s.gumbel_topk(df, "doc_id", "w", k).collect()]
    b = [
        r["doc_id"]
        for r in s.gumbel_topk(
            df.withColumn("w", F.col("w") + float(shift)), "doc_id", "w", k
        ).collect()
    ]
    assert a == b
