"""Hypothesis + edge-case tests for the round-10 third operator batch
(PMI collocations, Markov transition matrix, ts delta/rate), each
checked against a brute-force pure-python replay on random small
inputs — independent implementation, random inputs, the strongest
evidence after the DuckDB oracle."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from raft_c_spark.operators import text, tsdb
from raft_c_spark.operators.window import transition_matrix

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


# --- collocations -----------------------------------------------------------


def _brute_collocations(texts, min_count, k):
    toks = [t.split() for t in texts]
    t_tokens = sum(len(ts) for ts in toks)
    b_pairs = sum(max(len(ts) - 1, 0) for ts in toks)
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for ts in toks:
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    out = []
    for (a, b), c_ab in bi.items():
        if c_ab < min_count:
            continue
        pmi = round(
            math.log(
                (c_ab / b_pairs)
                / ((uni[a] / t_tokens) * (uni[b] / t_tokens))
            ),
            8,
        )
        out.append((a, b, c_ab, uni[a], uni[b], pmi))
    out.sort(key=lambda r: (-r[5], r[0], r[1]))
    return out[:k]


@given(texts=_texts, min_count=st.integers(1, 3))
@settings(**SETTINGS)
def test_collocations_match_brute(spark, texts, min_count):
    got = [
        (r["w1"], r["w2"], r["n_pair"], r["n_w1"], r["n_w2"], r["pmi"])
        for r in text.collocations(
            _docs(spark, texts), min_count=min_count, k=100
        ).collect()
    ]
    want = _brute_collocations(texts, min_count, 100)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:5] == w[:5]
        assert g[5] == pytest.approx(w[5], abs=1e-7)


def test_collocations_min_count_validates(spark):
    with pytest.raises(ValueError):
        text.collocations(_docs(spark, ["a b"]), min_count=0)


def test_collocations_short_docs_no_pairs(spark):
    # 0- and 1-token docs contribute tokens to T but no pairs to B
    out = text.collocations(
        _docs(spark, ["solo", "", "x y x y x y"]), min_count=2, k=10
    ).collect()
    pairs = {(r["w1"], r["w2"]): r["n_pair"] for r in out}
    assert pairs == {("x", "y"): 3, ("y", "x"): 2}


# --- transition matrix ------------------------------------------------------


_events_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),  # user
        st.integers(0, 50),  # ts (collisions likely)
        st.sampled_from(["a", "b", "c"]),
    ),
    min_size=2,
    max_size=30,
)


def _brute_transitions(rows):
    # order per user by (ts, event_id) — event_id is the list index
    by_user: dict[int, list[tuple[int, int, str]]] = {}
    for i, (u, ts, s) in enumerate(rows):
        by_user.setdefault(u, []).append((ts, i, s))
    counts: dict[tuple[str, str], int] = {}
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    totals: dict[str, int] = {}
    for (a, _), c in counts.items():
        totals[a] = totals.get(a, 0) + c
    return {
        (a, b): (c, totals[a], round(c / totals[a], 8))
        for (a, b), c in counts.items()
    }


@given(rows=_events_strategy)
@settings(**SETTINGS)
def test_transition_matrix_matches_brute(spark, rows):
    df = spark.createDataFrame(
        [(i, u, ts, s) for i, (u, ts, s) in enumerate(rows)],
        "event_id long, user_id long, timestamp long, state string",
    )
    got = {
        (r["from_state"], r["to_state"]): (
            r["n_transitions"],
            r["n_from"],
            r["prob"],
        )
        for r in transition_matrix(
            df, "user_id", "timestamp", "state", tiebreak_col="event_id"
        ).collect()
    }
    want = _brute_transitions(rows)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == want[k][1]
        assert got[k][2] == pytest.approx(want[k][2], abs=1e-8)


def test_transition_matrix_probs_sum_to_one(spark):
    df = spark.createDataFrame(
        [(i, 1, i, s) for i, s in enumerate("aabacbabcc")],
        "event_id long, user_id long, timestamp long, state string",
    )
    rows = transition_matrix(
        df, "user_id", "timestamp", "state", tiebreak_col="event_id"
    ).collect()
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r["from_state"]] = by_from.get(r["from_state"], 0.0) + r["prob"]
    for s, total in by_from.items():
        assert total == pytest.approx(1.0, abs=1e-6)


# --- delta / rate -----------------------------------------------------------


_points_strategy = st.lists(
    st.tuples(
        st.sampled_from(["s1", "s2"]),
        # negative timestamps included: the bucket expression must
        # floor (pmod), not truncate toward zero (%)
        st.integers(-10_000, 10_000),
        st.floats(-100, 100, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=40,
)


def _brute_delta_rate(rows, interval):
    # Python % IS floor-mod — the reference semantics the operator's
    # pmod must match on negative timestamps
    buckets: dict[tuple[str, int], list[tuple[int, float]]] = {}
    for s, t, v in rows:
        buckets.setdefault((s, t - t % interval), []).append((t, v))
    out = {}
    for key, pts in buckets.items():
        first = min(pts)
        last = max(pts)
        delta = last[1] - first[1]
        span = last[0] - first[0]
        rate = (
            round(delta * 1_000_000_000.0 / span, 8) if span > 0 else None
        )
        out[key] = (len(pts), round(delta, 8), rate)
    return out


@given(rows=_points_strategy, interval=st.sampled_from([7, 100, 1000]))
@settings(**SETTINGS)
def test_delta_rate_matches_brute(spark, rows, interval):
    df = spark.createDataFrame(
        [(s, t, float(v)) for s, t, v in rows],
        "series string, timestamp long, value double",
    )
    got = {
        (r["series"], r["bucket_ts"]): (
            r["n_points"],
            r["delta"],
            r["rate_per_s"],
        )
        for r in tsdb.delta_rate(df, interval).collect()
    }
    want = _brute_delta_rate(rows, interval)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-6)
        if want[k][2] is None:
            assert got[k][2] is None
        else:
            assert got[k][2] == pytest.approx(want[k][2], rel=1e-6)


def test_delta_rate_single_point_bucket_null_rate(spark):
    df = spark.createDataFrame(
        [("s", 5, 1.5), ("s", 105, 2.0), ("s", 110, 3.5)],
        "series string, timestamp long, value double",
    )
    rows = {
        r["bucket_ts"]: r for r in tsdb.delta_rate(df, 100).collect()
    }
    assert rows[0]["n_points"] == 1
    assert rows[0]["delta"] == 0.0
    assert rows[0]["rate_per_s"] is None
    assert rows[100]["n_points"] == 2
    assert rows[100]["delta"] == pytest.approx(1.5)
    assert rows[100]["rate_per_s"] == pytest.approx(1.5 * 1e9 / 5)


def test_delta_rate_duplicate_ns_tiebreak_by_value(spark):
    # identical-ns points (DP_INSERT model): struct(ts, value) min/max
    # resolves by value — first=(10, 1.0), last=(10, 9.0), span 0
    df = spark.createDataFrame(
        [("s", 10, 9.0), ("s", 10, 1.0)],
        "series string, timestamp long, value double",
    )
    r = tsdb.delta_rate(df, 100).collect()[0]
    assert r["delta"] == pytest.approx(8.0)
    assert r["rate_per_s"] is None


def test_delta_rate_negative_ts_floor_bucket(spark):
    # -50 and 50 lie in DIFFERENT buckets under the floor contract
    # (a truncating % would merge both into bucket 0)
    df = spark.createDataFrame(
        [("s", -50, 0.0), ("s", 50, 10.0)],
        "series string, timestamp long, value double",
    )
    rows = {r["bucket_ts"]: r for r in tsdb.delta_rate(df, 100).collect()}
    assert set(rows) == {-100, 0}
    assert rows[-100]["n_points"] == 1 and rows[0]["n_points"] == 1


def test_delta_rate_validates_interval(spark):
    df = spark.createDataFrame(
        [("s", 1, 1.0)], "series string, timestamp long, value double"
    )
    with pytest.raises(ValueError):
        tsdb.delta_rate(df, 0)


# --- lang KL (staged for r11 registration) ---------------------------------


def _brute_lang_kl(rows):
    """rows: list of (lang, text). Replays the operator's quantization
    points: per-word round(p_lw*ln(p_lw/p_w), 8), fsum per lang."""
    lw: dict[tuple[str, str], int] = {}
    cw: dict[str, int] = {}
    tl: dict[str, int] = {}
    t = 0
    for lang, text in rows:
        ws = text.split()
        tl[lang] = tl.get(lang, 0) + len(ws)
        t += len(ws)
        for w in ws:
            lw[(lang, w)] = lw.get((lang, w), 0) + 1
            cw[w] = cw.get(w, 0) + 1
    out: dict[str, tuple[int, int, float]] = {}
    terms: dict[str, list[float]] = {}
    types: dict[str, int] = {}
    for (lang, w), c in lw.items():
        p_lw = c / tl[lang]
        p_w = cw[w] / t
        terms.setdefault(lang, []).append(round(p_lw * math.log(p_lw / p_w), 8))
        types[lang] = types.get(lang, 0) + 1
    for lang in terms:
        out[lang] = (tl[lang], types[lang], round(math.fsum(terms[lang]), 8))
    return out


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["en", "fr", "zh"]),
            st.lists(st.sampled_from(WORDS), min_size=1, max_size=10).map(
                " ".join
            ),
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_lang_kl_matches_brute(spark, rows):
    df = spark.createDataFrame(
        [(i, l, t) for i, (l, t) in enumerate(rows)],
        "doc_id long, lang string, text string",
    )
    got = {
        r["lang"]: (r["n_tokens"], r["n_types"], r["kl_nats"])
        for r in text.lang_unigram_kl(df).collect()
    }
    want = _brute_lang_kl(rows)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == want[k][1]
        assert got[k][2] == pytest.approx(want[k][2], abs=1e-7)


def test_lang_kl_single_lang_is_zero(spark):
    # one language == the corpus -> p_lw == p_w for every word -> KL 0
    df = spark.createDataFrame(
        [(1, "en", "a b a c"), (2, "en", "b b c")],
        "doc_id long, lang string, text string",
    )
    rows = text.lang_unigram_kl(df).collect()
    assert len(rows) == 1
    assert rows[0]["kl_nats"] == pytest.approx(0.0, abs=1e-8)
    assert rows[0]["n_tokens"] == 7
    assert rows[0]["n_types"] == 3


def test_lang_kl_nonnegative(spark):
    df = spark.createDataFrame(
        [(1, "en", "x x x y"), (2, "fr", "y y z z z")],
        "doc_id long, lang string, text string",
    )
    for r in text.lang_unigram_kl(df).collect():
        assert r["kl_nats"] >= -1e-8  # Gibbs' inequality


def test_lang_kl_zero_token_language_surfaces(spark):
    # advisor r10: a language with nothing for the [a-z0-9]+
    # tokenizer (actual zh text, symbols) must NOT vanish through an
    # inner join — it emits n_tokens=0 / n_types=0 / kl_nats=NULL.
    df = spark.createDataFrame(
        [(1, "en", "a b a"), (2, "zh", "你好 世界"), (3, "zh", "——！")],
        "doc_id long, lang string, text string",
    )
    rows = {r["lang"]: r for r in text.lang_unigram_kl(df).collect()}
    assert set(rows) == {"en", "zh"}
    assert rows["zh"]["n_tokens"] == 0
    assert rows["zh"]["n_types"] == 0
    assert rows["zh"]["kl_nats"] is None
    assert rows["en"]["n_tokens"] == 3
    assert rows["en"]["kl_nats"] == pytest.approx(0.0, abs=1e-8)


# --- ccnet percentile_approx certification (r11, judge r10 ask #7) --------


def test_ccnet_approx_certify_bands_hold(spark):
    # skewed + tied + tiny-group data: the GK sketch must stay inside
    # its own rank contract, so every certification boolean is TRUE
    rows = (
        [(i, "en", float(i)) for i in range(200)]
        + [(1000 + i, "fr", float(i % 7)) for i in range(97)]  # ties
        + [(2000, "zh", 3.25), (2001, "zh", 3.25)]  # 2-doc group
    )
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, xent double"
    )
    # replicate the operator's two certification passes on a frame
    # with a KNOWN score column (the public function derives xent
    # from text, which can't be steered to these distributions); the
    # full operator is certified over real documents in the next test
    from pyspark.sql import functions as F

    cuts = df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile_approx(xent, array(0.25d, 0.75d), 1000)").alias(
            "ap"
        ),
    )
    j = df.join(F.broadcast(cuts), "lang")
    got = (
        j.groupBy("lang", "n")
        .agg(
            F.sum((F.col("xent") <= F.col("ap")[0]).cast("long")).alias("le"),
            F.sum((F.col("xent") < F.col("ap")[0]).cast("long")).alias("lt"),
        )
        .collect()
    )
    for r in got:
        eps = 1.0 / 1000 + 2.0 / r["n"]
        assert r["le"] >= (0.25 - eps) * r["n"], r
        assert r["lt"] + 1 <= (0.25 + eps) * r["n"] + 1e-9, r


def test_ccnet_approx_certify_all_true(spark, sf_dir):
    from raft_c_spark.plans.text import q_ds_ccnet_buckets_approx

    rows = q_ds_ccnet_buckets_approx(spark, sf_dir).collect()
    assert rows, "must emit one row per language"
    for r in rows:
        assert r["cut_lo_in_band"] is True, tuple(r)
        assert r["cut_hi_in_band"] is True, tuple(r)
        assert r["n_docs"] > 0


def test_ccnet_approx_oracle_parity(spark, duck, sf_dir):
    from raft_c_spark.plans.text import ORACLES, q_ds_ccnet_buckets_approx
    from tests.harness import assert_matches_oracle

    assert_matches_oracle(
        q_ds_ccnet_buckets_approx(spark, sf_dir),
        duck,
        ORACLES["ds_ccnet_buckets_approx"],
        "ds_ccnet_buckets_approx",
    )


def test_lang_kl_oracle_parity(spark, duck, sf_dir):
    """The staged r11 oracle SQL against the real operator — the same
    normalized-row multiset compare the driver applies."""
    from raft_c_spark.plans.text import LANG_KL_ORACLE_SQL, q_ds_lang_kl
    from tests.harness import assert_matches_oracle

    assert_matches_oracle(
        q_ds_lang_kl(spark, sf_dir), duck, LANG_KL_ORACLE_SQL, "ds_lang_kl"
    )
