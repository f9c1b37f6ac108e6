"""Semantic unit tests for repetition metrics and decontamination —
hand-constructed corpora with known answers (the oracle contract
proves Spark≡DuckDB; these prove both compute the RIGHT thing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from raft_c_spark.operators import text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestRepetitionMetrics:
    def test_all_unique_tokens_zero_fractions(self, spark):
        out = text.repetition_metrics(
            _docs(spark, [(1, "alpha beta gamma delta epsilon")])
        ).collect()[0]
        assert out["n_tokens"] == 5
        assert out["dup_word_frac"] == 0.0
        assert out["dup_bigram_frac"] == 0.0
        assert out["dup_trigram_frac"] == 0.0

    def test_fully_repeated_token(self, spark):
        out = text.repetition_metrics(_docs(spark, [(1, "spam " * 6)])).collect()[0]
        # 6 tokens 1 distinct → 5/6; 5 bigrams 1 distinct → 4/5; 4 trigrams → 3/4
        assert out["n_tokens"] == 6
        assert out["dup_word_frac"] == pytest.approx(5 / 6)
        assert out["dup_bigram_frac"] == pytest.approx(4 / 5)
        assert out["dup_trigram_frac"] == pytest.approx(3 / 4)

    def test_repeated_phrase_detected_at_gram_level(self, spark):
        # "a b c a b c": words all repeat; bigrams: ab bc ca ab bc →
        # 5 total 3 distinct; trigrams: abc bca cab abc → 4 total 3 distinct
        out = text.repetition_metrics(_docs(spark, [(1, "a b c a b c")])).collect()[0]
        assert out["dup_word_frac"] == pytest.approx(3 / 6)
        assert out["dup_bigram_frac"] == pytest.approx(2 / 5)
        assert out["dup_trigram_frac"] == pytest.approx(1 / 4)

    def test_short_and_empty_docs(self, spark):
        rows = text.repetition_metrics(
            _docs(spark, [(1, ""), (2, "solo"), (3, "two words")])
        ).collect()
        by_id = {r["doc_id"]: r for r in rows}
        assert by_id[1]["n_tokens"] == 0 and by_id[1]["dup_word_frac"] == 0.0
        assert by_id[2]["dup_bigram_frac"] == 0.0  # no bigrams
        assert by_id[3]["dup_trigram_frac"] == 0.0


class TestDecontaminate:
    def test_planted_overlap_flagged(self, spark):
        bench = _docs(spark, [(100, "the quick brown fox jumps over")])
        train = _docs(
            spark,
            [
                (1, "padding text then the quick brown fox appears here"),
                (2, "completely unrelated words nothing shared at all"),
            ],
        )
        out = {r["doc_id"]: r["overlap_grams"] for r in
               text.decontaminate(train, bench, n=4).collect()}
        assert 1 in out and 2 not in out
        # shares exactly "the quick brown fox" (1 distinct 4-gram)
        assert out[1] == 1

    def test_overlap_counts_distinct_grams_once(self, spark):
        bench = _docs(spark, [(100, "x y z w x y z w")])
        # doc repeats the shared 4-gram twice — still ONE distinct gram
        train = _docs(spark, [(1, "x y z w and again x y z w")])
        out = text.decontaminate(train, bench, n=4).collect()
        assert len(out) == 1
        # train grams overlapping bench's gram set: "x y z w" only
        assert out[0]["overlap_grams"] == 1

    def test_disjoint_corpora_empty(self, spark):
        bench = _docs(spark, [(100, "one two three four five")])
        train = _docs(spark, [(1, "six seven eight nine ten")])
        assert text.decontaminate(train, bench, n=4).count() == 0

    def test_case_and_punct_normalized(self, spark):
        bench = _docs(spark, [(100, "The Quick BROWN Fox!")])
        train = _docs(spark, [(1, "...the quick brown fox...")])
        out = text.decontaminate(train, bench, n=4).collect()
        assert len(out) == 1 and out[0]["doc_id"] == 1


class TestWinnowFingerprints:
    def test_identical_docs_identical_digests(self, spark):
        out = text.winnow_fingerprints(
            _docs(spark, [(1, "the quick brown fox jumps over the lazy dog"),
                          (2, "The  Quick   Brown fox jumps over the lazy dog")])
        ).collect()
        by_id = {r["doc_id"]: r for r in out}
        # whitespace/case normalization → identical fingerprint sets
        assert by_id[1]["fp_digest"] == by_id[2]["fp_digest"]
        assert by_id[1]["n_fps"] == by_id[2]["n_fps"] > 0

    def test_winnowing_guarantee_on_shared_substring(self, spark):
        """The winnowing guarantee: any shared substring of length
        ≥ k + w - 1 (= 11 here) produces at least one shared
        selected hash between the two documents."""
        shared = "abcdefghijklmnop"  # 16 chars >> 11
        out = text.winnow_fingerprints(
            _docs(spark, [(1, "xx " + shared + " yy"),
                          (2, "completely other prefix " + shared)]),
            k=8, w=4, as_sets=True,
        ).collect()
        sets = {r["doc_id"]: set(r["fps"]) for r in out}
        assert sets[1] & sets[2], "guarantee violated: no shared fingerprint"

    def test_disjoint_texts_disjoint_fingerprints(self, spark):
        out = text.winnow_fingerprints(
            _docs(spark, [(1, "aaaa bbbb cccc dddd eeee"),
                          (2, "zzzz yyyy xxxx wwww vvvv")]),
            as_sets=True,
        ).collect()
        sets = {r["doc_id"]: set(r["fps"]) for r in out}
        assert sets[1] and sets[2] and not (sets[1] & sets[2])

    def test_short_docs_empty_fingerprints(self, spark):
        out = {r["doc_id"]: r for r in text.winnow_fingerprints(
            _docs(spark, [(1, "1234567"), (2, "")])
        ).collect()}
        assert out[1]["n_fps"] == 0 and out[2]["n_fps"] == 0


class TestWinnowKernelProperties:
    """Hypothesis: the vectorized numpy kernel ≡ a straightforward
    O(n·w) reference implementation, over arbitrary ASCII text and
    (k, w) parameters. This is the stride-tricks logic's safety net —
    no Spark involved, so hundreds of examples run in seconds."""

    @staticmethod
    def _reference(text, k, w):
        import hashlib  # noqa: F401  (parity of imports with kernel)

        from raft_c_spark.operators.text import WINNOW_B, WINNOW_M

        pw = [pow(WINNOW_B, k - 1 - j, WINNOW_M) for j in range(k)]
        norm = " ".join((text or "").lower().split())
        cps = [ord(c) for c in norm]
        hs = [
            sum(cps[i + j] * pw[j] for j in range(k)) % WINNOW_M
            for i in range(len(cps) - k + 1)
        ]
        if not hs:
            return []
        wlen = min(w, len(hs))
        sel = set()
        for p in range(len(hs) - wlen + 1):
            win = hs[p : p + wlen]
            mv = min(win)
            last = max(i for i, v in enumerate(win) if v == mv)
            sel.add(((p + last + 1) << 31) + mv)
        return sorted(sel)

    def test_kernel_matches_reference(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from raft_c_spark.operators.text import _winnow_packed

        @settings(max_examples=300, deadline=None)
        @given(
            text=st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                max_size=120,
            ),
            k=st.integers(min_value=2, max_value=10),
            w=st.integers(min_value=1, max_value=8),
        )
        def check(text, k, w):
            got = [int(v) for v in _winnow_packed(text, k, w)]
            assert got == self._reference(text, k, w)

        check()

    def test_kernel_handles_repeated_chars(self):
        # constant text → all hashes equal → rightmost-min rule picks
        # the LAST position of every window; selections collapse
        from raft_c_spark.operators.text import _winnow_packed

        got = _winnow_packed("aaaaaaaaaaaaaaaa", 8, 4)
        ref = self._reference("aaaaaaaaaaaaaaaa", 8, 4)
        assert [int(v) for v in got] == ref


class TestBloomDecontaminate:
    def test_planted_overlap_flagged(self, spark):
        ev = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
        tr = _docs(
            spark,
            [
                (1, "zzz alpha beta gamma delta unrelated tail"),
                (2, "completely different words entirely here"),
            ],
        )
        got = {
            r["doc_id"]: r["flagged_grams"]
            for r in text.bloom_decontaminate(tr, ev, n=4).collect()
        }
        # doc 1 shares the 4-gram "alpha beta gamma delta"; doc 2 none
        assert got == {1: 1}

    def test_matches_exact_join_on_clean_corpus(self, spark):
        """With a 2^20-bit filter and a handful of grams, false
        positives are ~impossible: bloom must equal the exact join."""
        from raft_c_spark.sources.testdata import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        ev = docs.filter(F.col("doc_id") % 97 == 0)
        tr = docs.filter(F.col("doc_id") % 97 != 0)
        bloom = {
            (r["doc_id"], r["flagged_grams"])
            for r in text.bloom_decontaminate(tr, ev, n=4).collect()
        }
        exact = {
            (r["doc_id"], r["overlap_grams"])
            for r in text.decontaminate(tr, ev, n=4).collect()
        }
        assert bloom == exact

    def test_oversized_eval_side_raises(self, spark):
        big = _docs(spark, [(1, "a b c d e")])
        with pytest.raises(ValueError):
            text.bloom_decontaminate(big, big, max_eval_bytes=1)


class TestQualityClassifier:
    def test_feature_count_and_score_range(self, spark):
        out = text.quality_classifier(
            _docs(spark, [(1, "alpha beta gamma")])
        ).collect()[0]
        # 3 unigrams + 2 bigrams
        assert out["n_feats"] == 5
        assert -1.0 <= out["score"] <= 1.0

    def test_deterministic_and_content_keyed(self, spark):
        d = _docs(spark, [(1, "alpha beta"), (2, "alpha beta"), (3, "other words")])
        rows = {r["doc_id"]: r["score"] for r in text.quality_classifier(d).collect()}
        assert rows[1] == rows[2]
        assert rows[1] != rows[3]

    def test_empty_doc_drops_out(self, spark):
        d = _docs(spark, [(1, "real words"), (2, "   "), (3, "")])
        assert {r["doc_id"] for r in text.quality_classifier(d).collect()} == {1}


class TestSnapshotDiff:
    def test_classifies_all_four_states(self, spark):
        from raft_c_spark.operators import sampling

        old = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "doc_id long, fp string"
        )
        new = spark.createDataFrame(
            [(2, "b"), (3, "CHANGED"), (4, "d")], "doc_id long, fp string"
        )
        got = {
            r["doc_id"]: r["status"]
            for r in sampling.snapshot_diff(old, new).collect()
        }
        assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


class TestBloomSupersetProperty:
    def test_bloom_flags_superset_of_exact_overlaps(self, spark):
        """Structural bloom guarantee — NO false negatives: every doc
        the exact gram join flags must be bloom-flagged with at least
        as many grams (bloom adds only false positives). Exercised on
        a corpus engineered with heavy shared phrases."""
        phrase = "the quick brown fox jumps over the lazy dog"
        rows = [(i, f"{phrase} filler{i} tail words here") for i in range(30)]
        ev = _docs(spark, [(100, phrase + " extra"), (101, "unrelated eval words entirely")])
        tr = _docs(spark, rows)
        exact = {
            r["doc_id"]: r["overlap_grams"]
            for r in text.decontaminate(tr, ev, n=3).collect()
        }
        bloom = {
            r["doc_id"]: r["flagged_grams"]
            for r in text.bloom_decontaminate(tr, ev, n=3).collect()
        }
        assert set(exact) <= set(bloom)
        for d, n_exact in exact.items():
            assert bloom[d] >= n_exact


def test_non_ascii_ratio_ignores_ascii_whitespace(spark):
    """Tab/newline/CR are ASCII: a line-broken numeric list must not
    trip the CJK gate (reviewer r8)."""
    from raft_c_spark.operators import text as t

    df = spark.createDataFrame(
        [(1, "1\n2\n3\n4"), (2, "中文中文中文中文中文")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["non_ascii_ratio"], r["pred_lang"])
           for r in t.analyze(df).collect()}
    assert out[1][0] == 0.0 and out[1][1] != "zh"
    assert out[2][1] == "zh"


def test_bloom_decontaminate_saturation_raises(spark):
    """An eval gram set that saturates the filter must fail loudly
    (fpr ~= 1 makes the output noise) instead of flagging everything."""
    import pytest

    from raft_c_spark.operators import text as t

    rows = [(i, " ".join(f"w{i}x{j}" for j in range(200)))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError, match="saturated"):
        t.bloom_decontaminate(
            df, df, "doc_id", "text", n=4, m_bits=1 << 10, k=5,
            max_eval_bytes=256 << 20,
        )


def test_decontaminate_honors_id_col_name(spark):
    from raft_c_spark.operators import text as t

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f")],
        "page_id long, text string",
    )
    out = t.decontaminate(
        df.filter("page_id = 1"), df.filter("page_id = 2"),
        id_col="page_id", text_col="text", n=3,
    )
    assert "page_id" in out.columns


class TestGopherRules:
    def test_rule_thresholds(self, spark):
        from raft_c_spark.operators.text import gopher_rules

        df = spark.createDataFrame(
            [
                # clean English-ish doc: all rules pass
                (1, "the cat sat of the mat and that dog have fun " * 5),
                # symbol soup: word-count/symbol/alpha/stopword fail
                (2, "## ### #### ...."),
                # single-letter words: mean-word-len fails
                (3, "a b c d e f g h i j k l"),
                # numbers only: alpha-word rule fails
                (4, " ".join(str(i) for i in range(20)) + " the of and"),
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in gopher_rules(df, min_words=10).collect()
        }
        assert out[1]["passes_gopher"]
        assert not out[2]["rule_word_count"]
        assert not out[2]["rule_symbol_ratio"]
        assert not out[3]["rule_mean_word_len"]
        assert not out[3]["passes_gopher"]
        assert not out[4]["rule_alpha_words"]
        assert out[4]["rule_stopwords"]

    def test_symbol_counting_non_overlapping(self, spark):
        """'....' is ONE ellipsis match (+ leftover dot), '####' is
        four hash matches — pin the regexp_count semantics the oracle
        mirrors."""
        from raft_c_spark.operators.text import gopher_rules

        df = spark.createDataFrame(
            [(1, "w " * 30 + "#### ....")], "doc_id long, text string"
        )
        row = gopher_rules(df, min_words=10).first()
        # 5 symbols / 32 words > 0.1 → rule fails
        assert not row["rule_symbol_ratio"]

    def test_empty_text(self, spark):
        from raft_c_spark.operators.text import gopher_rules

        row = gopher_rules(
            spark.createDataFrame([(1, "")], "doc_id long, text string"),
            min_words=10,
        ).first()
        assert row["n_words"] == 0 and not row["passes_gopher"]


class TestNgramOverlapContamination:
    def test_overlap_ratio_and_flag(self, spark):
        from raft_c_spark.operators.text import ngram_overlap_contamination

        train = spark.createDataFrame(
            [
                (1, "a b c d e"),     # grams: abc bcd cde → 2 hits
                (2, "x y z w q"),     # no hits
                (3, "a b"),           # too short for n=3 → excluded
            ],
            "doc_id long, text string",
        )
        ev = spark.createDataFrame(
            [(100, "a b c d zz")], "doc_id long, text string"
        )  # eval grams: "a b c", "b c d", "c d zz"
        out = {
            r["doc_id"]: r
            for r in ngram_overlap_contamination(
                train, ev, n=3, threshold=0.5
            ).collect()
        }
        assert out[1]["n_grams"] == 3 and out[1]["n_hit"] == 2
        assert abs(out[1]["overlap_ratio"] - 2 / 3) < 1e-8
        assert out[1]["contaminated"]
        assert out[2]["n_hit"] == 0 and not out[2]["contaminated"]
        assert 3 not in out  # sub-n docs produce no gram rows

    def test_distinct_grams_counted_once(self, spark):
        """A repeated gram inside one doc counts once on both sides of
        the ratio (the GPT-3 method is over the doc's gram SET)."""
        from raft_c_spark.operators.text import ngram_overlap_contamination

        train = spark.createDataFrame(
            [(1, "a b c a b c a b c")], "doc_id long, text string"
        )
        ev = spark.createDataFrame(
            [(9, "a b c x")], "doc_id long, text string"
        )
        row = ngram_overlap_contamination(train, ev, n=3).first()
        # distinct grams of doc1: {a b c, b c a, c a b} → 3, one hit
        assert row["n_grams"] == 3 and row["n_hit"] == 1


class TestCcnetBuckets:
    def test_bucket_partition(self, spark, sf_dir):
        from raft_c_spark.operators.text import ccnet_perplexity_buckets
        from raft_c_spark.sources.testdata import load_table

        docs = load_table(spark, sf_dir, "documents")
        rows = ccnet_perplexity_buckets(docs).collect()
        assert rows, "no buckets produced"
        by_lang = {}
        for r in rows:
            assert r["bucket"] in ("head", "middle", "tail")
            assert r["min_xent"] <= r["median_xent"] <= r["max_xent"]
            by_lang.setdefault(r["lang"], {})[r["bucket"]] = r
        for lang, buckets in by_lang.items():
            # quartile cuts: head holds ~25% (>=1 doc), and bucket
            # ranges must be ordered head < middle < tail
            assert "head" in buckets, (lang, buckets)
            if "middle" in buckets:
                assert (
                    buckets["head"]["max_xent"]
                    <= buckets["middle"]["min_xent"]
                )
            if "middle" in buckets and "tail" in buckets:
                assert (
                    buckets["middle"]["max_xent"]
                    <= buckets["tail"]["min_xent"]
                )


class TestBM25TopK:
    def test_ranking_and_k(self, spark):
        # doc 1 mentions the query term 3x (short), doc 2 once (long),
        # doc 3 never -> excluded; higher tf + shorter doc ranks first
        rows = [
            (1, "spark spark spark query"),
            (2, "spark alpha beta gamma delta epsilon zeta eta theta"),
            (3, "nothing relevant here at all"),
        ]
        out = text.bm25_topk(
            _docs(spark, rows), ["spark"], k=10
        ).collect()
        assert [r["doc_id"] for r in out] == [1, 2]
        assert out[0]["score"] > out[1]["score"] > 0
        assert all(r["n_terms"] == 1 for r in out)

    def test_multi_term_match_count_and_limit(self, spark):
        rows = [
            (1, "alpha beta"),
            (2, "alpha"),
            (3, "beta"),
            (4, "alpha beta alpha beta"),
        ]
        out = text.bm25_topk(
            _docs(spark, rows), ["alpha", "beta"], k=2
        ).collect()
        assert len(out) == 2  # k respected
        by_id = {r["doc_id"]: r for r in out}
        assert all(r["n_terms"] == 2 for r in by_id.values())

    def test_rare_term_outweighs_common(self, spark):
        # 'rare' appears in 1 of 5 docs, 'common' in all 5: equal tf,
        # equal dl -> the rare-term doc must outrank a common-term doc
        rows = [
            (1, "rare filler filler"),
            (2, "common filler filler"),
            (3, "common filler filler"),
            (4, "common filler filler"),
            (5, "common filler filler"),
        ]
        out = text.bm25_topk(
            _docs(spark, rows), ["rare", "common"], k=5
        ).collect()
        assert out[0]["doc_id"] == 1

    def test_empty_terms_rejected(self, spark):
        with pytest.raises(ValueError):
            text.bm25_topk(_docs(spark, [(1, "x")]), [])


class TestCharEntropy:
    def test_known_values(self, spark):
        rows = [(1, "aaaa"), (2, "abab"), (3, "abcd")]
        out = {
            r["doc_id"]: r
            for r in text.char_entropy(_docs(spark, rows)).collect()
        }
        assert out[1]["entropy_bits"] == 0.0  # single symbol
        assert out[2]["entropy_bits"] == pytest.approx(1.0)  # 2 uniform
        assert out[3]["entropy_bits"] == pytest.approx(2.0)  # 4 uniform
        assert out[3]["n_distinct_chars"] == 4
        assert out[3]["n_chars_counted"] == 4

    def test_spaces_counted_and_empty_doc_omitted(self, spark):
        rows = [(1, "a a"), (2, "")]
        out = text.char_entropy(_docs(spark, rows)).collect()
        assert len(out) == 1  # empty doc has no distribution
        r = out[0]
        assert r["n_chars_counted"] == 3  # the space counts
        # p(a)=2/3, p(' ')=1/3 -> H = log2(3) - 2/3 ~ 0.9183
        assert r["entropy_bits"] == pytest.approx(0.91829583, abs=1e-6)

    def test_low_entropy_flags_repetition(self, spark):
        rows = [(1, "spam spam spam spam spam"), (2, "the quick brown fox")]
        out = {
            r["doc_id"]: r["entropy_bits"]
            for r in text.char_entropy(_docs(spark, rows)).collect()
        }
        assert out[1] < out[2]
