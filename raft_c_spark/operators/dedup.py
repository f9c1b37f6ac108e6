"""Deduplication operators for training-data pipelines: exact,
n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale design (100 TB corpora):
- exact dedup is one hash-aggregate on a fingerprint — the canonical
  map-side-combine shuffle, linear and skew-tolerant;
- pairwise Jaccard is quadratic and exists as the *verifier* and the
  small-scale baseline; the scale path is MinHash+LSH: candidate
  generation is an equi-join on (band, band_hash) — only colliding
  docs meet, so cost tracks true-duplicate density, not n²;
- hot shingles (stop-trigrams) are capped via a document-frequency
  cut to stop candidate-pair explosion on skewed buckets;
- exact paths are built-in expressions + joins (JVM codegen);
  minhash signatures are a *narrow* vectorized Arrow kernel (text in,
  signature out — no shuffle until banding).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: universal-hash modulus for MinHash
# permutations (h_i(x) = (a_i*x + b_i) mod p). 31-bit domain keeps
# every intermediate product < 2^62, inside int64 under ANSI mode
# (a 61-bit prime would overflow h*a); 31-bit minhash collision noise
# is negligible next to the k=64-permutation estimation error.
_MERSENNE_P = (1 << 31) - 1


def char_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct character n-gram shingles per document, lowercased,
    whitespace-normalized. Column-expression sliding window (sequence +
    transform + explode) — no UDF."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    shingles = F.expr(
        f"transform(sequence(1, greatest(length(_norm) - {n - 1}, 0)),"
        f" i -> substring(_norm, i, {n}))"
    )
    return (
        df.select(F.col(id_col).alias("doc"), norm.alias("_norm"))
        .select("doc", F.explode(shingles).alias("shingle"))
        .distinct()
    )


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact-content duplicate groups: normalize → group → keep groups
    with >1 member. Output: (content_key, dup_count, keep_id) where
    keep_id is the smallest id (the survivor a dedup pass would keep)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return (
        df.select(F.col(id_col).alias("doc"), norm.alias("content"))
        .groupBy("content")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min("doc").alias("keep_id"),
        )
        .filter(F.col("dup_count") > 1)
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Return the deduplicated frame: one survivor (min id) per exact
    normalized content."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    w = Window.partitionBy(norm).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.6,
    max_shingle_df: int | None = None,
    max_bitmap_shingles: int = 65536,
) -> DataFrame:
    """All document pairs (a < b) with n-gram Jaccard ≥ threshold.
    Exact result; the physical strategy is adaptive:

    - **bitmap path** (distinct shingles ≤ ``max_bitmap_shingles``):
      each doc's shingle set becomes a fixed-width bit vector
      (array<long>); |A∩B| is AND+popcount on a broadcast
      nested-loop self-join. Cost: O(n²·words) with tiny constants —
      immune to hot-shingle blowup (a low-vocabulary corpus can make
      the join path materialize Σ df² rows, billions at a few thousand
      docs).
    - **shingle-join path** (large shingle spaces): |common| per pair
      via an equi-join on shingle. ``max_shingle_df`` optionally drops
      stop-shingles (df cap → approximation) to bound skew.

    At 100 TB neither exact path is the tool — minhash_lsh_pairs is —
    but this operator is the ground-truth verifier the LSH variants are
    tested against.
    """
    sh = char_shingles(df, id_col, text_col, n).cache()
    vocab = _collect_vocab(sh, max_bitmap_shingles)
    if vocab is not None:
        return _jaccard_bitmap(sh, vocab, threshold)
    return _jaccard_join(sh, threshold, max_shingle_df)


def _collect_vocab(sh: DataFrame, cap: int) -> list[str] | None:
    """The distinct shingle vocabulary if it has ≤ cap entries, else
    None — one action: limit(cap+1) returns the complete set exactly
    when fewer than cap+1 rows come back."""
    rows = sh.select("shingle").distinct().limit(cap + 1).collect()
    if len(rows) > cap:
        return None
    return sorted(r["shingle"] for r in rows)


def _jaccard_bitmap(
    sh: DataFrame, vocab: list[str], threshold: float
) -> DataFrame:
    # 63 usable bits per long: bit 63 via pow(2,63) would overflow the
    # signed cast under ANSI
    n_distinct = len(vocab)
    n_words = (n_distinct + 62) // 63
    ids = sh.sparkSession.createDataFrame(
        [(s, i) for i, s in enumerate(vocab)], "shingle string, sid int"
    )
    doc_ids = sh.join(F.broadcast(ids), "shingle").select("doc", "sid")
    word = (F.col("sid") / 63).cast("int")
    bit = F.col("sid") % 63
    word_masks = (
        doc_ids.groupBy("doc", word.alias("w"))
        .agg(
            F.sum(F.pow(F.lit(2.0), bit).cast("long")).alias("mask"),
            F.count(F.lit(1)).alias("bits"),
        )
    )
    # per-doc dense mask vector: aggregate (w, mask) pairs into a
    # fixed-width array
    masks = (
        word_masks.groupBy("doc")
        .agg(
            F.map_from_arrays(
                F.collect_list("w"), F.collect_list("mask")
            ).alias("wm"),
            F.sum("bits").alias("sz"),
        )
        .select(
            "doc",
            "sz",
            F.expr(
                f"transform(sequence(0, {n_words - 1}),"
                f" w -> coalesce(wm[w], 0L))"
            ).alias("mask"),
        )
    )
    # masks feeds both sides of the self-join: materialize the cache
    # first or the mask-building subtree computes twice
    masks = masks.cache()
    masks.count()
    a = masks.select(
        F.col("doc").alias("a"), F.col("sz").alias("sz_a"), F.col("mask").alias("ma")
    )
    b = masks.select(
        F.col("doc").alias("b"), F.col("sz").alias("sz_b"), F.col("mask").alias("mb")
    )
    t = F.lit(threshold)
    # unrolled popcount sum: left-associative like the equivalent fold,
    # but whole-stage-codegen-able with no per-pair lambda machinery —
    # this inner expression runs O(n²) times
    common = None
    for w in range(n_words):
        term = F.bit_count(
            F.element_at("ma", w + 1).bitwiseAND(F.element_at("mb", w + 1))
        )
        common = term if common is None else common + term
    return (
        a.join(
            F.broadcast(b),
            # size prefilter: jaccard ≥ t forces t·|B| ≤ |A| ≤ |B|/t
            (F.col("a") < F.col("b"))
            & (F.col("sz_a").cast("double") >= t * F.col("sz_b"))
            & (F.col("sz_b").cast("double") >= t * F.col("sz_a")),
        )
        .withColumn("common", common)
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def _jaccard_join(
    sh: DataFrame, threshold: float, max_shingle_df: int | None
) -> DataFrame:
    sh = sh.cache()
    if max_shingle_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle")
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc").alias("a"), "shingle")
    b = sh.select(F.col("doc").alias("b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc").alias("a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("b"), F.col("sz").alias("sz_b"))
    return (
        common.join(F.broadcast(sa), "a")
        .join(F.broadcast(sb), "b")
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 64,
) -> DataFrame:
    """MinHash signature per document: shingles → k universal affine
    permutations mod a 31-bit Mersenne prime → min per permutation;
    signature is an array<long>.

    Signature computation is embarrassingly parallel per document, so
    it runs as a **narrow** Arrow kernel (mapInPandas): no explode, no
    distinct, no shuffle — text in, a num_perm-long signature out.
    That is also the 100 TB shape: signatures stream out of the scan
    at input parallelism and only the (doc, signature) rows (tiny)
    continue into banding. Shingles for n=3 pack three codepoints into
    one int (a perfect hash); other n md5-hash within the kernel.
    Normalization matches char_shingles (lowercase, whitespace
    collapsed)."""
    import hashlib

    import numpy as np
    import pandas as pd

    a = np.array(
        [
            ((2 * i + 1) * 0x9E3779B97F4A7C15 % _MERSENNE_P) or 1
            for i in range(num_perm)
        ],
        dtype=np.int64,
    )
    b = np.array(
        [
            (i * 0xC2B2AE3D27D4EB4F + 0x165667B19E3779F9) % _MERSENNE_P
            for i in range(num_perm)
        ],
        dtype=np.int64,
    )
    code_m = 0x110000  # unicode codepoint space: 3 cps → unique int64

    def shingle_ids(text: str) -> "np.ndarray":
        norm = " ".join((text or "").lower().split())
        if len(norm) < n:
            return np.empty(0, dtype=np.int64)
        if n == 3:
            cps = np.frombuffer(
                norm.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            ids = cps[:-2] * (code_m * code_m) + cps[1:-1] * code_m + cps[2:]
        else:
            ids = np.array(
                [
                    int.from_bytes(
                        hashlib.md5(norm[i : i + n].encode()).digest()[:8],
                        "big",
                    )
                    >> 1  # keep positive in int64
                    for i in range(len(norm) - n + 1)
                ],
                dtype=np.int64,
            )
        return np.unique(ids) % _MERSENNE_P

    def kernel(batches):
        for pdf in batches:
            sigs = []
            for text in pdf[text_col]:
                ids = shingle_ids(text)
                if not len(ids):
                    sigs.append([int(_MERSENNE_P)] * num_perm)
                    continue
                # (n_shingles, num_perm): ids*a ≤ 2^31·2^31 < 2^63, safe
                m = (ids[:, None] * a[None, :]) % _MERSENNE_P
                m = (m + b[None, :]) % _MERSENNE_P
                sigs.append([int(v) for v in m.min(axis=0)])
            yield pd.DataFrame({"doc": pdf[id_col], "signature": sigs})

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        kernel, "doc long, signature array<long>"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH.

    bands=8 × rows=8 over 64 perms → collision prob ≈ 1-(1-j^8)^8
    (≈0.99 at j=0.9, ≈0.25 at j=0.6): tuned for the ≥0.8 near-dup
    regime — fewer, longer bands collapse the candidate set on
    high-baseline-similarity corpora (4-row bands admitted >50% of all
    pairs on the synthetic corpus; 8-row bands cut that ~5x with
    recall 1.0 on true ≥0.8 pairs). Candidates = docs sharing any
    band bucket (equi-join on band id + band hash — the scale path:
    shuffle keyed by bucket, never all-pairs); candidates are then
    *verified* with estimated jaccard = fraction of equal signature
    components, filtered at ``threshold``."""
    rows_per_band = num_perm // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_perm).cache()
    # eager materialization: sig feeds three plan branches (banding ×2
    # via the self-join, est-verify ×2); without forcing the cache
    # first, AQE races the branches and computes the full signature
    # pipeline repeatedly
    sig.count()
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[
                    F.col("signature")[i]
                    for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                ]
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    banded = sig.select(
        "doc", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc", "bb.band", "bb.bucket")
    # broadcast the (docs × bands)-row banded frame: pins a broadcast
    # hash join — without the hint AQE sometimes picks a sort-merge
    # plan for the self-join, 3-4x slower and run-to-run unstable
    cand = (
        banded.alias("x")
        .join(
            F.broadcast(banded.alias("y")),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(F.col("x.doc").alias("a"), F.col("y.doc").alias("b"))
        .distinct()
    )
    siga = sig.select(F.col("doc").alias("a"), F.col("signature").alias("sig_a"))
    sigb = sig.select(F.col("doc").alias("b"), F.col("signature").alias("sig_b"))
    # unrolled equal-component count (see dot_unrolled rationale)
    matches: F.Column | None = None
    for i in range(num_perm):
        term = F.when(
            F.element_at("sig_a", i + 1) == F.element_at("sig_b", i + 1), 1
        ).otherwise(0)
        matches = term if matches is None else matches + term
    est = matches / F.lit(float(num_perm))
    return (
        cand.join(F.broadcast(siga), "a")
        .join(F.broadcast(sigb), "b")
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("a", "b", "est_jaccard")
    )


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document over BPE-ish tokens: per-bit
    majority vote of token xxhash64s, as a bit-position aggregate —
    explode tokens → per-bit sums → reassemble. Whole pipeline is one
    aggregate; near-dup candidates are docs at small hamming distance."""
    tokens = df.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.expr(r"regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]', 0)")
        ).alias("tok"),
    )
    h = F.xxhash64("tok")
    # bit 63 as a python literal (1 << 63) doesn't fit a signed int64
    # lit — shift JVM-side instead
    one = F.lit(1).cast("long")
    bit_sums = [
        F.sum(
            F.when(h.bitwiseAND(F.shiftleft(one, i)) != 0, F.lit(1)).otherwise(
                F.lit(-1)
            )
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = tokens.groupBy("doc").agg(*bit_sums)
    sim = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.shiftleft(one, i)).otherwise(
            F.lit(0).cast("long")
        )
        sim = bit if sim is None else sim.bitwiseOR(bit)
    return agg.select("doc", sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 8
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance. Candidate blocking:
    split the 64-bit hash into 4 × 16-bit chunks — any pair within
    hamming ≤ 3 shares at least one exact chunk (pigeonhole); larger
    ``max_hamming`` still prunes most of the n² space. Scale path:
    equi-join per chunk, never all-pairs."""
    sig = simhash64(df, id_col, text_col).cache()
    chunks = sig.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("simhash", 16 * c)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select("doc", "simhash", "cc.chunk", "cc.key")
    cand = (
        chunks.alias("x")
        .join(
            chunks.alias("y"),
            (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(
            F.col("x.doc").alias("a"),
            F.col("y.doc").alias("b"),
            F.col("x.simhash").alias("ha"),
            F.col("y.simhash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine ≥
    threshold). Exact all-pairs — the small-scale baseline / verifier;
    the scale path is similarity.lsh_bucketed_pairs (hyperplane LSH)."""
    from raft_c_spark.operators.similarity import cosine_expr, vec_dim, with_norm

    dim = vec_dim(df, vec_col)
    v = with_norm(df, id_col, vec_col, dim)
    n_part = df.sparkSession.sparkContext.defaultParallelism
    a = v.repartition(n_part).select(
        F.col("doc").alias("a"), F.col("vec").alias("va"), F.col("norm").alias("na")
    )
    b = v.select(F.col("doc").alias("b"), F.col("vec").alias("vb"), F.col("norm").alias("nb"))
    return (
        # stream side repartitioned so the broadcast NLJ fans out over
        # all cores (a single-file scan is one partition → one task)
        a.crossJoin(F.broadcast(b))
        .filter(F.col("a") < F.col("b"))
        .withColumn("cosine", cosine_expr("va", "vb", "na", "nb", dim))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
