"""Driver-facing deduplication queries over ``documents`` and
``embeddings``.

Oracle coverage:
- exact dedup + n-gram Jaccard: fully SQL-expressible (DuckDB list
  comprehension builds the same shingle sets; jaccard is int/int
  division — bit-identical);
- MinHash-LSH + SimHash: hash-function-dependent (xxhash64 has no
  DuckDB equivalent) → rows-only driver check; their *quality* is
  verified in tests/test_dedup.py against the exact-Jaccard oracle
  (recall on the ≥0.8 planted near-dup pairs).
"""

from __future__ import annotations

from raft_c_spark.operators import dedup
from raft_c_spark.sources.testdata import load_table

JACCARD_THRESHOLD = 0.8
COSINE_THRESHOLD = 0.30  # driver embeddings are random; ~top-of-distribution


def q_dedup_exact_groups(spark, sf_dir):
    """Exact-content groups (normalized text): survivor id + group
    size. One hash aggregate — the linear-scale dedup primitive."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import functions as F

    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return (
        docs.select(F.col("doc_id"), F.md5(norm.cast("binary")).alias("content_key"))
        .groupBy("content_key")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min("doc_id").alias("keep_id"),
        )
    )


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard near-dup pairs at ≥ 0.8 — the quadratic
    baseline/verifier (the scale path is the LSH variant below)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=JACCARD_THRESHOLD
    )


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash(64)+LSH(8 bands of 8 rows) near-dup candidates at estimated
    jaccard ≥ 0.8 — the 100 TB path (bucket-join, not all-pairs).
    Rows-only driver check; recall vs exact Jaccard tested in
    tests/test_dedup.py."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_perm=64, bands=8,
        threshold=JACCARD_THRESHOLD,
    )


def q_dedup_simhash(spark, sf_dir):
    """SimHash-64 near-dup pairs at hamming ≤ 6 with 16-bit-chunk
    blocking. Rows-only driver check."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_pairs(docs, "doc_id", "text", max_hamming=6)


def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs ≥ 0.30 (driver embeddings are
    random vectors — no planted dups, so the threshold sits at the top
    of the cosine distribution). Cosine is a sequential double fold —
    mirrored exactly by the oracle's list comprehension."""
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.embedding_neardup_pairs(
        emb, "vec_id", "embedding", threshold=COSINE_THRESHOLD
    )


def q_dedup_embedding_lsh(spark, sf_dir):
    """Hyperplane-LSH embedding pair-dedup — the 100 TB path (bucket
    equi-join candidates + exact-cosine verify; never all-pairs).
    Driver embeddings are uniform-random (near-orthogonal, max pair
    cosine ≈ 0.60, no planted near-dups) — a hostile regime for LSH —
    so the query runs at 0.40 (920 true pairs at sf0.1) with short
    signatures: per-pair recall ≈ 1-(1-0.63⁴)¹² ≈ 0.87. The
    operator's real win region (threshold ≥ 0.9, bits=10, recall
    ≈ 0.97 with far fewer candidates) is recall-pinned against exact
    all-pairs on planted duplicates in tests/test_text_similarity.py.
    Rows-only driver check (hyperplane-dependent candidate set)."""
    from raft_c_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_bucketed_pairs(
        emb, "vec_id", "embedding", threshold=0.40, bits=4, tables=12,
    )


def q_dedup_components(spark, sf_dir):
    """Near-dup clusters: connected components over the exact
    embedding pair graph — the step after pair generation in every
    dedup pipeline (cluster → keep one survivor per component).
    Iterative min-label propagation (joins + aggregates only);
    deterministic, so the oracle recomputes it as recursive-CTE
    reachability."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = dedup.embedding_neardup_pairs(
        emb, "vec_id", "embedding", threshold=COSINE_THRESHOLD
    )
    return dedup.connected_components(pairs)


QUERIES = {
    "dedup_exact_groups": q_dedup_exact_groups,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding": q_dedup_embedding,
    "dedup_embedding_lsh": q_dedup_embedding_lsh,
    "dedup_components": q_dedup_components,
}

_NORM = r"lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"

_SHINGLES = f"""
    SELECT DISTINCT doc_id AS doc, s AS shingle FROM (
        SELECT doc_id,
               unnest([substring(t, i, 3)
                       FOR i IN range(1, greatest(length(t) - 1, 1))]) AS s
        FROM (SELECT doc_id, {_NORM} AS t FROM documents)
    )
"""

_DOT = (
    "list_sum([CAST(va.embedding[i] AS DOUBLE) * CAST(vb.embedding[i] AS DOUBLE)"
    " FOR i IN range(1, len(va.embedding) + 1)])"
)
_NORM_A = (
    "sqrt(list_sum([CAST(va.embedding[i] AS DOUBLE) * CAST(va.embedding[i] AS DOUBLE)"
    " FOR i IN range(1, len(va.embedding) + 1)]))"
)
_NORM_B = (
    "sqrt(list_sum([CAST(vb.embedding[i] AS DOUBLE) * CAST(vb.embedding[i] AS DOUBLE)"
    " FOR i IN range(1, len(vb.embedding) + 1)]))"
)

ORACLES = {
    "dedup_exact_groups": f"""
        SELECT md5({_NORM}) AS content_key,
               COUNT(*) AS dup_count,
               MIN(doc_id) AS keep_id
        FROM documents
        GROUP BY content_key
    """,
    "dedup_ngram_jaccard": f"""
        WITH sh AS ({_SHINGLES}),
        sizes AS (SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc),
        common AS (
            SELECT x.doc AS a, y.doc AS b, COUNT(*) AS c
            FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc < y.doc
            GROUP BY x.doc, y.doc
        )
        SELECT a, b,
               CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc = a
        JOIN sizes sb ON sb.doc = b
        WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= {JACCARD_THRESHOLD}
    """,
    "dedup_embedding": f"""
        SELECT va.vec_id AS a, vb.vec_id AS b,
               {_DOT} / ({_NORM_A} * {_NORM_B}) AS cosine
        FROM embeddings va, embeddings vb
        WHERE va.vec_id < vb.vec_id
          AND {_DOT} / ({_NORM_A} * {_NORM_B}) >= {COSINE_THRESHOLD}
    """,
    # components = reachability fixpoint over the same exact pair
    # graph; min-over-reachable equals the label-propagation result
    "dedup_components": f"""
        WITH RECURSIVE pairs AS (
            SELECT va.vec_id AS a, vb.vec_id AS b
            FROM embeddings va, embeddings vb
            WHERE va.vec_id < vb.vec_id
              AND {_DOT} / ({_NORM_A} * {_NORM_B}) >= {COSINE_THRESHOLD}
        ),
        edges AS (
            SELECT a AS src, b AS dst FROM pairs
            UNION
            SELECT b AS src, a AS dst FROM pairs
        ),
        reach AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        )
        SELECT src AS doc, LEAST(src, MIN(dst)) AS component
        FROM reach GROUP BY src
    """,
    # dedup_minhash_lsh / dedup_simhash: intentionally no oracle —
    # xxhash64-dependent; driver records rows-only, tests verify recall
}
