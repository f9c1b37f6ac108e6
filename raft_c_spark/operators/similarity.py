"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the baseline and the
  verifier. One scan, no shuffle for a single query (the query vector
  is a literal folded into codegen); per-batch queries broadcast the
  query set.
- ``lsh_bucketed_topk``: random-hyperplane LSH — the 100 TB path:
  candidates come from an equi-join on bucket signature, so cost
  scales with bucket density, not corpus size. Probing multiple
  signatures (multi-probe) trades recall for speed.

All dot products are built-in higher-order functions (zip_with +
aggregate over doubles, sequential fold — deterministic), no UDFs.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_norm(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Project to (doc, vec: array<double>, norm). Casting float→double
    once up front keeps later arithmetic deterministic."""
    vec = F.expr(f"transform({vec_col}, x -> cast(x as double))")
    return df.select(
        F.col(id_col).alias("doc"), vec.alias("vec")
    ).withColumn(
        "norm",
        F.sqrt(
            F.expr("aggregate(vec, cast(0.0 as double), (acc, x) -> acc + x * x)")
        ),
    )


def cosine_expr(va: str, vb: str, na: str, nb: str) -> Column:
    dot = F.expr(
        f"aggregate(zip_with({va}, {vb}, (x, y) -> x * y),"
        f" cast(0.0 as double), (acc, v) -> acc + v)"
    )
    return dot / (F.col(na) * F.col(nb))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against one query vector. The query is a
    plan-time literal array; ranking is a single orderBy-limit (Spark
    executes it as a per-partition top-k + merge — no full sort)."""
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    v = with_norm(df, id_col, vec_col)
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    dot = F.expr(
        "aggregate(zip_with(vec, qvec, (x, y) -> x * y),"
        " cast(0.0 as double), (acc, v) -> acc + v)"
    )
    return (
        v.withColumn("qvec", qlit)
        .withColumn("cosine", dot / (F.col("norm") * F.lit(qnorm)))
        .select("doc", "cosine")
        .orderBy(F.desc("cosine"), F.asc("doc"))
        .limit(k)
    )


def _hyperplane(dim: int, bit: int, seed: int = 42) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: a fixed
    integer hash per (bit, component) mapped to [-1, 1]. No RNG state —
    reproducible across runs/engines."""
    out = []
    for j in range(dim):
        h = (bit * 1_000_003 + j * 7919 + seed) * 0x9E3779B97F4A7C15 % (1 << 63)
        out.append((h / float(1 << 62)) - 1.0)
    return out


def lsh_signature(vec_col: str, dim: int, bits: int = 16, seed: int = 42) -> Column:
    """Random-hyperplane signature: bit i = sign(<v, h_i>), packed into
    an int. The planes ride along as a literal array<array<double>> and
    the whole signature is higher-order-function arithmetic — constant
    codegen size regardless of dim×bits (an unrolled expression tree
    blows past janino's method limit)."""
    planes = F.array(
        *[
            F.array(*[F.lit(v) for v in _hyperplane(dim, i, seed)])
            for i in range(bits)
        ]
    )
    v = F.expr(f"transform({vec_col}, x -> cast(x as double))")
    bit_arr = F.transform(
        planes,
        lambda p: F.when(
            F.aggregate(
                F.zip_with(v, p, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, val: acc + val,
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return F.aggregate(
        F.zip_with(
            bit_arr,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            # F.shiftleft needs a literal shift count; 2^i via pow is
            # exact in double far beyond any plausible bit count
            lambda b, i: (b * F.pow(F.lit(2.0), i)).cast("int"),
        ),
        F.lit(0),
        lambda acc, val: acc + val,
    )


def query_signature(query_vec: list[float], bits: int, seed: int) -> int:
    """Driver-side signature of a query vector — the same formula as
    lsh_signature (sequential double dot product, sign bit)."""
    qsig = 0
    for i in range(bits):
        plane = _hyperplane(len(query_vec), i, seed)
        if sum(float(query_vec[j]) * plane[j] for j in range(len(query_vec))) > 0:
            qsig |= 1 << i
    return qsig


def lsh_bucketed_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    tables: int = 16,
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH: ``tables``
    independent ``bits``-bit signatures; a vector is a candidate if it
    shares the query's bucket in ANY table (standard L-tables LSH —
    recall for a pair at angle θ is 1-(1-(1-θ/π)^bits)^tables, ≈1.0
    for near-duplicates at these defaults). Exact cosine ranking runs
    on the candidate set only.

    At 100 TB the signatures are precomputed stored columns and each
    table is a bucketed layout: the probe reads ``tables`` buckets,
    never the corpus."""
    dim = len(query_vec)
    sigs = F.array(
        *[lsh_signature(vec_col, dim, bits, seed=1000 + t) for t in range(tables)]
    )
    qsigs = F.array(
        *[F.lit(query_signature(query_vec, bits, seed=1000 + t)) for t in range(tables)]
    )
    hit = F.exists(F.zip_with(sigs, qsigs, lambda s, q: s == q), lambda b: b)
    cand = df.filter(hit)
    return cosine_topk(cand, query_vec, k, id_col, vec_col)
