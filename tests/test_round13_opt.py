"""Round-13 optimization pins: the internals the optimization round
changed must stay result-identical to the shapes they replaced.

- vec_dim's session memo returns the probed dim and invalidates when
  the underlying file is rewritten;
- _vec_norm_exprs (the rerank-after-join arithmetic) is bit-identical
  to with_norm's projection;
- pack_sequences' expensive-lineage pre-checkpoint path yields exactly
  the windowed-cumsum ground truth (same as the scan path).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_vec_dim_memo_and_invalidation(spark, tmp_path):
    from raft_c_spark.operators import similarity as S

    p = str(tmp_path / "emb.parquet")
    spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [4.0, 5.0, 6.0])],
        "vec_id long, embedding array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    assert S.vec_dim(df, "embedding") == 3
    # memo hit returns the same value for a fresh frame over the files
    assert S.vec_dim(spark.read.parquet(p), "embedding") == 3
    # rewrite the path with a different dim: the (size, mtime) in the
    # memo key must invalidate the entry
    spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0, 5.0])],
        "vec_id long, embedding array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(p)
    assert S.vec_dim(spark.read.parquet(p), "embedding") == 5
    # frames with no input files (local relations) still probe
    loc = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    assert S.vec_dim(loc, "embedding") == 2


def test_vec_norm_exprs_matches_with_norm(spark):
    """The factored-out (vec, norm) expressions must produce doubles
    bit-identical to with_norm's projection — the rerank paths apply
    them AFTER a candidate join and any drift would be a driver hash
    mismatch."""
    from raft_c_spark.operators.similarity import (
        _vec_norm_exprs,
        with_norm,
    )

    df = spark.createDataFrame(
        [
            (1, [0.1, -0.25, 3.5]),
            (2, [1e-12, 2e9, -0.0]),
            (3, [7.25, 0.125, -2.5]),
        ],
        "vec_id long, embedding array<double>",
    )
    want = {
        r["doc"]: (r["vec"], r["norm"])
        for r in with_norm(df, "vec_id", "embedding", dim=3).collect()
    }
    vec, norm = _vec_norm_exprs("embedding", "vec_id", 3)
    got = {
        r["doc"]: (r["vec"], r["norm"])
        for r in df.select(
            F.col("vec_id").alias("doc"), vec.alias("vec"), norm.alias("norm")
        ).collect()
    }
    assert got == want  # exact equality, not approx


def test_pack_sequences_expensive_lineage_identical(spark):
    """pack_sequences must produce the identical assignment whether
    its input is a bare local frame (no pre-checkpoint) or an
    aggregate (expensive lineage → pre-materialized once): the pack
    result is a pure function of (id, length)."""
    from raft_c_spark.operators.sampling import (
        _expensive_lineage,
        pack_sequences,
    )

    rows = [(i, 100 + (i * 37) % 400) for i in range(200)]
    base = spark.createDataFrame(rows, "doc_id long, n_chars long")
    # an aggregate wrapper that is a row-for-row identity
    agg = base.groupBy("doc_id").agg(F.max("n_chars").alias("n_chars"))
    assert not _expensive_lineage(base)
    assert _expensive_lineage(agg)

    def packed(frame):
        return sorted(
            (r["doc_id"], r["seq_start"], r["bin"], r["bin_offset"])
            for r in pack_sequences(frame, "doc_id", "n_chars", 512).collect()
        )

    got_plain, got_agg = packed(base), packed(agg)
    assert got_plain == got_agg
    # ground truth: windowed cumsum in id order
    acc, want = 0, []
    for i, n in rows:
        want.append((i, acc, acc // 512, acc % 512))
        acc += n
    assert got_plain == want


@pytest.mark.parametrize("shape", ["join", "mapInPandas"])
def test_expensive_lineage_detects_kernels(spark, shape):
    from raft_c_spark.operators.sampling import _expensive_lineage

    a = spark.createDataFrame([(1, 2)], "k long, v long")
    if shape == "join":
        frame = a.join(a.withColumnRenamed("v", "w"), "k")
    else:
        frame = a.mapInPandas(lambda it: it, "k long, v long")
    assert _expensive_lineage(frame)
