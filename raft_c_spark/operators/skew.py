"""Skew-handling aggregation: two-stage salted aggregates.

A groupBy on a hot key concentrates one reducer; AQE's skew handling
covers joins but a straight hash aggregate on a pathological key
distribution still funnels each key's partials to one task. Salting
splits every key into ``n_salts`` subkeys for the first (wide) stage,
then a cheap second stage over n_keys × n_salts rows merges partials.

Only algebraic aggregates decompose this way; the supported set maps
each to its (partial, merge) pair — avg decomposes as (sum, count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """``aggs``: out_name → (fn, col) with fn in
    sum/count/min/max/avg. Example::

        salted_agg(ev, ["event_type"],
                   {"n": ("count", "*"), "avg_v": ("avg", "value")})
    """
    salt = (F.rand(seed=7) * n_salts).cast("int").alias("_salt")
    stage1_cols: list[Column] = []
    stage2_cols: list[Column] = []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            stage1_cols.append(F.count(F.lit(1)).alias(f"_{name}_cnt"))
            stage2_cols.append(F.sum(f"_{name}_cnt").alias(name))
        elif fn == "sum":
            stage1_cols.append(F.sum(col).alias(f"_{name}_sum"))
            stage2_cols.append(F.sum(f"_{name}_sum").alias(name))
        elif fn == "min":
            stage1_cols.append(F.min(col).alias(f"_{name}_min"))
            stage2_cols.append(F.min(f"_{name}_min").alias(name))
        elif fn == "max":
            stage1_cols.append(F.max(col).alias(f"_{name}_max"))
            stage2_cols.append(F.max(f"_{name}_max").alias(name))
        elif fn == "avg":
            stage1_cols.append(F.sum(col).alias(f"_{name}_sum"))
            stage1_cols.append(F.count(col).alias(f"_{name}_cnt"))
            stage2_cols.append(
                (F.sum(f"_{name}_sum") / F.sum(f"_{name}_cnt")).alias(name)
            )
        else:
            raise ValueError(f"non-decomposable aggregate {fn!r}")
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*stage1_cols)
    return partial.groupBy(*keys).agg(*stage2_cols)
