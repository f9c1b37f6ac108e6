"""Round-12 staged operator: PSI distribution drift
(operators/sampling.psi_drift; staged for r13 registration in
plans/sampling.py — the text_compression staging pattern: fully
built, oracle-tested through the driver's own compare, NOT yet in
the registry)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from raft_c_spark.operators import sampling


def _psi(spark, rows_a, rows_b, width=10, n_bins=5, min_p=1e-6):
    a = spark.createDataFrame(rows_a, "v long")
    b = spark.createDataFrame(rows_b, "v long")
    return sampling.psi_drift(a, b, "v", width, n_bins, min_p).collect()


def _brute(rows_a, rows_b, width=10, n_bins=5, min_p=1e-6):
    from collections import Counter

    def binned(rows):
        return Counter(
            min(max(v, 0) // width, n_bins - 1) for (v,) in rows
        )
    ca, cb = binned(rows_a), binned(rows_b)
    ta, tb = sum(ca.values()), sum(cb.values())
    out = {}
    for bin_ in sorted(set(ca) | set(cb)):
        pa = max(ca.get(bin_, 0) / ta, min_p)
        pb = max(cb.get(bin_, 0) / tb, min_p)
        out[bin_] = round((pa - pb) * math.log(pa / pb), 8)
    return out, round(sum(out.values()), 8)


def test_psi_identical_distributions_is_zero(spark):
    rows = [(i % 40,) for i in range(200)]
    got = _psi(spark, rows, rows)
    assert all(r["psi_term"] == 0.0 for r in got)
    assert got[0]["psi_total"] == 0.0


def test_psi_matches_brute_python(spark):
    rows_a = [(i * 7 % 55,) for i in range(300)]
    rows_b = [(i * 11 % 45 + 5,) for i in range(200)]
    got = _psi(spark, rows_a, rows_b)
    terms, total = _brute(rows_a, rows_b)
    assert {r["bin"]: r["psi_term"] for r in got} == pytest.approx(terms)
    assert got[0]["psi_total"] == pytest.approx(total)


def test_psi_empty_bin_uses_floor_not_inf(spark):
    # bin 0 exists only in A; min_p floors B's proportion, so the
    # term is large-but-finite and positive
    rows_a = [(1,)] * 50 + [(25,)] * 50
    rows_b = [(25,)] * 100
    got = {r["bin"]: r for r in _psi(spark, rows_a, rows_b)}
    assert 0 in got and got[0]["n_b"] == 0
    assert math.isfinite(got[0]["psi_term"]) and got[0]["psi_term"] > 0


def test_psi_clamps_negatives_and_tail(spark):
    # negative values clamp into bin 0; values past the last edge
    # clamp into bin n_bins-1
    rows_a = [(-5,), (3,), (999,)]
    rows_b = [(0,), (9,), (49,)]
    got = {r["bin"]: (r["n_a"], r["n_b"])
           for r in _psi(spark, rows_a, rows_b)}
    assert got == {0: (2, 2), 4: (1, 1)}


def test_psi_validation(spark):
    a = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError):
        sampling.psi_drift(a, a, "v", 0)
    with pytest.raises(ValueError):
        sampling.psi_drift(a, a, "v", 10, n_bins=1)


def test_psi_detects_planted_shift(spark):
    # shifted distribution must read far above the identical case's 0
    rows_a = [(i % 50,) for i in range(500)]
    rows_b = [(i % 50 + 30,) for i in range(500)]
    got = _psi(spark, rows_a, rows_b)
    assert got[0]["psi_total"] > 0.25  # "shifted" on the standard scale


def test_psi_plan_quality(spark, sf_dir):
    """Corpus rows must never shuffle: every hashpartitioning
    exchange keys on `bin` (a <= n_bins-row frame — its SortMergeJoin
    is free), the two crossJoins are 1-row broadcasts, no window, no
    Python. The joined bin frame persists, so the corpus lineage
    appears ONCE (InMemoryRelation), not once per consumer."""
    import re

    from raft_c_spark.plans.sampling import q_ds_psi_drift

    plan = q_ds_psi_drift(
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "Python" not in plan, plan
    assert "InMemoryTableScan" in plan, plan
    for part in re.findall(r"Exchange hashpartitioning\(([a-zA-Z_]+)", plan):
        assert part == "bin", plan


def test_psi_oracle_parity(spark, duck, sf_dir):
    from raft_c_spark.plans.sampling import (
        PSI_DRIFT_ORACLE_SQL,
        q_ds_psi_drift,
    )
    from tests.harness import assert_matches_oracle

    assert_matches_oracle(
        q_ds_psi_drift(spark, sf_dir), duck, PSI_DRIFT_ORACLE_SQL,
        "ds_psi_drift",
    )
