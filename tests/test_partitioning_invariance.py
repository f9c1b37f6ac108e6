"""Partitioning-invariance: query results must be identical under
different shuffle-partition counts. The verification driver builds its
own session with its own parallelism, so any plan whose result depends
on partitioning (float sum order, unstable top-k ties, prefix sums
that assume a layout) would pass locally and fail there. Decimal
aggregates, hash-keyed sampling, total-order tie-breaks and the
two-phase prefix sum are the mechanisms under test.
"""

from __future__ import annotations

import pytest

from raft_c_spark.plans.registry import all_queries
from tests.harness import df_rows

SF_DIR = "/root/testdata/sf0.001"

#: one representative per risk class
CASES = [
    "tpch_pricing_summary",   # decimal-exact aggregate sums
    "ts_sample_1h",           # bucketed avg over the points frame
    "ds_pack_sequences",      # distributed prefix sum
    "ds_source_topk",         # windowed top-k tie-breaks
    "ev_rolling_zscore",      # cumsum-difference window frames
    "dedup_ngram_jaccard",    # Arrow-kernel bitmap path
    "text_repetition",        # per-row higher-order expressions
    "ds_decontaminate",       # broadcast gram filter + count distinct
    "ds_bloom_decontaminate", # broadcast bit-probe kernel + count distinct
    "text_quality_model",     # integer weight sums (order-independent)
    "ds_snapshot_diff",       # full-outer equi-join classification
    "sim_topk_ivf",           # sample fit + kernel assignment + top-k ties
    "ev_approx_profile",      # sketch merge-order robustness (booleans)
    "ts_sample_fill",         # generated grid + carry-forward window
    "ds_pipeline_e2e",        # five chained stages end-to-end
    "dedup_best_survivor",    # components + windowed argmax ties
    # -- round-8 additions --
    "ds_importance_dsir",     # decimal log-ratio sums + bucket counts
    "ds_dsir_resample",       # Gumbel-key top-k tie-breaks
    "lang_retention",         # store build + dedup policy + retention read
    "dedup_repeated_spans",   # persisted key set + gaps-and-islands
    "ds_dataset_card",        # CUBE grouping-id aggregate
]


@pytest.mark.parametrize("name", CASES)
def test_result_invariant_to_shuffle_partitions(spark, name):
    qs = all_queries()
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "32")
        a = df_rows(qs[name](spark, SF_DIR))
        spark.conf.set(key, "7")
        b = df_rows(qs[name](spark, SF_DIR))
    finally:
        spark.conf.set(key, prev)
    assert a == b, f"{name}: results differ between 32 and 7 shuffle partitions"
