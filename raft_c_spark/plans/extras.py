"""Queries deliberately registered BEHIND the driver's 50-query
correctness window (see registry._modules): driver-rows-only checks
whose window slots are better spent on hash-oracled queries. Each is
fully pinned by pytest (tests/test_text_similarity.py)."""

from __future__ import annotations

from raft_c_spark.plans.multimodal import q_mm_features, q_mm_frame_index
from raft_c_spark.plans.semistructured import q_ev_approx_profile
from raft_c_spark.plans.similarity import q_sim_topk_ivf

QUERIES = {
    "sim_topk_ivf": q_sim_topk_ivf,
    "mm_features": q_mm_features,
    "mm_frame_index": q_mm_frame_index,
    "ev_approx_profile": q_ev_approx_profile,
}

ORACLES: dict[str, str] = {}
