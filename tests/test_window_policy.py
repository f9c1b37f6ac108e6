"""Window-rotation policy guard (judge's round-7 ask #1).

Round 7 promoted ``mm_features`` into the driver's 50-query
verification window and then demoted it again in a *later pair of the
same batch*, so a query that had never had an all-green driver row
silently left the window before it could earn one. These tests make
that failure mode mechanical: they read the actual driver artifacts
(``CORRECTNESS_r*.json`` at the repo root) and assert the *net effect*
of ``_WINDOW_SWAPS`` keeps every never-driver-green query inside the
window — including brand-new queries that have no driver row at all.

The window size and the green-row parse come from
``raft_c_spark.plans.verification`` — the same module
``scripts/gen_driver_green.py`` uses, so the guard and the generated
COVERAGE audit cannot silently disagree.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from raft_c_spark.plans.verification import (
    WINDOW,
    correctness_artifacts,
    driver_green_rounds,
)

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def ordering() -> list[str]:
    from raft_c_spark.plans.registry import all_queries

    return list(all_queries())


def test_artifacts_present():
    # If the driver artifacts ever move, the policy tests below would
    # vacuously pass (everything looks never-green ... but then the
    # in-window assertion would fire). Guard the precondition.
    assert correctness_artifacts(REPO), (
        "no CORRECTNESS_r*.json artifacts at repo root"
    )


def test_never_driver_green_queries_are_in_window(ordering):
    """Every registered query lacking an all-green driver row in ANY
    round's artifact must sit inside the first-WINDOW slots of the
    CURRENT net ordering — this is the invariant the r7 same-batch
    promote+demote of mm_features violated. New queries (no driver
    row yet) are covered too: they must enter the window immediately.
    """
    green = driver_green_rounds(REPO)
    window = set(ordering[:WINDOW])
    never_green = [q for q in ordering if not green.get(q)]
    out_of_window = [q for q in never_green if q not in window]
    assert not out_of_window, (
        "never-driver-green queries outside the verification window: "
        f"{out_of_window}"
    )


def test_no_red_query_promoted_then_demoted(ordering):
    """A query that appears as the promoted member of some swap pair
    and is still driver-red must not ALSO appear as the demoted member
    of a later pair — the net effect silently un-verifies it."""
    from raft_c_spark.plans.registry import _WINDOW_SWAPS

    green = driver_green_rounds(REPO)
    promoted_at = {}
    violations = []
    for i, (out_q, in_q) in enumerate(_WINDOW_SWAPS):
        if in_q not in promoted_at:
            promoted_at[in_q] = i
        if out_q in promoted_at and not green.get(out_q):
            # demoting a still-red query that an earlier pair promoted
            # is only acceptable if a later pair re-promotes it AND the
            # net ordering keeps it in-window (checked above); flag the
            # pattern unless a later re-promotion exists.
            later = any(b == out_q for _, b in _WINDOW_SWAPS[i + 1 :])
            if not later:
                violations.append((out_q, i))
    assert not violations, (
        "driver-red queries promoted then demoted with no later "
        f"re-promotion: {violations}"
    )


def test_no_stale_demoted_green_claims(ordering):
    """Freshness bound (judge r8 ask #5): a demoted-green claim decays
    as the code under it keeps changing, so no OUT-of-window query's
    newest driver row may be more than ``STALE_AFTER`` rounds behind
    the newest artifact — the r9 rotation cleared the r1/r2/r4 backlog
    and this keeps the debt from re-accumulating (each round's swap
    batch must rotate the aging tail back through the window)."""
    from raft_c_spark.plans.verification import stale_out_of_window

    stale = stale_out_of_window(REPO, ordering)
    assert not stale, (
        "out-of-window queries whose newest driver row is stale "
        f"(> STALE_AFTER rounds old): {stale} — rotate them back into "
        "the window via registry._WINDOW_SWAPS"
    )


def test_swap_members_resolve(ordering):
    from raft_c_spark.plans.registry import _WINDOW_SWAPS, SKIPPED_SWAPS

    names = set(ordering)
    missing = [
        p for p in _WINDOW_SWAPS if p[0] not in names or p[1] not in names
    ]
    assert not missing, f"swap pairs with unresolved names: {missing}"
    assert not SKIPPED_SWAPS
