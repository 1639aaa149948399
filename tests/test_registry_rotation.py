"""Rotation-window invariants (ADVICE r4, registry.py item).

While ``PRIMARY_ROTATION`` is set, the per-call ``primary=`` flag does
not control driver-window membership. These tests make that explicit:
the window is exactly 50 names, every rotation name resolves to a
registered builder with an oracle, and the set of ``primary=True``
registrations the rotation shadows is pinned to a reviewed snapshot —
adding a new ``@query(..., primary=True)`` without touching the
rotation fails here with instructions instead of silently never
reaching the driver.
"""

from __future__ import annotations

import importlib

import pytest


@pytest.fixture(scope="module", autouse=True)
def _load_plans():
    from batch_processing_analysis_spark.plans import registry  # noqa: F401

    for m in ("queries_relational", "queries_eventlog", "queries_text",
              "queries_canary"):
        importlib.import_module(f"batch_processing_analysis_spark.plans.{m}")


def _registry():
    from batch_processing_analysis_spark.plans import registry

    return registry


def test_window_is_exactly_50():
    reg = _registry()
    assert len(reg.QUERIES) == 50, (
        f"driver correctness window must be exactly 50 queries, got "
        f"{len(reg.QUERIES)} — adjust PRIMARY_ROTATION"
    )


def test_rotation_names_all_registered():
    reg = _registry()
    if reg.PRIMARY_ROTATION is None:
        pytest.skip("rotation disabled")
    missing = reg.PRIMARY_ROTATION - set(reg.QUERIES)
    assert not missing, f"rotation names never registered: {sorted(missing)}"


def test_every_window_query_has_oracle():
    reg = _registry()
    missing = [n for n in reg.QUERIES if n not in reg.ORACLES]
    assert not missing, f"window queries without oracle: {missing}"


# The r7 snapshot: steady-state primary=True queries whose slot the
# rotation currently lends to the 28 r3-tier re-greens, the Pass-Join
# re-green, the new q163/q164, and the oldest r4-tier refresh. Every
# name below has a driver-green row within the 4-round staleness
# budget (r5 greens q11/q28/q50, r6 greens for the rest — see
# tools/rotation_check.py --plan). If this assertion fires on a NEW
# name, either add the name to PRIMARY_ROTATION (ceding a slot from
# the multi-green tier) or register it primary=False.
EXPECTED_SHADOWED = frozenset({
    # r5-green family extras (q11 is the entry() flagship, smoke-run
    # by the driver every round regardless)
    "q11_sessionize", "q28_prioritization_pairs", "q50_fingerprint",
    # multi-green family representatives + r6-refreshed tier, ceded to
    # the r7 staleness window; due back on the budget schedule
    "q01_pricing_summary", "q07_in_case_when", "q26_trace_subset",
    "q27_calendar_displacement", "q29_range_join_bucketed",
    "q30_enabled_times", "q34_waiting_time_report",
    "q37_activation_rules", "q41_dedup_minhash_lsh",
    "q44_embedding_neardup", "q51_multimodal_features",
    "q53_corpus_filter", "q58_stratified_sample",
    "q59_token_shard_packing", "q60_winnowing_pairs",
    "q61_event_blacklist", "q74_semantic_dedup",
    "q75_dedup_resolution", "q80_funnel_steps",
    # r6 first-checks registered primary=True, green in
    # CORRECTNESS_r06, ceded back after one round
    "q152_last_touch_attribution", "q153_frequent_paths",
    "q158_conformance_fitness", "q159_variant_table",
})


def test_shadowed_primaries_are_pinned():
    reg = _registry()
    if reg.PRIMARY_ROTATION is None:
        pytest.skip("rotation disabled")
    unexpected = reg.ROTATION_SHADOWED - EXPECTED_SHADOWED
    assert not unexpected, (
        f"primary=True registrations excluded from the driver window by "
        f"PRIMARY_ROTATION: {sorted(unexpected)}. Add them to the "
        f"rotation (or register primary=False) and update this snapshot."
    )
    # a shrinking shadow set means the rotation was edited — keep the
    # snapshot honest in that direction too
    stale = EXPECTED_SHADOWED - reg.ROTATION_SHADOWED
    assert not stale, f"snapshot lists names no longer shadowed: {sorted(stale)}"
