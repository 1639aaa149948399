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


# The r12 snapshot: every primary=True registration now outside the
# window — the whole r11 window (green in CORRECTNESS_r11, due back
# r15: the r7-tier re-greens, q175-q182, and the 28 r8-tier rows
# taken early) plus the r9/r10-tier queries not yet due. The r12
# rotation spends its slots on the 22 r8-tier coming-due re-greens
# and the 28 r11-optimized heavy rows whose post-change
# implementations the driver has not yet hash-verified (VERDICT r11
# item 2; see registry.py). If this assertion fires on a NEW name,
# either add the name to PRIMARY_ROTATION (ceding a slot) or register
# it primary=False.
EXPECTED_SHADOWED = frozenset({
    "q01_pricing_summary",
    "q03_top_revenue_orders",
    "q06_regional_revenue",
    "q07_in_case_when",
    "q08_string_ops",
    "q09_window_topk",
    "q10_argmin_first_event",
    "q11_sessionize",
    "q13_directly_follows",
    "q152_last_touch_attribution",
    "q153_frequent_paths",
    "q158_conformance_fitness",
    "q159_variant_table",
    "q168_hist_drift",
    "q170_pq_adc_topk",
    "q174_sitemap_census",
    "q175_crawl_compliance",
    "q176_crawl_schedule",
    "q177_recrawl_status",
    "q178_html_to_text",
    "q179_link_frontier",
    "q17_cte_ratio",
    "q180_frontier_expansion",
    "q181_warc_parse",
    "q182_html_meta",
    "q18_range_join_workload",
    "q19_theta_self_join",
    "q20_chunking",
    "q21_rolling_sequence",
    "q24_union_rekey",
    "q26_trace_subset",
    "q27_calendar_displacement",
    "q28_prioritization_pairs",
    "q29_range_join_bucketed",
    "q30_enabled_times",
    "q31_task_batches",
    "q32_batch_discovery_stats",
    "q33_waiting_time_decomposition",
    "q35_concurrency_pairs",
    "q36_activation_features",
    "q37_activation_rules",
    "q38_interval_sweep",
    "q40_dedup_exact",
    "q46_ann_ivf_topk",
    "q47_text_quality",
    "q49_token_count",
    "q51_multimodal_features",
    "q52_dedup_components",
    "q56_repetition_signals",
    "q57_pattern_counts",
    "q58_stratified_sample",
    "q59_token_shard_packing",
    "q61_event_blacklist",
    "q74_semantic_dedup",
    "q75_dedup_resolution",
    "q80_funnel_steps",
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
