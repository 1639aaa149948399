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


# The r11 snapshot: every primary=True registration now outside the
# window — the whole r10 window (green in CORRECTNESS_r10, due back
# r14), the r9-tier queries not yet due (due r13), and the 17
# deferred r8-tier window/statistics re-greens (due exactly at r12);
# the r11 rotation lends its slots to the 14 r7-due queries, the new
# M166 crawl-compliance facade (q175), and 35 of the r8 tier (see
# registry.py). If this assertion fires on a NEW name, either add the
# name to PRIMARY_ROTATION (ceding a slot) or register it
# primary=False.
EXPECTED_SHADOWED = frozenset({
    "q01_pricing_summary",
    "q07_in_case_when",
    "q11_sessionize",
    "q152_last_touch_attribution",
    "q153_frequent_paths",
    "q158_conformance_fitness",
    "q159_variant_table",
    "q163_containment_increment",
    "q164_ks_drift_quantized",
    "q166_hll_census",
    "q167_log_hist_quantiles",
    "q165_edjoin_increment",
    "q168_hist_drift",
    "q169_url_domain_census",
    "q170_pq_adc_topk",
    "q171_psl_registered_domain",
    "q172_url_governance",
    "q173_robots_governance",
    "q174_sitemap_census",
    "q26_trace_subset",
    "q27_calendar_displacement",
    "q28_prioritization_pairs",
    "q29_range_join_bucketed",
    "q30_enabled_times",
    "q32_batch_discovery_stats",
    "q33_waiting_time_decomposition",
    "q34_waiting_time_report",
    "q35_concurrency_pairs",
    "q36_activation_features",
    "q37_activation_rules",
    "q40_dedup_exact",
    "q41_dedup_minhash_lsh",
    "q42_dedup_simhash",
    "q43_dedup_ngram_jaccard",
    "q44_embedding_neardup",
    "q46_ann_ivf_topk",
    "q47_text_quality",
    "q48_lang_id",
    "q49_token_count",
    "q50_fingerprint",
    "q51_multimodal_features",
    "q52_dedup_components",
    "q53_corpus_filter",
    "q56_repetition_signals",
    "q57_pattern_counts",
    "q58_stratified_sample",
    "q59_token_shard_packing",
    "q60_winnowing_pairs",
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
