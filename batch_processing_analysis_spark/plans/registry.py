"""Query registry: name → (spark builder, optional DuckDB oracle SQL).

Every operator the engine claims (SURVEY §2) registers a demonstration
query here; ``__spark_entry__`` re-exports the registry to the driver.

Determinism rules (the driver hash-compares values):
- computed doubles are ``round()``-ed explicitly (2dp money, 6dp ratios)
  in BOTH dialects; raw parquet doubles pass through untouched;
- timestamps are emitted as epoch seconds (bigint) — Spark
  ``unix_timestamp`` ≡ DuckDB ``CAST(floor(epoch(ts)) AS BIGINT)``;
- every top-k / limit has a unique-key tiebreak in the ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkBuilder = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkBuilder] = {}
ORACLES: dict[str, str] = {}

# Secondary registry: single-primitive demo queries whose operator is
# ALSO exercised by a primary composite query. The driver's correctness
# gate checks at most 50 queries (in registration order) — r2 dropped
# the 8 tail-registered text-family flagships — so the exported
# ``queries()`` surface is capped at 50 primaries covering every
# SURVEY §2 family, and these extras are verified by pytest
# (tests/test_extra_queries.py) and tools/verify_queries.py --extra
# against the same DuckDB oracles instead.
EXTRA_QUERIES: dict[str, SparkBuilder] = {}
EXTRA_ORACLES: dict[str, str] = {}

# Round-9 rotation (VERDICT r8 task 2). 50 slots, built from
# tools/rotation_check.py --plan (budget arithmetic lives in THAT
# module's docstring: registered minus the 8 allowlisted environment
# canaries, over 50 slots, makes a ~3.2-round refresh floor, hence the
# 4-round budget):
# - the 8 queries the r8 --plan listed as coming due (newest green r5,
#   due at r9 close): q11, q28, q136-q141;
# - q168_hist_drift, the round's new never-green M153 query (must be
#   in the window per rotation_check);
# - 39 of the 49 r6-tier queries (newest green r6, due at r10 close)
#   taken a round early so the r10 window has room for the 50-strong
#   r7 tier that follows; the 10 deferred are the cheap relational
#   basics (q01/q02/q04/q05/q07/q14/q15/q16, plus q22/q23 ceded
#   mid-round to the new q169/q170 — fast re-greens that fit any
#   window), due exactly at r10 where --plan will list them.
# Rotated OUT: the whole r8 window (every row green in
# CORRECTNESS_r08, due back r12). q116_canary_hugeint_probe stays
# RETIRED in the extras registry (designed-red HUGEINT probe,
# DRIVER_ENV.md) and all 8 canaries are budget-allowlisted in
# rotation_check.py. Set to None to fall back to the per-call flags.
PRIMARY_ROTATION: frozenset[str] | None = frozenset({
    # r5-tier staleness re-greens (the --plan coming-due list)
    "q11_sessionize",
    "q28_prioritization_pairs",
    "q136_packing_efficiency",
    "q137_dup_cluster_sizes",
    "q138_eval_quotas",
    "q139_rrf_fusion",
    "q140_ppjoin_exact",
    "q141_token_heavy_hitters",
    # the round's new never-green queries (M153, M154, M156; q169/q170
    # swapped in mid-round for q22_dense_rank/q23_instant_generation —
    # cedable r6-tier slots, deferred to r10 with the other relational
    # basics)
    "q168_hist_drift",
    "q169_url_domain_census",
    "q170_pq_adc_topk",
    # r6-tier, taken one round early (39 of 49 after the q22/q23 cedes)
    "q142_unimax_plan",
    "q144_embedding_gram",
    "q145_bloom_membership",
    "q146_nfc_audit",
    "q147_ppjoin_increment",
    "q148_token_entropy",
    "q149_containment_pairs",
    "q150_centroid_cosine",
    "q151_script_mix",
    "q152_last_touch_attribution",
    "q153_frequent_paths",
    "q154_ks_drift",
    "q155_novelty_attribution",
    "q156_weighted_median",
    "q157_zipf_slope",
    "q158_conformance_fitness",
    "q159_variant_table",
    "q160_linear_scores",
    "q161_embedding_dispersion",
    "q162_jaccard_threshold_profile",
    "q25_conditional_pivot",
    "q26_trace_subset",
    "q27_calendar_displacement",
    "q29_range_join_bucketed",
    "q30_enabled_times",
    "q34_waiting_time_report",
    "q37_activation_rules",
    "q41_dedup_minhash_lsh",
    "q44_embedding_neardup",
    "q45_ann_cosine_topk",
    "q51_multimodal_features",
    "q53_corpus_filter",
    "q58_stratified_sample",
    "q59_token_shard_packing",
    "q60_winnowing_pairs",
    "q61_event_blacklist",
    "q74_semantic_dedup",
    "q75_dedup_resolution",
    "q80_funnel_steps",
})


# Names registered with ``primary=True`` that the active rotation
# excluded from the driver window (ADVICE r4: while PRIMARY_ROTATION is
# set the per-call flag is otherwise silently dead — a new
# ``@query(..., primary=True)`` would never reach the driver).
# tests/test_registry_rotation.py pins this set to an explicit snapshot
# so any window-membership change is a deliberate, reviewed edit.
ROTATION_SHADOWED: set[str] = set()


def query(name: str, oracle: str | None = None, primary: bool = True):
    """Register a query builder and (optionally) its DuckDB oracle.

    ``primary=False`` routes to the pytest-verified secondary registry
    (kept out of the driver's 50-row correctness window). When
    ``PRIMARY_ROTATION`` is set, window membership comes from the
    rotation set instead and the flag is documentation only; a
    ``primary=True`` registration the rotation excludes is recorded in
    ``ROTATION_SHADOWED`` and pinned by tests/test_registry_rotation.py.
    """

    def deco(fn: SparkBuilder) -> SparkBuilder:
        is_primary = (
            name in PRIMARY_ROTATION if PRIMARY_ROTATION is not None
            else primary
        )
        if PRIMARY_ROTATION is not None and primary and not is_primary:
            ROTATION_SHADOWED.add(name)
        q, o = (
            (QUERIES, ORACLES) if is_primary
            else (EXTRA_QUERIES, EXTRA_ORACLES)
        )
        q[name] = fn
        if oracle is not None:
            o[name] = oracle
        return fn

    return deco
