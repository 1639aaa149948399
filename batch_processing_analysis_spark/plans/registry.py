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

# Round-6 rotation (VERDICT r5 tasks 1 + 3). 50 slots, chosen from
# tools/rotation_check.py's staleness report (budget: every query's
# newest driver-green must be at most 3 rounds old at planning time —
# 144 queries / 50 slots makes a 3-round refresh period the feasibility
# floor):
# - 6 family representatives (kept every round so reference-parity
#   evidence stays fresh);
# - the 5 never-driver-checked queries q142-q146 (M113/M114/M115/
#   M117/M121 — registered after the r5 window froze);
# - the 10 budget-violating queries (newest green r2: q02/q04/q05/
#   q14/q15/q16/q22/q23/q25/q45);
# - re-greens from the r3-stale tail, prioritized single-green first
#   (q51/q53/q58/q59/q60/q61/q74/q75/q80), then two-green
#   (q07/q26/q27/q29). As round 6 added 16 new queries (q147-q162),
#   the remaining r3-tail slots were ceded to them one batch at a
#   time (never-checked > stale-green): the whole three-green tier
#   (q03/q06/q08-q10/q13/q17-q21/q24) plus q38/q52/q56/q57 defer to
#   r7 — all still inside the 3-round budget, and they ARE the bulk
#   of rotation_check's "coming due next round" list that seeds the
#   r7 window.
# Rotated OUT: the r5 first-checks (q64-q141 additions, all green in
# CORRECTNESS_r05) and the environment canaries q111-q115/q117 (their
# diagnostic value is one round). q116_canary_hugeint_probe is RETIRED
# to the extras registry: its designed red row confirmed the driver's
# HUGEINT→float64 canonicalization in r5 (DRIVER_ENV.md) — keeping it
# would burn a window slot on a permanent by-design mismatch.
# q122_canary_pow stays registered as an extra too (strict-driver
# keeps exercising both).
# Set to None to fall back to the per-call flags.
PRIMARY_ROTATION: frozenset[str] | None = frozenset({
    # family representatives
    "q01_pricing_summary",
    "q30_enabled_times",
    "q34_waiting_time_report",
    "q37_activation_rules",
    "q41_dedup_minhash_lsh",
    "q44_embedding_neardup",
    # never driver-checked (M113-M121 query-bearing additions)
    "q142_unimax_plan",
    "q143_edjoin_exact",
    "q144_embedding_gram",
    "q145_bloom_membership",
    "q146_nfc_audit",
    # staleness-budget violations (newest green r2)
    "q02_filter_project",
    "q04_semi_join",
    "q05_anti_join",
    "q14_nested_two_level_agg",
    "q15_histogram",
    "q16_rollup",
    "q22_dense_rank",
    "q23_instant_generation",
    "q25_conditional_pivot",
    "q45_ann_cosine_topk",
    # r3-stale, single driver-green row
    "q51_multimodal_features",
    "q53_corpus_filter",
    "q58_stratified_sample",
    "q59_token_shard_packing",
    "q60_winnowing_pairs",
    "q61_event_blacklist",
    "q74_semantic_dedup",
    "q75_dedup_resolution",
    "q80_funnel_steps",
    # r3-stale, two driver-green rows
    "q07_in_case_when",
    "q26_trace_subset",
    "q27_calendar_displacement",
    "q29_range_join_bucketed",
    # new r6 operators (M122-M140), first driver check — took the
    # whole three-green tier (q03/q06/q08/q09/q10/q13/q17/q18/q19/q20/
    # q21/q24) plus the two-green q56/q57 (never-checked > stale-green;
    # all ceded slots re-green in r7, still inside the 3-round budget)
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
