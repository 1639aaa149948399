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

# Round-7 rotation (VERDICT r6 task 1c). 50 slots, built from
# tools/rotation_check.py --plan (budget arithmetic lives in THAT
# module's docstring — the single authoritative statement: registered
# minus the 8 allowlisted environment canaries, over 50 slots, makes a
# ~3.1-round refresh floor, hence the 4-round budget):
# - the 28 r3-tier staleness entries the r6 verdict demanded re-green
#   (the whole q03-q57 tail whose newest driver green was r3);
# - q143_edjoin_exact: re-green of the r7-rewritten Pass-Join operator
#   (fresh official evidence for changed code, green r6 already);
# - the 3 new r7 queries q163/q164/q165 (never-checked > stale-green);
# - the 18 numerically-first r4-tier queries (q54-q83); the remaining
#   20 r4-tier (q84-q105 range) come due at r8 planning and ARE the
#   r8 window's seed, alongside the r5 tier that follows at r9.
# Rotated OUT: the r6 first-checks (q142-q162 minus q143, all green in
# CORRECTNESS_r06) and the multi-green r2/r3-refresh tier (q01-q80
# family reps included — every one has 2-6 green rows and re-enters on
# its budget schedule). q116_canary_hugeint_probe stays RETIRED in the
# extras registry (designed-red HUGEINT probe, DRIVER_ENV.md) and all
# 8 canaries are budget-allowlisted in rotation_check.py.
# Set to None to fall back to the per-call flags.
PRIMARY_ROTATION: frozenset[str] | None = frozenset({
    # r3-tier staleness re-greens (VERDICT r6 task 1c)
    "q03_top_revenue_orders",
    "q06_regional_revenue",
    "q08_string_ops",
    "q09_window_topk",
    "q10_argmin_first_event",
    "q13_directly_follows",
    "q17_cte_ratio",
    "q18_range_join_workload",
    "q19_theta_self_join",
    "q20_chunking",
    "q21_rolling_sequence",
    "q24_union_rekey",
    "q31_task_batches",
    "q32_batch_discovery_stats",
    "q33_waiting_time_decomposition",
    "q35_concurrency_pairs",
    "q36_activation_features",
    "q38_interval_sweep",
    "q40_dedup_exact",
    "q42_dedup_simhash",
    "q43_dedup_ngram_jaccard",
    "q46_ann_ivf_topk",
    "q47_text_quality",
    "q48_lang_id",
    "q49_token_count",
    "q52_dedup_components",
    "q56_repetition_signals",
    "q57_pattern_counts",
    # changed-operator re-green (Pass-Join rewrite, r7)
    "q143_edjoin_exact",
    # new in r7 (never driver-checked)
    "q163_containment_increment",
    "q164_ks_drift_quantized",
    "q165_edjoin_increment",
    # r4-tier refresh (oldest by query number; rest seed the r8 window)
    "q54_frame_sample",
    "q55_payload_resize",
    "q62_doc_chunking",
    "q63_decontaminate",
    "q65_quantized_topk",
    "q66_asof_join",
    "q67_bm25_topk",
    "q68_incremental_merge",
    "q69_seeded_shuffle",
    "q71_context_packing",
    "q72_unigram_logprob",
    "q73_dedup_segments",
    "q77_profile_columns",
    "q78_quality_buckets",
    "q79_cdc_chunks",
    "q81_retention_cohorts",
    "q82_payload_neardup",
    "q83_interval_overlap_join",
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
