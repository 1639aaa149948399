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

# Round-10 rotation (VERDICT r9 task 2). 50 slots, built from
# tools/rotation_check.py --plan (budget arithmetic lives in THAT
# module's docstring: registered minus the 8 allowlisted environment
# canaries, over 50 slots, makes a ~3.2-round refresh floor, hence the
# 4-round budget):
# - the 10 queries the r9 --plan listed as coming due (newest green
#   r6, due at r10 close): the deferred relational basics
#   q01/q02/q04/q05/q07/q14/q15/q16/q22/q23;
# - q171/q172/q173/q174, the round's new never-green M161/M162/M164/
#   M165 queries (full-PSL registrable domain; the URL-governance
#   facade; robots.txt governance; sitemap census — q173/q174 took
#   q31/q38's slots mid-round) — must be in the window per
#   rotation_check;
# - 36 of the 50 r7-tier queries (newest green r7, due at r11) taken
#   a round early so the r11 window has room; the 14 deferred are the
#   cheap relational basics (q03/q06/q08/q09/q10/q13/q17/q18/q19/q20/
#   q21/q24, plus q31/q38 ceded to q173/q174 — fast re-greens that
#   fit any window), due exactly at r11 where --plan will list them.
# Rotated OUT: the whole r9 window (every row green in
# CORRECTNESS_r09, due back r13). q116_canary_hugeint_probe stays
# RETIRED in the extras registry (designed-red HUGEINT probe,
# DRIVER_ENV.md) and all 8 canaries are budget-allowlisted in
# rotation_check.py. Set to None to fall back to the per-call flags.
PRIMARY_ROTATION: frozenset[str] | None = frozenset({
    # r6-tier staleness re-greens (the --plan coming-due list)
    "q01_pricing_summary",
    "q02_filter_project",
    "q04_semi_join",
    "q05_anti_join",
    "q07_in_case_when",
    "q14_nested_two_level_agg",
    "q15_histogram",
    "q16_rollup",
    "q22_dense_rank",
    "q23_instant_generation",
    # the round's new never-green queries (M161 + the governance
    # facade)
    "q171_psl_registered_domain",
    "q172_url_governance",
    "q173_robots_governance",
    "q174_sitemap_census",
    # r7-tier, taken one round early (36 of 50; q143 doubles as the
    # bench control query)
    "q143_edjoin_exact",
    "q163_containment_increment",
    "q164_ks_drift_quantized",
    "q165_edjoin_increment",
    "q32_batch_discovery_stats",
    "q33_waiting_time_decomposition",
    "q35_concurrency_pairs",
    "q36_activation_features",
    "q40_dedup_exact",
    "q42_dedup_simhash",
    "q43_dedup_ngram_jaccard",
    "q46_ann_ivf_topk",
    "q47_text_quality",
    "q48_lang_id",
    "q49_token_count",
    "q52_dedup_components",
    "q54_frame_sample",
    "q55_payload_resize",
    "q56_repetition_signals",
    "q57_pattern_counts",
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
