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

# Round-11 rotation (VERDICT r10 task 3). 50 slots, built from
# tools/rotation_check.py --plan (budget arithmetic lives in THAT
# module's docstring: registered minus the 8 allowlisted environment
# canaries, over 50 slots, makes a ~3.2-round refresh floor, hence the
# 4-round budget):
# - the 14 queries the r10 --plan listed as coming due (newest green
#   r7, due at r11 close): q03/q06/q08/q09/q10/q13/q17/q18/q19/q20/
#   q21/q24/q31/q38;
# - q175-q182, the round's new never-green queries (M166 crawl-
#   compliance facade; M167 crawl-delay scheduler; M168 recrawl
#   staleness; M169 HTML text extraction; M170 link frontier;
#   M171 frontier-expansion facade; M172 WARC source; M173 page
#   metadata / noindex compliance) —
#   must be in the window per rotation_check;
# - 28 of the 50 r8-tier queries (newest green r8, due at r12) taken
#   a round early so the r12 window has room; the 22 deferred
#   (q84-q87, q89-q99, q76, q88, q64, q70, q50, q166, q167 — the
#   last seven ceded mid-round to q176-q182) are cheap re-greens
#   that fit any window, due exactly at r12 where --plan will list
#   them.
# Rotated OUT: the whole r10 window (every row green in
# CORRECTNESS_r10, due back r14). q116_canary_hugeint_probe stays
# RETIRED in the extras registry (designed-red HUGEINT probe,
# DRIVER_ENV.md) and all 8 canaries are budget-allowlisted in
# rotation_check.py. Set to None to fall back to the per-call flags.
PRIMARY_ROTATION: frozenset[str] | None = frozenset({
    # r7-tier staleness re-greens (the --plan coming-due list)
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
    "q38_interval_sweep",
    # the round's new never-green queries (M166-M170)
    "q175_crawl_compliance",
    "q176_crawl_schedule",
    "q177_recrawl_status",
    "q178_html_to_text",
    "q179_link_frontier",
    "q180_frontier_expansion",
    "q181_warc_parse",
    "q182_html_meta",
    # r8-tier, taken one round early (28 of 50)
    "q100_jl_projection",
    "q101_negative_samples",
    "q102_dedup_weights",
    "q103_rolling_mad",
    "q104_percentile_normalize",
    "q105_novelty_signals",
    "q106_dedup_audit_by_source",
    "q107_weighted_sample",
    "q108_k_anonymous_rollup",
    "q109_time_split_embargo",
    "q110_cross_source_dup_matrix",
    "q118_embedding_outliers",
    "q119_source_overlap_sketch",
    "q120_temperature_mix_weights",
    "q121_epoch_plan",
    "q123_vocab_coverage",
    "q124_nb_class_scores",
    "q125_source_jsd_matrix",
    "q126_striped_pack_audit",
    "q127_dsir_weights",
    "q128_dup_span_audit",
    "q129_fertility_by_lang",
    "q130_split_leakage",
    "q131_backoff_logprob",
    "q132_pmi_collocations",
    "q133_lexical_richness",
    "q134_score_calibration",
    "q135_quality_funnel",
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
