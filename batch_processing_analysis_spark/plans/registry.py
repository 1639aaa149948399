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

# Round-12 rotation (VERDICT r11 tasks 2 and "Gap, not a gate
# failure"). 50 slots, built from tools/rotation_check.py --plan
# (same 4-round staleness budget):
# - the 22 queries the r11 --plan listed as coming due (newest green
#   r8, due at r12): q50/q64/q70/q76/q84-q99/q166/q167 — includes the
#   22 deferred a round by the r11 rotation;
# - the 28 r11-OPTIMIZED heavy rows the judge flagged as
#   touched-but-not-driver-verified (VERDICT r11 item 2): their code
#   changed in opt round 1 (subtree staging, Sigma-identity rewrites,
#   broadcast+HOF governance, collect fusion) and their last driver
#   green predates the change, so the r12 window must hash-verify the
#   post-optimization implementations: q34, q41-q44, q48, q53, q60,
#   q67, q72, q73, q77, q82, q140, q143, q147, q148, q149, q154,
#   q155, q162-q165, q169, q171-q173 (q76/q94, also touched, arrive
#   via the coming-due list above).
# Rotated OUT: the whole r11 window (every row green in
# CORRECTNESS_r11, due back r15). q116_canary_hugeint_probe stays
# RETIRED in the extras registry (designed-red HUGEINT probe,
# DRIVER_ENV.md) and all 8 canaries are budget-allowlisted in
# rotation_check.py. Set to None to fall back to the per-call flags.
PRIMARY_ROTATION: frozenset[str] | None = frozenset({
    # r8-tier staleness re-greens (the --plan coming-due list, 22)
    "q50_fingerprint",
    "q64_diversity_signals",
    "q70_source_mixing",
    "q76_bigram_logprob",
    "q84_resample_locf",
    "q85_rolling_median",
    "q86_json_props_stats",
    "q87_pseudonymized_rollup",
    "q88_corpus_diff",
    "q89_sql_surface",
    "q90_dfg_drift",
    "q91_profile_drift",
    "q92_redact_pii",
    "q93_cms_heavy_hitters",
    "q94_distinctive_terms",
    "q95_validation_summary",
    "q96_train_split",
    "q97_distribution_drift",
    "q98_rendezvous_shards",
    "q99_bucket_rollup",
    "q166_hll_census",
    "q167_log_hist_quantiles",
    # r11-optimized heavy rows, driver-unverified post-change (28)
    "q34_waiting_time_report",
    "q41_dedup_minhash_lsh",
    "q42_dedup_simhash",
    "q43_dedup_ngram_jaccard",
    "q44_embedding_neardup",
    "q48_lang_id",
    "q53_corpus_filter",
    "q60_winnowing_pairs",
    "q67_bm25_topk",
    "q72_unigram_logprob",
    "q73_dedup_segments",
    "q77_profile_columns",
    "q82_payload_neardup",
    "q140_ppjoin_exact",
    "q143_edjoin_exact",
    "q147_ppjoin_increment",
    "q148_token_entropy",
    "q149_containment_pairs",
    "q154_ks_drift",
    "q155_novelty_attribution",
    "q162_jaccard_threshold_profile",
    "q163_containment_increment",
    "q164_ks_drift_quantized",
    "q165_edjoin_increment",
    "q169_url_domain_census",
    "q171_psl_registered_domain",
    "q172_url_governance",
    "q173_robots_governance",
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
