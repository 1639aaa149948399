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

# Round-4 rotation (VERDICT r3 task 1): the driver window should spend
# its 50 slots on the queries that have never earned a driver-green
# CORRECTNESS row. This set overrides the per-call ``primary=`` flag
# (which keeps documenting the steady-state family split): the 44
# never-driver-checked queries from CORRECTNESS_r01..r03, plus one
# already-green representative per §2 family whose members are NOT in
# that 44 (relational core, enablement, discovery→WT→report, rule
# mining, dedup-LSH flagship, ANN flagship) so parity evidence isn't
# lost round-over-round. Union of r1-r3 green rows + this window =
# all 104 registered names. Set to None to fall back to the flags.
PRIMARY_ROTATION: frozenset[str] | None = frozenset({
    # family representatives (already driver-green in r1-r3)
    "q01_pricing_summary",
    "q30_enabled_times",
    "q34_waiting_time_report",
    "q37_activation_rules",
    "q41_dedup_minhash_lsh",
    "q44_embedding_neardup",
    # never driver-checked before round 4
    "q54_frame_sample",
    "q55_payload_resize",
    "q62_doc_chunking",
    "q63_decontaminate",
    "q64_diversity_signals",
    "q65_quantized_topk",
    "q66_asof_join",
    "q67_bm25_topk",
    "q68_incremental_merge",
    "q69_seeded_shuffle",
    "q70_source_mixing",
    "q71_context_packing",
    "q72_unigram_logprob",
    "q73_dedup_segments",
    "q76_bigram_logprob",
    "q77_profile_columns",
    "q78_quality_buckets",
    "q79_cdc_chunks",
    "q81_retention_cohorts",
    "q82_payload_neardup",
    "q83_interval_overlap_join",
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
    "q100_jl_projection",
    "q101_negative_samples",
    "q102_dedup_weights",
    "q103_rolling_mad",
    "q104_percentile_normalize",
    "q105_novelty_signals",
    "q106_dedup_audit_by_source",
})


def query(name: str, oracle: str | None = None, primary: bool = True):
    """Register a query builder and (optionally) its DuckDB oracle.

    ``primary=False`` routes to the pytest-verified secondary registry
    (kept out of the driver's 50-row correctness window). When
    ``PRIMARY_ROTATION`` is set, window membership comes from the
    rotation set instead and the flag is documentation only.
    """

    def deco(fn: SparkBuilder) -> SparkBuilder:
        is_primary = (
            name in PRIMARY_ROTATION if PRIMARY_ROTATION is not None
            else primary
        )
        q, o = (
            (QUERIES, ORACLES) if is_primary
            else (EXTRA_QUERIES, EXTRA_ORACLES)
        )
        q[name] = fn
        if oracle is not None:
            o[name] = oracle
        return fn

    return deco
