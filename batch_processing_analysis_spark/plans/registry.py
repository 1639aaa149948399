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

# Round-5 rotation (VERDICT r4 tasks 1-2, 8). 50 slots:
# - 6 family representatives (kept every round so reference-parity
#   evidence stays fresh);
# - the 6 r4 hash-red queries, re-rotated after the HUGEINT-oracle /
#   scalar-output fixes (commit e809290) so CORRECTNESS_r05 records
#   the repaired rows;
# - the 4 round-4 operators never yet driver-checked (q107-q110);
# - the 7 environment canaries (plans/queries_canary.py) — q116 is the
#   deliberate HUGEINT probe, expected red iff the r4 divergence
#   mechanism holds in the driver env;
# - the 6 mid-r5 additions (q118-q123, M90-M94 + the pow canary),
#   swapped in late-r5 so they get their first driver check this round
#   instead of waiting for r6 (all six strict-driver green locally);
# - the 21 stalest driver-greens (latest green row r2 or r3-only).
#   The swap ceded q07/q26/q27/q29/q38/q51 (each already green in two
#   rounds, latest r3, untouched this round — their re-green can wait
#   for r6 at 2-rounds-stale, cheaper than a never-checked query
#   waiting a full round).
# Union of r1-r4 green rows + this window = every registered name
# except q142-q146 (the M113-M121 query-bearing additions landed
# after the 50 slots filled — they head the r6 rotation; tools/rotation_check.py tracks
# this). The late-r5 additions displaced re-green slots, so
# q22/q23/q25/q45/q53/q58/q59/q60/q61/q74/q75/q80 ride on their
# existing green rows this round.
# Set to None to fall back to the per-call flags.
# r6 rotation plan (tools/rotation_check.py generates the candidates):
# rotate IN q142-q146 (M113-M121, never driver-checked) + the oldest
# re-green backlog (q22/q23/q25/q45/q53/q58/q59/q60/q61/q74/q75/q80,
# then the r1-only greens); rotate OUT the canaries q111-q117 (their
# diagnostic value is one round) and the r5 first-checks once green.
PRIMARY_ROTATION: frozenset[str] | None = frozenset({
    # family representatives (driver-green r1-r4)
    "q01_pricing_summary",
    "q30_enabled_times",
    "q34_waiting_time_report",
    "q37_activation_rules",
    "q41_dedup_minhash_lsh",
    "q44_embedding_neardup",
    # r4 hash-red, fixed this round (oracle HUGEINT casts / q100 scalar)
    "q64_diversity_signals",
    "q70_source_mixing",
    "q76_bigram_logprob",
    "q86_json_props_stats",
    "q100_jl_projection",
    "q106_dedup_audit_by_source",
    # round-4 operators, first driver check
    "q107_weighted_sample",
    "q108_k_anonymous_rollup",
    "q109_time_split_embargo",
    "q110_cross_source_dup_matrix",
    # environment canaries (queries_canary.py)
    "q111_canary_float_round",
    "q112_canary_regex_split",
    "q113_canary_json_extract",
    "q114_canary_hex_cast",
    "q115_canary_nullable_agg",
    "q116_canary_hugeint_probe",
    "q117_canary_unicode_lower",
    # mid-r5 additions (M90-M94 + pow canary), first driver check
    "q118_embedding_outliers",
    "q119_source_overlap_sketch",
    "q120_temperature_mix_weights",
    "q121_epoch_plan",
    "q122_canary_pow",
    "q123_vocab_coverage",
    # r5 operator additions (M95-M97), first driver check
    "q124_nb_class_scores",
    "q125_source_jsd_matrix",
    "q126_striped_pack_audit",
    # late-r5 additions (M98-M100), first driver check
    "q127_dsir_weights",
    "q128_dup_span_audit",
    "q129_fertility_by_lang",
    # late-r5 additions (M101-M105), first driver check (ceded the
    # five stalest re-green slots q22/q23/q25/q45/q53 — each already
    # green in a past round; never-checked > stale-green, the same
    # triage VERDICT r4 task 2 applied)
    "q130_split_leakage",
    "q131_backoff_logprob",
    "q132_pmi_collocations",
    "q133_lexical_richness",
    "q134_score_calibration",
    # latest-r5 additions (M106-M108), first driver check (ceded the
    # single-r3-green re-green slots q58/q59/q61 — they keep their r3
    # green row; never-checked > stale-green)
    "q135_quality_funnel",
    "q136_packing_efficiency",
    "q137_dup_cluster_sizes",
    # latest-r5 additions (M109-M110), first driver check (ceded the
    # single-r3-green re-green slots q60/q80)
    "q138_eval_quotas",
    "q139_rrf_fusion",
    # final-r5 additions (M111-M112), first driver check (ceded the
    # r3-green re-green slots q74/q75 — never-checked > stale-green)
    "q140_ppjoin_exact",
    "q141_token_heavy_hitters",
    # stalest greens: last green in r3 (q28/q50 changed this round —
    # a fresh driver row doubles as a regression check; q11 is the
    # entry() flagship)
    "q11_sessionize",
    "q28_prioritization_pairs",
    "q50_fingerprint",
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
