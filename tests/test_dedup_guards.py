"""Skew-guard and verification-contract unit tests for the dedup family
(the oracle queries check end-to-end values; these pin the guard
behaviors that only fire on pathological inputs the test tables don't
contain)."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_processing_analysis_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_rows,
    simhash_pairs,
    simhash_signatures,
    verify_jaccard_rows,
)


def _boilerplate_docs(spark, n, text="common boilerplate text repeated"):
    return spark.createDataFrame(
        [(i, text) for i in range(n)], "doc_id long, text string"
    )


def test_simhash_max_bucket_drops_degenerate_buckets(spark):
    # 12 identical docs collapse into one (band, bkey) bucket per band.
    # Below the cap the join would emit all 66 pairs; the guard must
    # zero it out instead of going quadratic.
    sigs = simhash_signatures(_boilerplate_docs(spark, 12))
    blocked = simhash_pairs(sigs, max_bucket=10)
    assert blocked.count() == 0
    allowed = simhash_pairs(sigs, max_bucket=100)
    assert allowed.count() == 12 * 11 // 2


def test_minhash_max_bucket_drops_degenerate_buckets(spark):
    docs = _boilerplate_docs(spark, 12)
    sh = shingle_rows(docs)
    sigs = minhash_signatures(docs, shingles=sh)
    assert lsh_candidate_pairs(sigs, max_bucket=10).count() == 0
    assert lsh_candidate_pairs(sigs, max_bucket=100).count() == 12 * 11 // 2


def test_verify_jaccard_emits_zero_for_disjoint_candidates(spark):
    # r2 advice: candidate pairs with an EMPTY shingle intersection must
    # still get a row (jaccard 0) so verified/candidate accounting works.
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    sh = shingle_rows(docs)
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    rows = verify_jaccard_rows(pairs, sh).collect()
    assert len(rows) == 1
    assert rows[0]["jaccard"] == 0.0


# ---------------------------------------------------------------------------
# dedup_segments (M39): bounded-granularity ExactSubstr semantics
# ---------------------------------------------------------------------------

def test_dedup_segments_removes_repeated_spans_keeps_first(spark):
    from batch_processing_analysis_spark.operators.dedup import dedup_segments

    boiler = "L1 L2 L3"  # one full 3-token tile, shared by both docs
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} a b c"),
            (2, f"{boiler} x y z"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup_segments(docs, width=3).collect()
    }
    # Doc 1 owns the first occurrence of the boilerplate tile.
    assert out[1]["clean_text"] == "L1 L2 L3 a b c"
    assert (out[1]["n_seg"], out[1]["n_kept"]) == (2, 2)
    # Doc 2 loses the tile but keeps its unique tail, order preserved.
    assert out[2]["clean_text"] == "x y z"
    assert (out[2]["n_seg"], out[2]["n_kept"]) == (2, 1)
    # Empty doc: empty output, zero counts (left-join contract).
    assert out[3]["clean_text"] == ""
    assert (out[3]["n_seg"], out[3]["n_kept"]) == (0, 0)


def test_dedup_segments_within_doc_repeat_collapses(spark):
    from batch_processing_analysis_spark.operators.dedup import dedup_segments

    docs = spark.createDataFrame(
        [(7, "p q p q p q")], "doc_id long, text string"
    )
    row = dedup_segments(docs, width=2).collect()[0]
    # Three identical 2-token tiles -> only the first survives.
    assert row["clean_text"] == "p q"
    assert (row["n_seg"], row["n_kept"]) == (3, 1)


# ----------------------------- max_candidates guard (VERDICT r5 task 2)

def test_ppjoin_candidate_guard_trips_on_degenerate_corpus(spark):
    import pytest
    from batch_processing_analysis_spark.operators.dedup import (
        CandidateVolumeExceeded,
        ppjoin_pairs,
    )

    # 60 identical docs: every prefix shingle has df=60 -> the bound
    # is ~60^2 per gram, far above a budget of 100. Must raise BEFORE
    # grinding, and the message must name the scale paths.
    docs = _boilerplate_docs(spark, 60)
    with pytest.raises(CandidateVolumeExceeded, match="minhash_lsh_pairs"):
        ppjoin_pairs(docs, t_pct=50, k=1, max_candidates=100).collect()


def test_ppjoin_guard_passthrough_matches_unguarded(spark):
    from batch_processing_analysis_spark.operators.dedup import ppjoin_pairs

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),
         (2, "alpha beta gamma epsilon"),
         (3, "zeta eta theta iota"),
         (4, "zeta eta theta kappa")],
        "doc_id long, text string",
    )
    unguarded = sorted(map(tuple, ppjoin_pairs(
        docs, t_pct=50, k=1).collect()))
    guarded = sorted(map(tuple, ppjoin_pairs(
        docs, t_pct=50, k=1, max_candidates=10_000).collect()))
    assert guarded == unguarded and len(guarded) == 2


def test_edjoin_candidate_guard_trips_on_degenerate_corpus(spark):
    import pytest
    from batch_processing_analysis_spark.operators.dedup import (
        CandidateVolumeExceeded,
        edjoin_pairs,
    )

    # 80 near-identical long strings: every prefix gram has df=80.
    docs = spark.createDataFrame(
        [(i, "abcdefghijklmnopqrstuvwxyz" * 3) for i in range(80)],
        "doc_id long, text string",
    )
    with pytest.raises(CandidateVolumeExceeded,
                       match="ngram_jaccard_pairs"):
        edjoin_pairs(docs, d=2, q=3, max_candidates=50).collect()


def test_edjoin_guard_counts_short_bucket_too(spark):
    import pytest
    from batch_processing_analysis_spark.operators.dedup import (
        CandidateVolumeExceeded,
        edjoin_pairs,
    )

    # All strings BELOW the q*d+q-1 cutoff: the gram join is empty,
    # the short bucket carries the whole blow-up -> the guard must
    # still see it.
    docs = spark.createDataFrame(
        [(i, "ab") for i in range(50)], "doc_id long, text string"
    )
    with pytest.raises(CandidateVolumeExceeded):
        edjoin_pairs(docs, d=2, q=3, max_candidates=10).collect()


def test_edjoin_guard_passthrough_matches_unguarded(spark):
    from batch_processing_analysis_spark.operators.dedup import edjoin_pairs

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"),
         (2, "the quick brown fox jumped"),
         (3, "completely different content here"),
         (4, "zzz")],
        "doc_id long, text string",
    )
    unguarded = sorted(map(tuple, edjoin_pairs(docs, d=3, q=2).collect()))
    guarded = sorted(map(tuple, edjoin_pairs(
        docs, d=3, q=2, max_candidates=100_000).collect()))
    assert guarded == unguarded
    assert (1, 2, 2) in guarded


def test_sized_partitions_for_bound_arithmetic(spark):
    from batch_processing_analysis_spark.operators import dedup as D

    session = int(spark.conf.get("spark.sql.shuffle.partitions"))
    target = D.GUARD_JOIN_ROWS_PER_PARTITION
    # the session layout suffices -> no touch
    assert D.sized_partitions_for_bound(spark, 0) is None
    assert D.sized_partitions_for_bound(spark, session * target) is None
    # just over -> next power of two above need
    got = D.sized_partitions_for_bound(spark, session * target + 1)
    assert got is not None and got >= session + 1
    assert got & (got - 1) == 0  # power of two
    # capped
    assert D.sized_partitions_for_bound(
        spark, 10**15) == D.GUARD_JOIN_MAX_PARTITIONS


def test_bound_sized_edjoin_matches_and_resizes_plan(spark, monkeypatch):
    """VERDICT r8 task 3: when the measured bound outsizes the session
    layout, the candidate/verify exchanges carry the derived partition
    count (visible as hashpartitioning(..., nparts) in the executed
    plan) and the output is bit-identical to the unsized run."""
    from batch_processing_analysis_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"),
         (2, "the quick brown fox jumped"),
         (3, "completely different content here"),
         (4, "pack my box with five dozen"),
         (5, "pack my box with six dozen")],
        "doc_id long, text string",
    )
    want = sorted(map(tuple, D.edjoin_pairs(docs, d=3, q=2).collect()))

    monkeypatch.setattr(D, "GUARD_JOIN_ROWS_PER_PARTITION", 1)
    sized = D.edjoin_pairs(docs, d=3, q=2, max_candidates=10**9)
    assert sorted(map(tuple, sized.collect())) == want

    session = int(spark.conf.get("spark.sql.shuffle.partitions"))
    plan = sized._jdf.queryExecution().executedPlan().toString()
    import re

    parts = {int(m) for m in re.findall(r"hashpartitioning\([^)]*?,\s*(\d+)\)",
                                        plan)}
    assert any(p > session and p & (p - 1) == 0 for p in parts), plan


def test_bound_sized_edjoin_increment_matches(spark, monkeypatch):
    from batch_processing_analysis_spark.operators import dedup as D
    from batch_processing_analysis_spark.operators import incremental as I

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"),
         (2, "the quick brown fox jumped"),
         (3, "completely different content here"),
         (4, "pack my box with five dozen"),
         (5, "pack my box with six dozen"),
         (6, "zz"), (7, "zy")],
        "doc_id long, text string",
    )
    base = docs.filter(F.col("doc_id") % 2 == 0)
    delta = docs.filter(F.col("doc_id") % 2 == 1)
    want = sorted(map(tuple, I.edjoin_increment_pairs(
        base, delta, d=3, q=2).collect()))
    monkeypatch.setattr(D, "GUARD_JOIN_ROWS_PER_PARTITION", 1)
    got = sorted(map(tuple, I.edjoin_increment_pairs(
        base, delta, d=3, q=2, max_candidates=10**9).collect()))
    assert got == want and want
