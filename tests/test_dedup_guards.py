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
