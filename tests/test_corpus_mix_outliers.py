"""Unit tests for the M90-M93 operators: embedding outliers,
source-overlap sketch, temperature mixing weights, epoch planning.

The oracle gate (tests/test_extra_queries.py on q118-q121) checks
hash-exactness vs DuckDB; these tests check the SEMANTICS — planted
outliers rank first, identical/disjoint sources bracket the sketch
estimate, and the temperature limits (α=1 → empirical shares,
α=0 → uniform) hold.
"""

from __future__ import annotations

import pytest

from batch_processing_analysis_spark.operators.dedup import (
    source_overlap_sketch,
)
from batch_processing_analysis_spark.operators.mixing import (
    epoch_plan,
    temperature_mix_weights,
)
from batch_processing_analysis_spark.operators.similarity import (
    embedding_outliers,
)


def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )


class TestEmbeddingOutliers:
    def test_planted_outlier_ranks_first(self, spark):
        base = [(i, [1.0, 1.0, 0.0], "a") for i in range(9)]
        rows = base + [(99, [-50.0, 40.0, 30.0], "a")]
        out = embedding_outliers(_emb_df(spark, rows), k=3).collect()
        assert out[0]["vec_id"] == 99 and out[0]["rank"] == 1
        assert out[0]["z"] > 2.0  # 1 of 10 far away: z ≈ 3·σ⁻¹-ish
        assert len(out) == 3

    def test_groups_are_independent(self, spark):
        rows = (
            [(i, [float(i % 2), 0.0], "a") for i in range(4)]
            + [(10 + i, [100.0 * i, 0.0], "b") for i in range(4)]
        )
        out = embedding_outliers(_emb_df(spark, rows), k=10)
        per = {r["label"]: r for r in out.collect() if r["rank"] == 1}
        assert set(per) == {"a", "b"}
        # b's spread is 100×a's, but each group z-scores internally
        assert per["b"]["vec_id"] in (10, 13)  # the ends of b's line

    def test_zero_variance_group_gets_zero_z(self, spark):
        rows = [(i, [2.0, 2.0], "a") for i in range(3)]
        out = embedding_outliers(_emb_df(spark, rows), k=5).collect()
        assert len(out) == 3
        assert all(r["z"] == 0.0 and r["dist_micro"] == 0 for r in out)


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


class TestSourceOverlapSketch:
    def test_identical_sources_estimate_one(self, spark):
        texts = [f"unique document body {i}" for i in range(20)]
        rows = [(i, "s1", t) for i, t in enumerate(texts)] + [
            (100 + i, "s2", t) for i, t in enumerate(texts)
        ]
        out = source_overlap_sketch(_docs_df(spark, rows), k=32).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["source_a"], r["source_b"]) == ("s1", "s2")
        assert r["n_match"] == 32 and r["est_jaccard_micro"] == 1_000_000

    def test_disjoint_sources_estimate_near_zero(self, spark):
        rows = [(i, "s1", f"alpha {i}") for i in range(20)] + [
            (100 + i, "s2", f"beta {i}") for i in range(20)
        ]
        r = source_overlap_sketch(_docs_df(spark, rows), k=64).collect()[0]
        # Unbiased estimate of 0 with k=64: a few chance collisions at
        # most (P[component match] = 0 for disjoint MIN sets except
        # hash ties, which are ~2⁻⁶⁰).
        assert r["n_match"] == 0 and r["est_jaccard_micro"] == 0

    def test_within_source_duplicates_do_not_inflate(self, spark):
        # s1 = {A}, s2 = {A, B}: true distinct-set Jaccard = 1/2.
        # s1 carrying 50 copies of A must not change the estimate.
        rows = (
            [(i, "s1", "doc A") for i in range(50)]
            + [(100, "s2", "doc A"), (101, "s2", "doc B")]
        )
        r = source_overlap_sketch(_docs_df(spark, rows), k=256).collect()[0]
        est = r["n_match"] / 256
        assert 0.3 < est < 0.7  # E=0.5, σ=0.031 — ±6σ band

    def test_invalid_k_raises(self, spark):
        with pytest.raises(ValueError):
            source_overlap_sketch(_docs_df(spark, [(1, "s", "t")]), k=0)


class TestTemperatureMixWeights:
    def _docs(self, spark):
        rows = (
            [(i, "big", 100) for i in range(90)]
            + [(100 + i, "small", 100) for i in range(10)]
        )
        return spark.createDataFrame(
            rows, "doc_id long, source string, n_chars long"
        )

    def test_alpha_one_matches_empirical_share(self, spark):
        out = {r["source"]: r for r in
               temperature_mix_weights(self._docs(spark), alpha=1.0).collect()}
        assert out["big"]["p_micro"] == 900_000
        # q == p up to the double quantization floor
        assert abs(out["big"]["q_micro"] - 900_000) <= 2
        assert abs(out["small"]["q_micro"] - 100_000) <= 2

    def test_alpha_zero_is_uniform(self, spark):
        out = {r["source"]: r for r in
               temperature_mix_weights(self._docs(spark), alpha=0.0).collect()}
        assert out["big"]["q_micro"] == out["small"]["q_micro"] == 500_000

    def test_alpha_flattens_monotonically(self, spark):
        flat = {r["source"]: r["q_micro"] for r in
                temperature_mix_weights(self._docs(spark), alpha=0.3).collect()}
        sharp = {r["source"]: r["q_micro"] for r in
                 temperature_mix_weights(self._docs(spark), alpha=0.7).collect()}
        assert flat["small"] > sharp["small"] > 100_000
        assert flat["big"] < sharp["big"] < 900_000

    def test_doc_count_mass_when_no_size_col(self, spark):
        out = {r["source"]: r for r in
               temperature_mix_weights(self._docs(spark), alpha=1.0,
                                       size_col=None).collect()}
        assert out["big"]["n_size"] == 90 and out["small"]["n_size"] == 10

    def test_negative_alpha_raises(self, spark):
        with pytest.raises(ValueError):
            temperature_mix_weights(self._docs(spark), alpha=-0.1)


class TestEpochPlan:
    def _docs(self, spark):
        rows = (
            [(i, "big", 1000) for i in range(90)]
            + [(100 + i, "small", 1000) for i in range(10)]
        )
        return spark.createDataFrame(
            rows, "doc_id long, source string, n_chars long"
        )

    def test_budget_split_and_epoch_math(self, spark):
        out = {r["source"]: r for r in
               epoch_plan(self._docs(spark), token_budget=100_000,
                          alpha=1.0).collect()}
        # alpha=1: requested ~ empirical shares of the budget
        assert abs(out["big"]["requested_tokens"] - 90_000) <= 2
        assert abs(out["small"]["requested_tokens"] - 10_000) <= 2
        # big: 90k requested over 90k available = 1 epoch, uncapped
        assert abs(out["big"]["epochs_micro"] - 1_000_000) <= 100
        assert out["big"]["capped"] == 0
        assert out["big"]["granted_tokens"] == out["big"]["requested_tokens"]

    def test_flattened_small_source_hits_the_cap(self, spark):
        # alpha=0 splits 50/50: small gets 300k over 10k available =
        # 30 epochs, capped at 4 -> granted 40k and flagged; big gets
        # 300k over 90k = 3.33 epochs, under the cap.
        out = {r["source"]: r for r in
               epoch_plan(self._docs(spark), token_budget=600_000,
                          alpha=0.0).collect()}
        assert out["small"]["capped"] == 1
        assert out["small"]["granted_tokens"] == 40_000
        assert out["small"]["epochs_micro"] == 30_000_000
        assert out["big"]["capped"] == 0
        assert out["big"]["granted_tokens"] == 300_000

    def test_invalid_args_raise(self, spark):
        with pytest.raises(ValueError):
            epoch_plan(self._docs(spark), token_budget=0)
        with pytest.raises(ValueError):
            epoch_plan(self._docs(spark), token_budget=10, max_epochs_micro=0)


class TestVocabCoverage:
    def test_oov_identified_against_top_vocab(self, spark):
        from batch_processing_analysis_spark.operators.text_analysis import (
            vocab_coverage,
        )
        # "common" appears in every doc (in-vocab at V=1); each doc
        # also carries one unique token (OOV at V=1).
        rows = [(i, "s", f"common unique{i}") for i in range(10)]
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )
        out = {r["doc_id"]: r for r in
               vocab_coverage(docs, vocab_size=1).collect()}
        assert all(r["n_tokens"] == 2 and r["n_oov"] == 1
                   and r["oov_micro"] == 500_000 for r in out.values())

    def test_full_vocab_covers_everything(self, spark):
        from batch_processing_analysis_spark.operators.text_analysis import (
            vocab_coverage,
        )
        docs = spark.createDataFrame(
            [(1, "a b c"), (2, "b c d"), (3, "")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in
               vocab_coverage(docs, vocab_size=10).collect()}
        assert out[1]["n_oov"] == out[2]["n_oov"] == 0
        # empty doc: zero tokens, rate pinned to 0 (not NULL/crash)
        assert out[3]["n_tokens"] == 0 and out[3]["oov_micro"] == 0

    def test_deterministic_tie_cut(self, spark):
        from batch_processing_analysis_spark.operators.text_analysis import (
            vocab_coverage,
        )
        # four tokens all freq=1: V=2 must keep the lexicographically
        # first two ("a", "b"), so "c"/"d" docs are fully OOV.
        docs = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c"), (4, "d")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["n_oov"] for r in
               vocab_coverage(docs, vocab_size=2).collect()}
        assert out == {1: 0, 2: 0, 3: 1, 4: 1}

    def test_invalid_vocab_size_raises(self, spark):
        import pytest as _pytest

        from batch_processing_analysis_spark.operators.text_analysis import (
            vocab_coverage,
        )
        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pytest.raises(ValueError):
            vocab_coverage(docs, vocab_size=0)
