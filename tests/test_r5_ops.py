"""Round-5 operator additions: Naive-Bayes seed classifier (M95),
Jensen-Shannon source divergence (M96), striped longest-first packing
(M97) — handcrafted semantics plus the scale-shape invariants each
docstring claims."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from batch_processing_analysis_spark.operators import ordering as ORD
from batch_processing_analysis_spark.operators import text_analysis as TA


def _docs(spark, items):
    return spark.createDataFrame(
        items, "doc_id long, text string, lang string, source string"
    )


# ---------------------------------------------------------------- M95

def test_nb_separates_planted_classes(spark):
    # Positive seed uses disjoint vocabulary from the negative seed;
    # a held-out-style doc of each vocabulary must land on its side.
    docs = _docs(spark, [
        (1, "alpha beta gamma", "en", "s"),
        (2, "alpha beta beta", "en", "s"),
        (3, "zork quux blorp", "de", "s"),
        (4, "quux quux zork", "de", "s"),
        (5, "alpha gamma", "??", "s"),   # en-vocab doc, unlabeled
        (6, "blorp zork", "??", "s"),    # de-vocab doc, unlabeled
    ])
    rows = {r["doc_id"]: r for r in TA.nb_class_scores(docs).collect()}
    assert rows[5]["score_micro"] > 0 and rows[5]["predicted"] == 1
    assert rows[6]["score_micro"] < 0 and rows[6]["predicted"] == 0
    # labeled docs classify as their own class
    assert rows[1]["predicted"] == 1 and rows[3]["predicted"] == 0


def test_nb_prior_only_for_empty_doc(spark):
    docs = _docs(spark, [
        (1, "x y", "en", "s"),
        (2, "x z", "de", "s"),
        (3, "", "de", "s"),
    ])
    rows = {r["doc_id"]: r for r in TA.nb_class_scores(docs).collect()}
    # prior = ln((1+1)/(2+1)) in micros, exactly the quantized constant
    exp = math.floor(math.log(2 / 3) * 1e6 + 0.5)
    assert rows[3]["n_tokens"] == 0
    assert rows[3]["score_micro"] == exp


def test_nb_score_is_exact_integer_sum(spark):
    # Quantize-then-sum: per-doc score equals the sum of its tokens'
    # quantized weights plus the quantized prior, recomputed in Python.
    docs = _docs(spark, [
        (1, "a a b", "en", "s"),
        (2, "b c", "de", "s"),
        (3, "a c c", "de", "s"),
    ])
    rows = {r["doc_id"]: r for r in TA.nb_class_scores(docs).collect()}
    # model: cp/cn per token over {a:(2,1) b:(1,1) c:(0,3)};
    # Tp=3, Tn=5, V=3, Np=1, Nn=2
    def w(cp, cn):
        return math.floor(
            (math.log((cp + 1) / (3 + 3)) - math.log((cn + 1) / (5 + 3)))
            * 1e6 + 0.5
        )
    prior = math.floor((math.log(2) - math.log(3)) * 1e6 + 0.5)
    assert rows[1]["score_micro"] == prior + 2 * w(2, 1) + w(1, 1)
    assert rows[3]["score_micro"] == prior + w(2, 1) + 2 * w(0, 3)


# ---------------------------------------------------------------- M96

def test_jsd_identical_distributions_is_zero(spark):
    docs = _docs(spark, [
        (1, "a b c", "en", "s1"),
        (2, "a b c", "en", "s2"),
    ])
    r, = TA.js_divergence_matrix(docs).collect()
    assert (r["group_a"], r["group_b"]) == ("s1", "s2")
    assert r["n_common_tokens"] == 3
    assert r["jsd_nano"] == 0


def test_jsd_disjoint_distributions_is_ln2(spark):
    docs = _docs(spark, [
        (1, "a b", "en", "s1"),
        (2, "x y z", "en", "s2"),
    ])
    r, = TA.js_divergence_matrix(docs).collect()
    assert r["n_common_tokens"] == 0
    assert r["jsd_nano"] == 693147181  # floor(ln2 * 1e9 + 0.5)


def test_jsd_matrix_covers_all_pairs_and_bounds(spark):
    docs = _docs(spark, [
        (1, "a b c d", "en", "s1"),
        (2, "a b x y", "en", "s2"),
        (3, "a q", "en", "s3"),
    ])
    rows = TA.js_divergence_matrix(docs).collect()
    assert {(r["group_a"], r["group_b"]) for r in rows} == {
        ("s1", "s2"), ("s1", "s3"), ("s2", "s3"),
    }
    for r in rows:
        assert 0 <= r["jsd_nano"] <= 693147181


# ---------------------------------------------------------------- M97

def test_striped_pack_matches_global_rank(spark):
    # The banded two-phase rank must equal the exact global
    # (size desc, id asc) row_number — compare against a driver-side
    # sort of the same rows, across band boundaries and ties.
    items = [(i, "", "en", "s", (i * 37) % 200) for i in range(300)]
    df = spark.createDataFrame(
        items, "doc_id long, text string, lang string, source string, "
               "n_chars long"
    )
    got = {
        r["doc_id"]: r["bin"]
        for r in ORD.striped_pack(df, n_bins=7, band_step=16,
                                  n_bands=8).collect()
    }
    order = sorted(items, key=lambda t: (-t[4], t[0]))
    for rank, item in enumerate(order):
        assert got[item[0]] == rank % 7


def test_striped_pack_balances_loads(spark):
    # With striping, per-bin load stays within one max-item of ideal.
    items = [(i, "", "en", "s", 1000 - 3 * i) for i in range(200)]
    df = spark.createDataFrame(
        items, "doc_id long, text string, lang string, source string, "
               "n_chars long"
    )
    packed = ORD.striped_pack(df, n_bins=8)
    loads = [
        r["load"] for r in
        packed.groupBy("bin").agg(F.sum("n_chars").alias("load")).collect()
    ]
    assert len(loads) == 8
    ideal = sum(t[4] for t in items) / 8
    assert max(loads) - min(loads) <= 1000  # one max-item bound
    assert all(abs(x - ideal) <= 1000 for x in loads)


def test_striped_pack_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, 5)], "doc_id long, n_chars long")
    for kwargs in ({"n_bins": 0}, {"n_bins": 2, "band_step": 0},
                   {"n_bins": 2, "n_bands": 0}):
        try:
            ORD.striped_pack(df, **kwargs)
            raise AssertionError(f"expected ValueError for {kwargs}")
        except ValueError:
            pass
