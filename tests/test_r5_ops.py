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


# ---------------------------------------------------------------- M98

def _hash60_py(s: str) -> int:
    import hashlib
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_dsir_separates_target_vocab(spark):
    # Target (en) and raw (de) use disjoint vocabularies; unlabeled
    # docs of each vocabulary must take the matching weight sign.
    docs = _docs(spark, [
        (1, "alpha beta gamma alpha", "en", "s"),
        (2, "alpha gamma beta", "en", "s"),
        (3, "zork quux blorp zork", "de", "s"),
        (4, "quux blorp", "de", "s"),
        (5, "alpha beta gamma", "de", "s"),   # target vocab, raw label
        (6, "zork quux", "en", "s"),          # raw vocab, target label
    ])
    rows = {r["doc_id"]: r for r in
            TA.dsir_importance_weights(docs).collect()}
    # n_grams = tokens + bigrams
    assert rows[1]["n_grams"] == 4 + 3
    assert rows[5]["logw_micro"] > 0   # target-sounding doc upweighted
    assert rows[6]["logw_micro"] < 0   # raw-sounding doc downweighted


def test_dsir_exact_hand_recompute(spark):
    # One target doc "a", one raw doc "b": recompute the quantized
    # log-ratios bucket by bucket in plain Python.
    docs = _docs(spark, [
        (1, "a", "en", "s"),
        (2, "b", "de", "s"),
        (3, "", "de", "s"),
    ])
    m = 1024
    ba, bb = _hash60_py("a") % m, _hash60_py("b") % m
    tp, tn = 1, 1
    lr = {
        ba: math.floor((math.log(2 / (tp + m)) - math.log(1 / (tn + m)))
                       * 1e6 + 0.5),
        bb: math.floor((math.log(1 / (tp + m)) - math.log(2 / (tn + m)))
                       * 1e6 + 0.5),
    }
    rows = {r["doc_id"]: r for r in
            TA.dsir_importance_weights(docs).collect()}
    assert rows[1]["logw_micro"] == lr[ba] and rows[1]["n_grams"] == 1
    assert rows[2]["logw_micro"] == lr[bb]
    assert rows[3]["n_grams"] == 0 and rows[3]["logw_micro"] == 0


# ---------------------------------------------------------------- M99

def test_dup_span_flags_shared_spans_only(spark):
    shared = "one two three four five"
    docs = _docs(spark, [
        (1, shared + " tail1 tail2", "en", "s"),
        (2, "head " + shared, "en", "s"),
        (3, "all unique words here nothing shared", "en", "s"),
        (4, "short doc", "en", "s"),
    ])
    from batch_processing_analysis_spark.operators import dedup as D
    rows = {r["doc_id"]: r for r in D.dup_span_stats(docs, w=5).collect()}
    # doc1: 7 tokens -> 3 spans; only the leading one is shared
    assert rows[1]["n_spans"] == 3 and rows[1]["dup_spans"] == 1
    assert rows[1]["dup_rate_micro"] == 1_000_000 // 3
    # doc2: 6 tokens -> 2 spans; the trailing one is shared
    assert rows[2]["n_spans"] == 2 and rows[2]["dup_spans"] == 1
    assert rows[3]["dup_spans"] == 0
    assert rows[4]["n_spans"] == 0 and rows[4]["dup_rate_micro"] == 0


def test_dup_span_within_doc_repeat_not_dup(spark):
    # The same span repeated inside ONE doc is not duplication across
    # documents (countDistinct docs == 1).
    t = "a b c d e a b c d e"   # 10 tokens, 6 spans, span1==span6
    docs = _docs(spark, [(1, t, "en", "s")])
    from batch_processing_analysis_spark.operators import dedup as D
    r = D.dup_span_stats(docs, w=5).collect()[0]
    assert r["n_spans"] == 6 and r["dup_spans"] == 0


# ---------------------------------------------------------------- M100

def test_fertility_exact_integer_ratios(spark):
    docs = _docs(spark, [
        (1, "ab cd", "en", "s"),        # 2 words, 2 tokens, 5 chars
        (2, "ab, cd!", "en", "s"),      # 2 words, 4 tokens, 7 chars
        (3, "", "xx", "s"),             # zero words -> 0 ratios
    ])
    rows = {r["lang"]: r for r in TA.fertility_stats(docs).collect()}
    en = rows["en"]
    assert en["n_docs"] == 2 and en["n_words"] == 4
    assert en["n_tokens"] == 6 and en["n_chars"] == 12
    assert en["fertility_micro"] == 6 * 1_000_000 // 4
    assert en["chars_per_token_micro"] == 12 * 1_000_000 // 6
    xx = rows["xx"]
    assert xx["n_words"] == 0 and xx["fertility_micro"] == 0
    assert xx["chars_per_token_micro"] == 0


def test_jsd_tokenless_group_still_paired_at_ln2(spark):
    # A group whose docs contain zero tokens never reaches the
    # (group, token) counts; it must still appear in every pair, at
    # the empty-overlap ln2 maximum (ADVICE r5 fix).
    docs = _docs(spark, [
        (1, "a b c", "en", "s1"),
        (2, "a b x", "en", "s2"),
        (3, "   ", "en", "s3"),  # whitespace only -> zero tokens
    ])
    rows = {(r["group_a"], r["group_b"]): r
            for r in TA.js_divergence_matrix(docs).collect()}
    assert set(rows) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    for pair in (("s1", "s3"), ("s2", "s3")):
        assert rows[pair]["n_common_tokens"] == 0
        assert rows[pair]["jsd_nano"] == 693147181
    assert 0 < rows[("s1", "s2")]["jsd_nano"] < 693147181
