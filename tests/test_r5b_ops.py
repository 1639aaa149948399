"""Round-5 late additions: split-leakage audit (M101), stupid-backoff
scoring (M102), PMI collocations (M103), lexical richness (M104),
classifier calibration (M105) — handcrafted semantics recomputed in
plain Python, plus the contract edges each docstring claims."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from batch_processing_analysis_spark.operators import ordering as ORD
from batch_processing_analysis_spark.operators import text_analysis as TA


def _docs(spark, items):
    return spark.createDataFrame(
        items, "doc_id long, text string, lang string, source string"
    )


def _micro(x: float) -> int:
    return math.floor(x * 1e6 + 0.5)


def _split_of(seed: str, key: str,
              bands=(("train", 800000), ("val", 900000),
                     ("test", 1000000))) -> str:
    u = int(hashlib.md5(f"{seed}\x1f{key}".encode()).hexdigest()[:15],
            16) % 1_000_000
    for label, hi in bands:
        if u < hi:
            return label
    raise AssertionError("bands not exhaustive")


FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}


# --------------------------------------------------------------- M101

def test_leakage_within_group_pairs_are_diagonal(spark):
    # Identical docs in the SAME source always share a split (grouped
    # hash), so their pair is diagonal by construction.
    t1 = "alpha beta gamma delta epsilon zeta eta theta"
    t2 = "omega psi chi phi upsilon tau sigma rho"
    docs = _docs(spark, [
        (1, t1, "en", "sA"), (2, t1, "en", "sA"),
        (3, t2, "en", "sB"), (4, t2, "en", "sB"),
    ])
    rows = ORD.split_leakage_audit(
        docs, FRACS, "s1", group_col="source", df_max=10, threshold=0.5
    ).collect()
    sa, sb = _split_of("s1", "sA"), _split_of("s1", "sB")
    expect = {}
    for s in (sa, sb):
        expect.setdefault((s, s), [0, set()])
    expect[(sa, sa)][0] += 1
    expect[(sa, sa)][1] |= {1, 2}
    expect[(sb, sb)][0] += 1
    expect[(sb, sb)][1] |= {3, 4}
    got = {(r["split_lo"], r["split_hi"]): (r["n_pairs"], r["n_docs"])
           for r in rows}
    assert got == {k: (v[0], len(v[1])) for k, v in expect.items()}


def test_leakage_cross_group_pair_crosses_split(spark):
    # Find two sources the seeded hash routes to DIFFERENT splits and
    # plant an identical doc in each: the audit must report one
    # off-diagonal (leak) row.
    names = [f"src{i}" for i in range(200)]
    s_train = next(n for n in names if _split_of("s1", n) == "train")
    s_test = next(n for n in names if _split_of("s1", n) == "test")
    t = "one two three four five six seven eight nine ten"
    docs = _docs(spark, [
        (1, t, "en", s_train),
        (2, t, "en", s_test),
    ])
    rows = ORD.split_leakage_audit(
        docs, FRACS, "s1", group_col="source"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["split_lo"], r["split_hi"]) == ("test", "train")
    assert r["n_pairs"] == 1 and r["n_docs"] == 2


# --------------------------------------------------------------- M102

def test_backoff_three_tiers_hand_recomputed(spark):
    # Model slice (lang en): "a b", "a c" -> bigrams (a,b),(a,c);
    # unigrams a:2 b:1 c:1, N=4.
    docs = _docs(spark, [
        (1, "a b", "en", "s"),
        (2, "a c", "en", "s"),
        (3, "a b d", "de", "s"),   # (a,b) hit; (b,d) OOV (d unseen)
        (4, "c a", "de", "s"),     # (c,a): prefix-miss, 'a' backs off
    ])
    out = {r["doc_id"]: r for r in TA.backoff_logprob(
        docs, F.col("lang") == "en", alpha=0.4).collect()}
    q_ab = _micro(-math.log(1 / 2))          # c(a,b)/c(a·) = 1/2
    q_oov = _micro(-math.log(0.4 / 4))
    q_back_a = _micro(-math.log(0.4 * 2 / 4))
    r3 = out[3]
    assert (r3["n_bigrams"], r3["n_hits"], r3["n_backoffs"], r3["n_oov"]) \
        == (2, 1, 0, 1)
    assert r3["sum_neglogs_micro"] == q_ab + q_oov
    assert r3["avg_neglogs_micro"] == math.floor((q_ab + q_oov) / 2)
    r4 = out[4]
    assert (r4["n_bigrams"], r4["n_hits"], r4["n_backoffs"], r4["n_oov"]) \
        == (1, 0, 1, 0)
    assert r4["sum_neglogs_micro"] == q_back_a


def test_backoff_short_doc_zero_contract(spark):
    docs = _docs(spark, [
        (1, "a b", "en", "s"),
        (2, "solo", "de", "s"),
        (3, "", "de", "s"),
    ])
    out = {r["doc_id"]: r for r in TA.backoff_logprob(
        docs, F.col("lang") == "en").collect()}
    for i in (2, 3):
        assert out[i]["n_bigrams"] == 0
        assert out[i]["sum_neglogs_micro"] == 0
        assert out[i]["avg_neglogs_micro"] == 0


# --------------------------------------------------------------- M103

def test_pmi_hand_recomputed(spark):
    # "a b a b": bigrams (a,b)x2, (b,a)x1; "c d": (c,d)x1.
    # unigrams: a:2 b:2 c:1 d:1, NT=6; NB=4.
    docs = _docs(spark, [
        (1, "a b a b", "en", "s"),
        (2, "c d", "en", "s"),
    ])
    rows = TA.pmi_collocations(docs, min_count=1, k=10).collect()

    def nano(cb, c1, c2, nb=4, nt=6):
        return math.floor(
            math.log((cb / nb) / ((c1 / nt) * (c2 / nt))) * 1e9 + 0.5)

    expect = sorted([
        ("a", "b", 2, nano(2, 2, 2)),
        ("b", "a", 1, nano(1, 2, 2)),
        ("c", "d", 1, nano(1, 1, 1)),
    ], key=lambda t: (-t[3], t[0], t[1]))
    got = [(r["w1"], r["w2"], r["n_pair"], r["pmi_nano"]) for r in rows]
    assert got == expect


def test_pmi_min_count_filters_rare_pairs(spark):
    docs = _docs(spark, [
        (1, "a b a b", "en", "s"),
        (2, "c d", "en", "s"),
    ])
    rows = TA.pmi_collocations(docs, min_count=2, k=10).collect()
    assert [(r["w1"], r["w2"]) for r in rows] == [("a", "b")]


# --------------------------------------------------------------- M104

def test_lexical_richness_hand_recomputed(spark):
    docs = _docs(spark, [
        (1, "a a b", "en", "s1"),
        (2, "b c", "en", "s1"),
        (3, "x", "en", "s2"),
    ])
    got = {r["source"]: r for r in TA.lexical_richness(docs).collect()}
    r1 = got["s1"]
    assert (r1["n_tokens"], r1["vocab_size"], r1["n_hapax"]) == (5, 3, 1)
    assert r1["ttr_micro"] == math.floor(3 * 1e6 / 5)
    assert r1["hapax_frac_micro"] == math.floor(1 * 1e6 / 3)
    r2 = got["s2"]
    assert (r2["n_tokens"], r2["vocab_size"], r2["n_hapax"]) == (1, 1, 1)
    assert r2["ttr_micro"] == 1_000_000
    assert r2["hapax_frac_micro"] == 1_000_000


# --------------------------------------------------------------- M105

def test_calibration_banded_rank_equals_global_order(spark):
    # 12 docs with well-separated scores: the banded two-phase rank
    # must reproduce the plain sorted order (deciles recomputed in
    # Python from the collected NB scores).
    items = []
    for i in range(6):
        items.append((i, " ".join(["pos"] * (i + 1)), "en", "s"))
    for i in range(6, 12):
        items.append((i, " ".join(["neg"] * (i - 5)), "de", "s"))
    docs = _docs(spark, items)
    scored = sorted(
        ((r["score_micro"], r["doc_id"]) for r in
         TA.nb_class_scores(docs).collect()),
    )
    n = len(scored)
    label = {i: (1 if i < 6 else 0) for i in range(12)}
    expect = {}
    for r, (s, d) in enumerate(scored):
        b = (r * 10) // n  # exact-multiple-free by the N<2^50 argument
        e = expect.setdefault(b, [0, 0, None, None])
        e[0] += 1
        e[1] += label[d]
        e[2] = s if e[2] is None else min(e[2], s)
        e[3] = s if e[3] is None else max(e[3], s)
    rows = TA.classifier_calibration(docs).collect()
    got = {r["bin"]: (r["n_docs"], r["n_pos"], r["min_score_micro"],
                      r["max_score_micro"]) for r in rows}
    assert got == {b: (e[0], e[1], e[2], e[3]) for b, e in expect.items()}
    for r in rows:
        assert r["pos_rate_micro"] == math.floor(
            r["n_pos"] * 1e6 / r["n_docs"])


def test_calibration_degenerate_all_equal_scores(spark):
    # Identical docs -> identical scores -> single band; ranks fall
    # back to the id tiebreak and bins stay equal-population.
    docs = _docs(spark, [
        (i, "same text here", "en", "s") for i in range(10)
    ])
    rows = TA.classifier_calibration(docs).collect()
    assert sorted(r["bin"] for r in rows) == list(range(10))
    assert all(r["n_docs"] == 1 for r in rows)
    assert all(r["min_score_micro"] == r["max_score_micro"] for r in rows)


# --------------------------------------------------------------- M106

def test_quality_funnel_hand_recomputed(spark):
    from batch_processing_analysis_spark.operators import validation as V
    df = spark.createDataFrame(
        [(1, 10, 1), (2, 50, 1), (3, 50, 0), (4, 200, 0)],
        "id long, size long, flag long",
    )
    rows = V.quality_funnel(df, [
        ("big_enough", F.col("size") >= 20),     # drops 1 -> 3 left
        ("flag_set", F.col("flag") == 1),        # drops 3,4 -> 1 left
        ("not_too_big", F.col("size") <= 100),   # 2 passes -> 1 left
    ]).collect()
    got = [(r["stage_idx"], r["stage"], r["n_in"], r["n_out"],
            r["n_dropped"], r["pass_rate_micro"]) for r in rows]
    assert got == [
        (0, "big_enough", 4, 3, 1, 750000),
        (1, "flag_set", 3, 1, 2, 333333),
        (2, "not_too_big", 1, 1, 0, 1000000),
    ]


def test_quality_funnel_rejects_empty_gates(spark):
    import pytest
    from batch_processing_analysis_spark.operators import validation as V
    df = spark.range(3)
    with pytest.raises(ValueError):
        V.quality_funnel(df, [])


# --------------------------------------------------------------- M107

def test_packing_efficiency_hand_recomputed(spark):
    # ctx=10. s1: docs of 7, 8, 12 tokens -> T=27, packed=3 (waste 3),
    # padded=1+1+2=4 contexts (waste 13).
    docs = _docs(spark, [
        (1, " ".join(["t"] * 7), "en", "s1"),
        (2, " ".join(["t"] * 8), "en", "s1"),
        (3, " ".join(["t"] * 12), "en", "s1"),
        (4, "", "en", "s2"),
    ])
    got = {r["source"]: r for r in
           ORD.packing_efficiency(docs, ctx_len=10).collect()}
    r1 = got["s1"]
    assert (r1["n_docs"], r1["total_tokens"]) == (3, 27)
    assert (r1["packed_contexts"], r1["packed_waste"]) == (3, 3)
    assert (r1["padded_contexts"], r1["padded_waste"]) == (4, 13)
    assert r1["packed_util_micro"] == math.floor(27 * 1e6 / 30)
    assert r1["padded_util_micro"] == math.floor(27 * 1e6 / 40)
    r2 = got["s2"]  # empty doc: zero tokens, zero contexts, util 0
    assert (r2["total_tokens"], r2["packed_contexts"],
            r2["padded_contexts"], r2["packed_util_micro"]) == (0, 0, 0, 0)


def test_packing_efficiency_rejects_bad_ctx(spark):
    import pytest
    docs = _docs(spark, [(1, "a b", "en", "s")])
    with pytest.raises(ValueError):
        ORD.packing_efficiency(docs, ctx_len=0)


# --------------------------------------------------------------- M108

def test_dup_cluster_sizes_hand_recomputed(spark):
    from batch_processing_analysis_spark.operators import graph as G
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        "doc_id long, component long",
    )
    got = {r["cluster_size"]: (r["n_clusters"], r["n_docs"])
           for r in G.dup_cluster_sizes(comps).collect()}
    assert got == {3: (1, 3), 1: (1, 1), 2: (1, 2)}


# --------------------------------------------------------------- M109

def test_stratified_quotas_hamilton_hand_case(spark):
    # counts: a=5, b=3, c=2 (N=10), k=4 -> exact shares 2.0/1.2/0.8,
    # bases 2/1/0, remainders 0/2/8 -> 1 leftover goes to c.
    items = []
    did = 0
    for g, n in (("a", 5), ("b", 3), ("c", 2)):
        for _ in range(n):
            items.append((did, "t", g, "s"))
            did += 1
    docs = _docs(spark, items)
    rows = {r["lang"]: r for r in ORD.stratified_quotas(
        docs, k=4, group_col="lang", seed="ev").collect()}
    assert {g: rows[g]["quota"] for g in "abc"} == {"a": 2, "b": 1, "c": 1}
    assert sum(r["quota"] for r in rows.values()) == 4
    # selection: replicate the seeded hash order in Python
    for g, n0, n1 in (("a", 0, 5), ("b", 5, 8), ("c", 8, 10)):
        ids = list(range(n0, n1))
        order = sorted(ids, key=lambda d: (int(hashlib.md5(
            f"ev:{d}".encode()).hexdigest()[:15], 16), d))
        want = order[: rows[g]["quota"]]
        assert rows[g]["n_selected"] == len(want)
        assert rows[g]["sel_id_sum"] == sum(want)


def test_stratified_quotas_remainder_tie_breaks_on_group(spark):
    # Two groups with IDENTICAL remainders: the extra slot must go to
    # the lexicographically smaller group. a=1, b=1 (N=2), k=1:
    # bases 0/0, remainders 1/1 -> slot to 'a'.
    docs = _docs(spark, [(1, "t", "a", "s"), (2, "t", "b", "s")])
    rows = {r["lang"]: r["quota"] for r in ORD.stratified_quotas(
        docs, k=1, group_col="lang", seed="ev").collect()}
    assert rows == {"a": 1, "b": 0}


# --------------------------------------------------------------- M110

def test_banded_rank_parity_with_sorted_order(spark):
    # Keys spanning negatives, duplicates, and a huge outlier so the
    # equal-width bands are lopsided — rank must still equal the
    # plain-sorted position with the id tiebreak.
    keys = [5, -3, 0, 5, 99999, -3, 7, 1, 0, -50]
    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys)], "doc_id long, k long"
    )
    got = {r["doc_id"]: r["rank"] for r in
           ORD.banded_global_rank(df, "k", "doc_id", n_bands=4).collect()}
    want = {d: r for r, (k, d) in enumerate(
        sorted((k, i) for i, k in enumerate(keys)))}
    assert got == want


def test_rrf_fuse_hand_recomputed(spark):
    # Two signals over 3 docs; ranks and fused scores by hand (k=60).
    df = spark.createDataFrame(
        [(1, 10, 300), (2, 20, 100), (3, 30, 200)],
        "doc_id long, s1 long, s2 long",
    )
    rows = ORD.rrf_fuse(df, [("a", "s1"), ("b", "s2")],
                        k_const=60, top_k=3).collect()
    # ranks asc by key: s1 -> 1:0 2:1 3:2 ; s2 -> 2:0 3:1 1:2
    def c(r):
        return math.floor(1e9 / (60 + r + 1))
    want = {1: c(0) + c(2), 2: c(1) + c(0), 3: c(2) + c(1)}
    got = {r["doc_id"]: r["rrf_score"] for r in rows}
    assert got == want
    order = [r["doc_id"] for r in rows]
    assert order == sorted(want, key=lambda d: (-want[d], d))


def test_rrf_fuse_rejects_empty_signals(spark):
    import pytest
    df = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        ORD.rrf_fuse(df, [])


def test_stratified_quotas_k_exceeding_n_fails_loudly(spark):
    # k > N silently over-apportioned before the ADVICE r5 fix; the
    # embedded assert_true guard must abort the job instead.
    import pytest
    docs = _docs(spark, [(1, "t", "a", "s"), (2, "t", "b", "s")])
    with pytest.raises(Exception, match="exceeds total row count"):
        ORD.stratified_quotas(docs, k=3, group_col="lang",
                              seed="ev").collect()
    # boundary k == N is legal (every row selected)
    rows = {r["lang"]: r for r in ORD.stratified_quotas(
        docs, k=2, group_col="lang", seed="ev").collect()}
    assert {g: rows[g]["quota"] for g in "ab"} == {"a": 1, "b": 1}


def test_stratified_quotas_negative_k_rejected(spark):
    import pytest
    docs = _docs(spark, [(1, "t", "a", "s")])
    with pytest.raises(ValueError, match="k must be >= 0"):
        ORD.stratified_quotas(docs, k=-1, group_col="lang")
