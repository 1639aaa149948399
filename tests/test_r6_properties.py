"""Property-based invariants for the round-6 exact joins (hypothesis,
the tests/test_r5_properties.py protocol: few examples, no deadlines,
each example a full parity check against a plain-Python reference):

- containment_pairs vs brute ordered set containment at every
  threshold — the asymmetric prefix bound's boundary behavior;
- ppjoin_increment_pairs vs (brute batch pairs minus base-internal) —
  the delta-pinned prefix + per-pair index condition can only lose
  recall at boundaries, which is exactly what random small corpora
  probe;
- ks_drift_by_group vs the integer brute reference.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from batch_processing_analysis_spark.operators import dedup as DD
from batch_processing_analysis_spark.operators.incremental import (
    ppjoin_increment_pairs,
)
from tests.test_r6_ops import _brute_containment, _brute_ks


@pytest.fixture(scope="module")
def hspark(spark):
    return spark


_word = st.sampled_from([f"w{i}" for i in range(10)])


@st.composite
def _set_corpus(draw):
    docs = []
    for i in range(draw(st.integers(2, 6))):
        words = draw(st.lists(_word, min_size=0, max_size=10))
        docs.append((i, " ".join(words)))
    return docs


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(items=_set_corpus(), c_pct=st.sampled_from([1, 30, 50, 80, 100]))
def test_containment_always_matches_set_reference(hspark, items, c_pct):
    got = {(r["id_a"], r["id_b"]): r["cont_micro"]
           for r in DD.containment_pairs(
               hspark.createDataFrame(items, "doc_id long, text string"),
               c_pct=c_pct, k=1).collect()}
    assert got == _brute_containment(items, c_pct)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(items=_set_corpus(), t_pct=st.sampled_from([1, 30, 50, 80, 100]))
def test_ppjoin_increment_always_matches_delta_filtered_batch(
        hspark, items, t_pct):
    from tests.test_r5c_ops import _brute_jaccard_pairs

    df = hspark.createDataFrame(items, "doc_id long, text string")
    base = df.filter("doc_id % 2 = 0")
    delta = df.filter("doc_id % 2 = 1")
    got = {(r["id_a"], r["id_b"]): r["jac_micro"]
           for r in ppjoin_increment_pairs(base, delta, t_pct=t_pct,
                                           k=1).collect()}
    full = _brute_jaccard_pairs(items, t_pct)
    expect = {p: j for p, j in full.items()
              if p[0] % 2 == 1 or p[1] % 2 == 1}
    assert got == expect


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.dictionaries(
    st.sampled_from(["a", "b", "c"]),
    st.lists(st.integers(0, 8), min_size=1, max_size=12),
    min_size=2, max_size=3))
def test_ks_drift_always_matches_integer_reference(hspark, data):
    import math

    from batch_processing_analysis_spark.operators.events_analytics \
        import ks_drift_by_group

    rows = [(g, v) for g, vals in data.items() for v in vals]
    df = hspark.createDataFrame(rows, "source string, n_chars long")
    got = {r.source: (r.n_group, r.n_rest, r.ks_num, r.ks_denom,
                      r.ks_micro)
           for r in ks_drift_by_group(df).collect()}
    exp = _brute_ks(data)
    assert set(got) == set(exp)
    for g, (ng, nr, num) in exp.items():
        micro = (math.floor(num * 1_000_000 / (ng * nr))
                 if ng * nr > 0 else 0)
        assert got[g] == (ng, nr, num, ng * nr, micro), g


# --- aggregates: weighted median, novelty conservation, entropy bounds


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.tuples(st.sampled_from(["g", "h"]), st.integers(1, 40),
              st.integers(1, 9)),
    min_size=1, max_size=30))
def test_weighted_median_always_matches_reference(hspark, rows):
    from batch_processing_analysis_spark.operators.ordering import (
        weighted_median_by_group,
    )

    df = hspark.createDataFrame(rows, "source string, v long, w long")
    got = {r.source: (r.wmedian, r.total_weight, r.n_rows)
           for r in weighted_median_by_group(
               df, value_col="v", weight_col="w").collect()}
    for g in {g for g, _, _ in rows}:
        sub = [(v, w) for gg, v, w in rows if gg == g]
        total = sum(w for _, w in sub)
        cum = 0
        expect = None
        for v in sorted({v for v, _ in sub}):
            cum += sum(w for vv, w in sub if vv == v)
            if cum * 2 >= total:
                expect = v
                break
        assert got[g] == (expect, total, len(sub)), g


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(
    st.tuples(st.sampled_from(["s1", "s2", "s3"]),
              st.lists(st.sampled_from("abc"), min_size=8, max_size=14)),
    min_size=1, max_size=8))
def test_novelty_attribution_conserves_corpus_grams(hspark, texts):
    from batch_processing_analysis_spark.operators.text_analysis import (
        novelty_attribution,
    )

    items = [(i, " ".join(toks), "en", src)
             for i, (src, toks) in enumerate(texts)]
    df = hspark.createDataFrame(
        items, "doc_id long, text string, lang string, source string")
    rows = novelty_attribution(df).collect()
    # conservation: the firsts partition the corpus distinct gram set
    grams = set()
    for _, text, _, _ in items:
        toks = text.split()
        grams |= {" ".join(toks[i:i + 8])
                  for i in range(len(toks) - 7)}
    assert sum(r["n_grams_first"] for r in rows) == len(grams)
    for r in rows:
        assert 0 <= r["n_grams_first"] <= r["n_grams_seen"]
        # earliest source in key order owns everything it sees alone
    if rows:
        first_src = min(r["source"] for r in rows)
        fr = {r["source"]: r for r in rows}[first_src]
        assert fr["n_grams_first"] == fr["n_grams_seen"]


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(
    st.lists(st.sampled_from("abcd"), min_size=0, max_size=12),
    min_size=1, max_size=6))
def test_token_entropy_bounds_and_reference(hspark, docs):
    import math
    from collections import Counter

    from batch_processing_analysis_spark.operators.text_analysis import (
        token_entropy,
    )

    items = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = hspark.createDataFrame(items, "doc_id long, text string")
    got = {r.doc_id: r for r in token_entropy(df).collect()}
    for i, toks in enumerate(docs):
        c = Counter(toks)
        n = sum(c.values())
        expect = sum(
            math.floor(-(k / n) * math.log(k / n) * 1e9 + 0.5)
            for k in c.values()) if n else 0
        r = got[i]
        assert r["entropy_nano"] == expect
        # 0 <= H <= ln(vocab) + quantization slack
        assert 0 <= r["entropy_nano"] <= (
            math.floor(math.log(max(len(c), 1)) * 1e9) + len(c))
