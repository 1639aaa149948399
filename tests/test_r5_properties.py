"""Property-based invariants for the final-r5 operators (hypothesis).

Spark round-trips are expensive, so the strategy mirrors
tests/test_asof_join.py: few examples, no shrink-heavy deadlines, each
example a full parity check against a plain-Python reference —
edjoin_pairs vs DP levenshtein over adversarial mutation corpora, and
unimax_plan's exact-allocation invariants over random size/budget
draws."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from batch_processing_analysis_spark.operators import dedup as DD
from batch_processing_analysis_spark.operators import mixing as MX
from tests.test_r5d_ops import _brute_ed_pairs, _water_fill


@pytest.fixture(scope="module")
def hspark(spark):
    return spark


# --- edjoin: corpora built from a tiny alphabet + random edit chains,
# the worst case for q-gram selectivity and the richest in boundary
# pairs (dist exactly d, tiny strings, empty strings).

_alpha = st.sampled_from("ab ")


def _apply_edits(rng_draw, s: list, n: int) -> list:
    for _ in range(n):
        op = rng_draw(st.integers(0, 2))
        p = rng_draw(st.integers(0, max(0, len(s) - 1)))
        if op == 0 and s:
            s[p] = rng_draw(_alpha)
        elif op == 1:
            s.insert(rng_draw(st.integers(0, len(s))), rng_draw(_alpha))
        elif s:
            del s[p]
    return s


@st.composite
def _corpus(draw):
    base = ["".join(draw(st.lists(_alpha, min_size=0, max_size=25)))
            for _ in range(draw(st.integers(2, 5)))]
    items, i = [], 0
    for t in base:
        items.append((i, t)); i += 1
        for _ in range(draw(st.integers(0, 2))):
            mut = _apply_edits(draw, list(t), draw(st.integers(1, 6)))
            items.append((i, "".join(mut))); i += 1
    return items


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(items=_corpus(), d=st.sampled_from([0, 1, 3, 5]),
       q=st.sampled_from([2, 3, 4]))
def test_edjoin_always_matches_dp_reference(hspark, items, d, q):
    df = hspark.createDataFrame(items, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["dist"]
           for r in DD.edjoin_pairs(df, d=d, q=q).collect()}
    assert got == _brute_ed_pairs(items, d)


# --- ppjoin: word-set corpora with graded overlap; every threshold.

_word = st.sampled_from([f"w{i}" for i in range(12)])


@st.composite
def _set_corpus(draw):
    docs = []
    for i in range(draw(st.integers(2, 6))):
        words = draw(st.lists(_word, min_size=0, max_size=10))
        docs.append((i, " ".join(words)))
    return docs


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(items=_set_corpus(), t_pct=st.sampled_from([1, 30, 50, 80, 100]))
def test_ppjoin_always_matches_set_reference(hspark, items, t_pct):
    from tests.test_r5c_ops import _brute_jaccard_pairs

    got = {(r["id_a"], r["id_b"]): r["jac_micro"]
           for r in DD.ppjoin_pairs(
               hspark.createDataFrame(items, "doc_id long, text string"),
               t_pct=t_pct, k=1).collect()}
    assert got == _brute_jaccard_pairs(items, t_pct)


# --- unimax: allocation invariants on random draws.

@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(sizes=st.lists(st.integers(0, 3000), min_size=1, max_size=12),
       budget=st.integers(0, 20_000),
       me=st.sampled_from([500_000, 1_000_000, 3_000_000]))
def test_unimax_invariants_and_reference_parity(hspark, sizes, budget, me):
    named = {f"s{i:02d}": n for i, n in enumerate(sizes)}
    caps, alloc, short = _water_fill(named, budget, me)
    rows = [(i, s, n) for i, (s, n) in enumerate(named.items())]
    df = hspark.createDataFrame(rows,
                                "doc_id long, source string, n_chars long")
    got = {r["source"]: r for r in
           MX.unimax_plan(df, budget, max_epochs_micro=me).collect()}
    assert {s: r["alloc_tokens"] for s, r in got.items()} == alloc
    assert sum(r["alloc_tokens"] for r in got.values()) == \
        min(budget, sum(caps.values()))
    for s, r in got.items():
        assert 0 <= r["alloc_tokens"] <= caps[s]
        assert r["short_tokens"] == short
