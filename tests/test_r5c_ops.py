"""Round-5 additions, third batch: prefix-filtered exact similarity
join (M111) and two-pass exact heavy hitters (M112) — semantics
recomputed brute-force in plain Python, plus each docstring's contract
edges (threshold boundaries, partitioning independence, degenerate
inputs)."""

from __future__ import annotations

import itertools
import math

from pyspark.sql import functions as F

from batch_processing_analysis_spark.operators import dedup as DD
from batch_processing_analysis_spark.operators import sketches as SK


def _docs(spark, items):
    return spark.createDataFrame(items, "doc_id long, text string")


def _brute_jaccard_pairs(items, t_pct):
    """All-pairs exact word-set Jaccard in plain Python."""
    sets = {i: set(t.lower().split()) for i, t in items}
    out = {}
    for (a, sa), (b, sb) in itertools.combinations(sorted(sets.items()), 2):
        if not sa or not sb:
            continue
        i = len(sa & sb)
        u = len(sa | sb)
        if i * 100 >= t_pct * u:
            out[(a, b)] = math.floor(i * 1_000_000 / u)
    return out


# --------------------------------------------------------------- M111

def _corpus():
    """Deterministic corpus with overlap structure at several Jaccard
    levels: clusters of near-identical docs, partial overlaps, and
    singletons. Word sets only (duplicated words collapse)."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    words = base.split()
    items = []
    for d in range(8):  # cluster: drop d trailing words -> graded overlap
        items.append((d, " ".join(words[: 20 - d])))
    for d in range(8, 16):  # disjoint vocabulary, same shape
        items.append((d, " ".join(f"w{d}t{j}" for j in range(12))))
    items.append((16, " ".join(words[:10]) + " " + " ".join(
        f"w8t{j}" for j in range(6))))  # bridges two groups
    items.append((17, ""))  # empty
    items.append((18, "alpha"))  # single token
    items.append((19, "alpha alpha alpha"))  # collapses to single token
    return items


def test_ppjoin_matches_bruteforce_t50(spark):
    items = _corpus()
    got = {
        (r.id_a, r.id_b): r.jac_micro
        for r in DD.ppjoin_pairs(_docs(spark, items), t_pct=50, k=1).collect()
    }
    assert got == _brute_jaccard_pairs(items, 50)


def test_ppjoin_matches_bruteforce_t80(spark):
    items = _corpus()
    got = {
        (r.id_a, r.id_b): r.jac_micro
        for r in DD.ppjoin_pairs(_docs(spark, items), t_pct=80, k=1).collect()
    }
    assert got == _brute_jaccard_pairs(items, 80)


def test_ppjoin_threshold_boundary_inclusive(spark):
    # J exactly 0.5: |A|=|B|=3, i=2 -> 2/4 = 0.5 -> kept (>=).
    # J just under: |A|=|B|=2, i=1 -> 1/3 -> dropped at t=50.
    docs = _docs(spark, [
        (1, "a b c"), (2, "a b d"),   # J = 2/4 = 0.5
        (3, "p q"), (4, "p r"),       # J = 1/3
    ])
    got = {(r.id_a, r.id_b): r.jac_micro
           for r in DD.ppjoin_pairs(docs, t_pct=50, k=1).collect()}
    assert got == {(1, 2): 500_000}


def test_ppjoin_identical_docs_and_case_fold(spark):
    docs = _docs(spark, [(1, "Alpha Beta"), (2, "alpha beta"),
                         (3, "beta alpha  beta")])
    got = {(r.id_a, r.id_b): r.jac_micro
           for r in DD.ppjoin_pairs(docs, t_pct=90, k=1).collect()}
    assert got == {(1, 2): 1_000_000, (1, 3): 1_000_000,
                   (2, 3): 1_000_000}


def _brute_shingle_pairs(items, t_pct, k):
    sets = {}
    for i, t in items:
        ws = t.lower().split()
        sets[i] = {" ".join(ws[j:j + k]) for j in range(len(ws) - k + 1)}
    out = {}
    for (a, sa), (b, sb) in itertools.combinations(sorted(sets.items()), 2):
        if not sa or not sb:
            continue
        i = len(sa & sb)
        u = len(sa | sb)
        if i * 100 >= t_pct * u:
            out[(a, b)] = math.floor(i * 1_000_000 / u)
    return out


def test_ppjoin_shingles_k3_matches_bruteforce(spark):
    items = _corpus()
    got = {
        (r.id_a, r.id_b): r.jac_micro
        for r in DD.ppjoin_pairs(_docs(spark, items), t_pct=40,
                                 k=3).collect()
    }
    assert got == _brute_shingle_pairs(items, 40, 3)


def test_ppjoin_rejects_bad_threshold(spark):
    import pytest
    with pytest.raises(ValueError):
        DD.ppjoin_pairs(_docs(spark, [(1, "a")]), t_pct=0)


# --------------------------------------------------------------- M112

def _items(spark, values, parts=4):
    return spark.createDataFrame(
        [(v,) for v in values], "item string"
    ).repartition(parts)


def _expected_hh(values, k):
    from collections import Counter
    n = len(values)
    return {v: c for v, c in Counter(values).items() if c * (k + 1) > n}


def test_heavy_hitters_exact_counts(spark):
    # 'a' x 40, 'b' x 25, 'c' x 10, 60 singletons: N=135, k=4 ->
    # threshold N/5 = 27: only 'a' qualifies.
    values = (["a"] * 40 + ["b"] * 25 + ["c"] * 10
              + [f"s{i}" for i in range(60)])
    got = {r.item: r.n
           for r in SK.exact_heavy_hitters(_items(spark, values),
                                           k=4).collect()}
    assert got == _expected_hh(values, 4) == {"a": 40}


def test_heavy_hitters_partitioning_independent(spark):
    values = (["x"] * 30 + ["y"] * 20 + [f"d{i}" for i in range(50)])
    exp = _expected_hh(values, 3)
    for parts in (1, 2, 7, 16):
        got = {r.item: r.n
               for r in SK.exact_heavy_hitters(
                   _items(spark, values, parts), k=3).collect()}
        assert got == exp, f"parts={parts}"


def test_heavy_hitters_boundary_strict(spark):
    # N=100, k=3 -> threshold 25; item at exactly 25 is EXCLUDED
    # (strict >), item at 26 kept.
    values = ["at25"] * 25 + ["at26"] * 26 + [f"d{i}" for i in range(49)]
    got = {r.item: r.n
           for r in SK.exact_heavy_hitters(_items(spark, values),
                                           k=3).collect()}
    assert got == {"at26": 26}


def test_heavy_hitters_spread_thin_across_partitions(spark):
    # The guarantee case: the heavy item never dominates any single
    # batch but crosses the global threshold; MG must still surface it
    # from at least one partition summary.
    values = []
    for p in range(10):
        values += ["hot"] * 4 + [f"p{p}d{i}" for i in range(6)]
    # N=100, k=3 -> threshold 25; hot=40.
    got = {r.item: r.n
           for r in SK.exact_heavy_hitters(_items(spark, values, 10),
                                           k=3).collect()}
    assert got == {"hot": 40}


def test_heavy_hitters_empty_and_no_hitters(spark):
    empty = spark.createDataFrame([], "item string")
    assert SK.exact_heavy_hitters(empty, k=5).count() == 0
    uniform = _items(spark, [f"u{i}" for i in range(40)])
    assert SK.exact_heavy_hitters(uniform, k=5).count() == 0


def test_heavy_hitters_null_item_is_counted(spark):
    # A NULL that truly exceeds N/(k+1) must come back as a NULL-keyed
    # row, matching the plain groupBy/HAVING twin (ADVICE r5 fix:
    # value_counts(dropna=False) + null-safe semi join).
    values = [None] * 30 + ["b"] * 20 + [f"d{i}" for i in range(50)]
    # N=100, k=3 -> threshold 25: only NULL (30) qualifies.
    for parts in (1, 4):
        got = {r.item: r.n
               for r in SK.exact_heavy_hitters(
                   _items(spark, values, parts), k=3).collect()}
        assert got == {None: 30}, f"parts={parts}"


def test_heavy_hitters_null_below_threshold_excluded(spark):
    values = [None] * 10 + ["a"] * 40 + [f"d{i}" for i in range(50)]
    got = {r.item: r.n
           for r in SK.exact_heavy_hitters(_items(spark, values),
                                           k=3).collect()}
    assert got == {"a": 40}
