"""Round-5 additions, fourth batch: UniMax water-filling budget
allocation (M113) and the exact edit-distance join (M114; q-gram
prefix-filtered in r5/r6, partition-based Pass-Join since r7 — these
tests are implementation-blind) — semantics recomputed in plain Python
(iterative water-filling loop, full DP levenshtein), plus each
docstring's contract edges (remainder distribution, infeasible budget,
threshold boundary, tiny-string bucket, multibyte text)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from batch_processing_analysis_spark.operators import dedup as DD
from batch_processing_analysis_spark.operators import mixing as MX


# --------------------------------------------------------------- M113

def _water_fill(sizes, budget, max_epochs_micro):
    """Reference UniMax: the paper's iterative budget scan — visit
    sources ascending by cap, give each min(cap, remaining/slots_left)
    — integerized with the same largest-remainder rule (first
    ``rem`` open sources in (cap, source) order get the extra token).
    """
    caps = {s: (n * max_epochs_micro) // 1_000_000
            for s, n in sizes.items()}
    order = sorted(caps, key=lambda s: (caps[s], s))
    alloc, remaining = {}, budget
    open_srcs = []
    for i, s in enumerate(order):
        slots = len(order) - i
        if caps[s] * slots <= remaining:
            alloc[s] = caps[s]
            remaining -= caps[s]
        else:
            open_srcs = order[i:]
            break
    if open_srcs:
        base, rem = divmod(remaining, len(open_srcs))
        for j, s in enumerate(open_srcs):
            alloc[s] = base + (1 if j < rem else 0)
        remaining = 0
    return caps, alloc, remaining


def _docs_from_sizes(spark, sizes):
    rows = [(i, s, n) for i, (s, n) in enumerate(sizes.items())]
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long")


def _check_against_reference(spark, sizes, budget, me):
    caps, alloc, short = _water_fill(sizes, budget, me)
    got = {r["source"]: r for r in MX.unimax_plan(
        _docs_from_sizes(spark, sizes), budget,
        max_epochs_micro=me).collect()}
    assert set(got) == set(sizes)
    for s, r in got.items():
        assert r["cap_tokens"] == caps[s], s
        assert r["alloc_tokens"] == alloc[s], s
        assert r["short_tokens"] == short
        assert r["alloc_tokens"] <= caps[s]
        if r["n_size"] > 0:
            assert r["epochs_micro"] == alloc[s] * 1_000_000 // r["n_size"]
    assert sum(r["alloc_tokens"] for r in got.values()) == \
        min(budget, sum(caps.values()))


def test_unimax_hand_case(spark):
    # caps (2 epochs): a=20, b=40, c=100, d=200; budget 150:
    # a capped (20*4=80<=150), b capped (40*3+20=140<=150), c open
    # (100*2+60=260>150), remaining 90 over {c, d} -> 45 each.
    sizes = {"a": 10, "b": 20, "c": 50, "d": 100}
    me = 2_000_000
    got = {r["source"]: r for r in MX.unimax_plan(
        _docs_from_sizes(spark, sizes), 150,
        max_epochs_micro=me).collect()}
    assert {s: r["alloc_tokens"] for s, r in got.items()} == \
        {"a": 20, "b": 40, "c": 45, "d": 45}
    assert {s: r["capped"] for s, r in got.items()} == \
        {"a": 1, "b": 1, "c": 0, "d": 0}
    assert all(r["short_tokens"] == 0 for r in got.values())


def test_unimax_remainder_goes_to_smallest_caps_first(spark):
    # 3 open sources, remaining 100 -> base 33 rem 1: the extra token
    # lands on the FIRST open source in (cap, source) order.
    sizes = {"x": 1_000_000, "y": 2_000_000, "z": 3_000_000}
    got = {r["source"]: r["alloc_tokens"] for r in MX.unimax_plan(
        _docs_from_sizes(spark, sizes), 100,
        max_epochs_micro=1_000_000).collect()}
    assert got == {"x": 34, "y": 33, "z": 33}


def test_unimax_infeasible_budget_pins_caps_and_reports_short(spark):
    sizes = {"a": 100, "b": 200}
    me = 1_000_000  # caps 100, 200; budget 1000 -> short 700
    got = {r["source"]: r for r in MX.unimax_plan(
        _docs_from_sizes(spark, sizes), 1000,
        max_epochs_micro=me).collect()}
    assert {s: r["alloc_tokens"] for s, r in got.items()} == \
        {"a": 100, "b": 200}
    assert all(r["capped"] == 1 for r in got.values())
    assert all(r["short_tokens"] == 700 for r in got.values())


def test_unimax_zero_budget(spark):
    sizes = {"a": 100, "b": 200}
    got = {r["source"]: r["alloc_tokens"] for r in MX.unimax_plan(
        _docs_from_sizes(spark, sizes), 0).collect()}
    assert got == {"a": 0, "b": 0}


def test_unimax_randomized_parity_with_reference_loop(spark):
    import random

    rng = random.Random(42)
    sizes = {f"s{i:02d}": rng.randrange(0, 5_000) for i in range(25)}
    sizes["s25"] = 0  # empty source: cap 0, alloc 0, NULL epochs
    total_cap = sum((n * 3_000_000) // 1_000_000 for n in sizes.values())
    for budget in (0, 1, 7, total_cap // 3, total_cap - 1, total_cap,
                   total_cap + 999):
        _check_against_reference(spark, sizes, budget, 3_000_000)
    empty = {r["source"]: r for r in MX.unimax_plan(
        _docs_from_sizes(spark, sizes), 10).collect()}
    assert empty["s25"]["epochs_micro"] is None


def test_unimax_rejects_bad_args(spark):
    d = _docs_from_sizes(spark, {"a": 1})
    with pytest.raises(ValueError):
        MX.unimax_plan(d, -1)
    with pytest.raises(ValueError):
        MX.unimax_plan(d, 10, max_epochs_micro=0)


# --------------------------------------------------------------- M114

def _lev(a, b):
    """Full-DP levenshtein (unit costs), the reference semantics."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute_ed_pairs(items, d):
    out = {}
    for (ia, ta), (ib, tb) in itertools.combinations(sorted(items), 2):
        dist = _lev(ta, tb)
        if dist <= d:
            out[(ia, ib)] = dist
    return out


def _run_edjoin(spark, items, d, q=4):
    df = spark.createDataFrame(items, "doc_id long, text string")
    return {(r["id_a"], r["id_b"]): r["dist"]
            for r in DD.edjoin_pairs(df, d=d, q=q).collect()}


def test_edjoin_matches_bruteforce_structured(spark):
    base = "the quick brown fox jumps over the lazy dog tonight again"
    items = [
        (0, base),
        (1, base.replace("quick", "quack")),            # dist 2
        (2, base.replace("tonight again", "tonite agin")),  # small edit
        (3, base + " and then some more trailing words here"),  # far
        (4, "completely different content with nothing shared at all"),
        (5, base[:-1]),                                  # dist 1
        (6, base.upper()),                               # case = edits
    ]
    for d in (1, 3, 10):
        assert _run_edjoin(spark, items, d) == _brute_ed_pairs(items, d)


def test_edjoin_threshold_boundary_inclusive(spark):
    a = "abcdefghijklmnopqrstuvwxyz0123456789"
    b = a[:-4] + "wxyz"  # dist 4 after replacing last 4... construct:
    b = a[:30] + "XXXX" + a[34:]  # exactly 4 substitutions
    items = [(0, a), (1, b)]
    assert _lev(a, b) == 4
    assert _run_edjoin(spark, items, 4) == {(0, 1): 4}
    assert _run_edjoin(spark, items, 3) == {}


def test_edjoin_tiny_strings_use_banded_bucket(spark):
    # All at/below the q·d+q−1 short-bucket cutoff (q=4, d=5 -> 23).
    items = [(0, "ab"), (1, "abc"), (2, "abcde"), (3, "zzzzzzzz"),
             (4, ""), (5, "a" * 8)]
    for d in (2, 5):
        assert _run_edjoin(spark, items, d, q=4) == \
            _brute_ed_pairs(items, d)


def test_edjoin_tiny_long_cross_pairs(spark):
    # Short strings near the band edges must still pair iff within d
    # (q=4, d=10 -> short-bucket cutoff q·d+q−1 = 49; len 13/14/1 all
    # route through the banded bucket).
    t13 = "hello world x"
    t14 = "hello world xy"
    items = [(0, t13), (1, t14), (2, "a")]
    got = _run_edjoin(spark, items, 10, q=4)
    assert got == _brute_ed_pairs(items, 10)
    assert (0, 1) in got and got[(0, 1)] == 1


def test_edjoin_multibyte_text(spark):
    a = "héllo wörld çafé naïve résumé over there"
    b = a.replace("çafé", "café")  # one char substitution
    items = [(0, a), (1, b)]
    assert _run_edjoin(spark, items, 1) == {(0, 1): 1}


def test_edjoin_randomized_parity(spark):
    import random

    rng = random.Random(7)
    alpha = "abcdef "
    base = ["".join(rng.choice(alpha) for _ in range(rng.randrange(5, 60)))
            for _ in range(12)]
    items = []
    i = 0
    for t in base:
        items.append((i, t)); i += 1
        if rng.random() < 0.7:  # mutated sibling
            s = list(t)
            for _ in range(rng.randrange(1, 6)):
                op = rng.random()
                p = rng.randrange(0, max(1, len(s)))
                if op < 0.4 and s:
                    s[p] = rng.choice(alpha)
                elif op < 0.7:
                    s.insert(p, rng.choice(alpha))
                elif s:
                    del s[p]
            items.append((i, "".join(s))); i += 1
    for d in (2, 6):
        assert _run_edjoin(spark, items, d) == _brute_ed_pairs(items, d)


def test_edjoin_rejects_bad_args(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        DD.edjoin_pairs(df, d=-1)
    with pytest.raises(ValueError):
        DD.edjoin_pairs(df, q=1)


def test_edjoin_short_strings_sharing_no_grams(spark):
    """Regression (hypothesis-found): 'aba'/'aaa' are at distance 1
    but share ZERO 2-grams — with ≤ q·d grams nothing survives d
    edits, so these pairs must route through the short bucket, not
    the prefix join (the original cutoff q−1+d missed them)."""
    items = [(0, ""), (1, "aba"), (2, "aaa"), (3, "")]
    assert _run_edjoin(spark, items, 1, q=2) == \
        _brute_ed_pairs(items, 1) == {(0, 3): 0, (1, 2): 1}
    # same shape one size up: distance-2 pair with disjoint 3-gram sets
    items = [(0, "abcabc"), (1, "abxabz")]
    assert _run_edjoin(spark, items, 2, q=3) == _brute_ed_pairs(items, 2)
