"""BM25 top-k: formula parity with a pure-Python computation and
ranking invariants (operators/search.py).

The oracle gate (tests/test_extra_queries.py::q67_bm25_topk) proves
cross-engine determinism; this file proves the SEMANTICS — the engine
matches Okapi BM25 with Lucene-smoothed idf computed independently.
"""

from __future__ import annotations

import math

import pytest

from batch_processing_analysis_spark.operators.search import bm25_topk

DOCS = [
    (1, "spark window merge spark spark"),
    (2, "window window window table scan"),
    (3, "merge join hash"),
    (4, "table scan filter agg"),
    (5, "spark"),
]


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {
        t: sum(1 for v in toks.values() if t in v)
        for t in terms
    }
    out = {}
    for i, v in toks.items():
        micros, hits = 0, 0
        for t in terms:
            tf = v.count(t)
            if tf == 0 or df[t] == 0:
                continue
            hits += 1
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s = idf * (tf * (1.0 + k1)) / (
                tf + k1 * (1.0 - b + b * len(v) / avgdl)
            )
            micros += math.floor(s * 1e6 + 0.5)
        if hits:
            out[i] = (hits, micros)
    return out


def test_bm25_matches_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = {
        r.doc_id: (r.n_hit_terms, r.score_micro)
        for r in bm25_topk(docs, ["spark", "merge", "window"], k=10).collect()
    }
    assert got == _py_bm25(DOCS, ["spark", "merge", "window"])


def test_bm25_topk_orders_and_limits(spark):
    docs = spark.createDataFrame(DOCS, "doc_id int, text string")
    rows = bm25_topk(docs, ["spark", "merge", "window"], k=2).collect()
    assert len(rows) == 2
    scores = [r.score_micro for r in rows]
    assert scores == sorted(scores, reverse=True)
    # Doc 1 hits all three terms with repeated tf — it must lead.
    assert rows[0].doc_id == 1


def test_bm25_nonmatching_docs_are_absent(spark):
    docs = spark.createDataFrame(DOCS, "doc_id int, text string")
    ids = {r.doc_id for r in bm25_topk(docs, ["join"], k=10).collect()}
    assert ids == {3}


def test_bm25_rejects_empty_query(spark):
    docs = spark.createDataFrame(DOCS, "doc_id int, text string")
    with pytest.raises(ValueError):
        bm25_topk(docs, [])
