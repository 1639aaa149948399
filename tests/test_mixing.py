"""Weighted source mixing (operators/mixing.py): budget arithmetic,
prefix-packing overshoot bound, determinism, and validation. Cross-
engine parity is the q70 oracle gate (tests/test_extra_queries.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from batch_processing_analysis_spark.operators.mixing import mix_sources

ROWS = [
    # (doc_id, source, n_tokens)
    *[(i, "web", 100) for i in range(10)],
    *[(100 + i, "code", 50) for i in range(10)],
    *[(200 + i, "books", 400) for i in range(4)],
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        ROWS, "doc_id int, source string, n_tokens int"
    )


def test_budgets_respected_with_one_doc_overshoot(spark, docs):
    # Σw = 4 → budgets: web 500, code 250, books 250.
    out = mix_sources(docs, {"web": 2, "code": 1, "books": 1}, 1000).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    budgets = {"web": 500, "code": 250, "books": 250}
    for src, rows in by_src.items():
        total = sum(r.n_tokens for r in rows)
        b = budgets[src]
        # Every selected doc started strictly inside the budget...
        assert max(r.cum_tokens - r.n_tokens for r in rows) < b
        # ...so overshoot is bounded by the last doc.
        assert total < b + max(r.n_tokens for r in rows)
    assert sum(r.n_tokens for r in by_src["web"]) == 500  # 5 × 100
    assert sum(r.n_tokens for r in by_src["code"]) == 250  # 5 × 50
    # books: 400-token docs against a 250 budget — exactly one admitted.
    assert len(by_src["books"]) == 1


def test_unlisted_sources_excluded_and_deterministic(spark, docs):
    a = sorted(r.doc_id for r in mix_sources(docs, {"web": 1}, 300).collect())
    b = sorted(r.doc_id for r in mix_sources(docs, {"web": 1}, 300).collect())
    assert a == b and len(a) == 3
    assert all(i < 100 for i in a)
    # A different seed picks a different prefix of the permutation.
    c = sorted(
        r.doc_id
        for r in mix_sources(docs, {"web": 1}, 300, seed="mix:9").collect()
    )
    assert c != a


def test_mixing_validation(spark, docs):
    with pytest.raises(ValueError):
        mix_sources(docs, {}, 100)
    with pytest.raises(ValueError):
        mix_sources(docs, {"web": -1}, 100)
    with pytest.raises(ValueError):
        mix_sources(docs, {"web": 1}, 0)
