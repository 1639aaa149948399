"""Decontamination, diversity signals, and quantized-ANN unit tests.

Planted-fixture tests (known contamination / hand-computed indices /
recall vs the exact float baseline) — the oracle gate for the q63-q65
twins lives in tests/test_extra_queries.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_processing_analysis_spark.operators import decontamination as DC
from batch_processing_analysis_spark.operators import similarity as S
from batch_processing_analysis_spark.operators import text_analysis as TA
from batch_processing_analysis_spark.sources.tables import load_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_planted_overlap(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    corpus = _docs(spark, [
        # 8-token run shared with the benchmark (case-insensitive) ⇒ hit
        (1, "intro words THE QUICK Brown fox jumps over the lazy end"),
        # 7-token overlap only ⇒ clean at n=8
        (2, "quick brown fox jumps over the lazy cat entirely"),
        (3, "completely unrelated text with no overlap at all here"),
        (4, "short doc"),  # < 8 tokens ⇒ 0 grams, clean
    ])
    out = {r.doc_id: r for r in DC.decontaminate(corpus, bench, n=8).collect()}
    assert set(out) == {1, 2, 3, 4}, "every corpus doc is annotated"
    assert out[1].contaminated == 1 and out[1].n_contaminated >= 1
    assert out[2].contaminated == 0
    assert out[3].contaminated == 0
    assert out[4].contaminated == 0 and out[4].n_grams == 0
    assert out[4].contamination_ratio == 0.0
    # ratio is n_contaminated / n_grams
    r1 = out[1]
    assert r1.contamination_ratio == pytest.approx(
        round(r1.n_contaminated / r1.n_grams, 6)
    )


def test_decontaminate_shuffle_join_variant_matches(spark):
    docs = _docs(spark, [
        (1, "a b c d e f g h i j"),
        (2, "a b c d e f g h"),
        (3, "z y x w v u t s"),
    ])
    bench = _docs(spark, [(9, "a b c d e f g h")])
    a = sorted(map(tuple, DC.decontaminate(docs, bench, n=8).collect()))
    b = sorted(map(tuple, DC.decontaminate(
        docs, bench, n=8, broadcast_benchmark=False).collect()))
    assert a == b


def test_diversity_signals_hand_computed(spark):
    docs = _docs(spark, [
        (1, "aa aa aa aa"),   # one token repeated 4x
        (2, "a b c d"),       # all distinct
        (3, ""),              # empty
    ])
    out = {r.doc_id: r for r in TA.diversity_signals(docs).collect()}
    # doc 1: tokens n=4, uniq=1, ss=16 → simpson 1-16/16=0; top share 1
    assert out[1].n_tokens == 4 and out[1].n_distinct_tokens == 1
    assert out[1].token_simpson == 0.0
    assert out[1].top_token_share == 1.0
    assert out[1].distinct_token_ratio == 0.25
    # chars of "aa aa aa aa": 8×'a', 3×' ' → m=11, css=64+9=73
    assert out[1].char_simpson == pytest.approx(round(1 - 73 / 121, 6))
    # doc 2: n=4 uniq=4 ss=4 → simpson 1-4/16=0.75; top share 0.25
    assert out[2].token_simpson == 0.75
    assert out[2].top_token_share == 0.25
    assert out[2].distinct_token_ratio == 1.0
    # empty doc: all-zero signals, still present
    assert out[3].n_tokens == 0 and out[3].token_simpson == 0.0
    assert out[3].char_simpson == 0.0


def test_quantized_topk_recall_vs_exact(spark, sf_dir):
    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.filter(F.col("vec_id") < 10)
    exact = S.brute_force_topk(embs, queries, k=5)
    quant = S.quantized_topk(embs, queries, k=5)
    ex = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    qz = {(r.query_id, r.neighbor_id) for r in quant.collect()}
    assert len(qz) == len(ex)
    # 8-bit scalar quantization perturbs cosine by ~1e-3; top-5 sets
    # should agree almost everywhere on real (non-adversarial) data.
    recall = len(ex & qz) / len(ex)
    assert recall >= 0.9, f"int8 recall@5 degraded: {recall}"


def test_quantize_embeddings_codes_bounded(spark, sf_dir):
    embs = load_table(spark, sf_dir, "embeddings")
    q = S.quantize_embeddings(embs)
    stats = q.select(
        F.max(F.array_max(F.transform("qvec", lambda x: F.abs(x)))).alias("mx"),
        F.min("scale").alias("smin"),
    ).collect()[0]
    assert stats.mx <= 127
    assert stats.smin >= 0.0
