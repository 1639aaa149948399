"""Seeded training-order shuffle (operators/ordering.py): permutation
and determinism properties. Cross-engine byte-parity is the q69 oracle
gate (tests/test_extra_queries.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_processing_analysis_spark.operators.ordering import seeded_shuffle


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 300).select(F.col("id").alias("doc_id"))


def _order(df):
    return [r.doc_id for r in df.orderBy("shard", "pos").collect()]


def test_shuffle_is_a_permutation(spark, docs):
    out = seeded_shuffle(docs, "train:0", 8)
    rows = out.collect()
    assert sorted(r.doc_id for r in rows) == list(range(300))
    assert all(0 <= r.shard < 8 for r in rows)
    # Positions are 1..n_shard contiguous within every shard.
    for shard in range(8):
        pos = sorted(r.pos for r in rows if r.shard == shard)
        assert pos == list(range(1, len(pos) + 1))


def test_shuffle_is_deterministic_and_seed_sensitive(spark, docs):
    a = _order(seeded_shuffle(docs, "train:0", 8))
    b = _order(seeded_shuffle(docs, "train:0", 8))
    c = _order(seeded_shuffle(docs, "train:1", 8))
    assert a == b
    assert a != c  # new epoch seed => new permutation
    assert a != list(range(300))  # and it actually shuffles


def test_shuffle_balances_shards(spark, docs):
    sizes = [
        r["count"]
        for r in seeded_shuffle(docs, "train:0", 8).groupBy("shard").count().collect()
    ]
    assert len(sizes) == 8
    # Multinomial at n=300, S=8: mean 37.5, be generous on tails.
    assert min(sizes) > 15 and max(sizes) < 60


def test_shuffle_rejects_bad_shards(spark, docs):
    with pytest.raises(ValueError):
        seeded_shuffle(docs, "s", 0)
