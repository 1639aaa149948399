"""Streaming Misra-Gries heavy-hitter summary (M130,
streaming/corpus_stream.py): streamed state == plain-Python replay of
the same micro-batch sequence, shard routing is item-deterministic,
and the MG candidate guarantee holds at the final prefix."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

K = 5
N_SHARDS = 3


def _shard(item) -> int:
    key = "\x00NULL" if item is None else item
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16) % N_SHARDS


def _py_replay(batches):
    """Mirror of the stateful fold: per micro-batch, add the whole
    batch's counts per shard, then truncate once to K counters."""
    state: dict[int, dict] = {s: {} for s in range(N_SHARDS)}
    for batch in batches:
        added: set[int] = set()
        for item in batch:
            s = _shard(item)
            state[s][item] = state[s].get(item, 0) + 1
            added.add(s)
        for s in added:
            if len(state[s]) > K:
                cut = sorted(state[s].values(), reverse=True)[K]
                state[s] = {v: c - cut
                            for v, c in state[s].items() if c > cut}
    return state


def _batches():
    # batch 1: 'hot' dominates; batch 2: churn of singletons (forces
    # truncation); batch 3: 'warm' rises + a NULL heavy hitter.
    b1 = ["hot"] * 12 + ["warm"] * 4 + [f"a{i}" for i in range(9)]
    b2 = [f"b{i}" for i in range(18)] + ["hot"] * 3
    b3 = ["warm"] * 9 + [None] * 8 + [f"c{i}" for i in range(6)]
    return [b1, b2, b3]


@pytest.fixture(scope="module")
def hh_run(spark, tmp_path_factory):
    from batch_processing_analysis_spark.streaming.corpus_stream import (
        stream_heavy_hitter_summary,
    )

    src = str(tmp_path_factory.mktemp("hh_in"))
    ck = str(tmp_path_factory.mktemp("hh_ck"))
    batches = _batches()
    for batch in batches:
        (spark.createDataFrame([(x,) for x in batch], "item string")
         .coalesce(1).write.mode("append").parquet(src))

    stream = (spark.readStream.schema("item string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = stream_heavy_hitter_summary(stream, k=K, n_shards=N_SHARDS)

    emissions = []

    def _sink(bdf, bid):
        emissions.append((bid, bdf.collect()))

    q = (out.writeStream.foreachBatch(_sink).outputMode("update")
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return batches, emissions


def test_final_state_equals_python_replay(hh_run):
    batches, emissions = hh_run
    expect = _py_replay(batches)
    final: dict[tuple, object] = {}
    for bid, recs in sorted(emissions):
        for r in recs:
            final[(r["shard"], r["rank"])] = (r["item"], r["mg_count"])
    got: dict[int, dict] = {s: {} for s in range(N_SHARDS)}
    for (s, _rank), (item, c) in final.items():
        if c is not None:
            got[s][item] = c
    assert got == expect


def test_summary_padded_to_k_and_rank_ordered(hh_run):
    _, emissions = hh_run
    for _bid, recs in emissions:
        by_shard: dict[int, list] = {}
        for r in recs:
            by_shard.setdefault(r["shard"], []).append(r)
        for s, rs in by_shard.items():
            rs = sorted(rs, key=lambda r: r["rank"])
            assert [r["rank"] for r in rs] == list(range(1, K + 1))
            counts = [r["mg_count"] for r in rs if r["mg_count"]
                      is not None]
            assert counts == sorted(counts, reverse=True)
            # padding rows trail the real summary
            reals = [r["mg_count"] is not None for r in rs]
            assert reals == sorted(reals, reverse=True)


def test_mg_candidate_guarantee_at_final_prefix(hh_run):
    batches, emissions = hh_run
    stream_items = [x for b in batches for x in b]
    n = len(stream_items)
    true_counts = Counter(stream_items)
    heavy = {v for v, c in true_counts.items() if c * (K + 1) > n}
    assert heavy, "fixture must contain at least one true heavy hitter"
    expect = _py_replay(batches)
    surviving = {v for s in expect.values() for v in s}
    assert heavy <= surviving


def test_null_items_counted_and_sharded(hh_run):
    batches, _ = hh_run
    expect = _py_replay(batches)
    assert any(None in s for s in expect.values())
