"""Durable streaming EXACT near-dup gate (M143, streaming/
incremental_ingest.py): accumulated pairs across waves AND a stream
restart equal the one-shot batch ppjoin_pairs on everything ingested,
retries are idempotent, and the frozen published-base df order is
honored when given."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from batch_processing_analysis_spark.operators.dedup import ppjoin_pairs
from batch_processing_analysis_spark.streaming.incremental_ingest import (
    exact_neardup_micro_batch,
    read_exact_pairs,
    start_exact_neardup_ingest,
)

T0 = datetime(2024, 3, 1, 8)
SCHEMA = "doc_id long, text string, ingest_time timestamp"

# Wave 2 arrives after a restart and contains near-dups of wave-1 docs
# (21 ~ 1, 22 ~ 2), an internal near-dup pair (23/24), and fresh text.
WAVE1 = [
    (1, "the quick brown fox jumps over the lazy dog", 0),
    (2, "pack my box with five dozen liquor jugs today", 1),
    (3, "completely unrelated content lives here now", 2),
]
WAVE2 = [
    (21, "the quick brown fox jumps over the lazy cat", 10),
    (22, "pack my box with five dozen liquor jugs tonight", 11),
    (23, "brand new arrivals in the second wave here", 12),
    (24, "brand new arrivals in the second wave there", 13),
    (25, "nothing like anything else at all frankly", 14),
]


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, t, T0 + timedelta(minutes=m)) for i, t, m in rows], SCHEMA
    )


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("exact_ingest")
    src = str(root / "src")
    paths = {
        "ranked_path": str(root / "ranked"),
        "sets_path": str(root / "sets"),
        "pairs_path": str(root / "pairs"),
        "checkpoint_path": str(root / "ckpt"),
    }

    def run_wave(rows):
        _df(spark, rows).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = start_exact_neardup_ingest(stream, t_pct=50, k=3, **paths)
        q.awaitTermination()

    run_wave(WAVE1)  # drains and STOPS (availableNow)
    run_wave(WAVE2)  # brand-new query object: a genuine restart
    return paths


def _batch_pairs(spark, rows, t_pct=50, k=3):
    docs = spark.createDataFrame([(i, t) for i, t, _ in rows],
                                 "doc_id long, text string")
    return {(r.id_a, r.id_b): r.jac_micro
            for r in ppjoin_pairs(docs, t_pct=t_pct, k=k).collect()}


def test_streamed_pairs_equal_batch_across_restart(spark, streamed):
    got = {(r.id_a, r.id_b): r.jac_micro
           for r in read_exact_pairs(spark,
                                     streamed["pairs_path"]).collect()}
    want = _batch_pairs(spark, WAVE1 + WAVE2)
    assert got == want
    # the fixture must actually exercise cross-restart pairs
    cross = {(a, b) for a, b in want
             if (a <= 3) != (b <= 3)}
    assert cross, "fixture has no cross-wave near-dup pairs"
    assert cross <= set(got)


def test_retry_is_idempotent(spark, streamed):
    before = sorted(map(tuple, read_exact_pairs(
        spark, streamed["pairs_path"]).collect()))
    # Replay the LAST committed micro-batch with the same batch_id —
    # exactly what foreachBatch does after a failure.
    last_id = max(
        int(str(r.ingest_batch)) for r in
        spark.read.option("basePath", streamed["pairs_path"])
        .parquet(streamed["pairs_path"]).select("ingest_batch")
        .distinct().collect()
    )
    exact_neardup_micro_batch(
        _df(spark, WAVE2).drop("ingest_time")
        .withColumn("ingest_time", F.lit(T0)),
        last_id,
        ranked_path=streamed["ranked_path"],
        sets_path=streamed["sets_path"],
        pairs_path=streamed["pairs_path"],
        t_pct=50, k=3,
    )
    after = sorted(map(tuple, read_exact_pairs(
        spark, streamed["pairs_path"]).collect()))
    assert after == before


def test_published_base_df_order_is_honored(spark, tmp_path):
    """With df_table from a published base, the stream still matches
    the batch operator (the frozen order changes prefixes, never
    output)."""
    from batch_processing_analysis_spark.operators.incremental import (
        publish_ppjoin_base,
    )

    base_rows = WAVE1
    docs_base = spark.createDataFrame(
        [(i, t) for i, t, _ in base_rows], "doc_id long, text string")
    publish_ppjoin_base(spark, docs_base, "exstream", k=3, num_buckets=4,
                        path_root=str(tmp_path / "wh"))
    try:
        root = tmp_path / "stream"
        paths = {
            "ranked_path": str(root / "ranked"),
            "sets_path": str(root / "sets"),
            "pairs_path": str(root / "pairs"),
        }
        exact_neardup_micro_batch(
            _df(spark, WAVE1).drop("ingest_time"), 0,
            t_pct=50, k=3, df_table="exstream_df", **paths)
        exact_neardup_micro_batch(
            _df(spark, WAVE2).drop("ingest_time"), 1,
            t_pct=50, k=3, df_table="exstream_df", **paths)
        got = {(r.id_a, r.id_b): r.jac_micro
               for r in read_exact_pairs(spark,
                                         paths["pairs_path"]).collect()}
        assert got == _batch_pairs(spark, WAVE1 + WAVE2)
    finally:
        for t in ("exstream_ranked", "exstream_df", "exstream_sets"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_reingested_id_trips_guard(spark, tmp_path):
    """ADVICE r7: an id already in the durable registry arriving again
    in a LATER batch fails loudly by default (it would double the
    token multiset and shrink ratios); a same-batch retry (previous
    test) never trips because the read excludes the batch's own
    partition; opting out restores the old documented-contract-only
    behavior."""
    from batch_processing_analysis_spark.operators.incremental import (
        OverlappingIdsError,
    )

    root = tmp_path / "stream"
    paths = {
        "ranked_path": str(root / "ranked"),
        "sets_path": str(root / "sets"),
        "pairs_path": str(root / "pairs"),
    }
    exact_neardup_micro_batch(
        _df(spark, WAVE1).drop("ingest_time"), 0, t_pct=50, k=3, **paths)
    dup_wave = [WAVE1[0], (31, "totally fresh text in wave three", 30)]
    with pytest.raises(OverlappingIdsError, match="exact_neardup"):
        exact_neardup_micro_batch(
            _df(spark, dup_wave).drop("ingest_time"), 1,
            t_pct=50, k=3, **paths)
    exact_neardup_micro_batch(
        _df(spark, dup_wave).drop("ingest_time"), 1,
        t_pct=50, k=3, check_disjoint_ids=False, **paths)


def test_stats_registry_delta_proportional_guard(spark, tmp_path):
    """r9 stats_path (VERDICT r8 task 4): with the per-wave prefix-stats
    registry enabled end-to-end, (a) accumulated pairs across waves
    still equal batch ppjoin_pairs, (b) the guard bound the stats path
    measures is bit-identical to the lineage-scan bound, (c) the
    coverage police refuses a PARTIAL stats registry (the one shape
    that would undercount the bound), and (d) backfill_ppjoin_stats
    repairs it."""
    import re
    import shutil

    from batch_processing_analysis_spark.operators.dedup import (
        CandidateVolumeExceeded,
    )
    from batch_processing_analysis_spark.streaming.incremental_ingest import (
        backfill_ppjoin_stats,
    )

    root = tmp_path
    src = str(root / "src")
    paths = {
        "ranked_path": str(root / "ranked"),
        "sets_path": str(root / "sets"),
        "pairs_path": str(root / "pairs"),
        "checkpoint_path": str(root / "ckpt"),
    }
    stats_path = str(root / "stats")

    def run_wave(rows):
        _df(spark, rows).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = start_exact_neardup_ingest(stream, t_pct=50, k=3,
                                       stats_path=stats_path, **paths)
        q.awaitTermination()

    run_wave(WAVE1)
    run_wave(WAVE2)
    got = {(r.id_a, r.id_b): r.jac_micro
           for r in read_exact_pairs(spark,
                                     paths["pairs_path"]).collect()}
    assert got == _batch_pairs(spark, WAVE1 + WAVE2)

    # (b) bound equality: trip a probe batch at max_candidates=0
    # through the stats path and the lineage path — the guard raises
    # before anything is written, so the registries stay untouched.
    probe = _df(spark, [(90, "the quick brown fox jumps over it", 20)])
    # exact_neardup_micro_batch takes no checkpoint_path — strip it
    mb_paths = {k: v for k, v in paths.items() if k != "checkpoint_path"}

    def _trip(**kw):
        with pytest.raises(CandidateVolumeExceeded) as ei:
            exact_neardup_micro_batch(probe, 99, t_pct=50, k=3,
                                      max_candidates=0, **mb_paths, **kw)
        return int(re.search(r"upper bound (\d+) exceeds",
                             str(ei.value)).group(1))

    assert _trip(stats_path=stats_path) == _trip() > 0

    # (c) partial stats registry → loud refusal naming the backfill
    batches = sorted(
        p.name for p in (root / "stats").iterdir()
        if p.name.startswith("ingest_batch="))
    shutil.rmtree(root / "stats" / batches[0])
    with pytest.raises(ValueError, match="backfill_ppjoin_stats"):
        exact_neardup_micro_batch(probe, 99, t_pct=50, k=3,
                                  max_candidates=0, **mb_paths,
                                  stats_path=stats_path)

    # (d) backfill rebuilds per-wave stats from the ranked registry
    backfill_ppjoin_stats(spark, paths["ranked_path"], stats_path)
    assert _trip(stats_path=stats_path) == _trip() > 0
