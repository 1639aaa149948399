"""Durable streaming EXACT containment gate (M147, streaming/
incremental_ingest.py): accumulated ORDERED pairs across waves AND a
stream restart equal the one-shot batch containment_pairs on
everything ingested; retries are idempotent."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from batch_processing_analysis_spark.operators.dedup import (
    containment_pairs,
)
from batch_processing_analysis_spark.streaming.incremental_ingest import (
    containment_micro_batch,
    read_containment_pairs,
    start_containment_ingest,
)

T0 = datetime(2024, 3, 1, 8)
SCHEMA = "doc_id long, text string, ingest_time timestamp"

# Wave 2 contains a quote of wave-1 doc 1 (21 ⊂ 1), a wave-1 doc that
# contains a wave-2 doc (2 ⊃ 22), an internal containment (23 ⊂ 24),
# and fresh text.
WAVE1 = [
    (1, "the quick brown fox jumps over the lazy dog every day", 0),
    (2, "pack my box with five dozen liquor jugs", 1),
    (3, "completely unrelated content lives here now", 2),
]
WAVE2 = [
    (21, "the quick brown fox jumps", 10),
    (22, "pack my box with five dozen liquor jugs and some more extra", 11),
    (23, "brand new arrivals", 12),
    (24, "brand new arrivals in the second wave", 13),
    (25, "nothing like anything else at all frankly", 14),
]


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, t, T0 + timedelta(minutes=m)) for i, t, m in rows], SCHEMA
    )


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cont_ingest")
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
        q = start_containment_ingest(stream, c_pct=80, k=3, **paths)
        q.awaitTermination()

    run_wave(WAVE1)  # drains and STOPS (availableNow)
    run_wave(WAVE2)  # brand-new query object: a genuine restart
    return paths


def _batch_pairs(spark, rows, c_pct=80, k=3):
    docs = spark.createDataFrame([(i, t) for i, t, _ in rows],
                                 "doc_id long, text string")
    return {(r.id_a, r.id_b): r.cont_micro
            for r in containment_pairs(docs, c_pct=c_pct, k=k).collect()}


def test_streamed_pairs_equal_batch_across_restart(spark, streamed):
    got = {(r.id_a, r.id_b): r.cont_micro
           for r in read_containment_pairs(
               spark, streamed["pairs_path"]).collect()}
    want = _batch_pairs(spark, WAVE1 + WAVE2)
    assert got == want
    # the fixture must exercise cross-restart pairs IN BOTH DIRECTIONS
    cross = {(a, b) for a, b in want if (a <= 3) != (b <= 3)}
    assert any(a <= 3 for a, b in cross), "no old-contained-in-new pair"
    assert any(a > 3 for a, b in cross), "no new-contained-in-old pair"


def test_retry_is_idempotent(spark, streamed):
    before = sorted(map(tuple, read_containment_pairs(
        spark, streamed["pairs_path"]).collect()))
    last_id = max(
        int(str(r.ingest_batch)) for r in
        spark.read.option("basePath", streamed["pairs_path"])
        .parquet(streamed["pairs_path"]).select("ingest_batch")
        .distinct().collect()
    )
    containment_micro_batch(
        _df(spark, WAVE2).drop("ingest_time")
        .withColumn("ingest_time", F.lit(T0)),
        last_id,
        ranked_path=streamed["ranked_path"],
        sets_path=streamed["sets_path"],
        pairs_path=streamed["pairs_path"],
        c_pct=80, k=3,
    )
    after = sorted(map(tuple, read_containment_pairs(
        spark, streamed["pairs_path"]).collect()))
    assert after == before


def test_stats_registry_delta_proportional_guard(spark, tmp_path):
    """r9 stats_path (VERDICT r8 task 4): the shared
    ppjoin_prefix_stats registry yields a containment guard bound
    bit-identical to the lineage-scan bound; the coverage police
    refuses a partial stats registry; backfill repairs it. Registries
    built by direct micro-batch calls (restart/retry semantics are
    pinned above)."""
    import re
    import shutil

    from batch_processing_analysis_spark.operators.dedup import (
        CandidateVolumeExceeded,
    )
    from batch_processing_analysis_spark.streaming.incremental_ingest import (
        backfill_ppjoin_stats,
    )

    root = tmp_path
    paths = {
        "ranked_path": str(root / "ranked"),
        "sets_path": str(root / "sets"),
        "pairs_path": str(root / "pairs"),
    }
    stats_path = str(root / "stats")
    containment_micro_batch(_df(spark, WAVE1), 0, c_pct=80, k=3,
                            **paths, stats_path=stats_path)
    containment_micro_batch(_df(spark, WAVE2), 1, c_pct=80, k=3,
                            **paths, stats_path=stats_path)
    got = {(r.id_a, r.id_b): r.cont_micro
           for r in read_containment_pairs(
               spark, paths["pairs_path"]).collect()}
    assert got == _batch_pairs(spark, WAVE1 + WAVE2)

    probe = _df(spark, [(90, "the quick brown fox", 20)])

    def _trip(**kw):
        with pytest.raises(CandidateVolumeExceeded) as ei:
            containment_micro_batch(probe, 99, c_pct=80, k=3,
                                    max_candidates=0, **paths, **kw)
        return int(re.search(r"upper bound (\d+) exceeds",
                             str(ei.value)).group(1))

    assert _trip(stats_path=stats_path) == _trip() > 0

    shutil.rmtree(root / "stats" / "ingest_batch=1")
    with pytest.raises(ValueError, match="backfill_ppjoin_stats"):
        containment_micro_batch(probe, 99, c_pct=80, k=3,
                                max_candidates=0, **paths,
                                stats_path=stats_path)
    backfill_ppjoin_stats(spark, paths["ranked_path"], stats_path)
    assert _trip(stats_path=stats_path) == _trip() > 0
