"""Streaming/batch agreement: the session-window accumulation and the
tumbling throughput rollup must produce identical results when a bounded
log is replayed through the streaming engine (trigger=availableNow,
complete mode) vs computed directly in batch mode with the same
expressions."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from batch_processing_analysis_spark.config import EventLogIDs
from batch_processing_analysis_spark.sources.event_log import events_as_event_log
from batch_processing_analysis_spark.streaming.eventlog_stream import (
    EVENT_SCHEMA,
    read_event_log_stream,
    run_available_now,
    stream_batch_accumulation,
    stream_throughput_rollup,
)

IDS = EventLogIDs()


@pytest.fixture(scope="module")
def log_dir(spark, sf_dir, tmp_path_factory):
    """Bounded event-log backlog written as a parquet dir (the stream
    source), in EVENT_SCHEMA column order."""
    path = str(tmp_path_factory.mktemp("stream") / "events")
    log = events_as_event_log(spark, sf_dir, IDS)
    (
        log.select(
            "event_id",
            F.col(IDS.case).alias("case_id"),
            F.col(IDS.activity).alias("activity"),
            F.col(IDS.resource).alias("resource"),
            F.col(IDS.start_time).alias("start_time"),
            F.col(IDS.end_time).alias("end_time"),
        )
        .repartition(4)  # several files -> several source micro-batch splits
        .write.parquet(path)
    )
    return path


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def test_session_accumulation_matches_batch(spark, log_dir, tmp_path):
    stream = read_event_log_stream(spark, log_dir)
    agg = stream_batch_accumulation(stream, IDS, gap="30 seconds")
    got = run_available_now(
        agg, str(tmp_path / "ckpt1"), "acc_test", output_mode="complete"
    )

    batch_events = spark.read.schema(EVENT_SCHEMA).parquet(log_dir)
    expected = stream_batch_accumulation(batch_events, IDS, gap="30 seconds").collect()

    assert len(got) > 0
    assert _canon(got) == _canon(expected)


def test_throughput_rollup_matches_batch(spark, log_dir, tmp_path):
    stream = read_event_log_stream(spark, log_dir)
    agg = stream_throughput_rollup(stream, IDS, window="1 minute")
    got = run_available_now(
        agg, str(tmp_path / "ckpt2"), "thr_test", output_mode="complete"
    )

    batch_events = spark.read.schema(EVENT_SCHEMA).parquet(log_dir)
    expected = stream_throughput_rollup(batch_events, IDS, window="1 minute").collect()

    assert len(got) > 0
    assert _canon(got) == _canon(expected)


def test_session_accumulation_finds_batch_candidates(spark, log_dir, tmp_path):
    """Sessions with >=2 events are accumulation episodes; sanity-check
    shape and invariants (session covers its events' span)."""
    stream = read_event_log_stream(spark, log_dir)
    agg = stream_batch_accumulation(stream, IDS, gap="5 minutes")
    rows = run_available_now(
        agg, str(tmp_path / "ckpt3"), "cand_test", output_mode="complete"
    )
    assert rows
    for r in rows:
        assert r["session_start"] <= r["accumulation_start"]
        assert r["n_events"] >= 1
