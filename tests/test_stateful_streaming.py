"""Exact stateful streaming batch detection (streaming/stateful.py):
the closed chains emitted by the applyInPandasWithState operator must
equal the batch detector's chains on the same bounded log."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from batch_processing_analysis_spark.config import EventLogIDs
from batch_processing_analysis_spark.operators.discovery import detect_task_batches
from batch_processing_analysis_spark.streaming.eventlog_stream import EVENT_SCHEMA
from batch_processing_analysis_spark.streaming.stateful import (
    _chains,
    _emit_prefix,
    stream_exact_task_batches,
)

IDS = EventLogIDs()


# ---------------------------------------------------------------------------
# Kernel unit tests (pure python, no Spark)
# ---------------------------------------------------------------------------

def us(h, m=0, s=0):
    return int(datetime(2024, 1, 1, h, m, s).timestamp() * 1_000_000)


def test_chains_matches_batch_boundary_rule():
    rows = sorted([
        (us(10), us(10, 30), "c1"),      # parallel trio
        (us(10), us(10, 30), "c2"),
        (us(10), us(10, 30), "c3"),
        (us(11), us(11, 10), "c1"),      # sequential trio
        (us(11, 10), us(11, 20), "c2"),
        (us(11, 20), us(11, 30), "c3"),
        (us(13), us(13, 30), "c9"),      # singleton
    ])
    got = [(len(c), t) for c, t in _chains(rows, 0)]
    assert got == [(3, "simultaneous"), (3, "sequential"), (1, None)]


def test_emit_prefix_freezes_only_below_watermark():
    rows = sorted([
        (us(10), us(10, 30), "c1"),
        (us(10), us(10, 30), "c2"),
        (us(12), us(12, 30), "c3"),
    ])
    # Watermark below the first chain's end+gap: nothing emittable.
    emitted, kept, due = _emit_prefix(rows, 0, us(10, 15))
    assert not emitted and len(kept) == 3 and due == us(10, 30) + 1
    # Watermark past chain 1 but not chain 2: prefix of one chain.
    emitted, kept, _ = _emit_prefix(rows, 0, us(11))
    assert [len(c) for c, _ in emitted] == [2] and len(kept) == 1
    # Watermark past everything.
    emitted, kept, _ = _emit_prefix(rows, 0, us(13))
    assert [len(c) for c, _ in emitted] == [2, 1] and not kept


def test_emit_prefix_gap_blocks_freezing():
    rows = [(us(10), us(10, 30), "c1")]
    # gap=3600s: chain extendable until wm > end + gap.
    emitted, kept, due = _emit_prefix(rows, 3_600_000_000, us(11, 15))
    assert not emitted and kept and due == us(11, 30) + 1
    emitted, kept, _ = _emit_prefix(rows, 3_600_000_000, us(11, 31))
    assert emitted and not kept


# ---------------------------------------------------------------------------
# End-to-end streaming vs batch agreement
# ---------------------------------------------------------------------------

def ts(h, m=0, s=0):
    return datetime(2024, 1, 1, h, m, s)


EVENTS = [
    # (event_id, case, activity, resource, start, end)
    (1, "c1", "A", "r1", ts(10), ts(10, 30)),      # parallel batch of 3
    (2, "c2", "A", "r1", ts(10), ts(10, 30)),
    (3, "c3", "A", "r1", ts(10), ts(10, 30)),
    (4, "c1", "B", "r1", ts(11), ts(11, 10)),      # sequential batch of 3
    (5, "c2", "B", "r1", ts(11, 10), ts(11, 20)),
    (6, "c3", "B", "r1", ts(11, 20), ts(11, 30)),
    (7, "c1", "C", "r2", ts(9), ts(9, 30)),        # concurrent pair
    (8, "c2", "C", "r2", ts(9, 15), ts(9, 45)),
    (9, "c1", "D", "r2", ts(12), ts(12, 30)),      # singleton
    (10, "c1", "E", "r3", ts(8), ts(8, 30)),       # two gap-separated singles
    (11, "c2", "E", "r3", ts(9, 30), ts(10)),
]


def _write_file(spark, path, rows):
    df = spark.createDataFrame(
        [(i, c, a, r, s, e) for (i, c, a, r, s, e) in rows], schema=EVENT_SCHEMA
    )
    df.coalesce(1).write.mode("append").parquet(path)


@pytest.fixture(scope="module")
def stream_results(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("stateful") / "events")
    # Three files -> three micro-batches (maxFilesPerTrigger=1) so the
    # watermark advances between batches and event-time timeouts fire.
    _write_file(spark, src, EVENTS)
    flush1 = ts(10) + timedelta(days=1)
    flush2 = ts(10) + timedelta(days=2)
    _write_file(spark, src, [(90, "cf", "FLUSH", "rf", flush1,
                              flush1 + timedelta(minutes=1))])
    _write_file(spark, src, [(91, "cf", "FLUSH", "rf", flush2,
                              flush2 + timedelta(minutes=1))])

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    chains = stream_exact_task_batches(stream, IDS, gap_seconds=0,
                                       watermark="1 second")
    ckpt = str(tmp_path_factory.mktemp("stateful") / "ckpt")
    q = (
        chains.writeStream.format("memory").queryName("exact_chains")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    return [r for r in spark.sql("SELECT * FROM exact_chains").collect()
            if r["activity"] != "FLUSH"]


def _batch_expected(spark):
    log = spark.createDataFrame(
        [(c, a, r, s, e) for (_, c, a, r, s, e) in EVENTS],
        schema=f"{IDS.case} string, {IDS.activity} string, {IDS.resource} string, "
               f"{IDS.start_time} timestamp, {IDS.end_time} timestamp",
    )
    out = detect_task_batches(log, IDS).collect()
    chains = {}
    singles = []
    for r in out:
        if r["_task_grp"] is not None:
            chains.setdefault(r["_task_grp"], []).append(r)
        else:
            singles.append(r)
    exp = set()
    for grp in chains.values():
        exp.add((
            grp[0][IDS.resource], grp[0][IDS.activity],
            min(r[IDS.start_time] for r in grp),
            max(r[IDS.end_time] for r in grp),
            len(grp), len({r[IDS.case] for r in grp}),
            grp[0]["_task_type"],
        ))
    for r in singles:
        exp.add((r[IDS.resource], r[IDS.activity], r[IDS.start_time],
                 r[IDS.end_time], 1, 1, None))
    return exp


def test_streamed_chains_equal_batch_chains(spark, stream_results):
    got = {
        (r["resource"], r["activity"], r["chain_start"], r["chain_end"],
         r["n_events"], r["n_cases"], r["chain_type"])
        for r in stream_results
    }
    assert got == _batch_expected(spark)


def test_exact_distinct_case_counts(stream_results):
    by_act = {r["activity"]: r for r in stream_results
              if r["chain_type"] is not None}
    assert by_act["A"]["n_cases"] == 3 and by_act["A"]["chain_type"] == "simultaneous"
    assert by_act["B"]["n_cases"] == 3 and by_act["B"]["chain_type"] == "sequential"
    assert by_act["C"]["n_cases"] == 2 and by_act["C"]["chain_type"] == "concurrent"
