"""Waiting-time decomposition (M5) on a handcrafted batch with known
component values, plus the construction invariant
total = creation + ready + other (reference: analysis.py:70-79)."""

from __future__ import annotations

from datetime import datetime

import pytest

from batch_processing_analysis_spark.config import Configuration, EventLogIDs
from batch_processing_analysis_spark.operators.waiting_time import add_waiting_times

IDS = EventLogIDs()
MIN_US = 60 * 1_000_000  # one minute in microseconds


def ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def decomposed(spark):
    rows = [
        # batch 1: c1 enabled 09:00 start 10:00; c2 enabled 09:30 start 10:30.
        ("c1", "A", ts(10), ts(10, 30), ts(9), 1, "Sequential task-based"),
        ("c2", "A", ts(10, 30), ts(11), ts(9, 30), 1, "Sequential task-based"),
        # unbatched row.
        ("c1", "B", ts(12), ts(12, 30), ts(11), None, None),
    ]
    df = spark.createDataFrame(
        rows,
        schema=f"{IDS.case} string, {IDS.activity} string, "
               f"{IDS.start_time} timestamp, {IDS.end_time} timestamp, "
               f"{IDS.enabled_time} timestamp, {IDS.batch_id} long, {IDS.batch_type} string",
    )
    out = add_waiting_times(df, Configuration(report_batch_checkpoints=True))
    return {(r[IDS.case], r[IDS.activity]): r for r in out.collect()}


def test_component_values(decomposed):
    c1 = decomposed[("c1", "A")]
    # instance_enabled = max(case_enabled) = 09:30; instance_start = 10:00.
    assert c1[IDS.batch_total_wt] == 60 * MIN_US
    assert c1[IDS.batch_creation_wt] == 30 * MIN_US   # 09:30 - 09:00
    assert c1[IDS.batch_ready_wt] == 30 * MIN_US      # 10:00 - 09:30
    assert c1[IDS.batch_other_wt] == 0
    c2 = decomposed[("c2", "A")]
    assert c2[IDS.batch_total_wt] == 60 * MIN_US
    assert c2[IDS.batch_creation_wt] == 0
    assert c2[IDS.batch_ready_wt] == 30 * MIN_US
    assert c2[IDS.batch_other_wt] == 30 * MIN_US      # 10:30 - 10:00


def test_invariant_and_unbatched_zero(decomposed):
    for key, r in decomposed.items():
        assert r[IDS.batch_total_wt] == (
            r[IDS.batch_creation_wt] + r[IDS.batch_ready_wt] + r[IDS.batch_other_wt]
        )
    b = decomposed[("c1", "B")]
    assert b[IDS.batch_total_wt] == 0 and b[IDS.batch_pt] == 0


def test_checkpoints(decomposed):
    c1 = decomposed[("c1", "A")]
    assert c1[IDS.batch_instance_enabled] == ts(9, 30)
    assert c1[IDS.batch_start_time] == ts(10)
    assert c1[IDS.batch_case_enabled] == ts(9)
    assert decomposed[("c1", "B")][IDS.batch_start_time] is None
