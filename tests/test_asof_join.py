"""As-of join semantics on a planted fixture: inclusive match,
no-match nulls, tolerance expiry, duplicate-timestamp determinism,
and the single-shuffle plan shape."""

from __future__ import annotations

from datetime import datetime

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from batch_processing_analysis_spark.operators.asof import asof_join


def _ts(s):
    return datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def spark_hypothesis(spark):
    """Session-scoped alias so @given can reuse one SparkSession."""
    return spark


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(10)), (2, "u1", _ts(20)), (3, "u2", _ts(5)),
         (4, "u3", _ts(30))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts(8), 1.0), ("u1", _ts(10), 2.0), ("u1", _ts(15), 3.0),
         ("u2", _ts(9), 4.0)],
        "user_id string, ts timestamp, val double",
    )
    return left, right


def test_asof_backward_inclusive(spark, frames):
    left, right = frames
    out = {r.event_id: r for r in
           asof_join(left, right, on="user_id").collect()}
    # event 1 at t=10: right rows at 8 and 10 qualify; 10 (inclusive) wins
    assert out[1].val == 2.0 and out[1].matched_ts == _ts(10)
    # event 2 at t=20: newest is 15
    assert out[2].val == 3.0
    # event 3 at t=5 (u2): only right row is at 9 > 5 → no match
    assert out[3].val is None and out[3].matched_ts is None
    # event 4 (u3): key absent from right → no match
    assert out[4].val is None


def test_asof_tolerance(spark, frames):
    left, right = frames
    out = {r.event_id: r for r in
           asof_join(left, right, on="user_id",
                     tolerance_seconds=3).collect()}
    # event 2 at t=20, match at 15 is 5s old > 3s tolerance → nulled
    assert out[2].val is None
    # event 1 at t=10, match at 10 is 0s old → kept
    assert out[1].val == 2.0


def test_asof_duplicate_right_ts_deterministic(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10))], "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame(
        [("u", _ts(5), 1.0), ("u", _ts(5), 9.0)],
        "user_id string, ts timestamp, val double",
    )
    # max payload struct wins → val 9.0, every run
    vals = {asof_join(left, right, on="user_id").collect()[0].val
            for _ in range(3)}
    assert vals == {9.0}


def test_asof_clash_raises(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="clash"):
        asof_join(left, right.withColumnRenamed("val", "event_id"),
                  on="user_id")


def test_asof_single_shuffle(spark, frames):
    left, right = frames
    plan = (
        asof_join(left, right, on="user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the union-merge rewrite has no join at all — one exchange + sort
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


@settings(max_examples=12, deadline=None)
@given(
    lefts=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 50)),
        min_size=1, max_size=12,
    ),
    rights=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 50),
                  st.integers(-5, 5)),
        max_size=12, unique_by=lambda t: (t[0], t[1]),
    ),
)
def test_asof_matches_pandas_merge_asof(spark_hypothesis, lefts, rights):
    """Oracle: pandas.merge_asof (direction='backward', inclusive) —
    the published reference semantics — on random unique-(key, ts)
    right sides."""
    spark = spark_hypothesis
    import pandas as pd

    lpd = pd.DataFrame(
        [(i, k, _ts(t)) for i, (k, t) in enumerate(lefts)],
        columns=["event_id", "user_id", "ts"],
    )
    rpd = pd.DataFrame(
        [(k, _ts(t), float(v)) for (k, t, v) in rights],
        columns=["user_id", "ts", "val"],
    )
    rpd["ts"] = pd.to_datetime(rpd["ts"])  # empty frame: keep dtype M8
    want = pd.merge_asof(
        lpd.sort_values("ts", kind="stable"),
        rpd.sort_values("ts", kind="stable"),
        on="ts", by="user_id", direction="backward",
    ).sort_values("event_id")

    left = spark.createDataFrame(
        lpd, "event_id long, user_id string, ts timestamp")
    if len(rpd):
        right = spark.createDataFrame(
            rpd, "user_id string, ts timestamp, val double")
    else:
        right = spark.createDataFrame([], "user_id string, ts timestamp, val double")
    got = {r.event_id: r.val for r in
           asof_join(left, right, on="user_id").collect()}

    for _, row in want.iterrows():
        g = got[row.event_id]
        if pd.isna(row.val):
            assert g is None, (row.event_id, g)
        else:
            assert g == row.val, (row.event_id, g, row.val)
