"""Bucketed tables: the join/agg on the bucket key must plan WITHOUT a
shuffle (no Exchange over the bucketed scans), and results must equal
the unbucketed plan's."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_processing_analysis_spark.sources.bucketed import (
    load_bucketed, write_bucketed,
)
from batch_processing_analysis_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_events(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    write_bucketed(ev, "ev_bucketed", "user_id", num_buckets=8,
                   path=str(wh / "ev"))
    write_bucketed(
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_total")),
        "users_bucketed", "user_id", num_buckets=8, path=str(wh / "users"),
    )
    yield
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS users_bucketed")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_events):
    """With the broadcast path disabled (at fact×fact scale neither
    side broadcasts), the bucketed sort-merge join must read both
    sides bucket-aligned: no Exchange anywhere in the plan."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = load_bucketed(spark, "ev_bucketed")
        b = load_bucketed(spark, "users_bucketed")
        joined = a.join(b, "user_id")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_has_no_exchange(spark, bucketed_events):
    a = load_bucketed(spark, "ev_bucketed")
    agg = a.groupBy("user_id").agg(F.sum("value").alias("s"))
    assert "Exchange" not in _plan(agg)


def test_bucketed_join_matches_unbucketed(spark, sf_dir, bucketed_events):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    users = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_total"))
    want = sorted(map(tuple, ev.join(users, "user_id").collect()))
    got = sorted(map(tuple, load_bucketed(spark, "ev_bucketed").join(
        load_bucketed(spark, "users_bucketed"), "user_id").collect()))
    assert got == want


def test_path_read_loses_bucketing_documented(spark, bucketed_events):
    """The failure mode the loader guards against: reading the table's
    parquet files by path drops bucket metadata and reintroduces the
    shuffle."""
    loc = (
        spark.sql("DESCRIBE TABLE EXTENDED ev_bucketed")
        .filter(F.col("col_name") == "Location").collect()[0].data_type
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        by_path = spark.read.parquet(loc)
        b = load_bucketed(spark, "users_bucketed")
        plan = _plan(by_path.join(b, "user_id"))
        assert "ShuffleExchange" in plan or "Exchange hashpartitioning" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
