"""Stream-stream watermarked interval join (M120,
streaming/eventlog_stream.py:stream_interval_join): streamed == batch
on an in-watermark replay (the same builder runs on both — withWatermark
is a no-op on batch), and a deliberately-late row is dropped on the
stream but present in batch — the watermark semantics, proven both
directions."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from batch_processing_analysis_spark.streaming.eventlog_stream import (
    stream_interval_join,
)

SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
])

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _mk(i, mins, user, etype):
    return (i, T0 + timedelta(minutes=mins), user, etype)


def _events():
    rows = []
    i = 0
    # user 1: click at 0 -> buys at +3 and +9 (both within 10 min),
    # and at +15 (outside). Second click at 20 -> buy at 25.
    for mins, et in [(0, "click"), (3, "buy"), (9, "buy"), (15, "buy"),
                     (20, "click"), (25, "buy")]:
        rows.append(_mk(i, mins, 1, et)); i += 1
    # user 2: buy BEFORE any click (never joins), then click, no buy.
    for mins, et in [(2, "buy"), (6, "click")]:
        rows.append(_mk(i, mins, 2, et)); i += 1
    # user 3: interleaved clicks sharing one buy.
    for mins, et in [(30, "click"), (33, "click"), (38, "buy")]:
        rows.append(_mk(i, mins, 3, et)); i += 1
    return rows


def _pairs(df):
    return {(r.user_id, r.cause_id, r.effect_id, r.lag_s)
            for r in df.collect()}


@pytest.fixture(scope="module")
def replay(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("ssj_in"))
    ck = str(tmp_path_factory.mktemp("ssj_ck"))
    rows = sorted(_events(), key=lambda r: r[1])
    df = spark.createDataFrame(rows, SCHEMA)
    # three time-contiguous files -> three micro-batches
    for lo, hi in ((0, 10), (10, 28), (28, 60)):
        df.filter(
            (F.col("ts") >= T0 + timedelta(minutes=lo))
            & (F.col("ts") < T0 + timedelta(minutes=hi))
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = stream_interval_join(stream, "click", "buy", 600,
                               watermark="2 hours")
    q = (out.writeStream.format("memory").queryName("ssj")
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    batch = stream_interval_join(spark.createDataFrame(rows, SCHEMA),
                                 "click", "buy", 600,
                                 watermark="2 hours")
    return spark.table("ssj"), batch


def test_streamed_equals_batch_within_watermark(replay):
    streamed, batch = replay
    got, want = _pairs(streamed), _pairs(batch)
    assert got == want
    # semantics spot-checks from the constructed log
    assert (1, 0, 1, 180) in want      # click 0 -> buy +3
    assert (1, 0, 2, 540) in want      # click 0 -> buy +9
    assert not any(c == 0 and e == 3 for _, c, e, _ in want)  # +15 out
    assert (3, 8, 10, 480) in want and (3, 9, 10, 300) in want


def test_late_row_dropped_on_stream_kept_in_batch(
        spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("ssj_late_in"))
    ck = str(tmp_path_factory.mktemp("ssj_late_ck"))
    on_time = [_mk(0, 0, 1, "click"), _mk(1, 300, 1, "click"),
               _mk(2, 301, 1, "buy")]
    late = [_mk(3, 2, 1, "buy")]  # joins click 0 in batch; 5h late

    # Two sequential availableNow runs over ONE checkpoint make the
    # arrival order deterministic: run 1 sees only the on-time file
    # and advances the watermark to minute 291 (persisted in the
    # checkpoint); run 2 restores it and sees the late file.
    got: list = []

    def _run():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        out = stream_interval_join(stream, "click", "buy", 600,
                                   watermark="10 minutes")
        q = (out.writeStream
             .foreachBatch(lambda bdf, bid: got.extend(bdf.collect()))
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {(r.user_id, r.cause_id, r.effect_id, r.lag_s)
                for r in got}

    spark.createDataFrame(on_time, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)
    _run()
    spark.createDataFrame(late, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)
    streamed = _run()
    batch = _pairs(stream_interval_join(
        spark.createDataFrame(on_time + late, SCHEMA),
        "click", "buy", 600, watermark="10 minutes"))
    assert (1, 1, 2, 60) in streamed          # on-time pair flows
    assert (1, 0, 3, 120) in batch            # batch sees the pair
    assert (1, 0, 3, 120) not in streamed     # stream dropped it


def test_rejects_bad_window(spark):
    df = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError):
        stream_interval_join(df, "a", "b", 0)
