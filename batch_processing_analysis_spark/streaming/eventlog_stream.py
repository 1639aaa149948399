"""Structured Streaming surface (SURVEY §2.8: an *extension*, not
reference parity — the reference is strictly bounded-batch).

The streaming analog of batch accumulation (W1) is the session window:
executions of the same activity by the same resource that arrive within
``gap`` of each other belong to one accumulation episode. On an
unbounded log this is exactly `F.session_window` with a watermark for
late data; the closed sessions feed the same downstream reporting
aggregates the batch engine uses.

Scale notes:
- State is keyed by (resource, activity) session — bounded by the
  watermark horizon, so executors hold O(active sessions), not O(log).
- The tumbling throughput rollup is partial-aggregable; output mode
  "update"/"append" both work (append after watermark close).
- File sources (parquet dirs) give exactly-once replay; kafka swaps in
  without touching the transformations (both are just ``readStream``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import EventLogIDs

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("case_id", T.StringType()),
    T.StructField("activity", T.StringType()),
    T.StructField("resource", T.StringType()),
    T.StructField("start_time", T.TimestampType()),
    T.StructField("end_time", T.TimestampType()),
])


def read_event_log_stream(spark: SparkSession, path: str,
                          schema: T.StructType = EVENT_SCHEMA) -> DataFrame:
    """File-based streaming source over an event-log directory. Each new
    parquet file in ``path`` is one micro-batch of events."""
    return spark.readStream.schema(schema).parquet(path)


def stream_batch_accumulation(events: DataFrame, ids: EventLogIDs,
                              gap: str = "30 seconds",
                              watermark: str = "10 minutes") -> DataFrame:
    """Session-window batch accumulation per (resource, activity).

    One output row per closed session: the streaming counterpart of a
    task-batch chain (W1) — events of the same activity executed by the
    same resource with inter-arrival ≤ ``gap``. Sessions with ≥2 distinct
    cases are batch-instance candidates.

    Late events within ``watermark`` still extend/merge sessions;
    older ones are dropped (documented late-data policy).
    """
    res = F.coalesce(F.col(ids.resource), F.lit("NOT_SET"))
    return (
        events.withWatermark(ids.start_time, watermark)
        .groupBy(
            F.session_window(F.col(ids.start_time), gap).alias("session"),
            res.alias("resource"),
            F.col(ids.activity).alias("activity"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct(ids.case).alias("n_cases_approx"),
            F.min(ids.start_time).alias("accumulation_start"),
            F.max(ids.end_time).alias("accumulation_end"),
        )
        .select(
            "resource", "activity",
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events", "n_cases_approx",
            "accumulation_start", "accumulation_end",
        )
    )


def stream_throughput_rollup(events: DataFrame, ids: EventLogIDs,
                             window: str = "1 minute",
                             watermark: str = "10 minutes") -> DataFrame:
    """Tumbling-window throughput per activity: events/cases per window.
    The streaming twin of the report denominators (A10)."""
    return (
        events.withWatermark(ids.start_time, watermark)
        .groupBy(
            F.window(F.col(ids.start_time), window).alias("w"),
            F.col(ids.activity).alias("activity"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct(ids.case).alias("n_cases_approx"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "activity", "n_events", "n_cases_approx",
        )
    )


def run_available_now(stream_df: DataFrame, checkpoint_dir: str,
                      query_name: str = "eventlog_stream",
                      output_mode: str = "append") -> list:
    """Drain a bounded backlog through the streaming engine
    (trigger=availableNow) into an in-memory sink and return the rows.
    Used by tests to prove streaming/batch agreement; production sinks
    swap `format("memory")` for parquet/kafka with the same plan.

    In append mode only sessions already closed by the final watermark
    emit; tests use "complete" so the bounded replay yields every window.
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.sql(f"SELECT * FROM {query_name}").collect()


def stream_interval_join(events: DataFrame, cause_type: str,
                         effect_type: str, within_seconds: int,
                         watermark: str = "30 minutes",
                         key_col: str = "user_id", ts_col: str = "ts",
                         id_col: str = "event_id",
                         type_col: str = "event_type") -> DataFrame:
    """Watermarked stream-stream interval join (M120): per key, pair
    every ``cause_type`` event with every ``effect_type`` event of the
    same key arriving within ``within_seconds`` AFTER it — the
    canonical event-time attribution join (click→conversion,
    action→error), and the one Structured Streaming join class whose
    state Spark can PROVE bounded: both sides carry a watermark and
    the join condition carries the time range, so cause-side state
    older than ``watermark + within`` and effect-side state older than
    ``watermark`` are dropped instead of accumulating forever (the
    stream-stream inner-join state-retention rule of the Structured
    Streaming programming guide: retention is derived from the
    watermark plus the event-time range condition).

    Built to run IDENTICALLY on a batch frame (``withWatermark`` is a
    documented no-op on batch inputs), so the test oracle is this same
    builder over the replayed table — streamed == batch whenever no
    row arrives later than the watermark allows, and a deliberately
    late row is DROPPED on the stream (asserted both ways in
    tests/test_stream_interval_join.py).

    Returns ``(key, cause_id, effect_id, cause_ts, effect_ts, lag_s)``
    with ``lag_s`` in whole seconds (integer floor). Output mode
    append; results emit once both watermarks pass the pair.
    """
    if within_seconds <= 0:
        raise ValueError(f"within_seconds must be positive, "
                         f"got {within_seconds}")
    cause = (
        events.filter(F.col(type_col) == cause_type)
        .select(F.col(key_col).alias("_k"),
                F.col(id_col).alias("cause_id"),
                F.col(ts_col).alias("cause_ts"))
        .withWatermark("cause_ts", watermark)
    )
    effect = (
        events.filter(F.col(type_col) == effect_type)
        .select(F.col(key_col).alias("_ke"),
                F.col(id_col).alias("effect_id"),
                F.col(ts_col).alias("effect_ts"))
        .withWatermark("effect_ts", watermark)
    )
    joined = cause.join(
        effect,
        (F.col("_k") == F.col("_ke"))
        & (F.col("effect_ts") >= F.col("cause_ts"))
        & (F.col("effect_ts")
           <= F.col("cause_ts")
           + F.expr(f"INTERVAL {int(within_seconds)} SECONDS")),
        "inner",
    )
    return joined.select(
        F.col("_k").alias(key_col), "cause_id", "effect_id",
        "cause_ts", "effect_ts",
        F.floor(F.unix_timestamp("effect_ts")
                - F.unix_timestamp("cause_ts")).cast("long")
        .alias("lag_s"),
    )
