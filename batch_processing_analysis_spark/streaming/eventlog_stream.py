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
