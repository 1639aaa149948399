"""Durable incremental ingest loop (M35): streaming dedup against a
PERSISTED content-hash registry — the production form of
operators/incremental.merge_exact_increment.

``stream_exact_dedup`` (corpus_stream.py) bounds its state by a
watermark: duplicates separated by more than the horizon — or by a
stream restart — slip through. This loop closes that gap the way a
long-running ingest actually runs: ``foreachBatch`` checks every
micro-batch against a registry table on durable storage, appends the
survivors to the corpus, and extends the registry — so dedup state
survives restarts indefinitely and is shared with the batch engine
(same content hash ⇒ a batch `merge_exact_increment` over the same
arrivals keeps exactly the same cluster set).

Idempotency (foreachBatch may re-run a batch after a failure): every
batch writes its OWN partition directory ``ingest_batch=<id>`` in both
corpus and registry, with overwrite mode — a retry rewrites the same
directory instead of appending twice — and the registry read EXCLUDES
the current batch's partition, so a half-written registry from the
failed attempt can't mask the batch's own rows.

Scale: the per-batch work is one window over the (small) micro-batch
plus one anti-join against the registry — a hash join keyed on the
content hash; the registry scan prunes to the hash column only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.utils import AnalysisException

from .corpus_stream import CONTENT_HASH, with_content_hash


def _read_registry(spark: SparkSession, registry_path: str,
                   exclude_batch: int) -> DataFrame | None:
    try:
        reg = spark.read.option("basePath", registry_path).parquet(registry_path)
    except AnalysisException:  # first batch ever: no registry yet
        return None
    return reg.filter(F.col("ingest_batch") != exclude_batch).select(CONTENT_HASH)


def ingest_micro_batch(batch_df: DataFrame, batch_id: int, *,
                       corpus_path: str, registry_path: str,
                       id_col: str = "doc_id", text_col: str = "text",
                       time_col: str = "ingest_time") -> None:
    """Process one micro-batch: first-arrival dedup within the batch,
    anti-join the durable registry, append survivors + their hashes
    (each into an ``ingest_batch=<id>`` partition, overwrite = retry-
    idempotent)."""
    spark = batch_df.sparkSession
    hashed = with_content_hash(batch_df, text_col)
    w = W.partitionBy(CONTENT_HASH).orderBy(time_col, id_col)
    canon = (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    registry = _read_registry(spark, registry_path, batch_id)
    kept = canon if registry is None else canon.join(
        registry, CONTENT_HASH, "left_anti"
    )
    # One pass, two sinks: materialize survivors once.
    kept = kept.localCheckpoint(eager=True)
    kept.write.mode("overwrite").parquet(
        f"{corpus_path}/ingest_batch={batch_id}"
    )
    kept.select(CONTENT_HASH).write.mode("overwrite").parquet(
        f"{registry_path}/ingest_batch={batch_id}"
    )


def start_incremental_ingest(stream_docs: DataFrame, *, corpus_path: str,
                             registry_path: str, checkpoint_path: str,
                             id_col: str = "doc_id", text_col: str = "text",
                             time_col: str = "ingest_time",
                             available_now: bool = True) -> StreamingQuery:
    """Run the ingest loop over a streaming DataFrame of documents.

    ``available_now=True`` drains what exists and stops (the test/
    backfill mode); ``False`` runs continuously. Restarting with the
    same checkpoint+registry resumes exactly where it left off — state
    lives on disk, not in executor memory.
    """

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        ingest_micro_batch(
            batch_df, batch_id, corpus_path=corpus_path,
            registry_path=registry_path, id_col=id_col,
            text_col=text_col, time_col=time_col,
        )

    writer = (
        stream_docs.writeStream.foreachBatch(_fn)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_ingested(spark: SparkSession, corpus_path: str) -> DataFrame:
    """The deduplicated corpus accumulated so far (all batch partitions)."""
    return spark.read.option("basePath", corpus_path).parquet(corpus_path)
