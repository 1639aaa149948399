"""Streaming corpus operators: exact dedup over an unbounded document
stream (the ingestion-side twin of operators/dedup.exact_dedup).

A training-data ingestion pipeline dedups as documents ARRIVE — before
paying storage/compute downstream — not in a later batch pass. The
exact-dedup key (md5 of whitespace-normalized lowercase text) is
identical to the batch operator, so a batch re-run over the stream's
output finds nothing left to drop.

Semantics: keep the FIRST-ARRIVING document of each content-hash
cluster within the watermark horizon (the batch pass keeps min-id; the
set of kept *clusters* is identical, the representative may differ —
documented divergence inherent to streaming, where arrival order is the
only total order available). State is the hash→seen set bounded by the
watermark via ``dropDuplicatesWithinWatermark``; duplicates separated
by more than the horizon require a periodic batch sweep, the standard
lambda-architecture split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONTENT_HASH = "content_hash"


def with_content_hash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Batch-identical content hash (operators/dedup.py:exact_dedup)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return docs.withColumn(CONTENT_HASH, F.md5(norm))


def stream_exact_dedup(docs: DataFrame, time_col: str = "ingest_time",
                       text_col: str = "text",
                       watermark: str = "10 minutes") -> DataFrame:
    """First-arriving-survivor exact dedup on a document stream.

    State: one row per distinct content hash inside the watermark
    horizon — bounded, keyed, and shuffled on the hash exactly like the
    batch operator's single exchange.
    """
    return (
        with_content_hash(docs, text_col)
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark([CONTENT_HASH])
    )
