"""Multimodal column plumbing (M10): opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched ``mapInPandas``.

The design contract for image/audio/video at 100 TB:

- the payload is an opaque ``binary`` column next to a typed metadata
  struct (modality, n_bytes, source) — Spark never interprets it;
- decode / feature-extract / resize / frame-sample run as
  ``mapInPandas`` stages so bytes move driver-free through Arrow
  record batches, one Python worker per partition;
- partitioning is by payload size (``repartitionByRange`` on n_bytes
  upstream if skewed) so one 4 GB video cannot straggle a task that
  also holds ten thousand thumbnails.

The actual media codecs (PIL/ffmpeg/torchaudio) are NOT available in
this environment, so the decode kernels are stubbed: real Spark-side
schema/batching/partitioning, deterministic fake features derived from
the raw bytes. ``decode_image``/``decode_audio`` raise
``NotImplementedError`` with the intended signature documented — the
single line to replace when the codec libraries exist.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_checksum", T.LongType()),
        T.StructField("feature_dim", T.IntegerType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to HxWxC uint8.

    STUB — replace with ``PIL.Image.open(io.BytesIO(payload))`` (or
    cv2.imdecode) where the codec libraries are installed. The Spark
    plumbing around this call (schema, Arrow batching, partitioning) is
    real and tested; only the codec is absent in this container.
    """
    raise NotImplementedError("image codec not available in this environment")


def decode_audio(payload: bytes) -> "object":
    """Decode an audio payload to (samples float32, sample_rate). STUB —
    see :func:`decode_image`."""
    raise NotImplementedError("audio codec not available in this environment")


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-Arrow-batch deterministic byte features (codec-free stand-in
    for decode + embed). Pure function of the payload bytes, so the
    DuckDB oracle can reproduce it exactly."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "n_bytes": payloads.map(len).astype("int64"),
                "byte_checksum": payloads.map(lambda b: sum(b) % 997).astype("int64"),
                "feature_dim": 64,
            }
        )


def binary_features(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Adapt the documents table into (id, modality, binary payload) and
    run the mapInPandas feature stage.

    In production the payload column comes off parquet/tar shards
    directly; here the UTF-8 bytes of ``text`` stand in so the whole
    path — binary column, metadata, Arrow exchange, batch-shaped UDF —
    executes for real.
    """
    payloads = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.lit("text").alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )
    return payloads.mapInPandas(_feature_batches, FEATURE_SCHEMA)
