"""JSONL (newline-delimited JSON) corpus source/sink.

JSONL is the lingua franca of LLM training-data exchange (one document
object per line, gzip-friendly, streamable). This module reads and
writes the ``documents`` shape with an EXPLICIT schema — at 100 TB a
schema-inference pass is a full extra scan of the corpus, so inference
is opt-in, never the default.

Scale notes:
- reads are line-splittable (plain and, with a splittable codec,
  compressed), so a 100 TB corpus parallelizes to one task per
  ``maxPartitionBytes`` chunk;
- ``mode="PERMISSIVE"`` + ``columnNameOfCorruptRecord`` keeps a single
  corrupt line from failing a task — corrupt rows surface in a column
  the caller can count/quarantine (the standard data-lake triage
  pattern) instead of a job failure at hour six;
- the writer partitions by nothing by default (the shard-packing
  operator q59 decides file layout); ``compression="gzip"`` for
  exchange, none for re-read speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])

CORRUPT_COL = "_corrupt_record"


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType = DOCUMENTS_SCHEMA) -> DataFrame:
    """Read a JSONL corpus with an explicit schema (no inference scan).

    Corrupt lines land in ``_corrupt_record`` instead of failing the
    job; use :func:`split_corrupt` to separate them.
    """
    # StructType.add mutates in place — build a fresh struct so the
    # caller's (often module-level) schema object stays pristine.
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the corrupt column, quarantined raw lines).

    Spark refuses queries whose referenced columns are ONLY the
    internal corrupt-record column of a raw JSON scan (SPARK-26716) —
    the documented contract is to materialize the parsed result first.
    We cache here; a production triage of a 100 TB corpus should
    instead write the parsed frame to parquet once and split from that
    (one scan, no executor-memory residency), which this helper also
    accepts since the cached plan is no longer a raw-file scan.
    """
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, bad


def write_jsonl(df: DataFrame, path: str, compression: str | None = None,
                mode: str = "overwrite") -> None:
    """Write a corpus as JSONL (one object per line, column order =
    DataFrame order). ``compression="gzip"`` for exchange artifacts."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
