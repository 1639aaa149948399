"""Training-shard sink/loader (M34 scale extension): persist a corpus
in training order as one directory per shard, files internally ordered.

The write side composes with :func:`operators.ordering.seeded_shuffle`
(which assigns ``shard``/``pos``): one hash exchange on the shard
column co-locates each shard in one task, a within-partition sort puts
rows in ``pos`` order, and ``partitionBy(shard)`` lays out
``shard=<k>/part-*.parquet`` directories. Row order inside every
output file is the training order — a sequential reader (or
``spark.read`` + ``sortWithinPartitions(pos)``) replays it exactly.

The read side gets **partition pruning** for free: filtering on
``shard`` never opens the other directories (data-loader workers each
own a shard subset — the standard distributed-training layout).
``max_records_per_file`` bounds file sizes for loader-side streaming
without breaking order (Spark splits a sorted task output into
consecutive files).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_training_shards(df: DataFrame, path: str,
                          shard_col: str = "shard", pos_col: str = "pos",
                          max_records_per_file: int | None = None) -> None:
    """Write ``df`` as ``<path>/shard=<k>/`` parquet, each shard's rows
    in ``pos`` order within and across its files.

    One shuffle (hash on ``shard_col``) + per-partition sort; no global
    sort. At 1000 executors with S ≥ executors, every task writes
    whole shards and the write is embarrassingly parallel.
    """
    writer = (
        df.repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, pos_col)
        .write.mode("overwrite")
        .partitionBy(shard_col)
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def read_training_shards(spark: SparkSession, path: str,
                         shards: Sequence[int] | None = None,
                         shard_col: str = "shard") -> DataFrame:
    """Load training shards; ``shards`` restricts to a subset via
    partition pruning (only those directories are listed/read — verify
    with ``df.inputFiles()``, asserted in tests/test_training_sink.py).
    """
    df = spark.read.parquet(path)
    if shards is not None:
        df = df.filter(F.col(shard_col).isin(list(shards)))
    return df
