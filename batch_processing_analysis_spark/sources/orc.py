"""ORC source/sink (M52): the second columnar interchange format, for
pipelines whose upstream warehouse is Hive/Trino-flavored (ORC ACID
tables, Hive streaming ingest) rather than parquet-native.

Spark's built-in ORC reader gives the same executor-side goodies as
parquet — predicate pushdown into stripe/row-group indexes, column
pruning, vectorized decoding — so the engine's scan-shaped plans work
unchanged; tests assert PushedFilters/ReadSchema on the ORC scan just
like the parquet plan audit. Writes pass an explicit schema contract:
no inference scan, same discipline as sources/jsonl.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              compression: str = "zstd") -> None:
    """Write ``df`` as ORC (zstd by default — the modern
    ratio/throughput sweet spot both ORC and parquet agree on)."""
    df.write.mode(mode).option("compression", compression).orc(path)


def read_orc(spark: SparkSession, path: str,
             schema: T.StructType | str | None = None) -> DataFrame:
    """Read ORC with an EXPLICIT schema when the caller has the
    contract (skips footer-sampling inference on wide directories);
    ``schema=None`` trusts the embedded file schema — ORC is
    self-describing, so unlike JSONL there is a safe no-schema path."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)
