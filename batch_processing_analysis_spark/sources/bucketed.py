"""Bucketed-table sink/loader: pre-shuffled storage for repeated
co-located joins.

At 100 TB the dominant cost of a keyed join is the shuffle of the big
fact table. Spark's bucketing (`DataFrameWriter.bucketBy` +
`saveAsTable`) persists data pre-hash-partitioned AND pre-sorted on the
join key, so every subsequent equi-join or aggregation on that key
plans WITHOUT an Exchange on the bucketed side — the shuffle is paid
once at write time, then amortized across every downstream query (the
standard warehouse pattern; see Spark SQL's `ClusteredDistribution`
reporting by `FileSourceScanExec` for bucketed reads).

Contract notes (enforced here, easy to get wrong):
- both join sides must be bucketed with the SAME bucket count on the
  join key, else Spark re-shuffles the mismatched side;
- bucketed tables are metastore tables, not bare parquet paths —
  `spark.read.parquet` on the files LOSES bucketing metadata; load via
  :func:`load_bucketed` (table name) only;
- `spark.sql.sources.bucketing.enabled` must stay true (default) and
  the scan must not coalesce buckets
  (`spark.sql.bucketing.coalesceBucketsInJoin.enabled` handles small
  mismatches; exact match never coalesces).

tests/test_bucketed.py proves the exchange-free plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str | list[str],
                   num_buckets: int = 32, mode: str = "overwrite",
                   path: str | None = None) -> None:
    """Persist ``df`` as a parquet-backed table bucketed AND sorted by
    ``key``. One shuffle now; none on any later join or aggregation
    keyed on ``key``. ``path`` makes it an external table at that
    location (otherwise it lands in the session warehouse)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *keys)
        .sortBy(*keys)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def load_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Load a bucketed table WITH its bucketing metadata (must go
    through the catalog — a path-based parquet read silently degrades
    to an unbucketed scan)."""
    return spark.table(table)
