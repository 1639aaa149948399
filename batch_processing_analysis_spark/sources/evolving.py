"""Schema-evolution-tolerant parquet ingestion (M73).

A 100 TB corpus is never written by one pipeline version: month-old
shards miss columns that last week's writer added, an id column widened
from int32 to int64, a float became a double. `spark.read.parquet` with
`mergeSchema=true` REFUSES exactly these drops-ins ("Failed to merge
incompatible data types int and bigint"), and without it the scan
silently adopts one random file's footer.

This loader makes the evolution contract explicit instead: the caller
names the TARGET schema; each input path is read under its own footer
schema and aligned to the target —

- missing column → typed NULL (documented as "added after this shard");
- extra column → dropped (never silently merged);
- type change → explicit `cast` (Spark's standard widening rules;
  a cast that cannot narrow safely yields NULL per ANSI-off casting,
  which the validation gate (operators/validation.py) catches
  downstream).

Per-path alignment + `unionByName` keeps every file readable on its
own terms — no cross-file footer merge to fail — and the union of
identical schemas collapses into one multi-path scan, so pruning and
pushdown still apply per input.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def align_to_schema(df: DataFrame, target: StructType) -> DataFrame:
    """Project ``df`` onto ``target``: cast shared columns, create
    missing ones as typed NULLs, drop extras. Column matching is
    case-sensitive (parquet is)."""
    have = {f.name for f in df.schema.fields}
    cols = []
    for field in target.fields:
        if field.name in have:
            cols.append(F.col(field.name).cast(field.dataType)
                        .alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def load_evolving(spark: SparkSession, paths: Sequence[str],
                  target: StructType | str) -> DataFrame:
    """Read every parquet path under its OWN schema, align each to
    ``target`` (a StructType or DDL string), union the results. The
    output schema is exactly ``target`` regardless of what any
    individual shard recorded."""
    if isinstance(target, str):
        target = StructType.fromDDL(target)
    out: DataFrame | None = None
    for p in paths:
        part = align_to_schema(spark.read.parquet(p), target)
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("load_evolving: no input paths")
    return out
