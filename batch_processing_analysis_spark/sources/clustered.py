"""Range-clustered and Z-ordered parquet layouts (M69): data skipping
by storage layout.

Parquet scans prune twice — files by footer min/max, row groups by
row-group min/max — but pruning only bites if values are CLUSTERED:
randomly-laid-out data has every file spanning the whole value range,
so every predicate touches every file. At 100 TB the difference
between "scan 2 of 1000 files" and "scan all 1000" dwarfs any
compute-side optimization on the same query.

Two layouts, both plain parquet (no table format required):

- :func:`write_clustered` — global range partitioning + in-partition
  sort on the cluster columns (`repartitionByRange` does a sampled
  range shuffle; Spark writes one tight value band per file). Best
  when queries filter the LEADING column; trailing columns cluster
  only within a leading band (the standard composite-sort caveat).
- :func:`write_zordered` — interleave the bits of k numeric columns
  into one Z-value (Morton order; the curve behind Delta Lake /
  Databricks `OPTIMIZE ZORDER BY`, public docs), then range-cluster
  on that. Every file gets a small hyper-rectangle of the value
  space, so min/max pruning works on ANY of the k columns, at the
  price of each being a bit coarser than a dedicated sort.

The Z-value is pure codegen (fixed-width shift/mask/or chain — no
UDF); per-column scale bounds come from ONE driver-side min/max
aggregate over the input (documented scalar action, same policy as
enablement's `auto` probe). Layout affects FILES ONLY — rows, values,
and schema are untouched, which tests/test_clustered.py pins
alongside the pruning-geometry assertions via pyarrow footers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(scaled: list[Column], bits: int) -> Column:
    """Morton interleave: bit i of column j lands at position
    ``i * k + j``. Inputs must already be ints in [0, 2^bits)."""
    k = len(scaled)
    out = F.lit(0).cast("long")
    for j, c in enumerate(scaled):
        for i in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j
                )
            )
    return out


def zvalue(cols: list[Column], mins: list, maxs: list, bits: int = 16) -> Column:
    """Z-value of ``cols`` given their [min, max] bounds: each column
    min-max scales to [0, 2^bits) by exact integer/decimal arithmetic,
    then bits interleave. NULL in any column → NULL (sorts first)."""
    scaled = []
    top = (1 << bits) - 1
    for c, lo, hi in zip(cols, mins, maxs):
        span = (hi - lo) if hi is not None and lo is not None else None
        if not span:  # constant or all-null column: contributes 0 bits
            scaled.append(F.lit(0).cast("long"))
            continue
        scaled.append(
            F.floor(
                (c.cast("double") - float(lo)) * top / float(span)
            ).cast("long")
        )
    return _interleave(scaled, bits)


def write_clustered(df: DataFrame, path: str, cols: list[str],
                    n_files: int = 16, mode: str = "overwrite") -> None:
    """Composite range clustering: one sampled range shuffle on
    ``cols`` + in-partition sort, one parquet file band per partition.
    Leading-column filters prune hardest."""
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   n_files: int = 16, bits: int = 16,
                   mode: str = "overwrite") -> None:
    """Z-order clustering on numeric ``cols``: every output file holds
    a small hyper-rectangle of the joint value space, so parquet
    min/max pruning is effective for a predicate on ANY clustered
    column. One tiny driver aggregate (2·k scalars) fixes the scale
    bounds; one range shuffle lays the curve out."""
    bounds = df.agg(
        *[F.min(c).alias(f"_lo{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"_hi{i}") for i, c in enumerate(cols)],
    ).first()
    mins = [bounds[f"_lo{i}"] for i in range(len(cols))]
    maxs = [bounds[f"_hi{i}"] for i in range(len(cols))]
    z = zvalue([F.col(c) for c in cols], mins, maxs, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
