"""Clustered parquet layouts (sources/clustered.py): rows must
roundtrip untouched while the FILE GEOMETRY becomes prunable — asserted
on the actual parquet footers via pyarrow, not on plan text.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq

from batch_processing_analysis_spark.sources.clustered import (
    write_clustered,
    write_zordered,
)

N = 20_000
SPAN = 1000  # x and y both uniform-ish on [0, SPAN)

# Deterministic, DECORRELATED pair: x is a function of i mod SPAN, y
# mixes in the high bits (i // SPAN) — a y built from i mod SPAN alone
# would be a bijection of x and every x-band would carry one y value.
ROWS = [(i, (i * 7919) % SPAN, ((i // SPAN) * 733 + i * 31) % SPAN)
        for i in range(N)]


def _df(spark):
    return spark.createDataFrame(ROWS, "id long, x long, y long")


def _file_ranges(path: str, col: str) -> list[tuple[int, int]]:
    """(min, max) of ``col`` per parquet data file, from the footer."""
    out = []
    for f in sorted(Path(path).glob("*.parquet")):
        md = pq.read_metadata(f)
        idx = md.schema.names.index(col)
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            los.append(st.min)
            his.append(st.max)
        if los:
            out.append((min(los), max(his)))
    return out


def _roundtrip_ok(spark, path: str) -> bool:
    back = spark.read.parquet(path).collect()
    return sorted(map(tuple, back)) == sorted(ROWS)


def test_range_clustering_prunes_leading_column(spark, tmp_path):
    path = str(tmp_path / "lin")
    write_clustered(_df(spark), path, ["x", "y"], n_files=16)
    assert _roundtrip_ok(spark, path)
    xr = _file_ranges(path, "x")
    assert len(xr) >= 8
    # Leading column: tight per-file bands — a point predicate on x
    # touches at most 2 files (adjacent-band boundary overlap only).
    probe = SPAN // 2
    assert sum(1 for lo, hi in xr if lo <= probe <= hi) <= 2
    # Trailing column decorrelated from x: NOT clustered — every file
    # spans (nearly) the whole y range.
    yr = _file_ranges(path, "y")
    assert all(hi - lo > SPAN * 0.8 for lo, hi in yr)


def test_zorder_prunes_both_columns(spark, tmp_path):
    path = str(tmp_path / "zo")
    write_zordered(_df(spark), path, ["x", "y"], n_files=16)
    assert _roundtrip_ok(spark, path)
    xr, yr = _file_ranges(path, "x"), _file_ranges(path, "y")
    # Every file holds a small hyper-rectangle: its x-span × y-span
    # area is far below the global area (16 ideal squares would be
    # area/16). Bounds are loose on the MAX — repartitionByRange picks
    # boundaries by RANDOM reservoir sampling, so a z-range can straddle
    # a major quadrant seam run-to-run — and tighter on the MEAN, which
    # is what pruning selectivity actually follows.
    areas = [(xh - xl) * (yh - yl) for (xl, xh), (yl, yh) in zip(xr, yr)]
    assert max(areas) < (SPAN * SPAN) / 2
    assert sum(areas) / len(areas) < (SPAN * SPAN) / 6
    # A point predicate on EITHER column skips files. Theory: a line
    # probe crosses O(√n_files) Morton cells, not n_files — but probes
    # ON a major quadrant seam (SPAN/2) touch every straddling file, so
    # probe the quadrant centers and allow sampling slack: the claim is
    # "materially fewer than all files", per column, at both probes.
    for probe in (SPAN // 4, 3 * SPAN // 4):
        for ranges in (xr, yr):
            touched = sum(1 for lo, hi in ranges if lo <= probe <= hi)
            assert touched <= int(len(ranges) * 0.7), (probe, ranges)


def test_zorder_constant_column(spark, tmp_path):
    # A constant column contributes zero bits; clustering falls back to
    # the other column alone instead of failing or corrupting rows.
    from pyspark.sql import functions as F

    path = str(tmp_path / "zc")
    df = _df(spark).withColumn("y", F.lit(7).cast("long"))
    write_zordered(df, path, ["x", "y"], n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == N
    xr = _file_ranges(path, "x")
    probe = SPAN // 2
    assert sum(1 for lo, hi in xr if lo <= probe <= hi) <= 2
