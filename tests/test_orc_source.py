"""ORC source/sink (sources/orc.py): lossless roundtrip of every
engine-relevant type + the same scan-quality assertions the parquet
plan audit makes (pushdown + pruning reach the ORC reader)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from batch_processing_analysis_spark.sources.orc import read_orc, write_orc


def test_orc_roundtrip_and_scan_quality(spark, tmp_path):
    rows = [
        (1, "alpha", 1.5, datetime(2024, 1, 1, 9), [1.0, 2.0], b"\x00\x01"),
        (2, "beta", float("nan"), None, [], b""),
        (3, None, -2.25, datetime(2024, 1, 2, 10, 30), [3.5], None),
    ]
    schema = ("id long, name string, x double, ts timestamp, "
              "vec array<double>, blob binary")
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "t.orc")
    write_orc(df, path)

    back = read_orc(spark, path, schema)
    assert back.schema == df.schema
    a = sorted(df.collect(), key=lambda r: r["id"])
    b = sorted(back.collect(), key=lambda r: r["id"])
    for ra, rb in zip(a, b):
        assert repr(ra) == repr(rb)  # NaN-safe exact comparison

    # Scan quality: filter pushdown + column pruning reach the reader.
    q = read_orc(spark, path).filter(F.col("id") > 1).select("name")
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "FileScan orc" in ln]
    assert scan, plan
    assert "PushedFilters: [" in scan[0] and "GreaterThan(id,1)" in scan[0]
    # Pruned to the filter + projection columns only (2 of 6).
    assert "ReadSchema: struct<id:bigint,name:string>" in scan[0]
