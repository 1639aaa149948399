"""ks_drift_by_group governance (VERDICT r6 task 4 + ADVICE r6 NULL
finding): NULL exclusion from both counts and grid, quantize
exactness, and the max_distinct loud-failure budget."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_processing_analysis_spark.operators.events_analytics import (
    GridVolumeExceeded,
    ks_drift_by_group,
)


def _py_ks(rows, group):
    """Reference KS of `group` vs rest over non-null (g, v) samples."""
    vals = sorted({v for _, v in rows})
    ng = sum(1 for g, _ in rows if g == group)
    nr = len(rows) - ng
    best = 0
    cg = cr = 0
    for v in vals:
        cg += sum(1 for g, x in rows if g == group and x == v)
        cr += sum(1 for g, x in rows if g != group and x == v)
        best = max(best, abs(cg * nr - cr * ng))
    return ng, nr, best


def test_nulls_excluded_from_counts_and_grid(spark):
    rows = [("a", 1), ("a", 2), ("a", None), ("a", None),
            ("b", 1), ("b", 3), ("b", 4), ("c", None)]
    df = spark.createDataFrame(rows, "source string, v int")
    got = {r["source"]: r for r in
           ks_drift_by_group(df, "source", "v").collect()}
    # group c is entirely NULL: no non-null sample, no output row
    assert set(got) == {"a", "b"}
    nn = [(g, v) for g, v in rows if v is not None]
    for g in ("a", "b"):
        ng, nr, num = _py_ks(nn, g)
        assert got[g].n_group == ng, g
        assert got[g].n_rest == nr, g
        assert got[g].ks_num == num, g
        assert got[g].ks_denom == ng * nr, g


def test_identical_distributions_score_zero_with_nulls_present(spark):
    # same values in both groups + NULL noise: KS must be exactly 0
    # (pre-fix, the NULLs inflated n_group and produced a false drift)
    rows = ([("a", v) for v in (1, 2, 3)] + [("a", None)] * 5
            + [("b", v) for v in (1, 2, 3)])
    df = spark.createDataFrame(rows, "source string, v int")
    got = {r["source"]: r.ks_num for r in
           ks_drift_by_group(df, "source", "v").collect()}
    assert got == {"a": 0, "b": 0}


def test_quantize_width_one_is_identity_on_ints(spark):
    rows = [("a", i % 7) for i in range(40)] + \
           [("b", (i * 3) % 11) for i in range(35)]
    df = spark.createDataFrame(rows, "source string, v int")
    base = sorted(map(tuple, ks_drift_by_group(df, "source", "v").collect()))
    quant = sorted(map(tuple, ks_drift_by_group(
        df, "source", "v", quantize=1).collect()))
    assert base == quant


def test_quantize_bounds_grid_and_matches_prequantized_input(spark):
    rows = [("a", i * 13 % 997) for i in range(300)] + \
           [("b", i * 7 % 991) for i in range(280)]
    df = spark.createDataFrame(rows, "source string, v int")
    quant = sorted(map(tuple, ks_drift_by_group(
        df, "source", "v", quantize=100).collect()))
    pre = df.withColumn("v", (F.floor(F.col("v") / 100) * 100).cast("long"))
    manual = sorted(map(tuple, ks_drift_by_group(pre, "source", "v")
                        .collect()))
    assert quant == manual
    # and the quantized grid passes a budget the raw one trips
    assert ks_drift_by_group(df, "source", "v", quantize=100,
                             max_distinct=15).count() == 2


def test_max_distinct_trips_loudly(spark):
    rows = [("a", i) for i in range(100)] + [("b", i + 50)
                                             for i in range(100)]
    df = spark.createDataFrame(rows, "source string, v int")
    with pytest.raises(GridVolumeExceeded, match="quantize"):
        ks_drift_by_group(df, "source", "v", max_distinct=10).collect()


def test_max_distinct_passthrough_matches_unguarded(spark):
    rows = [("a", i % 9) for i in range(60)] + \
           [("b", i % 6) for i in range(50)]
    df = spark.createDataFrame(rows, "source string, v int")
    unguarded = sorted(map(tuple,
                           ks_drift_by_group(df, "source", "v").collect()))
    guarded = sorted(map(tuple, ks_drift_by_group(
        df, "source", "v", max_distinct=1000).collect()))
    assert unguarded == guarded


def test_quantize_rejects_nonpositive(spark):
    df = spark.createDataFrame([("a", 1)], "source string, v int")
    with pytest.raises(ValueError):
        ks_drift_by_group(df, "source", "v", quantize=0)
