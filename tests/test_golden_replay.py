"""Golden-file replay against the reference's shipped outputs
(SURVEY §5.1-5.2: the reference validates by golden artifacts in
/root/reference/outputs; these tests replay them on our engine).

Key parity result (established by row-level diffing, see
operators/discovery.py docstring): on the Loan log — which ships its
own ``enabled_time``, removing the estimator as a variable — our
detection + repair pipeline reproduces the reference's discovered batch
set EXACTLY (same 7,635 rows, same 587-instance partition, same types)
once ``min_batch_instance_size=10``. The reference's R detector applies
an internal filter that rejects the log's organic busy-resource runs;
on this log that filter is extensionally equivalent to a min-instance
-size threshold, which this engine exposes as configuration.

Reference timestamps are second-truncated (the R CSV round-trip drops
fractional seconds), so rows are matched on (case, activity,
floor-to-second start).
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd
import pyspark.sql.functions as F
import pytest

from batch_processing_analysis_spark.config import Configuration
from batch_processing_analysis_spark.operators.discovery import discover_batches
from batch_processing_analysis_spark.operators.enablement import add_enabled_times

LOGS = Path("/root/reference/logs")
OUTS = Path("/root/reference/outputs")

pytestmark = pytest.mark.skipif(
    not LOGS.exists(), reason="reference artifacts not available"
)


def _load(spark, path, ids, with_enabled):
    cols = [ids.start_time, ids.end_time] + ([ids.enabled_time] if with_enabled else [])
    df = spark.read.option("header", True).csv(str(path))
    for c in cols:
        df = df.withColumn(c, F.to_timestamp(c))
    return df


def _row_keys(pdf, case, act, start):
    st = pd.to_datetime(pdf[start], utc=True, format="mixed").dt.floor("s")
    return list(zip(pdf[case].astype(str), pdf[act].str.strip(), st))


def test_loan_golden_exact(spark):
    """Loan log (shipped enabled_time) at min_batch_instance_size=10:
    batched row set, instance partition, and per-instance types all
    equal the reference's golden output bit-for-bit."""
    cfg = Configuration(min_batch_instance_size=10)
    ids = cfg.log_ids
    log = _load(spark, LOGS / "Loan_Application_batched.csv.gz", ids,
                with_enabled=True).drop("batch_instance_id")
    disc = discover_batches(log, cfg)
    ours = disc.filter(F.col(ids.batch_id).isNotNull()).select(
        ids.case, ids.activity, ids.start_time, ids.batch_id, ids.batch_type
    ).toPandas()
    ours["k"] = _row_keys(ours, ids.case, ids.activity, ids.start_time)

    ref = pd.read_csv(OUTS / "Loan_Application_WTs.csv.gz", low_memory=False)
    refb = ref[ref.batch_instance_id.notna()].copy()
    refb["k"] = _row_keys(refb, "case_id", "Activity", "start_time")

    assert set(ours.k) == set(refb.k)                       # same batched rows
    ours_part = {frozenset(g.k) for _, g in ours.groupby(ids.batch_id)}
    ref_part = {frozenset(g.k) for _, g in refb.groupby("batch_instance_id")}
    assert ours_part == ref_part                            # same instances
    ours_t = {frozenset(g.k): g[ids.batch_type].iloc[0]
              for _, g in ours.groupby(ids.batch_id)}
    ref_t = {frozenset(g.k): g["batch_instance_type"].iloc[0]
             for _, g in refb.groupby("batch_instance_id")}
    assert ours_t == ref_t                                  # same types


def test_production_agreement(spark):
    """Production log (enabled_time re-used from the golden output so
    the estimator is out of scope): row-level agreement with the golden
    batched set >= 95% F1 at reference defaults. Residual divergence is
    the reference's R-side second-truncation and chain tie-breaks."""
    cfg = Configuration()
    ids = cfg.log_ids
    log = _load(spark, LOGS / "Production.csv.gz", ids, with_enabled=False)

    ref = pd.read_csv(OUTS / "Production_WTs.csv.gz", low_memory=False)
    en = ref[["case_id", "Activity", "start_time", "end_time", "enabled_time"]]
    en = en.drop_duplicates(["case_id", "Activity", "start_time", "end_time"])
    en_df = spark.createDataFrame(en)
    for c in ["start_time", "end_time", "enabled_time"]:
        en_df = en_df.withColumn(c, F.to_timestamp(c))
    log = log.join(
        en_df.withColumnRenamed("enabled_time", ids.enabled_time),
        [ids.case, ids.activity, ids.start_time, ids.end_time], "left",
    )
    assert log.filter(F.col(ids.enabled_time).isNull()).count() == 0

    disc = discover_batches(log, cfg)
    ours = disc.filter(F.col(ids.batch_id).isNotNull()).select(
        ids.case, ids.activity, ids.start_time
    ).toPandas()
    ok = set(_row_keys(ours, ids.case, ids.activity, ids.start_time))
    refb = ref[ref.batch_instance_id.notna()]
    rk = set(_row_keys(refb, "case_id", "Activity", "start_time"))

    tp = len(ok & rk)
    precision = tp / len(ok)
    recall = tp / len(rk)
    f1 = 2 * precision * recall / (precision + recall)
    assert f1 >= 0.95, (precision, recall, f1)


def test_enablement_estimator_exact(spark):
    """M2 validation (SURVEY §7.1): our native concurrency-oracle
    enablement estimator reproduces the reference's
    ``estimate_start_times`` output microsecond-for-microsecond on all
    70,162 Loan events (the log ships the package's enabled_time)."""
    cfg = Configuration()
    ids = cfg.log_ids
    log = (
        _load(spark, LOGS / "Loan_Application_batched.csv.gz", ids,
              with_enabled=False)
        .withColumn("_ref_en", F.to_timestamp(ids.enabled_time))
        .drop(ids.enabled_time, "batch_instance_id")
    )
    est = add_enabled_times(log, ids, concurrency_threshold=0.1)
    n_diff = est.filter(
        F.unix_micros(F.col(ids.enabled_time)) != F.unix_micros("_ref_en")
    ).count()
    assert n_diff == 0


def test_production_truncation_mode(spark):
    """Truncation-emulation mode (VERDICT r7 task 7, measured
    writeup): ``truncate_timestamps_to_seconds=True`` floors detection
    input to seconds, emulating the reference's R CSV round-trip. On
    Production this is a bit-identical NO-OP — the log's timestamps
    are minute-resolution — so the pre-r8 attribution of the residual
    ~0.966 F1 to truncation was WRONG; the measured cause is the R
    detector's internal short-run filter plus chain tie-breaks (see
    operators/discovery.py docstring for the full breakdown). This
    test pins both halves: the mode changes nothing on Production,
    and the agreement level itself."""
    cfg_plain = Configuration()
    cfg_trunc = Configuration(truncate_timestamps_to_seconds=True)
    ids = cfg_plain.log_ids
    ref = pd.read_csv(OUTS / "Production_WTs.csv.gz", low_memory=False)

    def batched_keys(cfg):
        log = _load(spark, LOGS / "Production.csv.gz", ids,
                    with_enabled=False)
        en = ref[["case_id", "Activity", "start_time", "end_time",
                  "enabled_time"]].drop_duplicates(
            ["case_id", "Activity", "start_time", "end_time"])
        en_df = spark.createDataFrame(en)
        for c in ["start_time", "end_time", "enabled_time"]:
            en_df = en_df.withColumn(c, F.to_timestamp(c))
        log = log.join(
            en_df.withColumnRenamed("enabled_time", ids.enabled_time),
            [ids.case, ids.activity, ids.start_time, ids.end_time],
            "left")
        ours = discover_batches(log, cfg).filter(
            F.col(ids.batch_id).isNotNull()
        ).select(ids.case, ids.activity, ids.start_time,
                 ids.batch_id).toPandas()
        ours["k"] = _row_keys(ours, ids.case, ids.activity,
                              ids.start_time)
        rows = set(ours.k)
        part = {frozenset(g.k) for _, g in ours.groupby(ids.batch_id)}
        return rows, part

    rows_plain, part_plain = batched_keys(cfg_plain)
    rows_trunc, part_trunc = batched_keys(cfg_trunc)
    # (a) truncation is a no-op on this minute-resolution log
    assert rows_plain == rows_trunc
    assert part_plain == part_trunc
    # (b) the measured agreement level (465 of 485 golden instances)
    refb = ref[ref.batch_instance_id.notna()].copy()
    refb["k"] = _row_keys(refb, "case_id", "Activity", "start_time")
    ref_part = {frozenset(g.k)
                for _, g in refb.groupby("batch_instance_id")}
    assert len(part_plain & ref_part) >= 460, len(part_plain & ref_part)


def test_loan_truncation_breaks_parity(spark):
    """Diagnosis pin (VERDICT r7 task 7 writeup): the reference's
    detector ran at FULL precision — its R-exchange CSV is written
    with date_format='%Y-%m-%d %H:%M:%S.%f' (reference
    discovery.py:227-229); only the golden files' formatting is
    second-truncated (R write.csv drops POSIXct fractions). Loan
    timestamps carry sub-second digits, so detecting on FLOORED input
    must LOSE golden rows — if this ever starts matching exactly, the
    precision story has changed and the docstring diagnosis needs
    re-measuring."""
    cfg = Configuration(min_batch_instance_size=10,
                        truncate_timestamps_to_seconds=True)
    ids = cfg.log_ids
    log = _load(spark, LOGS / "Loan_Application_batched.csv.gz", ids,
                with_enabled=True).drop("batch_instance_id")
    disc = discover_batches(log, cfg)
    ours = disc.filter(F.col(ids.batch_id).isNotNull()).select(
        ids.case, ids.activity, ids.start_time, ids.batch_id
    ).toPandas()
    ours["k"] = _row_keys(ours, ids.case, ids.activity, ids.start_time)

    ref = pd.read_csv(OUTS / "Loan_Application_WTs.csv.gz",
                      low_memory=False)
    refb = ref[ref.batch_instance_id.notna()].copy()
    refb["k"] = _row_keys(refb, "case_id", "Activity", "start_time")
    missing = set(refb.k) - set(ours.k)
    assert missing, (
        "second-floored detection unexpectedly reproduced the golden "
        "row set exactly — re-measure the precision diagnosis")
    # and full-precision detection (test_loan_golden_exact) is exact,
    # so the divergence is attributable to the flooring alone


def test_production_residual_is_pinned(spark):
    """FORMAL WONTFIX PIN (VERDICT r8 task 7): the 465/485 Production
    residual is the bamalog package's internal short-run filter plus
    chain tie-breaks (measured r8, operators/discovery.py docstring) —
    the package source is outside the reference checkout, so the
    residual is pinned EXACTLY rather than emulated blind. This test
    asserts the full disagreement structure; if detection behavior
    drifts in ANY direction (even toward better agreement), it fails
    loudly and the docstring numbers must be re-measured."""
    cfg = Configuration()
    ids = cfg.log_ids
    log = _load(spark, LOGS / "Production.csv.gz", ids,
                with_enabled=False)
    ref = pd.read_csv(OUTS / "Production_WTs.csv.gz", low_memory=False)
    en = ref[["case_id", "Activity", "start_time", "end_time",
              "enabled_time"]].drop_duplicates(
        ["case_id", "Activity", "start_time", "end_time"])
    en_df = spark.createDataFrame(en)
    for c in ["start_time", "end_time", "enabled_time"]:
        en_df = en_df.withColumn(c, F.to_timestamp(c))
    log = log.join(
        en_df.withColumnRenamed("enabled_time", ids.enabled_time),
        [ids.case, ids.activity, ids.start_time, ids.end_time], "left")
    ours = discover_batches(log, cfg).filter(
        F.col(ids.batch_id).isNotNull()
    ).select(ids.case, ids.activity, ids.start_time,
             ids.batch_id).toPandas()
    ours["k"] = _row_keys(ours, ids.case, ids.activity, ids.start_time)
    refb = ref[ref.batch_instance_id.notna()].copy()
    refb["k"] = _row_keys(refb, "case_id", "Activity", "start_time")
    our_part = {frozenset(g.k) for _, g in ours.groupby(ids.batch_id)}
    ref_part = {frozenset(g.k)
                for _, g in refb.groupby("batch_instance_id")}

    # headline agreement
    assert len(our_part) == 511 and len(ref_part) == 485
    assert len(our_part & ref_part) == 465

    ours_only = sorted(our_part - ref_part,
                       key=lambda s: sorted(map(str, s)))
    ref_only = sorted(ref_part - our_part,
                      key=lambda s: sorted(map(str, s)))
    assert len(ours_only) == 46 and len(ref_only) == 20
    ref_rows = set().union(*ref_part)

    # class 1: disjoint extras — our instances wholly unbatched by R
    # (the internal short-run filter): exactly 25 of size 2 + 3 of 4
    disjoint = [o for o in ours_only if not (o & ref_rows)]
    assert sorted(len(o) for o in disjoint) == [2] * 25 + [4] * 3

    # class 2: the overlap graph between the remaining extras and the
    # unmatched ref instances — union-find over row intersection
    nodes = ([("o", i) for i in range(len(ours_only))]
             + [("r", j) for j in range(len(ref_only))])
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, o in enumerate(ours_only):
        for j, r in enumerate(ref_only):
            if o & r:
                parent[find(("o", i))] = find(("r", j))
    comps: dict = {}
    for n in nodes:
        comps.setdefault(find(n), []).append(n)
    shapes: dict[str, int] = {}
    for c in comps.values():
        no = sum(1 for t, _ in c if t == "o")
        nr = sum(1 for t, _ in c if t == "r")
        if nr == 0:  # the disjoint extras counted above
            continue
        shapes[f"{no}o-{nr}r"] = shapes.get(f"{no}o-{nr}r", 0) + 1
    assert shapes == {
        "1o-1r": 8,   # one-to-one boundary disagreements
        "2o-1r": 2,   # splits: one ref instance = two of ours
        "6o-5r": 1,   # one chain tangle on overlapping chains
        "0o-1r": 5,   # size-2 ref instances we never form
    }, shapes
