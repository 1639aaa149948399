"""Golden-text report parity: feed the reference's OWN batched log
(outputs/Production_WTs.csv.gz — their discovered batches, types, and
waiting-time columns) through this engine's report aggregation
(`batch_report`) and renderer (`render_report`), and diff the rendered
text against outputs/Production_Report.txt byte-for-byte.

Using the reference's WTs as input isolates the REPORT stage: the
~0.97-F1 discovery divergence on Production (R second-truncation, see
test_golden_replay.py) is out of scope here, so the comparison is
exact, not fuzzy.
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd
import pytest

from batch_processing_analysis_spark.config import Configuration
from batch_processing_analysis_spark.operators.reporting import (
    batch_report,
    render_report,
)

OUTS = Path("/root/reference/outputs")

pytestmark = pytest.mark.skipif(
    not OUTS.exists(), reason="reference artifacts not available"
)


@pytest.fixture(scope="module")
def rendered(spark):
    cfg = Configuration()
    ids = cfg.log_ids
    pdf = pd.read_csv(OUTS / "Production_WTs.csv.gz", low_memory=False)
    for c in [ids.enabled_time, ids.start_time, ids.end_time]:
        pdf[c] = pd.to_datetime(pdf[c], utc=True, format="mixed").dt.tz_localize(None)
    dur_cols = [ids.batch_pt, ids.batch_wt, ids.batch_total_wt,
                ids.batch_creation_wt, ids.batch_ready_wt, ids.batch_other_wt]
    for c in dur_cols:
        pdf[c] = (pd.to_timedelta(pdf[c]).dt.total_seconds() * 1_000_000).round().astype("int64")
    pdf[ids.batch_id] = pdf[ids.batch_id].astype("Int64")

    rows = [
        (
            str(r[ids.case]), r[ids.activity], r[ids.enabled_time].to_pydatetime(),
            r[ids.start_time].to_pydatetime(), r[ids.end_time].to_pydatetime(),
            r[ids.resource],
            None if pd.isna(r[ids.batch_id]) else int(r[ids.batch_id]),
            None if pd.isna(r[ids.batch_type]) else r[ids.batch_type],
            *[int(r[c]) for c in dur_cols],
            i,  # file row order — the reference's implicit DataFrame order
        )
        for i, r in enumerate(pdf.to_dict("records"))
    ]
    schema = (
        f"{ids.case} string, {ids.activity} string, {ids.enabled_time} timestamp, "
        f"{ids.start_time} timestamp, {ids.end_time} timestamp, {ids.resource} string, "
        f"{ids.batch_id} long, {ids.batch_type} string, "
        + ", ".join(f"{c} long" for c in dur_cols)
        + ", _order long"
    )
    log = spark.createDataFrame(rows, schema=schema)
    rep = batch_report(log, cfg, order_col="_order")
    return render_report(rep.collect(), cfg)


def test_report_text_matches_golden(rendered):
    golden = (OUTS / "Production_Report.txt").read_text()
    assert rendered == golden
