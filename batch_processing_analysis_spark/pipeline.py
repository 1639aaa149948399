"""End-to-end analysis facade (reference: analysis.py:41-49,
BatchProcessingAnalysis.analyze_batches).

One lazy DataFrame plan: enabled-time estimation -> batch discovery ->
waiting-time decomposition. The reference materializes between stages
(temp CSV + R subprocess); here nothing materializes until the caller's
action, so Catalyst sees the whole pipeline at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .config import Configuration
from .operators.discovery import discover_batches
from .operators.enablement import add_enabled_times
from .operators.reporting import batch_report, render_report
from .operators.waiting_time import add_waiting_times


def analyze_batches(log: DataFrame, config: Configuration | None = None,
                    detect_case_level: bool = True) -> DataFrame:
    """Event log -> log + batch columns + WT decomposition (the *_WTs
    table of the reference, outputs/*_WTs.csv.gz)."""
    config = config or Configuration()
    ids = config.log_ids
    if ids.enabled_time not in log.columns:
        log = add_enabled_times(log, ids)
    batched = discover_batches(log, config, detect_case_level=detect_case_level)
    return add_waiting_times(batched, config)


def waiting_time_report(log: DataFrame, config: Configuration | None = None) -> str:
    """Event log -> rendered text report (reference: main.py:23-25)."""
    config = config or Configuration()
    analyzed = analyze_batches(log, config)
    return render_report(batch_report(analyzed, config).collect(), config)
