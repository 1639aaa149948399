"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual query surface lives in
``batch_processing_analysis_spark/plans/`` — each module registers its
builders (and DuckDB oracle twins) into the shared registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Importing the plan modules populates the registry.
from batch_processing_analysis_spark.plans import registry as _registry
from batch_processing_analysis_spark.plans import queries_relational  # noqa: F401

try:  # modules added incrementally; keep entry importable mid-build
    from batch_processing_analysis_spark.plans import queries_eventlog  # noqa: F401
except ImportError:
    pass
try:
    from batch_processing_analysis_spark.plans import queries_text  # noqa: F401
except ImportError:
    pass
try:
    from batch_processing_analysis_spark.plans import queries_canary  # noqa: F401
except ImportError:
    pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Batch-instance discovery + per-type waiting-time style rollup — the
    engine's headline capability (SURVEY §3.1) — exercised through the
    sessionization query on the events table.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Resolve across both registries: rotation (registry.PRIMARY_ROTATION)
    # moves names between the driver window and the pytest-gated extras.
    builders = {**_registry.EXTRA_QUERIES, **_registry.QUERIES}
    return builders["q11_sessionize"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin for each SQL-expressible query."""
    return dict(_registry.ORACLES)
