"""Query registry: name → (spark builder, optional DuckDB oracle SQL).

Every operator the engine claims (SURVEY §2) registers a demonstration
query here; ``__spark_entry__`` re-exports the registry to the driver.

Determinism rules (the driver hash-compares values):
- computed doubles are ``round()``-ed explicitly (2dp money, 6dp ratios)
  in BOTH dialects; raw parquet doubles pass through untouched;
- timestamps are emitted as epoch seconds (bigint) — Spark
  ``unix_timestamp`` ≡ DuckDB ``CAST(floor(epoch(ts)) AS BIGINT)``;
- every top-k / limit has a unique-key tiebreak in the ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkBuilder = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkBuilder] = {}
ORACLES: dict[str, str] = {}

# Secondary registry: single-primitive demo queries whose operator is
# ALSO exercised by a primary composite query. The driver's correctness
# gate checks at most 50 queries (in registration order) — r2 dropped
# the 8 tail-registered text-family flagships — so the exported
# ``queries()`` surface is capped at 50 primaries covering every
# SURVEY §2 family, and these extras are verified by pytest
# (tests/test_extra_queries.py) and tools/verify_queries.py --extra
# against the same DuckDB oracles instead.
EXTRA_QUERIES: dict[str, SparkBuilder] = {}
EXTRA_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None, primary: bool = True):
    """Register a query builder and (optionally) its DuckDB oracle.

    ``primary=False`` routes to the pytest-verified secondary registry
    (kept out of the driver's 50-row correctness window).
    """

    def deco(fn: SparkBuilder) -> SparkBuilder:
        q, o = (QUERIES, ORACLES) if primary else (EXTRA_QUERIES, EXTRA_ORACLES)
        q[name] = fn
        if oracle is not None:
            o[name] = oracle
        return fn

    return deco
