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


def query(name: str, oracle: str | None = None):
    """Register a query builder and (optionally) its DuckDB oracle."""

    def deco(fn: SparkBuilder) -> SparkBuilder:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
