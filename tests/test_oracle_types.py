"""Driver-canonicalization type guard over every registered oracle.

CORRECTNESS_r04 taught us the driver's comparison pulls both sides
through pandas: DuckDB HUGEINT (the result type of any un-cast
``sum()``) becomes float64 and hashes as ``"370.0"`` against Spark's
int64 ``"370"`` — that single mechanism produced all five r4 hash-red
rows (q64/q70/q76/q86/q106, each with exactly one raw-sum column) —
and list cells crash its canonicalizer outright (r4 q100,
``TypeError: unhashable type: 'list'``).

This test makes the fix structural: DESCRIBE every oracle (primary AND
extra) against the sf0.001 tables and reject any output column whose
DuckDB type is HUGEINT, DECIMAL, or a nested list/map/struct. Allowed
surface: integers ≤ BIGINT, DOUBLE/FLOAT, VARCHAR, DATE/TIMESTAMP,
BOOLEAN.
"""

from __future__ import annotations

import importlib
from pathlib import Path

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

FRAGILE = ("HUGEINT", "DECIMAL")
NESTED = ("[]", "MAP(", "STRUCT(")

# q116 carries a raw HUGEINT sum ON PURPOSE: it is the canary probing
# whether the driver's canonicalizer converts HUGEINT via pandas (the
# r4 divergence mechanism). See plans/queries_canary.py.
ALLOWLIST = {"q116_canary_hugeint_probe"}


def _all_oracles() -> dict[str, str]:
    from batch_processing_analysis_spark.plans import registry

    for m in ("queries_relational", "queries_eventlog", "queries_text",
              "queries_canary"):
        importlib.import_module(f"batch_processing_analysis_spark.plans.{m}")
    return {**registry.ORACLES, **registry.EXTRA_ORACLES}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return c


def test_no_driver_fragile_oracle_output_types(con):
    bad = []
    for name, sql in sorted(_all_oracles().items()):
        if name in ALLOWLIST:
            continue
        for col, typ, *_ in con.execute("DESCRIBE " + sql).fetchall():
            t = typ.upper()
            if any(f in t for f in FRAGILE) or any(n in typ for n in NESTED):
                bad.append((name, col, typ))
    assert not bad, (
        "driver-fragile oracle output types (CAST sums to BIGINT; emit "
        f"scalar rows, never arrays): {bad}"
    )


def test_every_registered_query_has_an_oracle_or_is_documented():
    """Every primary-window query MUST have an oracle (the driver records
    a weaker rows-only check otherwise)."""
    from batch_processing_analysis_spark.plans import registry

    _all_oracles()
    missing = [n for n in registry.QUERIES if n not in registry.ORACLES]
    assert not missing, f"primary queries without oracle SQL: {missing}"
