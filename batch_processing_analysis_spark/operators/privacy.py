"""Privacy transforms (M61): deterministic keyed pseudonymization —
the step after PII *detection* (operators/text_analysis.pattern_counts
finds it; this removes it from identifier columns while keeping the
data joinable).

``token = md5(salt ‖ unit-sep ‖ value)[:16]`` (64 bits): the same
``(salt, value)`` maps to the same token in every table and every run,
so referential integrity — joins, group-bys, distinct counts —
survives tokenization exactly. Honesty notes, in the docstring because
they are the contract:

- this is **pseudonymization, not anonymization**: whoever holds the
  salt can recompute the mapping, and small/enumerable domains
  (user ids, phone numbers) can be brute-forced by salt holders —
  treat salts as secrets, rotate per release, and drop them to sever
  the mapping;
- linkage structure is preserved BY DESIGN (that is the point), which
  itself can be identifying; suppress rare groups downstream where
  that matters (k-anonymity is a separate, stronger pass).

Pure codegen (md5/concat); no UDF, no shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pseudonym(col: Column, salt: str) -> Column:
    """64-bit keyed token of ``col`` (NULL stays NULL)."""
    return F.when(
        col.isNotNull(),
        F.substring(
            F.md5(F.concat(F.lit(salt), F.lit("\x1f"), col.cast("string"))),
            1, 16,
        ),
    )


def pseudonymize(df: DataFrame, cols: Sequence[str], salt: str) -> DataFrame:
    """Replace each of ``cols`` with its keyed token (same names, string
    type) — all other columns pass through untouched."""
    out = df
    for c in cols:
        out = out.withColumn(c, pseudonym(F.col(c), salt))
    return out
