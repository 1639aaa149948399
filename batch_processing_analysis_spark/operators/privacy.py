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


# Free-text redaction (M66). The portable class/quantifier regex subset
# of text_analysis.pattern_counts (Java regex and RE2 agree on it), so
# the DuckDB oracle twin produces byte-identical redacted text. Applied
# in a FIXED order — emails before URLs before digit runs — because the
# patterns overlap (an email contains dots and digits; a URL may embed
# an email): both engines must rewrite in the same sequence or the
# outputs diverge on adversarial inputs.
REDACTION_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("digits", r"[0-9]{6,}", "<NUMBER>"),
)


def redact_text(col: Column,
                rules: Sequence[tuple[str, str, str]] = REDACTION_RULES) -> Column:
    """Free-text PII redaction: every match of each rule's pattern is
    replaced by its placeholder token, in rule order. Pure
    ``regexp_replace`` codegen — zero shuffles, no UDF; the transform
    stage of a content-safety pass (pattern_counts is the audit stage).

    Redaction is lossy by design (unlike :func:`pseudonym` the original
    cannot be recovered), and regex redaction is best-effort: it
    removes the *patterned* PII classes, not free-form names/addresses
    — document that contract to downstream consumers.
    """
    out = col
    for _name, pat, token in rules:
        out = F.regexp_replace(out, pat, token)
    return out


def redact_documents(docs: DataFrame, text_col: str = "text",
                     rules: Sequence[tuple[str, str, str]] = REDACTION_RULES,
                     ) -> DataFrame:
    """``text_col`` redacted in place + a ``was_redacted`` 0/1 flag
    (cheap release-audit aggregate: ``sum(was_redacted)`` = docs
    touched). One narrow projection over the scan."""
    redacted = redact_text(F.col(text_col), rules)
    return docs.withColumn("was_redacted",
                           (F.col(text_col) != redacted).cast("int")) \
               .withColumn(text_col, redacted)


SUPPRESSED = "__suppressed__"


def k_anonymize(df: DataFrame, group_cols: Sequence[str],
                k: int = 5) -> DataFrame:
    """k-anonymity gate for published rollups (M87): group counts where
    every emitted combination of ``group_cols`` covers at least ``k``
    rows; rarer combinations — the re-identifiable ones — are folded
    into a single ``__suppressed__`` row carrying their total, so the
    publication stays additive (column sums equal the input row count).

    Privacy contract (ADVICE r4): when EXACTLY ONE group falls below
    ``k``, the suppressed row publishes that single group's exact
    count, and if the ``group_cols`` domain is enumerable its identity
    is recoverable by complement — the classic complementary-
    suppression gap. This gate intentionally keeps the additive-total
    semantics (the SQL-oracle-checkable contract); callers whose
    domain is enumerable and adversarial should apply secondary
    suppression on top (fold the smallest ≥k group too) or publish no
    suppressed total. The caveat is structural to cell suppression,
    not a bug in the fold.

    Group columns are emitted as strings (the suppressed sentinel must
    be representable in every column); a genuine group VALUE equal to
    ``'__suppressed__'`` would silently merge with the sentinel row,
    so it fails the job at execution time instead. Two partial-agg
    passes over a groups-sized frame; the suppressed row appears only
    when at least one group was below ``k``.
    """
    if k < 1:
        raise ValueError(f"k ({k}) must be >= 1")
    gcols = [
        F.when(
            F.col(c).cast("string") == SUPPRESSED,
            F.raise_error(F.lit(
                f"k_anonymize: group value in {c!r} collides with the "
                f"{SUPPRESSED!r} sentinel"
            )),
        ).otherwise(F.col(c).cast("string")).alias(c)
        for c in group_cols
    ]
    counts = df.select(*gcols).groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    ok = counts.filter(F.col("n_rows") >= k)
    suppressed = (
        counts.filter(F.col("n_rows") < k)
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.count(F.lit(1)).alias("_g"),
        )
        .filter(F.col("_g") > 0)
        .select(
            *[F.lit(SUPPRESSED).alias(c) for c in group_cols],
            "n_rows",
        )
    )
    return ok.unionByName(suppressed)
