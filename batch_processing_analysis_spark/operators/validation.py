"""Declarative data-quality validation gate (M71): rule predicates →
per-row violation flags, a quarantine split, and a one-row audit
summary — the admission-control step a training-data pipeline runs
before letting a new drop into the corpus (the Deequ/Great-Expectations
shape, re-expressed as plain Catalyst predicates).

Rules are named boolean Columns (true = row passes). Everything is one
narrow projection over the scan — flags are CASE WHEN codegen, the
summary is one partial-agg pass; no UDFs, no second scan of the input
(`validate` returns a flagged frame both consumers derive from).

NULL semantics, pinned by tests: a rule evaluating to NULL counts as a
FAILURE (unknown is not acceptance) — flags are
``coalesce(rule, false)``.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """``df`` + one ``ok_<name>`` 0/1 column per rule (NULL → 0) + an
    ``n_violations`` count per row. Downstream: filter
    ``n_violations == 0`` for the clean set, ``> 0`` for quarantine,
    or aggregate the flags for the audit report."""
    out = df
    flags = []
    for name, cond in rules.items():
        col = f"ok_{name}"
        out = out.withColumn(
            col, F.coalesce(cond.cast("boolean"), F.lit(False)).cast("int")
        )
        flags.append(col)
    n_rules = len(flags)
    total = None
    for c in flags:
        total = F.col(c) if total is None else total + F.col(c)
    viol = (F.lit(n_rules) - total) if total is not None else F.lit(0)
    return out.withColumn("n_violations", viol.cast("int"))


def quarantine_split(flagged: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) from a :func:`validate` output. Both are
    filters over the SAME flagged plan — at scale, persist/checkpoint
    the flagged frame first if both sides are consumed."""
    return (
        flagged.filter(F.col("n_violations") == 0),
        flagged.filter(F.col("n_violations") > 0),
    )


def validation_summary(flagged: DataFrame) -> DataFrame:
    """One row per rule: rows checked, rows passed, rows failed —
    the audit artifact. A single aggregate over the flagged frame,
    unpivoted to (rule, n_rows, n_pass, n_fail) rows."""
    flag_cols = [c for c in flagged.columns if c.startswith("ok_")]
    aggs = [F.count(F.lit(1)).alias("_n")]
    aggs += [F.sum(c).alias(c) for c in flag_cols]
    one = flagged.agg(*aggs)
    stack = F.explode(F.array(*[
        F.struct(
            F.lit(c[3:]).alias("rule"),
            F.col("_n").alias("n_rows"),
            F.col(c).cast("long").alias("n_pass"),
            (F.col("_n") - F.col(c)).cast("long").alias("n_fail"),
        )
        for c in flag_cols
    ])).alias("_s")
    return one.select(stack).select("_s.rule", "_s.n_rows",
                                    "_s.n_pass", "_s.n_fail")


def quality_funnel(df: DataFrame,
                   gates: list[tuple[str, Column]]) -> DataFrame:
    """Sequential quality-gate funnel audit (M106): apply the gates in
    order as cumulative ANDs and report, per stage, how many rows
    enter, survive, and drop — the "how much does each filter cost me"
    table every published pipeline reports (C4's filter ablations,
    Raffel et al. 2020 §2.2; Gopher's Table A1, Rae et al. 2021)
    before committing to a prune at 100 TB.

    Returns ``(stage_idx, stage, n_in, n_out, n_dropped,
    pass_rate_micro)`` — pass rate is relative to the stage's OWN
    input, integer micros, 0-guarded.

    Scale: ONE scan and ONE 1-row aggregate (every cumulative gate is
    a sum of an AND-chain indicator — partial-aggregatable); the
    per-stage rows are exploded from that single row, so the plan has
    no join, no window, no second pass, regardless of gate count.
    """
    if not gates:
        raise ValueError("quality_funnel needs at least one gate")
    sums = []
    cum = None
    for i, (_name, cond) in enumerate(gates):
        cum = cond if cum is None else (cum & cond)
        sums.append(F.sum(cum.cast("long")).alias(f"_s{i}"))
    agg = df.agg(F.count(F.lit(1)).alias("_s_in"), *sums)
    stages = []
    for i, (name, _cond) in enumerate(gates):
        n_in = F.col("_s_in") if i == 0 else F.col(f"_s{i-1}")
        n_out = F.col(f"_s{i}")
        stages.append(F.struct(
            F.lit(i).alias("stage_idx"),
            F.lit(name).alias("stage"),
            n_in.alias("n_in"),
            n_out.alias("n_out"),
            (n_in - n_out).alias("n_dropped"),
            F.when(n_in > 0,
                   F.floor(n_out * F.lit(1_000_000) / n_in))
            .otherwise(F.lit(0)).cast("long").alias("pass_rate_micro"),
        ))
    return agg.select(F.explode(F.array(*stages)).alias("_st")) \
              .select("_st.*")
