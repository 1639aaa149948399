"""As-of (backward temporal) join — the "latest right row at or before
each left row" operator of time-series engines (kdb+ ``aj``, pandas
``merge_asof``, DuckDB ``ASOF JOIN``). Spark has no native form; this
is the scalable single-shuffle rewrite.

Plan shape (the published union-merge formulation, e.g. the
pandas-on-Spark ``merge_asof`` lowering): tag both sides, union by
name, ONE window sorted by (event time, side) per key with
``last(payload, ignorenulls=True)`` over an unbounded-preceding frame,
then keep the left rows. Cost = one shuffle on the join key + a
per-key sort — same as any keyed window; no range explosion, no
nested-loop join. Right rows at the same timestamp as a left row sort
first (side 0 < 1), so the match is inclusive (``right_ts <=
left_ts``), matching DuckDB's ``ON l.ts >= r.ts``.

Skew: a single hot key serializes into one task's sort — the standard
remedy (bucket the time axis and run per-(key, bucket) windows with a
boundary fix-up) composes with range_join.py's bucketing if a corpus
ever needs it; per-user event streams virtually never do.

Determinism: when several right rows share (key, ts), the maximum
payload struct wins (lexicographic struct order, matched timestamp
first) — callers wanting a specific survivor should pre-aggregate the
right side (e.g. ``max_by``) as q66 does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(left: DataFrame, right: DataFrame, on: str | list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              value_cols: list[str] | None = None,
              tolerance_seconds: int | None = None,
              matched_ts_col: str = "matched_ts") -> DataFrame:
    """Left as-of-backward join: every ``left`` row, plus the newest
    ``right`` row with ``right[right_ts] <= left[left_ts]`` on the same
    key(s) (null columns when no such row, or when it is older than
    ``tolerance_seconds``).

    Output: all ``left`` columns + ``matched_ts_col`` + ``value_cols``
    (right's non-key, non-ts columns by default).
    """
    on = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in on + [right_ts]]
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right value columns clash with left: {sorted(clash)}")

    payload = F.struct(
        F.col(right_ts).alias("_mts"), *[F.col(c) for c in value_cols]
    )
    r = right.select(
        *on, F.col(right_ts).alias("_t"), F.lit(0).alias("_side"),
        payload.alias("_pay"),
    )
    l = left.select(
        "*", F.col(left_ts).alias("_t"), F.lit(1).alias("_side"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        W.partitionBy(*on)
        .orderBy("_t", "_side", "_pay")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    u = u.withColumn("_m", F.last("_pay", ignorenulls=True).over(w))

    matched = F.col("_m")
    if tolerance_seconds is not None:
        fresh = F.col("_m._mts").cast("long") >= (
            F.col(left_ts).cast("long") - F.lit(tolerance_seconds)
        )
        matched = F.when(fresh, F.col("_m"))

    out = u.filter(F.col("_side") == 1).withColumn("_m", matched)
    return out.select(
        *left.columns,
        F.col("_m._mts").alias(matched_ts_col),
        *[F.col(f"_m.{c}").alias(c) for c in value_cols],
    )
