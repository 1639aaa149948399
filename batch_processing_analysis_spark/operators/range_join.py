"""Point-in-interval range join (J2) — broadcast and bucketed strategies.

The reference computes its workload feature by re-scanning the whole
event log once per instant (reference: utils.py:179-196, one pandas
filter per call from activation_rules.py:132). The Spark-native shape is
a single join of all instants against all intervals. Two physical
strategies, both returning identical matched pairs:

- **broadcast**: hash-join on the equality keys with the range predicate
  as a residual filter, the (small) point side broadcast. Right while
  the point set fits the broadcast budget — one pass over the intervals,
  zero shuffle of the big side.

- **bucketed**: quantize time into fixed-width buckets; points map to
  exactly one bucket, intervals ``explode`` into every bucket they
  cover, and the join becomes a plain shuffled equi-join on
  (keys…, bucket) plus the exact range residual. Each matched pair is
  produced exactly once (the point lives in a single bucket), so no
  dedup is needed. This is the scale path when BOTH sides are large:
  shuffle is proportional to data × fan-out, never |points|×|intervals|.

  Intervals much longer than the bucket width would fan out unboundedly;
  those (rare, by construction of a sensible ``bucket``) are split off
  by a span guard and joined via the keys-equality + residual path
  instead, then unioned back. This bounds worst-case explode fan-out at
  ``max_span`` rows per interval regardless of data skew.
"""

from __future__ import annotations

import functools
import operator
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPAN = "__rj_span"
_BUCKET = "__rj_bucket"


def _eq_cond(keys: Sequence[str]) -> list[Column]:
    return [F.col(k) == F.col(f"__rj_{k}") for k in keys]


def _rename_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    for k in keys:
        df = df.withColumnRenamed(k, f"__rj_{k}")
    return df


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point: str,
    start: str,
    end: str,
    keys: Sequence[str] = (),
    bucket: int | None = None,
    max_span: int = 256,
    broadcast_points: bool = True,
) -> DataFrame:
    """All (point, interval) pairs with ``start <= point <= end`` and
    equal ``keys``. ``point``/``start``/``end`` are integer (e.g. epoch
    seconds/micros) columns; other column names must be disjoint across
    the two inputs. Output columns: points' columns + intervals'
    non-key columns; each match appears exactly once.

    ``bucket=None`` selects the broadcast strategy; an integer selects
    the bucketed strategy with that bucket width (same unit as the time
    columns). ``max_span`` caps per-interval explode fan-out: intervals
    covering more buckets take the residual-join path.
    """
    iv = _rename_keys(intervals, keys)
    range_cond = (F.col(start) <= F.col(point)) & (F.col(point) <= F.col(end))

    def residual_join(pts: DataFrame, ivs: DataFrame) -> DataFrame:
        cond = functools.reduce(operator.and_, _eq_cond(keys) + [range_cond])
        left = F.broadcast(pts) if broadcast_points else pts
        return ivs.join(left, cond)

    if bucket is None:
        joined = residual_join(points, iv)
        return joined.drop(*[f"__rj_{k}" for k in keys])

    b = F.lit(int(bucket))
    iv = iv.withColumn(_SPAN, (F.floor(F.col(end) / b) - F.floor(F.col(start) / b)))
    short, long = iv.filter(F.col(_SPAN) < max_span), iv.filter(F.col(_SPAN) >= max_span)

    pts_b = points.withColumn(_BUCKET, F.floor(F.col(point) / b))
    short_b = short.withColumn(
        _BUCKET,
        F.explode(F.sequence(F.floor(F.col(start) / b), F.floor(F.col(end) / b))),
    )
    cond = functools.reduce(
        operator.and_,
        _eq_cond(keys) + [pts_b[_BUCKET] == short_b[_BUCKET], range_cond],
    )
    bucketed = short_b.join(pts_b, cond).drop(_BUCKET)
    # Long intervals are few by construction (span guard): keys-equality
    # join with the residual filter; never a cartesian product.
    rest = residual_join(pts_b.drop(_BUCKET), long)
    return bucketed.unionByName(rest).drop(_SPAN, *[f"__rj_{k}" for k in keys])


def workload_at_instants(
    log: DataFrame,
    points: DataFrame,
    *,
    resource: str,
    instant: str,
    enabled: str,
    end: str,
    case: str,
    bucket: int | None = None,
) -> DataFrame:
    """#distinct cases a resource is busy with at each instant
    (reference: utils.py:179-196): count cases whose
    ``enabled <= instant <= end`` on the same resource. Returns
    (resource, instant, workload) for instants with ≥1 busy case —
    callers left-join and coalesce to 0, preserving the reference's
    "no busy case → workload 0" semantics."""
    pairs = point_in_interval_join(
        points,
        log.select(
            F.col(resource).alias(resource),
            F.col(enabled).alias("__rj_en"),
            F.col(end).alias("__rj_end"),
            F.col(case).alias("__rj_case"),
        ),
        point=instant,
        start="__rj_en",
        end="__rj_end",
        keys=[resource],
        bucket=bucket,
    )
    return pairs.groupBy(resource, instant).agg(
        F.countDistinct("__rj_case").alias("workload")
    )
