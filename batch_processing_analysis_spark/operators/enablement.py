"""Enabled-time estimation — native Heuristics concurrency oracle (U2).

The reference delegates to the ``estimate_start_times`` pip package
(public: AutomatedProcessImprovement/start-time-estimator), constructed
with ``consider_start_times=True`` (reference: analysis.py:28-39) and
called as ``add_enabled_times`` (analysis.py:43). Reimplemented here
from the published Heuristics-Miner semantics:

1. Directly-follows counts df(a,b): per case ordered by START time
   (start, end, activity), count consecutive activity pairs.
2. Concurrency: activities a,b are concurrent iff df(a,b)>0 and
   df(b,a)>0 and |df(a,b)−df(b,a)| / (df(a,b)+df(b,a)+1) < threshold
   (the Heuristics-Miner dependency measure; default 0.1).
3. enabled(e) = max{ end(e') : e' in same case, e' ≠ e, end(e') ≤
   start(e), activity(e') not concurrent with activity(e) };
   fallback = the case's first start (so a case's first event gets
   enabled = start). The ``end(e') ≤ start(e)`` guard is the
   consider_start_times=True behavior: an event cannot be enabled by
   work that finished after it started.

Semantics REVERSE-VALIDATED against the precomputed ``enabled_time``
column shipped in the reference's Loan_Application log (SURVEY §2.7 U2):
this exact combination (start-ordered df, threshold in the [0.05, 0.12]
plateau, self-exclusion, first-start fallback) reproduces 70,162/70,162
values; end-ordered df or thresholds outside the plateau do not.

Scale: the df matrix is |activities|² — collected and broadcast as a
literal set; the per-event max is a windowed collect over the case's own
events filtered with a higher-order function (JVM-side, no self-join, no
Python). Traces are short (tens of events), so the per-row array stays
small; for pathological trace lengths switch to the sort-merge self-join
variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..config import EventLogIDs


def directly_follows_matrix(log: DataFrame, ids: EventLogIDs) -> DataFrame:
    """df(a,b) counts: consecutive pairs per case ordered by start time."""
    w = W.partitionBy(ids.case).orderBy(ids.start_time, ids.end_time, ids.activity)
    return (
        log.select(
            F.col(ids.activity).alias("a"),
            F.lead(ids.activity).over(w).alias("b"),
        )
        .filter(F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def concurrency_pairs(df_matrix: DataFrame, threshold: float = 1.0) -> set[tuple[str, str]]:
    """Concurrent activity pairs from the directly-follows matrix
    (driver-side: |activities|² rows, tiny)."""
    both = (
        df_matrix.alias("x")
        .join(
            df_matrix.alias("y"),
            (F.col("x.a") == F.col("y.b")) & (F.col("x.b") == F.col("y.a")),
        )
        .select(
            F.col("x.a").alias("a"),
            F.col("x.b").alias("b"),
            F.col("x.n").alias("nab"),
            F.col("y.n").alias("nba"),
        )
        .filter(
            F.abs(F.col("nab") - F.col("nba")) / (F.col("nab") + F.col("nba") + 1)
            < F.lit(threshold)
        )
    )
    pairs = set()
    for r in both.collect():
        pairs.add((r["a"], r["b"]))
        pairs.add((r["b"], r["a"]))
    return pairs


def add_enabled_times(
    log: DataFrame, ids: EventLogIDs, concurrency_threshold: float = 0.1
) -> DataFrame:
    """Add ``ids.enabled_time`` to every event (reference: analysis.py:43)."""
    pairs = concurrency_pairs(directly_follows_matrix(log, ids), concurrency_threshold)
    # Broadcast the concurrency relation as a literal set of "a\x1fb" keys.
    pair_keys = F.array(*[F.lit(a + "\x1f" + b) for a, b in sorted(pairs)]) if pairs else F.array().cast("array<string>")

    w_case = W.partitionBy(ids.case)
    # All (start, end, activity) triples of the case, then per row: max
    # end among other events with end ≤ this row's start and a
    # non-concurrent activity.
    df = log.withColumn(
        "_case_events",
        F.collect_list(
            F.struct(
                F.unix_micros(F.col(ids.start_time)).alias("s"),
                F.unix_micros(F.col(ids.end_time)).alias("e"),
                F.col(ids.activity).alias("act"),
            )
        ).over(w_case),
    ).withColumn("_case_first_start", F.min(F.unix_micros(F.col(ids.start_time))).over(w_case))

    this_start = F.unix_micros(F.col(ids.start_time))
    this_end = F.unix_micros(F.col(ids.end_time))
    this_act = F.col(ids.activity)
    is_self = lambda ev: (ev["s"] == this_start) & (ev["e"] == this_end) & (ev["act"] == this_act)  # noqa: E731
    enabler_end = F.array_max(
        F.transform(
            F.filter(
                F.col("_case_events"),
                lambda ev: (ev["e"] <= this_start)
                & ~is_self(ev)
                & ~F.array_contains(pair_keys, F.concat(ev["act"], F.lit("\x1f"), this_act)),
            ),
            lambda ev: ev["e"],
        )
    )
    return df.withColumn(
        ids.enabled_time,
        F.timestamp_micros(F.coalesce(enabler_end, F.col("_case_first_start"))),
    ).drop("_case_events", "_case_first_start")
