"""Product-events analytics operators (M48/M49): ordered funnels and
retention cohorts — the two queries every event-stream warehouse runs
daily, expressed shuffle-minimally.

- **Funnel**: "first A, then first B after it, then first C after
  that" per user. One hash partition by user carries ALL step
  computations: each step is a conditional ``min`` window over the same
  partitioning, so Catalyst plans ONE Exchange + a Window stack + a
  partitioning-aligned final aggregate — never k joins back onto the
  (huge) events table.
- **Retention**: cohort = ISO week of a user's first event; cell
  (cohort_week, week_offset) counts distinct users active that many
  weeks later. Two aggregations; the first-seen table is user-sized and
  joins back on the user key.

Both are deterministic (min/count aggregates only) and have exact SQL
twins; timestamps surface as epoch seconds / dates per the determinism
rules of plans/registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def funnel_steps(events: DataFrame, steps: list[str],
                 user_col: str = "user_id", type_col: str = "event_type",
                 ts_col: str = "ts") -> DataFrame:
    """Ordered-funnel completion per user: ``t1 = min ts of steps[0]``,
    ``tk = min ts of steps[k-1] strictly after t(k-1)``.

    Returns one row per user who entered the funnel (completed step 1):
    ``(user_col, ts_1 … ts_k as epoch seconds — NULL once the funnel
    breaks — and depth = number of completed steps)``.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    w = W.partitionBy(user_col)
    df = events.select(user_col, type_col, ts_col)
    prev = None
    tcols = []
    for i, s in enumerate(steps, start=1):
        cond = F.col(type_col) == s
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        name = f"_t{i}"
        df = df.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = name
        tcols.append(name)
    agg = df.groupBy(user_col).agg(
        *[F.min(c).alias(c) for c in tcols]
    )
    depth = sum(
        (F.col(c).isNotNull()).cast("int") for c in tcols
    )
    return agg.select(
        F.col(user_col),
        *[
            F.unix_timestamp(F.col(c)).alias(f"ts_{i}")
            for i, c in enumerate(tcols, start=1)
        ],
        depth.alias("depth"),
    ).filter(F.col("ts_1").isNotNull())


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Weekly retention triangle: ``(cohort_week, week_offset,
    n_users)`` — distinct users whose first-ever event falls in
    ``cohort_week`` (ISO Monday) and who are active ``week_offset``
    full weeks after their OWN first event day.
    """
    first = events.groupBy(user_col).agg(F.min(ts_col).alias("_first"))
    joined = events.select(user_col, ts_col).join(first, user_col)
    return (
        joined.select(
            user_col,
            F.to_date(F.date_trunc("week", F.col("_first"))).alias("cohort_week"),
            F.floor(
                F.datediff(F.to_date(ts_col), F.to_date("_first")) / 7
            ).cast("long").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def dfg_drift(log_a: DataFrame, log_b: DataFrame,
              case_col: str = "case_id", act_col: str = "activity",
              order_col: str = "start_time") -> DataFrame:
    """Process-drift report: the directly-follows graphs of two log
    windows, reconciled edge by edge — transitions that appeared,
    vanished, or shifted frequency between (say) last month and this
    month. DFG comparison is the standard first look at concept drift
    in process mining (public literature: Bose et al. 2011 "Handling
    Concept Drift in Process Mining" frames drift detection over
    follows-relations; this is the batch form of that signal).

    Returns ``(src, dst, n_a, n_b, status ∈ {appeared, vanished,
    common})``; frequencies are per-transition occurrence counts.
    One window per log (case-partitioned sort) + one outer join on the
    edge key — both inputs can be 100 TB logs; the edge tables are
    |activities|²-bounded.
    """
    def edges(log: DataFrame, out: str) -> DataFrame:
        w = W.partitionBy(case_col).orderBy(order_col)
        return (
            log.select(
                F.col(act_col).alias("src"),
                F.lead(act_col, 1).over(w).alias("dst"),
            )
            .filter(F.col("dst").isNotNull())
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias(out))
        )

    ea = edges(log_a, "n_a")
    eb = edges(log_b, "n_b")
    zero = F.lit(0).cast("long")
    return ea.join(eb, ["src", "dst"], "full_outer").select(
        "src", "dst",
        F.coalesce("n_a", zero).alias("n_a"),
        F.coalesce("n_b", zero).alias("n_b"),
        F.when(F.col("n_a").isNull(), F.lit("appeared"))
        .when(F.col("n_b").isNull(), F.lit("vanished"))
        .otherwise(F.lit("common")).alias("status"),
    )
