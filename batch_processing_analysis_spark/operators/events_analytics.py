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


def last_touch_attribution(events: DataFrame, touch_type: str = "click",
                           conv_type: str = "purchase",
                           window_hours: int = 24,
                           user_col: str = "user_id",
                           type_col: str = "event_type",
                           ts_col: str = "ts",
                           id_col: str = "event_id",
                           value_col: str = "value") -> DataFrame:
    """Last-touch conversion attribution (M127): for every
    ``conv_type`` event, the most recent PRIOR ``touch_type`` event by
    the same user within ``window_hours`` — the canonical marketing /
    funnel-credit query of every event warehouse, and the batch twin
    of the M120 stream-stream interval join (which answers the same
    question incrementally).

    "Prior" is lexicographic on ``(ts, event_id)`` — a touch at the
    conversion's exact timestamp counts iff its id is smaller — so the
    semantics are total-order deterministic even with timestamp ties;
    the most recent touch is the ``(ts, id)``-max among qualifying
    ones. A conversion whose latest prior touch is older than the
    window attributes to NULL (no fallback: that touch IS the most
    recent one).

    Returns one row per conversion: ``(event_id, user_id, ts_s [epoch
    seconds], value_cents, touch_id [nullable], touch_gap_s
    [nullable])``.

    Scale: ONE hash partition by user carries everything — the
    running "latest prior touch" is two ``last(..., ignorenulls)``
    windows over that partitioning (never a conversions×touches
    self-join, whose per-user blow-up is quadratic in activity); the
    window guard is a row-local filter afterwards. The SQL twin is
    the join+argmax formulation — a deliberately different shape, so
    shape-specific bugs (window frame off-by-one, tie handling) can't
    cancel out.
    """
    w = (
        W.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    is_touch = F.col(type_col) == touch_type
    touched = events.select(
        user_col, type_col, ts_col, id_col, value_col,
        F.last(F.when(is_touch, F.col(id_col)), ignorenulls=True)
        .over(w).alias("_tid"),
        F.last(F.when(is_touch, F.col(ts_col)), ignorenulls=True)
        .over(w).alias("_tts"),
    )
    in_window = (
        F.col("_tts")
        >= F.col(ts_col) - F.expr(f"INTERVAL {window_hours} HOURS")
    )
    gap = (F.unix_timestamp(ts_col) - F.unix_timestamp("_tts"))
    return (
        touched.filter(F.col(type_col) == conv_type)
        .select(
            F.col(id_col),
            F.col(user_col),
            F.unix_timestamp(ts_col).alias("ts_s"),
            F.round(F.col(value_col) * 100).cast("long")
            .alias("value_cents"),
            F.when(in_window, F.col("_tid")).cast("long")
            .alias("touch_id"),
            F.when(in_window, gap).cast("long").alias("touch_gap_s"),
        )
    )


def frequent_paths(events: DataFrame, k: int = 25, depth: int = 3,
                   user_col: str = "user_id",
                   type_col: str = "event_type",
                   ts_col: str = "ts",
                   id_col: str = "event_id") -> DataFrame:
    """Top-``k`` most frequent ``depth``-step event-type paths (M128):
    count every window of ``depth`` consecutive events per user
    (ordered by ``(ts, id)`` — total-order deterministic under ties)
    and return the most common paths — the k-step generalization of
    the directly-follows graph (q13 is the depth-2 special case over
    the process-mining log; this runs on the product event stream).

    Returns ``(step_1 … step_depth, n)`` sorted by ``n`` desc with the
    full path as tiebreak, limited to ``k``.

    Scale: one hash partition by user carries the ``depth−1`` lead
    windows (one Exchange, one Window stack); the count shuffle is on
    the path key whose cardinality is ≤ |event types|^depth — tiny;
    top-k is a broadcast-sized sort.
    """
    if depth < 2:
        raise ValueError(f"depth must be >= 2, got {depth}")
    w = W.partitionBy(user_col).orderBy(ts_col, id_col)
    df = events.select(user_col, type_col, ts_col, id_col)
    step_cols = [F.col(type_col).alias("step_1")]
    for i in range(1, depth):
        step_cols.append(
            F.lead(type_col, i).over(w).alias(f"step_{i + 1}")
        )
    paths = df.select(*step_cols).filter(
        F.col(f"step_{depth}").isNotNull()
    )
    names = [f"step_{i}" for i in range(1, depth + 1)]
    return (
        paths.groupBy(*names)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), *names)
        .limit(k)
    )


class GridVolumeExceeded(RuntimeError):
    """The KS evaluation grid would exceed the caller's budget — raised
    BEFORE the grid is built (the distinct count is one cheap
    aggregate), mirroring the exact joins' CandidateVolumeExceeded
    discipline (VERDICT r6 task 4)."""


def ks_drift_by_group(df: DataFrame, group_col: str = "source",
                      value_col: str = "n_chars",
                      quantize: int | None = None,
                      max_distinct: int | None = None) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov statistic of each group's
    ``value_col`` distribution against the REST of the corpus (M129):
    KS = max_x |F_g(x) − F_rest(x)|, the classic distribution-drift
    test (Kolmogorov 1933; Smirnov 1939 — public), computed with NO
    floats until the final ratio: the supremum over sample points of
    ``|cum_g·(N−n_g) − cum_rest·n_g|`` is an exact integer maximum
    (cross-multiplied CDFs), and the max of a distribution-free
    statistic over the pooled sample points IS the exact KS (the
    empirical CDFs only change at sample points). The per-group
    complement of the binned drift monitors (M65/M75): no binning
    choice, exact answer, scale-free statistic.

    Returns ``(group, n_group, n_rest, ks_num, ks_denom, ks_micro)``
    with ``ks = ks_num/ks_denom`` and ``ks_micro =
    floor(ks_num·1e6/ks_denom)``; groups with an empty complement
    report 0.

    NULL contract (ADVICE r6): NULL ``value_col`` rows are excluded
    from BOTH the sample counts and the CDF grid up front — the
    statistic is the KS of the NON-NULL distributions. (Previously
    NULLs inflated n_group/N while the null-unsafe grid joins dropped
    them from the CDFs, so the empirical CDFs never reached 1 and KS
    was overstated for NULL-bearing groups.) A group that is entirely
    NULL disappears from the output.

    Scale: one (group, value) count shuffle; the evaluation grid is
    |distinct values| × |groups| rows — aggregate-bounded by VALUE
    cardinality, not row count, and the single-partition cumulative
    window over the pooled values is bounded the same way. That bound
    is honest for integer-ish columns but degrades to ≈|rows| on a
    continuous metric column, so (VERDICT r6 task 4):

    - ``quantize=w`` maps values to ``floor(value/w)·w`` first — the
      result is the EXACT KS of the quantized variable (a coarser but
      still distribution-free statistic), with the grid bounded by
      range/w;
    - ``max_distinct=B`` measures |distinct values| (one cheap
      aggregate, after any quantization) BEFORE the grid is built and
      raises :class:`GridVolumeExceeded` over budget, naming
      ``quantize`` as the mitigation.
    """
    df = df.filter(F.col(value_col).isNotNull())
    if quantize is not None:
        if quantize <= 0:
            raise ValueError(f"quantize must be positive, got {quantize}")
        df = df.withColumn(
            value_col,
            (F.floor(F.col(value_col) / F.lit(quantize))
             * F.lit(quantize)).cast("long"),
        )
    if max_distinct is not None:
        n_vals = df.select(value_col).distinct().count()
        if n_vals > max_distinct:
            raise GridVolumeExceeded(
                f"ks_drift_by_group: {n_vals} distinct {value_col} values "
                f"exceed max_distinct={max_distinct}; the evaluation grid "
                f"and its pooled cumulative window scale with value "
                f"cardinality. Pass quantize=<width> to bound the grid "
                f"(exact KS of the quantized variable), or raise the "
                f"budget."
            )
    # ONE pass over the input builds the (group, value) counts; the
    # value grid, per-group sizes, pooled counts and the scalar total
    # all derive from that dictionary-sized frame (previously four
    # MORE full input passes). Σ-identities make the numbers exact:
    # distinct values, Σ_c per group, Σ_c per value, ΣΣ_c.
    counts = df.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("_c")
    ).localCheckpoint(eager=False)
    vals = counts.select(value_col).distinct()
    groups = counts.groupBy(group_col).agg(F.sum("_c").alias("_ng"))
    total = groups.agg(F.sum("_ng").alias("_N"))
    grid = (
        vals.crossJoin(F.broadcast(groups))
        .join(counts, [group_col, value_col], "left")
        .select(group_col, value_col, "_ng",
                F.coalesce("_c", F.lit(0).cast("long")).alias("_c"))
    )
    allc = counts.groupBy(value_col).agg(F.sum("_c").alias("_ca"))
    w_g = (W.partitionBy(group_col).orderBy(value_col)
           .rowsBetween(W.unboundedPreceding, 0))
    w_a = (W.partitionBy(F.lit(1)).orderBy(value_col)
           .rowsBetween(W.unboundedPreceding, 0))
    cum_all = allc.select(
        value_col, F.sum("_ca").over(w_a).alias("_cum_all")
    )
    scored = (
        grid.withColumn("_cum_g", F.sum("_c").over(w_g))
        .join(cum_all, value_col)
        .crossJoin(F.broadcast(total))
        .select(
            group_col, "_ng", "_N",
            F.abs(
                F.col("_cum_g") * (F.col("_N") - F.col("_ng"))
                - (F.col("_cum_all") - F.col("_cum_g")) * F.col("_ng")
            ).alias("_num"),
        )
    )
    return (
        scored.groupBy(group_col)
        .agg(F.max("_num").alias("ks_num"),
             F.first("_ng").alias("n_group"),
             (F.first("_N") - F.first("_ng")).alias("n_rest"))
        .select(
            F.col(group_col),
            F.col("n_group").cast("long"),
            F.col("n_rest").cast("long"),
            F.col("ks_num").cast("long"),
            (F.col("n_group") * F.col("n_rest")).cast("long")
            .alias("ks_denom"),
            F.when(F.col("n_group") * F.col("n_rest") > 0,
                   F.floor(F.col("ks_num") * F.lit(1_000_000)
                           / (F.col("n_group") * F.col("n_rest"))))
            .otherwise(F.lit(0)).cast("long").alias("ks_micro"),
        )
    )


def variant_table(events: DataFrame, k: int = 25,
                  case_col: str = "user_id",
                  type_col: str = "event_type",
                  ts_col: str = "ts",
                  id_col: str = "event_id",
                  prefix_len: int | None = None) -> DataFrame:
    """Top-``k`` case variants (M139): group cases by their ordered
    activity sequence and count — the first table every
    process-mining analysis shows ("80% of cases follow 5 paths"),
    over the product event stream with (ts, id) total order under
    ties. ``prefix_len`` restricts each case to its FIRST n events
    (the "how do journeys start" form — on long always-on streams
    full variants are all unique and the table degenerates).

    Returns ``(variant [comma-joined sequence], n_cases, n_events)``
    sorted by n_cases desc with the variant string as tiebreak,
    limited to ``k``.

    Scale: ONE hash partition by case carries the ordering window and
    the sequence fold (collect_list over the window's sorted frame,
    then one row per case via max length); the variant-key count
    shuffle moves one (usually short) string per case. Variant strings
    are unbounded only if traces are — cap upstream if a case can run
    to millions of events.
    """
    if prefix_len is not None:
        w_rn = W.partitionBy(case_col).orderBy(ts_col, id_col)
        events = (
            events.withColumn("_rn", F.row_number().over(w_rn))
            .filter(F.col("_rn") <= prefix_len)
            .drop("_rn")
        )
    w = (W.partitionBy(case_col).orderBy(ts_col, id_col)
         .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    per_case = (
        events.select(
            case_col,
            F.concat_ws(",", F.collect_list(type_col).over(w))
            .alias("variant"),
            F.count(F.lit(1)).over(
                W.partitionBy(case_col)).alias("_n_events"),
        )
        .groupBy(case_col)
        .agg(F.first("variant").alias("variant"),
             F.first("_n_events").alias("_n_events"))
    )
    return (
        per_case.groupBy("variant")
        .agg(F.count(F.lit(1)).alias("n_cases"),
             F.sum("_n_events").cast("long").alias("n_events"))
        .orderBy(F.col("n_cases").desc(), "variant")
        .limit(k)
    )


def conformance_fitness(events: DataFrame, min_support: int = 10,
                        case_col: str = "user_id",
                        type_col: str = "event_type",
                        ts_col: str = "ts",
                        id_col: str = "event_id") -> DataFrame:
    """Directly-follows conformance fitness (M138): mine the DFG model
    from the log itself (edges with ≥ ``min_support`` occurrences),
    then score every case by the fraction of its transitions the model
    contains — the standard frequency-model token-replay
    approximation of conformance checking (van der Aalst's process
    mining line; the DFG-fitness form is the public textbook variant).
    Low-fitness cases are the anomalous paths worth auditing.

    Returns one row per case with ≥1 transition:
    ``(case, n_transitions, n_conforming, fitness_micro)``.

    Scale: one case-partitioned lead window builds transitions; the
    model is a (type, type) count aggregate — ≤ |types|² rows,
    broadcast back; the rollup is per-case. Mining and scoring share
    the transition frame (one staged localCheckpoint).
    """
    w = W.partitionBy(case_col).orderBy(ts_col, id_col)
    trans = (
        events.select(
            case_col,
            F.col(type_col).alias("_a"),
            F.lead(type_col, 1).over(w).alias("_b"),
        )
        .filter(F.col("_b").isNotNull())
        .localCheckpoint(eager=False)
    )
    model = (
        trans.groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_support)
        .select("_a", "_b", F.lit(1).alias("_ok"))
    )
    return (
        trans.join(F.broadcast(model), ["_a", "_b"], "left")
        .groupBy(case_col)
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.sum(F.coalesce("_ok", F.lit(0))).cast("long")
            .alias("n_conforming"),
        )
        .select(
            F.col(case_col),
            F.col("n_transitions").cast("long"),
            "n_conforming",
            F.floor(F.col("n_conforming") * F.lit(1_000_000)
                    / F.col("n_transitions")).cast("long")
            .alias("fitness_micro"),
        )
    )
