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
literal set. Two physical strategies for the per-event max:

- ``array`` (default): windowed collect of the case's own events
  filtered with a higher-order function (JVM-side, no self-join, no
  Python). Right for process logs — traces are tens of events — but the
  per-row array copy is O(trace_len²) memory per case.
- ``join``: sort-merge self-join on the case key (predecessor end ≤
  event start, non-concurrent, non-self) + partial-aggregated max.
  O(trace_len²) *compute* but streamed — memory stays bounded however
  long the trace, so this is the fallback for pathological traces.
- ``auto``: one cheap max-trace-length probe (single groupBy count —
  an action, documented) picks ``join`` above ``long_trace_threshold``.

Both strategies produce identical values by construction (the join's
self-exclusion predicate mirrors the array path's triple equality);
tests/test_enablement.py asserts equality including on a 10k-event
trace.
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
    (driver-side: |activities|² rows, tiny).

    The matrix is collected ONCE and paired in Python: a Spark
    self-join here re-executes the matrix's window+aggregate stage for
    both sides before collecting the same ≤|A|² rows (measured ~2× the
    eager-pairs job inside every add_enabled_times call), while the
    driver-side pairing is O(|A|²) dict lookups on data that must reach
    the driver anyway."""
    counts = {(r["a"], r["b"]): r["n"] for r in df_matrix.collect()}
    pairs: set[tuple[str, str]] = set()
    for (a, b), nab in counts.items():
        nba = counts.get((b, a))
        if nba is None:
            continue
        if abs(nab - nba) / (nab + nba + 1) < threshold:
            pairs.add((a, b))
            pairs.add((b, a))
    return pairs


def add_enabled_times(
    log: DataFrame,
    ids: EventLogIDs,
    concurrency_threshold: float = 0.1,
    strategy: str = "array",
    long_trace_threshold: int = 2_000,
    literal_pairs_limit: int = 512,
) -> DataFrame:
    """Add ``ids.enabled_time`` to every event (reference: analysis.py:43).

    ``strategy``: ``"array"`` (HOF over per-case collected events),
    ``"join"`` (sort-merge self-join — the long-trace fallback), or
    ``"auto"`` (probe max trace length once, pick accordingly).

    The concurrency relation rides along in one of two shapes. Up to
    ``literal_pairs_limit`` directed pairs it is a literal in-expression
    map activity → partner array, resolved into a ``_conc`` column once
    per row — zero extra joins, right for process logs (|A| ≈ tens).
    Above the limit it becomes DATA: a broadcast-joined per-activity
    partner table, because Catalyst analysis cost grows with every
    literal in the expression tree (|A|² pairs on a 2k-activity log
    froze plan build — same failure mode as the SRP plane literals,
    same remedy). Both shapes produce identical values;
    tests/test_enablement.py asserts it.
    """
    pairs = concurrency_pairs(directly_follows_matrix(log, ids), concurrency_threshold)
    if len(pairs) <= literal_pairs_limit:
        # Literal per-activity partner map: partners_map[b] = sorted
        # [a : (a, b) in pairs]. The r11 shape was one flat literal
        # array of "a\x1fb" keys probed per (event, predecessor) with
        # a string concat + a linear scan over ALL directed pairs —
        # measured as the hottest CPU in the detection stages (guide
        # §1.2 per-task work: 100k events x ~67 predecessors x
        # |pairs| string compares). The map is resolved ONCE PER ROW
        # into a `_partners` column below, so the per-predecessor
        # check collapses to membership in this activity's (usually
        # tiny) partner list. Identical relation, identical values.
        partners_lit: dict[str, list[str]] = {}
        for a, b in pairs:
            partners_lit.setdefault(b, []).append(a)
        pair_keys = (
            F.create_map(*[
                x
                for act, ps in sorted(partners_lit.items())
                for x in (F.lit(act),
                          F.array(*[F.lit(p) for p in sorted(ps)]))
            ])
            if pairs else
            F.create_map().cast("map<string,array<string>>")
        )
        conc_df = None
    else:
        pair_keys = None
        partners: dict[str, list[str]] = {}
        for a, b in pairs:
            partners.setdefault(b, []).append(a)
        conc_df = log.sparkSession.createDataFrame(
            [(k, sorted(v)) for k, v in sorted(partners.items())],
            "_conc_act string, _conc array<string>",
        )

    if strategy == "auto":
        longest = (
            log.groupBy(ids.case).agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("m")).first()["m"]
        ) or 0
        strategy = "join" if longest > long_trace_threshold else "array"
    if strategy == "join":
        return _enabled_times_join(log, ids, pair_keys, conc_df)

    if conc_df is not None:
        # Partner list for THIS event's activity; the HOF below tests
        # predecessor membership in it. Null (activity without any
        # concurrent partner) ⇒ empty list.
        log = log.join(
            F.broadcast(conc_df),
            F.col(ids.activity) == F.col("_conc_act"), "left",
        ).drop("_conc_act")
    else:
        # Literal path: resolve the partner list once per ROW (not per
        # predecessor) — the HOF then probes a short array.
        log = log.withColumn(
            "_conc", F.element_at(pair_keys, F.col(ids.activity)))

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
    _partners = F.coalesce(F.col("_conc"), F.array().cast("array<string>"))
    is_conc = lambda ev: F.array_contains(_partners, ev["act"])  # noqa: E731
    enabler_end = F.array_max(
        F.transform(
            F.filter(
                F.col("_case_events"),
                lambda ev: (ev["e"] <= this_start)
                & ~is_self(ev)
                & ~is_conc(ev),
            ),
            lambda ev: ev["e"],
        )
    )
    return df.withColumn(
        ids.enabled_time,
        F.timestamp_micros(F.coalesce(enabler_end, F.col("_case_first_start"))),
    ).drop("_case_events", "_case_first_start", "_conc")


def _enabled_times_join(log: DataFrame, ids: EventLogIDs, pair_keys,
                        conc_df: DataFrame | None = None) -> DataFrame:
    """Sort-merge self-join enablement: for each distinct event triple
    (start, end, activity) of a case, max predecessor end among events
    with ``end ≤ start``, a different triple (mirrors the array path's
    self-exclusion exactly), and a non-concurrent activity.

    The concurrency relation arrives either as ``pair_keys`` (literal
    array, small alphabets) or ``conc_df`` (broadcast partner table,
    large alphabets — see add_enabled_times).

    Scale: every join/groupBy keys on the case id (plus the triple), so
    a long trace streams through sort-merge + partial agg instead of
    materializing an O(trace_len²) array copy per row.
    """
    s_us = F.unix_micros(F.col(ids.start_time))
    e_us = F.unix_micros(F.col(ids.end_time))
    ev = log.select(
        F.col(ids.case).alias("_c"),
        s_us.alias("_s"),
        e_us.alias("_e"),
        F.col(ids.activity).alias("_a"),
    ).distinct()
    if conc_df is not None:
        ev = ev.join(
            F.broadcast(conc_df), F.col("_a") == F.col("_conc_act"), "left"
        ).drop("_conc_act")
    else:
        # Literal path: per-activity partner array resolved once per
        # distinct event triple (see add_enabled_times).
        ev = ev.withColumn("_conc", F.element_at(pair_keys, F.col("_a")))
    pred = log.select(
        F.col(ids.case).alias("_pc"),
        s_us.alias("_ps"),
        e_us.alias("_pe"),
        F.col(ids.activity).alias("_pa"),
    )
    not_self = ~(
        (F.col("_ps") == F.col("_s"))
        & (F.col("_pe") == F.col("_e"))
        & (F.col("_pa") == F.col("_a"))
    )
    is_conc = F.array_contains(
        F.coalesce(F.col("_conc"), F.array().cast("array<string>")),
        F.col("_pa"),
    )
    enab = (
        ev.join(
            pred,
            (F.col("_pc") == F.col("_c"))
            & (F.col("_pe") <= F.col("_s"))
            & not_self
            & ~is_conc,
            "left",
        )
        .groupBy("_c", "_s", "_e", "_a")
        .agg(F.max("_pe").alias("_enabler_end"))
    )
    first_start = log.groupBy(F.col(ids.case).alias("_fc")).agg(
        F.min(s_us).alias("_first_start")
    )
    return (
        log.join(
            enab,
            (F.col(ids.case) == F.col("_c"))
            & (s_us == F.col("_s"))
            & (e_us == F.col("_e"))
            & (F.col(ids.activity) == F.col("_a")),
        )
        .join(first_start, F.col(ids.case) == F.col("_fc"))
        .withColumn(
            ids.enabled_time,
            F.timestamp_micros(F.coalesce(F.col("_enabler_end"), F.col("_first_start"))),
        )
        .drop("_c", "_s", "_e", "_a", "_conc", "_enabler_end", "_fc", "_first_start")
    )
