"""Batch waiting-time report (M6; reference: reporting.py:11-206).

The reference walks the batched log with nested Python loops building a
dict of per-(batch key, type) stat lists, then pretty-prints it. Here the
whole summary is ONE aggregate pipeline:

    batched rows
      -> per-(instance, case) scalars          (WT cols are constant per case)
      -> per-instance scalars (key, type, size)
      -> groupBy(activities, batch_type) + groupBy(activities) union
      -> join occurrence denominators
      -> tiny DataFrame (one row per key x type + one per key)

collected at the driver only for text rendering. Everything upstream is
partial-aggregable; the collected result is O(#batch keys), independent
of log size — safe at 100 TB.

Durations are microseconds (long) in the engine; the renderer formats
them pandas-style ("8 days 03:42:45.918367" sec) for golden-text parity
(reference: outputs/*_Report.txt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..config import Configuration

OVERALL = "__overall__"  # batch_type marker for the type-pooled level


def batch_instance_summary(log: DataFrame, config: Configuration) -> DataFrame:
    """One row per batch instance: id, activities key, type, size, and
    per-case duration sums (for pooled averages)."""
    ids = config.log_ids
    batched = log.filter(F.col(ids.batch_id).isNotNull())
    per_case = (
        batched.groupBy(ids.batch_id, ids.case)
        .agg(
            F.first(ids.batch_type).alias(ids.batch_type),
            F.sort_array(F.collect_set(ids.activity)).alias("_acts"),
            # WT cols are constant per (instance, case) by construction.
            F.first(ids.batch_pt).alias("pt"),
            F.first(ids.batch_wt).alias("wt"),
            F.first(ids.batch_total_wt).alias("total_wt"),
            F.first(ids.batch_creation_wt).alias("creation_wt"),
            F.first(ids.batch_ready_wt).alias("ready_wt"),
            F.first(ids.batch_other_wt).alias("other_wt"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    # Batch key = union of activities across the whole instance
    # (utils.py:14-27: sorted tuple of the instance's activity names).
    w_inst = W.partitionBy(ids.batch_id)
    per_case = per_case.withColumn(
        "activities",
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("_acts").over(w_inst)))),
    ).drop("_acts")
    return per_case


def summarize_batch_waiting_times(log: DataFrame, config: Configuration) -> DataFrame:
    """Per (activities, batch_type) + per (activities, OVERALL) summary.

    Columns: activities array<string>, batch_type, num_instances,
    num_cases, num_events, avg/sum of each duration component (µs,
    doubles for avgs), cte, size_distribution map<int,long>.
    """
    ids = config.log_ids
    per_case = batch_instance_summary(log, config)

    inst = (
        per_case.groupBy("activities", ids.batch_type, ids.batch_id)
        .agg(F.count(F.lit(1)).alias("size"))
    )

    def level(df_case, inst_df, type_col):
        sizes = (
            inst_df.groupBy("activities", type_col, "size")
            .agg(F.count(F.lit(1)).alias("n"))
            .groupBy("activities", type_col)
            .agg(
                F.map_from_arrays(
                    F.collect_list("size"), F.collect_list("n")
                ).alias("size_distribution"),
                # total instances = Σ per-size counts (count(1) here would
                # count the number of distinct sizes — reference counts
                # instances, reporting.py:45).
                F.sum("n").alias("num_instances"),
            )
        )
        stats = df_case.groupBy("activities", type_col).agg(
            F.count(F.lit(1)).alias("num_cases"),
            F.sum("n_events").alias("num_events"),
            F.avg("pt").alias("avg_pt"),
            F.avg("wt").alias("avg_wt"),
            F.avg("total_wt").alias("avg_total_wt"),
            F.avg("creation_wt").alias("avg_creation_wt"),
            F.avg("ready_wt").alias("avg_ready_wt"),
            F.avg("other_wt").alias("avg_other_wt"),
            F.sum("pt").alias("sum_pt"),
            F.sum("wt").alias("sum_wt"),
            # Exact integer sums (long µs): reproducible avg = sum/count in
            # any engine, immune to float-summation order differences.
            F.sum("total_wt").alias("sum_total_wt"),
            F.sum("creation_wt").alias("sum_creation_wt"),
            F.sum("ready_wt").alias("sum_ready_wt"),
            F.sum("other_wt").alias("sum_other_wt"),
        )
        return stats.join(sizes, ["activities", type_col])

    per_type = level(per_case, inst, ids.batch_type)
    pooled = level(
        per_case.withColumn(ids.batch_type, F.lit(OVERALL)),
        inst.withColumn(ids.batch_type, F.lit(OVERALL)),
        ids.batch_type,
    )
    out = per_type.unionByName(pooled)
    # CTE = sum_pt / (sum_pt + sum_wt), 0 when sum_pt = 0 (reporting.py:201-206).
    return out.withColumn(
        "cte",
        F.when(F.col("sum_pt") == 0, F.lit(0.0)).otherwise(
            F.col("sum_pt") / (F.col("sum_pt") + F.col("sum_wt"))
        ),
    )


def occurrence_denominators(log: DataFrame, summary: DataFrame,
                            config: Configuration) -> DataFrame:
    """total_occurrences per batch key (reporting.py:37, utils.py:199-229):
    count of the activity in the WHOLE log for single-activity keys;
    count of the exact ordered subsequence per case for multi-activity
    keys (W5 rolling window, vectorized — the reference loops per case).
    """
    ids = config.log_ids
    keys = summary.select("activities").distinct()
    single = keys.filter(F.size("activities") == 1).select(
        "activities", F.element_at("activities", 1).alias("_act")
    )
    act_counts = log.groupBy(F.col(ids.activity).alias("_act")).agg(
        F.count(F.lit(1)).alias("total_occurrences")
    )
    single_out = (
        single.join(act_counts, "_act", "left")
        .select("activities",
                F.coalesce("total_occurrences", F.lit(0)).alias("total_occurrences"))
    )

    multi = keys.filter(F.size("activities") > 1)
    if multi.isEmpty():
        return single_out
    # Rolling windows of each length k present among multi keys; the
    # batch key is a SORTED activity set, so compare sorted window
    # contents (the reference counts ordered windows of the trace whose
    # sorted tuple equals the key, utils.py:218-227).
    lengths = [r["k"] for r in multi.select(F.size("activities").alias("k")).distinct().collect()]
    w_case = W.partitionBy(ids.case).orderBy(ids.start_time, ids.end_time, ids.activity)
    parts = []
    for k in lengths:
        wk = w_case.rowsBetween(0, k - 1)
        rolled = (
            log.withColumn("_win", F.collect_list(ids.activity).over(wk))
            .filter(F.size("_win") == k)
            .select(F.array_sort("_win").alias("activities"))
        )
        parts.append(
            rolled.join(F.broadcast(multi), "activities")
            .groupBy("activities")
            .agg(F.count(F.lit(1)).alias("total_occurrences"))
        )
    multi_out = parts[0]
    for p in parts[1:]:
        multi_out = multi_out.unionByName(p)
    multi_out = multi.join(multi_out, "activities", "left").select(
        "activities", F.coalesce("total_occurrences", F.lit(0)).alias("total_occurrences")
    )
    return single_out.unionByName(multi_out)


def batch_report(log: DataFrame, config: Configuration) -> DataFrame:
    """Full report table: summary + occurrence denominators + frequency."""
    summary = summarize_batch_waiting_times(log, config)
    denom = occurrence_denominators(log, summary, config)
    out = summary.join(F.broadcast(denom), "activities", "left")
    # Zero-guard: clamp to 1 with the reference's warning semantics
    # (reporting.py:38-42) — frequency vs a 0 denominator is undefined.
    clamped = F.when(F.col("total_occurrences") <= 0, F.lit(1)).otherwise(
        F.col("total_occurrences")
    )
    # freq_occurrence = num_cases / total_occurrences (reference
    # reporting.py:66,69 — cases, not events: a k-activity case-based
    # batch contributes 1, not k).
    return out.withColumn(
        "frequency", F.col("num_cases") / clamped
    )


def format_timedelta_us(us: float | int | None) -> str:
    """pandas.Timedelta-style rendering of a µs duration:
    'D days HH:MM:SS[.ffffff]' (reference report format)."""
    if us is None:
        return "NaT"
    total = int(round(us))
    sign = "-" if total < 0 else ""
    total = abs(total)
    days, rem = divmod(total, 86_400_000_000)
    hours, rem = divmod(rem, 3_600_000_000)
    minutes, rem = divmod(rem, 60_000_000)
    seconds, micros = divmod(rem, 1_000_000)
    frac = f".{micros:06d}" if micros else ""
    return f"{sign}{days} days {hours:02d}:{minutes:02d}:{seconds:02d}{frac}"


def render_report(report_rows, config: Configuration) -> str:
    """Driver-side text renderer (reference layout, reporting.py:142-198).

    ``report_rows`` = collected rows of :func:`batch_report`.
    """
    ids = config.log_ids
    by_key: dict[tuple, dict] = {}
    for r in report_rows:
        key = tuple(r["activities"])
        by_key.setdefault(key, {})[r[ids.batch_type]] = r

    def block(r, indent, with_instances):
        pad = "\t" * indent
        lines = []
        if with_instances:
            lines.append(f"{pad}Num batch instances: {r['num_instances']}")
        dist = dict(sorted(r["size_distribution"].items()))
        lines.append(f"{pad}Batch size distribution: Counter({dist})")
        if with_instances:
            lines.append(f"{pad}Num batch cases: {r['num_cases']}")
            lines.append(f"{pad}Frequency: {100 * r['frequency']:.2f}%")
        lines.append(f"{pad}Average overall processing time: "
                     f"{format_timedelta_us(r['avg_pt'])} sec")
        lines.append(f"{pad}Average overall waiting time: "
                     f"{format_timedelta_us(r['avg_wt'])} sec")
        lines.append(f"{pad}CTE: {r['cte']:.2f}")
        for name in ("total", "creation", "ready", "other"):
            lines.append(f"{pad}Average {name} wt: "
                         f"{format_timedelta_us(r[f'avg_{name}_wt'])} sec")
        return lines

    out = []
    for key in sorted(by_key):
        types = by_key[key]
        overall = types.get(OVERALL)
        out.append(f"Batch formed by activities: {tuple(key)}")
        if overall is not None:
            out.append(f"\tNum occurrences: {overall['total_occurrences']}")
            # batched_total_occurrences = Σ per-type num_cases (reference
            # reporting.py:67-68) = the pooled level's num_cases.
            out.append(f"\tNum occurrences in batch: {overall['num_cases']}")
            out.append("\tFrequency occurrences in batch: "
                       f"{100 * overall['frequency']:.2f}%")
            out.extend(block(overall, 1, with_instances=False))
        for btype, r in sorted((k, v) for k, v in types.items() if k != OVERALL):
            out.append(f"\t- Batch type: {btype}")
            out.extend(block(r, 2, with_instances=True))
        out.append("")
        out.append("")
    return "\n".join(out)
