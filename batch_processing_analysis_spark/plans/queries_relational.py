"""Relational operator surface (SURVEY §2.2-2.6) demonstrated on the
driver's TPC-H-ish testdata, each with a DuckDB oracle twin.

Scale notes are in each docstring: these run at sf0.01 for the
correctness gate, but every plan is written for the 1000-executor case —
dims broadcast, filters pushed to the parquet scan, aggregates partial
(map-side) by construction, windows partitioned by high-cardinality keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..sources.tables import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# A-series aggregates
# --------------------------------------------------------------------------

@query(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 6)                                        AS avg_qty,
           round(avg(l_extendedprice), 6)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (A1/A7/A8): scan-filter-agg, fully partial-aggregable.

    Scale: filter pushes to parquet; 2-key groupBy over ~6 groups → one
    shuffle of tiny partial-agg output. Survives any scale-up.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q02_filter_project",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 100000
      AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    """,
    primary=False,
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P6: projection + compound predicate, zero shuffle.

    Scale: all three predicates and the 3-column projection reach the
    parquet reader (PushedFilters/ReadSchema) — IO-bound only.
    """
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "O")
        & (F.col("o_totalprice") > 100000)
        & F.col("o_orderdate").between("1995-01-01", "1996-12-31")
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@query(
    "q03_top_revenue_orders",
    """
    SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem GROUP BY l_orderkey
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q03_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 + global top-k: Spark runs TakeOrderedAndProject (no full sort).

    Scale: per-orderkey partial aggregation then a driver-side top-10 of
    per-partition top-10s — never materializes the full sorted set.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q14_nested_two_level_agg",
    """
    SELECT event_type, max(first_seen) AS latest_first_seen, count(*) AS n_users
    FROM (
      SELECT event_type, user_id, min(CAST(floor(epoch(ts)) AS BIGINT)) AS first_seen
      FROM events GROUP BY event_type, user_id
    ) GROUP BY event_type
    """,
    primary=False,
)
def q14_nested_two_level_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: two-level nested aggregate (max over groups of per-subgroup min).

    Mirrors the reference's batch-instance-enabled computation
    (utils.py:54-66: max over cases of per-case min). Scale: first
    groupBy shuffles on (type,user); second reuses the same hash
    partitioning (type ⊂ (type,user)) so AQE keeps it cheap.
    """
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.min(F.unix_timestamp("ts")).alias("first_seen")
    )
    return per_user.groupBy("event_type").agg(
        F.max("first_seen").alias("latest_first_seen"),
        F.count(F.lit(1)).alias("n_users"),
    )


@query(
    "q15_histogram",
    """
    SELECT n_orders, count(*) AS n_customers
    FROM (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey)
    GROUP BY n_orders
    """,
    primary=False,
)
def q15_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: histogram via double groupBy (reference: Counter of batch sizes,
    reporting.py:171,189). Scale: second agg input is one row per
    customer — already tiny relative to the fact table."""
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "q16_rollup",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS flag, coalesce(l_linestatus, 'ALL') AS status,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    primary=False,
)
def q16_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup: the reference's two-pass overall/per-type report levels
    (reporting.py:149-198) as ONE pass (SURVEY §2.4 note).

    Scale: rollup expands to grouping sets in a single shuffle instead of
    re-scanning the fact table per level.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
            "sum_qty",
            "n",
        )
    )


@query(
    "q17_cte_ratio",
    """
    SELECT o_orderpriority,
           CASE WHEN sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END) = 0
                THEN 0.0
                ELSE round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END)
                           / sum(o_totalprice), 6)
           END AS cte
    FROM orders GROUP BY o_orderpriority
    """,
)
def q17_cte_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: sum ratio with zero-guard — the reference's cycle-time-efficiency
    formula CTE = ΣPT/(ΣPT+ΣWT) with its 0-if-no-PT guard
    (reporting.py:201-206), transplanted onto orders."""
    o = _t(spark, sf_dir, "orders")
    pt = F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(0.0))
    return o.groupBy("o_orderpriority").agg(
        F.when(pt == 0, F.lit(0.0)).otherwise(F.round(pt / F.sum("o_totalprice"), 6)).alias("cte")
    )


# --------------------------------------------------------------------------
# P-series predicates / projections
# --------------------------------------------------------------------------

@query(
    "q07_in_case_when",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_high_disc,
           count(*) AS n
    FROM lineitem WHERE l_linestatus IN ('O', 'F') GROUP BY l_returnflag
    """,
)
def q07_in_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 (IN-list) + P8 (CASE WHEN): both fold into the scan/agg stage."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_linestatus").isin("O", "F"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("l_discount") >= 0.05, 1).otherwise(0)).alias("n_high_disc"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q08_string_ops",
    """
    SELECT p_brand, count(*) AS n_matching
    FROM part
    WHERE contains(p_name, 'a') AND regexp_matches(upper(trim(p_type)), '^[A-Z]+')
    GROUP BY p_brand
    """,
)
def q08_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7/F7: contains + trim/upper/regexp (reference: handoff string
    cleanup, handoff_batch.py:83,111)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_name").contains("a")
            & F.upper(F.trim(F.col("p_type"))).rlike("^[A-Z]+")
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_matching"))
    )


# --------------------------------------------------------------------------
# J-series joins
# --------------------------------------------------------------------------

@query(
    "q04_semi_join",
    """
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
    GROUP BY c_mktsegment
    """,
    primary=False,
)
def q04_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: left-semi join (reference: keep cases containing an activity,
    handoff_batch.py:66-74). Scale: the key set is aggregated before the
    join; AQE turns it broadcast when small."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    keys = o.filter(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("c_custkey"))
    return (
        c.join(keys, "c_custkey", "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "q05_anti_join",
    """
    SELECT count(*) AS n_unsold, coalesce(min(p_partkey), -1) AS min_unsold_key
    FROM part WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
    """,
    primary=False,
)
def q05_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: anti join (reference: blacklist drop, handoff_batch.py:84-94)."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    unsold = p.join(
        li.select(F.col("l_partkey").alias("p_partkey")), "p_partkey", "left_anti"
    )
    return unsold.agg(
        F.count(F.lit(1)).alias("n_unsold"),
        F.coalesce(F.min("p_partkey"), F.lit(-1)).alias("min_unsold_key"),
    )


@query(
    "q06_regional_revenue",
    """
    SELECT r_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(DISTINCT o_orderkey) AS n_orders,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q06_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-style star join + A2 exact distinct (TPC-H Q5 shape).

    Scale: nation/region/customer are dims → explicit ``broadcast`` so
    the fact table never shuffles for them; only the lineitem⋈orders join
    shuffles (both huge, co-partitioned on orderkey).
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q18_range_join_workload",
    """
    SELECT i.event_id AS instant_id, count(DISTINCT e.user_id) AS workload
    FROM (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events
          WHERE event_id % 199 = 0) i
    JOIN (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
                 CAST(floor(epoch(ts)) AS BIGINT) + CAST(ceil(value) AS BIGINT) AS e
          FROM events) e
      ON e.s <= i.t AND i.t <= e.e
    GROUP BY i.event_id
    """,
)
def q18_range_join_workload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: point-in-interval (range) join — the reference's workload
    feature: #distinct cases a resource is busy with at instant t
    (utils.py:179-196, called per-instant at activation_rules.py:132).

    The reference re-scans the whole log per instant (O(instants×N));
    here ONE broadcast range join against the (small) instant set
    evaluates all instants in a single pass over the events. With no
    equality key the physical op is BroadcastNestedLoopJoin — bounded
    by design: the build side is the instant sample, so cost is
    |events| × |instants_broadcast|, never a data×data product. When a
    partitioning key exists (q36's per-resource workload) the same
    operator plants it as the hash key and Catalyst picks a hash join;
    for instant sets too large to broadcast, q29 runs the same workload
    through the bucketed range join in operators/range_join.py
    (equi-join on time bucket + residual filter).
    """
    ev = _t(spark, sf_dir, "events")
    instants = (
        ev.filter(F.col("event_id") % 199 == 0)
        .select(F.col("event_id").alias("instant_id"), F.unix_timestamp("ts").alias("t"))
    )
    intervals = ev.select(
        "user_id",
        F.unix_timestamp("ts").alias("s"),
        (F.unix_timestamp("ts") + F.ceil("value").cast("long")).alias("e"),
    )
    return (
        intervals.join(
            F.broadcast(instants),
            (F.col("s") <= F.col("t")) & (F.col("t") <= F.col("e")),
        )
        .groupBy("instant_id")
        .agg(F.countDistinct("user_id").alias("workload"))
    )


@query(
    "q29_range_join_bucketed",
    """
    SELECT i.event_id AS instant_id, count(DISTINCT e.user_id) AS workload
    FROM (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events
          WHERE event_id % 199 = 0) i
    JOIN (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
                 CAST(floor(epoch(ts)) AS BIGINT) + CAST(ceil(value) AS BIGINT) AS e
          FROM events) e
      ON e.s <= i.t AND i.t <= e.e
    GROUP BY i.event_id
    """,
)
def q29_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 at scale: the same workload query as q18, but through the
    bucketed point-in-interval join (operators/range_join.py) — points
    quantize to one time bucket, intervals explode into covered buckets,
    and the join is a shuffled equi-join on bucket + exact residual.
    Identical results to the broadcast path by construction (each point
    is in exactly one bucket → no duplicate pairs).

    Scale: this is the path for instant sets too large to broadcast —
    shuffle ∝ data × bounded fan-out, never |points|×|intervals|; the
    span guard routes pathologically long intervals through the
    keys-equality residual join instead of unbounded explode.
    """
    from ..operators.range_join import point_in_interval_join

    ev = _t(spark, sf_dir, "events")
    instants = (
        ev.filter(F.col("event_id") % 199 == 0)
        .select(F.col("event_id").alias("instant_id"), F.unix_timestamp("ts").alias("t"))
    )
    intervals = ev.select(
        "user_id",
        F.unix_timestamp("ts").alias("s"),
        (F.unix_timestamp("ts") + F.ceil("value").cast("long")).alias("e"),
    )
    pairs = point_in_interval_join(
        instants, intervals, point="t", start="s", end="e", bucket=3600,
        broadcast_points=False,
    )
    return pairs.groupBy("instant_id").agg(
        F.countDistinct("user_id").alias("workload")
    )


@query(
    "q19_theta_self_join",
    """
    WITH err AS (
      SELECT event_id, user_id % 20 AS resource,
             CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT) + CAST(ceil(value) AS BIGINT) AS e,
             value
      FROM events WHERE event_type = 'error'
    )
    SELECT a.resource AS resource, count(*) AS n_pairs
    FROM err a JOIN err b
      ON a.resource = b.resource AND a.event_id <> b.event_id
     AND b.s >= a.s AND b.s <= a.e AND b.value > a.value
    GROUP BY a.resource
    """,
)
def q19_theta_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: self theta-join — the reference's prioritization-candidate
    search (pairs on one resource where one event starts inside the
    other's execution, handoff_batch.py:163-173).

    Scale: the join's ONLY equality key is ``resource`` — 20 distinct
    values — so a plain hash join evaluates O(Σ n_r²) candidate pairs:
    measured 19.8× time at 10× events in the r5 sf1-equivalent bench,
    the one super-linear query on the board. Since the intervals are
    short (≤ ~488 s vs a months-long log), the J2 bucketed range join
    fixes the shape: points hash to one 512 s time bucket, intervals
    explode into the ≤2 buckets they touch, and the equi-key becomes
    (resource, bucket) — candidates are now only same-bucket rows, so
    growing the HISTORY grows buckets, not per-key candidates. The
    value/id predicates stay residual filters on the exact matches.
    """
    from ..operators.range_join import point_in_interval_join

    ev = _t(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        "event_id",
        (F.col("user_id") % 20).alias("resource"),
        F.unix_timestamp("ts").alias("s"),
        (F.unix_timestamp("ts") + F.ceil("value").cast("long")).alias("e"),
        "value",
    )
    pts = err.select(
        F.col("event_id").alias("event_id_b"),
        "resource",
        F.col("s").alias("s_b"),
        F.col("value").alias("value_b"),
    )
    matched = point_in_interval_join(
        pts, err, point="s_b", start="s", end="e",
        keys=["resource"], bucket=512, broadcast_points=False,
    )
    return (
        matched.filter((F.col("event_id_b") != F.col("event_id"))
                       & (F.col("value_b") > F.col("value")))
        .groupBy("resource")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --------------------------------------------------------------------------
# W-series windows / ordered operators
# --------------------------------------------------------------------------

@query(
    "q10_argmin_first_event",
    """
    SELECT user_id, event_type AS first_type, CAST(floor(epoch(ts)) AS BIGINT) AS first_ts
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def q10_argmin_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: argmin-row (first event of a case, ties by event_id — the
    reference's iloc-after-sort idiom, analysis.py:73, utils.py:102-106).

    Scale: single window shuffle on user_id; no driver loop.
    """
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("first_type"),
            F.unix_timestamp("ts").alias("first_ts"),
        )
    )


@query(
    "q11_sessionize",
    """
    WITH x AS (
      SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
             lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_t
      FROM events
    ), s AS (
      SELECT user_id, event_id, t,
             sum(CASE WHEN prev_t IS NULL OR t - prev_t > 1800 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY t, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM x
    ), g AS (
      SELECT user_id, session_id, count(*) AS n_events, max(t) - min(t) AS dur_s
      FROM s GROUP BY user_id, session_id
    )
    SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events,
           CAST(sum(n_events) AS BIGINT) AS total_events,
           max(dur_s) AS max_session_dur_s
    FROM g GROUP BY user_id
    """,
)
def q11_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 sessionization core: lag + gap flag + running sum = session ids —
    the exact mechanism the batch detector uses to chain adjacent
    executions into batch instances (SURVEY §2.5 W1).

    Scale: one shuffle on user_id serves all three window/agg steps
    (same partitioning reused); no per-group driver iteration.
    """
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_timestamp("ts")
    x = ev.select("user_id", "event_id", t.alias("t")).withColumn(
        "prev_t", F.lag("t").over(W.partitionBy("user_id").orderBy("t", "event_id"))
    )
    s = x.withColumn(
        "session_id",
        F.sum(
            F.when(F.col("prev_t").isNull() | (F.col("t") - F.col("prev_t") > 1800), 1).otherwise(0)
        ).over(
            W.partitionBy("user_id").orderBy("t", "event_id").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    g = s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"), (F.max("t") - F.min("t")).alias("dur_s")
    )
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.sum("n_events").alias("total_events"),
        F.max("dur_s").alias("max_session_dur_s"),
    )


@query(
    "q13_directly_follows",
    """
    SELECT src, dst, count(*) AS n
    FROM (SELECT event_type AS src,
                 lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
          FROM events)
    WHERE dst IS NOT NULL GROUP BY src, dst
    """,
)
def q13_directly_follows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directly-follows matrix — stage 1 of the concurrency oracle (U2):
    per-case lead pairs → pair counts (SURVEY §2.7).

    Scale: window on case key then 2-key agg; output is |activities|² —
    tiny — so it broadcasts into the next oracle stage.
    """
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(F.col("event_type").alias("src"), F.lead("event_type").over(w).alias("dst"))
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q09_window_topk",
    """
    WITH pr AS (
      SELECT p_brand, l_partkey, round(sum(l_extendedprice), 2) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand, l_partkey
    )
    SELECT p_brand, l_partkey, rev, rn FROM (
      SELECT *, row_number() OVER (PARTITION BY p_brand ORDER BY rev DESC, l_partkey) AS rn
      FROM pr
    ) WHERE rn <= 3
    """,
)
def q09_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: window row_number ≤ k with unique tiebreak.

    Scale: Spark inserts a WindowGroupLimit (partial top-k before the
    shuffle) — no group ever materializes fully sorted.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    pr = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "l_partkey")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
    )
    w = W.partitionBy("p_brand").orderBy(F.desc("rev"), "l_partkey")
    return pr.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)


@query(
    "q21_rolling_sequence",
    """
    SELECT user_id, count(*) AS n_funnels
    FROM (SELECT user_id, event_type,
                 lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t1,
                 lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2
          FROM events)
    WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
    GROUP BY user_id
    """,
)
def q21_rolling_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11/W5: ordered rolling sequence match — the reference's
    subsequence-occurrence counter (utils.py:218-227) vectorized as
    lead() comparisons instead of a per-case Python loop."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_type",
            F.lead("event_type", 1).over(w).alias("t1"),
            F.lead("event_type", 2).over(w).alias("t2"),
        )
        .filter((F.col("event_type") == "view") & (F.col("t1") == "click") & (F.col("t2") == "purchase"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_funnels"))
    )


@query(
    "q22_dense_rank",
    """
    SELECT s_suppkey, s_nationkey,
           dense_rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS rnk
    FROM supplier
    """,
    primary=False,
)
def q22_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: dense re-numbering (reference: unified batch-instance ids,
    discovery.py:161-181, replaced by dense_rank per SURVEY §7.4)."""
    s = _t(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), "s_suppkey")
    return s.select("s_suppkey", "s_nationkey", F.dense_rank().over(w).alias("rnk"))


@query(
    "q20_chunking",
    """
    SELECT chunk_size, count(*) AS n_chunks FROM (
      SELECT user_id, CAST(floor((rn - 1) / 5) AS BIGINT) AS chunk, count(*) AS chunk_size
      FROM (SELECT user_id, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events)
      GROUP BY user_id, chunk
    ) GROUP BY chunk_size
    """,
)
def q20_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W9: fixed-size chunking (reference: np.array_split grouping,
    batch_injection.py:50-51) via row_number + floor-div."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    chunks = (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("chunk", F.floor((F.col("rn") - 1) / 5))
        .groupBy("user_id", "chunk")
        .agg(F.count(F.lit(1)).alias("chunk_size"))
    )
    return chunks.groupBy("chunk_size").agg(F.count(F.lit(1)).alias("n_chunks"))


@query(
    "q23_instant_generation",
    """
    SELECT o_orderkey, i, CAST(floor(epoch(o_orderdate)) AS BIGINT) + 648000 * i AS instant_s
    FROM orders, generate_series(1, 3) AS t(i)
    WHERE o_orderkey % 500 = 0
    """,
    primary=False,
)
def q23_instant_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: equally-spaced instant generation (reference: pd.date_range
    negative-sampling instants, activation_rules.py:58-62) via
    sequence+explode — n points between two per-row timestamps."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey") % 500 == 0)
        .select("o_orderkey", F.unix_timestamp("o_orderdate").alias("base"))
        .withColumn("i", F.explode(F.sequence(F.lit(1), F.lit(3))))
        .select("o_orderkey", "i", (F.col("base") + 648000 * F.col("i")).alias("instant_s"))
    )


@query(
    "q24_union_rekey",
    """
    SELECT prefix, count(*) AS n, round(sum(o_totalprice), 2) AS total FROM (
      SELECT 'closed-' || CAST(o_orderkey AS VARCHAR) AS key, 'closed' AS prefix, o_totalprice
      FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT 'open-' || CAST(o_orderkey AS VARCHAR), 'open', o_totalprice
      FROM orders WHERE o_orderstatus = 'O'
    ) GROUP BY prefix
    """,
)
def q24_union_rekey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7: union with case re-keying (reference: trace append with
    offsetted case ids, handoff_batch.py:50-59)."""
    o = _t(spark, sf_dir, "orders")

    def part(status: str, prefix: str) -> DataFrame:
        return o.filter(F.col("o_orderstatus") == status).select(
            F.concat(F.lit(prefix + "-"), F.col("o_orderkey").cast("string")).alias("key"),
            F.lit(prefix).alias("prefix"),
            "o_totalprice",
        )

    return (
        part("F", "closed")
        .unionByName(part("O", "open"))
        .groupBy("prefix")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@query(
    "q25_conditional_pivot",
    """
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)    AS n_click,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)     AS n_view,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)    AS n_error,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT)   AS n_signup
    FROM events GROUP BY user_id
    """,
    primary=False,
)
def q25_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot via conditional aggregation (single shuffle, no pivot
    metadata pass — the scalable form of groupBy().pivot())."""
    ev = _t(spark, sf_dir, "events")
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
        for t in ["click", "view", "purchase", "error", "signup"]
    ]
    return ev.groupBy("user_id").agg(*aggs)


@query(
    "q66_asof_join",
    """
    WITH l AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    r AS (
      SELECT user_id, ts, max_by(value, event_id) AS view_value
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    )
    SELECT l.event_id, l.user_id,
           CAST(floor(epoch(l.ts)) AS BIGINT) AS ts_s,
           CAST(floor(epoch(r.ts)) AS BIGINT) AS matched_ts_s,
           r.view_value
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    primary=False,
)
def q66_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of backward join (operators/asof.py): every purchase event
    picks up the newest prior-or-simultaneous view's value for the same
    user — the kdb+ ``aj`` / DuckDB ``ASOF JOIN`` semantics as a
    single-shuffle union-merge window. The right side is pre-aggregated
    per (user, ts) with ``max_by`` so the survivor at duplicate
    timestamps is pinned in both engines."""
    from ..operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("view_value"))
    )
    out = asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts",
                    value_cols=["view_value"])
    return out.select(
        "event_id", "user_id",
        F.unix_timestamp("ts").alias("ts_s"),
        F.unix_timestamp("matched_ts").alias("matched_ts_s"),
        "view_value",
    )


@query(
    "q80_funnel_steps",
    r"""
    WITH t1 AS (
      SELECT user_id, min(ts) AS ts1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, min(e.ts) AS ts2
      FROM events e JOIN t1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > t1.ts1
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, min(e.ts) AS ts3
      FROM events e JOIN t2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
      GROUP BY e.user_id
    )
    SELECT t1.user_id,
           CAST(floor(epoch(t1.ts1)) AS BIGINT) AS ts_1,
           CAST(floor(epoch(t2.ts2)) AS BIGINT) AS ts_2,
           CAST(floor(epoch(t3.ts3)) AS BIGINT) AS ts_3,
           CASE WHEN t3.ts3 IS NOT NULL THEN 3
                WHEN t2.ts2 IS NOT NULL THEN 2
                ELSE 1 END AS depth
    FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
    """,
)
def q80_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel per user
    (operators/events_analytics.py:funnel_steps): one Exchange carries
    all step windows — never k joins onto the events table. Secondary
    registry; oracle-gated by tests/test_extra_queries.py."""
    from ..operators.events_analytics import funnel_steps

    return funnel_steps(
        _t(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


@query(
    "q81_retention_cohorts",
    r"""
    WITH first AS (
      SELECT user_id, min(ts) AS f FROM events GROUP BY user_id
    )
    SELECT CAST(date_trunc('week', f.f) AS DATE) AS cohort_week,
           CAST(floor(date_diff('day', CAST(f.f AS DATE), CAST(e.ts AS DATE))
                      / 7.0) AS BIGINT) AS week_offset,
           count(DISTINCT e.user_id) AS n_users
    FROM events e JOIN first f USING (user_id)
    GROUP BY 1, 2
    """,
    primary=False,
)
def q81_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle (operators/events_analytics.py:
    retention_cohorts): ISO-Monday cohorts × full-week offsets ×
    distinct active users. Secondary registry; oracle-gated by
    tests/test_extra_queries.py."""
    from ..operators.events_analytics import retention_cohorts

    return retention_cohorts(_t(spark, sf_dir, "events"))


@query(
    "q83_interval_overlap_join",
    r"""
    WITH iv AS (
      SELECT event_id, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT) + CAST(ceil(value) AS BIGINT) AS e
      FROM events
    ),
    a AS (SELECT event_id AS id_a, user_id, s AS sa, e AS ea
          FROM iv WHERE event_id % 2 = 0),
    b AS (SELECT event_id AS id_b, user_id, s AS sb, e AS eb
          FROM iv WHERE event_id % 2 = 1)
    SELECT a.id_a, b.id_b, a.sa, a.ea, b.sb, b.eb
    FROM a JOIN b ON a.user_id = b.user_id
                 AND a.sa <= b.eb AND b.sb <= a.ea
    """,
    primary=False,
)
def q83_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join, bucketed with exactly-once
    anchored emission (operators/range_join.py:interval_overlap_join):
    concurrent-activity pairs per user over the events table. Secondary
    registry; oracle-gated by tests/test_extra_queries.py."""
    from ..operators.range_join import interval_overlap_join

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.unix_timestamp("ts").alias("s"),
        (F.unix_timestamp("ts") + F.ceil("value").cast("long")).alias("e"),
    )
    a = ev.filter(F.col("event_id") % 2 == 0).select(
        F.col("event_id").alias("id_a"), "user_id",
        F.col("s").alias("sa"), F.col("e").alias("ea"),
    )
    b = ev.filter(F.col("event_id") % 2 == 1).select(
        F.col("event_id").alias("id_b"),
        F.col("user_id").alias("user_id_b"),
        F.col("s").alias("sb"), F.col("e").alias("eb"),
    )
    out = interval_overlap_join(
        a, b.withColumnRenamed("user_id_b", "user_id"),
        a_start="sa", a_end="ea", b_start="sb", b_end="eb",
        keys=["user_id"], bucket=3600, max_span=64,
    )
    return out.select("id_a", "id_b", "sa", "ea", "sb", "eb")


@query(
    "q84_resample_locf",
    r"""
    WITH obs AS (
      SELECT user_id,
             CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS slot_ts,
             max(struct_pack(t := CAST(floor(epoch(ts)) AS BIGINT),
                             tb := event_id, v := value)) AS o
      FROM events GROUP BY 1, 2
    ),
    spans AS (
      SELECT user_id,
             CAST(floor(min(floor(epoch(ts))) / 3600) * 3600 AS BIGINT) AS lo,
             CAST(floor(max(floor(epoch(ts))) / 3600) * 3600 AS BIGINT) AS hi
      FROM events GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, 3600)) AS slot_ts
      FROM spans
    )
    SELECT g.user_id, g.slot_ts,
           last_value((o.o).v IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.slot_ts
             ROWS UNBOUNDED PRECEDING
           ) AS value,
           CASE WHEN o.o IS NULL THEN 0 ELSE 1 END AS observed
    FROM grid g LEFT JOIN obs o USING (user_id, slot_ts)
    """,
    primary=False,
)
def q84_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly fixed-step resample of each user's event-value series
    with last-observation-carried-forward
    (operators/timeseries.py:resample_locf). Secondary registry;
    oracle-gated by tests/test_extra_queries.py."""
    from ..operators.timeseries import resample_locf

    return resample_locf(_t(spark, sf_dir, "events"), step=3600)


@query(
    "q85_rolling_median",
    r"""
    SELECT event_id, user_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS t,
           median(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
           ) AS rolling_median
    FROM events
    """,
    primary=False,
)
def q85_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-row rolling median of each user's value series
    (operators/timeseries.py:rolling_median) — the deterministic
    rolling smoother (order statistic, not float accumulation).
    Secondary registry; oracle-gated by tests/test_extra_queries.py."""
    from ..operators.timeseries import rolling_median

    ev = _t(spark, sf_dir, "events")
    out = rolling_median(
        ev.withColumn("_ord", F.struct("ts", "event_id")), n=5,
        order_col="_ord",
    )
    return out.select(
        "event_id", "user_id",
        F.unix_timestamp("ts").alias("t"), "rolling_median",
    )


@query(
    "q86_json_props_stats",
    r"""
    SELECT event_type,
           count(*) AS n_events,
           count(CAST(props->>'$.k' AS BIGINT)) AS n_parsed,
           CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
           max(CAST(props->>'$.k' AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """,
    primary=False,
)
def q86_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: typed schema-on-read over the JSON
    ``props`` column (functions/semistructured.py — from_json with an
    explicit struct, JVM codegen, malformed → NULL not dropped) +
    exact integer aggregates per event type. Secondary registry;
    oracle-gated by tests/test_extra_queries.py."""
    from ..functions.semistructured import parse_json_col

    ev = parse_json_col(_t(spark, sf_dir, "events"), "props", "k long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("_j.k").alias("n_parsed"),
        F.sum("_j.k").alias("sum_k"),
        F.min("_j.k").alias("min_k"),
        F.max("_j.k").alias("max_k"),
    )


@query(
    "q87_pseudonymized_rollup",
    r"""
    SELECT substr(md5('salt0' || chr(31) || CAST(user_id AS VARCHAR)), 1, 16)
             AS user_token,
           count(*) AS n_events,
           count(DISTINCT event_type) AS n_types
    FROM events GROUP BY 1
    """,
    primary=False,
)
def q87_pseudonymized_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed pseudonymization (operators/privacy.py): tokenize user_id,
    then aggregate per token — referential structure survives (150
    tokens, same per-user counts as the raw rollup). Secondary
    registry; oracle-gated by tests/test_extra_queries.py."""
    from ..operators.privacy import pseudonymize

    ev = pseudonymize(_t(spark, sf_dir, "events"), ["user_id"], "salt0")
    return ev.groupBy(F.col("user_id").alias("user_token")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("event_type").alias("n_types"),
    )


@query(
    "q89_sql_surface",
    r"""
    SELECT n.n_name, count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY n.n_name
    """,
    primary=False,
)
def q89_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw ANSI-SQL surface: tables registered as temp views, the
    query text handed to ``spark.sql`` verbatim — a reference user who
    writes SQL (not DataFrame code) runs it unchanged; Catalyst plans
    it identically to the DataFrame builders. Secondary registry;
    oracle-gated by tests/test_extra_queries.py (the oracle IS the
    same SQL string, modulo nothing)."""
    for t in ("orders", "customer", "nation"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n.n_name, count(*) AS n_orders,
               round(sum(o.o_totalprice), 2) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY n.n_name
        """
    )


@query(
    "q103_rolling_mad",
    r"""
    SELECT event_id, user_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS t,
           mad(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
           ) AS rolling_mad
    FROM events
    """,
    primary=False,
)
def q103_rolling_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-row rolling median absolute deviation per user
    (operators/timeseries.py:rolling_mad) — the robust spread behind
    outlier flags; order statistics, so engine-deterministic where a
    rolling stddev is not. Secondary registry; oracle-gated by
    tests/test_extra_queries.py."""
    from ..operators.timeseries import rolling_mad

    ev = _t(spark, sf_dir, "events")
    out = rolling_mad(
        ev.withColumn("_ord", F.struct("ts", "event_id")), n=5,
        order_col="_ord",
    )
    return out.select(
        "event_id", "user_id",
        F.unix_timestamp("ts").alias("t"), "rolling_mad",
    )


@query(
    "q109_time_split_embargo",
    r"""
    WITH lab AS (
      SELECT user_id,
             CASE WHEN ts IS NULL THEN NULL
                  WHEN floor(epoch(ts)) < 1706140800 - 172800 THEN 'train'
                  WHEN floor(epoch(ts)) >= 1706140800 THEN 'eval'
                  ELSE 'embargo' END AS split
      FROM events
    )
    SELECT split, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM lab GROUP BY split
    """,
    primary=False,
)
def q109_time_split_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/eval split with a 2-day embargo gap before the
    2024-01-25 eval cutoff (operators/ordering.py:
    time_split_with_embargo, M88) — the purged-boundary rule of
    time-series evaluation, summarized per split. Secondary registry;
    oracle-gated by tests/test_extra_queries.py."""
    from ..operators.ordering import time_split_with_embargo

    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    lab = time_split_with_embargo(
        ev, "ts", eval_start_epoch_s=1_706_140_800, embargo_s=172_800
    )
    return lab.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "q152_last_touch_attribution",
    r"""
    WITH conv AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    tch AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'click'
    ),
    j AS (
      SELECT c.event_id AS cid, t.event_id AS tid, t.ts AS tts
      FROM conv c JOIN tch t ON t.user_id = c.user_id
       AND (t.ts < c.ts OR (t.ts = c.ts AND t.event_id < c.event_id))
       AND t.ts >= c.ts - INTERVAL 24 HOURS
    ),
    best AS (SELECT cid, max(tts) AS bts FROM j GROUP BY cid),
    att AS (
      SELECT j.cid, CAST(max(j.tid) AS BIGINT) AS touch_id
      FROM j JOIN best ON j.cid = best.cid AND j.tts = best.bts
      GROUP BY j.cid
    )
    SELECT c.event_id, c.user_id,
           CAST(floor(epoch(c.ts)) AS BIGINT) AS ts_s,
           CAST(round(c.value * 100) AS BIGINT) AS value_cents,
           a.touch_id,
           CAST(floor(epoch(c.ts)) - floor(epoch(b.bts)) AS BIGINT)
             AS touch_gap_s
    FROM conv c
    LEFT JOIN att a ON a.cid = c.event_id
    LEFT JOIN best b ON b.cid = c.event_id
    """,
)
def q152_last_touch_attribution(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution (operators/events_analytics.py:
    last_touch_attribution, M127): most recent prior click per
    purchase within 24h, lexicographic (ts, id) order under ties. The
    Spark plan is ONE user-partitioned window stack; the oracle is the
    join+argmax formulation — deliberately different shapes so frame
    off-by-ones can't cancel. Driver window r6 via PRIMARY_ROTATION."""
    from ..operators.events_analytics import last_touch_attribution

    return last_touch_attribution(_t(spark, sf_dir, "events"))


@query(
    "q153_frequent_paths",
    r"""
    WITH seq AS (
      SELECT event_type AS s1,
             lead(event_type, 1) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS s2,
             lead(event_type, 2) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS s3
      FROM events
    )
    SELECT s1 AS step_1, s2 AS step_2, s3 AS step_3,
           CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE s3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n DESC, step_1, step_2, step_3
    LIMIT 25
    """,
)
def q153_frequent_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 most frequent 3-step event-type paths (operators/
    events_analytics.py:frequent_paths, M128) — the k-step
    generalization of the q13 directly-follows graph, counted with one
    user-partitioned lead-window stack and a path-key shuffle bounded
    by |types|^3. Driver window r6 via PRIMARY_ROTATION."""
    from ..operators.events_analytics import frequent_paths

    return frequent_paths(_t(spark, sf_dir, "events"), k=25, depth=3)


@query(
    "q158_conformance_fitness",
    r"""
    WITH trans AS (
      SELECT user_id, event_type AS a,
             lead(event_type, 1) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS b
      FROM events
    ),
    tt AS (SELECT user_id, a, b FROM trans WHERE b IS NOT NULL),
    model AS (
      SELECT a, b FROM tt GROUP BY a, b HAVING count(*) >= 10
    )
    SELECT t.user_id,
           CAST(count(*) AS BIGINT) AS n_transitions,
           CAST(sum(CASE WHEN m.a IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_conforming,
           CAST(floor(sum(CASE WHEN m.a IS NOT NULL THEN 1 ELSE 0 END)
                      * 1000000.0 / count(*)) AS BIGINT)
             AS fitness_micro
    FROM tt t LEFT JOIN model m ON m.a = t.a AND m.b = t.b
    GROUP BY t.user_id
    """,
)
def q158_conformance_fitness(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """DFG conformance fitness per case (operators/events_analytics.py:
    conformance_fitness, M138): mine the min-support directly-follows
    model from the log, score each case's transition conformance — the
    frequency-model token-replay approximation. One case-partitioned
    lead window + a broadcast |types|^2 model join. Driver window r6
    via PRIMARY_ROTATION."""
    from ..operators.events_analytics import conformance_fitness

    return conformance_fitness(_t(spark, sf_dir, "events"),
                               min_support=10)


@query(
    "q159_variant_table",
    r"""
    WITH ranked AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    pref AS (SELECT * FROM ranked WHERE rn <= 5),
    per_case AS (
      SELECT user_id,
             string_agg(event_type, ',' ORDER BY rn) AS variant,
             CAST(count(*) AS BIGINT) AS n_events
      FROM pref GROUP BY user_id
    )
    SELECT variant, CAST(count(*) AS BIGINT) AS n_cases,
           CAST(sum(n_events) AS BIGINT) AS n_events
    FROM per_case GROUP BY variant
    ORDER BY n_cases DESC, variant
    LIMIT 25
    """,
)
def q159_variant_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 journey-prefix variants (operators/events_analytics.py:
    variant_table, M139): cases grouped by their first-5-event type
    sequence — the classic process-mining variant table on the event
    stream. Driver window r6 via PRIMARY_ROTATION."""
    from ..operators.events_analytics import variant_table

    return variant_table(_t(spark, sf_dir, "events"), k=25,
                         prefix_len=5)
