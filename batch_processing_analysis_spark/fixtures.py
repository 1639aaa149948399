"""Seeded ground-truth fixture generator (SURVEY §2.9 X1/X2, §5.2
ground-truth level; reference: src/preprocessing/batch_injection.py:28-238).

The reference fabricates event logs with *known* batches to prove the
pipeline rediscovers them ("prove that the technique is able to discover
batches and calculate the related waiting times and activation rules",
batch_injection.py:1-5). This module is the engine's equivalent: a pure
driver-side generator (it builds test inputs, not engine output) that
returns both the log and the planted ground truth so tests can assert
exact recovery.

Differences from the reference kept deliberately (SURVEY §7.4):
seeded RNG everywhere (the reference's random.choice is unseeded), and
timestamps are constructed directly rather than displaced, which makes
the planted batch structure an explicit invariant of the fixture.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .config import BatchType, EventLogIDs


@dataclass
class PlantedBatch:
    """Ground truth for one injected batch instance."""

    activity: str
    batch_type: str              # BatchType.parallel / task_sequential / task_concurrent
    case_ids: list[str]
    start: datetime              # batch processing start (first case start)
    resource: str


@dataclass
class InjectedLog:
    rows: list[tuple] = field(default_factory=list)
    batches: list[PlantedBatch] = field(default_factory=list)


_SCHEMA_COLS = ["case", "activity", "resource", "start", "end", "enabled"]


def _log_schema(ids: EventLogIDs) -> T.StructType:
    return T.StructType([
        T.StructField(ids.case, T.StringType()),
        T.StructField(ids.activity, T.StringType()),
        T.StructField(ids.resource, T.StringType()),
        T.StructField(ids.start_time, T.TimestampType()),
        T.StructField(ids.end_time, T.TimestampType()),
        T.StructField(ids.enabled_time, T.TimestampType()),
    ])


def inject_batches(
    n_batches: int = 6,
    batch_size: int = 4,
    batch_type: str = BatchType.parallel,
    batch_activity: str = "Approve",
    activation_weekday: int | None = None,
    activation_hour: int = 9,
    seed: int = 42,
) -> InjectedLog:
    """Build a 3-activity log (Receive -> Approve -> Archive) where every
    ``Approve`` executes in batches of exactly ``batch_size`` cases.

    Cases arrive (Receive) spread over the days before activation; the
    batch resource accumulates them and fires all ``Approve`` instances
    at the planted instant (``activation_weekday``/``activation_hour``
    when given — the activation *rule* the miner should recover).

    Shapes per ``batch_type``:
    - Parallel: identical [start, end) for every member;
    - Sequential task-based: back-to-back, next.start == prev.end;
    - Concurrent task-based: staggered overlapping intervals.
    """
    rng = random.Random(seed)
    out = InjectedLog()
    base = datetime(2024, 1, 1, tzinfo=timezone.utc)  # a Monday
    proc = timedelta(minutes=30)

    case_no = 0
    for b in range(n_batches):
        # Activation instant: weekly on the planted weekday (else daily).
        if activation_weekday is not None:
            day = base + timedelta(weeks=b)
            day += timedelta(days=(activation_weekday - day.weekday()) % 7)
        else:
            day = base + timedelta(days=b)
        # Random minute: firing exactly at :00 would make `minute=0` a
        # perfect (degenerate) separator that shadows the planted
        # weekday/hour/queue conditions in rule recovery.
        fire = day.replace(hour=activation_hour, minute=rng.randint(0, 59))

        members = []
        for i in range(batch_size):
            cid = f"c{case_no:05d}"
            case_no += 1
            members.append(cid)
            # Receive: arrival in the 48h before activation; its end is
            # the case's enablement instant for Approve.
            arrive = fire - timedelta(minutes=rng.randint(60, 48 * 60))
            r_start, r_end = arrive - timedelta(minutes=5), arrive
            out.rows.append((cid, "Receive", f"clerk{rng.randint(0, 2)}",
                             r_start, r_end, r_start))
            # Approve: the batched activity, single dedicated resource.
            if batch_type == BatchType.parallel:
                a_start, a_end = fire, fire + proc
            elif batch_type == BatchType.task_sequential:
                a_start = fire + i * proc
                a_end = a_start + proc
            else:  # task_concurrent: staggered overlap
                a_start = fire + timedelta(minutes=10 * i)
                a_end = a_start + proc
            out.rows.append((cid, batch_activity, "approver", a_start, a_end, r_end))
            # Archive: immediately after approval, non-batched resource
            # per case so no accidental batching.
            z_start = a_end + timedelta(minutes=rng.randint(1, 120))
            out.rows.append((cid, "Archive", f"archiver{case_no % 7}",
                             z_start, z_start + timedelta(minutes=2), a_end))
        out.batches.append(PlantedBatch(
            activity=batch_activity, batch_type=batch_type,
            case_ids=members, start=fire, resource="approver",
        ))
    return out


def injected_log_df(spark: SparkSession, injected: InjectedLog,
                    ids: EventLogIDs | None = None) -> DataFrame:
    """Materialize the fixture as a Spark DataFrame (with the planted
    enabled_time column, X2 — so tests can also drop it and check the
    estimator re-derives compatible values)."""
    ids = ids or EventLogIDs()
    return spark.createDataFrame(injected.rows, _log_schema(ids))
