"""Exact streaming task-batch detection — a custom stateful operator
(`applyInPandasWithState`) that reproduces the batch detector's chain
semantics (operators/discovery.py:detect_task_batches) on an unbounded
stream.

`stream_batch_accumulation` (eventlog_stream.py) approximates batches
with `session_window` + `approx_count_distinct`; this operator is the
*exact* twin: same pairwise classes (simultaneous / sequential /
concurrent, reference batch_detection.R:54-77), same chain-boundary
rule, exact distinct case counts.

Design (event-time, watermark-correct):

- State per (resource, activity): the buffer of not-yet-emittable
  events, held as parallel arrays (start_us, end_us, case).
- Every invocation re-sessionizes the sorted buffer with the batch
  algorithm and emits the maximal *prefix* of chains that are frozen:
  every member starts before the watermark (no on-time arrival can sort
  into or before them) and the tail can no longer be extended
  (watermark > last end + gap, so any future event fails all three
  pair classes against the chain tail).
- An event-time timeout drives emission when no new data arrives for
  the group; the timeout is re-armed at the earliest instant the head
  chain could become emittable.

Exactness holds for all on-time data (the standard watermark contract:
rows later than the watermark horizon are dropped by the engine before
reaching the operator). State is bounded by the watermark horizon —
each group holds only events newer than (watermark - horizon), same
guarantee as session_window.

Scale: state and compute are per-(resource, activity) group, hash
partitioned; the pandas hop touches only buffered events (KB-sized
process-mining groups), never the stream history.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..config import EventLogIDs

RAW_SIMULTANEOUS = "simultaneous"
RAW_SEQUENTIAL = "sequential"
RAW_CONCURRENT = "concurrent"

CHAIN_SCHEMA = T.StructType(
    [
        T.StructField("resource", T.StringType()),
        T.StructField("activity", T.StringType()),
        T.StructField("chain_start", T.TimestampType()),
        T.StructField("chain_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_cases", T.LongType()),
        T.StructField("chain_type", T.StringType()),
    ]
)

# Buffered events as parallel arrays (one state row per group).
STATE_SCHEMA = T.StructType(
    [
        T.StructField("starts", T.ArrayType(T.LongType())),
        T.StructField("ends", T.ArrayType(T.LongType())),
        T.StructField("cases", T.ArrayType(T.StringType())),
    ]
)


def _pair_class(prev_s: int, prev_e: int, s: int, e: int, gap_us: int):
    """Identical to discovery._pair_class (reference batch_detection.R:
    54-77): simultaneous / sequential-within-gap / concurrent / None."""
    if s == prev_s and e == prev_e:
        return RAW_SIMULTANEOUS
    if s >= prev_e and s - prev_e <= gap_us:
        return RAW_SEQUENTIAL
    if s < prev_e:
        return RAW_CONCURRENT
    return None


def _chains(rows: list, gap_us: int) -> list:
    """Sessionize sorted (s, e, case) rows with the batch boundary rule:
    new chain when the pair class is None or changes vs the previous
    pair. Returns [(row_slice, chain_type)] in sort order; chain_type is
    max() over member classes (the batch detector's tie-break)."""
    out = []
    cur, classes = [], []
    prev = None
    prev_cls = None
    for r in rows:
        cls = None if prev is None else _pair_class(prev[0], prev[1], r[0], r[1], gap_us)
        boundary = cls is None or (prev_cls is not None and cls != prev_cls)
        if boundary and cur:
            out.append((cur, max((c for c in classes if c), default=None)))
            cur, classes = [], []
        cur.append(r)
        classes.append(cls)
        prev, prev_cls = r, cls
    if cur:
        out.append((cur, max((c for c in classes if c), default=None)))
    return out


def _emit_prefix(rows: list, gap_us: int, wm_us: int):
    """Split the sorted buffer into (emittable chain list, kept rows,
    next timeout candidate in µs). A chain is emittable when it and all
    chains before it are frozen under the watermark."""
    emitted, kept = [], []
    blocked = False
    next_due = None
    for chain, ctype in _chains(rows, gap_us):
        last = chain[-1]
        frozen = (not blocked
                  and max(r[0] for r in chain) < wm_us
                  and wm_us > last[1] + gap_us)
        if frozen:
            emitted.append((chain, ctype))
        else:
            if not blocked:
                # Earliest instant this head chain could freeze.
                next_due = max(max(r[0] for r in chain), last[1] + gap_us) + 1
            blocked = True
            kept.extend(chain)
    return emitted, kept, next_due


def _apply(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState,
           gap_us: int) -> Iterator[pd.DataFrame]:
    resource, activity = key
    rows: list[tuple[int, int, str]] = []
    if state.exists:
        starts, ends, cases = state.get
        rows = list(zip(starts, ends, cases))
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        s_us = pdf["start_time"].astype("datetime64[us]").astype("int64")
        e_us = pdf["end_time"].astype("datetime64[us]").astype("int64")
        rows.extend(zip(s_us.tolist(), e_us.tolist(), pdf["case_id"].tolist()))
    rows.sort()
    wm_us = state.getCurrentWatermarkMs() * 1000

    emitted, kept, next_due = _emit_prefix(rows, gap_us, wm_us)

    if kept:
        state.update((
            [r[0] for r in kept], [r[1] for r in kept], [r[2] for r in kept],
        ))
        # Event-time timeouts must be strictly beyond the watermark.
        due_ms = max((next_due or 0) // 1000, state.getCurrentWatermarkMs() + 1000)
        state.setTimeoutTimestamp(due_ms)
    else:
        state.remove()

    if emitted:
        yield pd.DataFrame(
            {
                "resource": [resource] * len(emitted),
                "activity": [activity] * len(emitted),
                "chain_start": [pd.Timestamp(min(r[0] for r in c), unit="us")
                                for c, _ in emitted],
                "chain_end": [pd.Timestamp(max(r[1] for r in c), unit="us")
                              for c, _ in emitted],
                "n_events": [len(c) for c, _ in emitted],
                "n_cases": [len({r[2] for r in c}) for c, _ in emitted],
                "chain_type": [t for _, t in emitted],
            }
        )


def stream_exact_task_batches(events: DataFrame, ids: EventLogIDs,
                              gap_seconds: int = 0,
                              watermark: str = "10 minutes") -> DataFrame:
    """Streaming W1: emit each closed task-batch chain exactly once,
    with the batch detector's chain membership, raw class, and exact
    distinct-case count. Input columns follow EVENT_SCHEMA
    (eventlog_stream.py); unbatched singles emit with chain_type null
    so downstream can count them or filter them out.
    """
    gap_us = gap_seconds * 1_000_000

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        return _apply(key, pdfs, state, gap_us)

    res = F.coalesce(F.col(ids.resource), F.lit("NOT_SET"))
    return (
        events.withWatermark("start_time", watermark)
        .groupBy(res.alias("resource"), F.col(ids.activity).alias("activity"))
        .applyInPandasWithState(
            fn, CHAIN_SCHEMA, STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
