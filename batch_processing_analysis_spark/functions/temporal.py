"""Temporal scalar functions (SURVEY §2.6 F1-F6, F11).

All durations inside the engine are **long seconds** — interval types
stay at the presentation edge (SURVEY §1.4). The one correctness trap is
`day_of_week`: the reference uses pandas' Monday=0 (activation_rules.py:128)
while Spark's `dayofweek` is Sunday=1; `day_of_week_monday0` does the
shift once, everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def day_of_week_monday0(ts: Column) -> Column:
    """pandas `.dayofweek` convention: Monday=0 … Sunday=6 (F3)."""
    return (F.dayofweek(ts) + 5) % 7


def epoch_seconds(ts: Column) -> Column:
    """Timestamp → epoch seconds as long (F5). Session TZ must be UTC."""
    return F.unix_timestamp(ts)


def epoch_micros(ts: Column) -> Column:
    return F.unix_micros(ts)


def duration_seconds(end: Column, start: Column) -> Column:
    """timestamp − timestamp → long seconds (F1)."""
    return F.unix_timestamp(end) - F.unix_timestamp(start)


def duration_micros(end: Column, start: Column) -> Column:
    """Microsecond-precision duration (reference data has µs precision)."""
    return F.unix_micros(end) - F.unix_micros(start)


def add_seconds(ts: Column, seconds: Column) -> Column:
    """timestamp + duration displacement (F2)."""
    return F.timestamp_add("SECOND", seconds.cast("long"), ts)


def format_timedelta(seconds: Column) -> Column:
    """Render long seconds as pandas' `"X days HH:MM:SS"` string.

    Presentation-only (SURVEY §7.4 item 7): used by the report sink so
    golden-text diffs against the reference's output format line up
    (e.g. outputs/Production_Report.txt "8 days 03:42:45").
    """
    days = F.floor(seconds / 86400)
    rem = seconds - days * 86400
    hh = F.lpad(F.floor(rem / 3600).cast("string"), 2, "0")
    mm = F.lpad(F.floor((rem % 3600) / 60).cast("string"), 2, "0")
    ss = F.lpad((rem % 60).cast("string"), 2, "0")
    return F.concat(days.cast("string"), F.lit(" days "), hh, F.lit(":"), mm, F.lit(":"), ss)
