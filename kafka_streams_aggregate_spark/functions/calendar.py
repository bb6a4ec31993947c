"""Business-day (weekday) arithmetic in pure exact integers.

The SLA primitive (``how many working days did fulfilment take?``)
without any engine calendar functions — which matters here twice over:
Spark's ``dayofweek`` is 1=Sunday while DuckDB's DOW is 0=Sunday
(CLAUDE.md trap), and none of that machinery is needed when epoch days
admit a closed form. With 1970-01-01 a Thursday, the Monday-based
weekday of epoch day d is ``(d + 3) % 7`` and the count of weekdays in
``[0, x)`` is

    h(x) = 5 * ((x + 3) div 7) + least((x + 3) % 7, 5) - 3

(the ``+3`` aligns the week to Monday; the ``-3`` removes the three
phantom weekdays the shift prepends). Business days in ``[a, b)`` are
then ``h(b) - h(a)`` — a handful of integer ops per bound, spelled
identically in any engine (DuckDB twin: ``5*((x+3)//7) +
least((x+3)%7, 5) - 3``). Valid for epoch days >= -3 (every date from
1969-12-29 on); the floor-div is written as floor(x/7) over exact
small integers, identical to integer ``//`` for non-negative x.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def weekdays_before(epoch_day: Column) -> Column:
    """h(x): weekdays (Mon-Fri) in [epoch day 0, epoch day x)."""
    x = epoch_day.cast("bigint") + 3
    weeks = F.floor(x / 7).cast("bigint")
    return (
        F.lit(5).cast("bigint") * weeks
        + F.least(x % 7, F.lit(5).cast("bigint"))
        - 3
    ).cast("bigint")


def business_days_between(start_day: Column, end_day: Column) -> Column:
    """Weekdays in [start_day, end_day) — exact int64, negative when
    end < start. Both bounds are epoch days (the datediff rule)."""
    return (
        weekdays_before(end_day) - weekdays_before(start_day)
    ).cast("bigint")
