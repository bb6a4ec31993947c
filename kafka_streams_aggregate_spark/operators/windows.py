"""Window-function-based operators: top-k per group, sessionization.

All pure built-in window expressions — single shuffle on the partition
key, whole-stage codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame, group_cols: list[str], order_by: list[Column], k: int
) -> DataFrame:
    """Top-k rows per group. ``order_by`` must be a *total* order within
    each group (include a unique tiebreaker) or results are
    nondeterministic. row_number + filter: Spark pushes the k-limit into
    the window sort at runtime (WindowGroupLimit), so this does not
    materialize full sorted groups."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .drop("_rank")
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event of the same key exceeds ``gap_seconds``.

    lag + conditional cumsum over one keyed window — the batch analog
    of streaming ``session_window`` (SURVEY.md §2.3 "Sessionization").
    Adds a ``session_id`` column (0-based per key).
    """
    order_cols = [F.col(ts_col)] + (
        [F.col(order_tiebreak)] if order_tiebreak else []
    )
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    prev_ts = F.lag(ts_col).over(w)
    new_session = (
        prev_ts.isNull()
        | (F.col(ts_col).cast("long") - prev_ts.cast("long") > gap_seconds)
    ).cast("long")
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
        - 1,
    )
