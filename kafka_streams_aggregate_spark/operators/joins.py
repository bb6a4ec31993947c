"""Join operators beyond plain equi-joins: as-of and range joins.

The reference uses no joins at all (SURVEY.md §2.3) — these are part of
the engine's extended relational surface. Spark has no native as-of or
range join, so both are expressed as compositions of built-ins that
Catalyst can still optimize (SURVEY.md §2.3 row "Joins — semi/anti/
theta/range/as-of").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_order: str,
    right_order: str,
    right_value_cols: list[str],
    strict: bool = True,
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join: for each left row, attach the right row with the
    greatest ``right_order`` <= (or < when strict) the left row's
    ``left_order``, within the same ``on`` key.

    Spark-first shape — union + ordered window, NOT a per-group pandas
    merge_asof: one shuffle on (key), sort by order column, then
    ``last(value, ignorenulls)`` over the preceding frame. Scales
    linearly with input and inherits AQE skew handling; a pandas
    fallback would serialize every group through Python.

    The two order columns must be directly comparable (same type).
    """
    lo, ro = F.col(left_order), F.col(right_order)

    l_tagged = left.withColumn("_side", F.lit(1)).withColumn("_ord", lo)
    r_tagged = right.withColumn("_side", F.lit(0)).withColumn("_ord", ro)

    # Align schemas for the union: left rows carry null right-values and
    # vice versa; unionByName with allowMissingColumns fills the gaps.
    r_sel = r_tagged.select(
        F.col(on),
        "_side",
        "_ord",
        *[F.col(c).alias(f"{c}{suffix}") for c in right_value_cols],
    )
    l_sel = l_tagged.select(*left.columns, "_side", "_ord")
    unioned = l_sel.unionByName(r_sel, allowMissingColumns=True)

    # Right rows sort before left rows at equal _ord when strict
    # (side 0 < 1 with side ascending => right first at ties, so a
    # non-strict match at equality is visible to `last` only if we order
    # right rows first; strict puts left first instead).
    order_cols = [F.col("_ord").asc(), F.col("_side").asc() if not strict else F.col("_side").desc()]
    w = (
        Window.partitionBy(on)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    value_cols = [f"{c}{suffix}" for c in right_value_cols]
    filled = unioned.select(
        "*",
        *[
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"_f_{c}")
            for c in value_cols
        ],
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *left.columns,
            *[F.col(f"_f_{c}").alias(c) for c in value_cols],
        )
    )


def range_join_buckets(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
) -> DataFrame:
    """Range join: facts.value in [ranges.lo, ranges.hi).

    The small ranges side is broadcast, so the non-equi condition is
    evaluated as a BroadcastNestedLoopJoin — the right physical plan
    when ranges is a dimension (O(|facts| * |ranges|) with |ranges|
    tiny). For two large sides, bucketize both on a common grid and
    equi-join on bucket id first (not needed for the current surface).
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(ranges), cond, how)
