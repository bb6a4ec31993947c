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


def point_in_polygon(
    points: DataFrame,
    polygon: list[tuple[int, int]],
    id_col: str = "id",
    x_col: str = "px",
    y_col: str = "py",
) -> DataFrame:
    """Point-in-polygon containment via the crossing-number (ray cast)
    rule, computed ENTIRELY in exact integer arithmetic — the spatial
    predicate the grid-join family (q_spatial_grid_join,
    q_interval_overlap_join) doesn't cover: arbitrary (possibly
    non-convex) polygon membership.

    For each directed edge (x1,y1)->(x2,y2) the horizontal ray from
    point (px,py) crosses iff the edge spans py vertically
    ((y1 <= py) != (y2 <= py)) and the point sits strictly on the
    crossing side, decided by the integer orientation determinant
    d = (x2-x1)*(py-y1) - (px-x1)*(y2-y1) — no division, no floats: the
    parity (inside = odd crossings) is bit-identical in any engine.
    Points exactly ON an edge get whatever parity the determinant's
    zero handling gives — identically on both sides, so parity remains
    cell-exact (flag them separately if the application cares).

    Scale shape: the polygon is a CONSTANT broadcast of V rows, the
    fan-out is points x V (bounded, contribution-grid pattern), one
    groupBy on the point id. 100 TB of points stream through one
    codegen'd stage + one map-side-combined aggregate.

    Output: (id, px, py, n_crossings, inside) — BIGINT (inside 0/1).
    """
    spark = points.sparkSession
    edges = [
        (x1, y1, x2, y2)
        for (x1, y1), (x2, y2) in zip(polygon, polygon[1:] + polygon[:1])
    ]
    edf = spark.createDataFrame(
        edges, "x1 long, y1 long, x2 long, y2 long"
    )
    p = points.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("bigint").alias("px"),
        F.col(y_col).cast("bigint").alias("py"),
    )
    joined = p.crossJoin(F.broadcast(edf))
    spans = (F.col("y1") <= F.col("py")) != (F.col("y2") <= F.col("py"))
    det = (F.col("x2") - F.col("x1")) * (F.col("py") - F.col("y1")) - (
        F.col("px") - F.col("x1")
    ) * (F.col("y2") - F.col("y1"))
    crossed = F.when(
        spans
        & (
            ((F.col("y2") > F.col("y1")) & (det > 0))
            | ((F.col("y2") < F.col("y1")) & (det < 0))
        ),
        1,
    ).otherwise(0)
    agg = joined.groupBy("id", "px", "py").agg(
        F.sum(crossed).cast("bigint").alias("n_crossings")
    )
    return agg.select(
        "id",
        "px",
        "py",
        "n_crossings",
        (F.col("n_crossings") % 2).cast("bigint").alias("inside"),
    )


def bitemporal_asof(
    facts: DataFrame,
    probes: DataFrame,
    key_col: str = "key",
    valid_col: str = "valid_us",
    tx_col: str = "tx",
    tie_col: str = "fact_id",
) -> DataFrame:
    """Bitemporal as-of lookup (SQL:2011 application-time + system-time
    semantics): for each probe (tx_cutoff, valid_us) and each key, the
    governing fact is the latest-by-valid-time fact among those the
    system KNEW by tx_cutoff (tx <= tx_cutoff) that had already become
    valid (valid_us <= probe valid_us) — "what did we believe at
    transaction time T the state at valid time V was?". The
    one-dimensional ``asof_join`` above answers only the valid-time
    axis; corrections that arrived later (higher tx) must be invisible
    to earlier tx_cutoffs, which this two-predicate argmax enforces.

    ``probes`` is a SMALL probe grid (broadcast); facts fan out x
    |probes| (bounded, contribution-grid pattern) and one window per
    (key, probe) picks the argmax with ``tie_col`` as the total-order
    tiebreaker. All comparisons on exact int64 microseconds /
    versions. At scale prefer probe grids << fact count (they multiply
    the shuffle); for probe-per-row workloads use the sort-merge
    ``asof_join`` per tx slice instead.

    Output: probe columns + key + every fact column of the governing
    fact, one row per (probe, key) that has any governing fact.
    """
    from pyspark.sql import Window

    p = probes.select(
        F.col("tx_cutoff").cast("bigint").alias("_p_tx"),
        F.col(valid_col).cast("bigint").alias("_p_valid"),
    )
    fanned = facts.crossJoin(F.broadcast(p)).where(
        (F.col(tx_col) <= F.col("_p_tx"))
        & (F.col(valid_col) <= F.col("_p_valid"))
    )
    # Valid-time ties break by system time FIRST (a later correction —
    # higher tx, same valid_us — must win over any earlier fact
    # regardless of fact_id), then tie_col for a total order.
    w = Window.partitionBy(key_col, "_p_tx", "_p_valid").orderBy(
        F.col(valid_col).desc(), F.col(tx_col).desc(), F.col(tie_col).desc()
    )
    return (
        fanned.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .withColumnRenamed("_p_tx", "tx_cutoff")
        .withColumnRenamed("_p_valid", "probe_valid_us")
    )


def linear_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    cents_col: str = "cents",
) -> DataFrame:
    """Linear (equal-split) marketing attribution in EXACT cents —
    every purchase's value splits equally across ALL of the user's
    preceding clicks, with the integer remainder assigned to the
    EARLIEST click (the Hamilton rule again: allocations must sum to
    the purchase exactly; naive v/k floats leak cents).

    First- and last-touch attribution are the rank-1 / rank-k
    degenerate cases of the same fanned join, so this operator is the
    general member of the family (the as-of join covers last-touch).

    Per purchase p with k preceding clicks ordered by (ts, id):
    every click gets ``cents div k``; the first additionally gets
    ``cents mod k``. Purchases with no preceding click are dropped
    (unattributable — report them upstream).

    Shape: one user-keyed inequality join (per-user fan-out is
    clicks x purchases, bounded by per-user activity — the classic
    attribution-window cap applies upstream at scale), one window
    per purchase for (k, rank), one aggregate per click. All exact
    int64.

    Output: (click_id, user, n_purchases, attributed_cents).
    """
    uc, tc, ic, cc = user_col, ts_col, id_col, cents_col
    c = clicks.select(
        F.col(uc).alias("user"),
        F.col(ic).alias("click_id"),
        F.col(tc).alias("click_ts"),
    )
    p = purchases.select(
        F.col(uc).alias("user"),
        F.col(ic).alias("purchase_id"),
        F.col(tc).alias("purchase_ts"),
        F.col(cc).cast("bigint").alias("cents"),
    )
    fanned = c.join(p, "user").where(
        F.col("click_ts") <= F.col("purchase_ts")
    )
    wp = Window.partitionBy("purchase_id")
    wr = Window.partitionBy("purchase_id").orderBy(
        F.col("click_ts").asc(), F.col("click_id").asc()
    )
    alloc = (
        fanned.withColumn("k", F.count(F.lit(1)).over(wp).cast("bigint"))
        .withColumn("rk", F.row_number().over(wr).cast("bigint"))
        .withColumn(
            "share",
            (
                F.expr("cents div k")
                + F.when(
                    F.col("rk") == 1, F.expr("cents % k")
                ).otherwise(F.lit(0))
            ).cast("bigint"),
        )
    )
    return alloc.groupBy("click_id", "user").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.sum("share").cast("bigint").alias("attributed_cents"),
    )
