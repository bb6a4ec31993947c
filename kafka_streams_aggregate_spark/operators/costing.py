"""Inventory costing methods beyond FIFO: periodic LIFO and perpetual
weighted-average (AVCO).

Completes the costing family started by ``q_fifo_cost_allocation``
(queries/inventory.py): the reference's fold tracks COUNTS
(KafkaStreamsInventoryCountApplication.java:67-93 keeps a per-key
running count); a warehouse closing its books also needs the VALUE of
what was consumed, and accounting standards recognize three flow
assumptions — FIFO, LIFO, weighted average. FIFO landed in round 8;
this module adds the other two, each with the execution shape that
survives 100 TB.

**Periodic LIFO** (``periodic_lifo_allocation``): all outflows are
costed at period end against the newest lots first. Same closed-form
insight as FIFO — lot *i* covers a half-open interval of the
consumption axis, just walked from the NEWEST lot backwards: with
``cum_desc_i`` the running lot-quantity sum in descending ``seq``
order, lot *i*'s consumed quantity is
``clamp(total_out - (cum_desc_i - qty_i), 0, qty_i)``. ONE
running-sum window (ordered DESC) plus row-local arithmetic, all
exact integers — no iteration, no UDF, one exchange on the product
key shared by the window and the final aggregate. (Perpetual LIFO —
re-costing at every outflow event — is genuinely order-dependent and
does NOT admit this closed form; periodic LIFO is the standard
year-end method and is what this operator computes, documented rather
than hidden.)

**Perpetual AVCO** (``avco_perpetual_fold``): the moving-average cost
re-derives the unit cost ``value / on_hand`` at every outflow, so each
step depends on the previous step's OUTPUT — the same sequential
per-series dependency as the EWMA fold (queries/extended.py
``q_ewma_smoothing``) and the reference's own INC/DEC/REP fold. Shape:
``applyInPandas`` grouped fold, one shuffle on product, O(1) state
(on-hand qty int64, inventory value float64). Cross-engine exactness:
every step is a fixed sequence of individually correctly-rounded IEEE
float64 ops (one add for IN; one divide, one multiply, one subtract
for OUT) executed in the same order by the Python fold and by a
DuckDB recursive CTE walking ``rn -> rn+1`` — IEEE 754 makes each op
deterministic, so the final values are BIT-equal (the pre-validated
oracle lives in tests/test_costing.py and graduates with the round-10
registration). Oversold outflows consume what's on hand and count the
remainder in ``unfilled_qty`` (exact integer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["periodic_lifo_allocation", "avco_perpetual_fold"]


def periodic_lifo_allocation(ledger: DataFrame) -> DataFrame:
    """Periodic LIFO cost allocation over an IN/OUT lot ledger.

    ``ledger`` columns: ``product`` (group key), ``seq`` (total order
    within product), ``side`` ('IN' | 'OUT'), ``qty`` (int > 0),
    ``unit_cents`` (int, IN rows only; ignored on OUT rows).

    Returns one row per product: ``total_in``, ``total_out``,
    ``consumed_value_cents`` (LIFO cost of goods sold),
    ``remaining_value_cents`` (ending inventory at cost). Oversold
    products (total_out > total_in) consume every lot; the clamp
    handles both tails exactly as in the FIFO twin.
    """
    outs = (
        ledger.filter(F.col("side") == "OUT")
        .groupBy("product")
        .agg(F.sum("qty").cast("bigint").alias("total_out"))
    )
    # Newest-first consumption axis: running sum in seq DESC order.
    w = (
        Window.partitionBy("product")
        .orderBy(F.col("seq").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ins = ledger.filter(F.col("side") == "IN").withColumn(
        "cum_desc", F.sum("qty").over(w)
    )
    alloc = ins.join(F.broadcast(outs), "product", "left").withColumn(
        "consumed_qty",
        F.greatest(
            F.lit(0),
            F.least(
                F.col("qty"),
                F.coalesce(F.col("total_out"), F.lit(0))
                - (F.col("cum_desc") - F.col("qty")),
            ),
        ),
    )
    return alloc.groupBy("product").agg(
        F.sum("qty").cast("bigint").alias("total_in"),
        F.max(F.coalesce(F.col("total_out"), F.lit(0)))
        .cast("bigint")
        .alias("total_out"),
        F.sum(F.col("consumed_qty") * F.col("unit_cents"))
        .cast("bigint")
        .alias("consumed_value_cents"),
        F.sum((F.col("qty") - F.col("consumed_qty")) * F.col("unit_cents"))
        .cast("bigint")
        .alias("remaining_value_cents"),
    )


def avco_perpetual_fold(ledger: DataFrame) -> DataFrame:
    """Perpetual moving-average (AVCO) costing fold.

    Same ledger contract as :func:`periodic_lifo_allocation`. Per
    product, in ``seq`` order:

    - IN:  ``value += qty * unit_cents`` (exact: integer product,
      one float64 add), ``on_hand += qty``.
    - OUT: ``unit = value / on_hand`` (one divide); ``take =
      min(qty, on_hand)``; ``t = take * unit`` (one multiply);
      ``cogs += t``; ``value -= t`` (one subtract each);
      ``on_hand -= take``; any unfillable remainder accumulates in
      ``unfilled_qty``. An OUT against an empty position is entirely
      unfilled (no divide happens — guards the 0/0).

    Returns per product: ``on_hand`` (bigint), ``unfilled_qty``
    (bigint), ``value_cents`` (double — ending inventory at moving
    average cost), ``cogs_cents`` (double). The float columns are
    bit-reproducible: the op sequence is fixed by ``seq`` order and
    every individual op is correctly rounded, independent of
    partitioning (series are independent after the one shuffle).

    Note ``value - take * (value / on_hand)`` is NOT exactly zero
    when a lot sells out (float residual survives); both the fold and
    the recursive-CTE oracle carry the identical residual forward.
    """

    # Partition kernel (mapInPandas over product-clustered, seq-sorted
    # partitions) instead of one-group-per-call applyInPandas: with
    # thousands of small product groups the per-group Arrow/pandas
    # round trip dominates the fold itself. State for the OPEN product
    # carries across Arrow batch boundaries; the float op sequence per
    # product is unchanged (bit-reproducibility argument intact).
    def fold_partition(batches):
        import pandas as pd

        cur = None  # (product, on_hand, unfilled, value, cogs)
        out = {
            "product": [], "on_hand": [], "unfilled_qty": [],
            "value_cents": [], "cogs_cents": [],
        }

        def _flush():
            if cur is not None:
                out["product"].append(cur[0])
                out["on_hand"].append(cur[1])
                out["unfilled_qty"].append(cur[2])
                out["value_cents"].append(cur[3])
                out["cogs_cents"].append(cur[4])

        for pdf in batches:
            for p, side, qty, unit_cents in zip(
                pdf["product"], pdf["side"],
                pdf["qty"].astype("int64"), pdf["unit_cents"],
            ):
                p = int(p)
                if cur is None or cur[0] != p:
                    _flush()
                    cur = (p, 0, 0, 0.0, 0.0)
                _, on_hand, unfilled, value, cogs = cur
                qty = int(qty)
                if side == "IN":
                    value = value + float(qty * int(unit_cents))
                    on_hand = on_hand + qty
                else:
                    if on_hand > 0:
                        unit = value / on_hand
                        take = qty if qty < on_hand else on_hand
                        t = take * unit
                        cogs = cogs + t
                        value = value - t
                        on_hand = on_hand - take
                        unfilled = unfilled + (qty - take)
                    else:
                        unfilled = unfilled + qty
                cur = (p, on_hand, unfilled, value, cogs)
        _flush()
        if out["product"]:
            yield pd.DataFrame(out)

    return (
        ledger.select("product", "seq", "side", "qty", "unit_cents")
        .repartition("product")
        .sortWithinPartitions("product", "seq")
        .mapInPandas(
            fold_partition,
            "product bigint, on_hand bigint, unfilled_qty bigint, "
            "value_cents double, cogs_cents double",
        )
    )


def safety_stock_stats(
    demand: DataFrame,
    product_col: str = "product",
    day_col: str = "d",
    qty_col: str = "qty",
    lead_days: int = 7,
    z_times_100: int = 164,
) -> DataFrame:
    """Safety stock + reorder point per product — the inventory-policy
    calculation that closes the reference's domain arc (counts ->
    valuation [FIFO/LIFO/AVCO] -> stockouts -> POLICY): with per-day
    demand mean m and variance s^2 over the observed days,

        safety = z * sqrt(s^2 * L),   reorder_point = m * L + safety

    (constant lead time L; z passed as an integer percentile multiple,
    164 = z 1.64 ~ 95% service, so the operator API stays rational).

    Exactness: demand quantities are exact integers, so n, sum, sum2
    are exact int64 and every float value is a SHORT chain of
    individually correctly-rounded IEEE ops spelled identically in the
    oracle — mean = sum/n (one divide), var = (n*sum2 - sum^2) /
    (n*(n-1)) (exact int numerator/denominator, one divide), sqrt is
    IEEE-exact, then one multiply per factor and one add. No
    transcendentals. Variance is over OBSERVED demand days (gap days
    are a policy choice — compose with the gap-fill operator to count
    zero days).

    Scale shape: one groupBy (product, day) then one groupBy product —
    both map-side combinable; the policy math is row-local on the
    aggregate table. Output: (product, n_days, demand_sum, demand_sum2,
    mean_daily, var_daily, safety_stock, reorder_point); products with
    a single observed day are dropped (variance undefined).
    """
    pc, dc, qc = product_col, day_col, qty_col
    daily = demand.groupBy(F.col(pc).alias("product"), F.col(dc)).agg(
        F.sum(F.col(qc).cast("bigint")).cast("bigint").alias("q")
    )
    agg = daily.groupBy("product").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("q").cast("bigint").alias("demand_sum"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("demand_sum2"),
    )
    mean_d = F.col("demand_sum").cast("double") / F.col("n_days").cast(
        "double"
    )
    var_d = (
        F.col("n_days") * F.col("demand_sum2")
        - F.col("demand_sum") * F.col("demand_sum")
    ).cast("double") / (
        F.col("n_days") * (F.col("n_days") - 1)
    ).cast("double")
    safety = (
        F.lit(z_times_100 / 100.0)
        * F.sqrt(var_d * F.lit(float(lead_days)))
    )
    return agg.where(F.col("n_days") >= 2).select(
        "product",
        "n_days",
        "demand_sum",
        "demand_sum2",
        mean_d.alias("mean_daily"),
        var_d.alias("var_daily"),
        safety.alias("safety_stock"),
        (mean_d * F.lit(float(lead_days)) + safety).alias("reorder_point"),
    )


def ss_policy_sim(
    demand: DataFrame,
    product_col: str = "product",
    day_col: str = "d",
    qty_col: str = "qty",
    s_small: int = 20,
    s_big: int = 100,
) -> DataFrame:
    """(s, S) inventory-policy simulation — the fold that TESTS the
    policy parameters ``safety_stock_stats`` recommends: walk each
    product's daily demand in day order starting from a full position
    S; each day serve what is on hand (shortfall = lost sales), then
    reorder up to S whenever the position falls below s (instant
    replenishment at the day boundary — lead time composes with the
    bitemporal/as-of operators if needed, documented rather than
    hidden).

    The recurrence is genuinely order-dependent (same family as the
    AVCO fold): state per product is three int64s (on_hand, lost,
    orders), advanced by an ``applyInPandas`` kernel in exact integer
    arithmetic — so the DuckDB recursive-CTE oracle walking rn -> rn+1
    matches cell-exactly.

    Scale shape: one shuffle on product, O(1) state, O(days) per
    product. The kernel is ``mapInPandas`` over product-clustered,
    day-sorted partitions (NOT one-group-per-call applyInPandas:
    with tens of thousands of small product groups the per-group
    Arrow/pandas round trip dominates — measured 8.7s -> the
    partition kernel at sf0.1's 20k products), carrying the open
    product's state across Arrow batch boundaries inside a
    partition. Output: (product, n_days, total_demand, lost_sales,
    n_orders, end_on_hand) — BIGINT.
    """
    pc, dc, qc = product_col, day_col, qty_col
    out_schema = (
        "product bigint, n_days bigint, total_demand bigint, "
        "lost_sales bigint, n_orders bigint, end_on_hand bigint"
    )

    # Self-contained closure (pickled by value) — verify skill rule.
    # Arrow batches can split a product's day-run, so the fold keeps
    # the open product's state between batches and flushes it only
    # when the product changes (or the partition iterator ends).
    def _fold_partition(batches):
        import pandas as _pd

        cur = None  # (product, n_days, total, lost, orders, on_hand)
        out = {
            "product": [], "n_days": [], "total_demand": [],
            "lost_sales": [], "n_orders": [], "end_on_hand": [],
        }

        def _flush():
            if cur is not None:
                out["product"].append(cur[0])
                out["n_days"].append(cur[1])
                out["total_demand"].append(cur[2])
                out["lost_sales"].append(cur[3])
                out["n_orders"].append(cur[4])
                out["end_on_hand"].append(cur[5])

        for pdf in batches:
            for p, q in zip(pdf[pc], pdf[qc]):
                p = int(p)
                q = int(q)
                if cur is None or cur[0] != p:
                    _flush()
                    cur = (p, 0, 0, 0, 0, s_big)
                _, n_days, total, lost, orders, on_hand = cur
                served = q if q <= on_hand else on_hand
                on_hand -= served
                if on_hand < s_small:
                    orders += 1
                    on_hand = s_big
                cur = (
                    p, n_days + 1, total + q,
                    lost + (q - served), orders, on_hand,
                )
        _flush()
        if out["product"]:
            yield _pd.DataFrame(out)

    daily = demand.groupBy(F.col(pc).alias(pc), F.col(dc)).agg(
        F.sum(F.col(qc).cast("bigint")).cast("bigint").alias(qc)
    )
    clustered = daily.repartition(pc).sortWithinPartitions(pc, dc)
    return clustered.mapInPandas(_fold_partition, out_schema)


def eoq_policy(
    demand: DataFrame,
    product_col: str = "product",
    qty_col: str = "qty",
    order_cost_cents: int = 5000,
    holding_cents_per_unit: int = 200,
) -> DataFrame:
    """Economic order quantity (Harris 1913 / Wilson) per product —
    the lot-size leg of the inventory-policy family (q_safety_stock
    answers WHEN to reorder, EOQ answers HOW MUCH):

        EOQ = sqrt(2 * D * S / H)

    with D total demand units, S fixed order cost, H per-unit holding
    cost (both passed as integer cents — the rational-parameter API
    rule). Exactness: D is an exact int64 sum; 2*D*S is exact int64
    (bound: D*S < 2^62 — at S = 5000 cents that is D < 9e14, far past
    any real demand), and EOQ is ONE int64->double cast + divide +
    sqrt (IEEE-exact) spelled identically cross-engine — bit-equal.
    ``orders_per_cycle`` = D/EOQ is one more IEEE divide.

    One map-side aggregate; no joins.

    Output: (product, d_total, eoq, orders_per_cycle).
    """
    pc, qc = product_col, qty_col
    d = demand.groupBy(F.col(pc).alias("product")).agg(
        F.sum(F.col(qc).cast("bigint")).cast("bigint").alias("d_total")
    )
    eoq = F.sqrt(
        (2 * F.col("d_total") * F.lit(order_cost_cents))
        .cast("double")
        / F.lit(float(holding_cents_per_unit))
    )
    return d.select(
        "product",
        "d_total",
        eoq.alias("eoq"),
        (F.col("d_total").cast("double") / eoq).alias("orders_per_cycle"),
    )


def demand_intermittency(
    demand: DataFrame,
    product_col: str = "product",
    period_col: str = "period",
    qty_col: str = "qty",
    scale: int = 1_000_000,
) -> DataFrame:
    """Syntetos–Boylan demand-pattern classification per product —
    the standard gate BEFORE choosing a forecaster (smoothing methods
    assume smooth demand; intermittent/lumpy series need Croston-
    class methods, so a pipeline classifies first):

        ADI = n_periods / n_nonzero        (average inter-demand
                                            interval)
        CV2 = var(nonzero sizes) / mean^2  (squared coefficient of
                                            variation)

    both kept EXACT: adi_ppm = (scale * n_periods) div n_nonzero and,
    with S = sum of nonzero sizes, Q = sum of squares, m = n_nonzero,

        cv2_ppm = scale * (m * Q - S * S)  div  (S * S)

    (population variance over mean² in one common-denominator form).
    The quadrant uses the published cutoffs ADI 1.32 / CV² 0.49 as
    integer cross-products (100*n_periods >= 132*n_nonzero;
    100 * (m*Q - S*S) >= 49 * S*S) — no float ever:

        smooth / erratic / intermittent / lumpy.

    Bound: scale * m * Q < 2^63 (dollars-sized demand: fine to ~1e6
    periods/product; DECIMAL(38) ladder past that). Products with no
    nonzero demand are absent (every ratio undefined).

    Shape: ONE map-side aggregate per product; no joins, no windows.
    Output: (product, n_periods, n_nonzero, adi_ppm, cv2_ppm,
    pattern).
    """
    pc, qc = product_col, qty_col
    g = (
        demand.select(
            F.col(pc).alias("product"),
            F.col(period_col).alias("period"),
            F.col(qc).cast("bigint").alias("q"),
        )
        .groupBy("product")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_periods"),
            F.sum(F.when(F.col("q") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_nonzero"),
            F.sum(F.when(F.col("q") > 0, F.col("q")).otherwise(0))
            .cast("bigint")
            .alias("s"),
            F.sum(
                F.when(F.col("q") > 0, F.col("q") * F.col("q")).otherwise(0)
            )
            .cast("bigint")
            .alias("qq"),
        )
        .where(F.col("n_nonzero") > 0)
    )
    return _intermittency_tail(g, scale)


def _intermittency_tail(g: DataFrame, scale: int) -> DataFrame:
    """Shared ADI/CV² quadrant tail over (product, n_periods,
    n_nonzero, s, qq) — integer cross-product cutoffs, no float."""
    adi_high = F.expr("100 * n_periods >= 132 * n_nonzero")
    cv2_high = F.expr("100 * (n_nonzero * qq - s * s) >= 49 * (s * s)")
    return g.select(
        "product",
        "n_periods",
        "n_nonzero",
        F.expr(f"CAST(({scale} * n_periods) div n_nonzero AS BIGINT)").alias(
            "adi_ppm"
        ),
        F.expr(
            f"CAST(({scale} * (n_nonzero * qq - s * s)) div (s * s)"
            " AS BIGINT)"
        ).alias("cv2_ppm"),
        F.when(adi_high & cv2_high, "lumpy")
        .when(adi_high, "intermittent")
        .when(cv2_high, "erratic")
        .otherwise("smooth")
        .alias("pattern"),
    )


def demand_intermittency_sparse(
    demand: DataFrame,
    product_col: str = "product",
    period_col: str = "period",
    qty_col: str = "qty",
    scale: int = 1_000_000,
) -> DataFrame:
    """GRID-FREE closed form of ``demand_intermittency`` — provably
    equal on the dense zero-filled grid the sibling takes, without
    ever materializing it: zero cells contribute NOTHING to
    n_nonzero/S/Q, and every product's ``n_periods`` in the dense
    grid is the GLOBAL distinct-period count, a 1-row aggregate
    broadcast back by cross join. So the dense prods x months
    crossJoin + left join (grid cardinality |P|*|M|) collapses to
    one aggregate over the sparse demand rows + a scalar join —
    the 100 TB shape (the r11 verdict flagged the grid builder; the
    interleaved A/B showed localCheckpoint on the shared aggregate
    is NOT the fix — recompute of the cheap codegen subtree wins —
    and this algebraic collapse removes the grid entirely,
    measured 7.0s -> ~2s at sf0.1).

    Input: sparse (product, period, q) demand — only periods a
    product actually shipped (q <= 0 rows tolerated: they count
    toward the global period set, never toward the nonzero stats,
    exactly as their zero-filled grid cells would).
    Output: identical to ``demand_intermittency`` on the dense grid
    (asserted row-for-row in tests/test_demand_patterns.py)."""
    base = demand.select(
        F.col(product_col).alias("product"),
        F.col(period_col).alias("period"),
        F.col(qty_col).cast("bigint").alias("q"),
    )
    n_periods_1row = base.agg(
        F.countDistinct("period").cast("bigint").alias("n_periods")
    )
    g = (
        base.groupBy("product")
        .agg(
            F.sum(F.when(F.col("q") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_nonzero"),
            F.sum(F.when(F.col("q") > 0, F.col("q")).otherwise(0))
            .cast("bigint")
            .alias("s"),
            F.sum(
                F.when(F.col("q") > 0, F.col("q") * F.col("q")).otherwise(0)
            )
            .cast("bigint")
            .alias("qq"),
        )
        .where(F.col("n_nonzero") > 0)
        .crossJoin(F.broadcast(n_periods_1row))
    )
    return _intermittency_tail(g, scale)


def mase_eval(
    actuals: DataFrame,
    product_col: str = "product",
    period_col: str = "period",
    qty_col: str = "qty",
    forecast_col: str = "forecast",
    season: int = 1,
    scale: int = 1_000_000,
) -> DataFrame:
    """MASE — mean absolute SCALED error per series (Hyndman &
    Koehler 2006), the scale-free forecast metric that lets error
    compare ACROSS products (MAPE divides by zero on intermittent
    demand; RMSE is unit-bound):

        MASE = MAE(forecast) / MAE(seasonal-naive)

    in the exact cross-multiplied form
        mase_ppm = (scale * sae_f * n_naive) div (sae_n * n_f)
    where sae_f = sum |q - forecast| over all periods, sae_n =
    sum |q_t - q_{t-season}| over periods with a lagged peer — both
    exact int64 sums of integer quantities; the denominator-zero case
    (a constant series — naive is perfect) reports NULL.

    Shape: one lag window per series + one aggregate on the same
    partitioning key (one exchange). Output: (product, n_f, sae_f,
    n_naive, sae_naive, mase_ppm).
    """
    pc = product_col
    base = actuals.select(
        F.col(pc).alias("product"),
        F.col(period_col).alias("period"),
        F.col(qty_col).cast("bigint").alias("q"),
        F.col(forecast_col).cast("bigint").alias("f"),
    ).withColumn("q_lag", F.lag("q", season).over(Window.partitionBy("product").orderBy("period")))
    agg = base.groupBy("product").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_f"),
        F.sum(F.abs(F.col("q") - F.col("f"))).cast("bigint").alias("sae_f"),
        F.sum(F.when(F.col("q_lag").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_naive"),
        F.sum(
            F.when(
                F.col("q_lag").isNotNull(),
                F.abs(F.col("q") - F.col("q_lag")),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("sae_naive"),
    )
    return agg.select(
        "product",
        "n_f",
        "sae_f",
        "n_naive",
        "sae_naive",
        F.when(
            (F.col("sae_naive") > 0) & (F.col("n_naive") > 0),
            F.expr(
                f"CAST(({scale} * sae_f * n_naive) div (sae_naive * n_f)"
                " AS BIGINT)"
            ),
        ).alias("mase_ppm"),
    )


def croston_forecast(
    demand: DataFrame,
    product_col: str = "product",
    period_col: str = "period",
    qty_col: str = "qty",
) -> DataFrame:
    """Croston's method (1972) — THE forecaster for INTERMITTENT
    demand, where ordinary smoothing collapses toward zero between
    demand events: smooth the nonzero demand SIZES and the
    INTER-DEMAND INTERVALS as two separate alpha=1/2 EWMA states, and
    forecast their ratio (expected demand per period). Pairs with
    ``demand_intermittency``: the classifier routes a series here
    when ADI is high.

    Convention (documented, test-pinned): ``period_col`` is a dense
    integer index (the caller's zero-filled grid); demand events at
    positions t_1 < t_2 < ... with sizes s_k; intervals i_1 = t_1 -
    min_period + 1 (distance from series start), i_k = t_k - t_{k-1};
    init z_1 = s_1, p_1 = i_1; then z_k = 0.5*s_k + 0.5*z_{k-1},
    p_k = 0.5*i_k + 0.5*p_{k-1} (the repo's bit-exact alpha=1/2 fold
    family — every step two correctly-rounded IEEE ops per state, so
    a recursive-CTE oracle executing the same sequence is BIT-equal;
    recursion depth = demand events per product, the scoped class).
    Forecast = z / p, one final IEEE divide. Products with no demand
    events are absent.

    Shape: filter to nonzero events (the sparse set — at 100 TB this
    is the whole point: state scales with EVENTS, not periods), one
    lag window for intervals, one partition-kernel fold per product.

    Output: (product, n_events, z_size, p_interval, croston_per_period).
    """
    pc = product_col
    events = (
        demand.select(
            F.col(pc).alias("product"),
            F.col(period_col).cast("bigint").alias("t"),
            F.col(qty_col).cast("bigint").alias("q"),
        )
        .withColumn("t0", F.min("t").over(Window.partitionBy("product")))
        .where(F.col("q") > 0)
        .withColumn(
            "prev_t",
            F.lag("t").over(Window.partitionBy("product").orderBy("t")),
        )
        .withColumn(
            "interval",
            F.when(
                F.col("prev_t").isNull(), F.col("t") - F.col("t0") + 1
            ).otherwise(F.col("t") - F.col("prev_t"))
            .cast("bigint"),
        )
        .select("product", "t", "q", "interval")
    )
    out_schema = (
        "product bigint, n_events bigint, z_size double, "
        "p_interval double, croston_per_period double"
    )

    # Partition kernel (the round-10 rule): one applyInPandas call per
    # product pays an Arrow round trip that DOMINATES with tens of
    # thousands of small series (measured 74.6s -> ~2s at sf0.1 / 20k
    # products). Open-series state carries across Arrow batch
    # boundaries; the float op sequence per series is unchanged, so
    # the bit-equality pins survive verbatim.
    def _fold_partition(batches):
        import pandas as _pd

        cur = None  # (product, n_events, z, p)
        out = {
            "product": [], "n_events": [], "z_size": [],
            "p_interval": [], "croston_per_period": [],
        }

        def _flush():
            if cur is not None:
                out["product"].append(cur[0])
                out["n_events"].append(cur[1])
                out["z_size"].append(cur[2])
                out["p_interval"].append(cur[3])
                out["croston_per_period"].append(cur[2] / cur[3])

        for pdf in batches:
            for prod, q, interval in zip(
                pdf["product"], pdf["q"], pdf["interval"]
            ):
                prod = int(prod)
                if cur is None or cur[0] != prod:
                    _flush()
                    cur = (prod, 1, float(q), float(interval))
                else:
                    cur = (
                        prod,
                        cur[1] + 1,
                        0.5 * q + 0.5 * cur[2],
                        0.5 * interval + 0.5 * cur[3],
                    )
        _flush()
        if out["product"]:
            yield _pd.DataFrame(
                {
                    "product": _pd.Series(out["product"], dtype="int64"),
                    "n_events": _pd.Series(out["n_events"], dtype="int64"),
                    "z_size": _pd.Series(out["z_size"], dtype="float64"),
                    "p_interval": _pd.Series(
                        out["p_interval"], dtype="float64"
                    ),
                    "croston_per_period": _pd.Series(
                        out["croston_per_period"], dtype="float64"
                    ),
                }
            )

    clustered = events.repartition("product").sortWithinPartitions(
        "product", "t"
    )
    return clustered.mapInPandas(_fold_partition, out_schema)


def newsvendor_policy(
    demand: DataFrame,
    group_col: str,
    qty_col: str,
    order_col: str,
    price_cents: int,
    cost_cents: int,
    scale: int = 1_000_000,
) -> DataFrame:
    """Newsvendor order quantity per product — the single-period
    stochastic-inventory classic completing the policy family
    (safety stock = WHEN, EOQ = HOW MUCH per cycle, (s,S) sim =
    WHAT IF, newsvendor = HOW MUCH when demand is a distribution):
    stock the smallest q with F(q) >= critical ratio
    CR = (p - c) / p (underage cost p-c vs overage cost c... the
    lost-margin/salvage-free form).

    Everything exact integer: cr_ppm = scale*(p-c) div p from the
    config cents; q_star by the repo's ceil-rank selection on the
    EMPIRICAL demand distribution — rank target ceil(cr*n/scale) =
    (cr*n + scale - 1) div scale over row_number()-ranked demand
    (total order (qty, order_col)), picked with ONE conditional min
    from the same ranked frame (no re-shuffle — the q_winsorize
    shape). One window + one aggregate."""
    if not (0 < cost_cents < price_cents):
        raise ValueError("newsvendor_policy: need 0 < cost < price")
    cr_ppm = (scale * (price_cents - cost_cents)) // price_cents
    gc = "group_key"
    w = Window.partitionBy(group_col).orderBy(qty_col, order_col)
    ranked = demand.select(
        F.col(group_col).alias(gc),
        F.col(qty_col).cast("bigint").alias("q"),
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy(group_col))
        .cast("bigint")
        .alias("n"),
    )
    return ranked.groupBy(gc).agg(
        F.max("n").cast("bigint").alias("n_periods"),
        F.lit(cr_ppm).cast("bigint").alias("cr_ppm"),
        F.min(
            F.expr(
                f"CASE WHEN rn >= ({cr_ppm} * n + {scale} - 1)"
                f" div {scale} THEN q END"
            )
        )
        .cast("bigint")
        .alias("q_star"),
        F.max("q").cast("bigint").alias("q_max"),
    )
