"""Round-15 registrations: the staged batch-2 queue (seasonal Sen
slope, seasonal-naive WAPE/bias) graduating to driver-verified
queries, plus this round's fresh registrations as they land.

Every query wraps an operator that staged with unit tests and a
pre-validated cross-engine oracle text (tests/test_r15_stage2.py and
the fresh tests/test_r15_*.py files); oracle SQL is the test file's
registration-ready text with ``read_parquet`` refs swapped for the
driver's pre-registered view names. Spark derivations mirror the
parity tests verbatim, so the driver's hash check re-verifies exactly
what the tests pinned at sf0.001.

Reference scope note: the reference app (dturanski/
kafka-streams-aggregate, KafkaStreamsInventoryCountApplication.java:
69-85) has no batch-analytics surface — all rows here are
absent-category build-out per SURVEY §2.3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_aggregate_spark.registry import register
from kafka_streams_aggregate_spark.sources.tables import load_table

# Shared monthly-revenue rollup (cents, per nation) — the input both
# staged batch-2 statistics run on (tests/test_r15_stage2.py). Cents
# are fine here: neither statistic squares n-scaled terms (the
# round-14 unit-scaling rule does not bite).
_MONTHLY_SQL = """
    base AS (
        SELECT CAST(c.c_nationkey AS BIGINT) AS g,
               CAST((year(o.o_orderdate) - 1992) * 12
                    + month(o.o_orderdate) - 1 AS BIGINT) AS t,
               CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS v
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    )
"""


def _monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    return (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .groupBy(
            F.col("c_nationkey").cast("bigint").alias("g"),
            F.expr(
                "CAST((year(o_orderdate) - 1992) * 12"
                " + month(o_orderdate) - 1 AS BIGINT)"
            ).alias("t"),
        )
        .agg(
            F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("v")
        )
    )


# --------------------------------------------------------------------------
# Staged batch 2: seasonal trend + forecast accuracy
# (operators/stats.py; tests/test_r15_stage2.py)
# --------------------------------------------------------------------------


@register(
    "q_seasonal_sen_slope",
    oracle=(
        "    WITH "
        + _MONTHLY_SQL
        + """,
    tagged AS (SELECT g, t, v, t % 12 AS season FROM base),
    slopes AS (
        SELECT a.g, a.season, a.t AS ti, b.t AS tj,
               CAST(b.v - a.v AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS s
        FROM tagged a
        JOIN tagged b ON b.g = a.g AND b.season = a.season AND b.t > a.t
    ),
    nrow AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_points
             FROM base GROUP BY g),
    picked AS (
        SELECT g, CAST(cnt AS BIGINT) AS n_pairs, s AS sen_slope
        FROM (
            SELECT g, s,
                   row_number() OVER (PARTITION BY g
                       ORDER BY s, season, ti, tj) AS rn,
                   COUNT(*) OVER (PARTITION BY g) AS cnt
            FROM slopes
        )
        WHERE rn = (cnt + 1) // 2
    )
    SELECT nrow.g AS group_key, n_points, n_pairs, sen_slope
    FROM nrow LEFT JOIN picked ON picked.g = nrow.g
"""
    ),
    doc=(
        "Seasonal Sen slope of per-nation monthly revenue: Theil-Sen "
        "restricted to WITHIN-SEASON pairs (January compares only to "
        "Januaries) so a seasonal cycle cannot masquerade as trend; "
        "lower median by exact order-statistic selection under the "
        "total order (slope, season, ti, tj), each slope ONE IEEE "
        "divide of exact integers. Pairs = years^2 x 12 per group — "
        "tiny at any SF (the q_theil_sen discipline). "
        "tests/test_r15_stage2.py."
    ),
    tags=("stats", "timeseries", "robust", "exact-order-statistic"),
)
def q_seasonal_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.stats import (
        seasonal_sen_slope,
    )

    return seasonal_sen_slope(
        _monthly_revenue(spark, sf_dir), "g", "t", "v", period=12
    )


@register(
    "q_forecast_wape",
    oracle=(
        "    WITH "
        + _MONTHLY_SQL
        + """,
    lagged AS (
        SELECT g, t, v AS y,
               lag(v, 12) OVER (PARTITION BY g ORDER BY t) AS yhat,
               t - lag(t, 12) OVER (PARTITION BY g ORDER BY t) = 12
                   AS step_ok
        FROM base
        QUALIFY yhat IS NOT NULL AND step_ok
    ),
    agg AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n_eval,
               CAST(SUM(abs(y - yhat)) AS BIGINT) AS sum_abs_err,
               CAST(SUM(abs(y)) AS BIGINT) AS sum_abs_y,
               CAST(SUM(y - yhat) AS BIGINT) AS sum_err
        FROM lagged GROUP BY g
    )
    SELECT g AS group_key, n_eval, sum_abs_err, sum_abs_y,
           CASE WHEN sum_abs_y > 0 THEN
                CAST((1000000 * sum_abs_err) // sum_abs_y AS BIGINT) END
               AS wape_ppm,
           CASE WHEN sum_abs_y > 0 THEN
                CAST((1000000 * sum_err) // sum_abs_y AS BIGINT) END
               AS bias_ppm
    FROM agg
"""
    ),
    doc=(
        "Seasonal-naive WAPE + signed bias of per-nation monthly "
        "revenue (the two demand-forecast report numbers next to "
        "q_mase_eval): yhat_t = y_{t-12}, evaluated only where the "
        "lag steps exactly 12 indices (the contiguity rule at the "
        "lag level); WAPE = ratio of sums (immune to MAPE's small-"
        "denominator blowups), bias keeps the sign. All exact int64. "
        "tests/test_r15_stage2.py."
    ),
    tags=("stats", "forecast", "exact-integer"),
)
def q_forecast_wape(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.stats import (
        forecast_wape_bias,
    )

    return forecast_wape_bias(
        _monthly_revenue(spark, sf_dir), "g", "t", "v", period=12
    )
