"""Round-16 registrations: the staged batch-2 queue (Kuiper
two-sample, exact 1-D Wasserstein) graduating to driver-verified
queries, plus this round's fresh registrations as they land.

Every query wraps an operator that staged with unit tests and a
pre-validated cross-engine oracle text (tests/test_r16_stage2.py and
the fresh tests/test_r16_*.py files); oracle SQL is single-sourced
here (view-based — the parity tests import these constants and CREATE
the driver's view names over the sf0.001 parquet, the r15 pattern).

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

# Shared per-nation monthly-revenue epoch split (cents) — the
# q_fligner_policello / q_cucconi input: X = even-numbered years,
# Y = odd. Cents are fine for both staged statistics: Kuiper is
# count-only and Wasserstein is LINEAR in the value (no n-scaled
# squares — the round-14 unit rule does not bite; w1 budget
# documented in operators/stats.py:wasserstein_1d).
_MONTHLY_X_SQL = """
    base AS (
        SELECT g, t, v, (t // 12) % 2 = 0 AS in_x FROM (
            SELECT CAST(c.c_nationkey AS BIGINT) AS g,
                   CAST((year(o.o_orderdate) - 1992) * 12
                        + month(o.o_orderdate) - 1 AS BIGINT) AS t,
                   CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS v
            FROM orders o
            JOIN customer c
              ON c.c_custkey = o.o_custkey
            GROUP BY 1, 2
        )
    ),
    cells AS (
        SELECT g, v,
               CAST(SUM(CASE WHEN in_x THEN 1 ELSE 0 END) AS BIGINT)
                   AS cx,
               CAST(SUM(CASE WHEN in_x THEN 0 ELSE 1 END) AS BIGINT)
                   AS cy
        FROM base GROUP BY g, v
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


def _monthly_epoch_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _monthly_revenue(spark, sf_dir).select(
        "g", "t", "v", F.expr("(t div 12) % 2 = 0").alias("in_x")
    )


# --------------------------------------------------------------------------
# Staged batch 2: distribution-shift pair (operators/stats.py;
# tests/test_r16_stage2.py — hand pins + sf0.001 parity pre-validated)
# --------------------------------------------------------------------------

KUIPER_ORACLE = (
    "    WITH "
    + _MONTHLY_X_SQL
    + """,
    cum AS (
        SELECT g,
               CAST(SUM(cx) OVER (PARTITION BY g ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS i,
               CAST(SUM(cy) OVER (PARTITION BY g ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS j,
               CAST(SUM(cx) OVER (PARTITION BY g) AS BIGINT) AS m,
               CAST(SUM(cy) OVER (PARTITION BY g) AS BIGINT) AS n
        FROM cells
    ),
    agg AS (
        SELECT g, CAST(MAX(m) AS BIGINT) AS m,
               CAST(MAX(n) AS BIGINT) AS n,
               CAST(MAX(n * i - m * j) AS BIGINT) AS dp,
               CAST(MAX(m * j - n * i) AS BIGINT) AS dm
        FROM cum GROUP BY g
    )
    SELECT g AS group_key, m, n,
           CAST(greatest(dp, 0) AS BIGINT) AS dplus_num,
           CAST(greatest(dm, 0) AS BIGINT) AS dminus_num,
           CASE WHEN m > 0 AND n > 0 THEN
                CAST((1000000 * (greatest(dp, 0) + greatest(dm, 0)))
                     // (m * n) AS BIGINT) END AS v_ppm
    FROM agg
"""
)


@register(
    "q_kuiper",
    oracle=KUIPER_ORACLE,
    doc=(
        "Kuiper two-sample test per nation on the even/odd-year "
        "monthly-revenue split: V = D+ + D- on cross-multiplied "
        "merged-cell ECDFs — catches the symmetric tail swap KS "
        "halves (X={1,4}/Y={2,3} has KS D = 1/2 but V = 1 exactly). "
        "One groupBy to cells, one cumulative window, one aggregate; "
        "all exact integers. tests/test_r16_stage2.py (staged r16 "
        "batch 2, graduated same-round per the r14 precedent)."
    ),
    tags=("stats", "nonparametric", "distribution-shift", "exact-integer"),
)
def q_kuiper(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.stats import (
        kuiper_two_sample,
    )

    return kuiper_two_sample(
        _monthly_epoch_split(spark, sf_dir), "g", "in_x", "v"
    )


WASSERSTEIN_ORACLE = (
    "    WITH "
    + _MONTHLY_X_SQL
    + """,
    cum AS (
        SELECT g, v,
               CAST(SUM(cx) OVER (PARTITION BY g ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS i,
               CAST(SUM(cy) OVER (PARTITION BY g ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS j,
               lead(v) OVER (PARTITION BY g ORDER BY v) AS vn,
               CAST(SUM(cx) OVER (PARTITION BY g) AS BIGINT) AS m,
               CAST(SUM(cy) OVER (PARTITION BY g) AS BIGINT) AS n
        FROM cells
    ),
    agg AS (
        SELECT g, CAST(MAX(m) AS BIGINT) AS m,
               CAST(MAX(n) AS BIGINT) AS n,
               SUM(CASE WHEN vn IS NOT NULL THEN
                   (vn - v) * CAST(abs(n * i - m * j) AS HUGEINT)
                   ELSE 0 END) AS w1
        FROM cum GROUP BY g
    )
    SELECT g AS group_key, m, n,
           CAST(w1 AS BIGINT) AS w1_scaled,
           CASE WHEN m > 0 AND n > 0 THEN
                CAST((1000 * w1) // (CAST(m AS HUGEINT) * n) AS BIGINT)
           END AS w1_milli
    FROM agg
"""
)


@register(
    "q_wasserstein_drift",
    oracle=WASSERSTEIN_ORACLE,
    doc=(
        "Exact 1-D Wasserstein-1 distance per nation on the same "
        "epoch split — the drift MAGNITUDE in cents the ks/kuiper/TVD "
        "tests can't give: w1_scaled = sum over support gaps of "
        "(v_next - v)*|n*i - m*j| = W1*m*n, exact integers under the "
        "bounded-group budget (a pure shift by 5 gives W1 = 5 "
        "exactly). tests/test_r16_stage2.py (staged r16 batch 2, "
        "graduated same-round)."
    ),
    tags=("stats", "distribution-shift", "drift", "exact-integer"),
)
def q_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_aggregate_spark.operators.stats import wasserstein_1d

    return wasserstein_1d(
        _monthly_epoch_split(spark, sf_dir), "g", "in_x", "v"
    )
