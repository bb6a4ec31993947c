"""Round-16 staging, batch 1 — Fligner-Policello robust rank-order and
the Cucconi joint location-scale test (operators/stats.py).
Registration-ready oracle texts in FP_ORACLE / CUCCONI_ORACLE; planned
inputs are the per-nation monthly revenue series split by YEAR PARITY
(even years = X, odd = Y — the "did the distribution shift between
epochs?" probe; group sizes ~42/42 stay far inside both operators'
DECIMAL(38,0) budgets at any SF).
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

_MONTHLY_X = """
    base AS (
        SELECT g, t, v, (t // 12) % 2 = 0 AS in_x FROM (
            SELECT CAST(c.c_nationkey AS BIGINT) AS g,
                   CAST((year(o.o_orderdate) - 1992) * 12
                        + month(o.o_orderdate) - 1 AS BIGINT) AS t,
                   CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS v
            FROM read_parquet('{sf}/orders.parquet') o
            JOIN read_parquet('{sf}/customer.parquet') c
              ON c.c_custkey = o.o_custkey
            GROUP BY 1, 2
        )
    )
"""

FP_ORACLE = (
    "    WITH "
    + _MONTHLY_X
    + """,
    cells AS (
        SELECT g, v,
               CAST(SUM(CASE WHEN in_x THEN 1 ELSE 0 END) AS BIGINT)
                   AS cx,
               CAST(SUM(CASE WHEN in_x THEN 0 ELSE 1 END) AS BIGINT)
                   AS cy
        FROM base GROUP BY g, v
    ),
    placed AS (
        SELECT g, cx, cy,
               CAST(2 * (SUM(cy) OVER (PARTITION BY g ORDER BY v
                    ROWS UNBOUNDED PRECEDING) - cy) + cy AS BIGINT) AS p2,
               CAST(2 * (SUM(cx) OVER (PARTITION BY g ORDER BY v
                    ROWS UNBOUNDED PRECEDING) - cx) + cx AS BIGINT) AS q2
        FROM cells
    ),
    mom AS (
        SELECT g, CAST(SUM(cx) AS BIGINT) AS m,
               CAST(SUM(cy) AS BIGINT) AS n,
               CAST(SUM(cx * p2) AS BIGINT) AS sp,
               CAST(SUM(cy * q2) AS BIGINT) AS sq
        FROM placed GROUP BY g
    ),
    sc AS (
        SELECT p.g, MAX(m) AS m, MAX(n) AS n, MAX(sp) AS sp,
               MAX(sq) AS sq,
               SUM(cx * (CAST(m AS HUGEINT) * p2 - sp)
                   * (CAST(m AS HUGEINT) * p2 - sp)) AS a,
               SUM(cy * (CAST(n AS HUGEINT) * q2 - sq)
                   * (CAST(n AS HUGEINT) * q2 - sq)) AS b
        FROM placed p JOIN mom USING (g) GROUP BY p.g
    )
    SELECT g AS group_key, m, n,
           CAST(sign(sq - sp) AS BIGINT) AS sign_u,
           CASE WHEN m >= 2 AND n >= 2 AND
                a * n * n + b * m * m
                + CAST(sp AS HUGEINT) * sq * m * n > 0 THEN
                CAST((CAST(1000000 AS HUGEINT) * (sp - sq) * (sp - sq)
                      * m * m * n * n)
                     // (4 * (a * n * n + b * m * m
                         + CAST(sp AS HUGEINT) * sq * m * n))
                     AS BIGINT) END AS fp2_ppm
    FROM sc
"""
)

CUCCONI_ORACLE = (
    "    WITH "
    + _MONTHLY_X
    + """,
    ranked AS (
        SELECT g, in_x,
               CAST(row_number() OVER (PARTITION BY g ORDER BY v, t)
                    AS BIGINT) AS r,
               CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS nn
        FROM base
    ),
    agg AS (
        SELECT g, CAST(MAX(nn) AS BIGINT) AS nn,
               CAST(SUM(CASE WHEN in_x THEN 1 ELSE 0 END) AS BIGINT)
                   AS m,
               CAST(SUM(CASE WHEN in_x THEN 0 ELSE 1 END) AS BIGINT)
                   AS n,
               CAST(SUM(CASE WHEN in_x THEN 0 ELSE r * r END) AS BIGINT)
                   AS u2_sum,
               CAST(SUM(CASE WHEN in_x THEN 0
                        ELSE (nn + 1 - r) * (nn + 1 - r) END) AS BIGINT)
                   AS v2_sum
        FROM ranked GROUP BY g
    )
    SELECT g AS group_key, m, n, u2_sum, v2_sum,
           CASE WHEN m >= 2 AND n >= 2 THEN
                CAST((CAST(1000000 AS HUGEINT) * 5 * (
                    (CAST(6 AS HUGEINT) * u2_sum
                       - n * (nn + 1) * (2 * nn + 1))
                    * (CAST(6 AS HUGEINT) * u2_sum
                       - n * (nn + 1) * (2 * nn + 1))
                    * ((2 * nn + 1) * (8 * nn + 11))
                  + (CAST(6 AS HUGEINT) * v2_sum
                       - n * (nn + 1) * (2 * nn + 1))
                    * (CAST(6 AS HUGEINT) * v2_sum
                       - n * (nn + 1) * (2 * nn + 1))
                    * ((2 * nn + 1) * (8 * nn + 11))
                  - 2 * (2 * (CAST(nn AS HUGEINT) * nn - 4)
                         - (2 * nn + 1) * (8 * nn + 11))
                    * (CAST(6 AS HUGEINT) * u2_sum
                       - n * (nn + 1) * (2 * nn + 1))
                    * (CAST(6 AS HUGEINT) * v2_sum
                       - n * (nn + 1) * (2 * nn + 1))
                ))
                // (2 * (
                    (CAST((2 * nn + 1) AS HUGEINT) * (8 * nn + 11))
                    * ((2 * nn + 1) * (8 * nn + 11))
                  - (2 * (CAST(nn AS HUGEINT) * nn - 4)
                     - (2 * nn + 1) * (8 * nn + 11))
                    * (2 * (CAST(nn AS HUGEINT) * nn - 4)
                       - (2 * nn + 1) * (8 * nn + 11))
                ) * m * n * (nn + 1)) AS BIGINT) END AS c_ppm
    FROM agg
"""
)


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def _duck(sql):
    con = duckdb.connect()
    try:
        return con.sql(sql.format(sf=SF)).df()
    finally:
        con.close()


def _monthly_x(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
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
        .select("g", "t", "v", F.expr("(t div 12) % 2 = 0").alias("in_x"))
    )


def test_fligner_policello_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        fligner_policello,
    )

    got = fligner_policello(_monthly_x(spark), "g", "in_x", "v").toPandas()
    _cmp(got, _duck(FP_ORACLE), ["group_key"])


def test_fligner_policello_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        fligner_policello,
    )

    # interleaved X={1,3}, Y={2,4}: Sp=2, Sq=6, A=B=8 -> U^2 = 4/7
    rows = [("g", True, 1), ("g", True, 3), ("g", False, 2), ("g", False, 4)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = fligner_policello(df, "g", "in_x", "v").collect()
    assert (r["m"], r["n"], r["sign_u"]) == (2, 2, 1)
    assert r["fp2_ppm"] == 571_428

    # complete separation: denominator 0 -> NULL (infinite statistic)
    rows = [("h", True, 1), ("h", True, 2), ("h", False, 3), ("h", False, 4)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = fligner_policello(df, "g", "in_x", "v").collect()
    assert r["fp2_ppm"] is None


def test_cucconi_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import cucconi_test

    got = cucconi_test(_monthly_x(spark), "g", "in_x", "v", "t").toPandas()
    _cmp(got, _duck(CUCCONI_ORACLE), ["group_key"])


def test_cucconi_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import cucconi_test

    # X={1,2}, Y={3,4}: U=25, V=5, dU=60, dV=-60, D=387, r=-363
    # -> C = 864000/720000 = 1.2 exactly
    rows = [
        ("g", True, 1, 1), ("g", True, 2, 2),
        ("g", False, 3, 3), ("g", False, 4, 4),
    ]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long, id long")
    [r] = cucconi_test(df, "g", "in_x", "v", "id").collect()
    assert (r["m"], r["n"], r["u2_sum"], r["v2_sum"]) == (2, 2, 25, 5)
    assert r["c_ppm"] == 1_200_000

    # same distribution, interleaved: U and V balanced -> small C
    rows = [
        ("h", True, 1, 1), ("h", False, 2, 2),
        ("h", True, 3, 3), ("h", False, 4, 4),
    ]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long, id long")
    [r] = cucconi_test(df, "g", "in_x", "v", "id").collect()
    assert r["c_ppm"] is not None and r["c_ppm"] < 1_200_000
