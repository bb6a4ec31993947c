"""Kaplan-Meier survival — pre-validation for the round-11
registration queue (operators/stats.py:kaplan_meier).

Subjects: customers per nation; lifetime = days between first and
last order; censoring = odd custkey (synthetic but deterministic —
exercises the at-risk bookkeeping censored-only times must NOT emit
steps for). S is a sequential two-IEEE-op fold over death times, so
the recursive-CTE oracle is BIT-equal (hex pin). Recursion depth =
distinct death times per group (scoped). Registration-ready oracle
text in KM_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

KM_ORACLE = """
    WITH RECURSIVE life AS (
        SELECT CAST(c.c_nationkey AS BIGINT) AS g,
               CAST(datediff('day',
                    MIN(CAST(o.o_orderdate AS DATE)),
                    MAX(CAST(o.o_orderdate AS DATE))) AS BIGINT) AS t,
               CAST(c.c_custkey % 2 AS BIGINT) AS e
        FROM read_parquet('{sf}/customer.parquet') c
        JOIN read_parquet('{sf}/orders.parquet') o
          ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey, c.c_custkey
    ),
    per_t AS (
        SELECT g, t, CAST(COUNT(*) AS BIGINT) AS n_at_t,
               CAST(SUM(e) AS BIGINT) AS d
        FROM life GROUP BY g, t
    ),
    risk AS (
        SELECT g, t, d,
               CAST(SUM(n_at_t) OVER (PARTITION BY g)
                    - SUM(n_at_t) OVER (
                        PARTITION BY g ORDER BY t
                        ROWS UNBOUNDED PRECEDING)
                    + n_at_t AS BIGINT) AS n_risk
        FROM per_t
    ),
    deaths AS (
        SELECT g, t, d, n_risk,
               CAST(row_number() OVER (
                   PARTITION BY g ORDER BY t) AS BIGINT) AS rn
        FROM risk WHERE d > 0
    ),
    r AS (
        SELECT g, CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS t,
               CAST(0 AS BIGINT) AS n_risk, CAST(0 AS BIGINT) AS d,
               CAST(1.0 AS DOUBLE) AS s
        FROM (SELECT DISTINCT g FROM deaths)
        UNION ALL
        SELECT dd.g, dd.rn, dd.t, dd.n_risk, dd.d,
               r.s * (CAST(dd.n_risk - dd.d AS DOUBLE)
                      / CAST(dd.n_risk AS DOUBLE))
        FROM r JOIN deaths dd ON dd.g = r.g AND dd.rn = r.rn + 1
    )
    SELECT g AS group_key, t, n_risk, d, s AS survival
    FROM r WHERE rn >= 1
"""


def _life(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    cust = load_table(spark, "customer", SF)
    orders = load_table(spark, "orders", SF)
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(
            F.datediff(
                F.max(F.col("o_orderdate").cast("date")),
                F.min(F.col("o_orderdate").cast("date")),
            )
            .cast("bigint")
            .alias("t")
        )
        .select(
            "c_nationkey",
            "t",
            (F.col("c_custkey") % 2).cast("bigint").alias("e"),
        )
    )


def test_km_parity_bit_equal(spark):
    from kafka_streams_aggregate_spark.operators.stats import kaplan_meier

    got = (
        kaplan_meier(_life(spark), "c_nationkey", "t", "e")
        .toPandas()
        .sort_values(["group_key", "t"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(KM_ORACLE.format(sf=SF))
        .df()
        .sort_values(["group_key", "t"])
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    assert [v.hex() for v in got["survival"]] == [
        v.hex() for v in exp["survival"]
    ]


def test_km_hand_curve(spark):
    """5 subjects: deaths at t=1 (n=5) and t=3 (n=2), censored at 2
    (x2) and 4: S(1) = 4/5, S(3) = 4/5 * 1/2 = 2/5. Censoring times
    emit NO step rows, and the censored-at-2 pair leaves the risk
    set before t=3."""
    from kafka_streams_aggregate_spark.operators.stats import kaplan_meier

    rows = [
        (1, 1, 1),  # death at 1
        (1, 2, 0), (1, 2, 0),  # censored at 2
        (1, 3, 1),  # death at 3
        (1, 4, 0),  # censored at 4
    ]
    df = spark.createDataFrame(rows, "g long, t long, e long")
    got = {
        r["t"]: (r["n_risk"], r["d"], r["survival"])
        for r in kaplan_meier(df, "g", "t", "e").collect()
    }
    assert got == {1: (5, 1, 0.8), 3: (2, 1, 0.8 * 0.5)}
