"""Nelson–Aalen cumulative hazard — pre-validation for the round-11
registration queue (operators/stats.py:nelson_aalen).

Kaplan–Meier's additive twin on the same lifetime construction
(customers per nation, censoring = odd custkey); the running hazard is
a sequential one-divide-one-add fold, so the scoped recursive-CTE
oracle is BIT-equal (hex pin). Registration-ready oracle text in
NA_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

NA_ORACLE = """
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
               CAST(0.0 AS DOUBLE) AS h
        FROM (SELECT DISTINCT g FROM deaths)
        UNION ALL
        SELECT dd.g, dd.rn, dd.t, dd.n_risk, dd.d,
               r.h + (CAST(dd.d AS DOUBLE) / CAST(dd.n_risk AS DOUBLE))
        FROM r JOIN deaths dd ON dd.g = r.g AND dd.rn = r.rn + 1
    )
    SELECT g AS group_key, t, n_risk, d, h AS hazard_cum
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
            .alias("t"),
        )
        .select(
            F.col("c_nationkey").cast("bigint").alias("g"),
            "t",
            (F.col("c_custkey") % 2).cast("bigint").alias("e"),
        )
    )


def test_nelson_aalen_parity_bit_equal(spark):
    from kafka_streams_aggregate_spark.operators.stats import nelson_aalen

    got = (
        nelson_aalen(_life(spark), "g", "t", "e")
        .toPandas()
        .sort_values(["group_key", "t"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(NA_ORACLE.format(sf=SF))
        .df()
        .sort_values(["group_key", "t"])
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])
    assert [v.hex() for v in got["hazard_cum"]] == [
        v.hex() for v in exp["hazard_cum"]
    ]


def test_nelson_aalen_hand_values(spark):
    """Times (1,d) (2,c) (3,d) over 3 subjects: H(1) = 1/3,
    H(3) = 1/3 + 1/1 (risk set at t=3 is just the last subject)."""
    from kafka_streams_aggregate_spark.operators.stats import nelson_aalen

    df = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 0), (0, 3, 1)], "g long, t long, e long"
    )
    rows = {r["t"]: r for r in nelson_aalen(df, "g", "t", "e").collect()}
    assert set(rows) == {1, 3}  # censored-only t=2 emits no step
    assert rows[1]["hazard_cum"] == 1.0 / 3.0
    assert rows[3]["hazard_cum"] == 1.0 / 3.0 + 1.0
    assert rows[3]["n_risk"] == 1
