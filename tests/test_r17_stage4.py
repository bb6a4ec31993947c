"""Round-17 staging, batch 4 — change-point/homogeneity pair:
Alexandersson SNHT and the Buishand range test (operators/stats.py).
SNHT GRADUATED same-round as q_snht (wave 15); its oracle is
single-sourced in queries/round16.py and imported here. Buishand
stays staged as the r17 opener with its registration-ready
BUISHAND_ORACLE below.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from kafka_streams_aggregate_spark.queries.round16 import (  # noqa: E402
    SNHT_ORACLE,
)

SF = "/root/testdata/sf0.001"

_MONTHLY_K = """
    base AS (
        SELECT g, t, v // 100000 AS v FROM (
            SELECT CAST(c.c_nationkey AS BIGINT) AS g,
                   CAST((year(o.o_orderdate) - 1992) * 12
                        + month(o.o_orderdate) - 1 AS BIGINT) AS t,
                   CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS v
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY 1, 2
        )
    ),
    pre AS (
        SELECT g,
               CAST(row_number() OVER w AS BIGINT) AS k,
               CAST(SUM(v) OVER w AS BIGINT) AS pk,
               CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n,
               SUM(CAST(v AS HUGEINT)) OVER (PARTITION BY g) AS s,
               SUM(CAST(v AS HUGEINT) * v) OVER (PARTITION BY g) AS q
        FROM base
        WINDOW w AS (PARTITION BY g ORDER BY t
                     ROWS UNBOUNDED PRECEDING)
    )
"""

BUISHAND_ORACLE = (
    "    WITH "
    + _MONTHLY_K
    + """,
    agg AS (
        SELECT g, CAST(MAX(n) AS BIGINT) AS n,
               MAX(greatest(n * pk - k * s, 0)) AS dmax,
               MIN(least(n * pk - k * s, 0)) AS dmin,
               MAX(n * q - s * s) AS vn
        FROM pre GROUP BY g
    )
    SELECT g AS group_key, n,
           CASE WHEN vn > 0 THEN
                CAST((CAST(1000000 AS HUGEINT)
                      * (dmax - dmin) * (dmax - dmin) * (n - 1))
                     // (n * vn) AS BIGINT) END AS rb2_ppm
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
        for t in ("orders", "customer"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT *"
                f" FROM read_parquet('{SF}/{t}.parquet')"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def _monthly_k(spark):
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
            .alias("_c")
        )
        .select("g", "t", F.expr("_c div 100000").alias("v"))
    )


def test_snht_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import snht_test

    # x = [0, 0, 10, 10]: midpoint break. S=20, Q=200, nQ-S^2=400;
    # D = [-20, -40, -20] -> T_k_ppm = [1e6, 3e6, 1e6], max at k=2
    # (check: zbar1 = -.866, T_2 = 2*.75 + 2*.75 = 3.0)
    rows = [("g", 0, 0), ("g", 1, 0), ("g", 2, 10), ("g", 3, 10)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = snht_test(df, "g", "t", "v").collect()
    assert (r["n"], r["t_max_ppm"], r["k_at_max"]) == (4, 3_000_000, 2)

    # constant series -> NULL statistic and break point
    rows = [("c", 0, 5), ("c", 1, 5), ("c", 2, 5)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = snht_test(df, "g", "t", "v").collect()
    assert r["t_max_ppm"] is None and r["k_at_max"] is None

    # tie -> smallest k (symmetric single spike: T_1 = T_2)
    rows = [("s", 0, 0), ("s", 1, 6), ("s", 2, 0)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = snht_test(df, "g", "t", "v").collect()
    assert r["k_at_max"] == 1


def test_buishand_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import buishand_range

    # same midpoint break: maxD (clamped through 0) = 0, minD = -40
    # -> rb2_ppm = 1e6*1600*3 div (4*400) = 3e6
    # (check: R = 40/4 = 10, s^2 = 400/12, (R/s)^2 = 100*12/400 = 3)
    rows = [("g", 0, 0), ("g", 1, 0), ("g", 2, 10), ("g", 3, 10)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = buishand_range(df, "g", "t", "v").collect()
    assert (r["n"], r["rb2_ppm"]) == (4, 3_000_000)

    # constant -> NULL
    rows = [("c", 0, 5), ("c", 1, 5)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = buishand_range(df, "g", "t", "v").collect()
    assert r["rb2_ppm"] is None


def test_snht_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import snht_test

    got = snht_test(_monthly_k(spark), "g", "t", "v").toPandas()
    _cmp(got, _duck(SNHT_ORACLE), ["group_key"])


def test_buishand_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import buishand_range

    got = buishand_range(_monthly_k(spark), "g", "t", "v").toPandas()
    _cmp(got, _duck(BUISHAND_ORACLE), ["group_key"])
