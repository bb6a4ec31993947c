"""Fligner-Policello robust rank-order and the Cucconi joint
location-scale test (operators/stats.py) — staged as the round-16
openers, then GRADUATED same-round as q_fligner_policello / q_cucconi
(the r14 precedent: hash-green from a vanilla session before landing).
Inputs are the per-nation monthly revenue series split by YEAR PARITY
(even years = X, odd = Y — the "did the distribution shift between
epochs?" probe; group sizes ~42/42 stay far inside both operators'
DECIMAL(38,0) budgets at any SF).
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

# Oracle texts single-sourced from the registration module (the pair
# graduated same-round per the r14 precedent); _duck() creates the
# driver's view names over the sf0.001 parquet.
from kafka_streams_aggregate_spark.queries.round15 import (  # noqa: E402
    CUCCONI_ORACLE,
    FP_ORACLE,
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
