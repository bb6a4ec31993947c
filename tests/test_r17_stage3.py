"""Round-17 staging, batch 3 — Lepage joint location-scale test
(operators/stats.py). GRADUATED same-round as q_lepage per the
r14/r15/r16 precedent; the oracle is single-sourced in
queries/round16.py (LEPAGE_ORACLE) and imported here.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from kafka_streams_aggregate_spark.queries.round16 import (  # noqa: E402
    LEPAGE_ORACLE,
)

SF = "/root/testdata/sf0.001"


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


def test_lepage_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import lepage_test

    # pure location shift X={1,2}, Y={3,4}: the Wilcoxon component
    # equals the tie-free MW z2 (2.4e6) and the AB component is 0
    # (symmetric fold scores are identical across samples)
    rows = [("g", True, 1), ("g", True, 2), ("g", False, 3), ("g", False, 4)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = lepage_test(df, "g", "in_x", "v").collect()
    assert r["z2w_ppm"] == 2_400_000
    assert r["z2ab_ppm"] == 0
    assert r["lepage_milli"] == 2_400

    # pure scale: X = tails {1,4}, Y = middle {2,3}: W component 0
    # (rank sums equal), AB component positive
    rows = [("s", True, 1), ("s", True, 4), ("s", False, 2), ("s", False, 3)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = lepage_test(df, "g", "in_x", "v").collect()
    assert r["z2w_ppm"] == 0
    assert r["z2ab_ppm"] > 0

    # all tied: both score populations constant -> NULLs
    rows = [("t", True, 5), ("t", True, 5), ("t", False, 5), ("t", False, 5)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = lepage_test(df, "g", "in_x", "v").collect()
    assert r["z2w_ppm"] is None and r["lepage_milli"] is None


def test_lepage_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import lepage_test

    got = lepage_test(_monthly_x(spark), "g", "in_x", "v").toPandas()
    _cmp(got, _duck(LEPAGE_ORACLE), ["group_key"])
