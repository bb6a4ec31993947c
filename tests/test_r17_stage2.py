"""Round-17 staging, batch 2 — Mood scale test and Conover
squared-ranks scale test, GRADUATED same-round as q_mood_scale /
q_conover_scale (queries/round16.py — the r14/r15 precedent). Oracle
texts single-sourced from the registration module.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

from kafka_streams_aggregate_spark.queries.round16 import (  # noqa: E402
    CONOVER_ORACLE,
    MOODSCALE_ORACLE,
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


def test_mood_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import mood_scale_test

    # X = {1,4} (the tails), Y = {2,3}: doubled ranks 2,4,6,8, scores
    # (r2-5)^2 = 9,1,1,9; T = 18, S1 = 20, S2 = 164 -> z2 = 3 exactly
    rows = [("g", True, 1), ("g", True, 4), ("g", False, 2), ("g", False, 3)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = mood_scale_test(df, "g", "in_x", "v").collect()
    assert r["t_stat"] == 18
    assert r["z2_ppm"] == 3_000_000

    # all values tied: every score equal -> NULL
    rows = [("t", True, 5), ("t", True, 5), ("t", False, 5), ("t", False, 5)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = mood_scale_test(df, "g", "in_x", "v").collect()
    assert r["z2_ppm"] is None


def test_mood_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import mood_scale_test

    got = mood_scale_test(_monthly_x(spark), "g", "in_x", "v").toPandas()
    _cmp(got, _duck(MOODSCALE_ORACLE), ["group_key"])


def test_conover_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        conover_squared_ranks,
    )

    # X = {0,10} dev 5,5; Y = {4,6} dev 1,1 (same means -> pure scale):
    # common-scale D: X 20,20; Y 4,4; doubled midranks 3,3 / 7,7;
    # scores 49,49 / 9,9: T = 98 -> z2 = 3 exactly
    rows = [("g", True, 0), ("g", True, 10), ("g", False, 4), ("g", False, 6)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = conover_squared_ranks(df, "g", "in_x", "v").collect()
    assert r["t_stat"] == 98
    assert r["z2_ppm"] == 3_000_000

    # location shift with equal spread: devs identical -> all scores
    # tie -> NULL (ansari/mood would NOT be null here — the point of
    # Conover is location-invariance)
    rows = [("h", True, 100), ("h", True, 102),
            ("h", False, 0), ("h", False, 2)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = conover_squared_ranks(df, "g", "in_x", "v").collect()
    assert r["z2_ppm"] is None


def test_conover_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        conover_squared_ranks,
    )

    got = conover_squared_ranks(
        _monthly_x(spark), "g", "in_x", "v"
    ).toPandas()
    _cmp(got, _duck(CONOVER_ORACLE), ["group_key"])
