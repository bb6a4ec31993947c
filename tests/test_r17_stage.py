"""Round-17 staging — Mann-Whitney U (tie-corrected z²) and
Brunner-Munzel W², GRADUATED same-round as q_mann_whitney /
q_brunner_munzel (queries/round16.py — the r14/r15 precedent). Oracle
texts single-sourced from the registration module.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

from kafka_streams_aggregate_spark.queries.round16 import (  # noqa: E402
    BM_ORACLE,
    MWU_ORACLE,
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


def test_mwu_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import mann_whitney_u

    # complete separation X={1,2}, Y={3,4}: 2U = 0, T = 0, N = 4:
    # z2 = 3*16*4*3 / (4*60) = 2.4 -> 2400000 ppm
    rows = [("g", True, 1), ("g", True, 2), ("g", False, 3), ("g", False, 4)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = mann_whitney_u(df, "g", "in_x", "v").collect()
    assert (r["u2"], r["tie_term"]) == (0, 0)
    assert r["z2_ppm"] == 2_400_000

    # one tie: X={1,3}, Y={2,3}: 2U = 3, T = 6: z2 = 1/6
    rows = [("h", True, 1), ("h", True, 3), ("h", False, 2), ("h", False, 3)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = mann_whitney_u(df, "g", "in_x", "v").collect()
    assert (r["u2"], r["tie_term"]) == (3, 6)
    assert r["z2_ppm"] == 166_666

    # all tied: variance 0 -> NULL (never a throw)
    rows = [("t", True, 5), ("t", True, 5), ("t", False, 5)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = mann_whitney_u(df, "g", "in_x", "v").collect()
    assert r["z2_ppm"] is None


def test_mwu_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import mann_whitney_u

    got = mann_whitney_u(_monthly_x(spark), "g", "in_x", "v").toPandas()
    _cmp(got, _duck(MWU_ORACLE), ["group_key"])


def test_bm_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import brunner_munzel

    # X={1,3}, Y={2,4}: A=2, B=6, NUM=8, V1=V2=8 -> W^2 = 1 exactly
    # (matches the published rank formulation: W = (Rbar2-Rbar1)/1)
    rows = [("g", True, 1), ("g", True, 3), ("g", False, 2), ("g", False, 4)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = brunner_munzel(df, "g", "in_x", "v").collect()
    assert r["num"] == 8
    assert r["w2_ppm"] == 1_000_000

    # complete separation: placement variance 0 both sides -> NULL
    # with the direction kept in num
    rows = [("s", True, 1), ("s", True, 2), ("s", False, 8), ("s", False, 9)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = brunner_munzel(df, "g", "in_x", "v").collect()
    assert r["w2_ppm"] is None and r["num"] > 0

    # all tied -> NULL, num = 0
    rows = [("t", True, 5), ("t", True, 5), ("t", False, 5), ("t", False, 5)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = brunner_munzel(df, "g", "in_x", "v").collect()
    assert r["w2_ppm"] is None and r["num"] == 0


def test_bm_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import brunner_munzel

    got = brunner_munzel(_monthly_x(spark), "g", "in_x", "v").toPandas()
    _cmp(got, _duck(BM_ORACLE), ["group_key"])
