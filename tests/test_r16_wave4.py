"""Round-16 wave 4 — Rousseeuw-Croux robust scale, X-bar/R control
chart, AD-weighted two-sample distance (operators/stats.py). Oracle
texts single-sourced from queries/round16.py.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

from kafka_streams_aggregate_spark.queries.round16 import (  # noqa: E402
    AD2S_ORACLE,
    ROBUST_SCALE_ORACLE,
    XBAR_ORACLE,
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


def _monthly(spark, epoch=False):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF)
    out = (
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
    if epoch:
        out = out.select(
            "g", "t", "v", F.expr("(t div 12) % 2 = 0").alias("in_x")
        )
    return out


# ------------------------------------------------------------ robust scale


def test_robust_scale_hand(spark):
    """Brute-force references: xs=[1,3,7,20] -> (sn, qn) = (17, 6);
    xs=[2,2,5,9,14] -> (7, 3). k = C(n div 2 + 1, 2)."""
    from kafka_streams_aggregate_spark.operators.stats import (
        robust_scale_pairs,
    )

    rows = [("a", v) for v in (1, 3, 7, 20)] + [
        ("b", v) for v in (2, 2, 5, 9, 14)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["group_key"]: r for r in robust_scale_pairs(
        df, "g", "v").collect()}
    assert (out["a"]["sn_raw"], out["a"]["qn_raw"]) == (17, 6)
    assert (out["a"]["n"], out["a"]["k_qn"]) == (4, 3)
    assert (out["b"]["sn_raw"], out["b"]["qn_raw"]) == (7, 3)
    assert (out["b"]["n"], out["b"]["k_qn"]) == (5, 3)


def test_robust_scale_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        robust_scale_pairs,
    )

    got = robust_scale_pairs(_monthly(spark), "g", "v").toPandas()
    _cmp(got, _duck(ROBUST_SCALE_ORACLE), ["group_key"])


# ------------------------------------------------------------------ x-bar


def test_xbar_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import xbar_r_chart

    # 4 quarters of 3 months: three in-control around 10 +- 1, one
    # spiked subgroup mean far above; range within subgroups = 2
    rows = []
    for sub, vals in enumerate(
        [(9, 10, 11), (10, 11, 9), (11, 9, 10), (50, 51, 49)]
    ):
        for j, v in enumerate(vals):
            rows.append(("g", sub * 3 + j, v))
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = xbar_r_chart(df, "g", "t", "v", subgroup=3).collect()
    assert r["n_subgroups"] == 4
    assert r["rbar_milli"] == 2000
    assert (r["ooc_high"], r["ooc_low"]) == (1, 3)

    # an incomplete trailing quarter is gated out; a group with no
    # complete quarter still emits a row (drop-reporting)
    rows = [("h", t, 5) for t in (0, 1)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = xbar_r_chart(df, "g", "t", "v", subgroup=3).collect()
    assert r["n_subgroups"] == 0 and r["rbar_milli"] is None


def test_xbar_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import xbar_r_chart

    got = xbar_r_chart(_monthly(spark), "g", "t", "v", subgroup=3).toPandas()
    _cmp(got, _duck(XBAR_ORACLE), ["group_key"])


# ------------------------------------------------------- anderson-darling


def test_ad_hand(spark):
    """Complete separation X={1,2}, Y={3,4}: three interior cells give
    floor(4e6/3) + 4e6 + floor(4e6/3) = 6666666, ad_ppm = 1666666."""
    from kafka_streams_aggregate_spark.operators.stats import (
        anderson_darling_2s,
    )

    rows = [("g", True, 1), ("g", True, 2), ("g", False, 3), ("g", False, 4)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = anderson_darling_2s(df, "g", "in_x", "v").collect()
    assert (r["m"], r["n"]) == (2, 2)
    assert r["ad_scaled"] == 6_666_666
    assert r["ad_ppm"] == 1_666_666

    # identical samples: every (mj*nn - m*bj) = 0 -> AD = 0
    rows = [("h", True, 5), ("h", False, 5), ("h", True, 9), ("h", False, 9)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = anderson_darling_2s(df, "g", "in_x", "v").collect()
    assert r["ad_scaled"] == 0 and r["ad_ppm"] == 0


def test_ad_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        anderson_darling_2s,
    )

    got = anderson_darling_2s(
        _monthly(spark, epoch=True), "g", "in_x", "v"
    ).toPandas()
    _cmp(got, _duck(AD2S_ORACLE), ["group_key"])
