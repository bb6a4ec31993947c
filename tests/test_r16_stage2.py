"""Round-16 staging, batch 2 — Kuiper two-sample and exact 1-D
Wasserstein distance (operators/stats.py), GRADUATED same-round as
q_kuiper / q_wasserstein_drift (queries/round16.py). Oracle texts are
single-sourced from the registration module (the r15 pattern): _duck()
creates the driver's view names over the sf0.001 parquet.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

from kafka_streams_aggregate_spark.queries.round16 import (  # noqa: E402
    KUIPER_ORACLE,
    WASSERSTEIN_ORACLE,
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


def test_kuiper_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        kuiper_two_sample,
    )

    got = kuiper_two_sample(_monthly_x(spark), "g", "in_x", "v").toPandas()
    _cmp(got, _duck(KUIPER_ORACLE), ["group_key"])


def test_kuiper_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        kuiper_two_sample,
    )

    # complete separation X={1,2}, Y={3,4}: D+ = 1, D- = 0 -> V = 1
    rows = [("g", True, 1), ("g", True, 2), ("g", False, 3), ("g", False, 4)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = kuiper_two_sample(df, "g", "in_x", "v").collect()
    assert (r["dplus_num"], r["dminus_num"]) == (4, 0)
    assert r["v_ppm"] == 1_000_000

    # symmetric tail swap X={1,4}, Y={2,3}: KS D = 1/2 but V = 1
    # (D+ = 1/2 at v=1, D- = 1/2 at v=3 — Kuiper adds what KS maxes)
    rows = [("h", True, 1), ("h", True, 4), ("h", False, 2), ("h", False, 3)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = kuiper_two_sample(df, "g", "in_x", "v").collect()
    assert (r["dplus_num"], r["dminus_num"]) == (2, 2)
    assert r["v_ppm"] == 1_000_000


def test_wasserstein_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import wasserstein_1d

    got = wasserstein_1d(_monthly_x(spark), "g", "in_x", "v").toPandas()
    _cmp(got, _duck(WASSERSTEIN_ORACLE), ["group_key"])


def test_wasserstein_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import wasserstein_1d

    # pure shift by 5: W1 = 5 exactly (w1_scaled = 5 * m * n = 20)
    rows = [("g", True, 0), ("g", True, 10), ("g", False, 5), ("g", False, 15)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = wasserstein_1d(df, "g", "in_x", "v").collect()
    assert r["w1_scaled"] == 20
    assert r["w1_milli"] == 5_000

    # identical samples: W1 = 0
    rows = [("h", True, 3), ("h", True, 7), ("h", False, 3), ("h", False, 7)]
    df = spark.createDataFrame(rows, "g string, in_x boolean, v long")
    [r] = wasserstein_1d(df, "g", "in_x", "v").collect()
    assert r["w1_scaled"] == 0 and r["w1_milli"] == 0
