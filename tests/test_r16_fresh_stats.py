"""Round-16 fresh queue, stats batch — Blomqvist beta, Hoover index,
quantile shape, variance ratio, Foster-Stuart records
(operators/stats.py). Oracle texts single-sourced from
queries/round16.py (the r15 pattern).
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

from kafka_streams_aggregate_spark.queries.round16 import (  # noqa: E402
    BLOMQVIST_ORACLE,
    FOSTER_ORACLE,
    HOOVER_ORACLE,
    QSHAPE_ORACLE,
    VR_ORACLE,
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


def _monthly(spark):
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
    )


# ---------------------------------------------------------------- blomqvist


def test_blomqvist_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import blomqvist_beta

    # perfect monotone: point (3,3) sits on both medians -> dropped;
    # the other 4 are all diagonal -> beta = +1
    rows = [("g", i, i) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    [r] = blomqvist_beta(df, "g", "x", "y").collect()
    assert (r["n"], r["n_on"], r["n_diag"], r["n_off"]) == (5, 1, 4, 0)
    assert r["beta_ppm"] == 1_000_000

    # perfect anti-monotone -> beta = -1
    rows = [("g", i, 6 - i) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    [r] = blomqvist_beta(df, "g", "x", "y").collect()
    assert r["beta_ppm"] == -1_000_000


def test_blomqvist_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import blomqvist_beta

    got = blomqvist_beta(_monthly(spark), "g", "t", "v").toPandas()
    _cmp(got, _duck(BLOMQVIST_ORACLE), ["group_key"])


# ------------------------------------------------------------------- hoover


def test_hoover_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import hoover_index

    # equal values -> 0; one-has-all of 4 -> 3/4
    rows = [("eq", 5), ("eq", 5), ("eq", 5)] + [
        ("uneq", 0), ("uneq", 0), ("uneq", 0), ("uneq", 10)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["g"]: r for r in (
        hoover_index(df, "g", "v")
        .withColumnRenamed("group_key", "g")
        .collect()
    )}
    assert out["eq"]["hoover_ppm"] == 0
    assert out["uneq"]["hoover_ppm"] == 750_000
    # non-positive total -> NULL, never a throw
    neg = spark.createDataFrame([("z", -1), ("z", 1)], "g string, v long")
    [r] = hoover_index(neg, "g", "v").collect()
    assert r["hoover_ppm"] is None


def test_hoover_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import hoover_index
    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF).select(
        F.col("o_orderpriority").alias("g"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("v"),
    )
    got = hoover_index(orders, "g", "v").toPandas()
    _cmp(got, _duck(HOOVER_ORACLE), ["group_key"])


# ------------------------------------------------------------------- shape


def test_quantile_shape_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import quantile_shape

    # v = 1..8: q1=2 q2=4 q3=6 (ceil ranks 2/4/6), octiles = 1..7
    rows = [("g", i) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "g string, v long")
    [r] = quantile_shape(df, "g", "v").collect()
    assert (r["q1"], r["q2"], r["q3"]) == (2, 4, 6)
    assert r["bowley_ppm"] == 0          # symmetric
    assert r["moors_ppm"] == 1_000_000   # uniform: (2+2)/4
    assert r["qcd_ppm"] == 500_000       # (6-2)/(6+2)

    # constant group: all quantiles equal -> every denominator 0,
    # except qcd (q3+q1 = 2v > 0) -> 0
    rows = [("c", 7)] * 5
    df = spark.createDataFrame(rows, "g string, v long")
    [r] = quantile_shape(df, "g", "v").collect()
    assert r["bowley_ppm"] is None and r["moors_ppm"] is None
    assert r["qcd_ppm"] == 0


def test_quantile_shape_parity(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import quantile_shape
    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF).select(
        F.col("o_orderpriority").alias("g"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("v"),
    )
    got = quantile_shape(orders, "g", "v").toPandas()
    _cmp(got, _duck(QSHAPE_ORACLE), ["group_key"])


# ---------------------------------------------------------- variance ratio


def test_variance_ratio_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import variance_ratio

    # perfectly mean-reverting alternation: every 2-period diff is 0
    # -> VR = 0 exactly; a gapped month drops only its own lags
    rows = [("g", t, t % 2) for t in range(6)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = variance_ratio(df, "g", "t", "v").collect()
    assert (r["n1"], r["n2"]) == (5, 4)
    assert r["vr_ppm"] == 0

    # constant series: var1 = 0 -> NULL (never a throw)
    rows = [("c", t, 9) for t in range(5)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = variance_ratio(df, "g", "t", "v").collect()
    assert r["vr_ppm"] is None

    # gap: t = 0,1,2,4,5 -> r1 missing at the 2->4 step; the only
    # row-lag-2 pair spanning exactly 2 months is (0,2) — the pairs
    # straddling the gap span 3 months and drop
    rows = [("h", t, t * t) for t in (0, 1, 2, 4, 5)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = variance_ratio(df, "g", "t", "v").collect()
    assert (r["n1"], r["n2"]) == (3, 1)


def test_variance_ratio_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import variance_ratio

    got = variance_ratio(_monthly(spark), "g", "t", "v").toPandas()
    _cmp(got, _duck(VR_ORACLE), ["group_key"])


# ----------------------------------------------------------- foster-stuart


def test_foster_stuart_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import foster_stuart

    # 5,6,7,3: records up at 6 and 7, down at 3; first point is neither
    rows = [("g", 0, 5), ("g", 1, 6), ("g", 2, 7), ("g", 3, 3)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = foster_stuart(df, "g", "t", "v").collect()
    assert (r["n_up_records"], r["n_low_records"]) == (2, 1)
    assert (r["d_stat"], r["s_stat"]) == (1, 3)

    # strictly rising: every later point an upper record
    rows = [("m", t, t) for t in range(5)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = foster_stuart(df, "g", "t", "v").collect()
    assert (r["n_up_records"], r["n_low_records"], r["d_stat"]) == (4, 0, 4)


def test_foster_stuart_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import foster_stuart

    got = foster_stuart(_monthly(spark), "g", "t", "v").toPandas()
    _cmp(got, _duck(FOSTER_ORACLE), ["group_key"])
