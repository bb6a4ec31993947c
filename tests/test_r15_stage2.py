"""Round-15 staging, batch 2 — seasonal Sen slope and seasonal-naive
WAPE/bias (operators/stats.py). Registration-ready oracle texts in
SEN_ORACLE / WAPE_ORACLE; planned inputs are the per-nation monthly
revenue series (cents are fine — no squares of n-scaled terms here).
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

_MONTHLY = """
    base AS (
        SELECT CAST(c.c_nationkey AS BIGINT) AS g,
               CAST((year(o.o_orderdate) - 1992) * 12
                    + month(o.o_orderdate) - 1 AS BIGINT) AS t,
               CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS v
        FROM read_parquet('{sf}/orders.parquet') o
        JOIN read_parquet('{sf}/customer.parquet') c
          ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    )
"""

SEN_ORACLE = (
    "    WITH "
    + _MONTHLY
    + """,
    tagged AS (SELECT g, t, v, t % 12 AS season FROM base),
    slopes AS (
        SELECT a.g, a.season, a.t AS ti, b.t AS tj,
               CAST(b.v - a.v AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS s
        FROM tagged a
        JOIN tagged b ON b.g = a.g AND b.season = a.season AND b.t > a.t
    ),
    nrow AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_points
             FROM base GROUP BY g),
    picked AS (
        SELECT g, CAST(cnt AS BIGINT) AS n_pairs, s AS sen_slope
        FROM (
            SELECT g, s,
                   row_number() OVER (PARTITION BY g
                       ORDER BY s, season, ti, tj) AS rn,
                   COUNT(*) OVER (PARTITION BY g) AS cnt
            FROM slopes
        )
        WHERE rn = (cnt + 1) // 2
    )
    SELECT nrow.g AS group_key, n_points, n_pairs, sen_slope
    FROM nrow LEFT JOIN picked ON picked.g = nrow.g
"""
)

WAPE_ORACLE = (
    "    WITH "
    + _MONTHLY
    + """,
    lagged AS (
        SELECT g, t, v AS y,
               lag(v, 12) OVER (PARTITION BY g ORDER BY t) AS yhat,
               t - lag(t, 12) OVER (PARTITION BY g ORDER BY t) = 12
                   AS step_ok
        FROM base
        QUALIFY yhat IS NOT NULL AND step_ok
    ),
    agg AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n_eval,
               CAST(SUM(abs(y - yhat)) AS BIGINT) AS sum_abs_err,
               CAST(SUM(abs(y)) AS BIGINT) AS sum_abs_y,
               CAST(SUM(y - yhat) AS BIGINT) AS sum_err
        FROM lagged GROUP BY g
    )
    SELECT g AS group_key, n_eval, sum_abs_err, sum_abs_y,
           CASE WHEN sum_abs_y > 0 THEN
                CAST((1000000 * sum_abs_err) // sum_abs_y AS BIGINT) END
               AS wape_ppm,
           CASE WHEN sum_abs_y > 0 THEN
                CAST((1000000 * sum_err) // sum_abs_y AS BIGINT) END
               AS bias_ppm
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
        return con.sql(sql.format(sf=SF)).df()
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


def test_seasonal_sen_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        seasonal_sen_slope,
    )

    got = seasonal_sen_slope(_monthly(spark), "g", "t", "v",
                             period=12).toPandas()
    _cmp(got, _duck(SEN_ORACLE), ["group_key"])


def test_seasonal_sen_hand_values(spark):
    """Two seasons over two periods with different within-season
    slopes: season-0 pair slope (40-10)/2 = 15.0, season-1 pair
    slope (22-20)/2 = 1.0; lower median of {1.0, 15.0} = 1.0. A
    group with a single point per season has no pairs -> NULL."""
    from kafka_streams_aggregate_spark.operators.stats import (
        seasonal_sen_slope,
    )

    rows = [("g", 0, 10), ("g", 1, 20), ("g", 2, 40), ("g", 3, 22)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = seasonal_sen_slope(df, "g", "t", "v", period=2).collect()
    assert (r["n_points"], r["n_pairs"]) == (4, 2)
    assert r["sen_slope"] == 1.0

    single = [("h", 0, 5), ("h", 1, 6)]
    df2 = spark.createDataFrame(single, "g string, t long, v long")
    [r] = seasonal_sen_slope(df2, "g", "t", "v", period=2).collect()
    assert r["n_pairs"] is None and r["sen_slope"] is None


def test_wape_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        forecast_wape_bias,
    )

    got = forecast_wape_bias(_monthly(spark), "g", "t", "v",
                             period=12).toPandas()
    _cmp(got, _duck(WAPE_ORACLE), ["group_key"])


def test_wape_hand_values(spark):
    """period=2: y = 10,20,14,26 -> eval points t=2 (y=14 vs 10) and
    t=3 (y=26 vs 20): |e| = 4+6 = 10, sum|y| = 40, wape = 250000;
    signed errors +4+6 = +10 -> bias = +250000 (systematic growth).
    A gap at the lag distance drops the point."""
    from kafka_streams_aggregate_spark.operators.stats import (
        forecast_wape_bias,
    )

    rows = [("g", 0, 10), ("g", 1, 20), ("g", 2, 14), ("g", 3, 26)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = forecast_wape_bias(df, "g", "t", "v", period=2).collect()
    assert (r["n_eval"], r["sum_abs_err"], r["sum_abs_y"]) == (2, 10, 40)
    assert r["wape_ppm"] == 250_000 and r["bias_ppm"] == 250_000

    gapped = [("h", 0, 10), ("h", 1, 20), ("h", 3, 26)]
    df2 = spark.createDataFrame(gapped, "g string, t long, v long")
    out = forecast_wape_bias(df2, "g", "t", "v", period=2).collect()
    assert out == []  # t=3's lag-2 row is t=0: steps 3 != 2 -> dropped
