"""Round-14 fresh queue, batch 2 — RSI (SMA variant) and maximum
drawdown over per-nation monthly revenue (operators/stats.py).
Registration-ready oracle texts in RSI_ORACLE / DRAWDOWN_ORACLE.
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

RSI_ORACLE = (
    "    WITH "
    + _MONTHLY
    + """,
    d AS (
        SELECT g, t,
               v - lag(v) OVER (PARTITION BY g ORDER BY t) AS diff,
               t - lag(t) OVER (PARTITION BY g ORDER BY t) = 1 AS step_ok
        FROM base
        QUALIFY diff IS NOT NULL
    ),
    framed AS (
        SELECT g, t,
               CAST(SUM(CASE WHEN diff > 0 THEN diff ELSE 0 END)
                    OVER w AS BIGINT) AS sum_gain,
               CAST(SUM(CASE WHEN diff < 0 THEN -diff ELSE 0 END)
                    OVER w AS BIGINT) AS sum_loss,
               COUNT(*) OVER w AS cnt,
               SUM(CASE WHEN step_ok THEN 0 ELSE 1 END) OVER w AS gaps,
               MAX(t) OVER w - MIN(t) OVER w AS span
        FROM d
        WINDOW w AS (PARTITION BY g ORDER BY t
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT g AS group_key, t, sum_gain, sum_loss,
           CASE WHEN sum_gain + sum_loss > 0 THEN
                CAST((1000000 * sum_gain) // (sum_gain + sum_loss)
                     AS BIGINT) END AS rsi_ppm
    FROM framed
    WHERE cnt = 14 AND gaps = 0 AND span = 13
"""
)

DRAWDOWN_ORACLE = (
    "    WITH "
    + _MONTHLY
    + """,
    dd AS (
        SELECT g, t,
               CAST(MAX(v) OVER w AS BIGINT) AS peak,
               CAST(MAX(v) OVER w - v AS BIGINT) AS dd
        FROM base
        WINDOW w AS (PARTITION BY g ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    best AS (
        SELECT g, t, peak, dd,
               row_number() OVER (PARTITION BY g
                   ORDER BY dd DESC, t ASC) AS rk
        FROM dd
    ),
    nrow AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY g)
    SELECT nrow.g AS group_key, n,
           dd AS max_drawdown, t AS t_at_max, peak AS peak_at_trough,
           CASE WHEN peak > 0 THEN
                CAST((1000000 * dd) // peak AS BIGINT) END AS dd_ppm
    FROM nrow JOIN best ON best.g = nrow.g AND best.rk = 1
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


def test_rsi_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import rsi_sma

    got = rsi_sma(_monthly(spark), "g", "t", "v", period=14).toPandas()
    _cmp(got, _duck(RSI_ORACLE), ["group_key", "t"])


def test_rsi_hand_values(spark):
    """period=2: rising series -> 1e6, falling -> 0, mixed 1,3,2 ->
    gain 2 / loss 1 = 666666. A month gap poisons exactly the windows
    whose diffs touch it."""
    from kafka_streams_aggregate_spark.operators.stats import rsi_sma

    rows = [("g", 1, 1), ("g", 2, 2), ("g", 3, 3)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    out = {r["t"]: r["rsi_ppm"]
           for r in rsi_sma(df, "g", "t", "v", period=2).collect()}
    assert out == {3: 1_000_000}

    rows2 = [("g", 1, 3), ("g", 2, 2), ("g", 3, 1)]
    df2 = spark.createDataFrame(rows2, "g string, t long, v long")
    out2 = {r["t"]: r["rsi_ppm"]
            for r in rsi_sma(df2, "g", "t", "v", period=2).collect()}
    assert out2 == {3: 0}

    rows3 = [("g", 1, 1), ("g", 2, 3), ("g", 3, 2)]
    df3 = spark.createDataFrame(rows3, "g string, t long, v long")
    out3 = {r["t"]: r["rsi_ppm"]
            for r in rsi_sma(df3, "g", "t", "v", period=2).collect()}
    assert out3 == {3: 666_666}

    # gap at t=3: the t=4 diff spans the gap -> its windows dropped
    rows4 = [("g", 1, 1), ("g", 2, 2), ("g", 4, 3), ("g", 5, 4)]
    df4 = spark.createDataFrame(rows4, "g string, t long, v long")
    out4 = {r["t"]: r["rsi_ppm"]
            for r in rsi_sma(df4, "g", "t", "v", period=2).collect()}
    assert out4 == {}  # every 2-window touches the gapped diff


def test_drawdown_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import max_drawdown

    got = max_drawdown(_monthly(spark), "g", "t", "v").toPandas()
    _cmp(got, _duck(DRAWDOWN_ORACLE), ["group_key"])


def test_drawdown_hand_values(spark):
    """10,5,8,3: running peak stays 10, dd = 0,5,2,7 -> max 7 at t=4
    against peak 10 = 700000 ppm. Monotone series: max_dd = 0 at the
    first row (earliest-t tiebreak)."""
    from kafka_streams_aggregate_spark.operators.stats import max_drawdown

    rows = [("g", 1, 10), ("g", 2, 5), ("g", 3, 8), ("g", 4, 3)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = max_drawdown(df, "g", "t", "v").collect()
    assert (r["max_drawdown"], r["t_at_max"], r["peak_at_trough"]) == (
        7, 4, 10,
    )
    assert r["dd_ppm"] == 700_000

    up = [("h", 1, 1), ("h", 2, 2), ("h", 3, 3)]
    df2 = spark.createDataFrame(up, "g string, t long, v long")
    [r] = max_drawdown(df2, "g", "t", "v").collect()
    assert (r["max_drawdown"], r["t_at_max"], r["dd_ppm"]) == (0, 1, 0)
