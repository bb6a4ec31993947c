"""Brown one-step-ahead backtest — pre-validation for the round-10
registration queue (operators/pandas_ops.py:brown_backtest).

The oracle's recursive CTE carries (s1, s2) AND scores each step's
pre-update forecast; floor(|err|)-then-sum keeps the aggregates exact
int64 (a float sum would be order-dependent). Registration-ready
oracle text in BACKTEST_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

BACKTEST_ORACLE = """
    WITH RECURSIVE ordered AS (
        SELECT user_id, CAST(value AS DOUBLE) AS v,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM read_parquet('{sf}/events.parquet')
    ),
    r AS (
        SELECT user_id, rn, v AS s1, v AS s2, CAST(NULL AS DOUBLE) AS err
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.user_id, o.rn,
               0.5 * o.v + 0.5 * r.s1,
               0.5 * (0.5 * o.v + 0.5 * r.s1) + 0.5 * r.s2,
               o.v - ((2 * r.s1 - r.s2) + (r.s1 - r.s2))
        FROM r JOIN ordered o
          ON o.user_id = r.user_id AND o.rn = r.rn + 1
    )
    SELECT user_id,
           CAST(COUNT(err) AS BIGINT) AS n_forecasts,
           CAST(SUM(CAST(floor(abs(err)) AS BIGINT)) AS BIGINT)
               AS sum_abs_err_floor,
           CAST(MAX(CAST(floor(abs(err)) AS BIGINT)) AS BIGINT)
               AS max_abs_err_floor
    FROM r GROUP BY user_id
    HAVING COUNT(err) > 0
"""


def test_backtest_parity_sf0001(spark):
    from kafka_streams_aggregate_spark.operators.pandas_ops import (
        brown_backtest,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    events = load_table(spark, "events", SF)
    got = (
        brown_backtest(events, "user_id", "value", "ts", "event_id")
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(BACKTEST_ORACLE.format(sf=SF))
        .df()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_backtest_hand_series(spark):
    """Constant series: after the seed, level+trend == the constant,
    every error is exactly 0. Linear ramp: Brown's forecast lags a
    known amount — check the first few errors by hand.

    Ramp v = [0, 10, 20, 30]: seed s1=s2=0.
      i=2: forecast 0, err 10 -> floor 10
      i=3 state after v=10: s1=5, s2=2.5 -> forecast (2*5-2.5)+(5-2.5)
           = 7.5+2.5 = 10, err 10 -> floor 10
      i=4 state after v=20: s1=12.5, s2=7.5 -> forecast
           (25-7.5)+(12.5-7.5) = 17.5+5 = 22.5, err 7.5 -> floor 7
    """
    from kafka_streams_aggregate_spark.operators.pandas_ops import (
        brown_backtest,
    )

    rows = [(1, i, i, 5.0) for i in range(1, 6)] + [
        (2, 1, 1, 0.0),
        (2, 2, 2, 10.0),
        (2, 3, 3, 20.0),
        (2, 4, 4, 30.0),
    ]
    df = spark.createDataFrame(rows, "k long, t long, i long, v double")
    got = {
        r["k"]: (
            r["n_forecasts"], r["sum_abs_err_floor"], r["max_abs_err_floor"]
        )
        for r in brown_backtest(df, "k", "v", "t", "i").collect()
    }
    assert got[1] == (4, 0, 0)
    assert got[2] == (3, 27, 10)
