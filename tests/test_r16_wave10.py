"""Round-16 wave 10 — pinball loss and sMAPE of the seasonal-naive
forecast. Oracle texts single-sourced from queries/round16.py.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

from kafka_streams_aggregate_spark.queries.round16 import (  # noqa: E402
    PINBALL_ORACLE,
    SMAPE_ORACLE,
    q_pinball_loss,
    q_smape_eval,
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


def test_pinball_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        pinball_loss_eval,
    )

    # period 1 for a compact pin: y = [10, 14, 7]: e = +4 then -7.
    # q=0.9: 900*4 + 100*7 = 4300 total; mean = 4300 div 2 = 2150
    rows = [("g", 0, 10), ("g", 1, 14), ("g", 2, 7)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = pinball_loss_eval(df, "g", "t", "v", period=1,
                            q_milli=900).collect()
    assert r["n_eval"] == 2
    assert r["loss1000_total"] == 4300
    assert r["mean_loss_milli"] == 2150

    # under-forecasting (e > 0) hurts 9x more than over at q=0.9
    rows_up = [("u", 0, 10), ("u", 1, 20)]    # e = +10 -> 9000
    rows_dn = [("d", 0, 20), ("d", 1, 10)]    # e = -10 -> 1000
    df = spark.createDataFrame(rows_up + rows_dn, "g string, t long, v long")
    out = {r["group_key"]: r for r in pinball_loss_eval(
        df, "g", "t", "v", period=1, q_milli=900).collect()}
    assert out["u"]["loss1000_total"] == 9 * out["d"]["loss1000_total"]


def test_pinball_parity(spark):
    got = q_pinball_loss(spark, SF).toPandas()
    _cmp(got, _duck(PINBALL_ORACLE), ["group_key"])


def test_smape_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import smape_eval

    # y=[10, 30]: point = 2000*20 div 40 = 1000 (sMAPE 100% of the
    # symmetric scale); gapped months drop their own lag only
    rows = [("g", 0, 10), ("g", 1, 30)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = smape_eval(df, "g", "t", "v", period=1).collect()
    assert (r["n_eval"], r["n_dropped"]) == (1, 0)
    assert r["smape_milli"] == 1000

    # a zero-sum point (y = -yh) is dropped AND counted
    rows = [("z", 0, -5), ("z", 1, 5), ("z", 2, 5)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = smape_eval(df, "g", "t", "v", period=1).collect()
    assert (r["n_eval"], r["n_dropped"]) == (1, 1)
    assert r["smape_milli"] == 0  # the surviving point is exact


def test_smape_parity(spark):
    got = q_smape_eval(spark, SF).toPandas()
    _cmp(got, _duck(SMAPE_ORACLE), ["group_key"])
