"""Round-16 wave 9 — RxC chi-square/Cramér's V² and decile lift.
Oracle texts single-sourced from queries/round16.py.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

from kafka_streams_aggregate_spark.queries.round16 import (  # noqa: E402
    CHI2_ORACLE,
    LIFT_ORACLE,
    q_chi2_contingency,
    q_decile_lift,
)


def _cmp(got, exp, keys):
    got = got.sort_values(keys).reset_index(drop=True)
    exp = exp.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def _duck(sql, tables):
    con = duckdb.connect()
    try:
        for t in tables:
            con.execute(
                f"CREATE VIEW {t} AS SELECT *"
                f" FROM read_parquet('{SF}/{t}.parquet')"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def test_chi2_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        chi2_contingency,
    )

    # perfect diagonal 2x2 (empty off-diagonal cells): chi2 = N
    # exactly and V^2 = 1e6 — this pins the unobserved-cell mass
    rows = [("g", "a", "a")] * 5 + [("g", "b", "b")] * 5
    df = spark.createDataFrame(rows, "g string, r string, c string")
    [out] = chi2_contingency(df, "g", "r", "c").collect()
    assert (out["n"], out["r_levels"], out["c_levels"]) == (10, 2, 2)
    assert out["chi2_milli"] == 10_000     # chi2 = 10 = N
    assert out["v2_ppm"] == 1_000_000

    # independent uniform 2x2: every o*N = rm*cm -> chi2 = 0
    rows = [("h", r, c) for r in ("a", "b") for c in ("x", "y")] * 3
    df = spark.createDataFrame(rows, "g string, r string, c string")
    [out] = chi2_contingency(df, "g", "r", "c").collect()
    assert out["chi2_milli"] == 0 and out["v2_ppm"] == 0

    # single-level column: k < 2 -> NULL V^2
    rows = [("k", "a", "x"), ("k", "b", "x")]
    df = spark.createDataFrame(rows, "g string, r string, c string")
    [out] = chi2_contingency(df, "g", "r", "c").collect()
    assert out["v2_ppm"] is None


def test_chi2_parity(spark):
    got = q_chi2_contingency(spark, SF).toPandas()
    _cmp(got, _duck(CHI2_ORACLE,
                    ("orders", "customer", "nation", "region")),
         ["group_key"])


def test_lift_hand(spark):
    from kafka_streams_aggregate_spark.operators.ml_eval import decile_lift

    # 10 rows, the two positives hold the top scores: bucket 1 and 2
    # get lift 5x, gains reach 1e6 by bucket 2
    rows = [(i, 1 if i <= 2 else 0, 100 - i) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "id long, y long, score long")
    out = {r["bucket"]: r for r in decile_lift(
        df, "score", "y", "id").collect()}
    assert len(out) == 10
    assert out[1]["lift_ppm"] == 5_000_000
    assert out[2]["lift_ppm"] == 5_000_000
    assert out[1]["cum_gain_ppm"] == 500_000
    assert out[2]["cum_gain_ppm"] == 1_000_000
    assert out[10]["lift_ppm"] == 0

    # no positives: NULL lift, never a throw
    rows = [(i, 0, i) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "id long, y long, score long")
    for r in decile_lift(df, "score", "y", "id").collect():
        assert r["lift_ppm"] is None and r["cum_gain_ppm"] is None


def test_lift_parity(spark):
    got = q_decile_lift(spark, SF).toPandas()
    _cmp(got, _duck(LIFT_ORACLE, ("orders",)), ["bucket"])
    # the synthetic score genuinely front-loads: top decile lift > 1
    top = got.sort_values("bucket").iloc[0]
    assert top["lift_ppm"] > 1_000_000
