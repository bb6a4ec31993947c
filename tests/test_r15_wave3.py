"""Round-15 wave 3 — seasonal Mann-Kendall, PACF(2), process
capability (operators/stats.py). Oracle texts single-sourced from
queries/round15.py.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

from kafka_streams_aggregate_spark.queries.round15 import (  # noqa: E402
    PACF2_ORACLE,
    PCAP_ORACLE,
    SEASONAL_MK_ORACLE,
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


def test_seasonal_mk_parity(spark):
    from kafka_streams_aggregate_spark.registry import load_all

    got = load_all()["q_seasonal_mann_kendall"].spark(spark, SF).toPandas()
    _cmp(got, _duck(SEASONAL_MK_ORACLE), ["group_key"])


def test_pacf2_parity(spark):
    from kafka_streams_aggregate_spark.registry import load_all

    got = load_all()["q_pacf2"].spark(spark, SF).toPandas()
    _cmp(got, _duck(PACF2_ORACLE), ["group_key"])


def test_pcap_parity(spark):
    from kafka_streams_aggregate_spark.registry import load_all

    got = load_all()["q_process_capability"].spark(spark, SF).toPandas()
    _cmp(got, _duck(PCAP_ORACLE), ["group_key"])


def test_seasonal_mk_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        seasonal_mann_kendall,
    )

    # two seasons x three years, strictly increasing: S = 6,
    # var18 = 2 * 3*2*11 = 132, z^2 = 18*25/132
    rows = [("g", t, t + 1) for t in range(6)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = seasonal_mann_kendall(df, "g", "t", "v", period=2).collect()
    assert (r["n_points"], r["s_stat"], r["var18"]) == (6, 6, 132)
    assert r["z2_ppm"] == (1_000_000 * 18 * 25) // 132

    # constant series: full ties -> var18 = 0 -> NULL
    rows = [("h", t, 7) for t in range(6)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = seasonal_mann_kendall(df, "g", "t", "v", period=2).collect()
    assert r["s_stat"] == 0 and r["var18"] == 0 and r["z2_ppm"] is None


def test_pacf2_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import pacf2

    # alternating 1,0,1,0,1,0: Z = +-3, C0=54, C1=-45, C2=36
    rows = [("g", t, (t + 1) % 2) for t in range(6)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = pacf2(df, "g", "t", "v").collect()
    assert r["gapless"]
    assert r["ac1_ppm"] == -833_333  # trunc toward zero, both engines
    assert r["ac2_ppm"] == 666_666
    # pacf2 = (36*54 - 2025)/(54^2 - 2025) = -81/891 -> -90909 (trunc)
    assert r["pacf2_ppm"] == -90_909

    # a gap NULLs everything
    rows = [("h", 0, 1), ("h", 1, 0), ("h", 3, 1), ("h", 4, 0)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    [r] = pacf2(df, "g", "t", "v").collect()
    assert r["gapless"] is False and r["pacf2_ppm"] is None


def test_pcap_hand(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        process_capability,
    )

    # centered {4,6} in [0,10]: Cp^2 = Cpk^2 = 100*2/(36*4) exactly
    df = spark.createDataFrame([("g", 4), ("g", 6)], "g string, v long")
    [r] = process_capability(df, "g", "v", lsl=0, usl=10).collect()
    assert r["mean_in_spec"] and r["cpk_sign"] == 1
    assert r["cp2_ppm"] == (1_000_000 * 100 * 2) // (36 * 4)
    assert r["cpk2_ppm"] == r["cp2_ppm"]

    # off-center {8,10}: cpk_num = 2 -> Cpk^2 = 4/(72) of 1e6
    df = spark.createDataFrame([("g", 8), ("g", 10)], "g string, v long")
    [r] = process_capability(df, "g", "v", lsl=0, usl=10).collect()
    assert r["cpk2_ppm"] == (1_000_000 * 4) // 72
    assert r["cp2_ppm"] == (1_000_000 * 100 * 2) // (36 * 4)

    # mean OUTSIDE the band {12,14}: sign -1, squared index nonzero
    df = spark.createDataFrame([("g", 12), ("g", 14)], "g string, v long")
    [r] = process_capability(df, "g", "v", lsl=0, usl=10).collect()
    assert not r["mean_in_spec"] and r["cpk_sign"] == -1
    assert r["cpk2_ppm"] == (1_000_000 * 36) // 72
