"""Concentration / diversity indices — pre-validation for the
round-11 registration queue
(operators/stats.py:concentration_indices).

HHI and unbiased Simpson as exact scaled integers (the log-free
concentration family — Shannon needs the banned ln). Registration-
ready oracle text in CONCENTRATION_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

CONCENTRATION_ORACLE = """
    WITH c AS (
        SELECT c_mktsegment AS g, c_nationkey AS cat,
               COUNT(*) AS c
        FROM read_parquet('{sf}/customer.parquet')
        GROUP BY 1, 2
    ),
    g AS (
        SELECT g, SUM(c) AS n, COUNT(*) AS n_cats,
               SUM(c * c) AS s2, SUM(c * (c - 1)) AS s11
        FROM c GROUP BY g
    )
    SELECT g AS group_key,
           CAST(n AS BIGINT) AS n,
           CAST(n_cats AS BIGINT) AS n_cats,
           CAST((1000000 * s2) // (n * n) AS BIGINT) AS hhi_ppm,
           CASE WHEN n >= 2
                THEN CAST((1000000 * s11) // (n * (n - 1)) AS BIGINT)
           END AS simpson_ppm
    FROM g
"""


def test_concentration_parity(spark):
    from kafka_streams_aggregate_spark.operators.stats import (
        concentration_indices,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    cust = load_table(spark, "customer", SF)
    got = (
        concentration_indices(cust, "c_mktsegment", "c_nationkey")
        .toPandas()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(CONCENTRATION_ORACLE.format(sf=SF))
        .df()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_concentration_hand_values(spark):
    """cats [a, a, b]: n=3, K=2, sum c^2 = 5 -> hhi 555555 ppm;
    sum c(c-1) = 2 -> simpson 2e6 // 6 = 333333 ppm."""
    from kafka_streams_aggregate_spark.operators.stats import (
        concentration_indices,
    )

    df = spark.createDataFrame(
        [("g", "a"), ("g", "a"), ("g", "b"), ("h", "z")],
        "g string, c string",
    )
    rows = {r["group_key"]: r for r in concentration_indices(df, "g", "c").collect()}
    g = rows["g"]
    assert (g["n"], g["n_cats"], g["hhi_ppm"], g["simpson_ppm"]) == (
        3,
        2,
        555_555,
        333_333,
    )
    h = rows["h"]  # single row: monopoly HHI, Simpson undefined
    assert h["hhi_ppm"] == 1_000_000 and h["simpson_ppm"] is None
