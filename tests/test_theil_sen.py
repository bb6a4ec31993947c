"""Theil–Sen slope — pre-validation for the round-11 registration
queue (operators/stats.py:theil_sen).

Lower-median pair slope per group: exact order-statistic SELECTION of
one correctly-rounded IEEE divide, total order (slope, dy, dx) — the
HOW-STEEP companion to q_mann_kendall's WHETHER. Registration-ready
oracle text in THEIL_SEN_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

THEIL_SEN_ORACLE = """
    WITH pts AS (
        SELECT o_orderpriority AS g,
               CAST(o_orderkey AS BIGINT) AS x,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS y
        FROM read_parquet('{sf}/orders.parquet')
    ),
    pairs AS (
        SELECT a.g,
               b.y - a.y AS dy,
               b.x - a.x AS dx,
               CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE)
                   AS slope
        FROM pts a JOIN pts b ON a.g = b.g AND a.x < b.x
    ),
    ranked AS (
        SELECT g, slope, dy, dx,
               row_number() OVER (PARTITION BY g ORDER BY slope, dy, dx)
                   AS rk,
               COUNT(*) OVER (PARTITION BY g) AS m
        FROM pairs
    )
    SELECT g AS group_key, CAST(m AS BIGINT) AS n_pairs, slope
    FROM ranked WHERE rk = (m + 1) // 2
"""


def test_theil_sen_parity_bit_equal(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import theil_sen
    from kafka_streams_aggregate_spark.sources.tables import load_table

    pts = load_table(spark, "orders", SF).select(
        F.col("o_orderpriority").alias("g"),
        F.col("o_orderkey").alias("x"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("y"),
    )
    got = (
        theil_sen(pts, "g", "x", "y")
        .toPandas()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(THEIL_SEN_ORACLE.format(sf=SF))
        .df()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])
    assert [v.hex() for v in got["slope"]] == [v.hex() for v in exp["slope"]]


def test_theil_sen_hand_value(spark):
    """(1,1),(2,3),(4,5): slopes {2.0, 4/3, 1.0}; lower median (rk 2
    of 3) = 4/3."""
    from kafka_streams_aggregate_spark.operators.stats import theil_sen

    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 3), ("g", 4, 5)], "g string, x long, y long"
    )
    [r] = theil_sen(df, "g", "x", "y").collect()
    assert r["n_pairs"] == 3
    assert r["slope"] == 4.0 / 3.0


def test_theil_sen_x_ties_excluded(spark):
    """Pairs sharing an x contribute no slope; the two valid pairs
    have slopes {1.0, 3.0}, lower median (rk 1 of 2) = 1.0."""
    from kafka_streams_aggregate_spark.operators.stats import theil_sen

    df = spark.createDataFrame(
        [("g", 1, 0), ("g", 1, 2), ("g", 2, 3)], "g string, x long, y long"
    )
    [r] = theil_sen(df, "g", "x", "y").collect()
    assert r["n_pairs"] == 2
    assert r["slope"] == 1.0
