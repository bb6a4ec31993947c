"""Sampled-pairs Theil–Sen — pre-validation for the round-11
registration queue (operators/stats.py:theil_sen_sampled).

Deterministic offset-family pair sampling (Fibonacci lags over the
group's own (x, y) order — reproducible cross-engine with no RNG and
no hash), linear cost; same lower-median selection as the exact
operator. Registration-ready oracle text in TS_SAMPLED_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

TS_SAMPLED_ORACLE = """
    WITH pts AS (
        SELECT o_orderpriority AS g,
               CAST(o_orderkey AS BIGINT) AS x,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS y
        FROM read_parquet('{sf}/orders.parquet')
    ),
    ranked AS (
        SELECT g, x, y,
               row_number() OVER (PARTITION BY g ORDER BY x, y) AS rn
        FROM pts
    ),
    pairs AS (
        SELECT a.g,
               b.y - a.y AS dy,
               b.x - a.x AS dx,
               CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE)
                   AS slope
        FROM ranked a
        JOIN ranked b
          ON a.g = b.g AND b.rn - a.rn IN (1, 2, 3, 5, 8, 13, 21, 34)
        WHERE a.x <> b.x
    ),
    sel AS (
        SELECT g, slope, dy, dx,
               row_number() OVER (PARTITION BY g ORDER BY slope, dy, dx)
                   AS rk,
               COUNT(*) OVER (PARTITION BY g) AS m
        FROM pairs
    )
    SELECT g AS group_key, CAST(m AS BIGINT) AS n_pairs, slope
    FROM sel WHERE rk = (m + 1) // 2
"""


def test_theil_sen_sampled_parity_bit_equal(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import theil_sen_sampled
    from kafka_streams_aggregate_spark.sources.tables import load_table

    pts = load_table(spark, "orders", SF).select(
        F.col("o_orderpriority").alias("g"),
        F.col("o_orderkey").alias("x"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("y"),
    )
    got = (
        theil_sen_sampled(pts, "g", "x", "y")
        .toPandas()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(TS_SAMPLED_ORACLE.format(sf=SF))
        .df()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])
    assert [v.hex() for v in got["slope"]] == [v.hex() for v in exp["slope"]]


def test_theil_sen_sampled_exact_on_linear_data(spark):
    """On exactly linear data every pair slope is identical, so the
    sampled and exact estimators agree bit-for-bit."""
    from kafka_streams_aggregate_spark.operators.stats import (
        theil_sen,
        theil_sen_sampled,
    )

    rows = [("g", i, 7 * i + 3) for i in range(1, 40)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    [exact] = theil_sen(df, "g", "x", "y").collect()
    [sampled] = theil_sen_sampled(df, "g", "x", "y").collect()
    assert exact["slope"] == sampled["slope"] == 7.0
    assert sampled["n_pairs"] < exact["n_pairs"]


def test_theil_sen_sampled_pair_count(spark):
    """n=10, offsets (1,2,3,5,8): pairs = 9+8+7+5+2 = 31 (lags past
    the group end contribute nothing)."""
    from kafka_streams_aggregate_spark.operators.stats import theil_sen_sampled

    rows = [("g", i, (i * i) % 17) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    [r] = theil_sen_sampled(
        df, "g", "x", "y", offsets=(1, 2, 3, 5, 8)
    ).collect()
    assert r["n_pairs"] == 31
