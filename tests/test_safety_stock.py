"""Safety stock / reorder point — pre-validation for the round-10
registration queue (operators/costing.py:safety_stock_stats).

l_shipdate is TIMESTAMP_NTZ: epoch-day arithmetic via the datediff
rule (CLAUDE.md). All float outputs must be BIT-equal — each is a
short chain of single correctly-rounded IEEE ops spelled identically.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

SAFETY_ORACLE = """
    WITH demand AS (
        SELECT l_partkey AS product,
               datediff('day', DATE '1970-01-01',
                        CAST(l_shipdate AS DATE)) AS d,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        FROM read_parquet('{sf}/lineitem.parquet')
        GROUP BY l_partkey, d
    ),
    agg AS (
        SELECT product,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(q) AS BIGINT) AS demand_sum,
               CAST(SUM(q * q) AS BIGINT) AS demand_sum2
        FROM demand GROUP BY product
    )
    SELECT product, n_days, demand_sum, demand_sum2,
           CAST(demand_sum AS DOUBLE) / CAST(n_days AS DOUBLE)
               AS mean_daily,
           CAST(n_days * demand_sum2 - demand_sum * demand_sum AS DOUBLE)
               / CAST(n_days * (n_days - 1) AS DOUBLE) AS var_daily,
           (164 / 100.0) * sqrt(
               CAST(n_days * demand_sum2 - demand_sum * demand_sum
                    AS DOUBLE)
               / CAST(n_days * (n_days - 1) AS DOUBLE) * 7.0)
               AS safety_stock,
           CAST(demand_sum AS DOUBLE) / CAST(n_days AS DOUBLE) * 7.0
           + (164 / 100.0) * sqrt(
               CAST(n_days * demand_sum2 - demand_sum * demand_sum
                    AS DOUBLE)
               / CAST(n_days * (n_days - 1) AS DOUBLE) * 7.0)
               AS reorder_point
    FROM agg WHERE n_days >= 2
"""


def test_safety_stock_parity_bit_equal(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.costing import (
        safety_stock_stats,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    li = load_table(spark, "lineitem", SF).select(
        F.col("l_partkey").alias("product"),
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.lit("1970-01-01").cast("date"),
        ).alias("d"),
        F.col("l_quantity").alias("qty"),
    )
    got = (
        safety_stock_stats(li, "product", "d", "qty")
        .toPandas()
        .sort_values("product")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(SAFETY_ORACLE.format(sf=SF))
        .df()
        .sort_values("product")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    for col in ("mean_daily", "var_daily", "safety_stock", "reorder_point"):
        assert [v.hex() for v in got[col]] == [
            v.hex() for v in exp[col]
        ], col


def test_safety_stock_hand_values(spark):
    """Demand 10,14 over two days: mean 12, var ((2*296)-576)/2 = 8,
    safety = 1.64*sqrt(56), ROP = 84 + safety."""
    import math

    from kafka_streams_aggregate_spark.operators.costing import (
        safety_stock_stats,
    )

    df = spark.createDataFrame(
        [(1, 100, 10), (1, 101, 14)], "product long, d long, qty long"
    )
    [r] = safety_stock_stats(df, "product", "d", "qty").collect()
    assert r["n_days"] == 2 and r["demand_sum"] == 24
    assert r["mean_daily"] == 12.0 and r["var_daily"] == 8.0
    assert r["safety_stock"] == 1.64 * math.sqrt(8.0 * 7.0)
    assert r["reorder_point"] == 12.0 * 7.0 + 1.64 * math.sqrt(56.0)
