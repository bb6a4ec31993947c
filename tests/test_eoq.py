"""EOQ policy — pre-validation for the round-11 registration queue
(operators/costing.py:eoq_policy).

EOQ = sqrt(2*D*S/H) with integer-cents parameters: one cast + divide
+ sqrt chain, bit-equal (hex pin). Registration-ready oracle text in
EOQ_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

EOQ_ORACLE = """
    WITH d AS (
        SELECT l_partkey AS product,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d_total
        FROM read_parquet('{sf}/lineitem.parquet')
        GROUP BY l_partkey
    )
    SELECT product, d_total,
           sqrt(CAST(2 * d_total * 5000 AS DOUBLE) / 200.0) AS eoq,
           CAST(d_total AS DOUBLE)
               / sqrt(CAST(2 * d_total * 5000 AS DOUBLE) / 200.0)
               AS orders_per_cycle
    FROM d
"""


def test_eoq_parity_bit_equal(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.costing import eoq_policy
    from kafka_streams_aggregate_spark.sources.tables import load_table

    li = load_table(spark, "lineitem", SF).select(
        F.col("l_partkey").alias("product"),
        F.col("l_quantity").alias("qty"),
    )
    got = (
        eoq_policy(li, "product", "qty")
        .toPandas()
        .sort_values("product")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(EOQ_ORACLE.format(sf=SF))
        .df()
        .sort_values("product")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    for col in ("eoq", "orders_per_cycle"):
        assert [v.hex() for v in got[col]] == [
            v.hex() for v in exp[col]
        ], col


def test_eoq_hand_value(spark):
    """D=100, S=5000, H=200 -> EOQ = sqrt(2*100*5000/200) = sqrt(5000)."""
    import math

    from kafka_streams_aggregate_spark.operators.costing import eoq_policy

    df = spark.createDataFrame([(1, 60), (1, 40)], "product long, qty long")
    [r] = eoq_policy(df, "product", "qty").collect()
    assert r["d_total"] == 100
    assert r["eoq"] == math.sqrt(5000.0)
    assert r["orders_per_cycle"] == 100.0 / math.sqrt(5000.0)
