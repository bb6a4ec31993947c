"""Spearman rank correlation — pre-validation for the round-10
registration queue (operators/stats.py:spearman_rank_corr).

The oracle text below is registration-ready: permutation ranks with the
same (value, id) total order, exact-integer sum(d^2), and a final
closed form that is one cast + one divide + one subtract on both sides.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

SPEARMAN_ORACLE = """
    WITH spend AS (
        SELECT c.c_nationkey, c.c_custkey, c.c_acctbal,
               COALESCE(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT)),
                        0) AS spend_cents
        FROM read_parquet('{sf}/customer.parquet') c
        LEFT JOIN read_parquet('{sf}/orders.parquet') o
          ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey, c.c_custkey, c.c_acctbal
    ),
    ranked AS (
        SELECT c_nationkey AS grp,
               CAST(row_number() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_acctbal, c_custkey) AS BIGINT) AS rx,
               CAST(row_number() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY spend_cents, c_custkey) AS BIGINT) AS ry
        FROM spend
    ),
    agg AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2
        FROM ranked GROUP BY grp
    )
    SELECT CAST(grp AS BIGINT) AS group_key, n, sum_d2,
           1.0 - CAST(sum_d2 * 6 AS DOUBLE)
                 / CAST(n * (n * n - 1) AS DOUBLE) AS spearman_rho
    FROM agg WHERE n >= 2
"""


def _spark_frame(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import (
        spearman_rank_corr,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    cust = load_table(spark, "customer", SF)
    orders = load_table(spark, "orders", SF)
    spend = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_nationkey", "c_custkey", "c_acctbal")
        .agg(
            F.coalesce(
                F.sum(
                    F.floor(F.col("o_totalprice") * 100).cast("bigint")
                ),
                F.lit(0).cast("bigint"),
            ).alias("spend_cents")
        )
    )
    out = spearman_rank_corr(
        spend, "c_nationkey", "c_acctbal", "spend_cents", "c_custkey"
    )
    return out.select(
        F.col("group_key").cast("bigint").alias("group_key"),
        "n",
        "sum_d2",
        "spearman_rho",
    )


def test_spearman_parity_sf0001(spark):
    got = (
        _spark_frame(spark)
        .toPandas()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(SPEARMAN_ORACLE.format(sf=SF))
        .df()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    con.close()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    # the doubles must be BIT-equal, not merely close
    assert [v.hex() for v in got["spearman_rho"]] == [
        v.hex() for v in exp["spearman_rho"]
    ]


def test_spearman_known_values(spark):
    """Perfect monotone agreement -> rho = 1; perfect reversal -> -1;
    and the operator matches scipy-free hand math on a small vector."""
    from kafka_streams_aggregate_spark.operators.stats import (
        spearman_rank_corr,
    )

    rows = [
        # group 1: y = 2*x  (monotone increasing, rho = 1)
        *[(1, float(i), 2.0 * i, i) for i in range(10)],
        # group 2: y = -x   (monotone decreasing, rho = -1)
        *[(2, float(i), -1.0 * i, i) for i in range(10)],
        # group 3: hand-computed: x=[1,2,3,4], y=[2,1,4,3] -> d2=[1,1,1,1]
        # rho = 1 - 6*4/(4*15) = 0.6
        (3, 1.0, 2.0, 1),
        (3, 2.0, 1.0, 2),
        (3, 3.0, 4.0, 3),
        (3, 4.0, 3.0, 4),
    ]
    df = spark.createDataFrame(rows, "grp int, x double, y double, id int")
    got = {
        r["group_key"]: (r["sum_d2"], r["spearman_rho"])
        for r in spearman_rank_corr(df, "grp", "x", "y", "id").collect()
    }
    assert got[1] == (0, 1.0)
    assert got[2][1] == -1.0
    assert got[3] == (4, 0.6)
