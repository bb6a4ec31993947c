"""Gini concentration coefficient — pre-validation for the round-11
registration queue (operators/stats.py:gini_lorenz).

Values: non-negative per-customer spend cents per nation. Numerator /
denominator exact int64; the coefficient one IEEE divide (hex-pinned).
Registration-ready oracle text in GINI_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

GINI_ORACLE = """
    WITH spend AS (
        SELECT c.c_nationkey AS grp, c.c_custkey AS id,
               CAST(COALESCE(
                   SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT)),
                   0) AS BIGINT) AS v
        FROM read_parquet('{sf}/customer.parquet') c
        LEFT JOIN read_parquet('{sf}/orders.parquet') o
          ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey, c.c_custkey
    ),
    ranked AS (
        SELECT grp, v,
               CAST(row_number() OVER (
                   PARTITION BY grp ORDER BY v, id) AS BIGINT) AS i
        FROM spend
    ),
    agg AS (
        SELECT grp AS group_key,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS BIGINT) AS total,
               CAST(SUM(i * v) AS BIGINT) AS iwx
        FROM ranked GROUP BY grp
    )
    SELECT group_key, n, total,
           CAST(2 * iwx - (n + 1) * total AS BIGINT) AS gini_num,
           CAST(n * total AS BIGINT) AS gini_den,
           CAST(2 * iwx - (n + 1) * total AS DOUBLE)
               / CAST(n * total AS DOUBLE) AS gini
    FROM agg
"""


def test_gini_parity_sf0001(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import gini_lorenz
    from kafka_streams_aggregate_spark.sources.tables import load_table

    cust = load_table(spark, "customer", SF)
    orders = load_table(spark, "orders", SF)
    spend = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_nationkey", "c_custkey")
        .agg(
            F.coalesce(
                F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")),
                F.lit(0).cast("bigint"),
            ).alias("v")
        )
    )
    got = (
        gini_lorenz(spend, "c_nationkey", "v", "c_custkey")
        .toPandas()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(GINI_ORACLE.format(sf=SF))
        .df()
        .sort_values("group_key")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )
    assert [v.hex() for v in got["gini"]] == [v.hex() for v in exp["gini"]]


def test_gini_hand_values(spark):
    """Perfect equality -> G = 0; total concentration (one holder of
    everything among n=4) -> G = (n-1)/n = 0.75 by the rank-weighted
    formula."""
    from kafka_streams_aggregate_spark.operators.stats import gini_lorenz

    eq = spark.createDataFrame(
        [(1, i, 100) for i in range(1, 5)], "g int, id int, v long"
    )
    [r] = gini_lorenz(eq, "g", "v", "id").collect()
    assert r["gini_num"] == 0 and r["gini"] == 0.0

    conc = spark.createDataFrame(
        [(1, 1, 0), (1, 2, 0), (1, 3, 0), (1, 4, 400)],
        "g int, id int, v long",
    )
    [r] = gini_lorenz(conc, "g", "v", "id").collect()
    # 2*(4*400) - 5*400 = 1200 ; den = 4*400 = 1600 -> 0.75
    assert (r["gini_num"], r["gini_den"], r["gini"]) == (1200, 1600, 0.75)
