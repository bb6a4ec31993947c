"""Demand intermittency (Syntetos–Boylan) + MASE forecast eval —
pre-validation for the round-11 registration queue
(operators/costing.py:demand_intermittency / mase_eval).

Both fully integer-exact: the ADI/CV² quadrant via cross-multiplied
cutoffs (1.32 / 0.49 as 132/100 and 49/100 — no float), MASE in the
cross-multiplied ppm form. The dense monthly demand grid (products x
observed months, zero-filled) is built identically in both engines.
Registration-ready oracle texts in INTERMIT_ORACLE / MASE_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

_GRID = """
    dem AS (
        SELECT l_partkey AS product,
               CAST(date_trunc('month', CAST(l_shipdate AS DATE)) AS DATE)
                   AS period,
               CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
                   AS q
        FROM read_parquet('{sf}/lineitem.parquet')
        GROUP BY 1, 2
    ),
    months AS (SELECT DISTINCT period FROM dem),
    prods AS (SELECT DISTINCT product FROM dem),
    grid AS (
        SELECT p.product, m.period, COALESCE(d.q, 0) AS q
        FROM prods p CROSS JOIN months m
        LEFT JOIN dem d
          ON d.product = p.product AND d.period = m.period
    )
"""

INTERMIT_ORACLE = (
    "WITH " + _GRID + """,
    g AS (
        SELECT product,
               CAST(COUNT(*) AS BIGINT) AS n_periods,
               CAST(SUM(CASE WHEN q > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nonzero,
               CAST(SUM(CASE WHEN q > 0 THEN q ELSE 0 END) AS BIGINT) AS s,
               CAST(SUM(CASE WHEN q > 0 THEN q * q ELSE 0 END) AS BIGINT)
                   AS qq
        FROM grid GROUP BY product
    )
    SELECT product, n_periods, n_nonzero,
           CAST((1000000 * n_periods) // n_nonzero AS BIGINT) AS adi_ppm,
           CAST((1000000 * (n_nonzero * qq - s * s)) // (s * s) AS BIGINT)
               AS cv2_ppm,
           CASE WHEN 100 * n_periods >= 132 * n_nonzero
                 AND 100 * (n_nonzero * qq - s * s) >= 49 * (s * s)
                THEN 'lumpy'
                WHEN 100 * n_periods >= 132 * n_nonzero
                THEN 'intermittent'
                WHEN 100 * (n_nonzero * qq - s * s) >= 49 * (s * s)
                THEN 'erratic'
                ELSE 'smooth' END AS pattern
    FROM g WHERE n_nonzero > 0
"""
)

MASE_ORACLE = (
    "WITH " + _GRID + """,
    lagged AS (
        SELECT product, period, q,
               COALESCE(lag(q, 1) OVER (
                   PARTITION BY product ORDER BY period), 0) AS f,
               lag(q, 12) OVER (
                   PARTITION BY product ORDER BY period) AS q_lag
        FROM grid
    ),
    a AS (
        SELECT product,
               CAST(COUNT(*) AS BIGINT) AS n_f,
               CAST(SUM(abs(q - f)) AS BIGINT) AS sae_f,
               CAST(SUM(CASE WHEN q_lag IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_naive,
               CAST(SUM(CASE WHEN q_lag IS NOT NULL
                             THEN abs(q - q_lag) ELSE 0 END) AS BIGINT)
                   AS sae_naive
        FROM lagged GROUP BY product
    )
    SELECT product, n_f, sae_f, n_naive, sae_naive,
           CASE WHEN sae_naive > 0 AND n_naive > 0
                THEN CAST((1000000 * sae_f * n_naive)
                          // (sae_naive * n_f) AS BIGINT)
           END AS mase_ppm
    FROM a
"""
)


def _grid(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    dem = (
        load_table(spark, "lineitem", SF)
        .groupBy(
            F.col("l_partkey").alias("product"),
            F.date_trunc("month", F.col("l_shipdate").cast("date"))
            .cast("date")
            .alias("period"),
        )
        .agg(
            F.sum(F.expr("CAST(floor(l_quantity) AS BIGINT)"))
            .cast("bigint")
            .alias("q")
        )
    )
    months = dem.select("period").distinct()
    prods = dem.select("product").distinct()
    return (
        prods.crossJoin(months)
        .join(dem, ["product", "period"], "left")
        .select(
            "product", "period", F.coalesce(F.col("q"), F.lit(0)).alias("q")
        )
    )


def test_intermittency_parity(spark):
    from kafka_streams_aggregate_spark.operators.costing import (
        demand_intermittency,
    )

    got = (
        demand_intermittency(_grid(spark), "product", "period", "q")
        .toPandas()
        .sort_values("product")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(INTERMIT_ORACLE.format(sf=SF))
        .df()
        .sort_values("product")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    assert got["pattern"].nunique() > 1  # the quadrant actually splits
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_intermittency_sparse_equals_dense(spark):
    """The grid-free closed form (round-12 registration path) is
    row-for-row equal to the dense zero-filled-grid path: zero cells
    contribute nothing to n_nonzero/S/Q and n_periods is the global
    month count."""
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.costing import (
        demand_intermittency,
        demand_intermittency_sparse,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    dem = (
        load_table(spark, "lineitem", SF)
        .groupBy(
            F.col("l_partkey").alias("product"),
            F.date_trunc("month", F.col("l_shipdate").cast("date"))
            .cast("date")
            .alias("period"),
        )
        .agg(
            F.sum(F.expr("CAST(floor(l_quantity) AS BIGINT)"))
            .cast("bigint")
            .alias("q")
        )
    )
    dense = (
        demand_intermittency(_grid(spark), "product", "period", "q")
        .toPandas()
        .sort_values("product")
        .reset_index(drop=True)
    )
    sparse = (
        demand_intermittency_sparse(dem, "product", "period", "q")
        .toPandas()
        .sort_values("product")
        .reset_index(drop=True)
    )
    assert len(dense) == len(sparse) > 0
    pd.testing.assert_frame_equal(
        dense[sorted(dense.columns)], sparse[sorted(sparse.columns)]
    )


def test_intermittency_sparse_zero_rows_count_periods_only(spark):
    """A q=0 row in the sparse input counts toward the global period
    set (as its zero-filled grid cell would) but never toward the
    nonzero stats; an all-zero product is absent."""
    from kafka_streams_aggregate_spark.operators.costing import (
        demand_intermittency_sparse,
    )

    rows = [
        ("a", 1, 5), ("a", 2, 0), ("b", 3, 7),  # period 2 exists only as 0
    ]
    df = spark.createDataFrame(rows, "product string, period long, q long")
    out = {
        r["product"]: r
        for r in demand_intermittency_sparse(
            df, "product", "period", "q"
        ).collect()
    }
    assert out["a"]["n_periods"] == 3 and out["a"]["n_nonzero"] == 1
    assert out["b"]["n_periods"] == 3 and out["b"]["n_nonzero"] == 1
    zero = spark.createDataFrame(
        [("z", 1, 0)], "product string, period long, q long"
    )
    assert demand_intermittency_sparse(zero, "product", "period", "q").count() == 0


def test_mase_parity(spark):
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from kafka_streams_aggregate_spark.operators.costing import mase_eval

    w = Window.partitionBy("product").orderBy("period")
    actuals = _grid(spark).withColumn(
        "forecast", F.coalesce(F.lag("q", 1).over(w), F.lit(0))
    )
    got = (
        mase_eval(actuals, "product", "period", "q", "forecast", season=12)
        .toPandas()
        .sort_values("product")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(MASE_ORACLE.format(sf=SF))
        .df()
        .sort_values("product")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])


def test_intermittency_hand_values(spark):
    """[2,0,2,0]: ADI = 2 (high), CV2 = 0 -> intermittent.
    [1,100]: ADI = 1 (low), CV2 high -> erratic."""
    from kafka_streams_aggregate_spark.operators.costing import (
        demand_intermittency,
    )

    rows = [("a", 1, 2), ("a", 2, 0), ("a", 3, 2), ("a", 4, 0),
            ("b", 1, 1), ("b", 2, 100)]
    df = spark.createDataFrame(rows, "product string, period long, qty long")
    out = {r["product"]: r for r in demand_intermittency(df).collect()}
    a = out["a"]
    assert (a["adi_ppm"], a["cv2_ppm"], a["pattern"]) == (
        2_000_000,
        0,
        "intermittent",
    )
    b = out["b"]
    assert b["pattern"] == "erratic"
    assert b["cv2_ppm"] == (1_000_000 * (2 * 10001 - 101 * 101)) // (101 * 101)


def test_mase_hand_values(spark):
    """q = 1..4, f = 1,1,1,1, season 1: MAE_f = 6/4, naive MAE = 3/3
    -> MASE 1.5 -> 1500000 ppm."""
    from kafka_streams_aggregate_spark.operators.costing import mase_eval

    rows = [("p", 1, 1, 1), ("p", 2, 2, 1), ("p", 3, 3, 1), ("p", 4, 4, 1)]
    df = spark.createDataFrame(
        rows, "product string, period long, qty long, forecast long"
    )
    [r] = mase_eval(df, season=1).collect()
    assert (r["sae_f"], r["n_naive"], r["sae_naive"], r["mase_ppm"]) == (
        6,
        3,
        3,
        1_500_000,
    )
