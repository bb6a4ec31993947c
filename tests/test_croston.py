"""Croston's intermittent-demand forecast — pre-validation for the
round-11 registration queue (operators/costing.py:croston_forecast).

Two alpha=1/2 EWMA states (sizes, intervals) folded sequentially over
demand EVENTS only; the scoped recursive-CTE oracle executes the same
two-op-per-state sequence, so z/p/forecast are BIT-equal (hex pins).
The series-start convention (i_1 = t_1 - min_period + 1) uses the
min over ALL grid periods — the filter to events cannot be pushed
below that window (predicate references a non-partition column).
Registration-ready oracle text in CROSTON_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

CROSTON_ORACLE = """
    WITH RECURSIVE dem AS (
        SELECT l_partkey AS product,
               CAST(year(CAST(l_shipdate AS DATE)) * 12
                    + month(CAST(l_shipdate AS DATE)) AS BIGINT) AS t,
               CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS q
        FROM read_parquet('{sf}/lineitem.parquet')
        GROUP BY 1, 2
    ),
    months AS (SELECT DISTINCT t FROM dem),
    prods AS (SELECT DISTINCT product FROM dem),
    grid AS (
        SELECT p.product, m.t, COALESCE(d.q, 0) AS q
        FROM prods p CROSS JOIN months m
        LEFT JOIN dem d ON d.product = p.product AND d.t = m.t
    ),
    with_start AS (
        SELECT product, t, q,
               MIN(t) OVER (PARTITION BY product) AS t0
        FROM grid
    ),
    ev AS (
        SELECT product, t, q,
               CASE WHEN lag(t) OVER w IS NULL THEN t - t0 + 1
                    ELSE t - lag(t) OVER w END AS interval,
               row_number() OVER w AS rn
        FROM with_start WHERE q > 0
        WINDOW w AS (PARTITION BY product ORDER BY t)
    ),
    r AS (
        SELECT product, rn, CAST(q AS DOUBLE) AS z,
               CAST(interval AS DOUBLE) AS p
        FROM ev WHERE rn = 1
        UNION ALL
        SELECT e.product, e.rn,
               0.5 * e.q + 0.5 * r.z,
               0.5 * e.interval + 0.5 * r.p
        FROM r JOIN ev e ON e.product = r.product AND e.rn = r.rn + 1
    ),
    last AS (
        SELECT product, rn, z, p,
               row_number() OVER (PARTITION BY product
                                  ORDER BY rn DESC) AS rev
        FROM r
    )
    SELECT product,
           CAST(rn AS BIGINT) AS n_events,
           z AS z_size,
           p AS p_interval,
           z / p AS croston_per_period
    FROM last WHERE rev = 1
"""


def _grid(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.sources.tables import load_table

    dem = (
        load_table(spark, "lineitem", SF)
        .groupBy(
            F.col("l_partkey").alias("product"),
            F.expr(
                "CAST(year(CAST(l_shipdate AS DATE)) * 12"
                " + month(CAST(l_shipdate AS DATE)) AS BIGINT)"
            ).alias("t"),
        )
        .agg(
            F.sum(F.expr("CAST(floor(l_quantity) AS BIGINT)"))
            .cast("bigint")
            .alias("q")
        )
    )
    months = dem.select("t").distinct()
    prods = dem.select("product").distinct()
    return (
        prods.crossJoin(months)
        .join(dem, ["product", "t"], "left")
        .select("product", "t", F.coalesce(F.col("q"), F.lit(0)).alias("q"))
    )


def test_croston_parity_bit_equal(spark):
    from kafka_streams_aggregate_spark.operators.costing import (
        croston_forecast,
    )

    got = (
        croston_forecast(_grid(spark), "product", "t", "q")
        .toPandas()
        .sort_values("product")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(CROSTON_ORACLE.format(sf=SF))
        .df()
        .sort_values("product")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])
    for col in ("z_size", "p_interval", "croston_per_period"):
        assert [v.hex() for v in got[col]] == [v.hex() for v in exp[col]], col


def test_croston_hand_values(spark):
    """Periods 1..6, demand at t=2 (size 4) and t=5 (size 2):
    i1 = 2, z1 = 4, p1 = 2; i2 = 3, z2 = 0.5*2 + 0.5*4 = 3,
    p2 = 0.5*3 + 0.5*2 = 2.5; forecast = 3/2.5 = 1.2."""
    from kafka_streams_aggregate_spark.operators.costing import (
        croston_forecast,
    )

    rows = [(7, t, q) for t, q in
            [(1, 0), (2, 4), (3, 0), (4, 0), (5, 2), (6, 0)]]
    df = spark.createDataFrame(rows, "product long, period long, qty long")
    [r] = croston_forecast(df, "product", "period", "qty").collect()
    assert r["n_events"] == 2
    assert r["z_size"] == 3.0
    assert r["p_interval"] == 2.5
    assert r["croston_per_period"] == 1.2
