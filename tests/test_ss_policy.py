"""(s,S) policy simulation — pre-validation for the round-10
registration queue (operators/costing.py:ss_policy_sim).

Order-dependent exact-integer fold vs a recursive-CTE oracle carrying
(on_hand, lost, orders) per product day-by-day. Registration-ready
oracle text in SS_ORACLE (recursion depth = max demand-days per
product, ~30-60 at driver scales — the scoped-depth recursion class,
not the full-lineitem kind CLAUDE.md warns about).
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

SS_ORACLE = """
    WITH RECURSIVE demand AS (
        SELECT l_partkey AS product,
               datediff('day', DATE '1970-01-01',
                        CAST(l_shipdate AS DATE)) AS d,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        FROM read_parquet('{sf}/lineitem.parquet')
        GROUP BY l_partkey, d
    ),
    ordered AS (
        SELECT product, q,
               row_number() OVER (
                   PARTITION BY product ORDER BY d) AS rn
        FROM demand
    ),
    nn AS (
        SELECT product, CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(q) AS BIGINT) AS total_demand
        FROM ordered GROUP BY product
    ),
    r AS (
        SELECT product, CAST(0 AS BIGINT) AS rn,
               CAST(100 AS BIGINT) AS on_hand,
               CAST(0 AS BIGINT) AS lost,
               CAST(0 AS BIGINT) AS orders
        FROM nn
        UNION ALL
        SELECT o.product, o.rn,
               CASE WHEN r.on_hand - LEAST(o.q, r.on_hand) < 20
                    THEN 100
                    ELSE r.on_hand - LEAST(o.q, r.on_hand) END,
               r.lost + o.q - LEAST(o.q, r.on_hand),
               r.orders + CASE WHEN r.on_hand - LEAST(o.q, r.on_hand)
                                    < 20 THEN 1 ELSE 0 END
        FROM r JOIN ordered o
          ON o.product = r.product AND o.rn = r.rn + 1
    )
    SELECT nn.product, nn.n_days, nn.total_demand,
           max_by(r.lost, r.rn) AS lost_sales,
           max_by(r.orders, r.rn) AS n_orders,
           max_by(r.on_hand, r.rn) AS end_on_hand
    FROM r JOIN nn ON nn.product = r.product
    GROUP BY nn.product, nn.n_days, nn.total_demand
"""


def test_ss_policy_parity_sf0001(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.costing import (
        ss_policy_sim,
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
        ss_policy_sim(li, "product", "d", "qty")
        .toPandas()
        .sort_values("product")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(SS_ORACLE.format(sf=SF))
        .df()
        .sort_values("product")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    # the fold must exercise both branches somewhere in the data
    assert (got["n_orders"] > 0).any()
    assert (got["lost_sales"] > 0).any()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_ss_policy_hand_sequence(spark):
    """Demands 50, 50, 50 with (s=20, S=100): day1 serve 50 -> oh 50,
    no order; day2 serve 50 -> oh 0 < 20 -> order, oh 100; day3 serve
    50 -> oh 50. No lost sales. Then 90, 90: day1 oh 10 -> order ->
    100; day2 serve 90 -> oh 10 -> order -> 100; zero lost. And a
    shortfall case: 100 then 150: day1 oh 0 -> order; day2 serve 100
    of 150 -> lost 50."""
    from kafka_streams_aggregate_spark.operators.costing import (
        ss_policy_sim,
    )

    rows = (
        [(1, 1, 50), (1, 2, 50), (1, 3, 50)]
        + [(2, 1, 90), (2, 2, 90)]
        + [(3, 1, 100), (3, 2, 150)]
    )
    df = spark.createDataFrame(rows, "product long, d long, qty long")
    got = {
        r["product"]: (
            r["lost_sales"], r["n_orders"], r["end_on_hand"]
        )
        for r in ss_policy_sim(df, "product", "d", "qty").collect()
    }
    assert got[1] == (0, 1, 50)
    assert got[2] == (0, 2, 100)
    assert got[3] == (50, 2, 100)
