"""Business-day arithmetic — pre-validation for the round-10
registration queue (functions/calendar.py). The SLA query: per order
priority, fulfilment lead time in WORKING days (orderdate -> first
shipdate), aggregated exactly. Oracle text registration-ready.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"

BIZDAYS_ORACLE = """
    WITH sla AS (
        SELECT o.o_orderkey, o.o_orderpriority,
               datediff('day', DATE '1970-01-01',
                        CAST(o.o_orderdate AS DATE)) AS a,
               datediff('day', DATE '1970-01-01',
                        CAST(MIN(l.l_shipdate) AS DATE)) AS b
        FROM read_parquet('{sf}/orders.parquet') o
        JOIN read_parquet('{sf}/lineitem.parquet') l
          ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    ),
    bd AS (
        SELECT o_orderpriority,
               (5 * ((b + 3) // 7) + least((b + 3) % 7, 5) - 3)
               - (5 * ((a + 3) // 7) + least((a + 3) % 7, 5) - 3)
                   AS biz_days
        FROM sla
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(biz_days) AS BIGINT) AS sum_biz_days,
           CAST(MIN(biz_days) AS BIGINT) AS min_biz_days,
           CAST(MAX(biz_days) AS BIGINT) AS max_biz_days
    FROM bd GROUP BY o_orderpriority
"""


def test_bizdays_parity_sf0001(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.functions.calendar import (
        business_days_between,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    orders = load_table(spark, "orders", SF)
    li = load_table(spark, "lineitem", SF)
    epoch = F.lit("1970-01-01").cast("date")
    sla = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.min("l_shipdate").alias("first_ship"))
        .select(
            "o_orderpriority",
            business_days_between(
                F.datediff(F.col("o_orderdate").cast("date"), epoch),
                F.datediff(F.col("first_ship").cast("date"), epoch),
            ).alias("biz_days"),
        )
    )
    got = (
        sla.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("biz_days").cast("bigint").alias("sum_biz_days"),
            F.min("biz_days").cast("bigint").alias("min_biz_days"),
            F.max("biz_days").cast("bigint").alias("max_biz_days"),
        )
        .toPandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(BIZDAYS_ORACLE.format(sf=SF))
        .df()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


@settings(max_examples=300, deadline=None)
@given(st.integers(0, 30000), st.integers(0, 40))
def test_closed_form_matches_bruteforce(a, span):
    """h(b) - h(a) == the literal weekday count over [a, b)."""
    b = a + span

    def h(x):
        x3 = x + 3
        return 5 * (x3 // 7) + min(x3 % 7, 5) - 3

    brute = sum(
        1
        for d in range(a, b)
        if (dt.date(1970, 1, 1) + dt.timedelta(days=d)).weekday() < 5
    )
    assert h(b) - h(a) == brute
