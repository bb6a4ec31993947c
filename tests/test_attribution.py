"""Linear attribution — pre-validation for the round-11 registration
queue (operators/joins.py:linear_attribution).

Equal-split attribution in exact cents with the Hamilton remainder
rule (allocations sum EXACTLY to each purchase — float splits leak
cents). Registration-ready oracle text in ATTR_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

ATTR_ORACLE = """
    WITH ev AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM read_parquet('{sf}/events.parquet')
    ),
    c AS (
        SELECT user_id AS "user", event_id AS click_id, ts_us AS click_ts
        FROM ev WHERE event_type = 'click'
    ),
    p AS (
        SELECT user_id AS "user", event_id AS purchase_id,
               ts_us AS purchase_ts, cents
        FROM ev WHERE event_type = 'purchase'
    ),
    fanned AS (
        SELECT c.*, p.purchase_id, p.cents
        FROM c JOIN p ON p."user" = c."user"
                     AND c.click_ts <= p.purchase_ts
    ),
    alloc AS (
        SELECT click_id, "user",
               cents // CAST(COUNT(*) OVER (PARTITION BY purchase_id)
                            AS BIGINT)
               + CASE WHEN row_number() OVER (
                          PARTITION BY purchase_id
                          ORDER BY click_ts, click_id) = 1
                      THEN cents % CAST(COUNT(*) OVER (
                               PARTITION BY purchase_id) AS BIGINT)
                      ELSE 0 END AS share
        FROM fanned
    )
    SELECT click_id, "user",
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(share) AS BIGINT) AS attributed_cents
    FROM alloc GROUP BY click_id, "user"
"""


def test_attribution_parity_sf0001(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.joins import (
        linear_attribution,
    )
    from kafka_streams_aggregate_spark.sources.tables import load_table

    ev = load_table(spark, "events", SF).select(
        "user_id",
        "event_id",
        F.expr("unix_micros(ts)").alias("ts_us"),
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    clicks = ev.where(F.col("event_type") == "click")
    purchases = ev.where(F.col("event_type") == "purchase")
    got = (
        linear_attribution(clicks, purchases)
        .toPandas()
        .sort_values("click_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = (
        con.sql(ATTR_ORACLE.format(sf=SF))
        .df()
        .sort_values("click_id")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_attribution_conservation_and_hand(spark):
    """Two clicks before a 101-cent purchase: 50 each, remainder 1 to
    the EARLIER click; a click after the purchase gets nothing; total
    attributed == total attributable purchase cents."""
    from kafka_streams_aggregate_spark.operators.joins import (
        linear_attribution,
    )

    clicks = spark.createDataFrame(
        [(1, 10, 100), (1, 11, 200), (1, 12, 900)],
        "user_id long, event_id long, ts_us long",
    )
    purchases = spark.createDataFrame(
        [(1, 50, 500, 101)],
        "user_id long, event_id long, ts_us long, cents long",
    )
    got = {
        r["click_id"]: r["attributed_cents"]
        for r in linear_attribution(clicks, purchases).collect()
    }
    assert got == {10: 51, 11: 50}
    assert sum(got.values()) == 101
