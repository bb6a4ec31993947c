"""TVD drift audit — pre-validation for the round-11 registration
queue (operators/stats.py:drift_tvd).

Total variation distance between the first- and second-half event
value distributions (10-unit buckets) — the log-free drift detector
(PSI/KL need the banned ln). Common-denominator form keeps everything
exact int64. Registration-ready oracle text in TVD_ORACLE.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"
CUT_US = 1705363200000000  # 2024-01-16 00:00:00 UTC

TVD_ORACLE = f"""
    WITH tagged AS (
        SELECT CASE WHEN epoch_us(ts) < {CUT_US} THEN 0 ELSE 1 END AS s,
               CAST(floor(value / 10) AS BIGINT) AS b
        FROM read_parquet('{{sf}}/events.parquet')
    ),
    counts AS (
        SELECT b,
               CAST(SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS c1,
               CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS c2
        FROM tagged GROUP BY b
    ),
    totals AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS n1,
               CAST(SUM(c2) AS BIGINT) AS n2,
               CAST(COUNT(*) AS BIGINT) AS n_buckets
        FROM counts
    )
    SELECT t.n1, t.n2, t.n_buckets,
           CAST(SUM(ABS(c.c1 * t.n2 - c.c2 * t.n1)) AS BIGINT)
               AS tvd_num,
           (1000000 * CAST(SUM(ABS(c.c1 * t.n2 - c.c2 * t.n1))
                           AS BIGINT))
               // (2 * t.n1 * t.n2) AS tvd_scaled
    FROM counts c CROSS JOIN totals t
    GROUP BY t.n1, t.n2, t.n_buckets
"""


def test_tvd_parity_sf0001(spark):
    from pyspark.sql import functions as F

    from kafka_streams_aggregate_spark.operators.stats import drift_tvd
    from kafka_streams_aggregate_spark.sources.tables import load_table

    ev = load_table(spark, "events", SF).select(
        F.when(F.expr("unix_micros(ts)") < CUT_US, 0)
        .otherwise(1)
        .alias("half"),
        F.floor(F.col("value") / 10).cast("bigint").alias("bucket"),
    )
    got = drift_tvd(ev, "half", "bucket").toPandas()
    con = duckdb.connect()
    exp = con.sql(TVD_ORACLE.format(sf=SF)).df()
    con.close()
    assert len(got) == len(exp) == 1
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_tvd_hand_values(spark):
    """Identical distributions -> 0; disjoint supports -> full scale
    (1e6); a half-overlap case by hand: p=(1/2,1/2,0), q=(0,1/2,1/2)
    -> TVD = 1/2."""
    from kafka_streams_aggregate_spark.operators.stats import drift_tvd

    same = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 1), (1, 2)], "s int, b int"
    )
    [r] = drift_tvd(same, "s", "b").collect()
    assert r["tvd_num"] == 0 and r["tvd_scaled"] == 0

    disjoint = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (1, 4)], "s int, b int"
    )
    [r] = drift_tvd(disjoint, "s", "b").collect()
    assert r["tvd_scaled"] == 1_000_000

    half = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (1, 3)], "s int, b int"
    )
    [r] = drift_tvd(half, "s", "b").collect()
    assert r["tvd_scaled"] == 500_000
